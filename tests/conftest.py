"""Test configuration.

Tests run on CPU with 8 virtual devices (mirroring the reference's
"distributed-without-a-cluster" dask trick, ``test/__init__.py:27-32``) and
with float64 enabled so golden comparisons against the numpy/sklearn
reference prove *algorithmic* parity, not just float32 closeness.
"""

import os
import sys

# Must run before jax is imported anywhere.  Force-set: the session
# environment points JAX_PLATFORMS at the TPU; tests run on a virtual
# 8-device CPU mesh instead (set SDT_TEST_TPU=1 to test on real hardware).
if not os.environ.get("SDT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_ENABLE_X64"] = "1"
    # jax may already be imported (pytest plugins); the backend is not yet
    # initialized at conftest time, so config updates still take effect.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def _install_xarray_stub():
    """The test image has no xarray; the reference package imports it at
    module scope (zscore.py).  Install an inert stub so the reference's
    non-xarray modules stay importable for golden tests."""
    import types

    if "xarray" in sys.modules:
        return
    stub = types.ModuleType("xarray")
    stub.__version__ = "0.0.0-stub"

    def _unavailable(*args, **kwargs):  # pragma: no cover
        raise ImportError("xarray is not available in this environment")

    stub.DataArray = _unavailable
    stub.Dataset = _unavailable
    stub.concat = _unavailable
    sys.modules["xarray"] = stub


@pytest.fixture(scope="session")
def skref():
    """The reference package, imported read-only for golden comparisons."""
    _install_xarray_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import skdownscale.pointwise_models as pm

    return pm


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
