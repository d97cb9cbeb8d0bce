"""Checkpoint / resume for fitted downscalers.

The reference has no persistence: fitted state is a Python-object xarray in
memory (``/root/reference/skdownscale/pointwise_models/core.py:80-82``,
SURVEY.md §5).  Here fitted state is a pytree of plain arrays, so a
checkpoint is just that pytree (numpy-ified) plus grid metadata.  ``save`` /
``load`` round-trip a fitted
:class:`~skdownscale_tpu.pointwise.PointWiseDownscaler` (batched path), and
``save_state``/``load_state`` handle bare state pytrees.

Format: a single pickle of numpy arrays + metadata (our own trusted
artifacts; the state trees are NamedTuples/dicts of ndarrays).  Every
payload carries a ``version`` stamp; :func:`load`/:func:`load_state` refuse
newer-format files with a named error instead of mis-reading them, and older
versions get an explicit migration path (none needed yet — v1 is current).

Sharding: checkpoints are device-layout-free.  ``_numpyify`` gathers
mesh-sharded fitted state to host numpy (``np.asarray`` on a
fully-addressable sharded array performs the gather), so state saved from an
8-device mesh loads on 1 device and vice versa; pass ``sharding=`` to
:func:`load` to re-shard the restored downscaler onto a mesh.
"""

from __future__ import annotations

import pickle

import jax
import numpy as np

__all__ = ["save", "load", "save_state", "load_state"]

_FORMAT_VERSION = 1


def _numpyify(state):
    return jax.tree_util.tree_map(np.asarray, state)


def _check_version(payload, path):
    v = payload.get("version")
    if v == _FORMAT_VERSION:
        return
    if isinstance(v, int) and v > _FORMAT_VERSION:
        raise ValueError(
            f"checkpoint {path!r} has format version {v}, newer than this "
            f"library's {_FORMAT_VERSION}; upgrade skdownscale_tpu to read it"
        )
    # v1 is the first released format; anything else is not ours
    raise ValueError(f"checkpoint {path!r} has unrecognized format version {v!r}")


def save_state(path: str, state) -> None:
    """Save any pytree-of-arrays fitted state to ``path`` (mesh-sharded
    arrays are gathered to host first; see module docstring)."""
    with open(path, "wb") as f:
        pickle.dump({"version": _FORMAT_VERSION, "state": _numpyify(state)}, f)


def load_state(path: str):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    _check_version(payload, path)
    return payload["state"]


def save(path: str, downscaler) -> None:
    """Checkpoint a fitted ``PointWiseDownscaler`` (batched models only)."""
    if downscaler._state is None:
        raise ValueError(
            "only batched-model downscalers are checkpointable (per-cell "
            "fallback estimators hold arbitrary Python objects)"
        )
    payload = {
        "version": _FORMAT_VERSION,
        "model_class": type(downscaler._model).__module__
        + "."
        + type(downscaler._model).__qualname__,
        "model_params": downscaler._model.get_params(),
        "model_extra": {
            k: v for k, v in vars(downscaler._model).items() if k.endswith("_") and np.isscalar(v)
        },
        "dim": downscaler._dim,
        "px_meta": downscaler._px_meta,
        "mask": downscaler._mask,
        "cell_ids": downscaler._cell_ids,
        "state_plan": downscaler._state_plan,
        "fit_index": downscaler._fit_index,
        "state": _numpyify(downscaler._state),
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load(path: str, sharding=None):
    """Restore a fitted ``PointWiseDownscaler`` from :func:`save` output.

    ``sharding`` (a ``jax.sharding.Mesh``/``NamedSharding``, optional)
    re-shards the restored downscaler's device passes over a mesh — the
    save-on-N-devices / load-on-M-devices path (state itself is stored
    gathered, so N and M are independent).
    """
    import importlib

    from ..pointwise import PointWiseDownscaler, _dataarray_type
    from ..xlite import DataArray as _DA

    with open(path, "rb") as f:
        payload = pickle.load(f)
    _check_version(payload, path)

    mod_name, _, cls_name = payload["model_class"].rpartition(".")
    cls = getattr(importlib.import_module(mod_name), cls_name)
    model = cls(**payload["model_params"])
    for k, v in payload.get("model_extra", {}).items():
        setattr(model, k, v)

    d = PointWiseDownscaler(model, dim=payload["dim"], sharding=sharding)
    d._mask = payload["mask"]
    d._cell_ids = payload["cell_ids"]
    d._px_meta = payload["px_meta"]
    d._fit_index = payload["fit_index"]
    d._fit_T = len(payload["fit_index"])
    d._maker = lambda data, dims, coords: _DA(data, dims, coords)
    d._state = payload["state"]
    d._state_plan = payload.get("state_plan") or [
        ((int(payload["cell_ids"][0]), int(payload["cell_ids"][-1]) + 1), payload["cell_ids"])
    ]
    d._models = None
    del _dataarray_type
    return d
