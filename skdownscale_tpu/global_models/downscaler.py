"""Grid front-end for the global (pooled) models.

Counterpart of :class:`~skdownscale_tpu.pointwise.PointWiseDownscaler` for
models fit jointly across space (reference roadmap's unbuilt
``global_models`` component, ``/root/reference/docs/roadmap.rst:59-65``).
Accepts ``xlite``/xarray DataArrays (time + spatial dims) or bare
(cells, time) arrays, flattens space to the leading cell axis, optionally
shards it over a 1-D mesh (``parallel.mesh.shard_cells``), and reshapes
outputs back to the grid.  NaN cells (oceans) pass through: they carry
zero weight in pooled fits and map to NaN in outputs.
"""

from __future__ import annotations

import numpy as np

from ..parallel.mesh import cell_sharding, pad_to_multiple
from ..xlite import is_dataarray as _is_dataarray

__all__ = ["GlobalDownscaler"]


class GlobalDownscaler:
    """Wrap a global model (``GlobalLinearRegressor``,
    ``GlobalQuantileMapper``) for gridded input.

    Parameters
    ----------
    model : object with fit/predict or fit/transform on (cells, time[, f])
    dim : str
        Name of the sample (time) dimension in DataArray input.
    sharding : jax.sharding.Mesh | None
        1-D mesh; input grids are cell-sharded over it before the fit.
    """

    def __init__(self, model, dim: str = "time", sharding=None):
        self._model = model
        self._dim = dim
        self._sharding = sharding
        if sharding is not None and hasattr(model, "mesh"):
            model.mesh = sharding

    # -- packing -------------------------------------------------------
    def _pack(self, X):
        """-> (cells, time) array + unpack metadata."""
        if _is_dataarray(X):
            dims = list(X.dims)
            if self._dim not in dims:
                raise ValueError(f"dimension {self._dim!r} not in {dims}")
            t_ax = dims.index(self._dim)
            arr = np.asarray(X.data)
            arr = np.moveaxis(arr, t_ax, -1)  # (spatial..., T)
            spatial = arr.shape[:-1]
            flat = arr.reshape(-1, arr.shape[-1])
            return flat, (spatial, [d for d in dims if d != self._dim], X)
        arr = np.asarray(X)
        if arr.ndim == 1:
            arr = arr[None, :]
        # bare arrays are already (cells, time[, features])
        return arr, ((arr.shape[0],), None, None)

    def _device(self, flat):
        if self._sharding is None:
            return flat, flat.shape[0]
        import jax

        padded, n = pad_to_multiple(flat, self._sharding.devices.size, axis=0)
        return (
            jax.device_put(padded, cell_sharding(self._sharding, padded.ndim)),
            n,
        )

    def _unpack(self, out, meta, n):
        out = np.asarray(out)[:n]
        spatial, other_dims, template = meta
        grid = out.reshape(*spatial, out.shape[-1])
        if template is None:
            return grid
        # rebuild a DataArray with time last (canonical output layout)
        cls = type(template)
        coords = {d: template.coords[d] for d in template.coords if d != self._dim}
        if self._dim in template.coords:
            coords[self._dim] = template.coords[self._dim]
        return cls(grid, dims=(*other_dims, self._dim), coords=coords)

    # -- public API ----------------------------------------------------
    def _maybe_featureize(self, dx):
        # regression models want a trailing feature axis; a (cells, time)
        # grid means one feature
        if hasattr(self._model, "predict") and dx.ndim == 2:
            return dx[..., None]
        return dx

    def fit(self, X, y, **kwargs):
        fx, _ = self._pack(X)
        fy, _ = self._pack(y)
        dx, _ = self._device(fx)
        dy, _ = self._device(fy)
        self._model.fit(self._maybe_featureize(dx), dy, **kwargs)
        return self

    def predict(self, X, **kwargs):
        fx, meta = self._pack(X)
        dx, n = self._device(fx)
        out = self._model.predict(self._maybe_featureize(dx), **kwargs)
        return self._unpack(out, meta, n)

    def transform(self, X, **kwargs):
        fx, meta = self._pack(X)
        dx, n = self._device(fx)
        out = self._model.transform(dx, **kwargs)
        return self._unpack(out, meta, n)

    def inverse_transform(self, X, **kwargs):
        fx, meta = self._pack(X)
        dx, n = self._device(fx)
        out = self._model.inverse_transform(dx, **kwargs)
        return self._unpack(out, meta, n)

    def __repr__(self):
        return f"GlobalDownscaler(model={self._model!r}, dim={self._dim!r})"
