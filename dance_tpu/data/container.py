"""Native annotated-data containers.

The reference wraps third-party :class:`anndata.AnnData` / :class:`mudata.MuData`
(dance/data/base.py:82-101). This framework ships its own implementation of the
same attribute surface — ``X/obs/var/obsm/varm/obsp/varp/layers/uns/raw`` and
``mod`` for the multimodal container — backed by numpy / scipy.sparse /
pandas, so the data layer has zero heavyweight dependencies and the arrays are
laid out ready for device transfer (C-contiguous dense, CSR sparse).
"""

from __future__ import annotations

import copy as _copy
from typing import Any, Dict, Optional, Union

import numpy as np
import pandas as pd
import scipy.sparse as sp

ArrayLike = Union[np.ndarray, sp.spmatrix]


def _take_rows(v, idx):
    """Row-subset any aligned value (DataFrame rows via iloc, else fancy index)."""
    if isinstance(v, pd.DataFrame):
        return v.iloc[idx]
    return v[idx]


def _as_df(x, n: int, prefix: str) -> pd.DataFrame:
    if x is None:
        # anndata's default axis index is stringified integers
        return pd.DataFrame(index=pd.Index([str(i) for i in range(n)]))
    if isinstance(x, pd.DataFrame):
        df = x.copy()
        df.index = df.index.astype(str)
        return df
    if isinstance(x, dict):
        df = pd.DataFrame(x)
        df.index = df.index.astype(str)
        return df
    raise TypeError(f"Cannot interpret {type(x)} as a dataframe")


class AlignedMapping(dict):
    """Dict of arrays validated against a parent axis length."""

    def __init__(self, parent: "AnnData", axis: Optional[int], data: Optional[dict] = None):
        super().__init__()
        self._parent = parent
        self._axis = axis
        for k, v in (data or {}).items():
            self[k] = v

    def __setitem__(self, key, val):
        shape = getattr(val, "shape", None)
        axis = getattr(self, "_axis", None)
        parent = getattr(self, "_parent", None)
        if axis is not None and parent is not None and shape and len(shape) and shape[0]:
            expect = parent.shape[axis]
            if shape[0] != expect:
                raise ValueError(f"Value for {key!r} has leading dim {shape[0]}, "
                                 f"expected {expect}")
        super().__setitem__(key, val)

    def __reduce__(self):
        # copy/pickle as a plain dict — the parent link is rebuilt by AnnData
        return (dict, (), None, None, iter(dict(self).items()))


class Raw:
    """Frozen snapshot of (X, var) — parity with ``AnnData.raw``."""

    def __init__(self, adata: "AnnData"):
        self.X = adata.X.copy() if adata.X is not None else None
        self.var = adata.var.copy()
        self.varm = dict(adata.varm)

    @property
    def n_vars(self) -> int:
        return len(self.var)

    def to_adata(self) -> "AnnData":
        return AnnData(X=None if self.X is None else self.X.copy(), var=self.var.copy())


class AnnData:
    """Annotated cell-by-gene data matrix with the standard AnnData surface."""

    def __init__(self, X: Optional[ArrayLike] = None, obs=None, var=None, *, obsm=None,
                 varm=None, obsp=None, varp=None, layers=None, uns: Optional[dict] = None,
                 raw: Optional[Raw] = None, dtype=None, shape=None):
        if X is not None:
            if sp.issparse(X):
                X = X.tocsr()
            else:
                X = np.asarray(X)
                if X.ndim == 1:
                    X = X[:, None]
            if dtype is not None:
                X = X.astype(dtype)
            n_obs, n_vars = X.shape
        elif shape is not None:
            n_obs, n_vars = shape
        else:
            n_obs = len(obs) if obs is not None else 0
            n_vars = len(var) if var is not None else 0

        self._X = X
        self.obs = _as_df(obs, n_obs, "cell")
        self.var = _as_df(var, n_vars, "gene")
        if X is not None:
            if len(self.obs) != n_obs or len(self.var) != n_vars:
                raise ValueError(f"obs/var length ({len(self.obs)}, {len(self.var)}) does not "
                                 f"match X shape {X.shape}")
        self.obsm = AlignedMapping(self, 0, obsm)
        self.varm = AlignedMapping(self, 1, varm)
        self.obsp = AlignedMapping(self, 0, obsp)
        self.varp = AlignedMapping(self, 1, varp)
        self.layers = AlignedMapping(self, 0, layers)
        self.uns: Dict[str, Any] = dict(uns or {})
        self.raw = raw

    # --- basic properties -------------------------------------------------

    @property
    def X(self):
        return self._X

    @X.setter
    def X(self, val):
        if val is not None:
            if sp.issparse(val):
                val = val.tocsr()
            else:
                val = np.asarray(val)
            if val.shape != self.shape:
                raise ValueError(f"New X shape {val.shape} != {self.shape}")
        self._X = val

    @property
    def shape(self):
        if self._X is not None:
            return self._X.shape
        return (len(self.obs), len(self.var))

    @property
    def n_obs(self) -> int:
        return self.shape[0]

    @property
    def n_vars(self) -> int:
        return self.shape[1]

    @property
    def obs_names(self) -> pd.Index:
        return self.obs.index

    @obs_names.setter
    def obs_names(self, names):
        self.obs.index = pd.Index(names).astype(str)

    @property
    def var_names(self) -> pd.Index:
        return self.var.index

    @var_names.setter
    def var_names(self, names):
        self.var.index = pd.Index(names).astype(str)

    @staticmethod
    def _make_unique(index: pd.Index) -> pd.Index:
        """De-duplicate by suffixing repeats: a, a-1, a-2, ... (anndata parity)."""
        counts = {}
        out = []
        for name in index.astype(str):
            k = counts.get(name, 0)
            counts[name] = k + 1
            out.append(name if k == 0 else f"{name}-{k}")
        return pd.Index(out)

    def obs_names_make_unique(self):
        self.obs.index = self._make_unique(self.obs.index)

    def var_names_make_unique(self):
        self.var.index = self._make_unique(self.var.index)

    def raw_to(self):
        self.raw = Raw(self)

    # --- copies and views -------------------------------------------------

    def copy(self) -> "AnnData":
        out = AnnData(
            X=None if self._X is None else self._X.copy(),
            obs=self.obs.copy(), var=self.var.copy(),
            obsm={k: _copy.deepcopy(v) for k, v in self.obsm.items()},
            varm={k: _copy.deepcopy(v) for k, v in self.varm.items()},
            obsp={k: _copy.deepcopy(v) for k, v in self.obsp.items()},
            varp={k: _copy.deepcopy(v) for k, v in self.varp.items()},
            layers={k: _copy.deepcopy(v) for k, v in self.layers.items()},
            uns=_copy.deepcopy(self.uns), shape=self.shape)
        out.raw = self.raw
        return out

    def __deepcopy__(self, memo):
        out = self.copy()
        memo[id(self)] = out
        return out

    def __getstate__(self):
        return {"X": self._X, "obs": self.obs, "var": self.var,
                "obsm": dict(self.obsm), "varm": dict(self.varm),
                "obsp": dict(self.obsp), "varp": dict(self.varp),
                "layers": dict(self.layers), "uns": self.uns, "raw": self.raw}

    def __setstate__(self, state):
        self.__init__(X=state["X"], obs=state["obs"], var=state["var"],
                      obsm=state["obsm"], varm=state["varm"], obsp=state["obsp"],
                      varp=state["varp"], layers=state["layers"], uns=state["uns"],
                      raw=state["raw"])

    def _norm_idx(self, idx, axis: int):
        names = self.obs_names if axis == 0 else self.var_names
        n = self.shape[axis]
        if isinstance(idx, slice):
            return np.arange(n)[idx]
        idx = np.asarray(idx)
        if idx.dtype == bool:
            return np.nonzero(idx)[0]
        if idx.dtype.kind in "iu":
            return idx
        # name-based indexing
        lookup = pd.Series(np.arange(n), index=names)
        return lookup[idx].to_numpy()

    def __getitem__(self, key) -> "AnnData":
        if not isinstance(key, tuple):
            key = (key, slice(None))
        oi = self._norm_idx(key[0], 0)
        vi = self._norm_idx(key[1], 1)
        X = None
        if self._X is not None:
            X = self._X[oi][:, vi]
        out = AnnData(
            X=X, obs=self.obs.iloc[oi], var=self.var.iloc[vi],
            obsm={k: _take_rows(v, oi) for k, v in self.obsm.items()},
            varm={k: _take_rows(v, vi) for k, v in self.varm.items()},
            obsp={k: v[oi][:, oi] for k, v in self.obsp.items()},
            varp={k: v[vi][:, vi] for k, v in self.varp.items()},
            layers={k: v[oi][:, vi] if v.shape == self.shape else _take_rows(v, oi)
                    for k, v in self.layers.items()},
            uns=_copy.deepcopy(self.uns),
            shape=(len(oi), len(vi)))
        out.raw = self.raw
        return out

    def _inplace_subset_obs(self, index):
        """Subset cells in place; ``index`` is a mask, int index, or name list."""
        sub = self[index]
        self._X = sub.X
        self.obs = sub.obs
        for attr in ("obsm", "obsp", "layers"):
            getattr(self, attr).clear()
            getattr(self, attr).update(getattr(sub, attr))

    def _inplace_subset_var(self, index):
        """Subset genes in place; ``index`` is a mask, int index, or name list."""
        sub = self[:, index]
        self._X = sub.X
        self.var = sub.var
        for attr in ("varm", "varp", "layers"):
            getattr(self, attr).clear()
            getattr(self, attr).update(getattr(sub, attr))

    def __repr__(self):
        lines = [f"AnnData object with n_obs x n_vars = {self.n_obs} x {self.n_vars}"]
        for attr in ("obs", "var"):
            cols = list(getattr(self, attr).columns)
            if cols:
                lines.append(f"    {attr}: {cols}")
        for attr in ("obsm", "varm", "obsp", "varp", "layers", "uns"):
            keys = list(getattr(self, attr))
            if keys:
                lines.append(f"    {attr}: {keys}")
        return "\n".join(lines)

    def write_h5ad(self, path):
        from dance_tpu.data.io import write_h5ad
        write_h5ad(self, path)

    # transposition used by some transforms
    @property
    def T(self) -> "AnnData":
        X = None if self._X is None else (self._X.T.tocsr() if sp.issparse(self._X)
                                          else self._X.T.copy())
        return AnnData(X=X, obs=self.var.copy(), var=self.obs.copy(),
                       obsm=dict(self.varm), varm=dict(self.obsm),
                       uns=_copy.deepcopy(self.uns), shape=(self.n_vars, self.n_obs))


def concat(adatas, axis: int = 0, join: str = "inner", label=None, keys=None) -> AnnData:
    """Concatenate AnnData objects along obs (axis=0), inner-joining variables."""
    if axis != 0:
        raise NotImplementedError("Only obs-axis concatenation is supported")
    var_names = adatas[0].var_names
    for a in adatas[1:]:
        if join == "inner":
            var_names = var_names.intersection(a.var_names)
        else:
            var_names = var_names.union(a.var_names)
    parts, obs_parts = [], []
    for i, a in enumerate(adatas):
        sub = a[:, var_names.to_numpy()] if not a.var_names.equals(var_names) else a
        parts.append(sub.X)
        obs = sub.obs.copy()
        if label is not None:
            obs[label] = keys[i] if keys is not None else str(i)
        obs_parts.append(obs)
    if any(sp.issparse(p) for p in parts):
        X = sp.vstack([sp.csr_matrix(p) for p in parts]).tocsr()
    else:
        X = np.concatenate([np.asarray(p) for p in parts], axis=0)
    obs = pd.concat(obs_parts, axis=0)
    obs.index = pd.Index([f"{n}-{i}" for i, n in enumerate(obs.index)])
    var = adatas[0].var.loc[var_names].copy() if not adatas[0].var.empty else None
    return AnnData(X=X, obs=obs, var=var if var is not None else pd.DataFrame(index=var_names))


class MuData:
    """Multimodal container: named modalities sharing the obs axis."""

    def __init__(self, mod: Dict[str, AnnData], *, obs=None, uns: Optional[dict] = None,
                 obsm=None):
        self.mod: Dict[str, AnnData] = dict(mod)
        n_obs = max((m.n_obs for m in self.mod.values()), default=0)
        self.obs = _as_df(obs, n_obs, "cell") if obs is not None else self._joint_obs()
        self.uns: Dict[str, Any] = dict(uns or {})
        self.obsm = dict(obsm or {})
        self.var = pd.DataFrame(index=pd.Index(
            [n for m in self.mod.values() for n in m.var_names]))
        self.varm: Dict[str, Any] = {}
        self.obsp: Dict[str, Any] = {}
        self.varp: Dict[str, Any] = {}
        self.layers: Dict[str, Any] = {}

    def _joint_obs(self) -> pd.DataFrame:
        dfs = [m.obs.add_prefix(f"{name}:") for name, m in self.mod.items()]
        if not dfs:
            return pd.DataFrame()
        out = dfs[0]
        for df in dfs[1:]:
            out = out.join(df, how="outer")
        return out

    @property
    def X(self):
        return None

    @property
    def shape(self):
        return (len(self.obs), sum(m.n_vars for m in self.mod.values()))

    @property
    def n_obs(self) -> int:
        return self.shape[0]

    @property
    def obs_names(self) -> pd.Index:
        return self.obs.index

    def __getitem__(self, key):
        if isinstance(key, str):
            return self.mod[key]
        if not isinstance(key, tuple):
            key = (key, slice(None))
        oi, vi = key
        if not (isinstance(vi, slice) and vi == slice(None)):
            # global-var-axis slicing: route each selected column to its modality
            nv = [m.n_vars for m in self.mod.values()]
            total = sum(nv)
            if isinstance(vi, slice):
                gidx = np.arange(total)[vi]
            else:
                arr = np.asarray(vi)
                if arr.dtype == bool:
                    if len(arr) != total:
                        raise IndexError(f"boolean var mask length {len(arr)} != {total}")
                    gidx = np.flatnonzero(arr)
                elif arr.dtype.kind in "iu":
                    gidx = arr
                else:  # names over the concatenated global var index
                    gidx = self.var.index.get_indexer(arr)
                    if (gidx < 0).any():
                        missing = np.asarray(arr)[gidx < 0][:5]
                        raise KeyError(f"var names not found: {list(missing)}")
            offsets = np.cumsum([0] + nv)
            mods = {}
            for (k, m), lo, hi in zip(self.mod.items(), offsets[:-1], offsets[1:]):
                local = gidx[(gidx >= lo) & (gidx < hi)] - lo
                mods[k] = m[oi, local]
            return MuData(mods,
                          obs=self.obs.iloc[np.asarray(
                              self.mod[next(iter(self.mod))]._norm_idx(oi, 0))],
                          uns=_copy.deepcopy(self.uns),
                          obsm={k: v[oi] for k, v in self.obsm.items()})
        return MuData({k: m[oi] for k, m in self.mod.items()},
                      obs=self.obs.iloc[np.asarray(
                          self.mod[next(iter(self.mod))]._norm_idx(oi, 0))],
                      uns=_copy.deepcopy(self.uns),
                      obsm={k: v[oi] for k, v in self.obsm.items()})

    def copy(self) -> "MuData":
        return MuData({k: m.copy() for k, m in self.mod.items()}, obs=self.obs.copy(),
                      uns=_copy.deepcopy(self.uns),
                      obsm={k: _copy.deepcopy(v) for k, v in self.obsm.items()})

    def update(self):
        self.obs = self._joint_obs().set_axis(self.obs.index) if len(self.obs) else self.obs

    def __repr__(self):
        mods = ", ".join(f"{k}: {m.n_obs}x{m.n_vars}" for k, m in self.mod.items())
        return f"MuData object with n_obs = {self.n_obs}; mod: {{{mods}}}"


__all__ = ["AlignedMapping", "AnnData", "MuData", "Raw", "concat"]
