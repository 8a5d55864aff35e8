"""h5ad-compatible IO built directly on h5py.

Reads/writes the on-disk format produced by the anndata library (encoding-type
attrs: ``csr_matrix``, ``csc_matrix``, ``dataframe``, ``categorical``, ...) so
datasets published for the reference framework load without anndata installed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import scipy.sparse as sp

import h5py

from dance_tpu.data.container import AnnData, MuData
from dance_tpu.settings import logger


# --------------------------------------------------------------------------
# Reading
# --------------------------------------------------------------------------

def _decode(x):
    if isinstance(x, bytes):
        return x.decode()
    return x


def _read_array(node):
    arr = node[()]
    if arr.dtype.kind in ("S", "O"):
        arr = np.array([_decode(v) for v in arr.ravel()]).reshape(arr.shape)
    return arr


def _read_elem(node):
    enc = node.attrs.get("encoding-type", None)
    enc = _decode(enc) if enc is not None else None
    if isinstance(node, h5py.Dataset):
        if node.shape == ():
            return _decode(node[()])
        return _read_array(node)
    # Group
    if enc in ("csr_matrix", "csc_matrix"):
        shape = tuple(node.attrs["shape"])
        mat_cls = sp.csr_matrix if enc == "csr_matrix" else sp.csc_matrix
        return mat_cls((node["data"][()], node["indices"][()], node["indptr"][()]),
                       shape=shape).tocsr()
    if enc == "categorical":
        cats = _read_array(node["categories"])
        codes = node["codes"][()]
        return pd.Categorical.from_codes(codes, categories=cats)
    if enc == "dataframe":
        index_key = _decode(node.attrs.get("_index", "_index"))
        cols = [_decode(c) for c in node.attrs.get("column-order", [])]
        index = _read_elem(node[index_key])
        data = {}
        for c in cols:
            if c in node:
                data[c] = _read_elem(node[c])
        df = pd.DataFrame(data, index=pd.Index(np.asarray(index).astype(str)))
        return df
    if enc == "dict" or enc is None:
        return {k: _read_elem(v) for k, v in node.items()}
    # fallbacks: nullable arrays etc.
    if "values" in node:
        vals = _read_elem(node["values"])
        if "mask" in node:
            mask = node["mask"][()]
            vals = np.where(mask, np.nan, vals) if vals.dtype.kind == "f" else vals
        return vals
    return {k: _read_elem(v) for k, v in node.items()}


def _read_adata_group(g) -> AnnData:
    X = _read_elem(g["X"]) if "X" in g else None
    obs = _read_elem(g["obs"]) if "obs" in g else None
    var = _read_elem(g["var"]) if "var" in g else None
    kwargs = {}
    for key in ("obsm", "varm", "obsp", "varp", "layers", "uns"):
        if key in g:
            kwargs[key] = _read_elem(g[key])
    raw = None
    adata = AnnData(X=X, obs=obs, var=var, **kwargs)
    if "raw" in g:
        raw_group = g["raw"]
        raw_adata = AnnData(X=_read_elem(raw_group["X"]) if "X" in raw_group else None,
                            var=_read_elem(raw_group["var"]) if "var" in raw_group else None,
                            obs=obs)
        from dance_tpu.data.container import Raw
        raw = Raw(raw_adata)
        adata.raw = raw
    return adata


def read_h5ad(path) -> AnnData:
    with h5py.File(path, "r") as f:
        return _read_adata_group(f)


def read_h5mu(path) -> MuData:
    with h5py.File(path, "r") as f:
        # h5py iterates groups alphabetically; "mod-order" restores insertion
        # order so global var positions survive the roundtrip (mudata format).
        order = [n.decode() if isinstance(n, bytes) else str(n)
                 for n in f["mod"].attrs.get("mod-order", list(f["mod"]))]
        mods = {name: _read_adata_group(f["mod"][name]) for name in order}
        obs = _read_elem(f["obs"]) if "obs" in f else None
        uns = _read_elem(f["uns"]) if "uns" in f else None
        return MuData(mods, obs=obs, uns=uns)


# --------------------------------------------------------------------------
# Writing
# --------------------------------------------------------------------------

def _write_array(g, key, arr):
    arr = np.asarray(arr)
    if arr.dtype.kind in ("U", "O"):
        dt = h5py.string_dtype(encoding="utf-8")
        ds = g.create_dataset(key, data=arr.astype(object), dtype=dt)
        ds.attrs["encoding-type"] = "string-array"
    else:
        ds = g.create_dataset(key, data=arr)
        ds.attrs["encoding-type"] = "array"
    ds.attrs["encoding-version"] = "0.2.0"
    return ds


def _write_elem(g, key, val):
    if val is None:
        return
    if sp.issparse(val):
        val = val.tocsr()
        sub = g.create_group(key)
        sub.attrs["encoding-type"] = "csr_matrix"
        sub.attrs["encoding-version"] = "0.1.0"
        sub.attrs["shape"] = np.asarray(val.shape, dtype=np.int64)
        sub.create_dataset("data", data=val.data)
        sub.create_dataset("indices", data=val.indices)
        sub.create_dataset("indptr", data=val.indptr)
    elif isinstance(val, pd.DataFrame):
        sub = g.create_group(key)
        sub.attrs["encoding-type"] = "dataframe"
        sub.attrs["encoding-version"] = "0.2.0"
        sub.attrs["_index"] = "_index"
        sub.attrs["column-order"] = np.asarray([str(c) for c in val.columns],
                                               dtype=h5py.string_dtype(encoding="utf-8"))
        _write_array(sub, "_index", val.index.to_numpy().astype(str))
        for c in val.columns:
            _write_elem(sub, str(c), val[c].to_numpy())
    elif isinstance(val, pd.Categorical):
        sub = g.create_group(key)
        sub.attrs["encoding-type"] = "categorical"
        sub.attrs["encoding-version"] = "0.2.0"
        _write_array(sub, "categories", np.asarray(val.categories).astype(str))
        sub.create_dataset("codes", data=np.asarray(val.codes))
    elif isinstance(val, dict):
        sub = g.create_group(key)
        sub.attrs["encoding-type"] = "dict"
        sub.attrs["encoding-version"] = "0.1.0"
        for k, v in val.items():
            _write_elem(sub, str(k), v)
    elif isinstance(val, (str, bytes)):
        ds = g.create_dataset(key, data=val)
        ds.attrs["encoding-type"] = "string"
    elif np.isscalar(val):
        ds = g.create_dataset(key, data=val)
        ds.attrs["encoding-type"] = "numeric-scalar"
    else:
        arr = np.asarray(val)
        if arr.dtype.kind == "O" and arr.size and isinstance(arr.ravel()[0], str):
            arr = arr.astype(str)
        _write_array(g, key, arr)


def write_h5ad(adata: AnnData, path):
    with h5py.File(path, "w") as f:
        f.attrs["encoding-type"] = "anndata"
        f.attrs["encoding-version"] = "0.1.0"
        _write_elem(f, "X", adata.X)
        _write_elem(f, "obs", adata.obs)
        _write_elem(f, "var", adata.var)
        for key in ("obsm", "varm", "obsp", "varp", "layers", "uns"):
            _write_elem(f, key, dict(getattr(adata, key)))
    logger.debug("Wrote h5ad to %s", path)


def write_h5mu(mdata: MuData, path):
    with h5py.File(path, "w") as f:
        f.attrs["encoding-type"] = "mudata"
        mod = f.create_group("mod")
        mod.attrs["mod-order"] = list(mdata.mod)
        for name, adata in mdata.mod.items():
            g = mod.create_group(name)
            _write_elem(g, "X", adata.X)
            _write_elem(g, "obs", adata.obs)
            _write_elem(g, "var", adata.var)
            for key in ("obsm", "varm", "obsp", "varp", "layers", "uns"):
                _write_elem(g, key, dict(getattr(adata, key)))
        _write_elem(f, "obs", mdata.obs)
        _write_elem(f, "uns", mdata.uns)


__all__ = ["read_h5ad", "read_h5mu", "write_h5ad", "write_h5mu"]
