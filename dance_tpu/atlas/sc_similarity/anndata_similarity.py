"""Dataset-to-dataset similarity metrics, on device.

Parity target: dance/atlas/sc_similarity/anndata_similarity.py:53-430
(cosine/pearson/jaccard/JS-divergence on sampled cells, MMD, Wasserstein,
Hausdorff, Chamfer, energy distance, Sinkhorn, Bures, spectral distance,
metadata similarity). The POT dependency is replaced by a jitted Sinkhorn
iteration; every pairwise-distance metric runs as MXU matmuls.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from dance_tpu.settings import logger
from dance_tpu.typing import Dict, List, Optional

HI = jax.lax.Precision.HIGHEST


def get_anndata(tissue: str = "Blood", species: str = "human",
                filetype: str = "h5ad", train_dataset=(), test_dataset=(),
                valid_dataset=(), data_dir: str = "../temp_data"):
    """Load atlas datasets by catalog id through CellTypeAnnotationDataset
    (parity: anndata_similarity.py:28-50). Dataset ids are resolved against
    the shipped scdeepsort catalog's (tissue, dataset) columns — the catalog
    stores ids directly, so no filename splitting is needed."""
    from dance_tpu.datasets.singlemodality import CellTypeAnnotationDataset
    from dance_tpu.settings import METADIR

    catalog = pd.read_csv(METADIR / "scdeepsort.csv", header=0)
    in_tissue = catalog[catalog["tissue"] == tissue]["dataset"].astype(str)

    def find_in_catalog(datasets):
        return [d for d in map(str, datasets) if (in_tissue == d).any()]

    data = CellTypeAnnotationDataset(
        train_dataset=find_in_catalog(train_dataset),
        test_dataset=find_in_catalog(test_dataset),
        valid_dataset=find_in_catalog(valid_dataset) or None,
        data_dir=data_dir, tissue=tissue, species=species).load_data()
    return data.data


def _pdist2(x, y):
    return jnp.maximum((x ** 2).sum(1)[:, None] + (y ** 2).sum(1)[None, :]
                       - 2 * jnp.dot(x, y.T, precision=HI), 0.0)


@jax.jit
def _mmd_rbf(x, y, gamma: float = 1.0):
    def k(a, b):
        return jnp.exp(-gamma * _pdist2(a, b)).mean()

    return k(x, x) + k(y, y) - 2 * k(x, y)


@partial(jax.jit, static_argnames=("n_iter",))
def _sinkhorn(x, y, reg: float = 0.1, n_iter: int = 100):
    """Entropic-regularized OT cost between uniform point clouds."""
    c = jnp.sqrt(_pdist2(x, y))
    c = c / jnp.maximum(c.max(), 1e-12)
    n, m = c.shape
    k = jnp.exp(-c / reg)
    u = jnp.full(n, 1.0 / n)
    v = jnp.full(m, 1.0 / m)

    def body(_, uv):
        u, v = uv
        u = (1.0 / n) / jnp.maximum(k @ v, 1e-30)
        v = (1.0 / m) / jnp.maximum(k.T @ u, 1e-30)
        return u, v

    u, v = jax.lax.fori_loop(0, n_iter, body, (u, v))
    p = u[:, None] * k * v[None, :]
    return (p * c).sum()


@jax.jit
def _hausdorff(x, y):
    d = jnp.sqrt(_pdist2(x, y))
    return jnp.maximum(d.min(1).max(), d.min(0).max())


@jax.jit
def _chamfer(x, y):
    d = _pdist2(x, y)
    return d.min(1).mean() + d.min(0).mean()


@jax.jit
def _energy(x, y):
    dxy = jnp.sqrt(_pdist2(x, y)).mean()
    dxx = jnp.sqrt(_pdist2(x, x)).mean()
    dyy = jnp.sqrt(_pdist2(y, y)).mean()
    return 2 * dxy - dxx - dyy


class AnnDataSimilarity:
    """Similarity suite between two datasets (parity: anndata_similarity.py:53)."""

    CONTINUOUS_METRICS = ["wasserstein", "hausdorff", "chamfer", "energy", "sinkhorn2",
                          "bures", "spectral", "mmd"]
    SAMPLED_METRICS = ["cosine", "pearson", "jaccard", "js_distance"]

    def __init__(self, adata1, adata2, sample_size: Optional[int] = None,
                 init_random_state: Optional[int] = None, n_runs: int = 10,
                 ground_truth_conf_path: Optional[str] = None,
                 adata1_name: Optional[str] = None, adata2_name: Optional[str] = None,
                 methods: Optional[List[str]] = None, tissue: str = "blood"):
        self.origin_adata1 = adata1.copy()
        self.origin_adata2 = adata2.copy()
        self.sample_size = sample_size
        self.init_random_state = init_random_state
        self.n_runs = n_runs
        self.adata1_name = adata1_name
        self.adata2_name = adata2_name
        self.tissue = tissue
        self.results: Dict[str, float] = {}
        self.preprocess()

    # --- preparation ------------------------------------------------------

    def filter_gene(self, n_top_genes: int = 3000):
        """Restrict both datasets to the intersection of their top
        highly-variable genes (parity: anndata_similarity.py:100-119);
        datasets with fewer genes fall back to the plain intersection."""
        from dance_tpu import sc as _sc
        a1, a2 = self.origin_adata1, self.origin_adata2
        if min(a1.n_vars, a2.n_vars) > n_top_genes:
            _sc.pp.filter_genes(a1, min_counts=3)
            _sc.pp.filter_genes(a2, min_counts=3)
            _sc.pp.highly_variable_genes(a1, n_top_genes=n_top_genes,
                                         flavor="seurat_v3", check_values=False)
            _sc.pp.highly_variable_genes(a2, n_top_genes=n_top_genes,
                                         flavor="seurat_v3", check_values=False)
            hv1 = set(np.asarray(a1.var_names)[np.asarray(
                a1.var["highly_variable"], bool)])
            hv2 = set(np.asarray(a2.var_names)[np.asarray(
                a2.var["highly_variable"], bool)])
            common = sorted(hv1 & hv2)
        else:
            common = sorted(set(a1.var_names) & set(a2.var_names))
        if not common:  # degenerate inputs: keep the plain intersection
            common = sorted(set(a1.var_names) & set(a2.var_names))
        self.adata1 = a1[:, np.asarray(common)]
        self.adata2 = a2[:, np.asarray(common)]
        self.common_genes = common

    def preprocess(self):
        self.filter_gene()

    def normalize_data(self, x):
        import scipy.sparse as sp
        if sp.issparse(x):
            x = np.asarray(x.todense())
        x = np.asarray(x, dtype=np.float64)
        x = x / np.maximum(x.sum(1, keepdims=True), 1e-12) * 1e4
        return np.log1p(x)

    def sample_cells(self, random_state: Optional[int] = None):
        rng = np.random.default_rng(random_state)
        size = self.sample_size or min(self.adata1.n_obs, self.adata2.n_obs)
        size = min(size, self.adata1.n_obs, self.adata2.n_obs)
        i1 = rng.choice(self.adata1.n_obs, size, replace=False)
        i2 = rng.choice(self.adata2.n_obs, size, replace=False)
        x1 = self.normalize_data(self.adata1.X)[i1]
        x2 = self.normalize_data(self.adata2.X)[i2]
        return x1, x2

    # --- metrics ----------------------------------------------------------

    def cosine_sim_sampled(self, x1, x2) -> float:
        a = x1.mean(0)
        b = x2.mean(0)
        return float(a @ b / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12))

    def pearson_corr_sampled(self, x1, x2) -> float:
        a, b = x1.mean(0), x2.mean(0)
        return float(np.corrcoef(a, b)[0, 1])

    def jaccard_sim_sampled(self, x1, x2, threshold: float = 0.5) -> float:
        a = (x1 > threshold).any(0)
        b = (x2 > threshold).any(0)
        union = np.logical_or(a, b).sum()
        return float(np.logical_and(a, b).sum() / max(union, 1))

    def js_divergence_sampled(self, x1, x2) -> float:
        p = x1.mean(0) + 1e-12
        q = x2.mean(0) + 1e-12
        p, q = p / p.sum(), q / q.sum()
        m = (p + q) / 2

        def kl(a, b):
            return float((a * np.log(a / b)).sum())

        return 1.0 - 0.5 * (kl(p, m) + kl(q, m))  # similarity form

    def compute_mmd(self, x1, x2) -> float:
        g = 1.0 / max(x1.shape[1], 1)
        return float(_mmd_rbf(jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
                              g))

    def wasserstein_dist(self, x1, x2) -> float:
        return float(_sinkhorn(jnp.asarray(x1, jnp.float32),
                               jnp.asarray(x2, jnp.float32), reg=0.05))

    def get_Hausdorff(self, x1, x2) -> float:
        return float(_hausdorff(jnp.asarray(x1, jnp.float32),
                                jnp.asarray(x2, jnp.float32)))

    def chamfer_distance(self, x1, x2) -> float:
        return float(_chamfer(jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)))

    def energy_distance_metric(self, x1, x2) -> float:
        return float(_energy(jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)))

    def get_sinkhorn2(self, x1, x2) -> float:
        return float(_sinkhorn(jnp.asarray(x1, jnp.float32),
                               jnp.asarray(x2, jnp.float32), reg=0.1))

    def bures_distance(self, x1, x2) -> float:
        c1 = np.cov(x1, rowvar=False) + 1e-6 * np.eye(x1.shape[1])
        c2 = np.cov(x2, rowvar=False) + 1e-6 * np.eye(x2.shape[1])
        s1 = _sqrtm_psd(c1)
        cross = _sqrtm_psd(s1 @ c2 @ s1)
        return float(np.trace(c1) + np.trace(c2) - 2 * np.trace(cross))

    def spectral_distance(self, x1, x2, k: int = 10) -> float:
        s1 = np.linalg.svd(x1 - x1.mean(0), compute_uv=False)[:k]
        s2 = np.linalg.svd(x2 - x2.mean(0), compute_uv=False)[:k]
        n = min(len(s1), len(s2))
        return float(np.linalg.norm(s1[:n] - s2[:n]))

    def common_genes_num(self) -> int:
        return len(self.common_genes)

    def get_dataset_meta_sim(self) -> float:
        """Discrete/continuous obs-column similarity (parity: :358)."""
        obs1, obs2 = self.origin_adata1.obs, self.origin_adata2.obs
        common_cols = [c for c in obs1.columns if c in obs2.columns]
        if not common_cols:
            return 0.0
        sims = []
        for c in common_cols:
            if pd.api.types.is_numeric_dtype(obs1[c]):
                m1, m2 = float(obs1[c].mean()), float(obs2[c].mean())
                denom = max(abs(m1), abs(m2), 1e-12)
                sims.append(1.0 - abs(m1 - m2) / denom)
            else:
                s1, s2 = set(obs1[c].astype(str)), set(obs2[c].astype(str))
                sims.append(len(s1 & s2) / max(len(s1 | s2), 1))
        return float(np.mean(sims))

    # --- driver -----------------------------------------------------------

    def compute_similarity(self, methods: Optional[List[str]] = None
                           ) -> Dict[str, float]:
        methods = methods or (self.SAMPLED_METRICS + ["mmd", "wasserstein",
                                                      "hausdorff", "chamfer",
                                                      "energy", "sinkhorn2",
                                                      "spectral",
                                                      "metadata_sim"])
        dispatch = {
            "cosine": self.cosine_sim_sampled,
            "pearson": self.pearson_corr_sampled,
            "jaccard": self.jaccard_sim_sampled,
            "js_distance": self.js_divergence_sampled,
            "mmd": self.compute_mmd,
            "wasserstein": self.wasserstein_dist,
            "hausdorff": self.get_Hausdorff,
            "chamfer": self.chamfer_distance,
            "energy": self.energy_distance_metric,
            "sinkhorn2": self.get_sinkhorn2,
            "bures": self.bures_distance,
            "spectral": self.spectral_distance,
        }
        out: Dict[str, List[float]] = {m: [] for m in methods}
        base = self.init_random_state if self.init_random_state is not None else 0
        for run in range(self.n_runs):
            x1, x2 = self.sample_cells(base + run)
            for m in methods:
                if m == "metadata_sim":
                    out[m].append(self.get_dataset_meta_sim())
                elif m == "common_genes_num":
                    out[m].append(self.common_genes_num())
                else:
                    out[m].append(dispatch[m](x1, x2))
        self.results = {m: float(np.mean(v)) for m, v in out.items()}
        return self.results

    def get_similarity_matrix_A2B(self, methods: Optional[List[str]] = None):
        return self.compute_similarity(methods)


def _sqrtm_psd(a: np.ndarray) -> np.ndarray:
    w, v = np.linalg.eigh(a)
    return (v * np.sqrt(np.maximum(w, 0))) @ v.T


def extract_type_target_params(item_text: str) -> dict:
    """Parse one loosely-formatted '- type:/target:/params:' YAML item into a
    dict (parity: anndata_similarity.py:580 — recovers sweep configs whose
    YAML came back mangled from storage)."""
    import re

    import yaml

    item_dict, params_dict = {}, {}
    current_param_key = None
    in_params = False
    for line in item_text.strip().split("\n"):
        stripped = line.strip()
        if stripped.startswith("- type:"):
            item_dict["type"] = stripped.split(":", 1)[1].strip()
        elif stripped.startswith("target:"):
            item_dict["target"] = stripped.split(":", 1)[1].strip()
        elif stripped.startswith("params:"):
            params_dict = {}
            in_params = stripped.split(":", 1)[1].strip() != "{}"
        elif in_params:
            if re.match(r"^\w+:$", stripped):
                current_param_key = stripped[:-1].strip()
                params_dict[current_param_key] = {}
            elif re.match(r"^- ", stripped):
                if current_param_key:
                    if not isinstance(params_dict[current_param_key], list):
                        params_dict[current_param_key] = []
                    params_dict[current_param_key].append(stripped[2:].strip())
            elif ":" in stripped:
                key, value = map(str.strip, stripped.split(":", 1))
                if current_param_key and isinstance(
                        params_dict.get(current_param_key), dict):
                    params_dict[current_param_key][key] = yaml.safe_load(value)
                else:
                    params_dict[key] = yaml.safe_load(value)
    item_dict["params"] = params_dict
    return item_dict


def fix_yaml_string(original_str: str) -> str:
    """Re-serialize a mangled pipeline-config YAML string
    (parity: anndata_similarity.py:620)."""
    import re

    import yaml

    yaml_str = original_str.replace("\\n", "\n").strip()
    config_list = []
    for item in re.split(r"(?=-\s*type:)", yaml_str):
        if not item.strip():
            continue
        if not item.strip().startswith("- type:"):
            logger.warning("An item does not start with '- type:', skipping: %s",
                           item[:80])
            continue
        config_list.append(extract_type_target_params(item))
    return yaml.dump(config_list, sort_keys=False)
