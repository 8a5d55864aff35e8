"""Zoo-wide TPU training benchmark matrix (BENCH_MATRIX.md generator).

Measures every model family's training cost at benchmark scale on the chip
(host-synced epoch deltas — the axon relay acknowledges small dispatch
streams before compute completes, so every timing ends in a device→host
read), plus the reference technology stack's cost on this host's single CPU
core where the stack is importable, plus achieved FLOP/s ÷ v5e peak for the
kernel-bound paths.

Honesty notes (also rendered into BENCH_MATRIX.md):
- The host baseline runs on ONE CPU core — the reference's own benchmark
  hardware is a V100 (tests/setup/run.sb); treat host columns as a stack
  comparison on this machine, not a GPU head-to-head.
- MFU uses the v5e bf16 peak (197 TFLOP/s); f32 paths are also divided by
  the same number, so their MFU ceiling is ~0.5 by construction.
- Scales follow the reference benchmark envelopes per family (CTA/clustering
  /imputation/multimodal at 10k cells × 2k genes; spatial at 10k spots;
  deconvolution at 4k real + 1k pseudo spots, where the reference's own
  datasets sit at 1-4k).

Usage:
  PYTHONPATH=/root/repo python benchmarks/matrix.py --cases actinn,svm
  PYTHONPATH=/root/repo python benchmarks/matrix.py          # everything
  PYTHONPATH=/root/repo python benchmarks/matrix.py --render  # CSV -> md
Results append/update results/bench_matrix.csv (resumable).
"""

import argparse
import csv
import os
import time

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "bench_matrix.csv")
MD_OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "BENCH_MATRIX.md")
V5E_PEAK_FLOPS = 197e12  # bf16; f32 paths divided by the same → ceiling ~0.5

FIELDS = ["name", "family", "scale", "tpu_ms_epoch", "tpu_s_total", "epochs",
          "mfu_pct", "gflops_epoch", "gtransc_epoch", "gflops_total",
          "host_ms_epoch", "host_s_total", "notes"]


def _sync(model):
    import jax
    # device linear heads hang their weights off .classifier/._mdl
    for inner in ("classifier", "_mdl"):
        model = getattr(model, inner, model) or model
    for attr in ("params", "z", "W", "B", "_W", "_cache"):
        obj = getattr(model, attr, None)
        if obj is None:
            continue
        leaves = [x for x in jax.tree_util.tree_leaves(obj)
                  if hasattr(x, "dtype") and hasattr(x, "ravel")]
        if leaves:
            np.asarray(leaves[0]).ravel()[:1]
            return
    # host-side models: nothing to sync


def epoch_delta(make_fit, e_small: int, e_big: int, reps: int = 2):
    """Per-epoch seconds via min-over-reps epoch deltas (bench.py recipe)."""
    make_fit(e_small)          # compile + caches
    smalls, bigs = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(make_fit(e_small))
        smalls.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _sync(make_fit(e_big))
        bigs.append(time.perf_counter() - t0)
    per = (min(bigs) - min(smalls)) / (e_big - e_small)
    if per <= 0:
        per = min(bigs) / e_big
    return per


def total_time(fit_once, reps: int = 1):
    fit_once()  # warm caches where any
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fit_once())
        best = min(best, time.perf_counter() - t0)
    return best


# --------------------------------------------------------------------------
# synthetic inputs at benchmark scale
# --------------------------------------------------------------------------

N_CELLS, N_GENES, N_TYPES = 10_000, 2_000, 8
N_SPOTS = 10_000
N_REAL, N_PSEUDO, N_CT = 4_000, 1_000, 8


def _expr(n=N_CELLS, g=N_GENES, t=N_TYPES, seed=0):
    from dance_tpu.datasets.synthetic import synthetic_expression
    return synthetic_expression(n, g, t, seed=seed)


def _bipartite_graph(x, dim=64, seed=0):
    import scipy.sparse as sp
    from dance_tpu.graph import Graph
    rng = np.random.default_rng(seed)
    expr = sp.csr_matrix(x)
    return Graph.from_cell_feature_matrix(
        expr, rng.random((x.shape[0], dim), dtype=np.float32),
        rng.random((x.shape[1], dim), dtype=np.float32))


def _knn_csr(feat, k=15):
    from dance_tpu.ops.neighbors import knn_graph
    return knn_graph(np.asarray(feat, np.float32), k, mode="connectivity")


CASES = {}


def case(name, family, scale, notes=""):
    def wrap(fn):
        CASES[name] = (fn, family, scale, notes)
        return fn
    return wrap


# ---- cell-type annotation -------------------------------------------------

@case("actinn", "cta", f"{N_CELLS}x{N_GENES}", "MLP; MFU analytic")
def run_actinn():
    from dance_tpu.modules.single_modality.cell_type_annotation import ACTINN
    x, y = _expr()
    x = np.log1p(x)
    yoh = np.eye(N_TYPES, dtype=np.float32)[y]

    m = ACTINN(hidden_dims=(100, 50, 25), random_seed=0)
    import jax.numpy as jnp
    xj = jnp.asarray(x)  # pre-upload: isolates training cost from the relay

    def make(e):
        m.fit(xj, yoh, num_epochs=e, batch_size=1000, seed=0)
        return m

    per = epoch_delta(make, 3, 30)
    # fwd+bwd ≈ 3 × fwd matmul flops over the full data per epoch
    dims = [N_GENES, 100, 50, 25, N_TYPES]
    flops = 3 * 2 * N_CELLS * sum(a * b for a, b in zip(dims, dims[1:]))
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/30",
                mfu_pct=100 * flops / per / V5E_PEAK_FLOPS)


@case("svm", "cta", f"{N_CELLS}x400pca", "device RFF-SVM, one-scan fit (host lane = sklearn SVC)")
def run_svm():
    from dance_tpu.modules.single_modality.cell_type_annotation import SVM
    from dance_tpu.ops.linalg import pca
    import jax.numpy as jnp
    x, y = _expr()
    # pre-uploaded device features (as_device passthrough methodology,
    # BENCH_NOTES round 4): measures the fit, not the 16 MB tunnel upload
    emb = pca(jnp.asarray(np.log1p(x)), 400).embedding

    def fit():
        m = SVM(None, random_state=0)
        m.fit(emb, y)
        return m

    return dict(tpu_s_total=total_time(fit))


@case("celltypist", "cta", f"{N_CELLS}x{N_GENES}", "device OvR logistic, one-scan fit (host lane = sklearn)")
def run_celltypist():
    from dance_tpu.modules.single_modality.cell_type_annotation import Celltypist
    import jax.numpy as jnp
    x, y = _expr()
    # pre-uploaded device matrix (as_device passthrough methodology,
    # BENCH_NOTES round 4): measures the fit, not the 80 MB tunnel upload
    xd = jnp.asarray(np.log1p(x))

    def fit():
        m = Celltypist(majority_voting=False)
        m.fit(xd, y)
        return m

    return dict(tpu_s_total=total_time(fit))


@case("singlecellnet", "cta", f"{N_CELLS}x{N_GENES}",
      "device forest, one-dispatch lockstep tree growth (host lane = sklearn RF)")
def run_singlecellnet():
    from dance_tpu.modules.single_modality.cell_type_annotation import SingleCellNet
    x, y = _expr()

    def fit():
        m = SingleCellNet(num_trees=100)
        m.fit(np.log1p(x), y)
        return m

    return dict(tpu_s_total=total_time(fit))


@case("scdeepsort", "cta", f"{N_CELLS}x{N_GENES} graph", "AdaptiveSAGE BSR; MFU analytic")
def run_scdeepsort():
    from dance_tpu.modules.single_modality.cell_type_annotation import ScDeepSort
    x, y = _expr()
    g = _bipartite_graph(x, dim=256)

    m = ScDeepSort(dim_in=256, dim_hid=256, num_layers=2, seed=0)

    def make(e):
        m.fit(g, y, epochs=e, val_ratio=0.0)  # auto: dense at this density
        return m

    per = epoch_delta(make, 5, 55)
    d = 256
    n_nodes = g.num_nodes
    # fwd+bwd ≈ 3 × (dense off-diagonal SpMM + dense transform) per layer
    flops = 3 * 2 * (2 * n_nodes * n_nodes * d + 2 * n_nodes * d * d)
    return dict(tpu_ms_epoch=per * 1e3, epochs="5/55",
                mfu_pct=100 * flops / per / V5E_PEAK_FLOPS)


@case("scheteronet", "cta", f"{N_CELLS}x{N_GENES}", "two-hop HetConv + ZINB")
def run_scheteronet():
    from dance_tpu.modules.single_modality.cell_type_annotation import scHeteroNet
    from dance_tpu.graph import Graph
    x, y = _expr()
    xl = np.log1p(x)
    adj = _knn_csr(xl[:, :50] @ np.random.default_rng(0).random((50, 32),
                                                               dtype=np.float32))
    g = Graph(adj, ndata={"feat": xl})

    m = scHeteroNet(hidden_channels=64, num_layers=2, seed=0)

    def make(e):
        m.fit(g, y, x_raw=x, epochs=e, use_bsr="auto")
        return m

    per = epoch_delta(make, 3, 23)
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23")


# ---- clustering -----------------------------------------------------------

def _clustering_inputs():
    x, y = _expr()
    sf = x.sum(1) / np.median(x.sum(1))
    return (np.log1p(x), x, sf), y


@case("scdeepcluster", "clustering", f"{N_CELLS}x{N_GENES}", "ZINB AE + DEC")
def run_scdeepcluster():
    from dance_tpu.modules.single_modality.clustering import ScDeepCluster
    inputs, y = _clustering_inputs()

    m = ScDeepCluster(input_dim=N_GENES, z_dim=32, seed=0)

    def make(e):
        m.fit(inputs, y, n_clusters=N_TYPES, epochs=e, pt_epochs=2)
        return m

    per = epoch_delta(make, 3, 23)
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23",
                notes="DEC epochs (pretrain fixed at 2)")


@case("scdcc", "clustering", f"{N_CELLS}x{N_GENES}", "ZINB AE + pairwise constraints")
def run_scdcc():
    from dance_tpu.modules.single_modality.clustering import ScDCC
    inputs, y = _clustering_inputs()

    m = ScDCC(input_dim=N_GENES, z_dim=32, n_clusters=N_TYPES, seed=0)

    def make(e):
        m.fit(inputs, y, epochs=e, pt_epochs=2)
        return m

    per = epoch_delta(make, 3, 23)
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23")


@case("scdsc", "clustering", f"{N_CELLS}x{N_GENES}", "AE + GNN fusion")
def run_scdsc():
    from dance_tpu.modules.single_modality.clustering import ScDSC
    (xl, x, sf), y = _clustering_inputs()
    adj = _knn_csr(xl[:, :64])
    inputs = (adj, xl, x, sf)

    m = ScDSC(n_input=N_GENES, n_clusters=N_TYPES, seed=0)

    def make(e):
        m.fit(inputs, y, epochs=e, pt_epochs=2, use_bsr="auto")
        return m

    per = epoch_delta(make, 3, 23)
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23")


@case("sctag", "clustering", f"{N_CELLS}x{N_GENES}", "TAGConv AE + ZINB")
def run_sctag():
    from dance_tpu.modules.single_modality.clustering import ScTAG
    (xl, x, sf), y = _clustering_inputs()
    adj = _knn_csr(xl[:, :64])
    inputs = (adj, xl, x, sf)

    m = ScTAG(n_clusters=N_TYPES, seed=0)

    def make(e):
        m.fit(inputs, y, epochs=e, pretrain_epochs=2, use_bsr="auto")
        return m

    per = epoch_delta(make, 3, 23)
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23")


@case("graphsc", "clustering", f"{N_CELLS}x{N_GENES} graph", "WeightedGraphConv AE")
def run_graphsc():
    from dance_tpu.modules.single_modality.clustering import GraphSC
    x, y = _expr()
    g = _bipartite_graph(x, dim=50)

    m = GraphSC(n_clusters=N_TYPES, seed=0)

    def make(e):
        m.fit(g, y, epochs=e)  # use_bsr="auto": dense adjacency at this density
        return m

    per = epoch_delta(make, 3, 23)
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23")


# ---- imputation -----------------------------------------------------------

@case("deepimpute", "imputation", f"{N_CELLS}x{N_GENES}", "vmapped MLP ensembles; MFU analytic")
def run_deepimpute():
    from dance_tpu.modules.single_modality.imputation import DeepImpute
    x, _ = _expr()
    xl = np.log1p(x)
    # gene-block batching (GeneHoldout semantics): 512-gene target blocks,
    # high-variance predictors outside each block
    var = xl.var(0)
    targets = [np.arange(i, min(i + 512, N_GENES))
               for i in range(0, N_GENES, 512)]
    predictors = []
    for t in targets:
        rest = np.setdiff1d(np.arange(N_GENES), t)
        predictors.append(rest[np.argsort(-var[rest])][:512])

    m = DeepImpute(predictors, targets, sub_outputdim=512, hidden_dim=256,
                   seed=0)

    def make(e):
        m.fit(xl, xl, n_epochs=e, batch_size=1000)
        return m

    per = epoch_delta(make, 3, 23)
    n_blocks = len(targets)
    flops = 3 * 2 * N_CELLS * n_blocks * (512 * 256 + 256 * 512)
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23",
                mfu_pct=100 * flops / per / V5E_PEAK_FLOPS)


@case("magic", "imputation", f"{N_CELLS}x{N_GENES}", "diffusion smoothing (one-shot)")
def run_magic():
    from dance_tpu.modules.single_modality.imputation import MAGIC
    x, _ = _expr()
    xl = np.log1p(x)

    def fit():
        m = MAGIC()
        m.fit(xl)
        return m

    return dict(tpu_s_total=total_time(fit))


@case("graphsci", "imputation", f"{N_CELLS}x{N_GENES}", "gene-graph VAE + MultiplyLayer AE")
def run_graphsci():
    from dance_tpu.modules.single_modality.imputation import GraphSCI
    from dance_tpu.graph import Graph
    import scipy.sparse as sp
    x, _ = _expr()
    xl = np.log1p(x)
    corr = np.corrcoef(xl[:2000].T)
    adj = sp.csr_matrix((np.abs(corr) > 0.3).astype(np.float32))
    deg = np.asarray(adj.sum(1)).ravel()
    dinv = sp.diags(1.0 / np.sqrt(np.maximum(deg, 1e-12)))
    g = Graph(sp.csr_matrix(dinv @ adj @ dinv))

    m = GraphSCI(num_cells=N_CELLS, num_genes=N_GENES, seed=0)

    def make(e):
        m.n_epochs = e
        m.fit(g, xl, x)
        return m

    per = epoch_delta(make, 2, 12)
    return dict(tpu_ms_epoch=per * 1e3, epochs="2/12")


@case("scgnn2", "imputation", f"{N_CELLS}x{N_GENES}", "multi-AE EM loop (one outer iter)")
def run_scgnn2():
    from dance_tpu.modules.single_modality.imputation import ScGNN2
    x, _ = _expr()

    def fit():
        m = ScGNN2(seed=0, total_epoch=1, feature_epoch=20, graph_epoch=20,
                   cluster_epoch=20)
        m.fit(np.log1p(x))
        return m

    return dict(tpu_s_total=total_time(fit), notes="1 EM iter, 20 AE epochs each")


# ---- multimodal -----------------------------------------------------------

def _mm_inputs(n=N_CELLS, g=N_GENES, p=134):
    x1, y = _expr(n, g)
    rng = np.random.default_rng(1)
    w = rng.random((g, p)).astype(np.float32)
    x2 = np.log1p(x1) @ w / g * 4
    return np.log1p(x1), x2.astype(np.float32), y


@case("babel", "predict_modality", f"{N_CELLS}x{N_GENES}->134", "dual AE; MFU analytic")
def run_babel():
    from dance_tpu.modules.multi_modality.predict_modality import BabelWrapper
    x1, x2, _ = _mm_inputs()

    m = BabelWrapper(seed=0)

    def make(e):
        m.fit(np.expm1(x1), x2, epochs=e, batch_size=512, val_ratio=0)
        return m

    per = epoch_delta(make, 3, 23)
    h = 64
    flops = 3 * 2 * N_CELLS * (N_GENES * h * 2 + h * 134 * 2) * 2
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23",
                mfu_pct=100 * flops / per / V5E_PEAK_FLOPS)


@case("cmae_predict", "predict_modality", f"{N_CELLS}x{N_GENES}->134", "cross-modal AE+GAN")
def run_cmae_predict():
    from dance_tpu.modules.multi_modality.predict_modality import CMAE
    x1, x2, _ = _mm_inputs()

    m = CMAE(seed=0)
    import jax.numpy as jnp
    x1j, x2j = jnp.asarray(x1), jnp.asarray(x2)  # pre-upload

    def make(e):
        m.fit(x1j, x2j, epochs=e)
        return m

    per = epoch_delta(make, 5, 55)
    return dict(tpu_ms_epoch=per * 1e3, epochs="5/55")


@case("scmm", "predict_modality", f"{N_CELLS}x{N_GENES}->134", "MoE multimodal VAE")
def run_scmm():
    from dance_tpu.modules.multi_modality.predict_modality import MMVAE
    x1, x2, _ = _mm_inputs()

    m = MMVAE(seed=0)
    import jax.numpy as jnp
    x1j, x2j = jnp.asarray(np.expm1(x1)), jnp.asarray(x2)  # pre-upload

    def make(e):
        m.fit(x1j, x2j, epochs=e, batch_size=512)
        return m

    per = epoch_delta(make, 3, 23)
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23")


@case("scmogcn_predict", "predict_modality", f"{N_CELLS}x{N_GENES}->134",
      "full hetero-GNN, dense adj; MFU analytic")
def run_scmogcn_predict():
    from dance_tpu.modules.multi_modality.predict_modality import ScMoGCNWrapper
    x1, x2, _ = _mm_inputs()
    raw = np.expm1(x1)

    m = ScMoGCNWrapper(seed=0)

    def make(e):
        m.fit(raw, x2, epochs=e, val_fraction=0.0)  # auto: dense adjacency
        return m

    per = epoch_delta(make, 3, 23)
    d = 48
    conv = 4
    n_feats = N_GENES + 134
    # fwd+bwd ≈ 3 × (two dense SpMMs + two dense transforms) per conv layer
    flops = 3 * conv * (2 * 2 * N_CELLS * n_feats * d
                        + 2 * 2 * (N_CELLS + n_feats) * d * d)
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23",
                mfu_pct=100 * flops / per / V5E_PEAK_FLOPS)


@case("cmae_match", "match_modality", f"{N_CELLS}x{N_GENES}<->134", "matching head")
def run_cmae_match():
    from dance_tpu.modules.multi_modality.match_modality import CMAE
    x1, x2, _ = _mm_inputs()

    m = CMAE(seed=0)
    import jax.numpy as jnp
    x1j, x2j = jnp.asarray(x1), jnp.asarray(x2)  # pre-upload

    def make(e):
        m.fit(x1j, x2j, epochs=e)
        return m

    per = epoch_delta(make, 5, 55)
    return dict(tpu_ms_epoch=per * 1e3, epochs="5/55")


@case("scmm_match", "match_modality", f"{N_CELLS}x{N_GENES}<->134", "MoE VAE matching")
def run_scmm_match():
    from dance_tpu.modules.multi_modality.match_modality import MMVAE
    x1, x2, _ = _mm_inputs()

    m = MMVAE(seed=0)
    import jax.numpy as jnp
    x1j, x2j = jnp.asarray(np.expm1(x1)), jnp.asarray(x2)  # pre-upload

    def make(e):
        m.fit(x1j, x2j, epochs=e, batch_size=512)
        return m

    per = epoch_delta(make, 3, 23)
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23")


@case("scmogcn_match", "match_modality", f"{N_CELLS}x{N_GENES}<->134",
      "contrastive over propagated features")
def run_scmogcn_match():
    from dance_tpu.modules.multi_modality.match_modality import ScMoGCNWrapper
    x1, x2, _ = _mm_inputs(n=N_CELLS, g=512, p=134)  # one-hot propagation is O(g^2)

    m = ScMoGCNWrapper(latent_dim=64, seed=0)

    def make(e):
        m.fit(x1, x2, epochs=e, batch_size=4096, early_stopping=10**9)
        return m

    per = epoch_delta(make, 3, 23)
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23",
                notes="g=512 (propagation features are g-dim one-hot)")


@case("jae", "joint_embedding", f"{N_CELLS}x{N_GENES}+134", "AE + aux heads")
def run_jae():
    from dance_tpu.modules.multi_modality.joint_embedding import JAEWrapper
    x1, x2, y = _mm_inputs()

    m = JAEWrapper(seed=0)
    import jax.numpy as jnp
    x1j, x2j = jnp.asarray(x1), jnp.asarray(x2)  # pre-upload

    def make(e):
        m.fit(x1j, x2j, cell_type=y.astype(str), epochs=e)
        return m

    per = epoch_delta(make, 5, 55)
    return dict(tpu_ms_epoch=per * 1e3, epochs="5/55")


@case("dcca", "joint_embedding", f"{N_CELLS}x{N_GENES}+134", "dual VAE + cycle")
def run_dcca():
    from dance_tpu.modules.multi_modality.joint_embedding import DCCA
    x1, x2, _ = _mm_inputs()

    m = DCCA(seed=0)
    import jax.numpy as jnp
    x1j, x2j = jnp.asarray(x1), jnp.asarray(x2)  # pre-upload

    def make(e):
        m.fit(x1j, x2j, epochs=e)
        return m

    per = epoch_delta(make, 3, 23)
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23")


@case("scmvae", "joint_embedding", f"{N_CELLS}x{N_GENES}+134", "PoE VAE")
def run_scmvae():
    from dance_tpu.modules.multi_modality.joint_embedding import scMVAE
    x1, x2, _ = _mm_inputs()

    m = scMVAE(seed=0, n_centroids=8)
    import jax.numpy as jnp
    x1j = jnp.asarray(np.expm1(x1))  # pre-upload
    x2j = jnp.asarray(np.expm1(np.abs(x2)))

    def make(e):
        m.fit(x1j, x2j, epochs=e)
        return m

    per = epoch_delta(make, 3, 23)
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23")


@case("scmogcn_je", "joint_embedding", f"{N_CELLS}x{N_GENES}+134", "GNN trunk + ct head")
def run_scmogcn_je():
    from dance_tpu.modules.multi_modality.joint_embedding import ScMoGCNWrapper
    x1, x2, y = _mm_inputs()

    m = ScMoGCNWrapper(seed=0)

    def make(e):
        m.fit(x1, x2, cell_type=y.astype(str), epochs=e)  # auto: dense
        return m

    per = epoch_delta(make, 3, 23)
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23")


@case("scmogcn_v2", "joint_embedding", f"{N_CELLS}x{N_GENES}+134",
      "structured latent, sampled minibatches")
def run_scmogcn_v2():
    from dance_tpu.modules.multi_modality.joint_embedding.scmogcnv2 import (
        ScMoGCNWrapperV2)
    x1, x2, y = _mm_inputs()

    m = ScMoGCNWrapperV2(seed=0, early_stopping=10**9)

    def make(e):
        m.fit(x1, x2, cell_type=y.astype(str), epochs=e)
        return m

    per = epoch_delta(make, 2, 12)
    return dict(tpu_ms_epoch=per * 1e3, epochs="2/12")


# ---- spatial domain -------------------------------------------------------

def _spatial_inputs(n=N_SPOTS, g=N_GENES):
    x, y = _expr(n, g, 6, seed=3)
    rng = np.random.default_rng(3)
    coords = rng.random((n, 2)).astype(np.float32) * 100
    return np.log1p(x), coords, y


@case("spagcn", "spatial", f"{N_SPOTS}x50pca", "GCN + DEC on spatial graph")
def run_spagcn():
    from dance_tpu.modules.spatial.spatial_domain import SpaGCN
    from dance_tpu.ops.linalg import pca
    import jax.numpy as jnp
    xl, coords, _ = _spatial_inputs()
    emb = np.asarray(pca(jnp.asarray(xl), 50).embedding)
    dist = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2)
                   .sum(-1)).astype(np.float32)
    probe = SpaGCN(seed=0)
    l = probe.search_l(0.5, dist)

    m = SpaGCN(seed=0)

    def make(e):
        m.set_l(l)
        m.fit((emb, dist), epochs=e)
        return m

    per = epoch_delta(make, 3, 23)
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23")


@case("stagate", "spatial", f"{N_SPOTS}x{N_GENES}", "fused Pallas GAT AE; MFU analytic")
def run_stagate():
    from dance_tpu.modules.spatial.spatial_domain import Stagate
    xl, coords, _ = _spatial_inputs()
    adj = _knn_csr(coords, k=8)

    m = Stagate(hidden_dims=(N_GENES, 512, 30), seed=0)

    def make(e):
        m.fit((xl, adj), epochs=e, n_clusters=6, use_bsr=True)
        return m

    per = epoch_delta(make, 5, 55)
    import scipy.sparse as sp
    from dance_tpu.ops.pallas_kernels import rcm_reorder, bsr_from_scipy
    _, a = rcm_reorder(sp.csr_matrix(adj))
    nb = bsr_from_scipy(a).nb
    # per epoch: 2 fused GAT aggregations fwd (+bwd ~2x) over tiles at widths
    # 512 and 2000-d decode, plus dense kernels
    flops = 3 * (2 * nb * 128 * 128 * (512 + 512 + 2 * N_GENES)
                 + 2 * N_SPOTS * N_GENES * 512 * 2)
    return dict(tpu_ms_epoch=per * 1e3, epochs="5/55",
                mfu_pct=100 * flops / per / V5E_PEAK_FLOPS)


@case("louvain", "spatial", f"{N_SPOTS} kNN graph", "host-side community detection")
def run_louvain():
    from dance_tpu.modules.spatial.spatial_domain import Louvain
    xl, coords, _ = _spatial_inputs()
    adj = _knn_csr(xl[:, :50])

    def fit():
        m = Louvain()
        m.fit(adj)
        return m

    return dict(tpu_s_total=total_time(fit))


@case("stlearn", "spatial", f"{N_SPOTS}x{N_GENES}",
      "SME kmeans, tol-converged one-dispatch restarts")
def run_stlearn():
    import jax.numpy as jnp

    from dance_tpu.modules.spatial.spatial_domain import StKmeans
    xl, coords, _ = _spatial_inputs()
    # pre-uploaded device matrix (as_device passthrough methodology,
    # BENCH_NOTES round 4): measures the fit, not the 80 MB tunnel upload
    xd = jnp.asarray(xl)

    def fit():
        m = StKmeans(n_clusters=6)
        m.fit(xd)
        return m

    return dict(tpu_s_total=total_time(fit))


@case("efnst", "spatial", f"{N_SPOTS}x{N_GENES}", "conv image feats + graph AE")
def run_efnst():
    from dance_tpu.modules.spatial.spatial_domain.EfNST import EfNsSTRunner
    xl, coords, _ = _spatial_inputs()
    adj = _knn_csr(coords, k=8)
    import scipy.sparse as sp
    rng = np.random.default_rng(4)
    concat = np.concatenate([xl[:, :200],
                             rng.random((N_SPOTS, 32), dtype=np.float32)], 1)

    m = EfNsSTRunner(n_clusters=6, z_dim=16, seed=0)

    def make(e):
        m.fit(concat_X=concat, graph_dict=sp.csr_matrix(adj), epochs=e,
              dec_epochs=2)
        return m

    per = epoch_delta(make, 3, 23)
    return dict(tpu_ms_epoch=per * 1e3, epochs="3/23")


# ---- deconvolution --------------------------------------------------------

def _deconvo_inputs():
    rng = np.random.default_rng(5)
    x_ref, labels = _expr(2000, N_GENES, N_CT, seed=5)
    profiles = np.stack([x_ref[labels == c].mean(0) for c in range(N_CT)])
    portions = rng.dirichlet(np.ones(N_CT), N_REAL)
    x_mix = rng.poisson(portions @ profiles * 3).astype(np.float32)
    coords = rng.random((N_REAL, 2)).astype(np.float32) * 100
    return profiles, portions, x_mix, coords, rng


@case("card", "deconvolution", f"{N_REAL}x{N_GENES}", "CAR iterative updates")
def run_card():
    import pandas as pd
    from dance_tpu.modules.spatial.cell_type_deconvo import Card
    profiles, portions, x_mix, coords, _ = _deconvo_inputs()

    m = Card(pd.DataFrame(profiles.T,
                          columns=[f"ct{i}" for i in range(N_CT)]))

    def make(e):
        m.fit((x_mix, coords), max_iter=e)
        return m

    per = epoch_delta(make, 5, 55)
    return dict(tpu_ms_epoch=per * 1e3, epochs="5/55", notes="per CAR iteration")


@case("spatialdecon", "deconvolution", f"{N_REAL}x{N_GENES}", "log-normal regression")
def run_spatialdecon():
    from dance_tpu.modules.spatial.cell_type_deconvo import SpatialDecon
    profiles, portions, x_mix, _, _ = _deconvo_inputs()

    m = SpatialDecon(ct_profile=profiles.T, ct_select=list(range(N_CT)))

    def make(e):
        m.fit(x_mix, lr=1e-2, max_iter=e)
        return m

    per = epoch_delta(make, 20, 220)
    return dict(tpu_ms_epoch=per * 1e3, epochs="20/220", notes="per optimizer iter")


@case("spotlight", "deconvolution", f"{N_REAL}x{N_GENES}", "NMF + NNLS")
def run_spotlight():
    from dance_tpu.modules.spatial.cell_type_deconvo import SPOTlight
    profiles, portions, x_mix, _, rng = _deconvo_inputs()
    x_ref, labels = _expr(2000, N_GENES, N_CT, seed=5)

    m = SPOTlight(ref_count=x_ref, ref_annot=labels.astype(str),
                  ct_select=[str(i) for i in range(N_CT)], rank=N_CT)

    def make(e):
        m.fit(x_mix, max_iter=e)
        return m

    per = epoch_delta(make, 20, 220)
    return dict(tpu_ms_epoch=per * 1e3, epochs="20/220", notes="per NMF iter")


@case("dstg", "deconvolution", f"{N_PSEUDO}+{N_REAL} spots", "GCN on link graph")
def run_dstg():
    from dance_tpu.modules.spatial.cell_type_deconvo import DSTG
    from dance_tpu.transforms.graph.dstg_graph import compute_dstg_adj
    profiles, portions, x_mix, _, rng = _deconvo_inputs()
    ps_port = rng.dirichlet(np.ones(N_CT), N_PSEUDO)
    ps_x = rng.poisson(ps_port @ profiles * 3).astype(np.float32)
    feats = np.log1p(np.concatenate([ps_x, x_mix], axis=0))
    adj = compute_dstg_adj(ps_x, x_mix, k_filter=30, num_cc=10)
    y = np.concatenate([ps_port, np.zeros_like(portions)], axis=0)

    m = DSTG(seed=0)

    def make(e):
        m.fit((feats, adj), y, max_epochs=e, use_bsr=True)
        return m

    per = epoch_delta(make, 5, 55)
    return dict(tpu_ms_epoch=per * 1e3, epochs="5/55")


@case("stdgcn", "deconvolution", f"{N_PSEUDO}+{N_REAL} spots", "two-tower conGCN")
def run_stdgcn():
    from dance_tpu.modules.spatial.cell_type_deconvo import StdGCN
    profiles, portions, x_mix, coords, rng = _deconvo_inputs()
    ps_port = rng.dirichlet(np.ones(N_CT), N_PSEUDO)
    ps_x = rng.poisson(ps_port @ profiles * 3).astype(np.float32)
    feats = np.log1p(np.concatenate([ps_x, x_mix], axis=0))
    y = np.concatenate([ps_port, np.zeros_like(portions)], axis=0)

    m = StdGCN(seed=0)

    def make(e):
        # "auto" format dispatch: the MNN-coupled towers tile badly under BSR
        # (union-RCM tile expansion ~200x at this scale), so auto picks
        # csr/dense — forcing BSR here cost 164 ms/epoch vs single-digit
        m.fit((feats, coords), y, max_epochs=e, early_stopping_patience=0,
              use_bsr="auto")
        return m

    per = epoch_delta(make, 5, 55)
    return dict(tpu_ms_epoch=per * 1e3, epochs="5/55")


# --------------------------------------------------------------------------
# runner + renderer
# --------------------------------------------------------------------------

def load_results():
    rows = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as fh:
            for row in csv.DictReader(fh):
                rows[row["name"]] = row
    return rows


def save_results(rows):
    """Merge-on-save: re-read the CSV and overlay only this process's
    non-empty cells, so two lanes (e.g. a TPU lane and a host lane) never
    clobber each other's freshly written columns."""
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    merged = load_results()
    for name, row in rows.items():
        tgt = merged.setdefault(name, {})
        for k, v in row.items():
            if v != "":
                tgt[k] = v
    rows.clear()
    rows.update(merged)
    with open(RESULTS, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=FIELDS)
        w.writeheader()
        for name in sorted(merged):
            w.writerow({k: merged[name].get(k, "") for k in FIELDS})


def render():
    rows = load_results()
    lines = [
        "# BENCH_MATRIX — zoo-wide TPU training measurements",
        "",
        "One v5e chip via the axon relay; host-synced epoch-delta timings "
        "(see benchmarks/matrix.py docstring for methodology and scales).",
        "",
        "Caveats: the host column (where present) is the reference stack on "
        "THIS machine's single CPU core, not a V100 — treat it as a stack "
        "comparison, not a GPU head-to-head. MFU divides by the v5e bf16 "
        "peak (197 TFLOP/s); f32 paths cap at ~50% by construction. "
        "Epoch deltas exclude per-fit fixed costs (inputs pre-uploaded / "
        "device caches warm — see BENCH_NOTES.md round-3 methodology); the "
        "host lane measures the same steady-state region.",
        "",
        "GFLOP/epoch and Gtransc/epoch are XLA `cost_analysis` totals over "
        "every executable the fit dispatches, differenced across two epoch "
        "counts (`--flops` lane) — exact work, not an analytic estimate. "
        "Where GFLOP/epoch is present, MFU % = counted FLOPs ÷ measured "
        "epoch time ÷ peak. Gtransc counts transcendental evaluations "
        "(exp/log/lgamma/erf…): rows with Gtransc comparable to GFLOP are "
        "VPU-transcendental-bound (the NB/ZINB likelihood families), where "
        "FLOP-based MFU understates how close the run is to its real "
        "roofline.",
        "",
        "| method | family | scale | TPU ms/epoch | TPU total s | "
        "GFLOP/epoch | Gtransc/epoch | MFU % | "
        "host ms/epoch | host total s | TPU× | notes |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name in sorted(rows, key=lambda n: (rows[n]["family"], n)):
        r = rows[name]
        def f(key, fmt="{:.2f}"):
            v = r.get(key, "")
            try:
                return fmt.format(float(v))
            except (TypeError, ValueError):
                return ""
        speedup = ""
        try:
            speedup = "{:.0f}×".format(
                float(r["host_ms_epoch"]) / float(r["tpu_ms_epoch"]))
        except (KeyError, TypeError, ValueError, ZeroDivisionError):
            try:
                speedup = "{:.1f}×".format(
                    float(r["host_s_total"]) / float(r["tpu_s_total"]))
            except (KeyError, TypeError, ValueError, ZeroDivisionError):
                pass
        gflop = f("gflops_epoch") or (
            f"{f('gflops_total')} total" if f("gflops_total") else "")
        lines.append(
            f"| {name} | {r['family']} | {r['scale']} | {f('tpu_ms_epoch')} | "
            f"{f('tpu_s_total')} | {gflop} | {f('gtransc_epoch')} | "
            f"{f('mfu_pct')} | {f('host_ms_epoch')} | "
            f"{f('host_s_total')} | {speedup} | {r.get('notes', '')} |")
    lines += _render_scale_section()
    with open(MD_OUT, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {MD_OUT} ({len(rows)} methods)")


def _render_scale_section():
    """100k-cell scale lane (results/scale_lane.csv, written from
    benchmarks/run_scale_lane.sh runs): the 10k matrix shapes leave the MXU
    idle — at toy scale most rows are latency-bound and MFU is noise. This
    section records one representative per family at 100,000 cells, where
    the reference documents OOM/hour-scale envelopes
    (reference tests/test_bench.py:16-20)."""
    path = os.path.join(os.path.dirname(RESULTS), "scale_lane.csv")
    if not os.path.exists(path):
        return []
    lines = [
        "",
        "## 100k-cell scale lane",
        "",
        "One representative per family at 100,000 cells × 2,000 genes on the "
        "single v5e chip (host-synced epoch deltas; first-fit column includes "
        "compile + the ~850 MB dataset upload). The 10k matrix above is "
        "latency-/dispatch-bound for most models; this is the regime that "
        "feeds the MXU. Bound analysis per row in BENCH_NOTES.md (round 5).",
        "",
        "| model | family | first fit s | steady ms/epoch | cells/s | bound |",
        "|---|---|---|---|---|---|",
    ]
    with open(path, newline="") as fh:
        for r in csv.DictReader(fh):
            lines.append(
                f"| {r['model']} | {r['family']} | {r['first_fit_s']} | "
                f"{r['ms_epoch']} | {r['cells_per_s']} | {r['bound']} |")
    return lines


_FLOP_LAST = {}


def _flop_epoch_delta(make, e_small, e_big, reps=2):
    """Flop-lane stand-in for epoch_delta: exact per-epoch FLOPs by
    differencing XLA cost_analysis totals at two epoch counts (FLOPs are
    deterministic, no noise to average away). The window widens when a
    small delta vanishes — DEC-style drivers quantize their epoch count to
    update-interval chunks, so a 2-epoch window can land inside one chunk."""
    from benchmarks import flopcount as fc
    make(e_small)               # warm: compiles + device-input caches
    fc.reset()
    make(e_small)
    f1 = fc.totals()
    for window in (2, 10, 20):
        fc.reset()
        make(e_small + window)
        f2 = fc.totals()
        if f2["flops"] > f1["flops"]:
            break
    per_epoch = (f2["flops"] - f1["flops"]) / window
    body_f, body_t = f2["while_body"]
    # A tiny positive delta (re-jitted helper, one extra refresh dispatch)
    # must not shadow the traced-bound fallback: if the delta per epoch is
    # smaller than one execution of the dominant while body, the epoch loop
    # itself did NOT scale with the count — fall through to the body path.
    # Likewise require a non-negligible absolute delta (>= 1 MFLOP/epoch).
    delta_ok = per_epoch >= max(1e6, 0.5 * body_f)
    if per_epoch > 0 and delta_ok:
        _FLOP_LAST.update(
            gflops_epoch=per_epoch / 1e9,
            gtransc_epoch=(f2["transcendentals"] - f1["transcendentals"])
            / window / 1e9)
    elif body_f > 0:
        # traced-bound epoch loop (DEC family, CARD): the jaxpr is identical
        # at any epoch count, so difference = 0 — but one iteration of the
        # dominant lax.while_loop body IS one epoch; use its count directly.
        # (An update_interval>1 driver's cond picks the refresh branch, so
        # this is a slight upper bound for scDSC-style chunked refreshes.)
        _FLOP_LAST.update(gflops_epoch=body_f / 1e9, gtransc_epoch=body_t / 1e9)
    # else: leave _FLOP_LAST unset — a ~0 value must never be published as a
    # measurement (the writer skips empty fields; BENCH_MATRIX marks them).
    return float("nan")


def _flop_total(fit_once, reps=1):
    from benchmarks import flopcount as fc
    fit_once()                  # warm
    fc.reset()
    fit_once()
    f = fc.totals()
    if f["calls"]:
        _FLOP_LAST.update(gflops_total=f["flops"] / 1e9)
    return float("nan")


def run_flops(want):
    """Flop lane: fill gflops_epoch/gtransc_epoch/gflops_total for each case
    and recompute mfu_pct from the already-measured TPU timings. Runs on the
    SAME backend as the timing lane (TPU via axon) so backend-dependent code
    paths (use_bsr / dense-regime dispatch) match the measured program."""
    import jax
    # Counts come from tracing (backend-independent), but the backend decides
    # which code path each fit takes (use_bsr / dense-regime dispatch): run
    # this lane on the SAME backend the timing lane used (TPU) so the counted
    # program is the measured program. The CPU backend also works but is
    # minutes-slow per whole-fit compile on this host and resolves sparse
    # paths differently.
    print(f"flop lane on backend: {jax.default_backend()}")
    from benchmarks import flopcount as fc
    fc.install()
    global epoch_delta, total_time
    epoch_delta, total_time = _flop_epoch_delta, _flop_total
    rows = load_results()
    for name in want:
        if name not in CASES:
            print(f"!! unknown case {name}")
            continue
        fn = CASES[name][0]
        print(f"== flops {name}", flush=True)
        _FLOP_LAST.clear()
        t0 = time.time()
        try:
            fn()
        except Exception as e:
            print(f"   FAILED: {type(e).__name__}: {e}")
            continue
        if not _FLOP_LAST:
            print("   no jitted work recorded (host-side case)")
            continue
        row = rows.setdefault(name, {"name": name})
        row.update({k: f"{v:.4f}" for k, v in _FLOP_LAST.items()})
        # measured MFU: XLA-counted FLOPs over the TPU-measured epoch time
        try:
            per_s = float(row["tpu_ms_epoch"]) / 1e3
            row["mfu_pct"] = "{:.4f}".format(
                100 * float(row["gflops_epoch"]) * 1e9 / per_s / V5E_PEAK_FLOPS)
            row["notes"] = (row.get("notes", "") or "").replace(
                "; MFU analytic", "").replace("MFU analytic", "").strip("; ")
        except (KeyError, TypeError, ValueError, ZeroDivisionError):
            pass
        save_results(rows)
        print(f"   {_FLOP_LAST} [{time.time() - t0:.0f}s]", flush=True)
    render()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="", help="comma-separated name filter")
    ap.add_argument("--render", action="store_true")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--flops", action="store_true",
                    help="flop lane: count per-epoch FLOPs by tracing on the "
                         "same (TPU) backend the timing lane used")
    args = ap.parse_args()
    if args.render:
        render()
        return
    if args.list:
        print("\n".join(sorted(CASES)))
        return
    want = [c for c in args.cases.split(",") if c] or sorted(CASES)
    if args.flops:
        run_flops(want)
        return
    rows = load_results()
    for name in want:
        if name not in CASES:
            print(f"!! unknown case {name}")
            continue
        fn, family, scale, notes = CASES[name]
        print(f"== {name} ({family}, {scale})", flush=True)
        t0 = time.time()
        try:
            res = fn()
        except Exception as e:  # record the failure, keep going
            print(f"   FAILED: {type(e).__name__}: {e}")
            continue
        res.setdefault("notes", notes)
        if notes and res["notes"] != notes:
            res["notes"] = f"{notes}; {res['notes']}"
        row = dict(name=name, family=family, scale=scale, **{
            k: (f"{v:.4f}" if isinstance(v, float) else v)
            for k, v in res.items()})
        rows[name] = row
        save_results(rows)
        print(f"   {row} [{time.time() - t0:.0f}s]", flush=True)
    render()


if __name__ == "__main__":
    main()
