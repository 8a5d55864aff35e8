"""Host-stack (reference implementation, single CPU core) timings at
BENCH_MATRIX scale.

Fills the ``host_ms_epoch`` / ``host_s_total`` columns of
``results/bench_matrix.csv`` by running the REFERENCE implementations (via
:mod:`refshim`, torch CPU / sklearn / numpy) on the same synthetic inputs and
scales as :mod:`matrix`. Methods whose reference depends on DGL/PyG
(scdeepsort, graphsc, sctag, stagate, scheteronet, graphsci, spotlight,
scmogcn*, efnst) cannot import the reference here — for those the
``@standin`` cases below reproduce the reference's per-epoch compute pattern
with torch's own CPU kernels (sparse COO SpMM for the graph aggregations,
dense linears, same loss family) and their rows are marked
"torch-CPU stand-in" in the notes column.

Honest caveats (also in BENCH_MATRIX.md): this host has ONE CPU core; the
reference's own benchmark hardware is a V100. Treat the column as a
technology-stack comparison on identical data, not a GPU head-to-head.

Usage (CPU backend, so the TPU stays free):
    PYTHONPATH="/root/repo:$(echo $PYTHONPATH | tr ':' '\n' | grep -v axon_site | paste -sd:)" \
    JAX_PLATFORMS=cpu python benchmarks/matrix_host.py [--cases a,b,c]
"""

import argparse
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import refshim  # noqa: E402
from matrix import (CASES as TPU_CASES, N_CELLS, N_CT, N_GENES, N_PSEUDO,  # noqa: E402
                    N_REAL, N_SPOTS, N_TYPES, _bipartite_graph,
                    _clustering_inputs, _deconvo_inputs, _expr, _knn_csr,
                    _mm_inputs, _spatial_inputs, load_results, render,
                    save_results)

HOST_CASES = {}


def case(name):
    def wrap(fn):
        HOST_CASES[name] = fn
        return fn
    return wrap


def epoch_delta_host(make_fit, e_small: int, e_big: int):
    """Per-epoch seconds on the host stack (no device sync needed; single
    rep — CPU timings are far less jittery than the axon relay)."""
    t0 = time.perf_counter()
    make_fit(e_small)
    small = time.perf_counter() - t0
    t0 = time.perf_counter()
    make_fit(e_big)
    big = time.perf_counter() - t0
    per = (big - small) / (e_big - e_small)
    return per if per > 0 else big / e_big


# ---- cell-type annotation -------------------------------------------------

@case("actinn")
def host_actinn():
    import torch
    RefACTINN = refshim.import_ref(
        "dance.modules.single_modality.cell_type_annotation.actinn", "ACTINN")
    x, y = _expr()
    x = np.log1p(x)
    onehot = np.eye(N_TYPES, dtype=np.float32)[y]
    xt, yt = torch.from_numpy(x), torch.from_numpy(onehot)

    def make(e):
        torch.manual_seed(0)
        ref = RefACTINN(hidden_dims=(100, 50, 25), lambd=0.01, device="cpu",
                        random_seed=0)
        ref.fit(xt, yt, num_epochs=e, batch_size=1000, seed=0)

    return dict(host_ms_epoch=epoch_delta_host(make, 2, 10) * 1e3)


# ---- clustering -----------------------------------------------------------

@case("scdeepcluster")
def host_scdeepcluster():
    import torch
    RefSDC = refshim.import_ref(
        "dance.modules.single_modality.clustering.scdeepcluster",
        "ScDeepCluster")
    (xl, x, sf), y = _clustering_inputs()
    n_counts = x.sum(1)

    def make(e):
        torch.manual_seed(0)
        np.random.seed(0)
        ref = RefSDC(input_dim=N_GENES, z_dim=32, encodeLayer=[256, 64],
                     decodeLayer=[64, 256], device="cpu")
        ref.fit((xl, x, n_counts), y, n_clusters=N_TYPES, epochs=e,
                pt_epochs=2, batch_size=256)

    return dict(host_ms_epoch=epoch_delta_host(make, 2, 6) * 1e3)


@case("scdcc")
def host_scdcc():
    import torch
    RefScDCC = refshim.import_ref(
        "dance.modules.single_modality.clustering.scdcc", "ScDCC")
    (xl, x, sf), y = _clustering_inputs()
    n_counts = x.sum(1)
    rng = np.random.default_rng(0)
    i1, i2 = rng.integers(0, len(y), 400), rng.integers(0, len(y), 400)
    ml = y[i1] == y[i2]
    ml1, ml2 = i1[ml][:100], i2[ml][:100]
    cl1, cl2 = i1[~ml][:100], i2[~ml][:100]

    def make(e):
        torch.manual_seed(0)
        np.random.seed(0)
        ref = RefScDCC(input_dim=N_GENES, z_dim=32, n_clusters=N_TYPES,
                       encodeLayer=[256, 64], decodeLayer=[64, 256],
                       device="cpu")
        ref.fit((xl, x, n_counts), y, ml_ind1=ml1, ml_ind2=ml2, cl_ind1=cl1,
                cl_ind2=cl2, epochs=e, pt_epochs=2, batch_size=256)

    return dict(host_ms_epoch=epoch_delta_host(make, 2, 6) * 1e3)


@case("scdsc")
def host_scdsc():
    import tempfile

    import torch
    RefScDSC = refshim.import_ref(
        "dance.modules.single_modality.clustering.scdsc", "ScDSC")
    (xl, x, sf), y = _clustering_inputs()
    n_counts = x.sum(1)
    adj = _knn_csr(xl[:, :64])

    def make(e):
        torch.manual_seed(0)
        np.random.seed(0)
        with tempfile.TemporaryDirectory() as tmp:
            ref = RefScDSC(pretrain_path=f"{tmp}/pre.pt", n_clusters=N_TYPES,
                           n_input=N_GENES, device="cpu")
            ref.fit((adj, xl, x, n_counts), y, epochs=e, pt_epochs=2,
                    pt_batch_size=256)

    return dict(host_ms_epoch=epoch_delta_host(make, 2, 6) * 1e3)


# ---- imputation -----------------------------------------------------------

@case("deepimpute")
def host_deepimpute():
    import tempfile

    import torch
    RefDI = refshim.import_ref(
        "dance.modules.single_modality.imputation.deepimpute", "DeepImpute")
    x, _ = _expr()
    xl = np.log1p(x)
    var = xl.var(0)
    targets = [list(range(i, min(i + 512, N_GENES)))
               for i in range(0, N_GENES, 512)]
    predictors = []
    for t in targets:
        rest = np.setdiff1d(np.arange(N_GENES), t)
        predictors.append(list(rest[np.argsort(-var[rest])][:512]))
    xt = torch.from_numpy(xl)

    def make(e):
        cwd = os.getcwd()
        with tempfile.TemporaryDirectory() as tmp:
            os.chdir(tmp)
            try:
                torch.manual_seed(0)
                ref = RefDI(predictors, targets, "bench", sub_outputdim=512,
                            hidden_dim=256, seed=0, gpu=-1)
                ref.fit(xt, xt, batch_size=1000, n_epochs=e, patience=e)
            finally:
                os.chdir(cwd)

    return dict(host_ms_epoch=epoch_delta_host(make, 2, 6) * 1e3)


@case("magic")
def host_magic():
    RefMAGIC = refshim.import_ref(
        "dance.modules.single_modality.imputation.magic", "MAGIC")
    from sklearn.decomposition import PCA
    x, _ = _expr()
    xl = np.log1p(x)
    x_pca = PCA(n_components=20, random_state=0).fit_transform(xl)

    t0 = time.perf_counter()
    ref = RefMAGIC(t=3, k=15, ka=4, epsilon=1, rescale=0, gpu=-1)
    ref.predict(xl, x_pca.astype(np.float32))
    return dict(host_s_total=time.perf_counter() - t0)


# ---- multimodal -----------------------------------------------------------

@case("babel")
def host_babel():
    import torch
    RefBabel = refshim.import_ref(
        "dance.modules.multi_modality.predict_modality.babel", "BabelWrapper")
    x1, x2, _ = _mm_inputs()
    raw = np.expm1(x1)
    args = types.SimpleNamespace(naive=False, hidden=64, seed=0, device="cpu",
                                 lossweight=1.0, batchsize=512, lr=1e-3,
                                 outdir="/tmp", earlystop=10**9)
    xt, yt = torch.from_numpy(raw), torch.from_numpy(x2)

    def make(e):
        torch.manual_seed(0)
        ref = RefBabel(args, dim_in=N_GENES, dim_out=134)
        ref.fit(xt, yt, max_epochs=e)

    return dict(host_ms_epoch=epoch_delta_host(make, 2, 8) * 1e3)


def _cmae_config(d1, d2, supervise):
    return dict(
        lr=1e-4, input_dim_a=d1, input_dim_b=d2, num_of_classes=2,
        shared_layer=True, resume=False,
        gen={"dim": 100, "latent": 50, "activ": "relu"},
        dis={"dim": 100, "norm": None, "activ": "lrelu", "gan_type": "lsgan"},
        beta1=0.5, beta2=0.999, weight_decay=1e-4, init="kaiming",
        lr_policy="step", step_size=100000, gamma=0.5, gan_w=10,
        recon_x_w=10, recon_h_w=0, recon_kl_w=0, supervise=supervise,
        super_w=0.1, batch_size=512, device="cpu",
    )


def _host_cmae(module, supervise):
    import torch
    RefCMAE = refshim.import_ref(module, "CMAE")
    x1, x2, _ = _mm_inputs()
    xt, yt = torch.from_numpy(x1), torch.from_numpy(x2)
    batch = torch.zeros(x1.shape[0], dtype=torch.long)
    old_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        def make(e):
            torch.manual_seed(0)
            config = _cmae_config(N_GENES, 134, supervise)
            config["max_epochs"] = e
            ref = RefCMAE(config)
            kwargs = {"checkpoint_directory": "/tmp/cmae_bench"}
            if supervise:
                ref.fit(xt, yt, batch, **kwargs)
            else:
                ref.fit(xt, yt, **kwargs)

        per = epoch_delta_host(make, 1, 4)
    finally:
        torch.Tensor.cuda = old_cuda
    return dict(host_ms_epoch=per * 1e3)


@case("cmae_predict")
def host_cmae_predict():
    return _host_cmae("dance.modules.multi_modality.predict_modality.cmae", 1)


@case("cmae_match")
def host_cmae_match():
    return _host_cmae("dance.modules.multi_modality.match_modality.cmae", 0)


def _scmm_params(d1, d2, e):
    return types.SimpleNamespace(
        latent_dim=10, num_hidden_layers=2, r_hidden_dim=100, p_hidden_dim=20,
        learn_prior=True, llik_scaling=1.0, obj="m_elbo_naive_warmup",
        batch_size=512, epochs=e, lr=1e-3, deterministic_warmup=20,
        print_freq=0, device="cpu", r_dim=d1, p_dim=d2, seed=0)


def _host_scmm(module):
    import tempfile

    import torch
    RefMMVAE = refshim.import_ref(module, "MMVAE")
    x1, x2, _ = _mm_inputs()
    raw = np.rint(np.expm1(x1))
    x2i = np.rint(np.abs(x2))
    xt, yt = torch.from_numpy(raw), torch.from_numpy(x2i)

    def make(e):
        torch.manual_seed(0)
        np.random.seed(0)
        ref = RefMMVAE("rna-protein", _scmm_params(N_GENES, 134, e))
        cwd = os.getcwd()
        with tempfile.TemporaryDirectory() as tmp:
            os.chdir(tmp)
            try:
                ref.fit(xt, yt)
            finally:
                os.chdir(cwd)

    return dict(host_ms_epoch=epoch_delta_host(make, 1, 4) * 1e3)


@case("scmm")
def host_scmm():
    return _host_scmm("dance.modules.multi_modality.predict_modality.scmm")


@case("scmm_match")
def host_scmm_match():
    return _host_scmm("dance.modules.multi_modality.match_modality.scmm")


@case("jae")
def host_jae():
    import torch
    RefJAE = refshim.import_ref(
        "dance.modules.multi_modality.joint_embedding.jae", "JAEWrapper")
    x1, x2, y = _mm_inputs()
    feats = np.concatenate([x1, x2], axis=1).astype(np.float32)
    rng = np.random.default_rng(13)
    batch = rng.integers(0, 2, N_CELLS)
    phase = rng.random((N_CELLS, 2)).astype(np.float32)
    args = types.SimpleNamespace(device="cpu", batch_size=512, seed=0)
    ft = torch.from_numpy(feats)
    yt, bt, pt = (torch.from_numpy(a) for a in (y, batch, phase))

    def make(e):
        torch.manual_seed(0)
        np.random.seed(0)
        ref = RefJAE(args, num_celL_types=N_TYPES, num_batches=2,
                     num_phases=2, num_features=feats.shape[1])
        ref.fit(ft, yt, bt, pt, max_epochs=e)

    return dict(host_ms_epoch=epoch_delta_host(make, 2, 8) * 1e3)


@case("dcca")
def host_dcca():
    import torch
    from torch.utils.data import DataLoader, TensorDataset
    RefDCCA = refshim.import_ref(
        "dance.modules.multi_modality.joint_embedding.dcca", "DCCA")
    x1, x2, y = _mm_inputs()
    counts = np.expm1(x1)
    lib = counts.sum(1, keepdims=True)
    sf1 = np.log(np.maximum(lib.ravel(), 1.0)).astype(np.float32)
    sf2 = np.ones(N_CELLS, np.float32)
    tensors = [torch.from_numpy(a) for a in (x1, counts, sf1, x2, x2, sf2)]
    ds = TensorDataset(*tensors)
    train = DataLoader(ds, batch_size=512, shuffle=True)
    total = DataLoader(ds, batch_size=N_CELLS)

    def make(e):
        args = types.SimpleNamespace(
            lr=1e-3, weight_decay=1e-6, eps=0.01, batch_size=512, seed=1,
            latent=10, max_epoch=e, max_iteration=10**9, anneal_epoch=200,
            epoch_per_test=10**9, max_ARI=-200, final_rate=1e-4,
            scale_factor=4, device="cpu", sf1=5, sf2=1, lr1=0.01, flr1=0.001,
            lr2=0.005, flr2=0.0005, cluster1=N_TYPES, cluster2=N_TYPES)
        torch.manual_seed(0)
        np.random.seed(0)
        ref = RefDCCA(layer_e_1=[N_GENES, 128], hidden1_1=128, Zdim_1=16,
                      layer_d_1=[16, 128], hidden2_1=128,
                      layer_e_2=[134, 128], hidden1_2=128, Zdim_2=16,
                      layer_d_2=[16], hidden2_2=16, args=args,
                      ground_truth1=torch.from_numpy(y), Type_1="NB",
                      Type_2="Bernoulli", cycle=1, attention_loss="Eucli")
        ref.fit(train, total, total)

    return dict(host_ms_epoch=epoch_delta_host(make, 1, 4) * 1e3)


@case("scmvae")
def host_scmvae():
    import torch
    import torch.utils.data as data_utils
    RefMVAE = refshim.import_ref(
        "dance.modules.multi_modality.joint_embedding.scmvae", "scMVAE")
    x1, x2, y = _mm_inputs()
    counts = np.expm1(x1)
    x2p = np.expm1(np.abs(x2))
    lib = np.log(np.maximum(counts.sum(1), 1e-7))
    lib_m = np.full((N_CELLS, 1), lib.mean(), np.float32)
    lib_v = np.full((N_CELLS, 1), lib.var(), np.float32)
    t = lambda a: torch.from_numpy(np.asarray(a, np.float32))  # noqa: E731
    total = data_utils.DataLoader(
        data_utils.TensorDataset(t(counts), t(x2p)), batch_size=512)
    n_tr = int(N_CELLS * 0.9)
    train = data_utils.TensorDataset(t(counts[:n_tr]), t(lib_m[:n_tr]),
                                     t(lib_v[:n_tr]), t(lib_m[:n_tr]),
                                     t(lib_v[:n_tr]), t(x2p[:n_tr]))
    valid = data_utils.TensorDataset(t(counts[n_tr:]), t(lib_m[n_tr:]),
                                     t(lib_v[n_tr:]), t(lib_m[n_tr:]),
                                     t(lib_v[n_tr:]), t(x2p[n_tr:]))

    def make(e):
        torch.manual_seed(0)
        np.random.seed(0)
        ref = RefMVAE(encoder_1=[N_GENES, 128], hidden_1=128, Z_DIMS=16,
                      decoder_share=[16, 128, 256], share_hidden=128,
                      decoder_1=[128, 128], hidden_2=128,
                      encoder_l=[N_GENES, 128], hidden3=128,
                      encoder_2=[134, 128], hidden_4=128,
                      encoder_l1=[134, 128], hidden3_1=128,
                      decoder_2=[128, 128], hidden_5=128, drop_rate=0.1,
                      log_variational=True, Type="Bernoulli", device="cpu",
                      n_centroids=N_TYPES, penality="GMM", model=1)
        ref.init_gmm_params(total)
        # epoch_per_test=e: the reference asserts best_dict was set at least
        # once (scmvae.py:753); testing exactly once per fit keeps the val
        # forward out of the per-epoch delta.
        args = types.SimpleNamespace(lr=1e-3, weight_decay=1e-6, eps=0.01,
                                     batch_size=512, max_epoch=e,
                                     anneal_epoch=200, epoch_per_test=e)
        ref.fit(args, train, valid, final_rate=1e-4, scale_factor=4.0,
                device=torch.device("cpu"))

    return dict(host_ms_epoch=epoch_delta_host(make, 1, 4) * 1e3)


# ---- spatial --------------------------------------------------------------

@case("spagcn")
def host_spagcn():
    import jax.numpy as jnp
    import torch

    from dance_tpu.ops.linalg import pca
    RefSpaGCN = refshim.import_ref(
        "dance.modules.spatial.spatial_domain.spagcn", "SpaGCN")
    xl, coords, _ = _spatial_inputs()
    emb = np.asarray(pca(jnp.asarray(xl), 50).embedding)
    dist = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2)
                   .sum(-1)).astype(np.float32)
    probe = RefSpaGCN(device="cpu")
    l = probe.search_l(0.5, dist)

    def make(e):
        torch.manual_seed(0)
        np.random.seed(0)
        ref = RefSpaGCN(device="cpu")
        ref.set_l(l)
        ref.fit((emb, dist), init="kmeans", n_clusters=6, init_spa=True,
                epochs=e, tol=0.0)

    return dict(host_ms_epoch=epoch_delta_host(make, 2, 8) * 1e3)


# ---- deconvolution --------------------------------------------------------

@case("card")
def host_card():
    import pandas as pd
    RefCard = refshim.import_ref(
        "dance.modules.spatial.cell_type_deconvo.card", "Card")
    profiles, portions, x_mix, coords, _ = _deconvo_inputs()
    basis = pd.DataFrame(profiles.T, columns=[f"ct{i}" for i in range(N_CT)])

    def make(e):
        ref = RefCard(basis, random_state=42)
        ref.fit((x_mix, coords), max_iter=e)

    return dict(host_ms_epoch=epoch_delta_host(make, 5, 25) * 1e3)


@case("spatialdecon")
def host_spatialdecon():
    import torch
    RefSD = refshim.import_ref(
        "dance.modules.spatial.cell_type_deconvo.spatialdecon", "SpatialDecon")
    profiles, portions, x_mix, _, _ = _deconvo_inputs()
    xt = torch.from_numpy(x_mix)
    pt = torch.from_numpy(profiles.T.copy())

    def make(e):
        torch.manual_seed(0)
        ref = RefSD(pt, ct_select=[f"t{i}" for i in range(N_CT)], bias=False,
                    device="cpu")
        ref.fit(xt, lr=1e-2, max_iter=e, print_period=10**9)

    return dict(host_ms_epoch=epoch_delta_host(make, 20, 220) * 1e3)


@case("dstg")
def host_dstg():
    import scipy.sparse as ssp
    import torch

    from dance_tpu.transforms.graph.dstg_graph import compute_dstg_adj
    RefDSTG = refshim.import_ref(
        "dance.modules.spatial.cell_type_deconvo.dstg", "DSTG")
    profiles, portions, x_mix, _, rng = _deconvo_inputs()
    ps_port = rng.dirichlet(np.ones(N_CT), N_PSEUDO)
    ps_x = rng.poisson(ps_port @ profiles * 3).astype(np.float32)
    feats = np.log1p(np.concatenate([ps_x, x_mix], axis=0)).astype(np.float32)
    adj = ssp.csr_matrix(compute_dstg_adj(ps_x, x_mix, k_filter=30, num_cc=10))
    y = np.concatenate([ps_port, np.zeros_like(portions)],
                       axis=0).astype(np.float32)
    train_mask = np.zeros(len(feats), bool)
    train_mask[:N_PSEUDO] = True
    coo = adj.tocoo()
    adj_t = torch.sparse_coo_tensor(
        np.stack([coo.row, coo.col]), coo.data.astype(np.float32), coo.shape)
    ft, mt, yt = (torch.from_numpy(a) for a in (feats, train_mask, y))

    def make(e):
        torch.manual_seed(0)
        ref = RefDSTG(nhid=32, device="cpu")
        ref.fit((adj_t, ft, mt), yt, lr=0.01, max_epochs=e)

    return dict(host_ms_epoch=epoch_delta_host(make, 5, 55) * 1e3)


@case("stdgcn")
def host_stdgcn():
    import torch

    from dance_tpu.modules.spatial.cell_type_deconvo.stdgcn import (
        build_stdgcn_adjacencies)
    from dance_tpu.ops.sparse import csr_to_scipy
    refshim.install()
    import importlib
    stdgcn_mod = importlib.import_module(
        "dance.modules.spatial.cell_type_deconvo.stdgcn")
    profiles, portions, x_mix, coords, rng = _deconvo_inputs()
    ps_port = rng.dirichlet(np.ones(N_CT), N_PSEUDO)
    ps_x = rng.poisson(ps_port @ profiles * 3).astype(np.float32)
    feats = np.log1p(np.concatenate([ps_x, x_mix], axis=0)).astype(np.float32)
    labels = np.concatenate([ps_port, np.zeros_like(portions)],
                            axis=0).astype(np.float32)
    adj_exp, adj_sp = build_stdgcn_adjacencies(feats, coords, N_PSEUDO,
                                               space_k=20, seed=0)
    a_exp, a_sp = csr_to_scipy(adj_exp), csr_to_scipy(adj_sp)
    adjs = [torch.sparse_coo_tensor(
        np.stack([a.tocoo().row, a.tocoo().col]),
        a.tocoo().data.astype(np.float32), a.shape) for a in (a_exp, a_sp)]
    ft, lt = torch.from_numpy(feats), torch.from_numpy(labels)
    n_tr = int(N_PSEUDO * 0.9)

    def make(e):
        torch.manual_seed(0)
        np.random.seed(0)
        model = stdgcn_mod.conGCN(nfeat=feats.shape[1], nhid=64,
                                  common_hid_layers_num=1,
                                  fcnn_hid_layers_num=1, dropout=0.1,
                                  nout1=N_CT)
        stdgcn_mod.conGCN_train(
            model, range(n_tr), range(n_tr, N_PSEUDO),
            range(N_PSEUDO, len(feats)), ft, adjs, lt, epoch_n=e,
            loss_fn=torch.nn.KLDivLoss(reduction="mean"),
            optimizer=torch.optim.Adam(model.parameters(), lr=1e-2),
            early_stopping_patience=10**9, print_epoch_step=10**9)

    return dict(host_ms_epoch=epoch_delta_host(make, 5, 55) * 1e3)


# --------------------------------------------------------------------------
# torch-CPU stand-ins for DGL/PyG-dependent references
#
# DGL and PyG are not installable here, so these rows cannot run the
# reference code itself. Each stand-in reproduces the reference's per-epoch
# compute pattern with torch's own CPU kernels — sparse COO SpMM for the
# graph aggregations (the same class of kernel DGL's CPU backend dispatches),
# dense linears, the same loss family, Adam, full-graph steps — at the exact
# scale/hyperparameters the TPU lane measures. bench.py uses the identical
# approach for its headline number.
# --------------------------------------------------------------------------

STANDIN_NOTE = "host = torch-CPU stand-in (DGL/PyG not installable)"
STANDIN = set()


def standin(name):
    def wrap(fn):
        STANDIN.add(name)
        HOST_CASES[name] = fn
        return fn
    return wrap


def _torch_coo(adj):
    import torch
    coo = adj.tocoo()
    return torch.sparse_coo_tensor(
        np.stack([coo.row, coo.col]), coo.data.astype(np.float32),
        coo.shape).coalesce()


def _epoch_steps(step, e_small=5, e_big=25):
    """Per-step seconds for a full-graph train step (reference pattern)."""
    def make(e):
        for _ in range(e):
            step()
    step()  # warm
    return epoch_delta_host(make, e_small, e_big)


@standin("scdeepsort")
def host_scdeepsort():
    """AdaptiveSAGE over the cell-gene graph (reference scdeepsort.py:183
    runs this through DGL's CPU SpMM when no GPU is present)."""
    import torch
    x, y = _expr()
    g = _bipartite_graph(x, dim=256)
    adj = g.adj.tocsr()
    at = _torch_coo(adj)
    deg = torch.from_numpy(
        np.maximum(np.asarray(adj.sum(1)).ravel(), 1).astype(np.float32))[:, None]
    feats = torch.from_numpy(np.asarray(g.ndata["features"], np.float32))
    n_genes = int(g.info["num_genes"])
    n = feats.shape[0]
    yt = torch.from_numpy(np.concatenate(
        [-np.ones(n_genes, np.int64), y.astype(np.int64)]))
    mask = yt >= 0
    lin1, lin2 = torch.nn.Linear(256, 256), torch.nn.Linear(256, 256)
    head = torch.nn.Linear(256, N_TYPES)
    norm1, norm2 = torch.nn.LayerNorm(256), torch.nn.LayerNorm(256)
    alpha = torch.nn.Parameter(torch.ones(n, 1))
    params = ([alpha] + list(lin1.parameters()) + list(lin2.parameters())
              + list(head.parameters()) + list(norm1.parameters())
              + list(norm2.parameters()))
    opt = torch.optim.Adam(params, lr=1e-3)

    def step():
        opt.zero_grad()
        h = norm1(torch.relu(lin1(torch.sparse.mm(at, feats * alpha) / deg)))
        h = norm2(torch.relu(lin2(torch.sparse.mm(at, h) / deg)))
        loss = torch.nn.functional.cross_entropy(head(h)[mask], yt[mask])
        loss.backward()
        opt.step()

    return dict(host_ms_epoch=_epoch_steps(step) * 1e3)


@standin("graphsc")
def host_graphsc():
    """WeightedGraphConv AE + inner-product decoder (reference graph-sc
    trains GCNAE through DGL, graphsc.py:274)."""
    import torch
    x, y = _expr()
    g = _bipartite_graph(x, dim=50)
    at = _torch_coo(g.adj)
    feats = torch.from_numpy(np.asarray(g.ndata["features"], np.float32))
    n = feats.shape[0]
    lin0 = torch.nn.Linear(50, 200)
    lin1 = torch.nn.Linear(200, 300)
    opt = torch.optim.Adam(list(lin0.parameters()) + list(lin1.parameters()),
                           lr=1e-3)
    # dense BCE target at the reference's own formulation (adj reconstruction)
    target = torch.zeros(n, n)
    coo = g.adj.tocoo()
    target[coo.row, coo.col] = 1.0

    def step():
        opt.zero_grad()
        h = torch.relu(lin0(torch.sparse.mm(at, feats)))
        emb = lin1(torch.sparse.mm(at, h))
        logits = emb @ emb.T
        loss = torch.nn.functional.binary_cross_entropy_with_logits(logits,
                                                                    target)
        loss.backward()
        opt.step()

    return dict(host_ms_epoch=_epoch_steps(step, 2, 10) * 1e3)


@standin("sctag")
def host_sctag():
    """TAGConv (k=3 hop propagation) AE + ZINB head (reference sctag.py uses
    DGL TAGConv)."""
    import torch
    (xl, x, sf), y = _clustering_inputs()
    adj = _knn_csr(xl[:, :64])
    at = _torch_coo(adj)
    ft = torch.from_numpy(xl)
    xt = torch.from_numpy(x)
    sft = torch.from_numpy(sf.astype(np.float32))[:, None]
    k, hid, lat = 3, 128, 15
    lin_in = torch.nn.Linear(N_GENES * (k + 1), hid)
    lin_lat = torch.nn.Linear(hid * (k + 1), lat)
    dec = torch.nn.Sequential(torch.nn.Linear(lat, 128), torch.nn.ReLU(),
                              torch.nn.Linear(128, 256), torch.nn.ReLU(),
                              torch.nn.Linear(256, 512), torch.nn.ReLU())
    heads = torch.nn.Linear(512, N_GENES * 3)
    params = (list(lin_in.parameters()) + list(lin_lat.parameters())
              + list(dec.parameters()) + list(heads.parameters()))
    opt = torch.optim.Adam(params, lr=1e-3)

    def tag(h, lin):
        hops = [h]
        for _ in range(k):
            hops.append(torch.sparse.mm(at, hops[-1]))
        return torch.relu(lin(torch.cat(hops, 1)))

    def step():
        opt.zero_grad()
        h = tag(ft, lin_in)
        z = tag(h, lin_lat)
        out = heads(dec(z))
        mu, disp, pi = out.chunk(3, 1)
        mu = torch.nn.functional.softplus(mu) * sft
        disp = torch.clamp(torch.nn.functional.softplus(disp), 1e-4, 1e4)
        # ZINB NLL (reference loss family)
        t1 = (torch.lgamma(disp) + torch.lgamma(xt + 1)
              - torch.lgamma(xt + disp))
        t2 = ((disp + xt) * torch.log1p(mu / disp)
              + xt * (torch.log(disp + 1e-8) - torch.log(mu + 1e-8)))
        nb = t1 + t2
        zero_nb = torch.pow(disp / (disp + mu + 1e-8), disp)
        pi_s = torch.sigmoid(pi)
        loss = torch.where(
            xt < 1e-8, -torch.log(pi_s + (1 - pi_s) * zero_nb + 1e-8),
            -torch.log(1 - pi_s + 1e-8) + nb).mean()
        loss.backward()
        opt.step()

    return dict(host_ms_epoch=_epoch_steps(step, 2, 10) * 1e3)


@standin("stagate")
def host_stagate():
    """Tied-attention GAT autoencoder (reference STAGATE.py trains a 4-layer
    tied GAT through PyG)."""
    import torch
    xl, coords, _ = _spatial_inputs()
    adj = _knn_csr(coords, k=8).tocoo()
    src = torch.from_numpy(adj.col.astype(np.int64))
    dst = torch.from_numpy(adj.row.astype(np.int64))
    n = xl.shape[0]
    ft = torch.from_numpy(xl)
    w1 = torch.nn.Parameter(torch.randn(N_GENES, 512) * 0.01)
    w2 = torch.nn.Parameter(torch.randn(512, 30) * 0.01)
    a_s = torch.nn.Parameter(torch.randn(512) * 0.01)
    a_d = torch.nn.Parameter(torch.randn(512) * 0.01)
    opt = torch.optim.Adam([w1, w2, a_s, a_d], lr=1e-3)

    def attn_agg(h, av_s, av_d):
        e = torch.sigmoid((h * av_s).sum(1)[src] + (h * av_d).sum(1)[dst])
        # edge softmax over incoming edges (PyG softmax(index=dst))
        den = torch.zeros(n).index_add_(0, dst, torch.exp(e))
        w = torch.exp(e) / den[dst]
        out = torch.zeros_like(h).index_add_(0, dst, h[src] * w[:, None])
        return out

    def step():
        opt.zero_grad()
        h1 = torch.nn.functional.elu(attn_agg(ft @ w1, a_s, a_d))
        z = attn_agg(h1 @ w2, torch.ones(30), torch.ones(30))
        # tied decoder
        h3 = torch.nn.functional.elu(attn_agg(z @ w2.T, a_s, a_d))
        rec = attn_agg(h3 @ w1.T, torch.ones(N_GENES), torch.ones(N_GENES))
        loss = ((rec - ft) ** 2).mean()
        loss.backward()
        opt.step()

    return dict(host_ms_epoch=_epoch_steps(step, 2, 10) * 1e3)


@standin("scheteronet")
def host_scheteronet():
    """Two-hop HetConv + ZINB decoder (reference scheteronet.py trains
    through PyG gcn_conv at one- and two-hop adjacencies)."""
    import torch
    x, y = _expr()
    xl = np.log1p(x)
    adj = _knn_csr(xl[:, :50] @ np.random.default_rng(0).random(
        (50, 32), dtype=np.float32))
    at = _torch_coo(adj)
    ft = torch.from_numpy(xl)
    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y.astype(np.int64))
    hid = 64
    lin_in = torch.nn.Linear(N_GENES, hid)
    convs = [torch.nn.Linear(hid * 3, hid) for _ in range(2)]
    head = torch.nn.Linear(hid, N_TYPES)
    dec = torch.nn.Linear(hid, N_GENES * 3)
    params = (list(lin_in.parameters()) + list(head.parameters())
              + list(dec.parameters())
              + [p for c in convs for p in c.parameters()])
    opt = torch.optim.Adam(params, lr=1e-3)

    def step():
        opt.zero_grad()
        h = torch.relu(lin_in(ft))
        for conv in convs:
            a1 = torch.sparse.mm(at, h)
            a2 = torch.sparse.mm(at, a1)  # strict two-hop propagation
            h = torch.relu(conv(torch.cat([h, a1, a2], 1)))
        out = dec(h)
        mu, disp, pi = out.chunk(3, 1)
        mu = torch.nn.functional.softplus(mu)
        disp = torch.clamp(torch.nn.functional.softplus(disp), 1e-4, 1e4)
        t1 = (torch.lgamma(disp) + torch.lgamma(xt + 1)
              - torch.lgamma(xt + disp))
        t2 = ((disp + xt) * torch.log1p(mu / disp)
              + xt * (torch.log(disp + 1e-8) - torch.log(mu + 1e-8)))
        zinb = (t1 + t2).mean()
        ce = torch.nn.functional.cross_entropy(head(h), yt)
        (ce + zinb).backward()
        opt.step()

    return dict(host_ms_epoch=_epoch_steps(step, 2, 10) * 1e3)


@standin("graphsci")
def host_graphsci():
    """Gene-graph VAE + expression AE (reference graphsci.py trains GNNModel
    through DGL GraphConv on the 2000-node gene graph + an AE over cells)."""
    import scipy.sparse as ssp
    import torch
    x, _ = _expr()
    xl = np.log1p(x)
    corr = np.corrcoef(xl[:2000].T)
    adj = ssp.csr_matrix((np.abs(corr) > 0.3).astype(np.float32))
    at = _torch_coo(adj)
    xt = torch.from_numpy(xl)
    g1 = torch.nn.Linear(N_CELLS, 256)
    g2_mean = torch.nn.Linear(256, 16)
    g2_std = torch.nn.Linear(256, 16)
    ae1 = torch.nn.Linear(N_GENES, 256)
    ae2 = torch.nn.Linear(256, N_GENES * 3)
    params = (list(g1.parameters()) + list(g2_mean.parameters())
              + list(g2_std.parameters()) + list(ae1.parameters())
              + list(ae2.parameters()))
    opt = torch.optim.Adam(params, lr=1e-3)
    target = torch.from_numpy(adj.toarray())

    def step():
        opt.zero_grad()
        gene_feat = xt.T  # genes x cells
        h = torch.relu(g1(torch.sparse.mm(at, gene_feat)))
        z_mean = g2_mean(torch.sparse.mm(at, h))
        z_std = g2_std(torch.sparse.mm(at, h))
        z = z_mean + torch.randn_like(z_std) * torch.exp(z_std)
        adj_logits = z @ z.T
        l_adj = torch.nn.functional.binary_cross_entropy_with_logits(
            adj_logits, target)
        h2 = torch.relu(ae1(xt))
        mu, disp, pi = ae2(h2).chunk(3, 1)
        mu = torch.nn.functional.softplus(mu)
        disp = torch.clamp(torch.nn.functional.softplus(disp), 1e-4, 1e4)
        t1 = (torch.lgamma(disp) + torch.lgamma(xt + 1)
              - torch.lgamma(xt + disp))
        t2 = ((disp + xt) * torch.log1p(mu / disp)
              + xt * (torch.log(disp + 1e-8) - torch.log(mu + 1e-8)))
        loss = l_adj + (t1 + t2).mean()
        loss.backward()
        opt.step()

    return dict(host_ms_epoch=_epoch_steps(step, 2, 10) * 1e3)


@standin("spotlight")
def host_spotlight():
    """NMF multiplicative updates + NNLS projections (reference spotlight.py
    runs torchnmf on CPU when no GPU is present)."""
    import torch
    profiles, portions, x_mix, _, rng = _deconvo_inputs()
    x_ref, labels = _expr(2000, N_GENES, N_CT, seed=5)
    V = torch.from_numpy(x_ref.T.astype(np.float32))  # genes x cells
    rank = N_CT
    W = torch.rand(N_GENES, rank) + 0.1
    H = torch.rand(rank, 2000) + 0.1

    def mu_iter():
        nonlocal W, H
        WH = W @ H
        H = H * (W.T @ V) / (W.T @ WH + 1e-8)
        WH = W @ H
        W = W * (V @ H.T) / (WH @ H.T + 1e-8)

    return dict(host_ms_epoch=_epoch_steps(mu_iter, 20, 220) * 1e3)


def _host_scmogcn_step(d_hid=48, conv_layers=4, extra_feats=134):
    """Shared hetero-SAGE trunk: alternating cell<->feature sparse SpMMs
    (reference scmogcn.py:477 DGL SAGEConv per relation per layer)."""
    import scipy.sparse as ssp
    import torch
    x1, x2, _ = _mm_inputs()
    n_feats = N_GENES + extra_feats
    expr = ssp.csr_matrix(np.concatenate([np.expm1(x1), np.abs(x2)], 1))
    a_c2f = _torch_coo(expr.T.tocsr())  # feats x cells
    a_f2c = _torch_coo(expr)            # cells x feats
    hc = torch.nn.Parameter(torch.randn(N_CELLS, d_hid) * 0.05)
    hf = torch.nn.Parameter(torch.randn(n_feats, d_hid) * 0.05)
    lins = [torch.nn.Linear(2 * d_hid, d_hid) for _ in range(2 * conv_layers)]
    head = torch.nn.Linear(d_hid, extra_feats)
    params = [hc, hf] + [p for l in lins for p in l.parameters()] + list(
        head.parameters())
    opt = torch.optim.Adam(params, lr=1e-3)
    target = torch.from_numpy(x2)

    def step():
        opt.zero_grad()
        c, f = hc, hf
        for i in range(conv_layers):
            f_new = torch.relu(lins[2 * i](
                torch.cat([f, torch.sparse.mm(a_c2f, c)], 1)))
            c = torch.relu(lins[2 * i + 1](
                torch.cat([c, torch.sparse.mm(a_f2c, f)], 1)))
            f = f_new
        loss = ((head(c) - target) ** 2).mean()
        loss.backward()
        opt.step()

    return step


@standin("scmogcn_predict")
def host_scmogcn_predict():
    return dict(host_ms_epoch=_epoch_steps(_host_scmogcn_step(), 2, 10) * 1e3)


@standin("scmogcn_je")
def host_scmogcn_je():
    return dict(host_ms_epoch=_epoch_steps(_host_scmogcn_step(), 2, 10) * 1e3)


@standin("scmogcn_match")
def host_scmogcn_match():
    """Contrastive matching over propagated one-hot features (g=512 as in
    the TPU lane; the trunk is the propagation + projection pair)."""
    import torch
    x1, x2, _ = _mm_inputs(n=N_CELLS, g=512, p=134)
    ft1 = torch.from_numpy(x1)
    ft2 = torch.from_numpy(x2)
    proj1 = torch.nn.Sequential(torch.nn.Linear(512, 512), torch.nn.ReLU(),
                                torch.nn.Linear(512, 64))
    proj2 = torch.nn.Sequential(torch.nn.Linear(134, 512), torch.nn.ReLU(),
                                torch.nn.Linear(512, 64))
    opt = torch.optim.Adam(list(proj1.parameters())
                           + list(proj2.parameters()), lr=1e-3)
    bs = 4096

    def step():
        opt.zero_grad()
        z1 = torch.nn.functional.normalize(proj1(ft1[:bs]), dim=1)
        z2 = torch.nn.functional.normalize(proj2(ft2[:bs]), dim=1)
        logits = z1 @ z2.T * 10
        y = torch.arange(bs)
        loss = (torch.nn.functional.cross_entropy(logits, y)
                + torch.nn.functional.cross_entropy(logits.T, y))
        loss.backward()
        opt.step()

    return dict(host_ms_epoch=_epoch_steps(step, 2, 10) * 1e3)


@standin("scmogcn_v2")
def host_scmogcn_v2():
    return dict(host_ms_epoch=_epoch_steps(
        _host_scmogcn_step(conv_layers=2), 2, 10) * 1e3)


@standin("efnst")
def host_efnst():
    """Graph autoencoder over spot features (reference EfNST trains a GCN AE
    through PyG; the conv image features are a fixed preprocess)."""
    import torch
    xl, coords, _ = _spatial_inputs()
    adj = _knn_csr(coords, k=8)
    at = _torch_coo(adj)
    rng = np.random.default_rng(4)
    concat = np.concatenate(
        [xl[:, :200], rng.random((N_SPOTS, 32), dtype=np.float32)], 1)
    ft = torch.from_numpy(concat)
    d = concat.shape[1]
    enc1 = torch.nn.Linear(d, 64)
    enc2 = torch.nn.Linear(64, 16)
    dec1 = torch.nn.Linear(16, 64)
    dec2 = torch.nn.Linear(64, d)
    params = (list(enc1.parameters()) + list(enc2.parameters())
              + list(dec1.parameters()) + list(dec2.parameters()))
    opt = torch.optim.Adam(params, lr=1e-3)

    def step():
        opt.zero_grad()
        h = torch.relu(enc1(torch.sparse.mm(at, ft)))
        z = enc2(torch.sparse.mm(at, h))
        rec = dec2(torch.relu(dec1(z)))
        loss = ((rec - ft) ** 2).mean()
        loss.backward()
        opt.step()

    return dict(host_ms_epoch=_epoch_steps(step, 2, 10) * 1e3)


# --------------------------------------------------------------------------
# Host-stack methods: both the reference and the repo run these on the host
# CPU (sklearn / networkx community detection), so the columns below compare
# the reference implementation directly at the TPU lane's scale/protocol.
# --------------------------------------------------------------------------

@case("svm")
def host_svm():
    import jax.numpy as jnp

    from dance_tpu.ops.linalg import pca
    RefSVM = refshim.import_ref(
        "dance.modules.single_modality.cell_type_annotation.svm", "SVM")
    x, y = _expr()
    emb = np.asarray(pca(jnp.asarray(np.log1p(x)), 400).embedding)

    def fit():
        ref = RefSVM(None, random_state=0)
        ref.fit(emb, y)
        return ref

    fit()  # warm sklearn caches
    t0 = time.perf_counter()
    fit()
    return dict(host_s_total=time.perf_counter() - t0)


@case("celltypist")
def host_celltypist():
    import sys

    import sklearn.linear_model as sklm
    RefCelltypist = refshim.import_ref(
        "dance.modules.single_modality.cell_type_annotation.celltypist",
        "Celltypist")
    # the reference pins multi_class='ovr' (celltypist.py:772); sklearn >=1.7
    # removed the kwarg. Drop it so the reference code runs — the multinomial
    # fallback is the same solve our own port runs (celltypist.py:144), so
    # the comparison stays like-for-like.
    ref_mod = sys.modules[RefCelltypist.__module__]
    _real_LR = sklm.LogisticRegression

    def _LR(*a, multi_class=None, **k):
        return _real_LR(*a, **k)

    ref_mod.LogisticRegression = _LR
    x, y = _expr()
    x = np.log1p(x)

    def fit():
        ref = RefCelltypist(majority_voting=False)
        ref.fit(x, y)
        return ref

    fit()
    t0 = time.perf_counter()
    fit()
    return dict(host_s_total=time.perf_counter() - t0)


@case("singlecellnet")
def host_singlecellnet():
    RefSCN = refshim.import_ref(
        "dance.modules.single_modality.cell_type_annotation.singlecellnet",
        "SingleCellNet")
    x, y = _expr()
    xl = np.log1p(x)

    def fit():
        ref = RefSCN(num_trees=100)
        ref.fit(xl, y)
        return ref

    fit()
    t0 = time.perf_counter()
    fit()
    return dict(host_s_total=time.perf_counter() - t0)


@case("louvain")
def host_louvain():
    RefLouvain = refshim.import_ref(
        "dance.modules.spatial.spatial_domain.louvain", "Louvain")
    xl, coords, _ = _spatial_inputs()
    adj = _knn_csr(xl[:, :50])
    dense = np.asarray((adj + adj.T).toarray())  # ref requires symmetric

    def fit():
        ref = RefLouvain()
        ref.fit(dense)
        return ref

    fit()
    t0 = time.perf_counter()
    fit()
    return dict(host_s_total=time.perf_counter() - t0)


@case("stlearn")
def host_stlearn():
    RefStKmeans = refshim.import_ref(
        "dance.modules.spatial.spatial_domain.stlearn", "StKmeans")
    xl, coords, _ = _spatial_inputs()

    def fit():
        try:
            ref = RefStKmeans(n_clusters=6)  # signature default algorithm="auto"
        except Exception:
            ref = None
        if ref is None or getattr(ref.model, "algorithm", None) == "auto":
            # sklearn >=1.3 removed algorithm="auto"; lloyd is its successor
            ref = RefStKmeans(n_clusters=6, algorithm="lloyd")
        ref.fit(xl)
        return ref

    fit()
    t0 = time.perf_counter()
    fit()
    return dict(host_s_total=time.perf_counter() - t0)


@standin("scgnn2")
def host_scgnn2():
    """scGNN2 EM loop (reference scgnn2.py: feature AE dim->512->128->512->dim,
    VGAE over the cell kNN graph, per-cluster AEs). igraph (its clustering
    dep) is not installable, so this reproduces the torch compute pattern of
    one EM iteration at the TPU lane's budgets (20 epochs per AE stage)."""
    import torch
    x, _ = _expr()
    xl = np.log1p(x)
    xt = torch.from_numpy(xl)
    n = xl.shape[0]

    def feature_ae_epochs(e, in_t):
        fc1 = torch.nn.Linear(in_t.shape[1], 512)
        fc2 = torch.nn.Linear(512, 128)
        fc3 = torch.nn.Linear(128, 512)
        fc4 = torch.nn.Linear(512, in_t.shape[1])
        params = sum([list(m.parameters()) for m in (fc1, fc2, fc3, fc4)], [])
        opt = torch.optim.Adam(params, lr=1e-3)
        for _ in range(e):
            opt.zero_grad()
            h = torch.relu(fc2(torch.relu(fc1(in_t))))
            rec = fc4(torch.relu(fc3(h)))
            ((rec - in_t) ** 2).mean().backward()
            opt.step()
        return h.detach()

    def run(e):
        h = feature_ae_epochs(e, xt)  # feature AE stage
        adj = _knn_csr(h.numpy()[:, :32])
        at = _torch_coo(adj)
        gc1 = torch.nn.Linear(128, 32)
        gc_mu = torch.nn.Linear(32, 16)
        gc_lv = torch.nn.Linear(32, 16)
        params = (list(gc1.parameters()) + list(gc_mu.parameters())
                  + list(gc_lv.parameters()))
        opt = torch.optim.Adam(params, lr=1e-2)
        labels = torch.from_numpy(adj.toarray())
        for _ in range(e):  # graph AE (VGAE) stage
            opt.zero_grad()
            h1 = torch.relu(gc1(torch.sparse.mm(at, h)))
            mu = gc_mu(torch.sparse.mm(at, h1))
            lv = gc_lv(torch.sparse.mm(at, h1))
            z = mu + torch.randn_like(lv) * torch.exp(lv)
            logits = z @ z.T
            loss = torch.nn.functional.binary_cross_entropy_with_logits(
                logits, labels)
            loss = loss - 0.5 / n * (1 + 2 * lv - mu**2 - (2 * lv).exp()).mean()
            loss.backward()
            opt.step()
        feature_ae_epochs(e, xt)  # cluster-AE stage (same arch over the cells)

    t0 = time.perf_counter()
    run(20)
    return dict(host_s_total=time.perf_counter() - t0,
                notes="1 EM iter, 20 AE epochs each")


# --------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="", help="comma-separated name filter")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()
    if args.list:
        print("\n".join(sorted(HOST_CASES)))
        return
    want = [c for c in args.cases.split(",") if c] or sorted(HOST_CASES)
    rows = load_results()
    for name in want:
        if name not in HOST_CASES:
            print(f"!! unknown case {name}")
            continue
        print(f"== host {name}", flush=True)
        t0 = time.time()
        try:
            res = HOST_CASES[name]()
        except Exception as e:  # record the failure, keep going
            print(f"   FAILED: {type(e).__name__}: {e}")
            continue
        row = rows.setdefault(name, dict(
            name=name, family=TPU_CASES[name][1] if name in TPU_CASES else "",
            scale=TPU_CASES[name][2] if name in TPU_CASES else ""))
        row.update({k: f"{v:.4f}" if isinstance(v, float) else v
                    for k, v in res.items()})
        if name in STANDIN and STANDIN_NOTE not in row.get("notes", ""):
            row["notes"] = "; ".join(
                filter(None, [row.get("notes", ""), STANDIN_NOTE]))
        save_results(rows)
        print(f"   {res} [{time.time() - t0:.0f}s]", flush=True)
    render()


if __name__ == "__main__":
    main()
