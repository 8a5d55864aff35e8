"""Host-stack (reference implementation, single CPU core) timings at
BENCH_MATRIX scale.

Fills the ``host_ms_epoch`` / ``host_s_total`` columns of
``results/bench_matrix.csv`` by running the REFERENCE implementations (via
:mod:`refshim`, torch CPU / sklearn / numpy) on the same synthetic inputs and
scales as :mod:`matrix`. Methods whose reference depends on DGL/PyG
(scdeepsort, graphsc, sctag, stagate, scheteronet, graphsci, spotlight,
scmogcn*) cannot run here — their stand-in numbers live in BENCH_NOTES.md.

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
                    N_REAL, N_SPOTS, N_TYPES, _clustering_inputs,
                    _deconvo_inputs, _expr, _knn_csr, _mm_inputs,
                    _spatial_inputs, load_results, render, save_results)

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
        save_results(rows)
        print(f"   {res} [{time.time() - t0:.0f}s]", flush=True)
    render()


if __name__ == "__main__":
    main()
