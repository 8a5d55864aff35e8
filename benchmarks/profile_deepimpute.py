"""Stage split of the DeepImpute 100k epoch (scale-lane row).

BENCH_NOTES round-5 flagged the 100k deepimpute row (1204.8 ms/epoch) as
~300x off its FLOP bound with neither HBM nor transcendentals explaining it.
This times the epoch's three stages separately on the attached chip so the
bound analysis is measured, not asserted:

  1. batching  — epoch permutation + the (nb, n_ens, bs, .) gather/moveaxis
                 of the pre-gathered views (pure HBM stream + gather)
  2. scan      — the 25-step train scan over PRE-BUILT batch tensors
                 (matmuls + dropout RNG + adam)
  3. full      — the real _train_epoch (1 + 2 fused in one jit)

Dependent-chain harness per CLAUDE.md (the relay acks small dispatch streams
before compute completes): every timed region loops REPS times with a data
dependence threaded through, then blocks.

Usage: python benchmarks/profile_deepimpute.py [--cells 100000] [--reps 5]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=100_000)
    ap.add_argument("--genes", type=int, default=2_000)
    ap.add_argument("--batch_size", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from dance_tpu.modules.single_modality.imputation import DeepImpute
    from dance_tpu.utils.batch import epoch_batches

    n, g = args.cells, args.genes
    rng = np.random.default_rng(0)
    x = rng.poisson(0.3, size=(n, g)).astype(np.float32)
    xl = np.log1p(x)
    print(f"data built: {xl.nbytes/1e9:.2f} GB host", flush=True)
    var = xl.var(0)
    targets = [np.arange(i, min(i + 512, g)) for i in range(0, g, 512)]
    predictors = []
    for t in targets:
        rest = np.setdiff1d(np.arange(g), t)
        predictors.append(rest[np.argsort(-var[rest])][:512])
    m = DeepImpute(predictors, targets, sub_outputdim=512, hidden_dim=256,
                   seed=0)

    # replicate fit() setup up to the first epoch
    pred_idx, targ_idx, targ_mask, p_max, t_max = m._pad_layout()
    m._idx = (pred_idx, targ_idx, targ_mask)
    from dance_tpu.modules.single_modality.imputation.deepimpute import _SubNet
    m.net = _SubNet(out_dim=t_max, hidden_dim=256, dropout=0.2)
    key = jax.random.key(0)

    def init_one(r, p):
        return m.net.init({"params": r, "dropout": r}, jnp.zeros((1, p_max)))["params"]

    keys = jax.random.split(key, pred_idx.shape[0])
    params = jax.vmap(init_one)(keys, pred_idx)
    m._tx = optax.adam(1e-3)
    opt_state = m._tx.init(params)

    t0 = time.perf_counter()
    Xd = jnp.asarray(xl)
    jax.block_until_ready(Xd)
    print(f"upload: {time.perf_counter()-t0:.1f}s", flush=True)
    Xp, Yt, Mt = m._pregather(Xd, Xd, jnp.ones_like(Xd))
    jax.block_until_ready(Xp)
    print(f"views: Xp {Xp.shape} {Xp.nbytes/1e9:.2f} GB x3", flush=True)
    bs = args.batch_size

    # --- stage 1: batching (gather + moveaxis) ---------------------------
    @jax.jit
    def batching(Xp, Yt, Mt, key):
        idx = epoch_batches(key, Xp.shape[1], bs)
        Xb = jnp.moveaxis(jnp.take(Xp, idx, axis=1), 0, 1)
        Yb = jnp.moveaxis(jnp.take(Yt, idx, axis=1), 0, 1)
        Mb = jnp.moveaxis(jnp.take(Mt, idx, axis=1), 0, 1)
        return Xb, Yb, Mb

    out = batching(Xp, Yt, Mt, key)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    k = key
    for _ in range(args.reps):
        k = jax.random.fold_in(k, 1)
        out = batching(Xp, Yt, Mt, k)
    jax.block_until_ready(out)
    t_batch = (time.perf_counter() - t0) / args.reps * 1e3
    Xb, Yb, Mb = out
    print(f"1. batching  : {t_batch:8.1f} ms  (Xb {Xb.shape})", flush=True)

    # --- stage 2: scan over pre-built batches ----------------------------
    nb = Xb.shape[0]

    @jax.jit
    def scan_only(params, opt_state, Xb, Yb, Mb, key):
        bkeys = jax.random.split(jax.random.fold_in(key, 7), nb)

        def loss_fn(params, bx, by, bm, rng):
            def one(sp, x_in, y_t, m_t, r):
                y_hat = m.net.apply({"params": sp}, x_in, training=True,
                                    rngs={"dropout": r})
                return jnp.sum(y_t * m_t * (y_t - y_hat) ** 2) / jnp.maximum(
                    jnp.sum(m_t), 1.0)

            sub_rngs = jax.random.split(rng, bx.shape[0])
            return jax.vmap(one)(params, bx, by, bm, sub_rngs).mean()

        def step(carry, batch):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, *batch)
            updates, opt_state = m._tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (Xb, Yb, Mb, bkeys))
        return params, opt_state, losses.mean()

    p, o, l = scan_only(params, opt_state, Xb, Yb, Mb, key)
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    p, o = params, opt_state
    for _ in range(args.reps):
        p, o, l = scan_only(p, o, Xb, Yb, Mb, key)
    jax.block_until_ready(l)
    t_scan = (time.perf_counter() - t0) / args.reps * 1e3
    print(f"2. scan      : {t_scan:8.1f} ms  ({nb} steps)", flush=True)

    # --- stage 3: the real fused epoch ------------------------------------
    p, o, l = m._train_epoch(params, opt_state, Xp, Yt, Mt, key, bs)
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    p, o = params, opt_state
    for _ in range(args.reps):
        p, o, l = m._train_epoch(p, o, Xp, Yt, Mt, key, bs)
    jax.block_until_ready(l)
    t_full = (time.perf_counter() - t0) / args.reps * 1e3
    print(f"3. full epoch: {t_full:8.1f} ms", flush=True)
    print(f"   unexplained vs 1+2: {t_full - t_batch - t_scan:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
