"""Stage 2 of the DeepImpute 100k profile: epoch-scan nesting effects.

profile_deepimpute.py showed the standalone `_train_epoch` at 48.5 ms while
the scale lane measured 1204.8 ms/epoch through `_train_epochs` (the
whole-fit epoch scan).  Hypothesis: nested in the epoch scan, XLA can no
longer fuse the epoch-level (nb, n_ens, bs, .) gather/moveaxis into the step
scan and materializes ~2.5 GB of transposed batch copies per epoch on a slow
gather path.  This times:

  A. _train_epochs (current code) over 3 epochs        -> per-epoch ms
  B. per-step-gather variant: the step scan carries only the (nb, bs)
     permutation rows; each step gathers its own (n_ens, bs, .) batch
     directly from the pre-gathered views                -> per-epoch ms

Usage: python benchmarks/profile_deepimpute2.py [--cells 100000]
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
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from dance_tpu.modules.single_modality.imputation import DeepImpute
    from dance_tpu.modules.single_modality.imputation.deepimpute import _SubNet
    from dance_tpu.utils.batch import epoch_batches

    n, g = args.cells, args.genes
    rng = np.random.default_rng(0)
    xl = np.log1p(rng.poisson(0.3, size=(n, g)).astype(np.float32))
    var = xl.var(0)
    targets = [np.arange(i, min(i + 512, g)) for i in range(0, g, 512)]
    predictors = []
    for t in targets:
        rest = np.setdiff1d(np.arange(g), t)
        predictors.append(rest[np.argsort(-var[rest])][:512])
    m = DeepImpute(predictors, targets, sub_outputdim=512, hidden_dim=256,
                   seed=0)
    pred_idx, targ_idx, targ_mask, p_max, t_max = m._pad_layout()
    m._idx = (pred_idx, targ_idx, targ_mask)
    m.net = _SubNet(out_dim=t_max, hidden_dim=256, dropout=0.2)
    key = jax.random.key(0)

    def init_one(r, p):
        return m.net.init({"params": r, "dropout": r}, jnp.zeros((1, p_max)))["params"]

    keys = jax.random.split(key, pred_idx.shape[0])
    params = jax.vmap(init_one)(keys, pred_idx)
    m._tx = optax.adam(1e-3)
    opt_state = m._tx.init(params)
    Xd = jnp.asarray(xl)
    Xp, Yt, Mt = m._pregather(Xd, Xd, jnp.ones_like(Xd))
    jax.block_until_ready(Xp)
    print("views ready", flush=True)
    bs = args.batch_size
    epoch_keys = jax.random.split(key, args.epochs)

    # --- A: current _train_epochs -----------------------------------------
    p, o, losses = m._train_epochs(params, opt_state, Xp, Yt, Mt, epoch_keys, bs)
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    p, o = params, opt_state
    for _ in range(args.reps):
        p, o, losses = m._train_epochs(p, o, Xp, Yt, Mt, epoch_keys, bs)
    jax.block_until_ready(losses)
    t_a = (time.perf_counter() - t0) / args.reps / args.epochs * 1e3
    print(f"A. epoch-scan (current)   : {t_a:8.1f} ms/epoch", flush=True)

    # --- B: per-step gather inside the step scan ---------------------------
    def train_epoch_stepgather(params, opt_state, Xp, Yt, Mt, key):
        n_ = Xp.shape[1]
        idx = epoch_batches(key, n_, bs)          # (nb, bs)
        nb = idx.shape[0]
        keys_ = jax.random.split(jax.random.fold_in(key, 7), nb)

        def loss_fn(params, bx, by, bm, rng):
            def one(sp, x_in, y_t, m_t, r):
                y_hat = m.net.apply({"params": sp}, x_in, training=True,
                                    rngs={"dropout": r})
                return jnp.sum(y_t * m_t * (y_t - y_hat) ** 2) / jnp.maximum(
                    jnp.sum(m_t), 1.0)

            sub_rngs = jax.random.split(rng, bx.shape[0])
            return jax.vmap(one)(params, bx, by, bm, sub_rngs).mean()

        def step(carry, sl):
            params, opt_state = carry
            rows, r = sl
            bx = jnp.take(Xp, rows, axis=1)       # (n_ens, bs, p_max)
            by = jnp.take(Yt, rows, axis=1)
            bm = jnp.take(Mt, rows, axis=1)
            loss, grads = jax.value_and_grad(loss_fn)(params, bx, by, bm, r)
            updates, opt_state = m._tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (idx, keys_))
        return params, opt_state, losses.mean()

    @jax.jit
    def train_epochs_b(params, opt_state, Xp, Yt, Mt, keys_):
        def epoch(carry, key):
            params, opt_state = carry
            params, opt_state, loss = train_epoch_stepgather(
                params, opt_state, Xp, Yt, Mt, key)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(epoch, (params, opt_state),
                                                   keys_)
        return params, opt_state, losses

    p, o, losses = train_epochs_b(params, opt_state, Xp, Yt, Mt, epoch_keys)
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    p, o = params, opt_state
    for _ in range(args.reps):
        p, o, losses = train_epochs_b(p, o, Xp, Yt, Mt, epoch_keys)
    jax.block_until_ready(losses)
    t_b = (time.perf_counter() - t0) / args.reps / args.epochs * 1e3
    print(f"B. per-step gather        : {t_b:8.1f} ms/epoch", flush=True)


if __name__ == "__main__":
    main()
