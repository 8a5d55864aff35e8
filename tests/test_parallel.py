"""Multi-device sharding tests (run via ./run_tests.sh for the 8-device mesh)."""

import numpy as np


def test_dryrun_multichip(cpu_mesh8):
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_train_step(cpu_mesh8):
    import jax
    import jax.numpy as jnp
    import optax

    from dance_tpu.nn.mlp import VanillaMLP
    from dance_tpu.parallel.mesh import shard_batch, shard_params_for_tp
    from dance_tpu.parallel.train import make_sharded_train_step

    mesh = cpu_mesh8
    model = VanillaMLP(output_dim=4, hidden_dims=(64, 32))
    tx = optax.adam(1e-2)
    rng = np.random.default_rng(0)
    x = rng.random((32, 128), dtype=np.float32)
    y = rng.integers(0, 4, 32)

    def loss_fn(params, batch):
        bx, by = batch
        logits = model.apply({"params": params}, bx)
        return optax.softmax_cross_entropy_with_integer_labels(logits, by).mean()

    with mesh:
        params = model.init(jax.random.key(0), jnp.asarray(x[:1]))["params"]
        params = shard_params_for_tp(params, mesh, min_size=1024)
        opt_state = tx.init(params)
        batch = shard_batch((x, y), mesh)
        step = make_sharded_train_step(loss_fn, tx, mesh)
        losses = []
        for _ in range(5):
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_vmapped_trials():
    """8 hyperparameter trials train simultaneously under one vmapped scan."""
    import jax
    import jax.numpy as jnp
    import optax

    from dance_tpu.nn.mlp import VanillaMLP
    from dance_tpu.parallel.trials import select_best_trial, vmapped_trials

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((128, 20), dtype=np.float32))
    w_true = jnp.asarray(rng.random((20, 1), dtype=np.float32))
    y = (x @ w_true).ravel()
    model = VanillaMLP(output_dim=1, hidden_dims=(16,))

    def init_fn(key):
        return model.init(key, x[:1])["params"]

    def loss_fn(params, batch, hyper):
        bx, by = batch
        pred = model.apply({"params": params}, bx).ravel()
        return jnp.mean((pred - by) ** 2) * hyper["scale"]

    scales = [1.0] * 8
    params, losses = vmapped_trials(init_fn, loss_fn, (x, y), seeds=list(range(8)),
                                    hyperparams={"scale": scales}, lr=1e-2,
                                    num_steps=200)
    assert losses.shape == (200, 8)
    assert (losses[-1] < losses[0]).all(), "all trials should improve"
    best, idx = select_best_trial(params, -losses[-1])
    pred = model.apply({"params": best}, x).ravel()
    assert float(jnp.mean((pred - y) ** 2)) < float(losses[0].min())


def test_actinn_fit_distributed(cpu_mesh8):
    """Data-parallel ACTINN over the 8-device mesh matches single-device quality."""
    from dance_tpu.datasets.synthetic import annotation_data
    from dance_tpu.modules.single_modality.cell_type_annotation import ACTINN

    d = annotation_data(n_cells=320, n_genes=100, n_types=3, seed=0)
    model = ACTINN(hidden_dims=(32, 16), random_seed=0)
    model.preprocess(d)
    x_train, y_train = d.get_train_data()
    model.fit_distributed(x_train, y_train, mesh=cpu_mesh8, num_epochs=20,
                          batch_size=64, seed=0)
    x_test, y_test = d.get_test_data()
    acc = model.score(x_test, y_test)
    assert acc > 0.85, f"distributed ACTINN acc too low: {acc}"
