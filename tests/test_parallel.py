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
