"""DANCE 2.0 pipeline search for ACTINN (parity: examples/tuning/cta_actinn/main.py).

Step 2 (pipeline search) + step 3 (params tuning for top-k pipelines) on the
framework-native SweepRunner; wandb is optional telemetry only.
"""
import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import annotation_data, set_seed
from dance_tpu.modules.single_modality.cell_type_annotation import ACTINN
from dance_tpu.pipeline import PipelinePlaner, get_step3_yaml, run_step3, save_summary_data
from dance_tpu.transforms import SetConfig

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=os.path.join(os.path.dirname(__file__),
                                                    "pipeline_params_tuning_config.yaml"))
    p.add_argument("--count", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--results_dir", default="results")
    args = p.parse_args()
    set_seed(args.seed)

    planer = PipelinePlaner.from_config_file(args.config)

    def evaluate_pipeline(trial_config, planer=planer, params_mode=False):
        data = annotation_data(n_cells=300, n_genes=100, seed=args.seed)
        kwargs = ({"params": trial_config} if params_mode
                  else {"pipeline": trial_config})
        pipe = planer.generate(**kwargs)
        pipe.functional(data)
        if "label_channel" not in data.config:
            SetConfig({"label_channel": "cell_type"})(data)
        model = ACTINN(hidden_dims=(32, 16), random_seed=args.seed)
        x_train, y_train = data.get_train_data()
        model.fit(x_train, y_train, num_epochs=args.epochs, seed=args.seed)
        x_test, y_test = data.get_test_data()
        return {"acc": model.score(x_train, y_train),
                "test_acc": model.score(x_test, y_test)}

    os.makedirs(f"{args.results_dir}/pipeline", exist_ok=True)
    runner = planer.sweep_agent(
        evaluate_pipeline, count=args.count, method="random", seed=args.seed,
        summary_file_path=f"{args.results_dir}/pipeline/best_test_acc.csv")
    best = runner.best("test_acc")
    print(f"Best step-2 trial: test_acc={best['test_acc']:.4f}")

    step3_paths = get_step3_yaml(
        f"{args.results_dir}/pipeline/best_test_acc.csv", planer,
        conf_save_path=f"{args.results_dir}/config_yamls/params/", metric="test_acc",
        required_funs=["SetConfig"], required_indexes=[100],
        required_params=[{"config_dict": {"label_channel": "cell_type"}}])
    runners = run_step3(
        f"{args.results_dir}/config_yamls/params/",
        lambda planer3, cfg: evaluate_pipeline(cfg, planer3, params_mode=True),
        result_dir=f"{args.results_dir}/params/")
    for r in runners:
        if r.records:
            print("Step-3 best:", r.best("test_acc")["test_acc"])

    # --- vmapped model-hyperparameter stage --------------------------------
    # The reference fans each candidate out as a wandb agent process
    # (dance/pipeline.py:826-850). Here the whole lr × lambd grid trains as
    # ONE compiled vmapped program (SweepRunner.run_vmapped); under a mesh
    # the trial axis shards over dp.
    import jax
    import jax.numpy as jnp

    from dance_tpu.nn.mlp import VanillaMLP
    from dance_tpu.pipeline import SweepRunner

    data = annotation_data(n_cells=300, n_genes=100, seed=args.seed)
    best_cfg = {k: best[k] for k in runner.search_space}
    pipe = planer.generate(pipeline=best_cfg)
    pipe.functional(data)
    if "label_channel" not in data.config:
        SetConfig({"label_channel": "cell_type"})(data)
    x_tr, y_tr = data.get_train_data()
    x_te, y_te = data.get_test_data()
    y_tr, y_te = np.asarray(y_tr), np.asarray(y_te)
    if y_tr.ndim == 2 and y_tr.shape[1] > 1:  # one-hot labels
        y_tr, y_te = y_tr.argmax(1), y_te.argmax(1)
    classes, y_tr_i = np.unique(y_tr.ravel(), return_inverse=True)
    y_te_i = np.searchsorted(classes, y_te.ravel())
    xj, yj = jnp.asarray(x_tr, jnp.float32), jnp.asarray(y_tr_i)
    xt, yt = jnp.asarray(x_te, jnp.float32), jnp.asarray(y_te_i)
    net = VanillaMLP(output_dim=len(classes), hidden_dims=(32, 16))

    def make_trial(configs):
        def init_fn(key):
            return net.init(key, xj[:1])["params"]

        def loss_fn(params, batch, hyper):
            bx, by = batch
            logp = jax.nn.log_softmax(net.apply({"params": params}, bx), -1)
            nll = -jnp.take_along_axis(logp, by[:, None], 1).mean()
            l2 = sum((w ** 2).sum() for w in jax.tree_util.tree_leaves(params))
            return nll + hyper["lambd"] * l2

        def score_fn(params, _):
            pred = net.apply({"params": params}, xt).argmax(-1)
            return (pred == yt).mean()

        return init_fn, loss_fn, (xj, yj), score_fn

    vm = SweepRunner({"lr": {"values": [0.03, 0.01, 0.003]},
                      "lambd": {"values": [0.0, 0.005, 0.05]}}, method="grid")
    vm.run_vmapped(make_trial, num_steps=args.epochs * 3, metric="test_acc")
    best_vm = vm.best("test_acc")
    print(f"Vmapped model-param stage ({len(vm.records)} trials, one compiled "
          f"program): best test_acc={best_vm['test_acc']:.4f} "
          f"(lr={best_vm['lr']}, lambd={best_vm['lambd']})")
