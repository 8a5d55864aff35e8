"""Shared step-2/step-3 driver for the examples/tuning/<task>_<model> dirs.

Parity model: the per-directory main.py scripts under reference
examples/tuning/* all follow the same loop — build a PipelinePlaner from the
directory's pipeline_params_tuning_config.yaml, sweep pipeline candidates
(step 2), then optionally re-tune params for the top pipelines (step 3).
Here that loop lives in one place and each directory provides only its
``evaluate(planer, trial_cfg, seed, params_mode) -> {metric: value}``.
"""

import argparse
import os
import sys

_EXAMPLES_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _EXAMPLES_DIR not in sys.path:
    sys.path.insert(0, _EXAMPLES_DIR)

from _utils import set_seed  # noqa: E402
from dance_tpu.pipeline import PipelinePlaner, get_step3_yaml, run_step3  # noqa: E402


def tuning_main(evaluate, metric, config_dir, *, maximize=True, count=4,
                step3_kwargs=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=os.path.join(
        config_dir, "pipeline_params_tuning_config.yaml"))
    p.add_argument("--count", type=int, default=count)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--results_dir", default=os.path.join(config_dir, "results"))
    p.add_argument("--step3", action="store_true",
                   help="also run params tuning for the top step-2 pipeline")
    p.add_argument("--resume", action="store_true",
                   help="skip configs already in the summary CSV and extend it")
    args = p.parse_args()
    set_seed(args.seed)

    planer = PipelinePlaner.from_config_file(args.config)
    summary = os.path.join(args.results_dir, "pipeline", "summary.csv")
    os.makedirs(os.path.dirname(summary), exist_ok=True)
    runner = planer.sweep_agent(
        lambda cfg: evaluate(planer, cfg, args.seed, False),
        count=args.count, method="random", seed=args.seed,
        summary_file_path=summary, resume=args.resume)
    best = runner.best(metric, maximize=maximize)
    print(f"Best step-2 {metric}: {best[metric]:.4f}")

    if args.step3:
        conf_dir = os.path.join(args.results_dir, "config_yamls", "params")
        get_step3_yaml(summary, planer, conf_save_path=conf_dir, metric=metric,
                       ascending=not maximize, top_k=1, **(step3_kwargs or {}))
        runners = run_step3(
            conf_dir, lambda planer3, cfg: evaluate(planer3, cfg, args.seed, True),
            count=max(2, args.count // 2),
            result_dir=os.path.join(args.results_dir, "params"))
        for r in runners:
            if any(metric in rec for rec in r.records):
                b = r.best(metric, maximize=maximize)
                print(f"Step-3 best {metric}: {b[metric]:.4f}")
            elif r.records:
                print(f"Step-3: all {len(r.records)} trials errored "
                      f"(see results CSV)")
    return runner


def gen_kwargs(trial_cfg, params_mode):
    return {"params": trial_cfg} if params_mode else {"pipeline": trial_cfg}
