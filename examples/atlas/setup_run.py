"""Render atlas sweep launch commands from config (parity:
examples/atlas/setup_run.py — loads a commands YAML + run-config CSV and
materializes per-dataset launch commands; the reference generates sbatch/bash
launchers, here a bash script that can also be executed inline)."""

import argparse
import os
import subprocess
import sys

import pandas as pd
import yaml

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))


def load_commands(config_path):
    with open(config_path, encoding="utf-8") as f:
        return yaml.safe_load(f)


def load_run_configs(run_config_path):
    return pd.read_csv(run_config_path)


def render(commands: dict, runs: pd.DataFrame, results_root: str):
    lines = []
    for _, row in runs.iterrows():
        tpl = commands.get(row["method"])
        if tpl is None:
            print(f"[skip] no command template for method {row['method']!r}")
            continue
        results_dir = os.path.join(results_root, str(row["tissue"]),
                                   str(row["dataset"]), row["method"])
        lines.append(tpl.format(count=row.get("count", 4), results_dir=results_dir,
                                dataset=row["dataset"], tissue=row["tissue"]))
    return lines


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="Setup atlas run parameters")
    p.add_argument("--config", default=os.path.join(_HERE, "config/run_config.csv"))
    p.add_argument("--commands", default=os.path.join(_HERE, "config/commands.yaml"))
    p.add_argument("--results_root", default="results/atlas")
    p.add_argument("--out", default="run_atlas.sh")
    p.add_argument("--run", action="store_true", help="execute inline instead")
    args = p.parse_args()

    lines = render(load_commands(args.commands), load_run_configs(args.config),
                   args.results_root)
    if args.run:
        for cmd in lines:
            print("+", cmd)
            subprocess.run(cmd, shell=True, check=True, cwd=_REPO)
    else:
        with open(args.out, "w") as f:
            f.write("#!/bin/bash\nset -e\ncd " + _REPO + "\n")
            f.write("\n".join(lines) + "\n")
        os.chmod(args.out, 0o755)
        print(f"wrote {args.out} with {len(lines)} commands")
