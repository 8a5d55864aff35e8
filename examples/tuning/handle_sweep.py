"""Sweep-log scraping helpers (parity: examples/tuning/handle_sweep.py:7-30).

Recovers sweep ids / summary CSV paths from launched job logs so interrupted
searches can be resumed or aggregated.
"""

import argparse
import os
import re


def find_sweep_records(log_dir: str):
    """Return {log_file: {sweep_ids, summary_paths}} parsed from job logs."""
    out = {}
    for name in sorted(os.listdir(log_dir)):
        path = os.path.join(log_dir, name)
        if not os.path.isfile(path):
            continue
        text = open(path, errors="ignore").read()
        sweep_ids = re.findall(r"Sweep ID: (\S+)", text)
        summaries = re.findall(r"Saved .* to (\S+\.csv)", text)
        if sweep_ids or summaries:
            out[name] = {"sweep_ids": sweep_ids, "summary_paths": summaries}
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("log_dir")
    args = p.parse_args()
    for log, rec in find_sweep_records(args.log_dir).items():
        print(log, rec)
