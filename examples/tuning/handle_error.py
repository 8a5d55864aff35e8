"""Crashed-trial log scraping (parity: examples/tuning/handle_error.py:12+)."""

import argparse
import os
import re

ERROR_PATTERNS = [r"Traceback \(most recent call last\)", r"Error", r"OOM",
                  r"RESOURCE_EXHAUSTED"]


def find_errors(log_dir: str):
    out = {}
    for name in sorted(os.listdir(log_dir)):
        path = os.path.join(log_dir, name)
        if not os.path.isfile(path):
            continue
        text = open(path, errors="ignore").read()
        hits = [p for p in ERROR_PATTERNS if re.search(p, text)]
        if hits:
            tail = "\n".join(text.splitlines()[-5:])
            out[name] = {"patterns": hits, "tail": tail}
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("log_dir")
    args = p.parse_args()
    for log, rec in find_errors(args.log_dir).items():
        print(f"== {log}: {rec['patterns']}\n{rec['tail']}\n")
