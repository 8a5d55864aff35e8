"""Shared example-script helpers: synthetic fallbacks for no-egress runs."""

import argparse

from dance_tpu.datasets import synthetic  # noqa: F401  (re-export)
from dance_tpu.datasets.synthetic import (annotation_data, clustering_data,
                                          imputation_data, multimodal_data,
                                          spatial_data)
from dance_tpu.utils import set_seed


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cache", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="run on synthetic data (default when raw data is absent)")
    p.add_argument("--data_dir", type=str, default="./data")
    return p
