"""Normalize raw per-tissue similarity sheets (complex-string entries ->
floats, duplicate rows dropped) and combine every tissue's sheets into one
long table (parity: examples/atlas/sc_similarity_examples/similarity/
process_tissue_similarity_matrices.py — Excel books there, CSV books here
since openpyxl is absent).

Run::

    python examples/atlas/sc_similarity_examples/similarity/process_tissue_similarity_matrices.py \
        [--sim_root DIR] [--tissues blood heart ...]

Outputs ``data/new_sim/{tissue}/{sheet}.csv`` plus the merged
``data/new_sim/combined_output.csv``.
"""

import argparse
import ast
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert_to_complex(s):
    """Real part of a complex-number string (spectral/bures metrics emit
    numpy complex reprs); NaN when unparseable."""
    if isinstance(s, (float, int)):
        return s
    try:
        return float(ast.literal_eval(s).real)
    except (ValueError, SyntaxError, AttributeError):
        return np.nan


def convert_complex_value(x):
    """Single-cell normalization: complex with ~0 imaginary -> float."""
    if isinstance(x, str):
        try:
            c = complex(x.strip("()"))
        except ValueError:
            return x
        return float(c.real) if abs(c.imag) < 1e-10 else c
    if isinstance(x, complex):
        return float(x.real) if abs(x.imag) < 1e-10 else x
    return x


def unify_complex_float_types_cell(df):
    """Normalize every cell in place (the reference's per-cell variant)."""
    df = df.astype(object)  # mixed str/float cells during the rewrite
    for col in df.columns:
        for idx in df.index:
            df.at[idx, col] = convert_complex_value(df.at[idx, col])
    return df


def unify_complex_float_types(df):
    """Column-wise normalization for columns that contain complex values."""
    for col in df.columns:
        if df[col].apply(lambda x: isinstance(x, complex)).any():
            df[col] = df[col].apply(convert_complex_value)
    return df


def process_books(books):
    """Transpose each sheet of each book, tag provenance, concat, write CSV."""
    all_data = []
    for book_dir in books:
        file_name = os.path.basename(book_dir.rstrip("/"))
        for sheet in sorted(os.listdir(book_dir)):
            if not sheet.endswith(".csv"):
                continue
            df = pd.read_csv(os.path.join(book_dir, sheet), index_col=0)
            dft = df.transpose()
            dft["file_name"] = file_name
            dft["sheet_name"] = sheet[:-4]
            all_data.append(dft)
    final_df = unify_complex_float_types(pd.concat(all_data, ignore_index=True))
    output_path = os.path.join(os.path.dirname(books[0].rstrip("/")),
                               "combined_output.csv")
    final_df.to_csv(output_path, encoding="utf-8-sig", index=True)
    return output_path


if __name__ == "__main__":
    from _fixtures import TISSUES, stage_workflow_fixtures

    p = argparse.ArgumentParser()
    p.add_argument("--sim_root", default=None)
    p.add_argument("--tissues", nargs="+", default=TISSUES)
    args = p.parse_args()

    sim_root = args.sim_root
    if sim_root is None:
        sim_root = stage_workflow_fixtures("/tmp/atlas_workflow_demo")
        print(f"(no --sim_root; staged demo tree under {sim_root})")

    new_books = []
    for tissue in args.tissues:
        raw_dir = os.path.join(sim_root, "data", "dataset_similarity", tissue)
        out_dir = os.path.join(sim_root, "data", "new_sim", tissue)
        os.makedirs(out_dir, exist_ok=True)
        for sheet in sorted(os.listdir(raw_dir)):
            if not sheet.endswith(".csv"):
                continue
            df = pd.read_csv(os.path.join(raw_dir, sheet), index_col=0)
            df = df[~df.index.duplicated(keep="last")]
            df = unify_complex_float_types_cell(df)
            df.to_csv(os.path.join(out_dir, sheet))
        new_books.append(out_dir)
        print(f"{tissue}: normalized {raw_dir} -> {out_dir}")

    output_file = process_books(new_books)
    print(f"Combined data has been saved to: {output_file}")
