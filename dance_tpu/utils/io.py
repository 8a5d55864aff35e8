"""Small IO helpers (parity: dance/utils/io.py:7)."""

import pandas as pd


def load_data_url_dict_from_csv(path) -> dict:
    """Two-column (name, url) CSV -> dict."""
    df = pd.read_csv(path, header=None)
    return dict(zip(df[0].astype(str), df[1].astype(str)))
