"""Top-gene-pair features for SingleCellNet (parity: dance/transforms/scn_feature.py)."""

import itertools
from collections import defaultdict

import numpy as np
import pandas as pd

from dance_tpu.registry import register_preprocessor
from dance_tpu.settings import logger
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.transforms.stats import genestats_alpha, genestats_mu
from dance_tpu.typing import Dict, List, Optional, Tuple


def _get_deg_scores(exp_df: pd.DataFrame, cell_type_mask: np.ndarray) -> np.ndarray:
    """Signed sqrt-R² of regressing expression on the cell-type indicator."""
    y = np.vstack([cell_type_mask, np.ones(len(cell_type_mask))]).T
    p = np.linalg.lstsq(y, exp_df.values, rcond=None)[0]
    recon = y @ p
    x = exp_df.values
    ss_res = ((x - recon) ** 2).sum(0)
    ss_tot = ((x - x.mean(0)) ** 2).sum(0)
    with np.errstate(divide="ignore", invalid="ignore"):
        r2 = np.clip(1 - ss_res / ss_tot, 0, None)
    return np.sqrt(r2) * np.sign(p[0])


def _get_degs_dict(exp_df, cell_type_array, num_top_genes, both_ends: bool = True
                   ) -> Dict[str, List[str]]:
    degs = {}
    for ct in np.unique(cell_type_array):
        mask = (cell_type_array == ct).astype(float)
        cval = _get_deg_scores(exp_df, mask)
        valid = np.nonzero(~np.isnan(cval))[0]
        order = cval[valid].argsort()[::-1]
        sel = order[:num_top_genes].tolist()
        if both_ends:
            sel.extend(order[-num_top_genes:].tolist())
        degs[ct] = exp_df.columns[valid[sorted(set(sel))]].tolist()
    return degs


def get_diff_exp_genes(exp_df, cell_type_array, *, num_top_genes: int = 100,
                       threshold: float = 0, alpha1: float = 0.05, alpha2: float = 0.001,
                       mu: float = 2) -> Dict[str, List[str]]:
    """Alpha/mu-gated differential expression gene selection (parity: scn_feature.py:182)."""
    alpha = genestats_alpha(exp_df.values, threshold=threshold)
    mu_stat = genestats_mu(exp_df.values, threshold=threshold)
    keep = np.logical_or(alpha > alpha1, np.logical_and(alpha > alpha2, mu_stat > mu))
    return _get_degs_dict(exp_df.loc[:, exp_df.columns[keep]], cell_type_array,
                          num_top_genes)


def _get_best_gene_pairs(scores, gene_pairs, num_pairs: int = 50, max_gene_per_ct: int = 3):
    valid = np.nonzero(~np.isnan(scores))[0]
    order = valid[scores[valid].argsort()[::-1]]
    best, counts = [], defaultdict(int)
    for idx in order:
        g1, g2 = gene_pairs[idx]
        if counts[g1] < max_gene_per_ct and counts[g2] < max_gene_per_ct:
            best.append((g1, g2))
            counts[g1] += 1
            counts[g2] += 1
        if len(best) == num_pairs:
            break
    else:
        logger.warning("Ran out of gene pairs: wanted %d, got %d", num_pairs, len(best))
    return best


def get_top_gene_pairs(exp_df, cell_type_array, degs_dict, *, num_top_pairs: int = 250,
                       max_gene_per_ct: int = 3) -> List[Tuple[str, str]]:
    """Rank binarized gene-pair patterns per cell type (parity: scn_feature.py:104)."""
    top = []
    for ct, degs in degs_dict.items():
        pairs = list(itertools.combinations(degs, 2))
        if not pairs:
            continue
        g1 = [p[0] for p in pairs]
        g2 = [p[1] for p in pairs]
        pair_bin = pd.DataFrame((exp_df[g1].values > exp_df[g2].values).astype(float),
                                columns=["&".join(p) for p in pairs])
        mask = (cell_type_array == ct).astype(float)
        scores = _get_deg_scores(pair_bin, mask)
        top.extend(_get_best_gene_pairs(scores, pairs, num_pairs=num_top_pairs,
                                        max_gene_per_ct=max_gene_per_ct))
    return sorted(set(top))


def query_transform(exp_df: pd.DataFrame, gene_pairs: List[Tuple[str, str]]):
    """Binary g1>g2 features for the selected pairs (parity: scn_feature.py:81)."""
    g1, g2 = map(list, zip(*gene_pairs))
    out = (exp_df[g1].values > exp_df[g2].values).astype(float)
    return pd.DataFrame(out, index=exp_df.index, columns=["&".join(p) for p in gene_pairs])


@register_preprocessor("feature", "cell")
class SCNFeature(BaseTransform):
    """Differential gene-pair binary features (parity: scn_feature.py:16)."""

    _DISPLAY_ATTRS = ("num_top_genes", "alpha1", "alpha2", "mu", "num_top_gene_pairs",
                      "max_gene_per_ct", "split_name")

    def __init__(self, num_top_genes: int = 10, alpha1: float = 0.05,
                 alpha2: float = 0.001, mu: float = 2, num_top_gene_pairs: int = 25,
                 max_gene_per_ct: int = 3, *, split_name: Optional[str] = "train",
                 channel: Optional[str] = None, channel_type: Optional[str] = None,
                 **kwargs):
        super().__init__(**kwargs)
        self.num_top_genes = num_top_genes
        self.alpha1 = alpha1
        self.alpha2 = alpha2
        self.mu = mu
        self.num_top_gene_pairs = num_top_gene_pairs
        self.max_gene_per_ct = max_gene_per_ct
        self.split_name = split_name
        self.channel = channel
        self.channel_type = channel_type

    def __call__(self, data):
        split_idx = data.get_split_idx(self.split_name)
        import scipy.sparse as sp
        X = data.data.X
        all_exp_df = pd.DataFrame(X.toarray() if sp.issparse(X) else np.asarray(X),
                                  index=data.data.obs_names, columns=data.data.var_names)
        ct_df = data.get_feature(return_type="default", channel="cell_type",
                                 channel_type="obsm").iloc[split_idx]
        norm_exp_df = all_exp_df.iloc[split_idx]
        ct_array = ct_df.columns.values[ct_df.values.argmax(1)]
        degs = get_diff_exp_genes(norm_exp_df, ct_array, alpha1=self.alpha1,
                                  alpha2=self.alpha2, mu=self.mu,
                                  num_top_genes=self.num_top_genes)
        pairs = get_top_gene_pairs(norm_exp_df, ct_array, degs,
                                   num_top_pairs=self.num_top_gene_pairs,
                                   max_gene_per_ct=self.max_gene_per_ct)
        data.data.obsm[self.out] = query_transform(all_exp_df, pairs)
        return data
