"""Cell/gene filtering transforms (parity: dance/transforms/filter.py, 1581 LoC).

All classes registered under ``preprocessor.filter[.cell|.gene]`` with the
reference names (SURVEY.md Appendix A) so pipeline-search YAMLs stay valid.
"""

from abc import ABC, abstractmethod

import numpy as np
import pandas as pd
import scipy.sparse as sp
from scipy.stats import median_abs_deviation, rankdata

from dance_tpu.exceptions import DevError
from dance_tpu.registry import register_preprocessor
from dance_tpu.settings import logger as default_logger
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.transforms.interface import AnnDataTransform
from dance_tpu.typing import List, Literal, Optional, Union
from dance_tpu.utils import default
from dance_tpu.utils.wrappers import add_mod_and_transform

GeneSummaryMode = Literal["sum", "var", "cv", "rv"]


def _get_count(value, basis: int):
    """Resolve a float in (0, 1) as a ratio of ``basis``, else pass through."""
    if isinstance(value, float) and 0 < value < 1:
        return int(value * basis)
    return value


@register_preprocessor("filter")
@add_mod_and_transform
class FilterScanpy(BaseTransform):
    """Count/feature-threshold filtering with ratio support (parity: filter.py:53).

    Float thresholds in (0, 1) are interpreted as ratios — of total counts
    percentile for ``*_counts`` and of the axis size for ``*_genes_or_cells``.
    """

    _FILTER_TARGET: Optional[Literal["cells", "genes"]] = None

    def __init__(self, min_counts=None, min_genes_or_cells=None, max_counts=None,
                 max_genes_or_cells=None, split_name: Optional[str] = None,
                 channel: Optional[str] = None, channel_type: Optional[str] = "X",
                 key_n_counts: Optional[str] = None,
                 key_n_genes_or_cells: Optional[str] = None, inplace=True, **kwargs):
        super().__init__(**kwargs)
        self.min_counts = min_counts
        self.min_genes_or_cells = min_genes_or_cells
        self.max_counts = max_counts
        self.max_genes_or_cells = max_genes_or_cells
        self.split_name = split_name
        self.channel = channel
        self.channel_type = channel_type
        self.key_n_counts = key_n_counts
        self.key_n_genes_or_cells = key_n_genes_or_cells
        self.inplace = inplace
        if self._FILTER_TARGET not in ("cells", "genes"):
            if type(self) is FilterScanpy:
                raise NotImplementedError("Use FilterCellsScanpy or FilterGenesScanpy")
            raise ValueError(f"Unknown filter target {self._FILTER_TARGET!r}")

    def _thresholds(self, x):
        axis = 1 if self._FILTER_TARGET == "cells" else 0
        n_counts = np.asarray(x.sum(axis=axis)).ravel()
        n_nonzero = np.asarray((x > 0).sum(axis=axis)).ravel()
        min_counts, max_counts = self.min_counts, self.max_counts
        if isinstance(min_counts, float) and 0 < min_counts < 1:
            min_counts = np.percentile(n_counts, min_counts * 100)
        if isinstance(max_counts, float) and 0 < max_counts < 1:
            max_counts = np.percentile(n_counts, max_counts * 100)
        basis = x.shape[1 - axis]
        min_other = _get_count(self.min_genes_or_cells, basis)
        max_other = _get_count(self.max_genes_or_cells, basis)
        return n_counts, n_nonzero, min_counts, max_counts, min_other, max_other

    def __call__(self, data):
        x = data.get_feature(return_type="numpy", split_name=self.split_name,
                             channel=self.channel, channel_type=self.channel_type)
        n_counts, n_nonzero, min_c, max_c, min_o, max_o = self._thresholds(x)
        mask = np.ones(len(n_counts), dtype=bool)
        if min_c is not None:
            mask &= n_counts >= min_c
        if max_c is not None:
            mask &= n_counts <= max_c
        if min_o is not None:
            mask &= n_nonzero >= min_o
        if max_o is not None:
            mask &= n_nonzero <= max_o

        if self._FILTER_TARGET == "cells":
            if self.key_n_counts:
                data.data.obs[self.key_n_counts] = n_counts
            if self.key_n_genes_or_cells:
                data.data.obs[self.key_n_genes_or_cells] = n_nonzero
        else:
            if self.key_n_counts:
                data.data.var[self.key_n_counts] = n_counts
            if self.key_n_genes_or_cells:
                data.data.var[self.key_n_genes_or_cells] = n_nonzero

        if mask.all():
            return data
        self.logger.info("Removing %d %s due to %r", (~mask).sum(), self._FILTER_TARGET, self)
        if self.inplace:
            if self._FILTER_TARGET == "genes":
                data.data._inplace_subset_var(mask)
            else:
                data.filter_by_mask(mask)
        else:
            if self._FILTER_TARGET == "genes":
                data.data.obsm[self.out] = np.asarray(x)[:, mask]
            else:
                data.data.varm[self.out] = np.asarray(x)[mask].T
        return data


@register_preprocessor("filter", "cell")
@add_mod_and_transform
class FilterCellsScanpy(FilterScanpy):
    """Filter cells by counts/#genes thresholds (parity: filter.py:165)."""

    _FILTER_TARGET = "cells"
    _DISPLAY_ATTRS = ("min_counts", "min_genes_or_cells", "max_counts",
                      "max_genes_or_cells")

    def __init__(self, min_counts=None, min_genes=None, max_counts=None, max_genes=None,
                 split_name=None, channel=None, channel_type="X", key_n_counts=None,
                 key_n_genes=None, inplace=True, **kwargs):
        super().__init__(min_counts=min_counts, min_genes_or_cells=min_genes,
                         max_counts=max_counts, max_genes_or_cells=max_genes,
                         split_name=split_name, channel=channel, channel_type=channel_type,
                         key_n_counts=key_n_counts, key_n_genes_or_cells=key_n_genes,
                         inplace=inplace, **kwargs)


@register_preprocessor("filter", "gene")
@add_mod_and_transform
class FilterGenesScanpy(FilterScanpy):
    """Filter genes by counts/#cells thresholds (parity: filter.py:228)."""

    _FILTER_TARGET = "genes"
    _DISPLAY_ATTRS = ("min_counts", "min_genes_or_cells", "max_counts",
                      "max_genes_or_cells")

    def __init__(self, min_counts=None, min_cells=None, max_counts=None, max_cells=None,
                 split_name=None, channel=None, channel_type="X", key_n_counts=None,
                 key_n_cells=None, inplace=True, **kwargs):
        super().__init__(min_counts=min_counts, min_genes_or_cells=min_cells,
                         max_counts=max_counts, max_genes_or_cells=max_cells,
                         split_name=split_name, channel=channel, channel_type=channel_type,
                         key_n_counts=key_n_counts, key_n_genes_or_cells=key_n_cells,
                         inplace=inplace, **kwargs)


@register_preprocessor("filter", "cell")
@add_mod_and_transform
class FilterCellsCommonMod(BaseTransform):
    """Keep cells present in both modalities (parity: filter.py:280)."""

    _DISPLAY_ATTRS = ("mod1", "mod2", "sol")

    def __init__(self, mod1: str, mod2: str, sol: Optional[str] = None, **kwargs):
        super().__init__(**kwargs)
        self.mod1, self.mod2, self.sol = mod1, mod2, sol

    def __call__(self, data):
        md = data.data
        common = sorted(set(md.mod[self.mod1].obs.index) & set(md.mod[self.mod2].obs.index))
        for m in filter(None, (self.mod1, self.mod2, self.sol)):
            md.mod[m] = md.mod[m][np.asarray(common)]
        return data


@register_preprocessor("filter", "gene")
class FilterGenesCommon(BaseTransform):
    """Keep genes expressed in every batch/split (parity: filter.py:319)."""

    _DISPLAY_ATTRS = ("batch_key", "split_keys")

    def __init__(self, batch_key: Optional[str] = None,
                 split_keys: Optional[List[str]] = None, **kwargs):
        super().__init__(**kwargs)
        if (batch_key is None) == (split_keys is None):
            raise ValueError("Exactly one of batch_key / split_keys must be set, got "
                             f"{batch_key=!r}, {split_keys=!r}")
        self.batch_key = batch_key
        self.split_keys = split_keys

    def __call__(self, data):
        if self.split_keys is not None:
            groups = {k: data.data[np.asarray(data.get_split_idx(k, error_on_miss=True))]
                      for k in self.split_keys}
        else:
            batches = np.asarray(data.data.obs[self.batch_key])
            groups = {b: data.data[batches == b] for b in np.unique(batches)}
        keep_sets = []
        for name, sub in groups.items():
            abs_sum = np.asarray(np.abs(sub.X).sum(0)).ravel()
            genes = set(np.asarray(sub.var_names)[abs_sum > 0])
            self.logger.info("%d genes found in %r", len(genes), name)
            keep_sets.append(genes)
        common = sorted(set.intersection(*keep_sets))
        self.logger.info("Found %d common genes of %d", len(common), data.shape[1])
        data.data._inplace_subset_var(np.asarray(common))
        return data


@register_preprocessor("filter", "gene")
class FilterGenesMatch(BaseTransform):
    """Remove genes matching name prefixes/suffixes (parity: filter.py:385)."""

    _DISPLAY_ATTRS = ("prefixes", "suffixes")

    def __init__(self, prefixes: Optional[List[str]] = None,
                 suffixes: Optional[List[str]] = None, case_sensitive: bool = False,
                 **kwargs):
        super().__init__(**kwargs)
        self.prefixes = prefixes or []
        self.suffixes = suffixes or []
        self.case_sensitive = case_sensitive
        if case_sensitive:
            self.prefixes = [i.upper() for i in self.prefixes]
            self.suffixes = [i.upper() for i in self.suffixes]

    def __call__(self, data):
        names = pd.Series(data.data.var_names.astype(str))
        check = names.str.upper() if self.case_sensitive else names
        remove = np.zeros(data.shape[1], dtype=bool)
        for pref in self.prefixes:
            remove |= check.str.startswith(pref).to_numpy()
        for suf in self.suffixes:
            remove |= check.str.endswith(suf).to_numpy()
        self.logger.info("Removing %d genes by name match", int(remove.sum()))
        data.data._inplace_subset_var(~remove)
        return data


class FilterGenes(BaseTransform, ABC):
    """Filter genes by a summarized expression stat (parity: filter.py:438)."""

    def __init__(self, *, mode: GeneSummaryMode = "sum", channel: Optional[str] = None,
                 channel_type: Optional[str] = None,
                 whitelist_indicators: Optional[Union[str, List[str]]] = None,
                 add_n_counts=True, add_n_cells=True, inplace=True, **kwargs):
        super().__init__(**kwargs)
        if channel is not None and channel_type != "layers":
            raise ValueError(f"Only layers channels allowed for gene filtering, "
                             f"got {channel_type=!r}")
        if mode not in ("sum", "var", "cv", "rv"):
            raise ValueError(f"Unknown summarization mode {mode!r}")
        self.mode = mode
        self.channel = channel
        self.channel_type = channel_type
        self.whitelist_indicators = whitelist_indicators
        self.add_n_counts = add_n_counts
        self.add_n_cells = add_n_cells
        self.inplace = inplace

    @abstractmethod
    def _get_preserve_mask(self, gene_summary: np.ndarray) -> np.ndarray:
        ...

    def _summarize(self, x) -> np.ndarray:
        if self.mode == "sum":
            return np.asarray(x.sum(0)).ravel()
        mean = np.asarray(x.mean(0)).ravel()
        msq = np.asarray((x ** 2).mean(0)).ravel()
        var = msq - mean ** 2
        if self.mode == "var":
            return var
        with np.errstate(divide="ignore", invalid="ignore"):
            if self.mode == "cv":
                return np.nan_to_num(np.sqrt(np.maximum(var, 0)) / mean, posinf=0, neginf=0)
            return np.nan_to_num(var / mean, posinf=0, neginf=0)  # rv

    def __call__(self, data):
        x = data.get_feature(return_type="numpy", channel=self.channel,
                             channel_type=self.channel_type or "X")
        if self.add_n_counts:
            data.data.var["n_counts"] = np.asarray(x.sum(0)).ravel()
        if self.add_n_cells:
            data.data.var["n_cells"] = np.asarray((x > 0).sum(0)).ravel()
        gene_summary = self._summarize(np.asarray(x))
        mask = self._get_preserve_mask(gene_summary)
        selected = set(np.asarray(data.data.var_names)[mask])
        if self.whitelist_indicators is not None:
            cols = ([self.whitelist_indicators] if isinstance(self.whitelist_indicators, str)
                    else self.whitelist_indicators)
            ind = data.data.var[cols].astype(bool)
            selected |= set(ind.index[ind.any(axis=1)])
        selected = sorted(selected)
        data.data.uns["gene_summary"] = gene_summary
        self.logger.info("%d genes removed", data.shape[1] - len(selected))
        if self.inplace:
            data.data._inplace_subset_var(np.asarray(selected))
        else:
            data.data.obsm[self.out] = data.data[:, np.asarray(selected)].X
        return data


@register_preprocessor("filter", "gene")
@add_mod_and_transform
class FilterGenesPercentile(FilterGenes):
    """Keep genes between summary-stat percentiles (parity: filter.py:521)."""

    _DISPLAY_ATTRS = ("min_val", "max_val", "mode")

    def __init__(self, min_val: Optional[float] = 1, max_val: Optional[float] = 99,
                 **kwargs):
        super().__init__(**kwargs)
        self.min_val = min_val
        self.max_val = max_val

    def _get_preserve_mask(self, gene_summary):
        lo = (np.percentile(gene_summary, self.min_val) if self.min_val is not None
              else -np.inf)
        hi = (np.percentile(gene_summary, self.max_val) if self.max_val is not None
              else np.inf)
        return (gene_summary >= lo) & (gene_summary <= hi)


@register_preprocessor("filter", "gene")
@add_mod_and_transform
class FilterGenesTopK(FilterGenes):
    """Keep top/bottom-k genes by summary stat (parity: filter.py:590)."""

    _DISPLAY_ATTRS = ("num_genes", "top", "mode")

    def __init__(self, num_genes: int = 1000, top: bool = True, *,
                 mode: GeneSummaryMode = "cv", channel=None, channel_type="X",
                 whitelist_indicators=None, add_n_counts=False, add_n_cells=False,
                 inplace=True, **kwargs):
        if channel_type == "X":
            channel_type = None
        super().__init__(mode=mode, channel=channel, channel_type=channel_type,
                         whitelist_indicators=whitelist_indicators,
                         add_n_counts=add_n_counts, add_n_cells=add_n_cells,
                         inplace=inplace, **kwargs)
        self.num_genes = num_genes
        self.top = top

    def _get_preserve_mask(self, gene_summary):
        k = min(self.num_genes, gene_summary.size)
        if k < self.num_genes:
            self.logger.warning("num_genes=%d > total genes %d", self.num_genes,
                                gene_summary.size)
        order = gene_summary.argsort()
        sel = order[-k:] if self.top else order[:k]
        mask = np.zeros(gene_summary.size, dtype=bool)
        mask[sel] = True
        return mask


@register_preprocessor("filter", "gene")
class FilterGenesMarker(BaseTransform):
    """Select marker genes from a cell-type profile by log-FC (parity: filter.py:666)."""

    _DISPLAY_ATTRS = ("ct_profile_channel", "subset", "threshold", "eps")

    def __init__(self, *, ct_profile_channel: str = "CellTopicProfile", subset: bool = True,
                 label: Optional[str] = None, threshold: float = 1.25, eps: float = 1e-6,
                 **kwargs):
        super().__init__(**kwargs)
        self.ct_profile_channel = ct_profile_channel
        self.subset = subset
        self.label = label
        self.threshold = threshold
        self.eps = eps

    @staticmethod
    def get_marker_genes(ct_profile: np.ndarray, cell_types: List[str], genes: List[str], *,
                         threshold: float = 1.25, eps: float = 1e-6,
                         logger=default_logger):
        if len(cell_types) < 2:
            raise ValueError("Need at least two cell types to find marker genes")
        ind = pd.DataFrame(False, index=genes, columns=cell_types)
        for i, ct in enumerate(cell_types):
            others = [j for j in range(len(cell_types)) if j != i]
            log_fc = (np.log(ct_profile[:, i] + eps)
                      - np.log(ct_profile[:, others].mean(1) + eps))
            hits = np.nonzero(log_fc > threshold)[0]
            ind.iloc[hits, i] = True
            logger.info("Found %d marker genes for cell type %r", len(hits), ct)
        is_marker = ind.max(1)
        return is_marker[is_marker].index.tolist(), ind

    def __call__(self, data):
        profile = data.get_feature(channel=self.ct_profile_channel, channel_type="varm",
                                   return_type="default")
        markers, ind = self.get_marker_genes(profile.values, profile.columns.tolist(),
                                             profile.index.tolist(), eps=self.eps,
                                             threshold=self.threshold, logger=self.logger)
        data.data.varm[self.out] = ind
        if self.label is not None:
            data.data.var[self.label] = ind.max(1)
        if self.subset:
            data.data._inplace_subset_var(np.asarray(markers))
        return data


@register_preprocessor("filter", "gene")
class FilterGenesRegression(BaseTransform):
    """Dropout/variance regression gene selection (parity: filter.py:759).

    methods: enclasc / seurat3 / scmap — residual-based scoring against a
    fitted mean-dropout (or mean-variance) trend, then top-k genes.
    """

    _DISPLAY_ATTRS = ("method", "num_genes")

    def __init__(self, method: str = "enclasc", num_genes: int = 1000, *,
                 channel: Optional[str] = None, channel_type: Optional[str] = None,
                 mod: Optional[str] = None, skip_count_check: bool = False, inplace=True,
                 **kwargs):
        super().__init__(**kwargs)
        self.method = method
        self.num_genes = num_genes
        self.channel = channel
        self.channel_type = channel_type
        self.mod = mod
        self.skip_count_check = skip_count_check
        self.inplace = inplace

    def __call__(self, data):
        feat = data.get_feature(return_type="numpy", channel=self.channel,
                                channel_type=self.channel_type or "X", mod=self.mod)
        feat = np.asarray(feat, dtype=np.float64)
        if not self.skip_count_check and np.mod(feat, 1).sum():
            self.logger.warning("Input does not appear to be count data")
        funcs = {"enclasc": self._enclasc, "seurat3": self._seurat3, "scmap": self._scmap}
        if self.method not in funcs:
            raise ValueError(f"Unknown method {self.method!r}, options: {sorted(funcs)}")
        k = min(self.num_genes, feat.shape[1])
        idx = funcs[self.method](feat, k)
        names = np.asarray(data.data.var_names)[idx]
        if self.inplace:
            data.data._inplace_subset_var(names)
        else:
            data.data.obsm[self.out] = data.data[:, names].X
        return data

    @staticmethod
    def _fit_resid(x, y):
        A = np.column_stack([np.ones_like(x), x])
        beta, *_ = np.linalg.lstsq(A, y, rcond=None)
        return y - A @ beta

    def _enclasc(self, feat, k):
        mean = feat.mean(0)
        drop = (feat == 0).mean(0)
        scores = np.full(feat.shape[1], -100.0)
        sel = (drop > 0) & (drop < 1)
        y = np.log(mean + 1)[sel]
        resid = self._fit_resid(drop[sel], y)
        scores[sel] = y + resid - mean[sel]
        return np.argpartition(scores, -k)[-k:]

    def _seurat3(self, feat, k):
        mean_log = np.log(feat.mean(0) + 1)
        var_log = np.log(feat.var(0) + 1)
        A = np.column_stack([np.ones_like(mean_log), mean_log, mean_log ** 2])
        beta, *_ = np.linalg.lstsq(A, var_log, rcond=None)
        scores = var_log - A @ beta
        return np.argpartition(scores, -k)[-k:]

    def _scmap(self, feat, k):
        mean = feat.mean(0)
        drop = (feat == 0).mean(0)
        scores = np.full(feat.shape[1], -100.0)
        sel = (drop > 0) & (drop < 1)
        x = np.log2(mean[sel] + 1)
        y = np.log2(drop[sel] * 100)
        scores[sel] = self._fit_resid(x, y)
        return np.argpartition(scores, -k)[-k:]


def gini_func(x, weights=None):
    """Weighted Gini coefficient with negative-value correction (RSV variant)."""
    x = np.asarray(x, dtype=np.float64)
    weights = np.ones(len(x)) if weights is None else np.asarray(weights, np.float64)
    order = np.argsort(x)
    x, weights = x[order], weights[order]
    N = weights.sum()
    xw = x * weights
    C = np.cumsum(weights)
    g_num = (2 / N ** 2) * np.sum(xw * C) - (1 / N) * np.sum(xw) - (1 / N ** 2) * np.sum(
        xw * weights)
    t_neg = np.sum(xw[xw <= 0])
    t_pos = np.sum(xw) + abs(t_neg)
    mean_rsv = (t_pos + abs(t_neg)) / N
    return g_num / mean_rsv if mean_rsv != 0 else 0.0


@register_preprocessor("filter", "gene")
class FilterGenesMarkerGini(BaseTransform):
    """Giotto-style Gini marker selection (parity: filter.py:870)."""

    _DISPLAY_ATTRS = ("ct_profile_channel", "subset")

    def __init__(self, *, ct_profile_channel: str = "CellGiottoTopicProfile",
                 ct_profile_detection_channel: str = "CellGiottoDetectionTopicProfile",
                 subset: bool = True, label: Optional[str] = None, **kwargs):
        super().__init__(**kwargs)
        self.ct_profile_channel = ct_profile_channel
        self.ct_profile_detection_channel = ct_profile_detection_channel
        self.subset = subset
        self.label = label

    @staticmethod
    def _score_pair(g1, g2, d1, d2, genes, min_expr_gini=0.2, min_det_gini=0.2,
                    rank_score=1, min_genes=5):
        n = g1.shape[0]
        expr_gini = np.array([gini_func([g1[i], g2[i]]) for i in range(n)])
        det_gini = np.array([gini_func([d1[i], d2[i]]) for i in range(n)])

        def rank01(a, b):
            # rank within the pair, scaled to [0.1, 1]
            r = np.vstack([rankdata(np.array([a[i], b[i]])) for i in range(n)]).T
            rmin, rmax = r.min(), r.max()
            return 0.1 + (r - rmin) / max(rmax - rmin, 1e-12) * 0.9

        rank_e = rank01(g1, g2)[0]
        rank_d = rank01(d1, d2)[0]
        score = det_gini * expr_gini * rank_e * rank_d
        order_rank = np.argsort(np.argsort(-score)) + 1
        df = pd.DataFrame({"ans_score": score, "ans_rank": order_rank, "expression": g1,
                           "detection": d1, "expression_gini": expr_gini,
                           "detection_gini": det_gini, "gene_name": genes})
        top = df[(df.ans_rank <= min_genes)
                 | ((rank_e <= rank_score) & (rank_d <= rank_score))]
        return top[(top.ans_rank <= min_genes)
                   | ((top.expression > min_expr_gini) & (top.detection > min_det_gini))]

    def __call__(self, data):
        prof = data.get_feature(channel=self.ct_profile_channel, channel_type="varm",
                                return_type="default")
        det = data.get_feature(channel=self.ct_profile_detection_channel,
                               channel_type="varm", return_type="default")
        nums = data.data.uns.get("CellTypeNums")
        cts = prof.columns.tolist()
        genes = prof.index.tolist()
        ind = pd.DataFrame(False, index=genes, columns=cts)
        frames = []
        for i, ct in enumerate(cts):
            weights = (np.array([nums.loc[c, "nums"] for c in cts], dtype=np.float64)
                       if nums is not None else np.ones(len(cts)))
            others = [j for j in range(len(cts)) if j != i]
            w = weights[others] / weights[others].sum()
            other_prof = (prof.values[:, others] * w).sum(1)
            other_det = (det.values[:, others] * w).sum(1)
            top = self._score_pair(prof.values[:, i], other_prof, det.values[:, i],
                                   other_det, genes)
            top = top.copy()
            top["cellType"] = ct
            frames.append(top)
            ind.iloc[np.asarray(top.index), i] = True
        markers = ind.index[ind.any(axis=1)].tolist()
        data.data.uns[self.out] = pd.concat(frames, axis=0)
        if self.label is not None:
            data.data.var[self.label] = ind.max(1)
        if self.subset:
            data.data._inplace_subset_var(np.asarray(markers))
        return data


@register_preprocessor("filter", "gene")
class FilterGenesScanpyOrder(BaseTransform):
    """Apply gene filters in a configurable order (parity: filter.py:1048)."""

    _DISPLAY_ATTRS = ("order",)

    def __init__(self, order: Optional[List[str]] = None, min_counts=None, min_cells=None,
                 max_counts=None, max_cells=None, split_name=None, channel=None,
                 channel_type="X", inplace=True, **kwargs):
        super().__init__(**kwargs)
        self.order = default(order, ["min_counts", "min_cells", "max_counts", "max_cells"])
        params = {"min_counts": min_counts, "min_cells": min_cells,
                  "max_counts": max_counts, "max_cells": max_cells}
        if not set(self.order).issubset(params):
            raise KeyError(f"Order entries must be in {sorted(params)}")
        self.steps = {key: FilterGenesScanpy(**{key: params[key]}, split_name=split_name,
                                             channel=channel, channel_type=channel_type,
                                             inplace=inplace)
                      for key in self.order}

    def __call__(self, data):
        for key in self.order:
            self.steps[key](data)
        return data


@register_preprocessor("filter", "cell")
@add_mod_and_transform
class FilterCellsScanpyOrder(BaseTransform):
    """Apply cell filters in a configurable order (parity: filter.py:1403)."""

    _DISPLAY_ATTRS = ("order",)

    def __init__(self, order: Optional[List[str]] = None, min_counts=None, min_genes=None,
                 max_counts=None, max_genes=None, split_name=None, channel=None,
                 channel_type="X", add_n_counts=True, add_n_genes=True, inplace=True,
                 **kwargs):
        super().__init__(**kwargs)
        self.order = default(order, ["min_counts", "min_genes", "max_counts", "max_genes"])
        params = {"min_counts": min_counts, "min_genes": min_genes,
                  "max_counts": max_counts, "max_genes": max_genes}
        if not set(self.order).issubset(params):
            raise KeyError(f"Order entries must be in {sorted(params)}")
        self.steps = {key: FilterCellsScanpy(
            **{key: params[key]}, split_name=split_name, channel=channel,
            channel_type=channel_type,
            key_n_counts="n_counts" if add_n_counts else None,
            key_n_genes="n_genes" if add_n_genes else None, inplace=inplace)
            for key in self.order}

    def __call__(self, data):
        for key in self.order:
            self.steps[key](data)
        return data


@register_preprocessor("filter", "gene")
@add_mod_and_transform
class HighlyVariableGenesRawCount(AnnDataTransform):
    """seurat_v3 HVG on raw counts (parity: filter.py:1141)."""

    def __init__(self, channel=None, channel_type=None, n_top_genes: Optional[int] = 1000,
                 span: float = 0.3, subset: bool = True, inplace: bool = True, **kwargs):
        super().__init__("sc.pp.highly_variable_genes", n_top_genes=n_top_genes, span=span,
                         subset=subset, inplace=inplace, flavor="seurat_v3", **kwargs)


@register_preprocessor("filter", "gene")
@add_mod_and_transform
class HighlyVariableGenesLogarithmizedByTopGenes(AnnDataTransform):
    """cell_ranger/seurat HVG by top-n on log data (parity: filter.py:1217)."""

    def __init__(self, channel=None, channel_type=None, n_top_genes: Optional[int] = 1000,
                 n_bins: int = 20, flavor: Literal["seurat", "cell_ranger"] = "seurat",
                 subset: bool = True, inplace: bool = True, **kwargs):
        super().__init__("sc.pp.highly_variable_genes", n_top_genes=n_top_genes,
                         n_bins=n_bins, flavor=flavor, subset=subset, inplace=inplace,
                         **kwargs)


@register_preprocessor("filter", "gene")
@add_mod_and_transform
class HighlyVariableGenesLogarithmizedByMeanAndDisp(AnnDataTransform):
    """seurat HVG by mean/dispersion cutoffs on log data (parity: filter.py:1312)."""

    def __init__(self, channel=None, channel_type=None, min_disp: float = 0.5,
                 max_disp: float = np.inf, min_mean: float = 0.0125, max_mean: float = 3,
                 n_bins: int = 20, subset: bool = True, inplace: bool = True, **kwargs):
        super().__init__("sc.pp.highly_variable_genes", min_disp=min_disp,
                         max_disp=max_disp, min_mean=min_mean, max_mean=max_mean,
                         n_bins=n_bins, subset=subset, inplace=inplace, **kwargs)


@register_preprocessor("filter", "gene")
@add_mod_and_transform
class FilterGenesPlaceHolder(BaseTransform):
    """No-op placeholder for pipeline search (parity: filter.py:1268)."""

    def __init__(self, split_name=None, channel=None, channel_type="X", add_n_counts=True,
                 add_n_cells=True, inplace=True, **kwargs):
        super().__init__(**kwargs)
        self.add_n_counts = add_n_counts
        self.add_n_cells = add_n_cells

    def __call__(self, data):
        x = data.get_feature(return_type="numpy", channel_type="X")
        if self.add_n_counts:
            data.data.var["n_counts"] = np.asarray(x.sum(0)).ravel()
        if self.add_n_cells:
            data.data.var["n_cells"] = np.asarray((x > 0).sum(0)).ravel()
        return data


@register_preprocessor("filter", "gene")
@add_mod_and_transform
class FilterGenesNumberPlaceHolder(BaseTransform):
    """No-op placeholder (parity: filter.py:1300)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)

    def __call__(self, data):
        return data


@register_preprocessor("filter", "cell")
@add_mod_and_transform
class FilterCellsPlaceHolder(BaseTransform):
    """No-op placeholder recording n_counts/n_genes (parity: filter.py:1371)."""

    def __init__(self, split_name=None, channel=None, channel_type="X", add_n_counts=True,
                 add_n_genes=True, inplace=True, **kwargs):
        super().__init__(**kwargs)
        self.split_name = split_name
        self.channel = channel
        self.channel_type = channel_type
        self.add_n_counts = add_n_counts
        self.add_n_genes = add_n_genes

    def __call__(self, data):
        x = data.get_feature(return_type="numpy", split_name=self.split_name,
                             channel=self.channel, channel_type=self.channel_type)
        if self.add_n_counts:
            data.data.obs["n_counts"] = np.asarray(x.sum(1)).ravel()
        if self.add_n_genes:
            data.data.obs["n_genes"] = np.asarray((x > 0).sum(1)).ravel()
        return data


@register_preprocessor("filter", "cell")
@add_mod_and_transform
class FilterCellsType(BaseTransform):
    """Drop cells of under-represented cell types (parity: filter.py:1477).

    Expects ``obsm['cell_type']`` as a one-hot DataFrame."""

    _DISPLAY_ATTRS = ("cell_type_threshold",)

    def __init__(self, cell_type_threshold: int = 10, **kwargs):
        super().__init__(**kwargs)
        self.cell_type_threshold = cell_type_threshold

    def __call__(self, data):
        onehot = data.data.obsm["cell_type"]
        if not isinstance(onehot, pd.DataFrame):
            raise TypeError(f"obsm['cell_type'] must be a DataFrame, got {type(onehot)}")
        counts = onehot.sum(axis=0)
        remove_types = counts[counts <= self.cell_type_threshold].index
        self.logger.info("Found %d cell types below threshold", len(remove_types))
        if len(remove_types):
            keep = ~(onehot[remove_types].sum(axis=1) > 0)
        else:
            keep = pd.Series(True, index=data.data.obs_names)
        data.filter_by_mask(keep.to_numpy())
        return data


@register_preprocessor("filter", "cell")
@add_mod_and_transform
class FilterCellTransform(BaseTransform):
    """QC outlier filtering via MAD on counts/genes/mito (parity: filter.py:1517)."""

    _DISPLAY_ATTRS = ("species",)

    def __init__(self, species: Literal["human", "mouse"] = "human",
                 image_save_path: Optional[str] = None, **kwargs):
        super().__init__(**kwargs)
        self.species = species
        self.image_save_path = image_save_path

    @staticmethod
    def is_outlier(values, nmads: int):
        values = np.asarray(values, dtype=np.float64)
        med = np.median(values)
        mad = median_abs_deviation(values)
        return (values < med - nmads * mad) | (values > med + nmads * mad)

    def __call__(self, data):
        adata = data.data
        X = adata.X.toarray() if sp.issparse(adata.X) else np.asarray(adata.X)
        names = adata.var_names.astype(str)
        mt = np.asarray(names.str.startswith("MT-" if self.species == "human" else "Mt-"))
        total = X.sum(1)
        n_genes = (X > 0).sum(1)
        pct_mt = X[:, mt].sum(1) / np.maximum(total, 1e-12) * 100 if mt.any() else np.zeros(
            len(total))
        top20 = np.sort(X, axis=1)[:, -20:].sum(1) / np.maximum(total, 1e-12) * 100
        adata.obs["total_counts"] = total
        adata.obs["n_genes_by_counts"] = n_genes
        adata.obs["pct_counts_mt"] = pct_mt
        outlier = (self.is_outlier(np.log1p(total), 5)
                   | self.is_outlier(np.log1p(n_genes), 5) | self.is_outlier(top20, 5))
        mt_outlier = self.is_outlier(pct_mt, 3) | (pct_mt > 8)
        mask = ~outlier & ~mt_outlier
        self.logger.info("Keeping %d / %d cells after QC", int(mask.sum()), len(mask))
        data.filter_by_mask(mask)
        return data


@register_preprocessor("filter", "cell")
@add_mod_and_transform
class ScrubletTransform(BaseTransform):
    """Doublet removal via simulated-doublet kNN scoring (parity: filter.py:1562)."""

    def __init__(self, image_save_path: Optional[str] = None, **kwargs):
        super().__init__(**kwargs)
        self.image_save_path = image_save_path

    def __call__(self, data):
        from dance_tpu.sc.pp import scrublet
        adata = data.data
        scrublet(adata)
        mask = ~adata.obs["predicted_doublet"].to_numpy()
        self.logger.info("Removing %d predicted doublets", int((~mask).sum()))
        data.filter_by_mask(mask)
        return data


def get_count(count_or_ratio, total: int):
    """Resolve a count-or-ratio spec to an integer count (parity: filter.py:28)."""
    if count_or_ratio is None:
        return None
    if isinstance(count_or_ratio, bool):
        raise TypeError("count_or_ratio must be either float or int, got bool")
    if isinstance(count_or_ratio, float):
        if count_or_ratio > 1.0:
            raise ValueError(f"{count_or_ratio=} is greater than 1. "
                             "Ratio cannot be greater than 1.")
        return int(count_or_ratio * total)
    if isinstance(count_or_ratio, int):
        if count_or_ratio > total:
            raise ValueError(f"{count_or_ratio=} is greater than {total=}")
        return count_or_ratio
    raise TypeError("count_or_ratio must be either float or int, "
                    f"got {type(count_or_ratio)}")


def get_marker_genes_giotto(group1, group2, group_detection_1,
                            group_detection_2, min_expr_gini_score=0.2,
                            min_det_gini_score=0.2, rank_score=1, min_genes=5,
                            genes=None):
    """Giotto-style marker scoring of one group pair (parity: filter.py:971);
    delegates to the vectorized scorer the FilterGenesMarkerGini transform
    uses. Returns the selected-marker DataFrame."""
    n = np.asarray(group1).shape[0]
    if genes is None:
        genes = np.arange(n)
    return FilterGenesMarkerGini._score_pair(
        np.asarray(group1), np.asarray(group2), np.asarray(group_detection_1),
        np.asarray(group_detection_2), np.asarray(genes),
        min_expr_gini=min_expr_gini_score, min_det_gini=min_det_gini_score,
        rank_score=rank_score, min_genes=min_genes)
