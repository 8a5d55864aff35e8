"""Entry-masking transforms for imputation (parity: dance/transforms/mask.py)."""

import numpy as np
import scipy.sparse as sp
from scipy.stats import expon

from dance_tpu.registry import register_preprocessor
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.typing import Literal, Optional


@register_preprocessor("split", "entry")
class CellwiseMaskData(BaseTransform):
    """Per-cell nonzero-entry masking with exp/uniform sampling (parity: mask.py:80).

    Cells with more than ``min_gene_counts`` positive entries have
    ``mask_rate`` of those entries masked out of the train mask; masked entries
    go to valid (and optionally ~90% to test when ``add_test_mask``).
    """

    _DISPLAY_ATTRS = ("distr", "mask_rate", "seed", "min_gene_counts", "add_test_mask")

    def __init__(self, distr: Optional[Literal["exp", "uniform"]] = "exp",
                 mask_rate: float = 0.1, seed: Optional[int] = None,
                 min_gene_counts: int = 5, add_test_mask: bool = False, **kwargs):
        super().__init__(**kwargs)
        if not 0.0 <= mask_rate <= 1.0:
            raise ValueError(f"mask_rate must be in [0, 1], got {mask_rate}")
        self.distr = distr
        self.mask_rate = mask_rate
        self.seed = seed
        self.min_gene_counts = min_gene_counts
        self.add_test_mask = add_test_mask

    def _get_probs(self, vec):
        if self.distr == "exp":
            prob = expon.pdf(vec, 0, 20)
        elif self.distr == "uniform":
            prob = np.ones(len(vec))
        else:
            raise ValueError(f"Unknown distribution {self.distr!r}; options: exp, uniform")
        s = prob.sum()
        return prob / s if s > 1e-9 else np.full(len(vec), 1.0 / max(len(vec), 1))

    def __call__(self, data):
        rng = np.random.default_rng(self.seed)
        feat = data.get_feature(return_type="sparse")
        feat = sp.csr_matrix(feat)
        n_cells, n_genes = feat.shape
        train_mask = np.ones((n_cells, n_genes), dtype=bool)
        valid_mask = np.zeros((n_cells, n_genes), dtype=bool)
        test_mask = np.zeros((n_cells, n_genes), dtype=bool)

        for c in range(n_cells):
            start, end = feat.indptr[c], feat.indptr[c + 1]
            ind_pos = feat.indices[start:end]
            vals = feat.data[start:end]
            if len(ind_pos) <= self.min_gene_counts:
                continue
            n_masked = int(np.floor(len(ind_pos) * self.mask_rate))
            if n_masked <= 0:
                continue
            if n_masked >= len(ind_pos):
                self.logger.warning("Too many genes masked for cell %d (%d/%d)", c,
                                    n_masked, len(ind_pos))
                n_masked = 1 + int(np.floor(0.5 * len(ind_pos)))
            probs = self._get_probs(vals)
            chosen = rng.choice(len(ind_pos), n_masked, p=probs, replace=False)
            cols = ind_pos[chosen]
            train_mask[c, cols] = False
            if self.add_test_mask:
                n_valid = max(int(round(0.1 * len(cols))), 1)
                v = rng.choice(len(cols), n_valid, replace=False)
                vm = np.zeros(len(cols), dtype=bool)
                vm[v] = True
                valid_mask[c, cols[vm]] = True
                test_mask[c, cols[~vm]] = True
            else:
                valid_mask[c, cols] = True

        data.data.layers["train_mask"] = train_mask
        data.data.layers["valid_mask"] = valid_mask
        data.data.layers["test_mask"] = test_mask
        return data


@register_preprocessor("split", "entry")
class MaskData(BaseTransform):
    """Global random nonzero-entry masking (parity: mask.py:294).

    Masks ``mask_rate`` of the nonzero entries out of the train mask (the
    documented behavior; the reference code inverts the fraction)."""

    _DISPLAY_ATTRS = ("mask_rate", "seed")

    def __init__(self, mask_rate: float = 0.1, seed: Optional[int] = None, **kwargs):
        super().__init__(**kwargs)
        self.mask_rate = mask_rate
        self.seed = seed

    def __call__(self, data):
        rng = np.random.default_rng(self.seed)
        feat = data.get_feature(return_type="numpy")
        train_mask = np.ones(feat.shape, dtype=bool)
        row, col = np.nonzero(np.asarray(feat))
        n_masked = int(np.floor(len(row) * self.mask_rate))
        idx = rng.choice(len(row), size=n_masked, replace=False)
        train_mask[row[idx], col[idx]] = False
        data.data.layers["train_mask"] = train_mask
        data.data.layers["valid_mask"] = ~train_mask
        return data
