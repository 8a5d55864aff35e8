"""Gene summary statistics (parity: dance/transforms/stats.py)."""

import numpy as np
import pandas as pd

from dance_tpu.registry import (REGISTERED_GENESTATS_FUNCS, register_genestats_func,
                                register_preprocessor)
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.typing import List, Optional, Union
from dance_tpu.utils.wrappers import as_1d_array


@register_preprocessor("feature", "gene")
class GeneStats(BaseTransform):
    """Compute selected registered gene stats into varm (parity: stats.py:11)."""

    _DISPLAY_ATTRS = ("genestats_select", "threshold", "pseudo", "split_name")

    def __init__(self, genestats_select: Union[str, List[str]] = "all", *,
                 fill_na: Optional[float] = None, threshold: float = 0,
                 pseudo: bool = False, split_name: Optional[str] = "train",
                 channel: Optional[str] = None, channel_type: Optional[str] = None,
                 **kwargs):
        super().__init__(**kwargs)
        if isinstance(genestats_select, str) and genestats_select == "all":
            self.genestats_select = list(REGISTERED_GENESTATS_FUNCS)
        else:
            invalid = [i for i in genestats_select if i not in REGISTERED_GENESTATS_FUNCS]
            if invalid:
                raise ValueError(f"Unknown genestats selections: {invalid}; available: "
                                 f"{list(REGISTERED_GENESTATS_FUNCS)}")
            self.genestats_select = list(genestats_select)
        if channel is not None and channel_type != "layers":
            raise ValueError("Only `layers` channels available besides default X; "
                             "set channel_type='layers'")
        self.func_kwargs = {"threshold": threshold, "pseudo": pseudo}
        self.fill_na = fill_na
        self.split_name = split_name
        self.channel = channel
        self.channel_type = channel_type
        self.threshold = threshold
        self.pseudo = pseudo

    def __call__(self, data):
        exp = data.get_feature(return_type="numpy", split_name=self.split_name,
                               channel=self.channel, channel_type=self.channel_type or "X")
        stats = {name: REGISTERED_GENESTATS_FUNCS[name](exp, **self.func_kwargs)
                 for name in self.genestats_select}
        df = pd.DataFrame(stats, index=data.data.var_names)
        if self.fill_na is not None:
            df = df.fillna(self.fill_na)
        data.data.varm[self.out] = df
        return data


@register_genestats_func(name="mu")
@as_1d_array
def genestats_mu(exp, threshold: float = 0, **kwargs):
    """Mean expression over expressing cells only."""
    exp = np.asarray(exp)
    mask = (exp > threshold).astype(float)
    with np.errstate(divide="ignore", invalid="ignore"):
        return (exp * mask).sum(0) / mask.sum(0)


@register_genestats_func(name="alpha")
@as_1d_array
def genestats_alpha(exp, threshold: float = 0, pseudo: bool = False, **kwargs):
    """Fraction of cells expressing the gene above threshold."""
    exp = np.asarray(exp)
    count = (exp > threshold).sum(0).astype(float)
    total = exp.shape[0]
    if pseudo:
        count, total = count + 1, total + 1
    return count / total


@register_genestats_func(name="mean_all")
@as_1d_array
def genestats_mean_all(exp, **kwargs):
    return np.asarray(exp).mean(0)


@register_genestats_func(name="cov_all")
@as_1d_array
def genestats_cov_all(exp, **kwargs):
    exp = np.asarray(exp)
    with np.errstate(divide="ignore", invalid="ignore"):
        return exp.std(0) / exp.mean(0)


@register_genestats_func(name="fano_all")
@as_1d_array
def genestats_fano_all(exp, **kwargs):
    exp = np.asarray(exp)
    with np.errstate(divide="ignore", invalid="ignore"):
        return exp.var(0) / exp.mean(0)


@register_genestats_func(name="max_all")
@as_1d_array
def genestats_max_all(exp, **kwargs):
    return np.asarray(exp).max(0)


@register_genestats_func(name="std_all")
@as_1d_array
def genestats_std_all(exp, **kwargs):
    return np.asarray(exp).std(0)
