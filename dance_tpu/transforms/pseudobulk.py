"""Pseudo-bulk / cell-type profile transforms (parity: dance/transforms/pseudobulk.py)."""

from functools import partial

import numpy as np
import pandas as pd

from dance_tpu.registry import register_preprocessor
from dance_tpu.settings import logger as native_logger
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.typing import Callable, Dict, List, Literal, Optional, Tuple, Union
from dance_tpu.utils.status import experimental


def get_cell_types(ct_select, annot) -> List[str]:
    all_cts = sorted(map(str, np.unique(annot)))
    if isinstance(ct_select, str) and ct_select == "auto":
        return all_cts
    if missed := sorted(set(ct_select) - set(all_cts)):
        raise ValueError(f"Unknown cell types selected: {missed}; available: {all_cts}")
    return list(ct_select)


def get_agg_func(name: str, *, default: Optional[str] = None) -> Callable:
    if name == "default":
        if default is None:
            raise ValueError("Aggregation 'default' requested but no default provided")
        name = default
    if name == "median":
        return partial(np.median, axis=0)
    if name == "mean":
        return partial(np.mean, axis=0)
    raise ValueError(f"Unknown aggregation {name!r}; options: median, mean")


def get_ct_profile(x, annot, *, batch_index=None, ct_select="auto", method="mean",
                   logger=None) -> np.ndarray:
    """Per-cell-type expression profile with per-batch library normalization
    (parity: pseudobulk.py:168)."""
    logger = logger or native_logger
    ct_select = get_cell_types(ct_select, annot)
    agg = get_agg_func(method, default="mean")
    if batch_index is None:
        batch_index = np.zeros(x.shape[0], dtype=int)
    profile = np.zeros((x.shape[1], len(ct_select)), dtype=np.float32)
    annot = np.asarray(annot).astype(str)
    for i, ct in enumerate(ct_select):
        ct_idx = np.nonzero(annot == ct)[0]
        sub_batches = np.unique(batch_index[ct_idx])
        per_batch = np.zeros((len(sub_batches), x.shape[1]), dtype=np.float32)
        lib_sizes = np.zeros(len(sub_batches), dtype=np.float32)
        for j, b in enumerate(sub_batches):
            idx = ct_idx[batch_index[ct_idx] == b]
            per_batch[j] = agg(x[idx])
            lib_sizes[j] = per_batch[j].sum()
            per_batch[j] /= max(lib_sizes[j], 1e-12)
        profile[:, i] = agg(per_batch) * agg(lib_sizes)
    return profile


@register_preprocessor("pseudobulk")
class PseudoMixture(BaseTransform):
    """Synthetic spot generation for deconvolution (parity: pseudobulk.py:16).

    Draws ``n_pseudo`` mixtures of nc_min..nc_max reference cells, appends them
    as a new split with per-mixture cell-type portions in obsm."""

    _DISPLAY_ATTRS = ("n_pseudo", "nc_min", "nc_max", "ct_select")

    def __init__(self, *, n_pseudo: int = 1000, nc_min: int = 2, nc_max: int = 10,
                 ct_select: Union[Literal["auto"], List[str]] = "auto",
                 ct_key: str = "cellType", channel: Optional[str] = None,
                 channel_type: Optional[str] = "X", random_state: Optional[int] = 0,
                 prefix: str = "ps_mix_", in_split_name: str = "ref",
                 out_split_name: Optional[str] = "pseudo", label_batch: bool = False,
                 **kwargs):
        super().__init__(**kwargs)
        self.n_pseudo = n_pseudo
        self.nc_min = nc_min
        self.nc_max = nc_max
        self.ct_select = ct_select
        self.ct_key = ct_key
        self.channel = channel
        self.channel_type = channel_type
        self.random_state = random_state
        self.prefix = prefix
        self.in_split_name = in_split_name
        self.out_split_name = out_split_name
        self.label_batch = label_batch

    @staticmethod
    def gen_mix(x, annot, nc_min: int = 2, nc_max: int = 10,
                rng: Optional[np.random.Generator] = None
                ) -> Tuple[np.ndarray, Dict[str, int], Dict[str, float]]:
        rng = rng or np.random.default_rng()
        n_mix = int(rng.integers(nc_min, nc_max + 1))
        sample = rng.choice(x.shape[0], size=n_mix, replace=False)
        mix_counts = x[sample].sum(0)
        ct_counts = dict(zip(*np.unique(annot[sample], return_counts=True)))
        info = {"cell_count": n_mix, "total_umi_count": float(mix_counts.sum())}
        return mix_counts, ct_counts, info

    def __call__(self, data):
        from dance_tpu.data import AnnData, Data
        x = data.get_feature(split_name=self.in_split_name, channel=self.channel,
                             channel_type=self.channel_type, return_type="numpy")
        annot = np.asarray(data.get_feature(split_name=self.in_split_name,
                                            channel=self.ct_key, channel_type="obs",
                                            return_type="numpy")).astype(str)
        rng = np.random.default_rng(self.random_state)
        mix_x = np.zeros((self.n_pseudo, x.shape[1]), dtype=np.float32)
        ct_list, info_list = [], []
        for i in range(self.n_pseudo):
            mix_x[i], ct_counts, info = self.gen_mix(x, annot, self.nc_min, self.nc_max,
                                                     rng)
            ct_list.append(ct_counts)
            info_list.append(info)
        ct_select = get_cell_types(self.ct_select, annot)
        index = [f"{self.prefix}{i}" for i in range(self.n_pseudo)]
        ct_counts_df = pd.DataFrame(ct_list, columns=ct_select, index=index).fillna(0)
        ct_portion = ct_counts_df.div(ct_counts_df.sum(axis=1), axis=0)
        obs = pd.DataFrame(info_list, index=index)
        pseudo = Data(AnnData(mix_x, obs=obs, var=data.data.var.copy(),
                              obsm={"cell_type_portion": ct_portion}))
        data.append(pseudo, join="outer", mode="new_split",
                    new_split_name=self.out_split_name, label_batch=self.label_batch)
        return data


@register_preprocessor("pseudobulk")
class CellTopicProfile(BaseTransform):
    """Aggregate expression profile per cell type into varm (parity: pseudobulk.py:103)."""

    _DISPLAY_ATTRS = ("ct_select", "ct_key", "split_name", "method")

    def __init__(self, *, ct_select: Union[Literal["auto"], List[str]] = "auto",
                 ct_key: str = "cellType", batch_key: Optional[str] = None,
                 split_name: Optional[str] = None, channel: Optional[str] = None,
                 channel_type: str = "X", method: Literal["median", "mean"] = "median",
                 **kwargs):
        super().__init__(**kwargs)
        self.ct_select = ct_select
        self.ct_key = ct_key
        self.batch_key = batch_key
        self.split_name = split_name
        self.channel = channel
        self.channel_type = channel_type
        self.method = method

    def __call__(self, data):
        x = data.get_feature(split_name=self.split_name, channel=self.channel,
                             channel_type=self.channel_type, return_type="numpy")
        annot = data.get_feature(split_name=self.split_name, channel=self.ct_key,
                                 channel_type="obs", return_type="numpy")
        batch = (data.get_feature(split_name=self.split_name, channel=self.batch_key,
                                  channel_type="obs", return_type="numpy")
                 if self.batch_key else None)
        ct_select = get_cell_types(self.ct_select, annot)
        profile = get_ct_profile(np.asarray(x), annot, batch_index=batch,
                                 ct_select=ct_select, method=self.method,
                                 logger=self.logger)
        data.data.varm[self.out] = pd.DataFrame(profile, index=data.data.var_names,
                                                columns=ct_select)
        return data


def get_giotto_dt(x, annot, detection_threshold: float = -1, *, ct_select="auto",
                  logger=None):
    """Per-cell-type detection fraction profile (Giotto; parity: pseudobulk.py:300)."""
    ct_select = get_cell_types(ct_select, annot)
    annot = np.asarray(annot).astype(str)
    profile = np.zeros((x.shape[1], len(ct_select)), dtype=np.float32)
    for i, ct in enumerate(ct_select):
        idx = np.nonzero(annot == ct)[0]
        profile[:, i] = (x[idx] > detection_threshold).mean(0)
    return profile


@register_preprocessor("pseudobulk")
class CellGiottoTopicProfile(BaseTransform):
    """Giotto mean + detection profiles per cell type (parity: pseudobulk.py:211)."""

    _DISPLAY_ATTRS = ("ct_select", "ct_key", "split_name")

    def __init__(self, *, ct_select: Union[Literal["auto"], List[str]] = "auto",
                 ct_key: str = "cellType", split_name: Optional[str] = None,
                 channel: Optional[str] = None, channel_type: str = "X",
                 detection_threshold: float = -1, **kwargs):
        super().__init__(**kwargs)
        self.ct_select = ct_select
        self.ct_key = ct_key
        self.split_name = split_name
        self.channel = channel
        self.channel_type = channel_type
        self.detection_threshold = detection_threshold

    def __call__(self, data):
        x = np.asarray(data.get_feature(split_name=self.split_name, channel=self.channel,
                                        channel_type=self.channel_type,
                                        return_type="numpy"))
        annot = data.get_feature(split_name=self.split_name, channel=self.ct_key,
                                 channel_type="obs", return_type="numpy")
        ct_select = get_cell_types(self.ct_select, annot)
        mean_profile = get_ct_profile(x, annot, ct_select=ct_select, method="mean",
                                      logger=self.logger)
        det_profile = get_giotto_dt(x, annot, self.detection_threshold,
                                    ct_select=ct_select, logger=self.logger)
        data.data.varm["CellGiottoTopicProfile"] = pd.DataFrame(
            mean_profile, index=data.data.var_names, columns=ct_select)
        data.data.varm["CellGiottoDetectionTopicProfile"] = pd.DataFrame(
            det_profile, index=data.data.var_names, columns=ct_select)
        return data


@experimental(msg="may move under transforms.stats")
class CellTypeNums(BaseTransform):
    """Cell counts per cell type into uns (parity: pseudobulk.py:265; unregistered)."""

    _DISPLAY_ATTRS = ("ct_select", "ct_key", "split_name")

    def __init__(self, *, ct_select: Union[Literal["auto"], List[str]] = "auto",
                 ct_key: str = "cellType", split_name: Optional[str] = None, **kwargs):
        super().__init__(**kwargs)
        self.ct_select = ct_select
        self.ct_key = ct_key
        self.split_name = split_name

    def __call__(self, data):
        annot = data.get_feature(split_name=self.split_name, channel=self.ct_key,
                                 channel_type="obs", return_type="numpy")
        ct_select = get_cell_types(self.ct_select, annot)
        annot = np.asarray(annot).astype(str)
        df = pd.DataFrame({"nums": [int((annot == ct).sum()) for ct in ct_select]},
                          index=ct_select)
        data.data.uns[self.out] = df
        return data
