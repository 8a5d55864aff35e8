"""Structural transforms (parity: dance/transforms/misc.py)."""

import copy
from pprint import pformat

from dance_tpu.registry import register_preprocessor
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.typing import Any, Dict, Tuple
from dance_tpu.utils import hexdigest


@register_preprocessor("misc")
class Compose(BaseTransform):
    """Sequential composition of transforms; combined hexdigest keys the cache."""

    def __init__(self, *transforms: Tuple[BaseTransform, ...],
                 use_master_log_level: bool = True, **kwargs):
        super().__init__(**kwargs)
        bad = [t for t in transforms if not isinstance(t, BaseTransform)]
        if bad:
            bad_str = "\n".join(f"\t{t!r}: {type(t)!r}" for t in bad)
            raise TypeError(f"All transforms must inherit BaseTransform; offending "
                            f"(n={len(bad)}):\n{bad_str}")
        self.transforms = transforms
        if use_master_log_level:
            for t in transforms:
                t.log_level = self.log_level
                t.logger.setLevel(self.log_level)

    def __repr__(self):
        inner = ",\n  ".join(map(repr, self.transforms))
        return f"Compose(\n  {inner},\n)"

    def __getitem__(self, idx: int, /):
        return self.transforms[idx]

    def hexdigest(self) -> str:
        return hexdigest("".join(t.hexdigest() for t in self.transforms))

    def __call__(self, data):
        from dance_tpu.utils.profile import StageTimer
        self.logger.info("Applying composed transformations:\n%r", self)
        timer = StageTimer()
        for t in self.transforms:
            with timer.stage(t.name):
                t(data)
        self.timings = timer.summary()  # per-transform wall clock (SURVEY.md §5)
        self.logger.info("Per-transform timings:\n%s", timer.report())

    def transform_with_history(self, data) -> Dict[str, Any]:
        history = {"original": copy.deepcopy(data)}
        for t in self.transforms:
            t(data)
            history[t.name] = copy.deepcopy(data)
        return history


@register_preprocessor("misc")
class SetConfig(BaseTransform):
    """Declare which channels become x and y (parity: misc.py:102)."""

    _DISPLAY_ATTRS = ("config_dict",)

    def __init__(self, config_dict: Dict[str, Any], dummy_params=10, **kwargs):
        super().__init__(**kwargs)
        self.config_dict = config_dict

    def __call__(self, data):
        self.logger.info("Updating data config:\n%s", pformat(self.config_dict))
        data.set_config_from_dict(self.config_dict)


@register_preprocessor("misc")
class SaveRaw(BaseTransform):
    """Snapshot current (X, var) into ``.raw`` (parity: misc.py:126)."""

    def __init__(self, exist_ok: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.exist_ok = exist_ok

    def __call__(self, data):
        if data.data.raw is not None and not self.exist_ok:
            raise AttributeError("Raw data already exists (pass exist_ok=True to overwrite)")
        data.data.raw_to()
        return data


@register_preprocessor("misc")
class UpdateRaw(BaseTransform):
    """Replace X with the saved raw snapshot (parity: misc.py:155)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)

    def __call__(self, data):
        raw = data.data.raw
        if raw is None:
            raise AttributeError("No raw data to restore")
        adata = data.data
        # align raw genes to current var (raw may have more genes)
        if raw.n_vars != adata.n_vars:
            raw_adata = raw.to_adata()
            sub = raw_adata[:, adata.var_names.to_numpy()]
            adata._X = sub.X
        else:
            adata._X = raw.X.copy()
        return data


@register_preprocessor("misc")
class RemoveSplit(BaseTransform):
    """Drop a split and its cells from the data (parity: misc.py:178)."""

    _DISPLAY_ATTRS = ("split_name",)

    def __init__(self, split_name: str, **kwargs):
        super().__init__(**kwargs)
        self.split_name = split_name

    def __call__(self, data):
        data.pop(split_name=self.split_name)
        return data


@register_preprocessor("misc")
class AlignMod(BaseTransform):
    """Align modalities of a MuData to common obs ordering (parity: misc.py:193)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)

    def __call__(self, data):
        md = data.data
        if not hasattr(md, "mod"):
            return data
        common = None
        for m in md.mod.values():
            names = m.obs_names
            common = names if common is None else common.intersection(names)
        for k, m in md.mod.items():
            if not m.obs_names.equals(common):
                md.mod[k] = m[common.to_numpy()]
        md.obs = md.obs.loc[md.obs.index.intersection(common)]
        return data
