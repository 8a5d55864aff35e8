"""Multimodality benchmark datasets (parity: dance/datasets/multimodality.py).

NeurIPS-2021 OpenProblems CITE/Multiome subtasks distributed as paired h5ad
bundles; loads pre-staged files (no-egress environment) or downloads via
``url_dict``.
"""

import os.path as osp

import numpy as np

from dance_tpu.data import Data, MuData, read_h5ad
from dance_tpu.datasets.base import BaseDataset
from dance_tpu.datasets.catalogs import multimodality_url_dict
from dance_tpu.registry import register_dataset
from dance_tpu.settings import logger
from dance_tpu.typing import Dict, List, Optional
from dance_tpu.utils.download import download_unzip

# short-name aliases per task (reference SUBTASK_NAME_MAP,
# multimodality.py:274/:379/:560)
SUBTASK_ALIASES = {
    "gex2atac": "openproblems_bmmc_multiome_phase2_rna",
    "gex2adt": "openproblems_bmmc_cite_phase2_rna",
    "atac2gex": "openproblems_bmmc_multiome_phase2_mod2",
    "adt2gex": "openproblems_bmmc_cite_phase2_mod2",
    "gex2adt_subset": "openproblems_bmmc_cite_phase2_rna_subset",
}
JE_SUBTASK_ALIASES = {
    "adt": "openproblems_bmmc_cite_phase2",
    "atac": "openproblems_bmmc_multiome_phase2",
}


class MultiModalityDataset(BaseDataset):
    """Base loader for paired-modality h5ad bundles (parity: multimodality.py:55)."""

    TASK = "predict_modality"
    SUBTASK_NAME_MAP = SUBTASK_ALIASES
    AVAILABLE_DATA = sorted(list(multimodality_url_dict("prediction"))
                            + list(SUBTASK_ALIASES))

    def __init__(self, subtask: str, root: str = "./data",
                 url_dict: Optional[Dict[str, str]] = None):
        super().__init__(root, full_download=False)
        self.subtask = self.SUBTASK_NAME_MAP.get(subtask, subtask)
        self.root = root
        self.url_dict = (url_dict if url_dict is not None
                         else self._default_url_dict())

    @classmethod
    def _default_url_dict(cls) -> Dict[str, str]:
        task = {"predict_modality": "prediction", "match_modality": "matching",
                "joint_embedding": "joint_embedding"}[cls.TASK]
        return multimodality_url_dict(task)

    def _mod_paths(self) -> List[str]:
        base = osp.join(str(self.root), self.subtask)
        names = ["train_mod1", "train_mod2", "test_mod1", "test_mod2"]
        return [osp.join(base, f"{self.subtask}.censor_dataset.output_{n}.h5ad")
                for n in names]

    def is_complete(self) -> bool:
        return all(osp.exists(p) for p in self._mod_paths())

    def download(self):
        if self.subtask in self.url_dict:
            download_unzip(self.url_dict[self.subtask],
                           osp.join(str(self.root), self.subtask))
        else:
            raise FileNotFoundError(
                f"Missing files for {self.subtask}: {self._mod_paths()}. "
                "Pre-stage the OpenProblems bundles or pass url_dict.")

    def _load_raw_data(self):
        return [read_h5ad(p) for p in self._mod_paths()]

    def _raw_to_dance(self, raw_data):
        from dance_tpu.data import concat
        train_mod1, train_mod2, test_mod1, test_mod2 = raw_data
        mod1 = concat([train_mod1, test_mod1])
        mod2 = concat([train_mod2, test_mod2])
        md = MuData({"mod1": mod1, "mod2": mod2})
        data = Data(md, train_size=train_mod1.n_obs)
        return data


@register_dataset("multimodality")
class ModalityPredictionDataset(MultiModalityDataset):
    """Modality prediction subtasks (parity: multimodality.py:224)."""

    TASK = "predict_modality"
    AVAILABLE_DATA = sorted(list(multimodality_url_dict("prediction"))
                            + list(SUBTASK_ALIASES))


@register_dataset("multimodality")
class ModalityMatchingDataset(MultiModalityDataset):
    """Modality matching subtasks (parity: multimodality.py:331).

    Matching bundles ship shuffled test pairings plus a solution permutation
    (`test_sol`); when present, it is attached under ``uns['test_sol']``."""

    TASK = "match_modality"
    AVAILABLE_DATA = sorted(list(multimodality_url_dict("matching"))
                            + list(SUBTASK_ALIASES))

    def _raw_to_dance(self, raw_data):
        data = super()._raw_to_dance(raw_data)
        sol_path = osp.join(str(self.root), self.subtask,
                            f"{self.subtask}.censor_dataset.output_test_sol.h5ad")
        if osp.exists(sol_path):
            data.data.uns["test_sol"] = read_h5ad(sol_path)
        return data


@register_dataset("multimodality")
class JointEmbeddingNIPSDataset(MultiModalityDataset):
    """Joint embedding subtasks (parity: multimodality.py:542)."""

    TASK = "joint_embedding"
    SUBTASK_NAME_MAP = JE_SUBTASK_ALIASES
    AVAILABLE_DATA = sorted(list(multimodality_url_dict("joint_embedding"))
                            + list(JE_SUBTASK_ALIASES))

    def _mod_paths(self) -> List[str]:
        base = osp.join(str(self.root), self.subtask)
        names = ["mod1", "mod2"]
        return [osp.join(base, f"{self.subtask}.censor_dataset.output_{n}.h5ad")
                for n in names]

    def _raw_to_dance(self, raw_data):
        mod1, mod2 = raw_data
        md = MuData({"mod1": mod1, "mod2": mod2})
        return Data(md, train_size="all")
