"""Spatial benchmark datasets (parity: dance/datasets/spatial.py)."""

import os.path as osp

import numpy as np
import pandas as pd

from dance_tpu.data import AnnData, Data, read_h5ad
from dance_tpu.datasets.base import BaseDataset
from dance_tpu.datasets.catalogs import spatial_deconvo_url_dict, spatial_libd_url_dict
from dance_tpu.registry import register_dataset
from dance_tpu.typing import Dict, Optional
from dance_tpu.utils.download import download_unzip


@register_dataset("spatial")
class SpatialLIBDDataset(BaseDataset):
    """DLPFC Visium slides (parity: spatial.py:22-157).

    Loads ``{data_id}.h5ad`` (expression + obsm spatial/spatial_pixel + uns
    image + obs label) pre-staged under ``data_dir``.
    """

    _DISPLAY_ATTRS = ("data_id",)
    # benchmark ids from dance_tpu/metadata/spatial_libd.csv
    AVAILABLE_DATA = sorted(spatial_libd_url_dict())

    def __init__(self, data_id: str = "151673", data_dir: str = "data/spatial",
                 url_dict: Optional[Dict[str, str]] = None):
        super().__init__(data_dir, full_download=False)
        self.data_id = str(data_id)
        self.data_dir = data_dir
        self.url_dict = url_dict if url_dict is not None else spatial_libd_url_dict()

    @property
    def data_path(self) -> str:
        return osp.join(self.data_dir, f"{self.data_id}.h5ad")

    def is_complete(self) -> bool:
        return osp.exists(self.data_path)

    def download(self):
        if self.data_id in self.url_dict:
            download_unzip(self.url_dict[self.data_id], self.data_dir)
        else:
            raise FileNotFoundError(f"Missing {self.data_path}; pre-stage the slide "
                                    "h5ad or pass url_dict")

    def _load_raw_data(self):
        return read_h5ad(self.data_path)

    def _raw_to_dance(self, adata):
        return Data(adata, train_size="all")


@register_dataset("spatial")
class CellTypeDeconvoDataset(BaseDataset):
    """Deconvolution ref+mix bundles (parity: spatial.py:160-277).

    Expects ``{dataset}/ref.h5ad`` (reference cells with obs cellType) and
    ``{dataset}/mix.h5ad`` (mixtures with obsm cell_type_portion + spatial).
    """

    _DISPLAY_ATTRS = ("dataset",)
    # benchmark names from dance_tpu/metadata/spatial_deconvo.csv
    AVAILABLE_DATA = sorted(spatial_deconvo_url_dict())

    def __init__(self, dataset: str = "CARD_synthetic", data_dir: str = "data/spatial",
                 url_dict: Optional[Dict[str, str]] = None):
        super().__init__(data_dir, full_download=False)
        self.dataset = dataset
        self.data_dir = data_dir
        self.url_dict = (url_dict if url_dict is not None
                         else spatial_deconvo_url_dict())

    def _paths(self):
        base = osp.join(self.data_dir, self.dataset)
        return osp.join(base, "ref.h5ad"), osp.join(base, "mix.h5ad")

    def is_complete(self) -> bool:
        return all(osp.exists(p) for p in self._paths())

    def download(self):
        if self.dataset in self.url_dict:
            download_unzip(self.url_dict[self.dataset],
                           osp.join(self.data_dir, self.dataset))
        else:
            raise FileNotFoundError(f"Missing {self._paths()}; pre-stage or pass "
                                    "url_dict")

    def _load_raw_data(self):
        ref_path, mix_path = self._paths()
        return read_h5ad(ref_path), read_h5ad(mix_path)

    def _raw_to_dance(self, raw_data):
        ref, mix = raw_data
        data = Data(ref, full_split_name="ref")
        data.append(Data(mix), mode="new_split", new_split_name="test", join="outer")
        return data
