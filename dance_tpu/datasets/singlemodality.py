"""Single-modality task datasets (parity: dance/datasets/singlemodality.py).

File formats match the reference benchmark distributions (scDeepSort CSV pairs,
clustering ``.h5`` with X/Y, imputation CSV/h5). Download URLs are supplied via
``url_dict`` arguments or a two-column metadata CSV (dance_tpu/metadata/) —
this environment has no egress, so files are typically pre-staged in
``data_dir``.
"""

import collections
import os.path as osp

import numpy as np
import pandas as pd

import h5py

from dance_tpu.data import AnnData, Data
from dance_tpu.datasets.base import BaseDataset
from dance_tpu.datasets.catalogs import (IMPUTATION_DATASET_TO_FILE, clustering_url_dict,
                                         imputation_url_dict, scdeepsort_catalog,
                                         scdeepsort_url_dict)
from dance_tpu.registry import register_dataset
from dance_tpu.settings import logger
from dance_tpu.typing import Dict, List, Optional, Set, Tuple
from dance_tpu.utils.download import download_file, download_unzip


def cell_label_to_df(cell_labels, idx_to_label: List[str], index=None) -> pd.DataFrame:
    """Multi-hot label DataFrame: a cell may map to a set of admissible types."""
    mat = np.zeros((len(cell_labels), len(idx_to_label)), dtype=np.float32)
    pos = {label: i for i, label in enumerate(idx_to_label)}
    for i, label in enumerate(cell_labels):
        labels = label if isinstance(label, (set, list, tuple)) else [label]
        for sub in labels or []:
            if sub in pos:
                mat[i, pos[sub]] = 1
    return pd.DataFrame(mat, index=index, columns=idx_to_label)


@register_dataset("singlemodality")
class CellTypeAnnotationDataset(BaseDataset):
    """scDeepSort benchmark annotation data (parity: singlemodality.py:43-396).

    Reads per-dataset CSV pairs ``{species}_{tissue}{id}_data.csv`` (genes ×
    cells) and ``..._celltype.csv`` under ``train/``//``test/`` dirs, aligns
    test genes onto the train gene set, and maps ambiguous test cell-type names
    through the tissue mapping table when present.
    """

    _DISPLAY_ATTRS = ("species", "tissue", "train_dataset", "test_dataset")
    # benchmark namespace from the scdeepsort catalog (Appendix B): one entry
    # per (split, species, tissue, dataset-id) row
    AVAILABLE_DATA = [
        {key: str(row[key]) for key in ("split", "species", "tissue", "dataset")}
        for _, row in scdeepsort_catalog().iterrows()
    ]

    def __init__(self, full_download: bool = False, train_dataset: Optional[List] = None,
                 test_dataset: Optional[List] = None, valid_dataset: Optional[List] = None,
                 species: str = "mouse", tissue: str = "Spleen",
                 train_dir: str = "train", test_dir: str = "test",
                 valid_dir: str = "valid", map_path: str = "map",
                 data_dir: str = "./", val_size: float = 0,
                 url_dict: Optional[Dict[str, str]] = None):
        super().__init__(data_dir, full_download)
        self.data_dir = data_dir
        self.train_dataset = [str(i) for i in (train_dataset or [])]
        self.test_dataset = [str(i) for i in (test_dataset or [])]
        self.valid_dataset = ([str(i) for i in valid_dataset]
                              if valid_dataset is not None else None)
        self.species = species
        self.tissue = tissue
        self.train_dir = train_dir
        self.test_dir = test_dir
        self.valid_dir = valid_dir
        self.map_path = map_path
        self.val_size = val_size
        self.url_dict = url_dict if url_dict is not None else scdeepsort_url_dict()

    def _paths(self, subdir: str, ids: List[str]) -> List[Tuple[str, str]]:
        base = osp.join(self.data_dir, subdir, self.species)
        return [(osp.join(base, f"{self.species}_{self.tissue}{i}_data.csv"),
                 osp.join(base, f"{self.species}_{self.tissue}{i}_celltype.csv"))
                for i in ids]

    def _all_paths(self) -> List[str]:
        out = []
        for subdir, ids in ((self.train_dir, self.train_dataset),
                            (self.test_dir, self.test_dataset),
                            (self.valid_dir, self.valid_dataset or [])):
            for feat, label in self._paths(subdir, ids):
                out.extend([feat, label])
        return out

    def is_complete(self) -> bool:
        return all(osp.exists(p) for p in self._all_paths())

    def download(self):
        for path in self._all_paths():
            if not osp.exists(path):
                name = osp.basename(path)
                # catalog fnames carry the split-dir prefix (train_/test_/valid_)
                split = osp.basename(osp.dirname(osp.dirname(path)))
                candidates = (name, f"{split}_{name}")
                url = next((self.url_dict[c] for c in candidates
                            if c in self.url_dict), None)
                if url is not None:
                    download_file(url, path)
                else:
                    raise FileNotFoundError(
                        f"Missing raw file {path} and no download URL provided. "
                        "Pre-stage the scDeepSort benchmark files under data_dir or "
                        "pass url_dict.")

    @staticmethod
    def _load_dfs(paths: List[str], *, transpose: bool = False) -> pd.DataFrame:
        dfs = []
        for path in paths:
            logger.info("Loading data from %s", path)
            df = pd.read_csv(path, index_col=0)
            df = df.T if transpose else df
            name = "_".join(osp.basename(path).split("_")[:-1])
            df.index = name + "_" + df.index.astype(str)
            dfs.append(df)
        return pd.concat(dfs)

    def get_map_dict(self, tissue: str) -> Dict[str, Set[str]]:
        path = osp.join(self.data_dir, self.map_path, self.species, "map.xlsx")
        if not osp.exists(path):
            return {}
        map_df = pd.read_excel(path)
        out = collections.defaultdict(set)
        for _, row in map_df.iterrows():
            if row["Tissue"] == tissue:
                out[row["Celltype"]].add(row["Training dataset cell type"])
        return dict(out)

    def _load_raw_data(self, ct_col: str = "Cell_type"):
        train_pairs = self._paths(self.train_dir, self.train_dataset)
        test_pairs = self._paths(self.test_dir, self.test_dataset)
        train_feat = self._load_dfs([p[0] for p in train_pairs], transpose=True)
        train_label = self._load_dfs([p[1] for p in train_pairs])
        test_feat = self._load_dfs([p[0] for p in test_pairs], transpose=True)
        test_label = self._load_dfs([p[1] for p in test_pairs])

        train_size = train_feat.shape[0]
        aligned_train, aligned_test = train_feat.align(test_feat, axis=1, join="left",
                                                       fill_value=0)
        feat_df = pd.concat([aligned_train, aligned_test]).fillna(0)
        adata = AnnData(feat_df.to_numpy().astype(np.float32),
                        obs=pd.DataFrame(index=feat_df.index),
                        var=pd.DataFrame(index=feat_df.columns))

        cell_types = set(train_label[ct_col].unique())
        idx_to_label = sorted(cell_types)
        mappings = self.get_map_dict(self.tissue)
        labels = train_label[ct_col].tolist()
        for i in test_label[ct_col]:
            labels.append(i if i in cell_types else mappings.get(i))
        return adata, labels, idx_to_label, train_size, 0

    def _raw_to_dance(self, raw_data):
        adata, cell_labels, idx_to_label, train_size, valid_size = raw_data
        adata.obsm["cell_type"] = cell_label_to_df(cell_labels, idx_to_label,
                                                   index=adata.obs.index)
        return Data(adata, train_size=train_size, val_size=valid_size)


@register_dataset("singlemodality")
class ClusteringDataset(BaseDataset):
    """Clustering benchmark ``.h5`` files with X / Y keys (parity: :398-441)."""

    _DISPLAY_ATTRS = ("dataset",)
    # benchmark names from dance_tpu/metadata/clustering.csv (reference parity:
    # AVAILABLE_DATA = sorted(URL_DICT), singlemodality.py:412)
    AVAILABLE_DATA = sorted(clustering_url_dict())

    def __init__(self, data_dir: str = "./data", dataset: str = "mouse_bladder_cell",
                 url_dict: Optional[Dict[str, str]] = None):
        super().__init__(data_dir, full_download=False)
        self.data_dir = data_dir
        self.dataset = dataset
        self.url_dict = url_dict if url_dict is not None else clustering_url_dict()

    @property
    def data_path(self) -> str:
        return osp.join(self.data_dir, f"{self.dataset}.h5")

    def download(self):
        if self.dataset in self.url_dict:
            download_file(self.url_dict[self.dataset], self.data_path)
        else:
            raise FileNotFoundError(f"Missing {self.data_path}; pre-stage the file or "
                                    "pass url_dict")

    def is_complete(self) -> bool:
        return osp.exists(self.data_path)

    def _load_raw_data(self):
        with h5py.File(self.data_path, "r") as f:
            x = np.array(f["X"])
            y = np.array(f["Y"])
        return AnnData(x.astype(np.float32)), y

    def _raw_to_dance(self, raw_data):
        adata, y = raw_data
        adata.obsm["Group"] = y
        return Data(adata, train_size="all")


@register_dataset("singlemodality")
class ImputationDataset(BaseDataset):
    """Imputation benchmark data (parity: singlemodality.py:444-580).

    Reads a counts matrix from ``{dataset}.csv(.gz)`` (genes × cells) or an
    ``.h5`` with a counts dataset, keeps the ``min_counts`` filter behavior,
    and splits train/test over cells.
    """

    _DISPLAY_ATTRS = ("dataset", "train_size")
    # benchmark names from dance_tpu/metadata/imputation.csv (reference parity:
    # AVAILABLE_DATA = sorted(URL), singlemodality.py:448)
    AVAILABLE_DATA = sorted(imputation_url_dict())

    def __init__(self, data_dir: str = "data", dataset: str = "human_stemcell",
                 train_size: float = 0.1, url_dict: Optional[Dict[str, str]] = None):
        super().__init__(data_dir, full_download=False)
        self.data_dir = data_dir
        self.dataset = dataset
        self.train_size = train_size
        self.url_dict = url_dict if url_dict is not None else imputation_url_dict()

    def _candidate_paths(self) -> List[str]:
        base = osp.join(self.data_dir, self.dataset)
        paths = [f"{base}.csv", f"{base}.csv.gz", f"{base}.h5"]
        # staged-file layout after unzip (catalogs.IMPUTATION_DATASET_TO_FILE)
        staged = IMPUTATION_DATASET_TO_FILE.get(self.dataset, [])
        for name in ([staged] if isinstance(staged, str) else staged):
            paths.append(osp.join(self.data_dir, self.dataset, name))
        return paths

    def is_complete(self) -> bool:
        return any(osp.exists(p) for p in self._candidate_paths())

    def download(self):
        if self.dataset in self.url_dict:
            download_unzip(self.url_dict[self.dataset],
                           osp.join(self.data_dir, self.dataset))
        else:
            raise FileNotFoundError(
                f"Missing raw data for {self.dataset}; pre-stage one of "
                f"{self._candidate_paths()} or pass url_dict")

    def _load_raw_data(self):
        for path in self._candidate_paths():
            if not osp.exists(path):
                continue
            if path.endswith(".h5"):
                with h5py.File(path, "r") as f:
                    key = "counts" if "counts" in f else list(f.keys())[0]
                    counts = np.array(f[key])
                return AnnData(counts.astype(np.float32))
            df = pd.read_csv(path, index_col=0)
            return AnnData(df.T.to_numpy().astype(np.float32),
                           obs=pd.DataFrame(index=df.columns),
                           var=pd.DataFrame(index=df.index))
        raise FileNotFoundError(self._candidate_paths())

    def _raw_to_dance(self, raw_data):
        adata = raw_data
        n = adata.n_obs
        n_train = int(n * self.train_size)
        rng = np.random.default_rng(0)
        perm = rng.permutation(n)
        data = Data(adata)
        data.set_split_idx("train", sorted(perm[:n_train].tolist()))
        data.set_split_idx("test", sorted(perm[n_train:].tolist()))
        return data
