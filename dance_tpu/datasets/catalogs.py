"""Benchmark dataset catalogs (name -> source url / staged-file mapping).

The CSV tables under ``dance_tpu/metadata/`` are DATA copied verbatim from the
reference distribution (dance/metadata/{scdeepsort,clustering,imputation}.csv
— Dropbox/GEO url tables, provenance: OmicsML/dance; loaded by the reference
at dance/datasets/singlemodality.py:29-52). They define the public
benchmark-dataset namespace (SURVEY.md Appendix B); datasets resolve their
default ``url_dict`` through these loaders. This environment has no egress,
so downloads only run when the urls are reachable — files are otherwise
pre-staged in ``data_dir``.
"""

import functools
import os.path as osp

import pandas as pd

from dance_tpu.typing import Dict, List, Union

METADIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "metadata")


@functools.lru_cache
def scdeepsort_catalog() -> pd.DataFrame:
    """207-row (species, tissue, dataset, split) table with per-file urls."""
    return pd.read_csv(osp.join(METADIR, "scdeepsort.csv"),
                       dtype={"dataset": str})


@functools.lru_cache
def scdeepsort_url_dict() -> Dict[str, str]:
    """Map staged file name (with split prefix) -> download url."""
    out: Dict[str, str] = {}
    for _, row in scdeepsort_catalog().iterrows():
        for fname_key, url_key in (("celltype_fname", "celltype_url"),
                                   ("data_fname", "data_url")):
            fname, url = row[fname_key], row[url_key]
            if isinstance(fname, str) and isinstance(url, str):
                out[fname] = url  # some rows ship data files only
    return out


def _two_column_url_dict(fname: str) -> Dict[str, str]:
    df = pd.read_csv(osp.join(METADIR, fname), header=None,
                     names=["name", "url"])
    return dict(zip(df["name"], df["url"]))


@functools.lru_cache
def clustering_url_dict() -> Dict[str, str]:
    return _two_column_url_dict("clustering.csv")


@functools.lru_cache
def imputation_url_dict() -> Dict[str, str]:
    return _two_column_url_dict("imputation.csv")


# Staged-file layout per imputation dataset after unzip (data table, parity:
# dance/metadata/imputation.py:3-55; multi-file entries list the members the
# loader concatenates).
IMPUTATION_DATASET_TO_FILE: Dict[str, Union[str, List[str]]] = {
    "pbmc_data": "5k_pbmc_protein_v3_filtered_feature_bc_matrix.h5",
    "mouse_embryo_data": [
        osp.join("GSE65525", name) for name in (
            "GSM1599494_ES_d0_main.csv",
            "GSM1599497_ES_d2_LIFminus.csv",
            "GSM1599498_ES_d4_LIFminus.csv",
            "GSM1599499_ES_d7_LIFminus.csv",
        )
    ],
    "mouse_brain_data": "neuron_10k_v3_filtered_feature_bc_matrix.h5",
    "human_stemcell_data": "GSE75748/GSE75748_sc_time_course_ec.csv.gz",
    "human_breast_TGFb_data": "GSE114397_HMLE_TGFb.csv",
    "human_breast_Dox_data": "GSM3141014_Zeb1_Dox.csv",
    "human_melanoma_data": "human_melanoma_data.csv",
    "mouse_visual_data": [
        "GSM2746905_B4_11_0h_counts.csv",
        "GSM2746913_B6_18_1h_counts.csv",
    ],
}

@functools.lru_cache
def multimodality_url_dict(task: str) -> Dict[str, str]:
    """OpenProblems bundle urls per task: prediction | matching | joint_embedding.

    Data provenance: reference URL_DICT tables at
    dance/datasets/multimodality.py:228 (prediction), :334 (matching),
    :546 (joint embedding).
    """
    return _two_column_url_dict(f"multimodality_{task}.csv")


@functools.lru_cache
def spatial_libd_url_dict() -> Dict[str, str]:
    """DLPFC Visium slide urls (provenance: dance/datasets/spatial.py:26-48)."""
    return _two_column_url_dict("spatial_libd.csv")


@functools.lru_cache
def spatial_deconvo_url_dict() -> Dict[str, str]:
    """Deconvolution ref+mix bundle urls (provenance: spatial.py:161-215)."""
    return _two_column_url_dict("spatial_deconvo.csv")


__all__ = [
    "IMPUTATION_DATASET_TO_FILE", "METADIR", "clustering_url_dict",
    "imputation_url_dict", "multimodality_url_dict", "scdeepsort_catalog",
    "scdeepsort_url_dict", "spatial_deconvo_url_dict", "spatial_libd_url_dict",
]
