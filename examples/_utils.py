"""Shared example-script helpers: synthetic fallbacks for no-egress runs."""

import argparse

from dance_tpu.datasets import synthetic  # noqa: F401  (re-export)
from dance_tpu.datasets.synthetic import (annotation_data, clustering_data,
                                          imputation_data, multimodal_data,
                                          spatial_data)
from dance_tpu.utils import set_seed


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cache", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="run on synthetic data (default when raw data is absent)")
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--dataset", default=None,
                   help="named synthetic dataset analog (see DATASET_ANALOGS)")
    return p


# ---------------------------------------------------------------------------
# Dataset analogs: synthetic configs parameterized to the reference benchmark
# catalog's published stats (cells / genes / classes per dataset) so the full
# benchmark tier has real dataset VARIETY without downloads.
#
# Sources: dance/metadata/*.csv + reference tests/test_bench.py:61-160 +
# SURVEY.md Appendix B. Gene counts are capped (the reference post-filter
# benchmark dims land in the low thousands anyway); class counts follow the
# published per-dataset annotations.
# ---------------------------------------------------------------------------

DATASET_ANALOGS = {
    # -- cell-type annotation: scDeepSort benchmark triplets ----------------
    # mouse Brain: train 753+3285 / test 2695 cells (actinn.py:63-74)
    "cta_mouse_brain": dict(family="annotation", n_cells=4038 + 2695,
                            n_genes=1000, n_types=17,
                            train_frac=4038 / (4038 + 2695)),
    # mouse Spleen: train 1970 / test 1759
    "cta_mouse_spleen": dict(family="annotation", n_cells=1970 + 1759,
                             n_genes=1000, n_types=5,
                             train_frac=1970 / (1970 + 1759)),
    # mouse Kidney: train 4682 / test 203
    "cta_mouse_kidney": dict(family="annotation", n_cells=4682 + 203,
                             n_genes=1000, n_types=12,
                             train_frac=4682 / (4682 + 203)),
    # -- clustering: scDeepCluster benchmark h5 sets (clustering.csv) -------
    "clu_10x_pbmc": dict(family="clustering", n_cells=4271, n_genes=1000,
                         n_types=8),
    "clu_mouse_bladder": dict(family="clustering", n_cells=2746, n_genes=1000,
                              n_types=16),
    "clu_mouse_es": dict(family="clustering", n_cells=2717, n_genes=1000,
                         n_types=4),
    "clu_worm_neuron": dict(family="clustering", n_cells=4186, n_genes=1000,
                            n_types=10),
    # -- imputation: GEO sets (imputation.csv) -------------------------------
    "imp_pbmc": dict(family="imputation", n_cells=3000, n_genes=1000),
    "imp_mouse_embryo": dict(family="imputation", n_cells=750, n_genes=1000),
    "imp_mouse_brain": dict(family="imputation", n_cells=1500, n_genes=1000),
    # -- multimodal: OpenProblems subtask shapes -----------------------------
    # CITE gex->adt: 134 proteins (openproblems_bmmc_cite)
    "mm_cite": dict(family="multimodal", n_cells=2000, n_genes=1000,
                    n_prot=134, n_types=8),
    # Multiome gex<->atac analog: wide second modality
    "mm_multiome": dict(family="multimodal", n_cells=1500, n_genes=800,
                        n_prot=400, n_types=6),
    # -- spatial domain: DLPFC Visium slides (151507-151676, 5-7 layers) ----
    "dlpfc_151507": dict(family="spatial", n_spots=4226, n_genes=900,
                         n_domains=7),
    "dlpfc_151510": dict(family="spatial", n_spots=4634, n_genes=900,
                         n_domains=7),
    "dlpfc_151669": dict(family="spatial", n_spots=3661, n_genes=900,
                         n_domains=5),
    "dlpfc_151673": dict(family="spatial", n_spots=3639, n_genes=900,
                         n_domains=7),
    # -- deconvolution: CARD_synthetic / GSE174746 / SPOTLight_synthetic ----
    "dec_card_synth": dict(family="deconvo", n_spots=428, n_genes=900,
                           n_types=6, mix_scale=3.0),
    "dec_gse174746": dict(family="deconvo", n_spots=161, n_genes=900,
                          n_types=4, mix_scale=2.0),
    "dec_spotlight_synth": dict(family="deconvo", n_spots=300, n_genes=900,
                                n_types=8, mix_scale=3.0),
}

_FAMILY_GEN = {
    "annotation": annotation_data,
    "clustering": clustering_data,
    "imputation": imputation_data,
    "multimodal": multimodal_data,
    "spatial": spatial_data,
}


def load_synthetic(family: str, args, **defaults):
    """Family generator routed through the ``--dataset`` analog registry.

    Without ``--dataset`` this reproduces each script's historical default
    shapes; with it, the analog's published-stat shapes (and its own seed
    offset, so two analogs never share a draw)."""
    name = getattr(args, "dataset", None)
    if name:
        cfg = dict(DATASET_ANALOGS[name])
        got = cfg.pop("family")
        if got != family:
            raise ValueError(f"--dataset {name} is a {got} analog, not {family}")
        import zlib
        seed = args.seed + zlib.crc32(name.encode()) % 1000
        if family == "deconvo":
            from dance_tpu.datasets.synthetic import deconvo_data
            return deconvo_data(seed=seed, **cfg)
        return _FAMILY_GEN[family](seed=seed, **cfg)
    if family == "deconvo":
        from dance_tpu.datasets.synthetic import deconvo_data
        return deconvo_data(seed=args.seed, **defaults)
    return _FAMILY_GEN[family](seed=args.seed, **defaults)
