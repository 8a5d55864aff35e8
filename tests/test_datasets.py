"""Dataset loader call-stack tests: stage benchmark-format raw files on disk and
run the full load_data path (download-check → parse → Data assembly → transform
→ cache), mirroring SURVEY.md §3.1."""

import numpy as np
import pandas as pd
import pytest

import h5py


def _stage_cta_files(root, species="mouse", tissue="Spleen", train_id="1970",
                    test_id="1759", n_genes=60):
    """Write scDeepSort-format CSV pairs (genes × cells data, celltype table)."""
    rng = np.random.default_rng(0)
    genes = [f"g{i}" for i in range(n_genes)]
    for subdir, ds_id, n_cells in (("train", train_id, 120), ("test", test_id, 40)):
        base = root / subdir / species
        base.mkdir(parents=True, exist_ok=True)
        cells = [f"c{subdir}{i}" for i in range(n_cells)]
        labels = rng.choice(["T cell", "B cell"], n_cells)
        # plant signal: T cells high on first genes
        x = rng.poisson(2, (n_genes, n_cells)).astype(float)
        x[:10, labels == "T cell"] += 8
        pd.DataFrame(x, index=genes, columns=cells).to_csv(
            base / f"{species}_{tissue}{ds_id}_data.csv")
        pd.DataFrame({"Cell": cells, "Cell_type": labels}).set_index("Cell").to_csv(
            base / f"{species}_{tissue}{ds_id}_celltype.csv")


def test_cell_type_annotation_dataset(tmp_path):
    from dance_tpu.datasets import CellTypeAnnotationDataset
    from dance_tpu.modules.single_modality.cell_type_annotation import ACTINN
    _stage_cta_files(tmp_path)
    ds = CellTypeAnnotationDataset(species="mouse", tissue="Spleen",
                                   train_dataset=["1970"], test_dataset=["1759"],
                                   data_dir=str(tmp_path))
    model = ACTINN(hidden_dims=(16,), random_seed=0)
    data = ds.load_data(model.preprocessing_pipeline(), cache=True)
    assert data.shape[0] == 160
    assert len(data.train_idx) == 120 and len(data.test_idx) == 40
    x_train, y_train = data.get_train_data()
    model.fit(x_train, y_train, num_epochs=30, seed=0)
    x_test, y_test = data.get_test_data()
    acc = model.score(x_test, y_test)
    assert acc > 0.85, f"CSV-loaded ACTINN acc too low: {acc}"
    # cache hit path returns an equivalent object without re-reading raw files
    data2 = ds.load_data(model.preprocessing_pipeline(), cache=True)
    assert data2.shape == data.shape


def test_clustering_dataset(tmp_path):
    from dance_tpu.datasets import ClusteringDataset
    rng = np.random.default_rng(0)
    x = rng.poisson(2, (100, 40)).astype(np.float32)
    y = rng.integers(0, 3, 100)
    with h5py.File(tmp_path / "mouse_bladder_cell.h5", "w") as f:
        f["X"] = x
        f["Y"] = y
    ds = ClusteringDataset(data_dir=str(tmp_path), dataset="mouse_bladder_cell")
    data = ds.load_data()
    assert data.shape == (100, 40)
    np.testing.assert_array_equal(data.data.obsm["Group"], y)
    assert data.train_idx == list(range(100))


def test_imputation_dataset(tmp_path):
    from dance_tpu.datasets import ImputationDataset
    rng = np.random.default_rng(0)
    genes = [f"g{i}" for i in range(30)]
    cells = [f"c{i}" for i in range(50)]
    df = pd.DataFrame(rng.poisson(3, (30, 50)), index=genes, columns=cells)
    df.to_csv(tmp_path / "pbmc_data.csv")
    ds = ImputationDataset(data_dir=str(tmp_path), dataset="pbmc_data",
                           train_size=0.8)
    data = ds.load_data()
    assert data.shape == (50, 30)
    assert len(data.train_idx) == 40 and len(data.test_idx) == 10


def test_modality_prediction_dataset(tmp_path):
    from dance_tpu.data import AnnData, write_h5ad
    from dance_tpu.datasets import ModalityPredictionDataset
    rng = np.random.default_rng(0)
    sub = "openproblems_bmmc_cite_phase2_rna"
    base = tmp_path / sub
    base.mkdir(parents=True)
    for split, n in (("train", 60), ("test", 20)):
        m1 = AnnData(rng.poisson(2, (n, 30)).astype(np.float32))
        m2 = AnnData(rng.poisson(2, (n, 10)).astype(np.float32))
        write_h5ad(m1, base / f"{sub}.censor_dataset.output_{split}_mod1.h5ad")
        write_h5ad(m2, base / f"{sub}.censor_dataset.output_{split}_mod2.h5ad")
    ds = ModalityPredictionDataset("gex2adt", root=str(tmp_path))
    data = ds.load_data()
    assert set(data.data.mod) == {"mod1", "mod2"}
    assert len(data.train_idx) == 60
    x1 = data.get_feature(split_name="test", mod="mod1", channel_type="X")
    assert x1.shape == (20, 30)


def test_spatial_datasets(tmp_path):
    from dance_tpu.data import AnnData, write_h5ad
    from dance_tpu.datasets import CellTypeDeconvoDataset, SpatialLIBDDataset
    rng = np.random.default_rng(0)
    # DLPFC slide
    slide = AnnData(rng.poisson(2, (40, 25)).astype(np.float32),
                    obs={"label": rng.choice(["L1", "L2"], 40)})
    slide.obsm["spatial"] = rng.random((40, 2)).astype(np.float32)
    slide.obsm["spatial_pixel"] = (rng.random((40, 2)) * 100).astype(np.float32)
    write_h5ad(slide, tmp_path / "151673.h5ad")
    ds = SpatialLIBDDataset(data_id="151673", data_dir=str(tmp_path))
    data = ds.load_data()
    assert data.shape == (40, 25)
    # deconvolution bundle
    base = tmp_path / "CARD_synthetic"
    base.mkdir()
    ref = AnnData(rng.poisson(2, (50, 25)).astype(np.float32),
                  obs={"cellType": rng.choice(["a", "b"], 50)})
    mix = AnnData(rng.poisson(2, (20, 25)).astype(np.float32))
    mix.obsm["spatial"] = rng.random((20, 2)).astype(np.float32)
    mix.obsm["cell_type_portion"] = pd.DataFrame(rng.dirichlet([1, 1], 20),
                                                 columns=["a", "b"])
    write_h5ad(ref, base / "ref.h5ad")
    write_h5ad(mix, base / "mix.h5ad")
    ds2 = CellTypeDeconvoDataset(dataset="CARD_synthetic", data_dir=str(tmp_path))
    data2 = ds2.load_data()
    assert len(data2.get_split_idx("ref")) == 50
    assert len(data2.get_split_idx("test")) == 20


def test_dataset_catalogs():
    """Benchmark dataset name -> source resolution (SURVEY.md Appendix B)."""
    from dance_tpu.datasets.catalogs import (IMPUTATION_DATASET_TO_FILE,
                                             clustering_url_dict,
                                             imputation_url_dict,
                                             scdeepsort_catalog,
                                             scdeepsort_url_dict)

    cat = scdeepsort_catalog()
    assert len(cat) == 206  # 207 lines incl. header
    assert set(cat.columns) >= {"species", "tissue", "dataset", "split",
                                "celltype_fname", "celltype_url", "data_fname",
                                "data_url"}
    # benchmark triplets used throughout (Appendix B): Spleen 1970,
    # Brain 753/3285/2695, Kidney 4682/203
    mouse = cat[cat.species == "mouse"]
    for tissue, ds in [("Spleen", "1970"), ("Brain", "753"), ("Brain", "3285"),
                       ("Brain", "2695"), ("Kidney", "4682"), ("Kidney", "203")]:
        rows = mouse[(mouse.tissue == tissue) & (mouse.dataset == ds)]
        assert len(rows) >= 1, (tissue, ds)
    urls = scdeepsort_url_dict()
    assert "train_mouse_Spleen1970_data.csv" in urls
    assert all(u.startswith("http") for u in urls.values())

    clu = clustering_url_dict()
    for name in ("10X_PBMC", "mouse_bladder_cell", "mouse_ES_cell",
                 "worm_neuron_cell", "mouse_kidney_cell", "human_pbmc2_cell",
                 "human_skin_cell", "human_ILCS_cell", "mouse_lung_cell",
                 "mouse_kidney_10x", "mouse_kidney_cl2", "mouse_kidney_drop"):
        assert name in clu, name

    imp = imputation_url_dict()
    for name in ("pbmc_data", "mouse_embryo_data", "mouse_brain_data",
                 "human_stemcell_data", "human_breast_TGFb_data",
                 "human_breast_Dox_data", "human_melanoma_data",
                 "mouse_visual_data"):
        assert name in imp, name
        assert name in IMPUTATION_DATASET_TO_FILE or name == "pbmc_raw_data"


def test_dataset_classes_resolve_catalog_names():
    """Every catalog name constructs its dataset class with a resolvable url."""
    from dance_tpu.datasets.catalogs import IMPUTATION_DATASET_TO_FILE
    from dance_tpu.datasets.singlemodality import (CellTypeAnnotationDataset,
                                                   ClusteringDataset,
                                                   ImputationDataset)

    for name in ClusteringDataset.AVAILABLE_DATA:
        ds = ClusteringDataset(dataset=name)
        assert name in ds.url_dict

    for name in ImputationDataset.AVAILABLE_DATA:
        ds = ImputationDataset(dataset=name)
        assert name in ds.url_dict
        if name in IMPUTATION_DATASET_TO_FILE:
            assert len(ds._candidate_paths()) > 3

    entries = CellTypeAnnotationDataset.AVAILABLE_DATA
    assert len(entries) == 206 and all(
        set(e) == {"split", "species", "tissue", "dataset"} for e in entries)
    ds = CellTypeAnnotationDataset(species="mouse", tissue="Spleen",
                                   train_dataset=["1970"], test_dataset=["1759"])
    assert "train_mouse_Spleen1970_data.csv" in ds.url_dict


def test_multimodality_and_spatial_names():
    """Appendix-B ids resolve for the multimodality/spatial dataset classes."""
    from dance_tpu.datasets.multimodality import (JointEmbeddingNIPSDataset,
                                                  ModalityMatchingDataset,
                                                  ModalityPredictionDataset)
    from dance_tpu.datasets.spatial import (CellTypeDeconvoDataset,
                                            SpatialLIBDDataset)

    for sub in ("openproblems_bmmc_cite_phase2_rna", "gex2atac", "gex2adt",
                "atac2gex", "adt2gex"):
        assert sub in ModalityPredictionDataset.AVAILABLE_DATA, sub
    for sub in ("openproblems_bmmc_cite_phase2_rna",
                "openproblems_bmmc_multiome_phase2_rna"):
        assert sub in ModalityMatchingDataset.AVAILABLE_DATA, sub
    for sub in ("openproblems_bmmc_cite_phase2", "adt", "atac"):
        assert sub in JointEmbeddingNIPSDataset.AVAILABLE_DATA, sub
    for slide in ("151507", "151510", "151669", "151676"):
        assert slide in SpatialLIBDDataset.AVAILABLE_DATA, slide
    for name in ("CARD_synthetic", "GSE174746", "SPOTLight_synthetic"):
        assert name in CellTypeDeconvoDataset.AVAILABLE_DATA, name


def test_atlas_get_anndata(tmp_path):
    """Atlas dataset loader resolves catalog ids and returns the raw container
    (parity: anndata_similarity.py:28-50)."""
    from dance_tpu.atlas.sc_similarity.anndata_similarity import get_anndata
    _stage_cta_files(tmp_path, species="mouse", tissue="Spleen")
    ad = get_anndata(tissue="Spleen", species="mouse",
                     train_dataset=["1970", "99999"], test_dataset=["1759"],
                     data_dir=str(tmp_path))
    assert ad.shape[0] == 160  # unknown id 99999 filtered by the catalog
    assert "cell_type" in ad.obsm
