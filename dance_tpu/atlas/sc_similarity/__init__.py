from dance_tpu.atlas.sc_similarity.anndata_similarity import AnnDataSimilarity

__all__ = ["AnnDataSimilarity"]
