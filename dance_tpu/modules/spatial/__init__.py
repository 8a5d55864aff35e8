"""Spatial transcriptomics methods (parity: dance/modules/spatial)."""
