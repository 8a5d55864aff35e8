"""Multimodal omics methods (parity: dance/modules/multi_modality)."""
