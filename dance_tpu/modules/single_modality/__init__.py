"""Single-modality task methods: annotation, clustering, imputation."""
