"""Scanpy-compatible preprocessing surface, first-party.

The reference drives most preprocessing through ``AnnDataTransform(sc.pp.*)``
(dance/transforms/interface.py:9; e.g. actinn preprocessing_pipeline). Scanpy
itself is not a dependency of this framework — the functions it uses are
implemented here over the native AnnData container, with hot math in JAX.
Import as ``from dance_tpu import sc`` then ``sc.pp.log1p(adata)`` etc.
"""

from dance_tpu.sc import pp, tl

__all__ = ["pp", "tl"]
