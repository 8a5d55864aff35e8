"""dance-tpu: a TPU-native single-cell analysis framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of OmicsML/dance
(reference: /root/reference): cell-type annotation, clustering, imputation,
modality prediction/matching, joint embedding, spatial-domain identification,
cell-type deconvolution, and automated preprocessing-pipeline search.

The compute path is JAX (jit/pjit/shard_map over a ``jax.sharding.Mesh``,
Pallas kernels for sparse graph ops); the host path (data containers, IO,
registry, pipeline planning) is pure Python on numpy/scipy/h5py.

Reference parity anchor: dance/__init__.py:1-11 (package logger export).
"""

from dance_tpu.settings import logger

__version__ = "0.1.0"

__all__ = ["logger", "__version__"]
