"""Import shim for running the reference implementation head-to-head.

The reference at /root/reference depends on packages absent from this
environment (anndata, mudata, scanpy, omegaconf, dgl, deprecated). For the
metric-parity harness we only exercise the reference's torch/sklearn/numpy
``fit``/``predict`` paths on pre-built arrays, so import-time stubs suffice:

- ``anndata``/``mudata`` map to the first-party containers in
  ``dance_tpu.data`` (the reference only needs the class names at import).
- ``scanpy`` maps to ``dance_tpu.sc`` (first-party ``pp``/``tl`` subset).
- ``omegaconf`` provides a minimal ``DictConfig``/``OmegaConf`` pair.
- ``dgl`` provides ``DGLError`` + no-op seeding (only ``set_seed`` touches it).
- ``deprecated`` provides a pass-through decorator.

Call :func:`install` before importing anything under ``dance.``. The real
compute deps (torch CPU, sklearn, scipy, numpy, pandas) are genuine.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def _module(name, **attrs):
    mod = types.ModuleType(name)
    mod.__path__ = []  # mark as package so submodule stubs can attach
    for key, val in attrs.items():
        setattr(mod, key, val)
    sys.modules[name] = mod
    return mod


class _AutoModule(types.ModuleType):
    """Module stub that manufactures dummy classes for any attribute.

    Lets reference files that merely *import* dgl layers (to subclass them in
    models we never instantiate here) load without the real package.
    """

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        dummy = type(name, (), {"__init__": lambda self, *a, **k: None})
        setattr(self, name, dummy)
        return dummy


def _auto_module(name):
    mod = _AutoModule(name)
    mod.__path__ = []
    sys.modules[name] = mod
    return mod


STUBBED = set()


# Third-party roots the reference imports that are absent here and safe to
# stub (their functionality is never exercised by the parity fit paths).
# Deliberately an allowlist: a catch-all finder breaks stdlib/third-party
# feature detection (`try: import _winapi` and friends).
STUB_ROOTS = frozenset({
    "statsmodels", "KDEpy", "torchnmf", "louvain", "leidenalg", "igraph",
    "scib", "wandb", "ot", "pot", "dropbox", "fastapi", "uvicorn", "scprep",
    "magic", "harmonypy", "scanorama", "cv2", "PIL", "torchvision",
    "efficientnet_pytorch", "networkx", "openpyxl", "xlrd", "requests",
    "psutil", "seaborn", "matplotlib", "plotly", "scikit_misc", "skmisc",
    "annoy", "pynndescent", "umap", "rpy2", "opencv_python", "numexpr",
    "tables", "h5py", "patsy", "tifffile", "squidpy", "cellstar", "skimage",
    "torch_geometric", "torch_sparse", "torch_scatter", "torch_cluster",
})


class _MissingStubFinder:
    """Last-resort meta_path finder for an allowlist of absent science deps.

    Sits at the END of sys.meta_path, so it only fires for modules the real
    import system cannot find, and only for roots in ``STUB_ROOTS``. Stubbed
    names are recorded in ``STUBBED`` so the parity harness can report which
    dependencies were faked; a reference method whose *fit path* touches a
    stub fails loudly (dummy classes do nothing) and is skipped, never
    silently wrong.
    """

    def find_spec(self, fullname, path=None, target=None):
        if fullname.split(".", 1)[0] not in STUB_ROOTS:
            return None
        from importlib.machinery import ModuleSpec
        return ModuleSpec(fullname, _StubLoader(), is_package=True)


class _StubLoader:
    def create_module(self, spec):
        STUBBED.add(spec.name)
        mod = _AutoModule(spec.name)
        mod.__path__ = []
        return mod

    def exec_module(self, module):
        parent, _, child = module.__name__.rpartition(".")
        if parent and parent in sys.modules:
            setattr(sys.modules[parent], child, module)


def install() -> None:
    """Install stub modules and put the reference repo on sys.path."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    if "anndata" not in sys.modules:
        from dance_tpu.data import AnnData
        from dance_tpu.data.io import read_h5ad
        _module("anndata", AnnData=AnnData, read_h5ad=read_h5ad)
    if "mudata" not in sys.modules:
        from dance_tpu.data import MuData
        _module("mudata", MuData=MuData)
    if "scanpy" not in sys.modules:
        import dance_tpu.sc as _sc
        sc = _module("scanpy", pp=_sc.pp, tl=_sc.tl)
        sys.modules["scanpy.pp"] = _sc.pp
        sys.modules["scanpy.tl"] = _sc.tl
        sc.AnnData = sys.modules["anndata"].AnnData
    if "omegaconf" not in sys.modules:
        class DictConfig(dict):
            def __init__(self, content=None, **kwargs):
                super().__init__(content or {})

        class OmegaConf:
            @staticmethod
            def create(obj=None):
                return DictConfig(obj)

            @staticmethod
            def to_container(cfg, resolve=True):
                return dict(cfg)

        class ListConfig(list):
            pass

        _module("omegaconf", DictConfig=DictConfig, OmegaConf=OmegaConf,
                ListConfig=ListConfig, DictKeyType=str, Node=object)
    if "dgl" not in sys.modules:
        class DGLError(Exception):
            pass

        dgl = _auto_module("dgl")  # unknown attrs become dummy classes
        dgl.DGLError = DGLError
        dgl.seed = lambda *_: None
        dgl.random = _module("dgl.random", seed=lambda *_: None)
        for sub in ("function", "nn", "nn.pytorch", "nn.pytorch.conv",
                    "utils", "dataloading", "sampling", "heterograph"):
            _auto_module(f"dgl.{sub}")
        for full in list(sys.modules):
            if full.startswith("dgl."):
                parent, _, child = full.rpartition(".")
                setattr(sys.modules[parent], child, sys.modules[full])
    if not any(isinstance(f, _MissingStubFinder) for f in sys.meta_path):
        sys.meta_path.append(_MissingStubFinder())
    # newer sklearn dropped the `issparse` re-export the reference relies on
    import sklearn.utils
    if not hasattr(sklearn.utils, "issparse"):
        import scipy.sparse
        sklearn.utils.issparse = scipy.sparse.issparse
    import importlib.util
    if importlib.util.find_spec("tqdm") is None and "tqdm" not in sys.modules:
        # reference uses tqdm(iterable) inline; give it a pass-through
        mod = _module("tqdm", tqdm=lambda it=None, *a, **k: it,
                      trange=lambda *a, **k: range(*a))
        mod.auto = _module("tqdm.auto", tqdm=mod.tqdm, trange=mod.trange)
    if "numba" not in sys.modules:
        def njit(*dargs, **dkwargs):
            if dargs and callable(dargs[0]):
                return dargs[0]

            def wrap(fn):
                return fn

            return wrap

        _module("numba", njit=njit, jit=njit, prange=range)
    if "pyro" not in sys.modules:
        import torch

        class ZeroInflatedNegativeBinomial(torch.distributions.Distribution):
            """Functional stand-in matching pyro's ZINB log_prob/mean."""

            def __init__(self, total_count=None, probs=None, logits=None,
                         gate=None, gate_logits=None, validate_args=None):
                self.base_dist = torch.distributions.NegativeBinomial(
                    total_count, probs=probs, logits=logits, validate_args=False)
                if gate is None:
                    gate = torch.sigmoid(gate_logits)
                self.gate = gate
                super().__init__(self.base_dist.batch_shape, validate_args=False)

            def log_prob(self, value):
                eps = 1e-8
                log_nb = self.base_dist.log_prob(value)
                zero_case = torch.logaddexp(
                    torch.log(self.gate + eps),
                    torch.log1p(-self.gate + eps)
                    + self.base_dist.log_prob(torch.zeros_like(value)))
                return torch.where(value == 0, zero_case,
                                   torch.log1p(-self.gate + eps) + log_nb)

            @property
            def mean(self):
                return (1 - self.gate) * self.base_dist.mean

            def sample(self, sample_shape=torch.Size()):
                nb = self.base_dist.sample(sample_shape)
                keep = torch.bernoulli(
                    (1 - self.gate).expand(nb.shape))
                return nb * keep

        pyro = _module("pyro")
        pyro.distributions = _module("pyro.distributions")
        pyro.distributions.zero_inflated = _module(
            "pyro.distributions.zero_inflated",
            ZeroInflatedNegativeBinomial=ZeroInflatedNegativeBinomial)
        pyro.distributions.ZeroInflatedNegativeBinomial = ZeroInflatedNegativeBinomial
    if "deprecated" not in sys.modules:
        def deprecated(*dargs, **dkwargs):
            if dargs and callable(dargs[0]):
                return dargs[0]

            def wrap(fn):
                return fn

            return wrap

        _module("deprecated", deprecated=deprecated)


def import_ref(module: str, attr: str):
    """``install()`` then fetch ``attr`` from the reference module path."""
    install()
    import importlib
    return getattr(importlib.import_module(module), attr)
