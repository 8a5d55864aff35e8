"""Spatial / morphology features (parity: dance/transforms/spatial_feature.py)."""

import numpy as np
import pandas as pd

from dance_tpu.registry import register_preprocessor
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.typing import Optional, Sequence
from dance_tpu.utils.matrix import normalize
from dance_tpu.utils.status import experimental


@register_preprocessor("feature", "spatial")
class MorphologyFeatureCNN(BaseTransform):
    """CNN image features from H&E tiles (parity: spatial_feature.py:19).

    Deviation: the reference loads torchvision's pretrained resnet50/vgg16;
    no pretrained weights are downloadable in this environment. Instead a
    small strided convolutional autoencoder is TRAINED on the tiles
    themselves (``train_epochs`` of masked-reconstruction, self-supervised
    and offline-initializable) and its encoder bottleneck provides the
    morphology embedding; ``train_epochs=0`` falls back to the fixed-seed
    random conv features (texture/color statistics only). Both paths run
    batched under jit, followed by PCA to ``n_components``.
    """

    _DISPLAY_ATTRS = ("model_name", "n_components", "crop_size", "target_size")
    _MODELS = ("resnet50", "inception_v3", "xception", "vgg16")

    def __init__(self, *, model_name: str = "resnet50", n_components: int = 50,
                 random_state: int = 0, crop_size: int = 20, target_size: int = 64,
                 device: str = "auto", train_epochs: int = 30, lr: float = 1e-3,
                 channels: Sequence[str] = ("spatial_pixel", "image"),
                 channel_types: Sequence[str] = ("obsm", "uns"), **kwargs):
        super().__init__(**kwargs)
        if model_name not in self._MODELS:
            raise ValueError(f"Unsupported model {model_name!r}, options: {self._MODELS}")
        self.model_name = model_name
        self.n_components = n_components
        self.random_state = random_state
        self.crop_size = crop_size
        self.target_size = target_size
        self.train_epochs = train_epochs
        self.lr = lr
        self.channels = channels
        self.channel_types = channel_types
        self.mean = np.array([0.406, 0.485, 0.456])
        self.std = np.array([0.225, 0.229, 0.224])

    def _train_encoder(self, kernels, patches, encode, key):
        """Self-supervised fit of the conv encoder on the tiles: a linear
        decoder reconstructs downsampled tiles from the bottleneck map, so the
        encoder kernels adapt to the slide's actual morphology instead of
        staying random. Offline-initializable (no pretrained weights)."""
        import jax
        import jax.numpy as jnp
        import optax

        ts8 = self.target_size // 8  # bottleneck spatial resolution
        dec = jax.random.normal(jax.random.fold_in(key, 9), (128, 3),
                                jnp.float32) * 0.05
        params = {"kernels": kernels, "dec": dec}
        tx = optax.adam(self.lr)
        opt_state = tx.init(params)
        x_all = jnp.asarray(patches[: min(len(patches), 1024)])
        # reconstruction target: 8x-downsampled tiles (one pixel per
        # bottleneck cell, 8x8 mean pooling)
        tgt = x_all.reshape(x_all.shape[0], ts8, 8, ts8, 8, 3).mean((2, 4))

        @jax.jit
        def step(params, opt_state, x, t):
            def loss_fn(params):
                h = encode(params["kernels"], x)  # (n, ts8, ts8, 128)
                rec = h @ params["dec"]           # linear per-cell decoder
                return jnp.mean((rec - t) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        for _ in range(self.train_epochs):
            params, opt_state, loss = step(params, opt_state, x_all, tgt)
        self.logger.info("Morphology encoder trained: recon MSE %.5f", float(loss))
        return params["kernels"]

    def _crop(self, image, x, y):
        cs = self.crop_size
        img = image[max(0, int(x - cs)):int(x + cs), max(0, int(y - cs)):int(y + cs), :]
        # nearest-neighbor resize to target
        ts = self.target_size
        xi = np.clip((np.arange(ts) * img.shape[0] / ts).astype(int), 0, img.shape[0] - 1)
        yi = np.clip((np.arange(ts) * img.shape[1] / ts).astype(int), 0, img.shape[1] - 1)
        img = img[np.ix_(xi, yi)]
        return (img - self.mean) / self.std

    def __call__(self, data):
        import jax
        import jax.numpy as jnp

        xy_pixel = np.asarray(data.get_feature(return_type="numpy",
                                               channel=self.channels[0],
                                               channel_type=self.channel_types[0]))
        image = np.asarray(data.get_feature(return_type="default",
                                            channel=self.channels[1],
                                            channel_type=self.channel_types[1]))
        patches = np.stack([self._crop(image, x, y) for x, y in xy_pixel]).astype(
            np.float32)

        key = jax.random.key(self.random_state)
        keys = jax.random.split(key, 3)
        chans = [3, 32, 64, 128]
        kernels = [jax.random.normal(k, (3, 3, chans[i], chans[i + 1]), jnp.float32)
                   * np.sqrt(2.0 / (9 * chans[i])) for i, k in enumerate(keys)]

        def encode(ks, x):
            for w in ks:
                x = jax.lax.conv_general_dilated(x, w, (2, 2), "SAME",
                                                 dimension_numbers=("NHWC", "HWIO",
                                                                    "NHWC"))
                x = jax.nn.relu(x)
            return x

        if self.train_epochs > 0:
            kernels = self._train_encoder(kernels, patches, encode, key)

        @jax.jit
        def extract(x):
            return encode(kernels, x).mean(axis=(1, 2))

        feats = []
        for start in range(0, len(patches), 256):
            feats.append(np.asarray(extract(jnp.asarray(patches[start:start + 256]))))
        feat = np.concatenate(feats, axis=0)
        if self.n_components > 0:
            from dance_tpu.ops.linalg import pca
            k = min(self.n_components, min(feat.shape) - 1)
            feat = np.asarray(pca(feat, k).embedding)
        data.data.obsm[self.out] = feat
        return data


@register_preprocessor("feature", "spatial")
class SMEFeature(BaseTransform):
    """SME-normalized expression (stLearn) (parity: spatial_feature.py:99).

    Each spot's expression is averaged with the weighted aggregate of its
    top-``n_neighbors`` SMEGraph neighbors, then standardized + PCA."""

    def __init__(self, n_neighbors: int = 3, n_components: int = 50,
                 random_state: int = 0, *,
                 channels: Sequence[Optional[str]] = (None, "SMEGraph"),
                 channel_types: Sequence[Optional[str]] = (None, "obsp"), **kwargs):
        super().__init__(**kwargs)
        self.n_neighbors = n_neighbors
        self.n_components = n_components
        self.random_state = random_state
        self.channels = channels
        self.channel_types = channel_types

    def __call__(self, data):
        x = np.asarray(data.get_feature(return_type="numpy", channel=self.channels[0],
                                        channel_type=self.channel_types[0] or "X"),
                       dtype=np.float64)
        adj = np.asarray(data.get_feature(return_type="numpy", channel=self.channels[1],
                                          channel_type=self.channel_types[1]))
        # vectorized top-k weighted neighbor aggregation
        k = self.n_neighbors
        nbr_idx = np.argsort(adj, axis=1)[:, -k:]
        nbr_w = np.take_along_axis(adj, nbr_idx, axis=1)
        wsum = nbr_w.sum(1, keepdims=True)
        agg = np.einsum("nk,nkg->ng", nbr_w / np.maximum(wsum, 1e-12), x[nbr_idx])
        agg = np.where(wsum > 0, agg, x)
        sme = (x + agg) / 2
        if self.n_components > 0:
            from dance_tpu.ops.linalg import pca
            sme = normalize(sme.astype(np.float32), mode="standardize", axis=0)
            sme = np.asarray(pca(sme, min(self.n_components, min(sme.shape) - 1)).embedding)
        data.data.obsm[self.out] = sme
        return data


@register_preprocessor("feature", "spatial")
class SpatialIDEFeature(BaseTransform):
    """SpatialDE normalization (parity: spatial_feature.py:155).

    Anscombe variance stabilization for NB counts, then regressing out
    log-total-counts (limma removeBatchEffect style, plain lstsq — no patsy)."""

    def __init__(self, channels: Sequence[Optional[str]] = (None, "spatial"),
                 channel_types: Sequence[Optional[str]] = (None, "obsm"), **kwargs):
        super().__init__(**kwargs)
        self.channels = channels
        self.channel_types = channel_types

    @staticmethod
    def stabilize(expr_gxs: np.ndarray) -> np.ndarray:
        """Anscombe VST; expr is genes x samples."""
        from scipy import optimize
        mu, var = expr_gxs.mean(1), expr_gxs.var(1)
        phi_hat, _ = optimize.curve_fit(lambda m, phi: m + phi * m ** 2, mu, var)
        return np.log(expr_gxs + 1.0 / (2 * max(phi_hat[0], 1e-12)))

    @staticmethod
    def regress_out(covariate: np.ndarray, expr_gxs: np.ndarray) -> np.ndarray:
        """Remove covariate effect, keeping the intercept contribution."""
        design = np.ones((expr_gxs.shape[1], 1))
        cov = covariate[:, None]
        A = np.hstack([design, cov])
        coef, *_ = np.linalg.lstsq(A, expr_gxs.T, rcond=-1)
        beta = coef[design.shape[1]:]
        return expr_gxs - (cov @ beta).T

    def __call__(self, data):
        counts = np.asarray(data.get_feature(return_type="numpy",
                                             channel=self.channels[0],
                                             channel_type=self.channel_types[0] or "X"),
                            dtype=np.float64)
        norm = self.stabilize(counts.T)
        total = counts.sum(1)
        resid = self.regress_out(np.log(np.maximum(total, 1.0)), norm).T
        data.data.obsm[self.out] = resid
        return data


@experimental(msg="out channel type under review")
class TangramFeature(BaseTransform):
    """Density prior for Tangram mapping (parity: spatial_feature.py:219; unregistered)."""

    def __init__(self, density_mode: str = "uniform", channel: Optional[str] = None,
                 channel_type: Optional[str] = None, **kwargs):
        super().__init__(**kwargs)
        self.density_mode = density_mode
        self.channel = channel
        self.channel_type = channel_type

    def __call__(self, data):
        x = data.get_feature(return_type="default", channel=self.channel,
                             channel_type=self.channel_type)
        if self.density_mode == "uniform":
            density = np.ones(x.shape[0]) / x.shape[0]
        elif self.density_mode == "rna_count":
            per_spot = np.asarray(x.sum(axis=1)).ravel()
            density = per_spot / per_spot.sum()
        else:
            raise ValueError(f"Unknown density mode {self.density_mode!r}; "
                             "options: uniform, rna_count")
        data.data.obs[self.out] = density
        return data
