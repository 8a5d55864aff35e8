"""SVM cell-type annotation (parity: dance/modules/.../svm.py:13).

The reference fits sklearn ``SVC`` (RBF kernel) on WeightedFeaturePCA
features. Here the default head is device-native: random-Fourier-feature RBF
+ squared-hinge one-vs-rest trained as one jitted scan
(:class:`dance_tpu.ops.linear_model.DeviceSVC`) — the whole fit is a single
MXU-shaped dispatch instead of a host SMO solve. ``backend="sklearn"`` keeps
the reference stack for parity tests.
"""

import numpy as np

from dance_tpu.modules.base import BaseClassificationMethod
from dance_tpu.transforms import Compose, SetConfig, WeightedFeaturePCA
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.wrappers import as_numpy


class SVM(BaseClassificationMethod):

    def __init__(self, args=None, prj_path: str = "./",
                 random_state: Optional[int] = None, backend: str = "device"):
        self.args = args
        self.random_state = random_state
        if backend == "sklearn":
            from sklearn.svm import SVC
            self._mdl = SVC(random_state=random_state, probability=True)
        else:
            from dance_tpu.ops.linear_model import DeviceSVC
            self._mdl = DeviceSVC(random_state=random_state or 0)

    @staticmethod
    def preprocessing_pipeline(n_components: int = 400, log_level: LogLevel = "INFO"):
        return Compose(
            WeightedFeaturePCA(n_components=n_components, split_name="train"),
            SetConfig({"feature_channel": "WeightedFeaturePCA",
                       "label_channel": "cell_type"}),
            log_level=log_level,
        )

    def fit(self, x, y):
        y = as_numpy(y)
        if y.ndim == 2:
            y = y.argmax(1)
        self._mdl.fit(as_numpy(x), y)

    def predict(self, x):
        return self._mdl.predict(as_numpy(x))

    def predict_proba(self, x):
        return self._mdl.predict_proba(as_numpy(x))
