"""SVM cell-type annotation (parity: dance/modules/.../svm.py:13).

sklearn SVC over WeightedFeaturePCA features — host-side classical head; the
PCA feature extraction runs on device.
"""

import numpy as np
from sklearn.svm import SVC

from dance_tpu.modules.base import BaseClassificationMethod
from dance_tpu.transforms import Compose, SetConfig, WeightedFeaturePCA
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.wrappers import as_numpy


class SVM(BaseClassificationMethod):

    def __init__(self, args=None, prj_path: str = "./",
                 random_state: Optional[int] = None):
        self.args = args
        self.random_state = random_state
        self._mdl = SVC(random_state=random_state, probability=True)

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
