"""SingleCellNet (parity: dance/modules/.../singlecellnet.py:10).

Random forest over binary top-gene-pair features (SCNFeature), with an extra
"unknown" class trained on feature-shuffled pseudo-cells. The forest itself
is device-native by default (``ops.forest.RandomForest``: one jitted dispatch
growing all trees in lockstep on the TPU); ``device="cpu"`` keeps the sklearn
head as the parity oracle.
"""

import numpy as np

from dance_tpu.modules.base import BaseClassificationMethod
from dance_tpu.transforms import AnnDataTransform, Compose, SCNFeature, SetConfig
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.wrappers import as_numpy


class SingleCellNet(BaseClassificationMethod):

    def __init__(self, num_trees: int = 100, device: str = "auto",
                 max_depth: int = 10):
        self.num_trees = num_trees
        self.device = device
        self.max_depth = max_depth
        self.model = None

    @staticmethod
    def preprocessing_pipeline(normalize: bool = True, num_top_genes: int = 10,
                               num_top_gene_pairs: int = 25,
                               log_level: LogLevel = "INFO"):
        transforms = []
        if normalize:
            transforms.append(AnnDataTransform("sc.pp.normalize_total", target_sum=1e4))
            transforms.append(AnnDataTransform("sc.pp.log1p"))
        transforms.append(SCNFeature(num_top_genes=num_top_genes,
                                     num_top_gene_pairs=num_top_gene_pairs))
        transforms.append(SetConfig({"feature_channel": "SCNFeature",
                                     "label_channel": "cell_type"}))
        return Compose(*transforms, log_level=log_level)

    def randomize(self, exp, num: int = 50):
        """Doubly feature-shuffled pseudo-cells (parity: singlecellnet.py:37)."""
        exp = as_numpy(exp)
        rand = np.array([np.random.choice(x, len(x), replace=False) for x in exp]).T
        rand = np.array([np.random.choice(x, len(x), replace=False) for x in rand]).T
        return rand[:num]

    def fit(self, x, y, num_rand: int = 100, stratify: bool = True,
            random_state: Optional[int] = 100):
        x = as_numpy(x)
        y = as_numpy(y)
        if y.ndim == 2:
            y = y.argmax(1)
        x_rand = self.randomize(x, num=num_rand)
        x_comb = np.vstack((x, x_rand))
        y_comb = np.concatenate((y, np.full(x_rand.shape[0], y.max() + 1)))
        if self.device == "cpu":
            from sklearn.ensemble import RandomForestClassifier
            self.model = RandomForestClassifier(
                n_estimators=self.num_trees, random_state=random_state,
                class_weight="balanced" if stratify else None)
        else:
            from dance_tpu.ops.forest import RandomForest
            self.model = RandomForest(
                n_estimators=self.num_trees, max_depth=self.max_depth,
                random_state=random_state,
                class_weight="balanced" if stratify else None)
        self.model.fit(x_comb, y_comb)

    def predict_proba(self, x):
        return self.model.predict_proba(as_numpy(x))

    def predict(self, x):
        return self.predict_proba(x).argmax(1)
