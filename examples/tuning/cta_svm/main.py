"""DANCE 2.0 pipeline search for SVM annotation (parity: examples/tuning/cta_svm)."""
import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
from _utils import annotation_data, set_seed
from dance_tpu.modules.single_modality.cell_type_annotation import SVM
from dance_tpu.pipeline import PipelinePlaner
from dance_tpu.transforms import SetConfig

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=os.path.join(os.path.dirname(__file__),
                                                    "pipeline_params_tuning_config.yaml"))
    p.add_argument("--count", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--results_dir", default="results")
    args = p.parse_args()
    set_seed(args.seed)
    planer = PipelinePlaner.from_config_file(args.config)

    def evaluate(trial_cfg):
        data = annotation_data(n_cells=300, n_genes=100, seed=args.seed)
        planer.generate(pipeline=trial_cfg).functional(data)
        if "label_channel" not in data.config:
            SetConfig({"label_channel": "cell_type"})(data)
        model = SVM(None, random_state=args.seed)
        x_train, y_train = data.get_train_data()
        model.fit(x_train, y_train.argmax(1))
        x_test, y_test = data.get_test_data()
        return {"acc": model.score(x_train, y_train),
                "test_acc": model.score(x_test, y_test)}

    runner = planer.sweep_agent(evaluate, count=args.count, method="random",
                                seed=args.seed,
                                summary_file_path=os.path.join(args.results_dir, "cta_svm.csv"))
    print("Best test_acc:", runner.best("test_acc")["test_acc"])
