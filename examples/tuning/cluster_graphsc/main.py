"""DANCE 2.0 pipeline search for graph-sc clustering (parity: examples/tuning/clu_graphsc)."""
import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
from _utils import clustering_data, set_seed
from dance_tpu.modules.single_modality.clustering import GraphSC
from dance_tpu.pipeline import PipelinePlaner
from dance_tpu.transforms import SetConfig
from dance_tpu.transforms.graph import PCACellFeatureGraph

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
        data = clustering_data(n_cells=200, n_genes=100, seed=args.seed)
        planer.generate(pipeline=trial_cfg).functional(data)
        PCACellFeatureGraph(n_components=20, out="CellFeatureGraph")(data)
        SetConfig({"feature_channel": "CellFeatureGraph",
                   "feature_channel_type": "uns", "label_channel": "Group"})(data)
        g, y = data.get_train_data()
        model = GraphSC(in_feats=20, n_clusters=3, seed=args.seed)
        model.fit(g, y, epochs=20, lr=1e-3)
        return {"ari": model.score(None, y)}

    runner = planer.sweep_agent(evaluate, count=args.count, method="random",
                                seed=args.seed,
                                summary_file_path=os.path.join(args.results_dir, "cluster_graphsc.csv"))
    print("Best ARI:", runner.best("ari")["ari"])
