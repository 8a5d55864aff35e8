"""Atlas recommendation web backend (parity: examples/atlas/demos/main.py:14-120).

The reference serves a FastAPI app; fastapi is unavailable here, so the same
endpoints are provided as a plain WSGI application (servable with
``python -m wsgiref.simple_server`` or any WSGI server):

- ``POST /similarity?tissue=<t>`` with an h5ad body — ranks atlas datasets by
  similarity to the uploaded query and returns the best dataset plus its best
  stored preprocessing configs.
- ``GET /health`` — liveness probe.
"""

import io
import json
import os
import tempfile
from typing import Dict, List

import numpy as np

from dance_tpu.atlas import AnnDataSimilarity
from dance_tpu.data import read_h5ad
from dance_tpu.settings import logger

DEFAULT_METRICS = ["wasserstein", "hausdorff", "spectral"]


class AtlasService:
    """Holds the per-tissue atlas datasets + stored sweep answers."""

    def __init__(self, atlas_dir: str = "atlas_data", answers_dir: str = "sweep_results"):
        self.atlas_dir = atlas_dir
        self.answers_dir = answers_dir

    def _atlas_datasets(self, tissue: str) -> Dict[str, str]:
        base = os.path.join(self.atlas_dir, tissue)
        if not os.path.isdir(base):
            return {}
        return {f[:-5]: os.path.join(base, f) for f in sorted(os.listdir(base))
                if f.endswith(".h5ad")}

    def get_sim(self, query_adata, tissue: str,
                metrics: List[str] = DEFAULT_METRICS) -> Dict[str, float]:
        scores = {}
        for name, path in self._atlas_datasets(tissue).items():
            ref = read_h5ad(path)
            sim = AnnDataSimilarity(query_adata, ref, n_runs=1, sample_size=500)
            res = sim.compute_similarity(metrics)
            # distance metrics: lower is more similar -> negate for ranking
            scores[name] = -float(np.mean([res[m] for m in metrics]))
        return scores

    def best_configs(self, tissue: str, dataset: str) -> Dict:
        """Stored best preprocessing configs from sweep answer tables."""
        import pandas as pd
        path = os.path.join(self.answers_dir, f"{tissue}_ans.csv")
        if not os.path.exists(path):
            return {}
        df = pd.read_csv(path)
        rows = df[df.get("dataset", pd.Series(dtype=str)) == dataset]
        return rows.to_dict(orient="records")

    def recommend(self, query_adata, tissue: str) -> Dict:
        scores = self.get_sim(query_adata, tissue)
        if not scores:
            return {"error": f"no atlas datasets for tissue {tissue!r}"}
        best = max(scores, key=scores.get)
        return {"best_dataset": best, "scores": scores,
                "best_configs": self.best_configs(tissue, best)}


def create_app(service: AtlasService = None):
    service = service or AtlasService()

    def app(environ, start_response):
        path = environ.get("PATH_INFO", "/")
        method = environ.get("REQUEST_METHOD", "GET")
        if path == "/health":
            start_response("200 OK", [("Content-Type", "application/json")])
            return [b'{"status": "ok"}']
        if path == "/similarity" and method == "POST":
            from urllib.parse import parse_qs
            tissue = parse_qs(environ.get("QUERY_STRING", "")).get(
                "tissue", ["blood"])[0]
            size = int(environ.get("CONTENT_LENGTH") or 0)
            body = environ["wsgi.input"].read(size)
            with tempfile.NamedTemporaryFile(suffix=".h5ad", delete=False) as f:
                f.write(body)
                tmp = f.name
            try:
                query = read_h5ad(tmp)
                result = service.recommend(query, tissue)
            except Exception as e:  # noqa: BLE001 — report to client
                result = {"error": str(e)}
            finally:
                os.unlink(tmp)
            start_response("200 OK", [("Content-Type", "application/json")])
            return [json.dumps(result).encode()]
        start_response("404 Not Found", [("Content-Type", "application/json")])
        return [b'{"error": "not found"}']

    return app


if __name__ == "__main__":
    from wsgiref.simple_server import make_server
    port = int(os.environ.get("PORT", 8000))
    logger.info("Serving atlas backend on :%d", port)
    make_server("", port, create_app()).serve_forever()
