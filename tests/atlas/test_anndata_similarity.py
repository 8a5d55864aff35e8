"""Atlas similarity tests (parity model: tests/atlas/test_anndata_similarity.py)."""

import numpy as np
import pytest

from dance_tpu.data import AnnData


@pytest.fixture
def pair():
    rng = np.random.default_rng(0)
    base = rng.gamma(2, 1, 50)
    x1 = rng.poisson(base, (80, 50)).astype(np.float32)
    x2 = rng.poisson(base, (90, 50)).astype(np.float32)       # same distribution
    x3 = rng.poisson(base * 5, (90, 50)).astype(np.float32)   # shifted distribution
    genes = {"gene_symbol": [f"g{i}" for i in range(50)]}
    obs = {"tissue": ["blood"] * 80}
    mk = lambda x, n: AnnData(x, obs={"tissue": ["blood"] * len(x)}, var=genes)
    return mk(x1, 80), mk(x2, 90), mk(x3, 90)


def test_similarity_metrics(pair):
    from dance_tpu.atlas import AnnDataSimilarity
    a1, a2, a3 = pair
    sim_close = AnnDataSimilarity(a1, a2, n_runs=2, sample_size=60,
                                  init_random_state=0)
    sim_far = AnnDataSimilarity(a1, a3, n_runs=2, sample_size=60, init_random_state=0)
    res_close = sim_close.compute_similarity()
    res_far = sim_far.compute_similarity()
    for key in ["cosine", "pearson", "jaccard", "js_distance", "mmd", "wasserstein",
                "hausdorff", "chamfer", "energy", "sinkhorn2", "spectral",
                "metadata_sim"]:
        assert key in res_close
        assert np.isfinite(res_close[key])
    # similarity metrics should rank the matched pair closer
    assert res_close["cosine"] > res_far["cosine"]
    # distance metrics should rank the matched pair smaller
    assert res_close["mmd"] < res_far["mmd"]
    assert res_close["energy"] < res_far["energy"]


def test_common_genes(pair):
    from dance_tpu.atlas import AnnDataSimilarity
    a1, a2, _ = pair
    sim = AnnDataSimilarity(a1, a2, n_runs=1)
    assert sim.common_genes_num() == 50


def test_wsgi_app(pair, tmp_path):
    import sys
    sys.path.insert(0, "/root/repo/examples/atlas/demos")
    import importlib
    main = importlib.import_module("main")
    a1, a2, a3 = pair
    atlas_dir = tmp_path / "atlas" / "blood"
    atlas_dir.mkdir(parents=True)
    from dance_tpu.data import write_h5ad
    write_h5ad(a2, atlas_dir / "ds_close.h5ad")
    write_h5ad(a3, atlas_dir / "ds_far.h5ad")
    service = main.AtlasService(atlas_dir=str(tmp_path / "atlas"))
    result = service.recommend(a1, "blood")
    assert result["best_dataset"] == "ds_close"


def test_wsgi_http_drive(pair, tmp_path):
    """Drive the atlas backend through a real HTTP socket."""
    import importlib
    import io
    import json
    import sys
    import threading
    from http.client import HTTPConnection
    from wsgiref.simple_server import make_server

    sys.path.insert(0, "/root/repo/examples/atlas/demos")
    main = importlib.import_module("main")
    a1, a2, a3 = pair
    atlas_dir = tmp_path / "atlas" / "blood"
    atlas_dir.mkdir(parents=True)
    from dance_tpu.data import write_h5ad
    write_h5ad(a2, atlas_dir / "ds_close.h5ad")
    app = main.create_app(main.AtlasService(atlas_dir=str(tmp_path / "atlas")))
    srv = make_server("127.0.0.1", 0, app)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        conn = HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/health")
        assert json.loads(conn.getresponse().read())["status"] == "ok"
        buf = io.BytesIO()
        import h5py  # write query h5ad into memory? -> temp file then read bytes
        qpath = tmp_path / "query.h5ad"
        write_h5ad(a1, qpath)
        body = qpath.read_bytes()
        conn.request("POST", "/similarity?tissue=blood", body=body)
        resp = json.loads(conn.getresponse().read())
        assert resp["best_dataset"] == "ds_close"
        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404
    finally:
        srv.shutdown()


def test_answer_table_generation(tmp_path):
    """Per-tissue answer tables from a staged sweep-results tree (CLI drive)."""
    import subprocess
    import sys

    import pandas as pd
    root = tmp_path / "sweeps"
    for method, accs in [("actinn", [0.8, 0.9]), ("svm", [0.85])]:
        for ds in ["328", "138"]:
            d = root / method / ds / "results" / "pipeline"
            d.mkdir(parents=True)
            pd.DataFrame({
                "pipeline.0.normalize": ["Log1P"] * len(accs),
                "test_acc": accs,
            }).to_csv(d / "best_test_acc.csv", index=False)
    out = subprocess.run(
        [sys.executable, "/root/repo/examples/atlas/get_result_web.py",
         "--results_root", str(root), "--tissue", "heart",
         "--out_dir", str(tmp_path)],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    ans = pd.read_csv(tmp_path / "heart_ans.csv")
    assert set(ans["method"]) == {"actinn", "svm"}
    assert len(ans) == 4  # 2 methods x 2 datasets
    best = ans[(ans.method == "actinn")
               & (ans.dataset.astype(str) == "328")]["test_acc"]
    assert float(best.iloc[0]) == 0.9
    assert "pipeline.0.normalize" in ans.columns
