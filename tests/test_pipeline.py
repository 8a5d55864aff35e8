"""Pipeline / planner tests (parity model: tests/test_pipeline.py with the
toy-registry fixture faking the preprocessor registry)."""

import pandas as pd
import pytest

from dance_tpu.pipeline import (Action, Pipeline, PipelinePlaner, SweepRunner,
                                generate_combinations_with_required_elements,
                                generate_subsets, get_step3_yaml, save_summary_data)
from dance_tpu.registry import Registry


class _T:
    """Toy transform recording its params."""

    calls = []

    def __init__(self, **params):
        self.params = params

    def __call__(self, data):
        _T.calls.append((type(self).__name__, self.params))
        return data


class A(_T):
    def __init__(self, a=1, out=None, log_level="INFO", **kw):
        super().__init__(a=a)


class B(_T):
    def __init__(self, b=2, out=None, log_level="INFO", **kw):
        super().__init__(b=b)


class C(_T):
    def __init__(self, c=3, out=None, log_level="INFO", **kw):
        super().__init__(c=c)


@pytest.fixture
def toy_registry():
    r = Registry()
    r.set("preprocessor.step1.A", A)
    r.set("preprocessor.step1.B", B)
    r.set("preprocessor.step2.C", C)
    return r


def test_action_resolution(toy_registry):
    act = Action(type_="step1", target="A", _parent_type="preprocessor",
                 _registry=toy_registry)
    assert act.functional.params == {"a": 1}
    act2 = Action(type_="step1", target="A", params={"a": 9},
                  _parent_type="preprocessor", _registry=toy_registry)
    assert act2.functional.params == {"a": 9}
    assert repr(act2) == "Action(A)"


def test_pipeline_compose(toy_registry):
    cfg = {"type": "preprocessor", "pipeline": [
        {"type": "step1", "target": "A"},
        {"type": "step2", "target": "C", "params": {"c": 7}},
        {"type": "step1", "target": "_skip_"},
    ]}
    pipe = Pipeline(cfg, _registry=toy_registry)
    assert len(pipe) == 3
    assert len(list(pipe)) == 2  # skip flag honored
    _T.calls.clear()
    pipe.functional("data")
    assert _T.calls == [("A", {"a": 1}), ("C", {"c": 7})]


def test_planer_pipeline_mode(toy_registry):
    cfg = {"type": "preprocessor", "tune_mode": "pipeline", "pipeline": [
        {"type": "step1", "skippable": True},
        {"type": "step2"},
    ]}
    planer = PipelinePlaner(cfg, _registry=toy_registry)
    space = planer.search_space()
    assert space == {"pipeline.0.step1": {"values": ["A", "B", "_skip_"]},
                     "pipeline.1.step2": {"values": ["C"]}}
    pipe = planer.generate(pipeline=["B", "C"])
    assert [a.target for a in pipe] == ["B", "C"]
    # dict-form plan (wandb config style)
    pipe2 = planer.generate(pipeline={"pipeline.0.step1": "_skip_",
                                      "pipeline.1.step2": "C"})
    assert [a.target for a in pipe2] == ["C"]
    with pytest.raises(ValueError):
        planer.generate(pipeline=["Nope", "C"])


def test_planer_include_exclude(toy_registry):
    cfg = {"type": "preprocessor", "tune_mode": "pipeline", "pipeline": [
        {"type": "step1", "exclude": ["B"]},
        {"type": "step2"},
    ]}
    planer = PipelinePlaner(cfg, _registry=toy_registry)
    assert planer.search_space()["pipeline.0.step1"]["values"] == ["A"]
    cfg2 = {"type": "preprocessor", "tune_mode": "pipeline", "pipeline": [
        {"type": "step1", "include": ["B"]},
        {"type": "step2"},
    ]}
    planer2 = PipelinePlaner(cfg2, _registry=toy_registry)
    assert planer2.search_space()["pipeline.0.step1"]["values"] == ["B"]


def test_planer_default_params(toy_registry):
    cfg = {"type": "preprocessor", "tune_mode": "pipeline", "pipeline": [
        {"type": "step1", "default_params": {"A": {"a": 42}}},
        {"type": "step2"},
    ]}
    planer = PipelinePlaner(cfg, _registry=toy_registry)
    pipe = planer.generate(pipeline=["A", "C"])
    assert pipe[0].params == {"a": 42}
    pipe_b = planer.generate(pipeline=["B", "C"])
    assert pipe_b[0].params == {}


def test_planer_params_mode(toy_registry):
    cfg = {"type": "preprocessor", "tune_mode": "params", "pipeline": [
        {"type": "step1", "target": "A",
         "params_to_tune": {"a": {"values": [1, 2, 3]}}},
        {"type": "step2", "target": "C", "params": {"c": 5}},
    ]}
    planer = PipelinePlaner(cfg, _registry=toy_registry)
    assert planer.search_space() == {"params.0.A.a": {"values": [1, 2, 3]}}
    pipe = planer.generate(params={"params.0.A.a": 2})
    assert pipe[0].params == {"a": 2}
    assert pipe[1].params == {"c": 5}


def test_sweep_runner_grid():
    space = {"x": {"values": [1, 2]}, "y": {"values": [10, 20]}}
    runner = SweepRunner(space, method="grid")
    runner.run(lambda cfg: {"score": cfg["x"] + cfg["y"]})
    df = runner.summary()
    assert len(df) == 4
    assert runner.best("score")["score"] == 22
    assert "_runtime" in df.columns


def test_sweep_runner_random_numeric():
    space = {"lr": {"min": 1e-4, "max": 1e-1, "distribution": "log_uniform_values"},
             "n": {"min": 1, "max": 5}}
    runner = SweepRunner(space, method="random", seed=0)
    runner.run(lambda cfg: {"score": cfg["n"]}, count=5)
    assert len(runner.records) == 5
    assert all(1e-4 <= r["lr"] <= 1e-1 for r in runner.records)


def test_planer_end_to_end_sweep(toy_registry):
    cfg = {"type": "preprocessor", "tune_mode": "pipeline", "pipeline": [
        {"type": "step1"},
        {"type": "step2"},
    ]}
    planer = PipelinePlaner(cfg, _registry=toy_registry)

    def evaluate(trial_cfg):
        pipe = planer.generate(pipeline=trial_cfg)
        _T.calls.clear()
        pipe.functional("data")
        return {"acc": 1.0 if _T.calls[0][0] == "B" else 0.5}

    runner = planer.sweep_agent(evaluate, method="grid")
    assert runner.best("acc")["acc"] == 1.0


def test_step3_protocol(toy_registry, tmp_path):
    cfg = {"type": "preprocessor", "tune_mode": "pipeline", "pipeline": [
        {"type": "step1", "params_to_tune": {"A": {"a": {"values": [1, 5]}},
                                             "B": {"b": {"values": [2, 6]}}}},
        {"type": "step2"},
    ]}
    planer = PipelinePlaner(cfg, _registry=toy_registry)
    results = pd.DataFrame({"pipeline.0": ["A", "B"], "pipeline.1": ["C", "C"],
                            "test_acc": [0.9, 0.7]})
    rpath = tmp_path / "results.csv"
    results.to_csv(rpath, index=False)
    paths = get_step3_yaml(str(rpath), planer, conf_save_path=str(tmp_path / "cfg"),
                           top_k=2)
    assert len(paths) == 2
    from dance_tpu.config import Config
    c0 = Config.from_file(paths[0])
    assert c0.tune_mode == "params"
    assert c0.pipeline[0]["target"] == "A"
    assert "params_to_tune" in c0.pipeline[0]


def test_subset_generation(tmp_path):
    from dance_tpu.config import Config
    cfg = Config({"type": "preprocessor", "pipeline": [
        {"type": "a", "target": "A"}, {"type": "b", "target": "B"},
        {"type": "c", "target": "C"}]})
    cpath = tmp_path / "cfg.yaml"
    cfg.dump_yaml(cpath)
    paths = generate_subsets(str(cpath), str(tmp_path / "subsets"),
                             required_indexes=[2],
                             launch_script_path=str(tmp_path / "launch.sh"))
    assert len(paths) == 4  # subsets of {A,B} x required C
    assert (tmp_path / "launch.sh").exists()


def test_save_summary_data_local(tmp_path):
    runner = SweepRunner({"x": {"values": [1]}}, method="grid")
    runner.run(lambda cfg: {"acc": 0.5})
    path = tmp_path / "summary.csv"
    df = save_summary_data(runner=runner, summary_file_path=str(path))
    assert path.exists()
    assert df.iloc[0]["acc"] == 0.5


def test_sweep_resume(tmp_path):
    """Resumed sweeps skip already-recorded configs and extend the summary."""
    import dance_tpu.transforms  # noqa: F401
    from dance_tpu.pipeline import PipelinePlaner
    cfg = {"type": "preprocessor", "tune_mode": "pipeline",
           "pipeline_tuning_top_k": 2, "parameter_tuning_freq_n": 5,
           "pipeline": [{"type": "normalize",
                         "include": ["Log1P", "NormalizeTotal", "NormalizeTotalLog1P",
                                     "NormalizePlaceHolder"]}]}
    planer = PipelinePlaner(cfg)
    assert planer.pipeline_tuning_top_k == 2
    assert planer.parameter_tuning_freq_n == 5
    calls = []

    def evaluate(trial):
        calls.append(tuple(sorted(trial.items())))
        return {"acc": 0.5}

    summary = str(tmp_path / "summary.csv")
    planer.sweep_agent(evaluate, count=2, method="grid", seed=0,
                       summary_file_path=summary)
    assert len(calls) == 2
    r2 = planer.sweep_agent(evaluate, count=2, method="grid", seed=0,
                            summary_file_path=summary, resume=True)
    # two NEW configs ran; no repeats of the first two
    assert len(calls) == 4
    assert len(set(calls)) == 4
    assert len(r2.records) == 4
    import pandas as pd
    assert len(pd.read_csv(summary)) == 4
