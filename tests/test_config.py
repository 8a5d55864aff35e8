import pytest

from dance_tpu.config import Config


def test_config_basic(tmp_path):
    c = Config({"a": 1, "b": {"c": [1, 2], "d": "x"}})
    assert c.a == 1
    assert c.b.c == [1, 2]
    assert c["b"]["d"] == "x"
    assert c.to_dict() == {"a": 1, "b": {"c": [1, 2], "d": "x"}}


def test_config_io(tmp_path):
    c = Config({"a": 1, "b": {"c": 2}})
    yml = tmp_path / "c.yaml"
    jsn = tmp_path / "c.json"
    c.dump_yaml(yml)
    c.dump_json(jsn)
    assert Config.from_file(yml).to_dict() == c.to_dict()
    assert Config.from_file(jsn).to_dict() == c.to_dict()
    with pytest.warns(UserWarning):
        c.dump_yaml(yml)  # exists -> warn
    with pytest.raises(FileExistsError):
        c.dump_yaml(yml, exist_handle="error")


def test_config_merge():
    c = Config({"a": 1, "b": {"c": 2, "d": 3}})
    m = c.merge({"b": {"c": 9}, "e": 5})
    assert m.to_dict() == {"a": 1, "b": {"c": 9, "d": 3}, "e": 5}
    assert c.b.c == 2  # original untouched
