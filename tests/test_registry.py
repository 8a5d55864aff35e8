"""Registry semantics (parity model: tests/test_registry.py in the reference)."""

import pytest

from dance_tpu.registry import DotDict, Registry, register, resolve_from_registry


def test_dotdict_basic():
    d = DotDict({"a": {"b": 1}})
    assert d.a.b == d.get("a.b") == d["a"]["b"] == 1
    assert d.get("") is d
    assert d.get("a.c") is None
    assert d.get("a.c", default=3) == 3
    with pytest.raises(KeyError):
        d.get("a.c", missed_ok=False)


def test_dotdict_set():
    d = DotDict()
    d.set("x.y.z", 5)
    assert d.x.y.z == 5
    with pytest.raises(KeyError):
        d.set("x.y.z", 7, exist_ok=False)
    d.set("x.y.z", 7)
    assert d.x.y.z == 7
    with pytest.raises(KeyError):
        d.set("x.y.z.deeper", 1)  # z is a leaf


def test_dotdict_create_on_miss():
    d = DotDict()
    node = d.get("a.b", create_on_miss=True)
    node["c"] = 1
    assert d.a.b.c == 1
    with pytest.raises(ValueError):
        d.get("a", missed_ok=False, create_on_miss=True)


def test_dotdict_no_dots_in_keys():
    with pytest.raises(ValueError):
        DotDict({"a.b": 1})


def test_registry_children():
    r = Registry({"a": 1, "b": {"c": 2}})
    assert sorted(r.children()) == ["a", "b", "b.c"]
    assert list(r.children("b")) == ["b.c"]
    assert list(r.children(leaf_node=False)) == ["b"]
    assert sorted(r.children(non_leaf_node=False)) == ["a", "b.c"]
    assert sorted(r.children(non_leaf_node=False, return_val=True)) == [("a", 1), ("b.c", 2)]
    with pytest.raises(KeyError):
        list(r.children("a"))  # leaf node
    with pytest.raises(KeyError):
        list(r.children("zzz"))


def test_register_decorator():
    r = Registry()

    @register("scope", "sub", _registry=r)
    def myfunc():
        return 42

    assert r.get("scope.sub.myfunc") is myfunc
    assert resolve_from_registry("myfunc", "scope.sub", registry=r) is myfunc
    assert resolve_from_registry("myfunc", "_registry_.scope.sub", registry=r) is myfunc

    @register("scope", "sub", name="alias", _registry=r)
    def other():
        pass

    assert r.get("scope.sub.alias") is other

    with pytest.raises(KeyError):
        @register("scope", "sub", name="myfunc", _registry=r)
        def clash():
            pass
