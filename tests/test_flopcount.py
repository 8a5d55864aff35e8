"""Unit tests for the bench-matrix FLOP interpreter (benchmarks/flopcount.py).

Pins the properties the ``--flops`` lane depends on: dot_general gets the
2·M·N·K formula, ``lax.scan`` bodies multiply by trip count (the reason the
interpreter exists — XLA's own ``Compiled.cost_analysis`` counts loop bodies
once), transcendentals are tallied separately, and the jit interceptor
records dispatches including the static-``self`` method pattern.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from benchmarks import flopcount as fc


def _count(fn, *args):
    closed = jax.make_jaxpr(fn)(*args)
    c = fc._Counter()
    c.jaxpr(closed.jaxpr)
    return c


def test_dot_general_flops():
    a = jnp.ones((32, 64))
    b = jnp.ones((64, 16))
    c = _count(lambda a, b: a @ b, a, b)
    assert c.flops == pytest.approx(2 * 32 * 64 * 16, rel=0.01)


def test_scan_multiplies_by_length():
    a = jnp.ones((32, 32))

    def one(a):
        return a @ a

    def scanned(a):
        def body(carry, _):
            return carry @ a, None
        out, _ = jax.lax.scan(body, a, None, length=7)
        return out

    c1, c7 = _count(one, a), _count(scanned, a)
    assert c7.flops == pytest.approx(7 * c1.flops, rel=0.01)


def test_transcendentals_counted_separately():
    x = jnp.ones((100,))
    c = _count(lambda x: jax.lax.lgamma(x) + jnp.exp(x), x)
    assert c.transcendentals == 200
    # the add contributes flops beyond the transcendental tally
    assert c.flops >= 300


def test_grad_counts_backward_work():
    w = jnp.ones((64, 64))
    x = jnp.ones((8, 64))

    fwd = _count(lambda w: (x @ w).sum(), w)
    both = _count(jax.grad(lambda w: (x @ w).sum()), w)
    # dW = xᵀ·g is another 2·8·64·64; backward not free, not triple either
    assert both.flops > fwd.flops


def test_jit_interceptor_records_method_calls():
    registry_before = len(fc._REGISTRY)

    class M:
        @partial(fc._jit_wrapper, static_argnames=("self",))
        def step(self, x):
            return (x @ x).sum()

    m = M()
    fc._ENABLED = True
    try:
        out = m.step(jnp.ones((16, 16)))
    finally:
        fc._ENABLED = False
    assert np.isfinite(float(out))
    proxy = fc._REGISTRY[registry_before]
    assert sum(cnt for cnt, _ in proxy._sigs.values()) == 1
    cost = proxy._cost()
    assert cost["flops"] == pytest.approx(2 * 16 * 16 * 16 + 16 * 16, rel=0.1)


def test_while_loop_flagged_as_lower_bound():
    def f(x):
        return jax.lax.while_loop(lambda v: v[0] < 10, lambda v: v * 1.5,
                                  x)

    c = _count(f, jnp.ones((4,)))
    assert c.while_loops >= 1
