"""Exact per-epoch FLOP accounting for the bench matrix (--flops lane).

Wraps ``jax.jit`` so every executable dispatched from Python is recorded
(one representative signature per distinct shape/static signature, plus a
call count).  ``totals()`` then traces each recorded signature with
``jax.make_jaxpr`` and walks the jaxpr with a FLOP interpreter:

- ``dot_general`` / ``conv_general_dilated`` get the standard 2·M·N·K /
  2·N·P·K·C formulas (a MAC = 2 flops);
- elementwise arithmetic counts 1 flop per output element; transcendental
  primitives (exp/log/lgamma/erf/…) additionally increment a separate
  ``transcendentals`` counter — the NB/ZINB loss families are bound by VPU
  transcendental throughput, not MXU flops, and the split makes that
  visible in the matrix;
- ``scan`` multiplies its body by the trip count (the reason this exists:
  XLA's own ``Compiled.cost_analysis`` counts loop bodies ONCE, so a
  whole-fit ``lax.scan`` epoch loop reports the same flops at any epoch
  count); ``while_loop`` bodies are counted once and flagged
  (``while_loops`` > 0 means the row is a lower bound);
- gathers/scatters/layout ops count 0 flops (they are memory traffic);
  scatter-add counts its update adds.

The lane runs the same fit at two epoch counts and differences the totals,
so per-fit fixed costs cancel exactly like the timing-delta methodology.
Used by ``benchmarks/matrix.py --flops``; the counting itself is pure
tracing, but the lane should run on the SAME backend as the timing lane
(TPU) so backend-dependent dispatch (use_bsr, dense-regime selection) counts
the program that was actually measured. ``pallas_call`` bodies are
multiplied by their grid size, so BSR-path counts include block padding —
they measure dispatched work, like XLA's own cost model.
"""

import functools
import math

import jax
import numpy as np

_REAL_JIT = jax.jit
_REGISTRY = []  # all _JitProxy instances ever created
_ENABLED = False

# elementwise primitive cost tables -----------------------------------------

_TRANSCENDENTAL = {
    "exp", "exp2", "expm1", "log", "log2", "log1p", "tanh", "sin", "cos",
    "tan", "asin", "acos", "atan", "atan2", "sinh", "cosh", "asinh", "acosh",
    "atanh", "logistic", "erf", "erfc", "erf_inv", "lgamma", "digamma",
    "polygamma", "igamma", "igammac", "pow", "sqrt", "rsqrt", "cbrt",
}

_ARITH_1 = {
    "add", "sub", "mul", "div", "neg", "abs", "max", "min", "rem", "floor",
    "ceil", "round", "sign", "and", "or", "not", "xor", "shift_left",
    "shift_right_logical", "shift_right_arithmetic", "eq", "ne", "lt", "le",
    "gt", "ge", "select_n", "is_finite", "nextafter", "copy", "real", "imag",
    "add_any", "square",
}

_REDUCE = {
    "reduce_sum", "reduce_max", "reduce_min", "reduce_prod", "reduce_and",
    "reduce_or", "argmax", "argmin", "reduce_precision", "cumsum", "cummax",
    "cummin", "cumprod", "cumlogsumexp",
}

_ZERO = {
    "broadcast_in_dim", "reshape", "transpose", "rev", "pad", "slice",
    "dynamic_slice", "dynamic_update_slice", "concatenate", "gather",
    "convert_element_type", "bitcast_convert_type", "squeeze", "iota",
    "stop_gradient", "random_bits", "random_seed", "random_wrap",
    "random_fold_in", "threefry2x32", "split", "copy_p", "sharding_constraint",
    "device_put", "sub_byte_view", "optimization_barrier", "expand_dims",
}


def _size(aval):
    return int(np.prod(aval.shape)) if aval.shape else 1


def _dot_flops(eqn):
    (lhs, rhs), out = eqn.invars, eqn.outvars[0]
    dnums = eqn.params["dimension_numbers"]
    (lc, _rc), (lb, _rb) = dnums
    k = int(np.prod([lhs.aval.shape[d] for d in lc])) or 1
    return 2.0 * _size(out.aval) * k


def _conv_flops(eqn):
    lhs, rhs = eqn.invars
    out = eqn.outvars[0]
    dn = eqn.params["dimension_numbers"]
    groups = (eqn.params.get("feature_group_count", 1)
              * eqn.params.get("batch_group_count", 1))
    kshape = rhs.aval.shape
    spatial = [kshape[d] for d in dn.rhs_spec[2:]]
    cin = kshape[dn.rhs_spec[1]]
    return 2.0 * _size(out.aval) * int(np.prod(spatial)) * cin / max(groups, 1)


class _Counter:
    def __init__(self):
        self.flops = 0.0
        self.transcendentals = 0.0
        self.while_loops = 0
        # (flops, transcendentals) of the single most expensive while BODY,
        # per iteration (unscaled by trip count): the DEC/CAR drivers run
        # their epoch loop as a traced-bound lax.while_loop, so epoch-count
        # differencing is identically zero — one body execution IS one epoch
        self.while_body = (0.0, 0.0)

    def jaxpr(self, jaxpr, mult=1.0):
        for eqn in jaxpr.eqns:
            self.eqn(eqn, mult)

    def _sub(self, obj, mult):
        jx = getattr(obj, "jaxpr", obj)
        self.jaxpr(jx, mult)

    def eqn(self, eqn, mult):
        name = eqn.primitive.name
        p = eqn.params
        if name == "scan":
            self._sub(p["jaxpr"], mult * p["length"])
        elif name == "while":
            self.while_loops += 1
            self._sub(p["cond_jaxpr"], mult)
            body = _Counter()
            body._sub(p["body_jaxpr"], 1.0)
            if body.flops > self.while_body[0]:
                self.while_body = (body.flops, body.transcendentals)
            # a while nested deeper (e.g. inside this body) may be the real
            # epoch loop — propagate the most expensive body seen anywhere
            if body.while_body[0] > self.while_body[0]:
                self.while_body = body.while_body
            self.flops += mult * body.flops
            self.transcendentals += mult * body.transcendentals
            self.while_loops += body.while_loops
        elif name == "cond":
            branches = p["branches"]
            # count the most expensive branch (upper bound for two-way conds)
            subs = []
            for br in branches:
                c = _Counter()
                c._sub(br, 1.0)
                subs.append(c)
            best = max(subs, key=lambda c: c.flops)
            self.flops += mult * best.flops
            self.transcendentals += mult * best.transcendentals
            self.while_loops += best.while_loops
            # an epoch while_loop hidden inside a cond branch (DEC drivers
            # gate the refresh epoch behind lax.cond) must stay visible to
            # the traced-bound fallback — merge the priciest body from ANY
            # branch, not just the flop-max one
            for c in subs:
                if c.while_body[0] > self.while_body[0]:
                    self.while_body = c.while_body
        elif name == "pallas_call":
            # kernel body executes once per grid tile
            gm = p.get("grid_mapping")
            grid = getattr(gm, "grid", ()) if gm is not None else ()
            tiles = float(np.prod([g for g in grid if isinstance(g, int)]) or 1)
            self._sub(p["jaxpr"], mult * tiles)
        elif name in ("pjit", "closed_call", "core_call", "remat_call",
                      "checkpoint", "custom_jvp_call", "custom_vjp_call",
                      "custom_vjp_call_jaxpr", "custom_jvp_call_jaxpr"):
            sub = (p.get("jaxpr") or p.get("call_jaxpr")
                   or p.get("fun_jaxpr"))
            if sub is not None:
                self._sub(sub, mult)
        elif "jaxpr" in p:
            self._sub(p["jaxpr"], mult)
        elif name == "dot_general":
            self.flops += mult * _dot_flops(eqn)
        elif name == "conv_general_dilated":
            self.flops += mult * _conv_flops(eqn)
        elif name in _TRANSCENDENTAL:
            n = _size(eqn.outvars[0].aval)
            self.flops += mult * n
            self.transcendentals += mult * n
        elif name in _ARITH_1:
            self.flops += mult * _size(eqn.outvars[0].aval)
        elif name == "integer_pow":
            self.flops += mult * 2 * _size(eqn.outvars[0].aval)
        elif name == "clamp":
            self.flops += mult * 2 * _size(eqn.outvars[0].aval)
        elif name in _REDUCE:
            self.flops += mult * _size(eqn.invars[0].aval)
        elif name in ("scatter-add", "scatter_add", "scatter-mul",
                      "scatter_mul", "scatter_max", "scatter-max",
                      "scatter_min", "scatter-min", "segment_sum"):
            upd = eqn.invars[-1].aval
            self.flops += mult * _size(upd)
        elif name in ("scatter", "sort", "top_k"):
            n = _size(eqn.invars[0].aval)
            if name == "sort":
                self.flops += mult * n * max(math.log2(max(n, 2)), 1.0)
            elif name == "top_k":
                k = eqn.params.get("k", 1)
                self.flops += mult * n * max(math.log2(max(k, 2)), 1.0)
        elif name in _ZERO:
            pass
        # unlisted primitives count 0 — curated lists cover the hot paths


def _leaf_key(leaf):
    if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
        return ("a", tuple(leaf.shape), str(leaf.dtype))
    if isinstance(leaf, (int, float, bool, str, bytes, type(None))):
        return ("s", leaf)
    return ("o", id(leaf))


def _has_tracer(leaves):
    return any(isinstance(x, jax.core.Tracer) for x in leaves)


class _JitProxy:
    """Callable stand-in for a jitted function that counts dispatches."""

    def __init__(self, fn, jit_args, jit_kwargs):
        self._fn = _REAL_JIT(fn, *jit_args, **jit_kwargs)
        self._orig = fn
        self._name = getattr(fn, "__qualname__", repr(fn))
        self._sigs = {}  # key -> [count, (args, kwargs)]
        _REGISTRY.append(self)

    def __call__(self, *args, **kwargs):
        leaves = jax.tree_util.tree_leaves((args, kwargs))
        if _ENABLED and not _has_tracer(leaves):
            treedef = jax.tree_util.tree_structure((args, kwargs))
            key = (str(treedef), tuple(_leaf_key(x) for x in leaves))
            rec = self._sigs.get(key)
            if rec is None:
                self._sigs[key] = [1, (args, kwargs)]
            else:
                rec[0] += 1
        return self._fn(*args, **kwargs)

    # jitted functions are used as methods (static ``self`` first arg)
    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        return functools.partial(self.__call__, obj)

    def __getattr__(self, name):  # lower/trace/clear_cache passthrough
        return getattr(self._fn, name)

    def _cost(self):
        """Trace + jaxpr-walk each recorded signature, weighted by count."""
        out = {"flops": 0.0, "transcendentals": 0.0, "calls": 0,
               "while_loops": 0, "while_body": (0.0, 0.0)}
        for count, (args, kwargs) in self._sigs.values():
            # close over non-array leaves (statics stay concrete), trace the
            # UNJITTED original over the array leaves only
            leaves, treedef = jax.tree_util.tree_flatten((args, kwargs))
            dyn_idx = [i for i, x in enumerate(leaves)
                       if hasattr(x, "shape") and hasattr(x, "dtype")]
            dyn = [leaves[i] for i in dyn_idx]

            def call(*dyn_args):
                ls = list(leaves)
                for i, v in zip(dyn_idx, dyn_args):
                    ls[i] = v
                a, kw = jax.tree_util.tree_unflatten(treedef, ls)
                return self._orig(*a, **kw)

            try:
                closed = jax.make_jaxpr(call)(*dyn)
            except Exception as e:  # non-traceable corner: report, skip
                print(f"   [flopcount] {self._name}: {type(e).__name__}: {e}",
                      flush=True)
                continue
            c = _Counter()
            c.jaxpr(closed.jaxpr)
            out["flops"] += count * c.flops
            out["transcendentals"] += count * c.transcendentals
            out["while_loops"] += c.while_loops
            out["calls"] += count
            if c.while_body[0] > out["while_body"][0]:
                out["while_body"] = c.while_body
        return out


def _jit_wrapper(fn=None, *args, **kwargs):
    if fn is None:  # jax.jit(static_argnames=...) partial form
        return functools.partial(_jit_wrapper, *args, **kwargs)
    return _JitProxy(fn, args, kwargs)


def install():
    """Patch jax.jit (call BEFORE importing dance_tpu modules)."""
    global _ENABLED
    _ENABLED = True
    jax.jit = _jit_wrapper


def reset():
    for p in _REGISTRY:
        p._sigs.clear()


def totals():
    """Aggregate counters since last reset."""
    agg = {"flops": 0.0, "transcendentals": 0.0, "calls": 0, "while_loops": 0,
           "while_body": (0.0, 0.0)}
    for p in _REGISTRY:
        if not p._sigs:
            continue
        c = p._cost()
        for k in agg:
            if k == "while_body":
                if c[k][0] > agg[k][0]:
                    agg[k] = c[k]
            else:
                agg[k] += c[k]
    return agg
