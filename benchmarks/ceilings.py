"""Measured device ceilings for the BENCH_MATRIX roofline notes.

Measures, on the attached chip, the four rates every bound analysis in
BENCH_NOTES.md divides by:

- MXU matmul TFLOP/s at bf16 and f32 (8192^2 square matmuls),
- VPU transcendental Teval/s for exp and lgamma (the NB/ZINB loss families),
- effective HBM GB/s for a fused elementwise stream (read+write of a
  512 MB array).

All loops are dependent chains (outputs feed inputs) because the axon relay
acknowledges small dispatch streams optimistically (BENCH_NOTES.md
methodology); rates are reported from a host-synced delta over the chain.

Run: PYTHONPATH=/root/repo python benchmarks/ceilings.py

Measured 2026-08-19 on the attached v5e chip (warmed chains, min of 3):
matmul bf16 173.3 TFLOP/s (88% of the 197 nominal peak), f32-DEFAULT
153.5 TFLOP/s (single-pass bf16), HBM stream 575 GB/s (70% of 819 spec),
exp 0.065 Teval/s, lgamma 0.017 Teval/s. These are the denominators for
the BENCH_NOTES round-5 bound analyses.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _chain(fn, x, n, reps=3):
    """Dependent chain of n calls; returns best wall seconds (host-synced).

    Warmup matters: `block_until_ready` is optimistic on the relay, so a
    single compile call does NOT guarantee the server-side compile drained
    before the timed region (first measurement of this file read the bf16
    matmul at 0.6 TFLOP/s — the compile was inside the clock; warmed it
    reads 173 TFLOP/s). Warm with a short chain ended by a host read, then
    take the min over reps.
    """
    y = x
    for _ in range(8):
        y = fn(y)
    float(jnp.sum(y[..., :1]))  # real barrier: host read
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = x
        for _ in range(n):
            y = fn(y)
        float(jnp.sum(y[..., :1]))
        best = min(best, time.perf_counter() - t0)
    return best


def matmul_rate(dtype, m=8192):
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (m, m)), dtype)

    @jax.jit
    def f(y):
        return jnp.dot(y, y) * (1.0 / m)  # rescale keeps values bounded

    n = 64
    s = _chain(f, x, n)
    return 2 * m**3 * n / s / 1e12


def transc_rate(op, n_elem=1 << 26):
    x = jnp.asarray(np.random.default_rng(0).uniform(0.5, 2.0, (n_elem,)),
                    jnp.float32)

    @jax.jit
    def f(y):
        # keep the value in a bounded range so the chain never overflows
        return op(y) * 0.3 + 1.0

    n = 64
    s = _chain(f, x, n)
    return n_elem * n / s / 1e12


def zinb_step_rate(batch=256, genes=2000):
    """Floor for one ZINB-AE minibatch step's loss math: value_and_grad of
    the full zinb_nll over a (batch, genes) block, as a dependent chain.

    This is the irreducible per-step cost of the DEC clustering family's
    loss (lgamma fwd + digamma bwd + exp/log/pow chains), measured with the
    model matmuls stripped out — the epoch floor for scDeepCluster-like
    models is n_steps x this.
    """
    from dance_tpu.utils.loss import zinb_nll
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.poisson(2.0, (batch, genes)), jnp.float32)
    mean = jnp.asarray(rng.uniform(0.5, 4.0, (batch, genes)), jnp.float32)
    disp = jnp.asarray(rng.uniform(0.5, 2.0, (batch, genes)), jnp.float32)
    pi = jnp.asarray(rng.uniform(0.05, 0.5, (batch, genes)), jnp.float32)

    @jax.jit
    def f(theta):
        m, d, p = theta
        loss, (gm, gd, gp) = jax.value_and_grad(
            lambda t: zinb_nll(x, t[0], t[1], t[2]))((m, d, p))
        # dependent chain: fold the grads back into the operands at a scale
        # XLA cannot fold away (0.0*g would be DCE-able), small enough to
        # keep the operands in range across 256 links
        s = 1e-12
        return (m + s * gm + s * loss, d + s * gd, p + s * gp)

    theta = (mean, disp, pi)
    for _ in range(8):
        theta = f(theta)
    float(jnp.sum(theta[0][0, :1]))
    n = 256
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        t = theta
        for _ in range(n):
            t = f(t)
        float(jnp.sum(t[0][0, :1]))
        best = min(best, time.perf_counter() - t0)
    return best / n  # seconds per step


def hbm_rate(n_elem=1 << 27):
    x = jnp.asarray(np.zeros((n_elem,)), jnp.float32)

    @jax.jit
    def f(y):
        return y + 1.0  # one read + one write per element, nothing to fuse

    n = 64
    s = _chain(f, x, n)
    return 8 * n_elem * n / s / 1e9  # bytes moved (4B read + 4B write)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    print(f"matmul bf16: {matmul_rate(jnp.bfloat16):.1f} TFLOP/s", flush=True)
    print(f"matmul f32 : {matmul_rate(jnp.float32):.1f} TFLOP/s", flush=True)
    print(f"exp        : {transc_rate(jnp.exp):.3f} Teval/s", flush=True)
    print(f"lgamma     : {transc_rate(jax.lax.lgamma):.3f} Teval/s", flush=True)
    print(f"digamma    : {transc_rate(jax.lax.digamma):.3f} Teval/s", flush=True)
    zs = zinb_step_rate()
    print(f"zinb step  : {zs*1e3:.3f} ms per 256x2000 value_and_grad", flush=True)
    print(f"HBM stream : {hbm_rate():.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
