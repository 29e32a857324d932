"""Shared measurement discipline for the TPU micro-bench scripts.

ONE copy of the steady-state timer (the warmup count and the
block_until_ready discipline have both been measurement-trap fixes in this
repo's history - docs/PERFORMANCE.md - so they must not fork per script)
and of the canonical bench device parameters.
"""

import time

import jax
import jax.numpy as jnp

from spintorque_tpu.physics import LLGSParams

BENCH_PARAMS = LLGSParams(
    saturation_magnetization=800e3,
    damping=0.01,
    uniaxial_anisotropy=1.2e6,
    volume=1e-23,
    polarization=0.7,
    easy_axis=jnp.array([0.0, 0.0, 1.0], jnp.float32),
).astype(jnp.float32)


def timed(fn, iters=20, warmup=12):
    """Steady-state wall time per call (s): the first ~10 executions of a
    fresh executable run ~3.5x slower on tunneled TPU runtimes, so warm
    past them; one device sync per timed block."""
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def setup_pulse_inputs(B=4096, seed=0, span_lo=1e-12, span_hi=5e-9,
                       cur_lo=-2e6, cur_hi=0.0):
    """Canonical random pulse-batch inputs shared by the kernel sweeps."""
    key = jax.random.PRNGKey(seed)
    m = jax.random.normal(key, (B, 3), jnp.float32)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    spans = jax.random.uniform(
        jax.random.fold_in(key, 1), (B,), jnp.float32, span_lo, span_hi
    )
    cur = jax.random.uniform(
        jax.random.fold_in(key, 2), (B,), jnp.float32, cur_lo, cur_hi
    )
    return (m[:, 0], m[:, 1], m[:, 2]), spans, cur
