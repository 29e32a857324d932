"""Isolate the cost of the duration-bucketing argsort on the step critical
path: time the pulse call with (a) the real descending-n sort, (b) an
identity permutation (no bucketing - masked loop runs to the global max),
and (c) sort but uniform spans (sort is trivial, bucketing moot).

(a) vs (c) bounds the argsort+gather+within-tile-spread cost at matched
mean substep count. (A third variant - identity permutation via monkey-
patched argsort - is NOT run: lowering a scatter whose indices constant-
fold to iota trips an XLA TPU fusion-pass CHECK (scatter_emitter.cc
operand_indices assert). The product path never hits it because the
permutation is always a traced argsort output.)

Run: timeout 900 python scripts/bench_sort_overhead.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from spintorque_tpu.ops import pallas_integrator as pi
from spintorque_tpu.physics import IntegratorConfig, LLGSParams

B = 4096
PARAMS = LLGSParams(
    saturation_magnetization=800e3,
    damping=0.01,
    uniaxial_anisotropy=1.2e6,
    volume=1e-23,
    polarization=0.7,
    easy_axis=jnp.array([0.0, 0.0, 1.0], jnp.float32),
).astype(jnp.float32)


def timed(fn, iters=20, warmup=12):
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    m = jax.random.normal(key, (B, 3), jnp.float32)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    m0 = (m[:, 0], m[:, 1], m[:, 2])
    spans_rand = jax.random.uniform(
        jax.random.fold_in(key, 1), (B,), jnp.float32, 1e-12, 5e-9
    )
    spans_uni = jnp.full((B,), 2.5e-9, jnp.float32)
    cur = jnp.full((B,), -1e6, jnp.float32)
    cfg = IntegratorConfig(method="rk4", max_substeps=5101, thermal=True,
                           noise_mode="reference", rk4_noise="per_substep")
    k = jax.random.PRNGKey(7)

    print(f"backend={jax.default_backend()}", flush=True)

    t_sorted = timed(lambda: pi.integrate_pulse_pallas(
        m0, spans_rand, cur, PARAMS, cfg, key=k))
    print(f"(a) random spans, real sort:      {t_sorted * 1e3:7.3f} ms", flush=True)

    t_uni = timed(lambda: pi.integrate_pulse_pallas(
        m0, spans_uni, cur, PARAMS, cfg, key=k))
    print(f"(c) uniform spans (2.5 ns), sort: {t_uni * 1e3:7.3f} ms", flush=True)

    print(
        f"(a)-(c) = {(t_sorted - t_uni) * 1e3:6.3f} ms = argsort + gathers "
        f"+ within-tile duration spread at matched mean substeps",
        flush=True,
    )


if __name__ == "__main__":
    main()
