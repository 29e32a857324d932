"""Quickstart: vectorized functional API at batch 4096.

Run: python examples/quickstart_functional.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from spintorque_tpu.envs import SpinTorqueEnv, SpinTorqueEnvConfig

B = 4096
env = SpinTorqueEnv(batch_size=B, config=SpinTorqueEnvConfig())
state, obs = env.reset(jax.random.PRNGKey(0))
print(f"reset: obs {obs.shape} on {jax.default_backend()}")

key = jax.random.PRNGKey(1)
actions = jnp.stack(
    [
        jax.random.uniform(key, (B,), minval=-2e6, maxval=2e6),
        jax.random.uniform(jax.random.fold_in(key, 1), (B,), minval=1e-10, maxval=2e-9),
    ],
    axis=-1,
)
state, ts = env.step(state, actions)
jax.block_until_ready(ts.reward)
t0 = time.perf_counter()
for _ in range(10):
    state, ts = env.step(state, actions)
jax.block_until_ready(ts.reward)
dt = (time.perf_counter() - t0) / 10
print(f"step: {dt*1e3:.2f} ms for {B} envs -> {B/dt:,.0f} env-steps/s")
print(f"mean reward {float(ts.reward.mean()):.4f}, "
      f"success rate {float(ts.info['is_success'].mean()):.4f}")
