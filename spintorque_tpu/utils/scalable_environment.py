"""Managed vectorized-environment execution with autoscaling.

Counterpart of the reference's utils/scalable_environment.py (495 LoC,
``ScalableEnvironmentManager`` - import-broken in the reference, SURVEY.md
section 2.5). The reference manages a POOL of single envs stepped by thread
workers; here one vectorized env IS the pool, and the manager's real job is
picking/adjusting the batch size (via utils/scaling.AutoScaler), running
steady-state rollouts, and reporting throughput.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from .scaling import AutoScaler

__all__ = ["ScalableEnvironmentManager"]


class ScalableEnvironmentManager:
    """Run batched episodes at an autoscaled batch size.

    env_factory(batch_size) must return a vectorized env with the functional
    API (reset(key) -> (state, obs); step(state, action) -> (state, ts)).
    """

    def __init__(
        self,
        env_factory: Callable[[int], Any],
        initial_batch: int = 1024,
        min_batch: int = 128,
        max_batch: int = 65536,
        autoscale: bool = True,
    ):
        self.env_factory = env_factory
        self.autoscaler = AutoScaler(
            initial_batch=initial_batch, min_batch=min_batch, max_batch=max_batch,
            cooldown_s=0.0,
        )
        self.autoscale = autoscale
        self._envs: Dict[int, Any] = {}
        self._policy_cache: Dict[int, Any] = {}
        self.history: List[Dict[str, float]] = []

    def _env(self, batch: int) -> Any:
        if batch not in self._envs:
            self._envs[batch] = self.env_factory(batch)
        return self._envs[batch]

    def run_batch_steps(
        self,
        n_steps: int,
        policy: Optional[Callable] = None,
        seed: int = 0,
        batch: Optional[int] = None,
    ) -> Dict[str, float]:
        """One measured chunk of ``n_steps`` vectorized env steps."""
        import jax

        batch = batch or self.autoscaler.batch
        env = self._env(batch)
        if policy is None:
            from ..parallel.rollout import random_policy

            policy = self._policy_cache.setdefault(batch, random_policy(env))
        key = jax.random.PRNGKey(seed)
        state, obs = env.reset(key)

        # warm-up step (compile) outside the measurement
        key, k = jax.random.split(key)
        state, ts = env.step(state, policy(None, obs, k))
        jax.block_until_ready(ts.reward)

        t0 = time.perf_counter()
        total_reward = 0.0
        for _ in range(n_steps):
            key, k = jax.random.split(key)
            state, ts = env.step(state, policy(None, ts.obs, k))
        jax.block_until_ready(ts.reward)
        elapsed = time.perf_counter() - t0

        self.autoscaler.record(batch, n_steps, elapsed)
        if self.autoscale:
            self.autoscaler.recommend()
        chunk = {
            "batch": batch,
            "steps": n_steps,
            "elapsed_s": elapsed,
            "env_steps_per_s": batch * n_steps / max(elapsed, 1e-9),
            "mean_reward": float(np.mean(np.asarray(ts.reward))),
        }
        self.history.append(chunk)
        return chunk

    def run_until_stable(
        self, chunks: int = 4, n_steps: int = 16, seed: int = 0
    ) -> Dict[str, Any]:
        """Repeatedly run/measure/rescale; returns the best configuration."""
        for c in range(chunks):
            self.run_batch_steps(n_steps, seed=seed + c)
        stats = self.autoscaler.get_statistics()
        by_batch = stats["throughput_by_batch"]
        best_batch = max(by_batch, key=by_batch.get)
        return {
            "best_batch": int(best_batch),
            "best_env_steps_per_s": by_batch[best_batch],
            "measured": by_batch,
            "chunks": list(self.history),
        }

    def get_statistics(self) -> Dict[str, Any]:
        return {
            "autoscaler": self.autoscaler.get_statistics(),
            "n_envs_instantiated": len(self._envs),
            "chunks_run": len(self.history),
        }
