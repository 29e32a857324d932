"""Policy/value networks for native TPU training.

The reference delegates RL to stable-baselines3 (cli.py:89-107, torch on
host). Here training is TPU-native: a flax actor-critic whose parameters
carry PartitionSpec annotations so hidden layers can be tensor-parallel
sharded over the mesh 'model' axis while the env batch is data-parallel
over 'data'. For the small default MLP, TP is overkill - the annotations
exist so the same train step scales to wide policies unchanged.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


class ActorCritic(nn.Module):
    """MLP actor-critic.

    Continuous mode: outputs (mean, log_std) of a tanh-squashed Gaussian in
    [-1, 1]^act_dim plus the value estimate.
    Discrete mode: outputs logits over num_actions plus the value.
    """

    action_dim: int
    discrete: bool = False
    hidden_sizes: Sequence[int] = (256, 256)
    activation: str = "tanh"
    # MXU compute dtype for the Dense layers. None (default) preserves
    # flax's promotion semantics: inputs keep their dtype (float64 on the
    # x64 analysis/test backend stays float64 end-to-end). 'bfloat16'
    # runs the matmuls at the MXU's native rate with float32 params and
    # optimizer state (flax param_dtype default), and the heads cast back
    # to float32 before any probability/loss math, so log-prob ratios and
    # GAE stay in full precision (bench: scripts/bench_ppo.py
    # --compute-dtype bfloat16; learning gate: examples/train_ppo.py).
    compute_dtype: str | None = None
    # One trunk feeding both heads instead of separate actor/critic MLPs:
    # halves the trunk matmul work in rollout AND update (the PPO update
    # is the train step's dominant non-env cost). Standard PPO practice;
    # default False preserves the recorded artifacts' architecture.
    shared_trunk: bool = False

    @nn.compact
    def __call__(self, obs):
        act = {"tanh": nn.tanh, "relu": nn.relu, "gelu": nn.gelu}[self.activation]
        cdtype = None if self.compute_dtype is None else jnp.dtype(self.compute_dtype)

        def _out(x):
            """Head output dtype: full precision under a reduced compute
            dtype, untouched promotion semantics otherwise."""
            return x if cdtype is None else x.astype(jnp.float32)

        def trunk(name):
            x = obs if cdtype is None else obs.astype(cdtype)
            for i, h in enumerate(self.hidden_sizes):
                # TP layout: even layers shard the output dim, odd layers the
                # input dim, so activations alternate sharded/replicated and
                # XLA inserts one all-reduce per pair (Megatron layout).
                kernel_spec = P(None, "model") if i % 2 == 0 else P("model", None)
                x = nn.Dense(
                    h,
                    name=f"{name}_dense_{i}",
                    dtype=cdtype,
                    kernel_init=nn.with_partitioning(
                        nn.initializers.orthogonal(jnp.sqrt(2.0)), kernel_spec
                    ),
                    bias_init=nn.with_partitioning(
                        nn.initializers.zeros_init(),
                        P("model") if i % 2 == 0 else P(),
                    ),
                )(x)
                x = act(x)
            return x

        if self.shared_trunk:
            pi = v = trunk("shared")
        else:
            pi = trunk("actor")
            v = trunk("critic")
        if self.discrete:
            logits = nn.Dense(
                self.action_dim,
                name="actor_logits",
                dtype=cdtype,
                kernel_init=nn.with_partitioning(
                    nn.initializers.orthogonal(0.01), P(None, None)
                ),
            )(pi)
            head: Tuple = (_out(logits),)
        else:
            mean = nn.Dense(
                self.action_dim,
                name="actor_mean",
                dtype=cdtype,
                kernel_init=nn.with_partitioning(
                    nn.initializers.orthogonal(0.01), P(None, None)
                ),
            )(pi)
            # Explicit float32: the initializer's default dtype follows
            # jnp.float_, which is float64 under x64 (the test backend).
            log_std = self.param(
                "log_std", nn.initializers.zeros_init(), (self.action_dim,),
                jnp.float32,
            )
            head = (_out(mean), log_std)

        value = nn.Dense(
            1,
            name="critic_value",
            dtype=cdtype,
            kernel_init=nn.with_partitioning(
                nn.initializers.orthogonal(1.0), P(None, None)
            ),
        )(v)
        return head + (_out(value.squeeze(-1)),)


def continuous_action_transform(raw, max_current, max_duration):
    """Map tanh-squashed [-1, 1]^2 network output to env action space
    [(-J_max, J_max), (1e-12, dur_max)]."""
    current = raw[..., 0] * max_current
    duration = (raw[..., 1] + 1.0) * 0.5 * (max_duration - 1e-12) + 1e-12
    return jnp.stack([current, duration], axis=-1)


def gaussian_log_prob(mean, log_std, raw_action):
    """Diagonal Gaussian log-prob with tanh correction."""
    std = jnp.exp(log_std)
    pre_tanh = jnp.arctanh(jnp.clip(raw_action, -1 + 1e-6, 1 - 1e-6))
    logp = -0.5 * (((pre_tanh - mean) / std) ** 2 + 2 * log_std + jnp.log(2 * jnp.pi))
    logp = logp.sum(-1)
    # tanh change of variables
    logp -= jnp.log(1 - raw_action**2 + 1e-6).sum(-1)
    return logp


def sample_continuous(key, mean, log_std):
    std = jnp.exp(log_std)
    noise = jax.random.normal(key, mean.shape, mean.dtype)
    pre_tanh = mean + std * noise
    raw = jnp.tanh(pre_tanh)
    return raw, gaussian_log_prob(mean, log_std, raw)
