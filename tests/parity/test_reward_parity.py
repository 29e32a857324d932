"""Composite-reward normalization parity vs the reference implementation.

Feeds the same component-value sequence through both engines and compares
per-step totals (running normalization carries state: ours in a RunningStat
pytree, the reference in Python history lists).
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"
HAVE_REFERENCE = os.path.isdir(os.path.join(REFERENCE_PATH, "spin_torque_gym"))

pytestmark = [
    pytest.mark.parity,
    pytest.mark.skipif(not HAVE_REFERENCE, reason="reference repo not available"),
]

if HAVE_REFERENCE:
    sys.path.insert(0, REFERENCE_PATH)

from spintorque_tpu.rewards import CompositeReward, RewardContext


def _ctx(value: float) -> RewardContext:
    arr = jnp.asarray([value], jnp.float64)
    zeros = jnp.zeros_like(arr)
    return RewardContext(
        is_success=jnp.asarray([False]),
        step_energy=zeros,
        alignment=arr,
        alignment_improvement=zeros,
        magnetization_norm=jnp.ones_like(arr),
        step_count=jnp.ones((1,), jnp.int32),
        total_energy=zeros,
        action_current=zeros,
        action_duration=zeros,
    )


SEQUENCE = [0.3, -0.5, 1.2, 0.8, -0.1, 0.0, 2.0, -1.5, 0.4, 0.9]


@pytest.mark.parametrize("mode", ["running_mean", "running_std", "unit_range"])
def test_running_normalization_parity(mode):
    from spin_torque_gym.rewards.composite_reward import (
        CompositeReward as RefComposite,
    )

    ref = RefComposite(
        {"a": {"weight": 2.0,
               "function": lambda obs, action, next_obs, info: info["v"],
               "normalize": mode}}
    )
    ours = CompositeReward(
        {"a": {"weight": 2.0,
               "function": lambda ctx: ctx.alignment,
               "normalize": mode}}
    )
    stats = ours.init_stats(1, jnp.float64)
    for v in SEQUENCE:
        r_ref = ref.compute(None, None, None, {"v": v})
        r_ours, _, stats = ours.compute(_ctx(v), stats)
        np.testing.assert_allclose(
            float(np.asarray(r_ours)[0]), r_ref, rtol=1e-9, atol=1e-12,
        )


def test_dict_normalization_and_clip_parity():
    from spin_torque_gym.rewards.composite_reward import (
        CompositeReward as RefComposite,
    )

    cfg_norm = {"mean": 0.5, "std": 2.0}
    clip = (-0.4, 0.4)
    ref = RefComposite(
        {"a": {"weight": -1.5,
               "function": lambda obs, action, next_obs, info: info["v"],
               "normalize": dict(cfg_norm), "clip": clip}}
    )
    ours = CompositeReward(
        {"a": {"weight": -1.5, "function": lambda ctx: ctx.alignment,
               "normalize": dict(cfg_norm), "clip": clip}}
    )
    for v in SEQUENCE:
        r_ref = ref.compute(None, None, None, {"v": v})
        r_ours, _, _ = ours.compute(_ctx(v))
        np.testing.assert_allclose(
            float(np.asarray(r_ours)[0]), r_ref, rtol=1e-9
        )


def test_canned_config_weights_match():
    import spin_torque_gym.rewards.composite_reward as ref_mod

    from spintorque_tpu.rewards import (
        DEFAULT_REWARD_CONFIG,
        ENERGY_OPTIMIZED_CONFIG,
        SPEED_OPTIMIZED_CONFIG,
    )

    for ours_cfg, ref_cfg in [
        (DEFAULT_REWARD_CONFIG, ref_mod.DEFAULT_REWARD_CONFIG),
        (ENERGY_OPTIMIZED_CONFIG, ref_mod.ENERGY_OPTIMIZED_CONFIG),
        (SPEED_OPTIMIZED_CONFIG, ref_mod.SPEED_OPTIMIZED_CONFIG),
    ]:
        assert set(ours_cfg) == set(ref_cfg)
        for name in ours_cfg:
            assert ours_cfg[name]["weight"] == ref_cfg[name]["weight"]
