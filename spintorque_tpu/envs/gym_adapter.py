"""Gymnasium adapters over the functional vectorized environments.

The functional API (envs/spin_torque.py) is the fast path: jitted, batched,
TPU-resident. These adapters provide the reference's Gymnasium surface
(spin_torque_env.py:26-745) for compatibility with stable-baselines3 and
other host-loop RL libraries:

  * GymSpinTorqueEnv   - single-env gymnasium.Env (B=1 under the hood)
  * VectorSpinTorqueEnv - gymnasium.vector.VectorEnv-style batched adapter

Host<->device transfer happens once per step (obs out, action in); for
maximum throughput use the functional API or parallel/rollout.py instead.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import gymnasium as gym
    from gymnasium import spaces
except ImportError as e:  # pragma: no cover
    raise ImportError("gymnasium is required for the Gym adapters") from e

from .spin_torque import SpinTorqueEnv, SpinTorqueEnvConfig


def _make_spaces(env: SpinTorqueEnv):
    cfg = env.config
    if cfg.action_mode == "continuous":
        action_space = spaces.Box(
            low=np.array([-cfg.max_current, 0.0], dtype=np.float32),
            high=np.array([cfg.max_current, cfg.max_duration], dtype=np.float32),
            dtype=np.float32,
        )
    else:
        action_space = spaces.Discrete(env.num_actions)

    if cfg.observation_mode == "vector":
        observation_space = spaces.Box(
            low=-np.inf, high=np.inf, shape=(12,), dtype=np.float32
        )
    else:
        observation_space = spaces.Dict(
            {
                "magnetization": spaces.Box(-1, 1, shape=(3,), dtype=np.float32),
                "target": spaces.Box(-1, 1, shape=(3,), dtype=np.float32),
                "resistance": spaces.Box(0, np.inf, shape=(1,), dtype=np.float32),
                "temperature": spaces.Box(0, np.inf, shape=(1,), dtype=np.float32),
                "steps_remaining": spaces.Box(0, cfg.max_steps, shape=(1,), dtype=int),
                "energy_consumed": spaces.Box(0, np.inf, shape=(1,), dtype=np.float32),
                "last_action": spaces.Box(-np.inf, np.inf, shape=(2,), dtype=np.float32),
            }
        )
    return action_space, observation_space


def _to_numpy_obs(obs, squeeze: bool):
    if isinstance(obs, dict):
        out = {k: np.asarray(v) for k, v in obs.items()}
        if squeeze:
            out = {k: v[0] for k, v in out.items()}
        return out
    arr = np.asarray(obs)
    return arr[0] if squeeze else arr


def _scalar_info(info: Dict[str, Any], idx: Optional[int] = None) -> Dict[str, Any]:
    out = {}
    for k, v in info.items():
        if k in ("reward_components",):
            continue
        arr = np.asarray(v)
        if idx is not None and arr.ndim >= 1:
            arr = arr[idx]
        out[k] = arr.item() if arr.ndim == 0 and arr.size == 1 else arr
    return out


class GymSpinTorqueEnv(gym.Env):
    """Single-environment Gymnasium adapter (reference API surface)."""

    metadata = {"render_modes": ["human", "rgb_array"], "render_fps": 30}

    def __init__(
        self,
        device_type: str = "stt_mram",
        device_params: Optional[Dict[str, Any]] = None,
        target_states: Optional[List[np.ndarray]] = None,
        max_steps: int = 100,
        max_current: float = 2e6,
        max_duration: float = 5e-9,
        temperature: float = 300.0,
        include_thermal_fluctuations: bool = True,
        reward_components: Optional[Dict[str, Dict]] = None,
        action_mode: str = "continuous",
        observation_mode: str = "vector",
        success_threshold: float = 0.9,
        energy_penalty_weight: float = 0.1,
        render_mode: Optional[str] = None,
        seed: Optional[int] = None,
        batch_size: int = 1,
        dtype: str | None = None,
        **extra,
    ):
        # This adapter is the reference-faithful compatibility surface; the
        # reference's freeze-on-blowup semantics (PulseResult.failed) depend
        # on float64 overflow thresholds, so it uses float64 whenever x64 is
        # enabled (the parity/test configuration). On backends without x64
        # (TPU) it falls back to float32; the functional/vector API defaults
        # to float32 everywhere for speed.
        if dtype is None:
            dtype = "float64" if jax.config.jax_enable_x64 else "float32"
        super().__init__()
        self._ctor = dict(
            device_type=device_type,
            device_params=device_params,
            target_states=target_states,
            reward_components=reward_components,
        )
        self._cfg_kwargs = dict(
            max_steps=max_steps,
            max_current=max_current,
            max_duration=max_duration,
            temperature=temperature,
            include_thermal=include_thermal_fluctuations,
            action_mode=action_mode,
            observation_mode=observation_mode,
            success_threshold=success_threshold,
            energy_penalty_weight=energy_penalty_weight,
            autoreset=False,
            dtype=dtype,
        )
        self._build_env()
        self.render_mode = render_mode
        self.action_space, self.observation_space = _make_spaces(self._env)
        self._key = jax.random.PRNGKey(0 if seed is None else seed)
        self._state = None
        self.episode_history: List[Dict[str, Any]] = []

    def _build_env(self):
        cfg = SpinTorqueEnvConfig(device_type=self._ctor["device_type"], **self._cfg_kwargs)
        self._env = SpinTorqueEnv(
            device_type=self._ctor["device_type"],
            device_params=self._ctor["device_params"],
            target_states=self._ctor["target_states"],
            batch_size=1,
            reward_components=self._ctor["reward_components"],
            config=cfg,
        )

    @property
    def device_type(self) -> str:
        return self._env.config.device_type

    def reset(self, *, seed: Optional[int] = None, options: Optional[Dict] = None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        options = options or {}
        if "temperature" in options:
            self._cfg_kwargs["temperature"] = float(options["temperature"])
            self._build_env()
        self._key, sub = jax.random.split(self._key)
        state, obs = self._env.reset(sub)
        # Optional deterministic overrides (spin_torque_env.py:286-299).
        if "initial_state" in options:
            m = np.asarray(options["initial_state"], float)
            m = m / np.linalg.norm(m)
            state = state.replace(
                m=jnp.asarray(m, self._env.config.jnp_dtype)[None, :]
            )
        if "target_state" in options:
            t = np.asarray(options["target_state"], float)
            t = t / np.linalg.norm(t)
            state = state.replace(
                target=jnp.asarray(t, self._env.config.jnp_dtype)[None, :]
            )
        self._state = state
        self.episode_history = []
        obs = self._env.observe(state)
        info = {
            "step_count": 0,
            "total_energy": 0.0,
            "current_alignment": float(
                np.sum(np.asarray(state.m)[0] * np.asarray(state.target)[0])
            ),
        }
        return _to_numpy_obs(obs, squeeze=True), info

    def step(self, action):
        if self._state is None:
            raise RuntimeError("Environment must be reset before calling step")
        if np.isscalar(action) or (
            isinstance(action, np.ndarray) and action.ndim == 0
        ):
            batched = np.asarray([action])
        else:
            batched = np.asarray(action)[None, ...]
        self._state, ts = self._env.step(self._state, batched)
        obs = _to_numpy_obs(ts.obs, squeeze=True)
        reward = float(np.asarray(ts.reward)[0])
        terminated = bool(np.asarray(ts.terminated)[0])
        truncated = bool(np.asarray(ts.truncated)[0])
        info = _scalar_info(ts.info, idx=0)
        self.episode_history.append(
            {
                "step": info.get("step_count"),
                "action": np.asarray(batched)[0],
                "magnetization": np.asarray(self._state.m)[0].copy(),
                "reward": reward,
                "energy": info.get("step_energy"),
                "alignment": info.get("current_alignment"),
            }
        )
        return obs, reward, terminated, truncated, info

    def analyze_episode(self) -> Dict[str, Any]:
        """Episode summary (spin_torque_env.py:720-745)."""
        if not self.episode_history:
            return {}
        total_energy = sum(h["energy"] for h in self.episode_history)
        final_alignment = self.episode_history[-1]["alignment"]
        success = final_alignment >= self._env.config.success_threshold
        switching_step = next(
            (
                i + 1
                for i, h in enumerate(self.episode_history)
                if h["alignment"] >= self._env.config.success_threshold
            ),
            None,
        )
        return {
            "episode_length": len(self.episode_history),
            "total_energy": total_energy,
            "final_alignment": final_alignment,
            "success": success,
            "switching_step": switching_step,
            "average_reward": float(
                np.mean([h["reward"] for h in self.episode_history])
            ),
            "energy_efficiency": final_alignment / total_energy if total_energy > 0 else 0,
            "history": list(self.episode_history),
        }

    def get_device_info(self) -> Dict[str, Any]:
        from ..devices import device_factory

        return device_factory.create_device(
            self._env.config.device_type, self._ctor["device_params"]
        ).get_device_info()

    def render(self):  # pragma: no cover - optional visualization
        if self.render_mode is None:
            return None
        from ..utils.rendering import render_spin_torque

        return render_spin_torque(self, mode=self.render_mode)

    def close(self):
        pass


class VectorSpinTorqueEnv(gym.Env):
    """Batched adapter: numpy in/out over the functional env (B > 1).

    Follows the gymnax auto-reset convention: when an env is done, the
    returned observation is the *reset* observation and
    info['final_observation'] holds the terminal one.
    """

    def __init__(
        self,
        num_envs: int = 4096,
        seed: Optional[int] = None,
        device_type: str = "stt_mram",
        device_params: Optional[Dict[str, Any]] = None,
        target_states: Optional[List[np.ndarray]] = None,
        reward_components: Optional[Dict[str, Dict]] = None,
        include_thermal_fluctuations: bool = True,
        **cfg_kwargs,
    ):
        self.num_envs = num_envs
        cfg = SpinTorqueEnvConfig(
            device_type=device_type,
            include_thermal=include_thermal_fluctuations,
            autoreset=True,
            **cfg_kwargs,
        )
        self._env = SpinTorqueEnv(
            device_type=device_type,
            device_params=device_params,
            target_states=target_states,
            batch_size=num_envs,
            reward_components=reward_components,
            config=cfg,
        )
        self.single_action_space, self.single_observation_space = _make_spaces(self._env)
        self._key = jax.random.PRNGKey(0 if seed is None else seed)
        self._state = None

    def reset(self, *, seed: Optional[int] = None, options: Optional[Dict] = None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, sub = jax.random.split(self._key)
        self._state, obs = self._env.reset(sub)
        return _to_numpy_obs(obs, squeeze=False), {}

    def step(self, actions):
        self._state, ts = self._env.step(self._state, jnp.asarray(actions))
        return (
            _to_numpy_obs(ts.obs, squeeze=False),
            np.asarray(ts.reward),
            np.asarray(ts.terminated),
            np.asarray(ts.truncated),
            _scalar_info(ts.info),
        )

    @property
    def functional_env(self) -> SpinTorqueEnv:
        return self._env

    def close(self):
        pass
