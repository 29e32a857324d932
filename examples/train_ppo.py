"""Train a PPO policy natively on TPU.

Run: python examples/train_ppo.py
"""

from spintorque_tpu.envs import SpinTorqueEnv, SpinTorqueEnvConfig
from spintorque_tpu.rl import PPOConfig, PPOTrainer

env = SpinTorqueEnv(
    batch_size=1024,
    config=SpinTorqueEnvConfig(include_thermal=False, max_duration=2e-9),
)
trainer = PPOTrainer(env, PPOConfig(rollout_steps=16, hidden_sizes=(128, 128)))
ts, summary = trainer.train(
    total_timesteps=200_000,
    callback=lambda i, m: print(
        f"update {i}: reward={m['mean_reward']:.3f} success={m['success_rate']:.3f}"
    ),
)
print({k: round(v, 3) if isinstance(v, float) else v for k, v in summary.items()})
