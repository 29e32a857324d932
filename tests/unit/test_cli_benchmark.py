"""CLI benchmark + sb3-backend wiring tests (small sizes, CPU)."""

import json
import sys
import types

import gymnasium


def test_cli_benchmark(capsys):
    from spintorque_tpu.cli import main

    rc = main(["benchmark", "--batch-size", "64", "--iters", "1",
               "--inner", "2", "--no-thermal"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(out)
    assert data["batch_size"] == 64
    assert data["env_steps_per_s"] > 0


class _FakeAlgo:
    """Records the env it was constructed with; .learn is a no-op."""

    instances = []

    def __init__(self, policy, env, **kwargs):
        self.env = env
        type(self).instances.append(self)

    def learn(self, total_timesteps):
        self.learned = total_timesteps

    def save(self, path):
        pass


def _run_sb3_train(monkeypatch, algorithm):
    fake = types.ModuleType("stable_baselines3")
    for name in ("PPO", "SAC", "TD3", "DQN"):
        setattr(fake, name, type(name, (_FakeAlgo,), {"instances": []}))
    monkeypatch.setitem(sys.modules, "stable_baselines3", fake)
    from spintorque_tpu.cli import main

    rc = main(["train", "--backend", "sb3", "--algorithm", algorithm,
               "--timesteps", "1"])
    return rc, fake


def test_cli_sb3_dqn_gets_discrete_action_space(monkeypatch):
    """DQN (reference cli.py:257-277) must be wired AND receive a discrete
    action space — the repo's discrete mode works (the reference's is
    broken), so the CLI showcases it."""
    rc, fake = _run_sb3_train(monkeypatch, "dqn")
    assert rc == 0
    (inst,) = fake.DQN.instances
    assert isinstance(inst.env.action_space, gymnasium.spaces.Discrete)
    assert inst.learned == 1


def test_cli_sb3_ppo_keeps_continuous_action_space(monkeypatch):
    rc, fake = _run_sb3_train(monkeypatch, "ppo")
    assert rc == 0
    (inst,) = fake.PPO.instances
    assert isinstance(inst.env.action_space, gymnasium.spaces.Box)


def test_cli_sb3_unknown_algorithm(monkeypatch):
    rc, _ = _run_sb3_train(monkeypatch, "a2c")
    assert rc == 1
