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


def test_cli_sweep_writes_diagram(tmp_path):
    """The sweep subcommand runs a tiny grid end-to-end and writes JSON."""
    from spintorque_tpu.cli import build_parser

    out = tmp_path / "sweep.json"
    args = build_parser().parse_args(
        ["sweep", "--n-currents", "3", "--n-durations", "2",
         "--ensemble", "4", "--duration-max", "3e-10",
         "--output", str(out)]
    )
    assert args.func(args) == 0
    import json

    d = json.loads(out.read_text())
    assert len(d["p_switch"]) == 3 and len(d["p_switch"][0]) == 2
    assert all(0.0 <= v <= 1.0 for row in d["p_switch"] for v in row)
    # Physics: strong negative J switches, zero J does not.
    assert d["p_switch"][0][0] > 0.9 and d["p_switch"][-1][-1] < 0.1
