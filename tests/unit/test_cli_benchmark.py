"""CLI benchmark subcommand test (small sizes, CPU)."""

import json


def test_cli_benchmark(capsys):
    from spintorque_tpu.cli import main

    rc = main(["benchmark", "--batch-size", "64", "--iters", "1",
               "--inner", "2", "--no-thermal"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(out)
    assert data["batch_size"] == 64
    assert data["env_steps_per_s"] > 0
