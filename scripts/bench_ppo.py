"""PPO train-step breakdown bench: where does the update time go?

Measures, in steady state on the local accelerator:
  * rollout-only (the lax.scan of policy + env._step_impl, jitted alone)
  * update-only (GAE + minibatched epochs, jitted alone, on a fixed traj)
  * full train_step (the production program)

Prints one JSON object with ms per phase and derived env-steps/s so the
rollout/training gap is attributable (VERDICT round 2, item 1).

Run: python scripts/bench_ppo.py [--batch 4096] [--rollout 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *args, warmup=10, iters=8, block=lambda r: r, label=""):
    """Steady-state wall time per call (s). fn must be jitted/async."""
    t0 = time.time()
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(block(out))
    print(f"# {label}: warmup+compile {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(block(out))
    return (time.perf_counter() - t0) / iters, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--rollout", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--minibatches", type=int, default=4)
    ap.add_argument("--out", default=None,
                    help="artifact path; default writes the canonical "
                         "docs/BENCH_PPO_TPU_v5e.json ONLY for the "
                         "canonical config on a TPU backend")
    args = ap.parse_args()

    from spintorque_tpu.envs import SpinTorqueEnv, SpinTorqueEnvConfig
    from spintorque_tpu.rl.ppo import PPOConfig, PPOTrainer

    env = SpinTorqueEnv(
        batch_size=args.batch, config=SpinTorqueEnvConfig(dtype="float32")
    )
    cfg = PPOConfig(
        rollout_steps=args.rollout,
        num_epochs=args.epochs,
        num_minibatches=args.minibatches,
    )
    trainer = PPOTrainer(env, cfg)
    ts = trainer.init(jax.random.PRNGKey(0))

    results = {
        "batch": args.batch,
        "rollout_steps": args.rollout,
        "use_pallas": bool(env.config.use_pallas),
        "backend": jax.default_backend(),
    }

    # --- full train step -------------------------------------------------
    def full(ts):
        new_ts, _ = trainer.train_step(ts)
        return new_ts

    t_full, ts2 = timed(full, ts, block=lambda r: r.params, label="train_step")
    steps_per_update = args.rollout * args.batch
    results["train_step_ms"] = round(t_full * 1e3, 3)
    results["train_env_steps_per_s"] = round(steps_per_update / t_full, 1)

    # --- rollout only -----------------------------------------------------
    @jax.jit
    def rollout_only(params, env_state, obs, key):
        def body(carry, k):
            env_state, obs = carry
            env_action, raw, logp, value = trainer._policy(params, obs, k)
            nxt, out = env._step_impl(env_state, env_action)
            transition = dict(
                obs=obs, raw_action=raw, reward=out.reward,
                done=(out.terminated | out.truncated),
                log_prob=logp, value=value,
            )
            return (nxt, out.obs), transition

        keys = jax.random.split(key, args.rollout)
        (env_state, obs), traj = jax.lax.scan(
            body, (env_state, obs), keys, unroll=2
        )
        return env_state, obs, traj

    t_roll, _ = timed(
        rollout_only, ts.params, ts.env_state, ts.obs, ts.key,
        block=lambda r: r[1], label="rollout",
    )
    results["rollout_ms"] = round(t_roll * 1e3, 3)
    results["rollout_env_steps_per_s"] = round(steps_per_update / t_roll, 1)

    # --- env steps alone (no policy net), same program shape as bench.py --
    from spintorque_tpu.parallel import random_policy

    policy = random_policy(env)

    @jax.jit
    def env_only(env_state, obs, key):
        def body(carry, k):
            env_state, obs = carry
            nxt, out = env._step_impl(env_state, policy(None, obs, k))
            return (nxt, out.obs), out.reward.mean()

        keys = jax.random.split(key, args.rollout)
        (env_state, obs), r = jax.lax.scan(body, (env_state, obs), keys, unroll=2)
        return env_state, obs, r.mean()

    t_env, _ = timed(env_only, ts.env_state, ts.obs, ts.key, block=lambda r: r[2], label="env_only")
    results["env_only_ms"] = round(t_env * 1e3, 3)
    results["env_only_steps_per_s"] = round(steps_per_update / t_env, 1)

    # --- update only: THE production post-rollout program -----------------
    # trainer.update_from_traj is the same callable _train_step_impl runs
    # (bootstrap + GAE + minibatched clipped-surrogate epochs with value
    # clipping and the entropy term), timed on a frozen trajectory.
    env_state, last_obs, traj = jax.block_until_ready(
        rollout_only(ts.params, ts.env_state, ts.obs, ts.key)
    )

    @jax.jit
    def update_only(params, opt_state, key, traj, last_obs):
        params, opt_state, losses, auxes = trainer.update_from_traj(
            params, opt_state, traj, last_obs, key
        )
        return params, opt_state, losses.mean()

    t_upd, _ = timed(
        update_only, ts.params, ts.opt_state, ts.key, traj, last_obs,
        block=lambda r: r[2], label="update_only",
    )
    results["update_only_ms"] = round(t_upd * 1e3, 3)

    results["accounted_ms"] = round((t_roll + t_upd) * 1e3, 3)
    results["unaccounted_ms"] = round((t_full - t_roll - t_upd) * 1e3, 3)
    # 'recorded' set BEFORE printing so stdout JSON and the persisted
    # artifact are byte-identical objects (review finding).
    results["recorded"] = time.strftime("%Y-%m-%d")
    print(json.dumps(results))
    # Persist the artifact: round 3's file was written by hand and round 4
    # initially re-measured WITHOUT updating it - print-only scripts make
    # stale artifacts (advisor-class bug). The CANONICAL file is only
    # overwritten by the canonical configuration on a real TPU backend;
    # exploratory runs (other batch sizes, CPU machines) must pass --out
    # or get no artifact (review finding: a --batch 256 dev run silently
    # replaced the published v5e numbers).
    canonical = (
        (args.batch, args.rollout, args.epochs, args.minibatches)
        == (4096, 16, 4, 4)
        and jax.default_backend() == "tpu"
    )
    out = args.out
    if out is None and canonical:
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", "BENCH_PPO_TPU_v5e.json",
        )
    if out:
        with open(out, "w") as fh:
            json.dump(results, fh, indent=2)
        print("wrote", out)
    else:
        print("# non-canonical config/backend: artifact NOT written "
              "(pass --out to save)")


if __name__ == "__main__":
    main()
