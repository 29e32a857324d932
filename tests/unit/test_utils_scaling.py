"""Unit tests for the host-side utility tier: cache, concurrency, scaling,
health, performance optimizer."""

import time

import numpy as np
import pytest

from spintorque_tpu.physics.solver import params_from_dict
from spintorque_tpu.utils import (
    AdaptiveCache,
    AdaptiveResourceManager,
    AutoScaler,
    CacheManager,
    ComputationOptimizer,
    LoadBalancer,
    LRUCache,
    ParallelBenchmark,
    PhysicsWorkerPool,
    ResourcePool,
    ScalableEnvironmentManager,
    build_full_health_monitor,
    cached,
    get_cache_manager,
    get_optimizer,
    pad_batch,
    parallel_map,
    unpad_batch,
)


def _params():
    return params_from_dict(dict(volume=1e-24))


# ---------------------------------------------------------------------------
# cache

def test_lru_cache_eviction_and_stats():
    c = LRUCache(max_size=2, ttl_s=None)
    c.put("a", 1)
    c.put("b", 2)
    assert c.get("a") == 1  # refreshes 'a' to MRU
    c.put("c", 3)  # evicts 'b' (LRU)
    assert c.get("b") is None
    assert c.get("a") == 1 and c.get("c") == 3
    assert c.stats.evictions == 1
    assert c.stats.hit_rate > 0.5


def test_lru_cache_ttl_expiry():
    c = LRUCache(max_size=8, ttl_s=0.05)
    c.put("k", 42)
    assert c.get("k") == 42
    time.sleep(0.08)
    assert c.get("k") is None
    assert c.stats.expirations == 1


def test_cache_key_distinguishes_arrays():
    k1 = LRUCache.make_key(np.array([1.0, 2.0]), current=1e6)
    k2 = LRUCache.make_key(np.array([1.0, 2.0]), current=2e6)
    k3 = LRUCache.make_key(np.array([1.0, 2.000001]), current=1e6)
    assert k1 != k2 and k1 != k3  # no current-blind / rounded-key collisions


def test_adaptive_cache_grows_on_hits():
    c = AdaptiveCache(max_size=64, ttl_s=None, adapt_interval=50)
    c.put("x", 1)
    for _ in range(200):
        c.get("x")
    assert c.max_size > 64


def test_cached_decorator_and_manager():
    calls = {"n": 0}

    @cached(cache_name="test_dec", max_size=16)
    def slow(a, b):
        calls["n"] += 1
        return a + b

    assert slow(1, 2) == 3 and slow(1, 2) == 3
    assert calls["n"] == 1
    assert slow(1, 3) == 4 and calls["n"] == 2
    assert "test_dec" in get_cache_manager().stats()


# ---------------------------------------------------------------------------
# concurrency

def test_resource_pool_reuses_instances():
    created = []

    def factory():
        created.append(object())
        return created[-1]

    pool = ResourcePool(factory, max_size=2)
    a = pool.acquire()
    pool.release(a)
    b = pool.acquire()
    assert a is b  # LIFO reuse
    assert pool.size == 1


def test_physics_worker_pool_coalesces():
    with PhysicsWorkerPool(_params(), max_substeps=64, max_batch=64,
                           max_wait_ms=20.0) as pool:
        futs = [
            pool.submit(np.array([0.1, 0.0, 0.995]), (0.0, 1e-11), 0.0)
            for _ in range(16)
        ]
        results = [f.result(timeout=60) for f in futs]
    for r in results:
        assert r.shape == (3,)
        assert abs(np.linalg.norm(r) - 1.0) < 1e-4
    stats = pool.get_statistics()
    assert stats["submitted"] == 16
    assert stats["mean_batch_size"] > 1.0  # coalescing actually happened


def test_parallel_map():
    assert parallel_map(lambda x: x * x, [1, 2, 3], max_workers=2) == [1, 4, 9]


@pytest.mark.slow
def test_parallel_benchmark_shows_batch_advantage():
    bench = ParallelBenchmark(_params(), n_solves=64, max_substeps=32)
    out = bench.run()
    assert out["batch_speedup_vs_serial"] > 2.0


# ---------------------------------------------------------------------------
# scaling

def test_autoscaler_explores_and_grows():
    sc = AutoScaler(initial_batch=256, cooldown_s=0.0)
    sc.record(256, 10, 1.0)  # 2560 steps/s
    assert sc.recommend() == 512  # moves to 512 to explore
    sc.record(512, 10, 0.5)  # 10240 steps/s - better; keeps exploring up
    assert sc.recommend() == 1024
    sc.record(1024, 10, 0.5)  # 20480/s - best so far
    assert sc.get_statistics()["throughput_by_batch"][1024] > 10000


def test_autoscaler_backs_off_on_regression():
    sc = AutoScaler(initial_batch=512, cooldown_s=0.0)
    sc.record(512, 10, 1.0)    # 5120/s
    assert sc.recommend() == 1024  # explore up
    sc.record(1024, 10, 4.0)   # 2560/s - worse
    sc.recommend()
    assert sc.batch == 512  # reverted to the best-known size


def test_load_balancer_partitions_by_rate():
    lb = LoadBalancer(devices=["d0", "d1"], strategy="fastest_response")
    i0 = lb.select_device()
    lb.record_completion(i0, items=300, elapsed_s=1.0)
    i1 = lb.select_device()
    lb.record_completion(i1, items=100, elapsed_s=1.0)
    shares = lb.partition(400)
    assert sum(shares) == 400
    assert shares[i0] > shares[i1]


def test_adaptive_resource_manager_lifecycle():
    with AdaptiveResourceManager(AutoScaler(initial_batch=128), interval_s=0.01) as mgr:
        mgr.observe(128, 10, 0.1)
        time.sleep(0.05)
    assert mgr.current_batch >= 128


# ---------------------------------------------------------------------------
# scalable environment manager

def test_scalable_environment_manager_runs_and_measures():
    from spintorque_tpu.envs import SpinTorqueEnv, SpinTorqueEnvConfig

    def factory(batch):
        return SpinTorqueEnv(
            batch_size=batch,
            config=SpinTorqueEnvConfig(max_duration=1e-11, max_substeps=32),
        )

    mgr = ScalableEnvironmentManager(
        factory, initial_batch=8, min_batch=8, max_batch=16, autoscale=False
    )
    chunk = mgr.run_batch_steps(n_steps=3)
    assert chunk["env_steps_per_s"] > 0
    assert np.isfinite(chunk["mean_reward"])
    assert mgr.get_statistics()["chunks_run"] == 1


# ---------------------------------------------------------------------------
# health

def test_full_health_monitor_healthy():
    report = build_full_health_monitor().run()
    assert report["status"] == "HEALTHY", report
    assert set(report["checks"]) == {"physics", "devices", "environment", "system"}


# ---------------------------------------------------------------------------
# performance optimizer

def test_computation_optimizer_memoizes():
    opt = ComputationOptimizer()
    calls = {"n": 0}

    def expensive(x):
        calls["n"] += 1
        return x * 2

    assert opt.cached_computation("exp", expensive, 21) == 42
    assert opt.cached_computation("exp", expensive, 21) == 42
    assert calls["n"] == 1
    assert opt.get_statistics()["cache"]["hits"] == 1


def test_optimizer_jit_registry():
    import jax.numpy as jnp

    opt = ComputationOptimizer()
    f = opt.jit("double", lambda x: x * 2)
    g = opt.jit("double", lambda x: x * 3)  # same name -> same function
    assert f is g
    assert float(f(jnp.asarray(2.0))) == 4.0
    assert opt.get_statistics()["jitted_functions"]["double"]["calls"] == 1


def test_pad_batch_lane_alignment():
    x = np.ones((100, 3))
    padded, n = pad_batch(x)
    assert padded.shape[0] == 128 and n == 100
    assert unpad_batch(padded, n).shape[0] == 100
    already, n2 = pad_batch(np.ones((256, 3)))
    assert already.shape[0] == 256


def test_global_optimizer_singleton():
    assert get_optimizer() is get_optimizer()
