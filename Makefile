# spintorque-tpu development targets (counterpart of the reference Makefile).

PY := python
# CPU test env: force the CPU backend and skip the TPU tunnel dial.
TEST_ENV := env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test test-fast test-parity bench train info lint clean \
        docker-build docker-test docker-train docker-bench

test:
	$(TEST_ENV) $(PY) -m pytest tests/ -x -q

test-fast:
	$(TEST_ENV) $(PY) -m pytest tests/unit -x -q

test-parity:
	$(TEST_ENV) $(PY) -m pytest tests/parity -x -q

bench:
	$(PY) bench.py

train:
	$(PY) -m spintorque_tpu.cli train --timesteps 100000

info:
	$(PY) -m spintorque_tpu.cli info

lint:
	$(PY) -m compileall -q spintorque_tpu tests bench.py __graft_entry__.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true

# Container targets (counterpart of the reference Makefile's docker tier).
docker-build:
	./deploy.sh build

docker-test:
	./deploy.sh test

docker-train:
	docker compose --profile train up -d

docker-bench:
	docker compose --profile bench run --rm bench
