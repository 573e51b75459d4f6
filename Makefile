# Dev tooling (reference: Makefile:1-37)
PYTEST_ENV = env -u PALLAS_AXON_POOL_IPS PYTHONPATH= JAX_PLATFORMS=cpu

.PHONY: run test test-all lint coverage bench

run:
	python main.py --algo dijkstra --scenario Easy --mode eval --start-end-time 21600 28800

# Fast set: everything except @pytest.mark.slow (learning demos, the >=20 s
# equality/parity heavies — run those via test-all).  Measured on a 1-CPU
# host (r4): 291 s warm / 704 s cold — the first run pays XLA:CPU compiles
# into the persistent cache tests/conftest.py keeps under .cache/jax
# (TARL_TEST_JAX_CACHE_DIR overrides; empty disables).
test:
	$(PYTEST_ENV) python -m pytest --ff -m "not slow" tests

# Full suite including the slow learning/consistency demos (~20 min).
test-all:
	$(PYTEST_ENV) python -m pytest --ff tests

lint:
	python -m flake8 tarl_tpu tests --max-line-length 100 || true

coverage:
	$(PYTEST_ENV) python -m pytest --cov=tarl_tpu --cov-report=term tests || true

bench:
	python bench.py
