# Dev tooling (reference: Makefile:1-37)
PYTEST_ENV = env -u PALLAS_AXON_POOL_IPS PYTHONPATH= JAX_PLATFORMS=cpu

.PHONY: run test test-all lint coverage bench

run:
	python main.py --algo dijkstra --scenario Easy --mode eval --start-end-time 21600 28800

# Fast set (<5 min): everything except the @pytest.mark.slow learning demos.
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
