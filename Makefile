.PHONY: test test-all test-slow bench

# Fast default suite (slow subprocess e2e suites deselected via pyproject addopts).
test:
	python -m pytest tests/ -x -q

# Only the slow e2e suites (launchers + full pipeline); run serially.
test-slow:
	python -m pytest tests/ -x -q -m slow

# Everything. The persistent XLA compile cache is keyed per xdist worker
# (tests/conftest.py), so `pytest -n N` is safe on multi-core hosts; two
# concurrent SERIAL pytest processes still share one cache dir — don't.
# Fast suite serial wall clock: ~10 min warm-cache on a single core (the
# retired cluster-kernel suite and the heaviest A/B sweeps live in `slow`).
test-all:
	python -m pytest tests/ -x -q -m ""

test-par:
	python -m pytest tests/ -q -n 4

bench:
	python bench.py
