.PHONY: test test-all test-slow bench

# Fast default suite (slow subprocess e2e suites deselected via pyproject addopts).
test:
	python -m pytest tests/ -x -q

# Only the slow e2e suites (launchers + full pipeline); run serially.
test-slow:
	python -m pytest tests/ -x -q -m slow

# Everything. Keep it a single serial pytest process (see tests/conftest.py on
# the shared-compile-cache SIGABRT under concurrent pytest).
test-all:
	python -m pytest tests/ -x -q -m ""

bench:
	python bench.py
