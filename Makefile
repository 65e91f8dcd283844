# Mirrors the reference Makefile targets (test/test-cpu/build).

.PHONY: test test-fast bench parity build

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow" -x

bench:
	python bench.py

parity:
	python scripts/parity_check.py toy

build:
	python -m pip wheel . -w dist --no-deps
