# Entry points mirroring the reference's Makefile (test / py-test / examples)

.PHONY: test test-fast test-slow oracle bench examples

test:
	python -m pytest tests/ -q

# fast per-commit tier: full-registry sf0.001 oracle gate + unit suites
# (~13 min idle-host); `test-slow` adds emulator/streaming/property/stress
test-fast:
	python -m pytest tests/ -q -m "not slow"

test-slow:
	python -m pytest tests/ -q -m "slow"

oracle:
	python tools/oracle_check.py /root/testdata/sf0.01

bench:
	python bench.py

examples:
	PYTHONPATH=. python examples/quickstart.py
	PYTHONPATH=. python examples/partitioned_quickstart.py
	PYTHONPATH=. python examples/predicate_typing.py
	PYTHONPATH=. python examples/validate_only.py
