# Entry points mirroring the reference's Makefile (test / py-test / examples)

.PHONY: test oracle bench examples

test:
	python -m pytest tests/ -q

oracle:
	python tools/oracle_check.py /root/testdata/sf0.01

bench:
	python bench.py

examples:
	PYTHONPATH=. python examples/quickstart.py
	PYTHONPATH=. python examples/partitioned_quickstart.py
	PYTHONPATH=. python examples/predicate_typing.py
	PYTHONPATH=. python examples/validate_only.py
