# Judge-reproducibility harness: one command, one JSON artifact
# (VERIFY.json). See scripts/judge_verify.py.

.PHONY: verify verify-fast test sweep bench

verify:
	python scripts/judge_verify.py

verify-fast:
	python scripts/judge_verify.py --fast

test:
	python -m pytest tests/ -q

sweep:
	python scripts/check_correctness.py /root/testdata/sf0.01

bench:
	python bench.py
