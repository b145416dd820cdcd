PY ?= python
SF001 ?= /root/testdata/sf0.001
SF01  ?= /root/testdata/sf0.01
SF1   ?= /root/testdata/sf0.1

.PHONY: test verify-scale bench

test:
	$(PY) -m pytest tests/ -x -q

# One-command scale-parity harness (round-4 verdict item 2): replay the
# full DuckDB-oracle correctness gate — every queries() entry — at
# sf0.01 AND sf0.1. Larger scales are hostile to fixture-tuned
# constants (different skew, cardinalities, bucket occupancy); this
# sweep has caught real bugs twice (SCALE.md). Takes ~2 min at sf0.01
# and ~10 min at sf0.1 on local[8].
verify-scale:
	SPARK_GRAFT_TEST_SF=$(SF01) $(PY) -m pytest tests/test_oracle_parity.py -q
	SPARK_GRAFT_TEST_SF=$(SF1)  $(PY) -m pytest tests/test_oracle_parity.py -q

bench:
	$(PY) bench.py
