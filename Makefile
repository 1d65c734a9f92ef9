# Round-handoff targets. `make verify` is the full local gate the round
# runs before handoff (VERDICT r2 #4): pytest + the full driver simulation
# (every oracled query vs DuckDB at sf0.01), outcome recorded in
# PROGRESS.jsonl. `make bench` / `make bench-10x` produce the headline
# JSON at sf0.1 and at the 10x-replicated sf1-equivalent.

PY ?= python3

.PHONY: verify test sim bench bench-10x

verify:
	$(PY) tools/verify_all.py

test:
	$(PY) -m pytest tests/ -q

sim:
	$(PY) tools/driver_sim.py

bench:
	$(PY) bench.py

bench-10x:
	$(PY) tools/bench_10x.py
