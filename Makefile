# Developer entry points (the reference ships a Makefile for its docker
# workflow — /root/reference/Makefile; ours wraps the test/bench/example
# loops instead, since the TPU build needs no container).

PY ?= python

.PHONY: test test-fast bench bench-all fleet examples multihost-dryrun entry

test:            ## full suite on a virtual 8-device CPU mesh
	$(PY) -m pytest tests/ -q

test-fast:       ## skip the slow closed-loop / subprocess tests
	$(PY) -m pytest tests/ -q -x -m "not slow"

bench:           ## flagship benchmark (racing T=50, K=100k) -> one JSON line
	$(PY) bench.py

bench-all:       ## per-workload solves/s across the reference workloads
	$(PY) benchmarks/run_all.py

fleet:           ## fleet-episode serving throughput (B x N ticks, one program)
	$(PY) benchmarks/fleet.py --batch 32 --ticks 50

examples:        ## smoke the closed-loop examples (few steps each)
	$(PY) examples/pendulum.py --steps 30 --no-gym
	$(PY) examples/cartpole.py --steps 30 --no-gym
	$(PY) examples/mountaincar.py --steps 30 --no-gym

multihost-dryrun: ## 2-process jax.distributed bootstrap + sharded solve
	$(PY) benchmarks/multihost_dryrun.py

entry:           ## driver entry points: single-chip compile + 8-device dryrun
	$(PY) __graft_entry__.py
