#!/bin/bash
# Full test suite in one CI invocation (VERDICT r4 #9): the fast path and
# the slow-marked closed-loop/zoo/grasp/multihost tests, run sequentially
# (the box is memory- and core-bound: 2 CPUs), with timing logs committed
# as test_log_fast.txt / test_log_slow.txt.
set -e
cd "$(dirname "$0")/.."
echo "== fast path (pytest -m 'not slow') =="
time python -m pytest tests/ -q -m "not slow" 2>&1 | tee test_log_fast.txt
echo "== slow path (pytest -m slow) =="
time python -m pytest tests/ -q -m slow 2>&1 | tee test_log_slow.txt
