#!/bin/bash
# Tunnel measurement runbook (round 3).
#
# The original pending-phase list (fused sanity, vanhove, aggregates)
# was measured 2026-08-18 after the outage — results in BASELINE.md
# "third continued session".  This script remains the one-command way
# to re-measure the full phase family in ONE window after any future
# outage (cross-window comparisons are meaningless on this tunnel —
# BASELINE.md policy).  Each run prints one JSON line; per-phase fps
# lines go to stderr.  If a phase dies with INVALID_ARGUMENT or
# hangs, retry once in a fresh process before declaring the window
# degraded.

set -euo pipefail
cd "$(dirname "$0")/.."

echo "== health gate =="
timeout 120 python -c "import jax, jax.numpy as jnp, numpy as np; [np.asarray(jnp.sin(jnp.arange(8.)+i).sum()) for i in range(3)]; print('tunnel OK')"

echo "== fused headline =="
timeout 1800 python bench.py

echo "== vanhove =="
MDTPU_BENCH_LEVEL=vanhove timeout 2400 python bench.py

echo "== aggregates =="
MDTPU_BENCH_LEVEL=aggregates timeout 2400 python bench.py

echo "== order =="
MDTPU_BENCH_LEVEL=order timeout 2400 python bench.py
