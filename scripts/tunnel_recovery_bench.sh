#!/bin/bash
# Tunnel-recovery measurement runbook (round 3).
#
# The axon tunnel was fully down from ~21:15 UTC 2026-08-17; the
# phases below are the measurements BASELINE.md lists as pending.
# Run them back-to-back in ONE window (cross-window comparisons are
# meaningless on this tunnel — BASELINE.md policy), from the repo
# root, and append the results to BASELINE.md with the window time.
#
# 1. Health gate (abort if this hangs):
#      timeout 120 python -c "import jax, jax.numpy as jnp, numpy as np; \
#        [np.asarray(jnp.sin(jnp.arange(8.)+i).sum()) for i in range(3)]; print('OK')"
#
# 2. Fused headline sanity (the driver's default metric; ledger
#    8.5 fps in the last healthy window):
#      timeout 1800 python bench.py
#
# 3. Van Hove phase (pending since the outage began):
#      MDTPU_BENCH_LEVEL=vanhove timeout 2400 python bench.py
#
# 4. Aggregates phase (new this session; never TPU-measured):
#      MDTPU_BENCH_LEVEL=aggregates timeout 2400 python bench.py
#
# Each run prints one JSON line; per-phase fps lines go to stderr.
# Record all numbers (plus the UTC window) under "Round 3" in
# BASELINE.md.  If a phase dies with INVALID_ARGUMENT / hangs, retry
# once in a fresh process before declaring the window degraded.

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
