#!/bin/bash
# Pending TPU measurements queued during the round-2 axon-tunnel outage.
# Run on a live TPU (default env), one at a time; each is cached after
# its first compile. Results to record:
#   - BENCH_DETAILS.json (bench_suite rewrites it): eval_images_per_sec
#     must be re-measured — 238.8 predates the in-jit quaternion-
#     Procrustes metrics rewrite.
#   - CLAUDE.md training numbers if the remat A/B or bs sweep moves.
set -x
cd "$(dirname "$0")/.."

# 0. tunnel health (fail fast instead of hanging)
timeout 300 python -c "import jax; print(jax.devices())" || exit 17

# 1. headline inference benchmark (driver metric)
BENCH_BATCH=256 BENCH_ITERS=10 python bench.py

# 2. all five BASELINE.md configs -> BENCH_DETAILS.json
python bench_suite.py

# 3. training throughput + remat A/B at the bs128 sweet spot
BENCH_BATCH=128 python tools/bench_train.py
BENCH_BATCH=128 BENCH_REMAT=1 python tools/bench_train.py

# 4. step decomposition + achieved-TFLOP/s cost analysis
BENCH_BATCH=128 BENCH_COST=1 BENCH_PARTS=1 python tools/bench_train_profile.py
