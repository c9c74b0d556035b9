#!/bin/bash
# Round-3 on-chip validation runbook.  Run when the TPU tunnel is up:
#
#   bash benchmarks/onchip_r3.sh [logfile]
#
# Executes every measurement the round-3 features are gated on, serially,
# each under its own timeout (remote compiles have multi-minute congestion
# windows — a hang must not sink the whole run).  Decisions keyed on the
# results:
#   - exp_fused_gn: if fused wins the headline A/B -> flip the fused_small
#     auto gate ON (config.py) and record the number.
#   - exp_pipeline/bench_suite pipeline: streaming window target >= 60 fps
#     at rel err ~1e-4 (VERDICT r2 #3).
#   - bench_suite large_cloud: cluster_knn16_100k target <= 25 ms
#     (VERDICT r2 #4); fused v2 query keeps large_cloud_100k_fullres <= 18 ms.
#   - tests_tpu: full lane incl. the perf floor gate must be green.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/onchip_r3.log}
: > "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name exit=$? ---" | tee -a "$LOG"
}

run probe        120 python -c "import jax; print(jax.devices())"
run tests_tpu    1200 python -m pytest tests_tpu/ -q
run fused_gn     590 python benchmarks/exp_fused_gn.py
run pipeline     590 python benchmarks/exp_pipeline.py full stream4 stream8
run suite_large  590 python benchmarks/bench_suite.py large_cloud
run multiscale   590 python benchmarks/exp_multiscale.py
run gicp         590 python benchmarks/exp_gicp.py
run sgd          590 python benchmarks/exp_sgd.py
run suite_pipe   590 python benchmarks/bench_suite.py pipeline
run suite_rest   590 python benchmarks/bench_suite.py svd_pair pt2pl_pair batch256 normals odometry
run capacity     590 python benchmarks/bench_suite.py capacity
run bench        590 python bench.py
echo "DONE $(date -u)" | tee -a "$LOG"
