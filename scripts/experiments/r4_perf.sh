#!/usr/bin/env bash
# Round-4 MFU session (VERDICT r3 item 2): runs AFTER the quality pipeline
# releases the TPU (perf benches must be the only client — CLAUDE.md).
#
# Goals: >=890 ex/s at the B=32 recipe point, a B=64 re-anchor on the tanh
# base (807 was measured on erf), and the unrun round-3 H7 XLA flag sweep
# aimed at the 5.7% copy-done / 7.8% elementwise tail (tools/attr_trace.py).
set -x -o pipefail
cd /root/repo
OUT=/tmp/r4perf
mkdir -p "$OUT"

# Wait for the quality pipeline to finish (marker in its driver log), then
# for the tunnel to answer. Exits 3 instead of benching a dead/shared chip.
if [ "${1:-}" != "--nowait" ]; then
  for i in $(seq 1 480); do
    grep -q QUEUE_Q_DONE /tmp/r4q_driver.log 2>/dev/null && break
    sleep 60
  done
  grep -q QUEUE_Q_DONE /tmp/r4q_driver.log 2>/dev/null || {
    echo "PIPELINE_STILL_RUNNING after 8h: refusing to share the chip"; exit 3; }
fi
TUNNEL_OK=0
for i in $(seq 1 30); do
  if timeout 60 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    TUNNEL_OK=1; break
  fi
  sleep 20
done
[ "$TUNNEL_OK" = 1 ] || { echo "TUNNEL_DEAD"; exit 3; }

echo "=== [P0] bench.py anchors (tanh base, B=32) ==="
for i in 1 2; do timeout 1800 python bench.py 2>&1 | tail -1; done

echo "=== [P1] batch sweep on the tanh base ==="
for b in 32 48 64 96 128; do
  timeout 900 python tools/bench_opts.py --variant base --batch "$b" 2>&1 | tail -1
done

echo "=== [P1b] AUTO-layout state (copy-done tail candidate) ==="
for i in 1 2; do
  timeout 900 python tools/bench_opts.py --variant autolayout --batch 32 2>&1 | tail -1
done

echo "=== [P2] XLA flag sweep at the recipe point (r3 H7, unrun) ==="
for opt in \
  xla_tpu_enable_latency_hiding_scheduler=true \
  xla_tpu_enable_latency_hiding_scheduler=false \
  xla_latency_hiding_scheduler_rerun=3 \
  xla_tpu_aggressive_opt_barrier_removal=true \
  xla_tpu_rwb_fusion=false \
  xla_tpu_licm_size_inflation_ratio=2.0 \
  ; do
  echo "=== copt: $opt ==="
  timeout 900 python tools/bench_opts.py --variant base --batch 32 --copt "$opt" 2>&1 | tail -1
done

echo "=== [P3] attr_trace step anatomy on the current base ==="
timeout 1200 python tools/attr_trace.py --batch 32 2>&1 | tail -30
echo "QUEUE_P_DONE"
