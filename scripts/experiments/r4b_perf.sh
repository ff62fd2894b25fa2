#!/usr/bin/env bash
# Round-4 (continuation session) MFU microsession, run BEFORE the quality
# arms: the gelupoly throughput verdict decides whether poly quality arms
# are worth chip time. Replaces r4_perf.sh's tanh framing (tanh retracted).
#
# Measures, at the recipe point unless stated:
#   P0  erf base re-anchor, B=32 x2 (the honest production number)
#   P1  gelupoly B=32 x2 (candidate: erf semantics to 2.2e-6, cheap VPU)
#   P2  gelutanh B=32 x1 (retracted ceiling, context only)
#   P3  erf + gelupoly at B=64 (throughput sweet spot re-anchor)
#   P4  autolayout B=32 x2 (copy-done tail candidate)
#   P5  two XLA flag probes on the erf base
# Logs: stages write to stdout — run as
#   bash r4b_perf.sh > /tmp/r4b_perf_driver.log 2>&1
# (r4b_quality.sh's POLY_GO gate reads /tmp/r4b_perf_driver.log; a
# different redirect silently disables the poly quality arms).
set -x -o pipefail
cd /root/repo
OUT=/tmp/r4b
mkdir -p "$OUT"

TUNNEL_OK=0
for i in $(seq 1 30); do
  if timeout 60 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    TUNNEL_OK=1; break
  fi
  sleep 20
done
if [ "$TUNNEL_OK" != 1 ]; then echo "TUNNEL_DEAD"; exit 3; fi

run () {
  local tag=$1; shift
  echo "=== [$tag] $(date -u '+%T') ==="
  timeout 900 python tools/bench_opts.py "$@" 2>&1 | tail -1
  local rc=${PIPESTATUS[0]}
  echo "=== [$tag] rc=$rc ==="
}

run P0a --variant base --batch 32
run P0b --variant base --batch 32
run P1a --variant gelupoly --batch 32
run P1b --variant gelupoly --batch 32
run P2  --variant gelutanh --batch 32
run P3a --variant base --batch 64
run P3b --variant gelupoly --batch 64
run P4a --variant autolayout --batch 32
run P4b --variant autolayout --batch 32
run P5a --variant base --batch 32 --copt xla_tpu_enable_latency_hiding_scheduler=true
run P5b --variant base --batch 32 --copt xla_tpu_rwb_fusion=false
echo "QUEUE_R4B_PERF_DONE"
