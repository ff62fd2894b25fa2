#!/usr/bin/env bash
# Round-5 chip queue D (VERDICT r4 item 7 — the MFU bite), after r5_queue_bc:
#   1. bench_opts base re-anchor + the qkgrad variant (bf16 attention dq/dk
#      backward, models/common.py QK_BF16_GRAD) at B=32 and B=64.
#   2. If qkgrad is a real win, the end-to-end quality gate the tanh
#      retraction demands: scratch-15 poly+qkgrad at seeds 7/13/21 — the
#      comparison set (poly15 s7/s13/s21 = 0.2783/0.2761/0.2812 H@1,
#      RESULTS.md round-4 gelu A/B) already exists.
#   3. Final bench.py anchor on the shipping default.
set -x -o pipefail
cd /root/repo
DREF=/root/reference/MarT/dataset
CACHE=/tmp/mkg_runs/cache
OUT=/tmp/r5
DEADLINE_UTC=${DEADLINE_UTC:-"03:15"}
mkdir -p "$OUT/logs"

for i in $(seq 1 600); do
  grep -q "QUEUE_R5BC_DONE" /tmp/r5bc_driver.log 2>/dev/null && break
  sleep 60
done
for i in $(seq 1 60); do
  pgrep -f "mkg_analogy_tpu.cli" >/dev/null 2>&1 || break
  sleep 30
done
pgrep -f "mkg_analogy_tpu.cli" >/dev/null 2>&1 && {
  echo "BC_STILL_RUNNING"; exit 3; }

probe_tunnel () {
  for i in $(seq 1 15); do
    if timeout 60 python -c "import jax; assert jax.devices()" 2>/dev/null; then
      return 0
    fi
    sleep 20
  done
  echo "TUNNEL_DEAD"; return 1
}

secs_to_deadline () {
  local now dl
  now=$(date -u +%s); dl=$(date -u -d "today $DEADLINE_UTC" +%s)
  [ "$dl" -le "$now" ] && dl=$(date -u -d "tomorrow $DEADLINE_UTC" +%s)
  echo $(( dl - now ))
}

run_stage () {  # usage: run_stage NAME TIMEOUT_S cmd...
  local name=$1 tmo=$2; shift 2
  local left; left=$(secs_to_deadline)
  if [ "$left" -lt 600 ] || [ "$left" -gt 64800 ]; then
    echo "=== [$name] SKIPPED (deadline) ==="; return 9
  fi
  [ "$tmo" -gt "$left" ] && tmo=$left
  probe_tunnel || return 3
  echo "=== [$name] start $(date -u '+%F %T') timeout=${tmo}s ==="
  timeout "$tmo" "$@" > "$OUT/logs/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc end $(date -u '+%F %T') ==="
  tail -3 "$OUT/logs/$name.log"
  return $rc
}

run_stage bench_base 1800 python tools/bench_opts.py --batch 32 --variant base
run_stage bench_qkgrad 1800 python tools/bench_opts.py --batch 32 --variant qkgrad
run_stage bench_base2 1200 python tools/bench_opts.py --batch 32 --variant base
run_stage bench_qkgrad2 1200 python tools/bench_opts.py --batch 32 --variant qkgrad
run_stage bench_qkgrad64 1500 python tools/bench_opts.py --batch 64 --variant qkgrad

# Quality gate arms (only meaningful if the bench stages show a win; cheap
# enough to run unconditionally — each ~11 min).
for seed in 7 13 21; do
  run_stage "qk15_s$seed" 2400 python -m mkg_analogy_tpu.cli.main \
    --model_class MKGformerKGC --max_seq_length 128 --eval_batch_size 128 \
    --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" \
    --batch_size 32 --lr 5e-5 --alpha 0.43 --seed "$seed" --max_epochs 15 \
    --qk_bf16_grad 1 \
    --output_dir "$OUT/qk15_s$seed" --log_dir "$OUT/logs/tb_qk15_s$seed"
done

run_stage bench_final 2400 python bench.py

echo "QUEUE_R5D_DONE"
