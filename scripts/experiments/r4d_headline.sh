#!/usr/bin/env bash
# Round-4 final TPU block: re-anchor the QUALITY HEADLINE on the shipping
# default (gelu_poly) with variance bars — 3 seeds of the scratch-30
# MKGformer recipe (the current headline 0.290/0.301 is a single erf seed)
# — plus one attr_trace step-anatomy snapshot at the poly base (the ledger's
# tail percentages were measured on the erf base).
# Chains after r4c_quality.sh (waits for QUEUE_R4C_DONE) and is
# deadline-guarded so the driver's end-of-round bench.py gets a free chip.
set -x -o pipefail
cd /root/repo
DREF=/root/reference/MarT/dataset
CACHE=/tmp/mkg_runs/cache
OUT=/tmp/r4b
DEADLINE_UTC=${DEADLINE_UTC:-"15:20"}
mkdir -p "$OUT/logs"

for i in $(seq 1 240); do
  grep -q QUEUE_R4C_DONE /tmp/r4c_driver.log 2>/dev/null && break
  sleep 30
done
grep -q QUEUE_R4C_DONE /tmp/r4c_driver.log 2>/dev/null || {
  echo "R4C_STILL_RUNNING: refusing to share the chip"; exit 3; }
for i in $(seq 1 40); do
  pgrep -f "mkg_analogy_tpu.cli.main" >/dev/null 2>&1 || break
  sleep 15
done

TUNNEL_OK=0
for i in $(seq 1 10); do
  if timeout 60 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    TUNNEL_OK=1; break
  fi
  sleep 20
done
[ "$TUNNEL_OK" = 1 ] || { echo "TUNNEL_DEAD"; exit 3; }

past_deadline () { [ "$(date -u +%H:%M)" \> "$DEADLINE_UTC" ]; }
secs_to_deadline () {
  local now dl
  now=$(date -u +%s); dl=$(date -u -d "today $DEADLINE_UTC" +%s)
  echo $(( dl > now ? dl - now : 0 ))
}

run_stage () {  # usage: run_stage NAME TIMEOUT_S -- cmd...
  local name=$1 tmo=$2; shift 2
  if past_deadline; then echo "=== [$name] SKIPPED (past $DEADLINE_UTC UTC) ==="; return 9; fi
  local cap=$(( $(secs_to_deadline) + 300 ))
  [ "$tmo" -gt "$cap" ] && tmo=$cap
  echo "=== [$name] start $(date -u '+%F %T') timeout=${tmo}s ==="
  timeout "$tmo" "$@" > "$OUT/logs/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc end $(date -u '+%F %T') ==="
  tail -4 "$OUT/logs/$name.log"
  return $rc
}

COMMON=( --model_class MKGformerKGC --max_seq_length 128 --eval_batch_size 128
         --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" )

for seed in 7 13 21; do
  run_stage "poly30_s$seed" 2400 python -m mkg_analogy_tpu.cli.main "${COMMON[@]}" \
    --batch_size 32 --lr 5e-5 --alpha 0.43 --seed "$seed" --max_epochs 30 \
    --output_dir "$OUT/poly30_s$seed" --log_dir "$OUT/logs/tb_poly30_s$seed"
done

run_stage attr_poly 1200 python tools/attr_trace.py --batch 32 --out /tmp/mkg_attr_poly

echo "QUEUE_R4D_DONE"
