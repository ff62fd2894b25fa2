#!/usr/bin/env bash
# Round-5 chip queue F (opportunistic, last in line after r5_queue_e):
# ViLT-15 at seeds 13/21 — the honest family table's #2 row (H@1 0.291 /
# MRR 0.301) is single-seed; ~20 min per arm makes it the cheapest
# remaining variance upgrade. Skipped automatically if the DEADLINE_UTC
# window is reached first.
set -x -o pipefail
cd /root/repo
DREF=/root/reference/MarT/dataset
CACHE=/tmp/mkg_runs/cache
OUT=/tmp/r5
DEADLINE_UTC=${DEADLINE_UTC:-"03:15"}
mkdir -p "$OUT/logs"

for i in $(seq 1 700); do
  grep -q "QUEUE_R5E_DONE" /tmp/r5e_driver.log 2>/dev/null && break
  sleep 60
done
for i in $(seq 1 60); do
  pgrep -f "mkg_analogy_tpu.cli" >/dev/null 2>&1 || break
  sleep 30
done
pgrep -f "mkg_analogy_tpu.cli" >/dev/null 2>&1 && {
  echo "E_STILL_RUNNING"; exit 3; }

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

for seed in 13 21; do
  run_stage "vilt15_s$seed" 2400 python -m mkg_analogy_tpu.cli.main \
    --model_class ViltKGC --max_seq_length 128 --eval_batch_size 128 \
    --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" \
    --batch_size 32 --lr 4e-5 --alpha 0.3 --seed "$seed" --max_epochs 15 \
    --output_dir "$OUT/vilt15_s$seed" --log_dir "$OUT/logs/tb_vilt15_s$seed"
done

echo "QUEUE_R5F_DONE"
