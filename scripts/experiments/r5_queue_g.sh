#!/usr/bin/env bash
# Round-5 chip queue G (opportunistic, after r5_queue_f): the RSME
# **Analogy** chain at the reference budget. run_finetune.sh finetunes
# --model Analogy (lr 5e-3, 300 ep, batch 1000) from a checkpoint; the
# reference's strict state_dict load (learn.py:112-117) requires a
# shape-identical pretrain, so the chain is Analogy pretrain (run.sh
# budget: rank 1000, lr 1e-2, 300 ep) -> Analogy finetune. Queue BC's
# rsme_pt/rsme_ft covered the ComplEx chain; this completes the recipe
# surface. Skipped automatically inside the DEADLINE_UTC window.
set -x -o pipefail
cd /root/repo
DREF=/root/reference/MarT/dataset
OUT=/tmp/r5
DEADLINE_UTC=${DEADLINE_UTC:-"03:15"}
mkdir -p "$OUT/logs"

for i in $(seq 1 700); do
  grep -q "QUEUE_R5F_DONE" /tmp/r5f_driver.log 2>/dev/null && break
  sleep 60
done
for i in $(seq 1 60); do
  pgrep -f "mkg_analogy_tpu.cli" >/dev/null 2>&1 || break
  sleep 30
done
pgrep -f "mkg_analogy_tpu.cli" >/dev/null 2>&1 && {
  echo "F_STILL_RUNNING"; exit 3; }

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

run_stage rsme_analogy_pt 7200 python -m mkg_analogy_tpu.cli.rsme \
  --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" \
  --model Analogy --rank 1000 --learning_rate 1e-2 --max_epochs 300 \
  --batch_size 1000 --valid 3 --seed 0 \
  --output_dir "$OUT/rsme_analogy_pt" --log_dir "$OUT/logs/tb_rsme_an"
if [ -d "$OUT/rsme_analogy_pt/ckpt" ]; then
  run_stage rsme_analogy_ft 5400 python -m mkg_analogy_tpu.cli.rsme \
    --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" \
    --model Analogy --rank 1000 --finetune --ckpt "$OUT/rsme_analogy_pt/ckpt" \
    --learning_rate 5e-3 --max_epochs 300 --batch_size 1000 --seed 0 \
    --output_dir "$OUT/rsme_analogy_ft" --log_dir "$OUT/logs/tb_rsme_an"
fi

echo "QUEUE_R5G_DONE"
