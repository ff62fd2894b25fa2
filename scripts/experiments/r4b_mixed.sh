#!/usr/bin/env bash
# Round-4 opportunistic quality arms (run AFTER r4_perf.sh releases the
# TPU): the mixed triple+analogy pretrain diet (--pretrain_format mixed,
# VERDICT r3 item 6) and an alpha=0 analogy-pretrain control (relaxation
# loss is ON during analogy pretraining by default — alpha 0.4; this arm
# prices that deliberate extension).
#
# Guards: waits for QUEUE_P_DONE (perf session finished), probes the
# tunnel, and refuses to start any stage after DEADLINE_UTC so the
# driver's end-of-round bench.py never shares the chip.
set -x -o pipefail
cd /root/repo
DREF=/root/reference/MarT/dataset
CACHE=/tmp/mkg_runs/cache
OUT=/tmp/r4b
DEADLINE_UTC=${DEADLINE_UTC:-"09:00"}
mkdir -p "$OUT/logs"

if [ "${1:-}" != "--nowait" ]; then
  for i in $(seq 1 480); do
    grep -q QUEUE_P_DONE /tmp/r4perf_driver.log 2>/dev/null && break
    sleep 60
  done
  grep -q QUEUE_P_DONE /tmp/r4perf_driver.log 2>/dev/null || {
    echo "PERF_STILL_RUNNING: refusing to share the chip"; exit 3; }
fi
TUNNEL_OK=0
for i in $(seq 1 30); do
  if timeout 60 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    TUNNEL_OK=1; break
  fi
  sleep 20
done
[ "$TUNNEL_OK" = 1 ] || { echo "TUNNEL_DEAD"; exit 3; }

past_deadline () {
  [ "$(date -u +%H:%M)" \> "$DEADLINE_UTC" ]
}

run_stage () {  # usage: run_stage NAME TIMEOUT_S cli-args...
  local name=$1 tmo=$2; shift 2
  if past_deadline; then echo "=== [$name] SKIPPED (past $DEADLINE_UTC UTC) ==="; return 9; fi
  echo "=== [$name] start $(date -u '+%F %T') ==="
  timeout "$tmo" python -m mkg_analogy_tpu.cli.main "$@" \
    > "$OUT/logs/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc end $(date -u '+%F %T') ==="
  tail -4 "$OUT/logs/$name.log"
  return $rc
}

COMMON=( --model_class MKGformerKGC --max_seq_length 128 --eval_batch_size 128
         --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" )

echo "=== [B0] mixed-diet pretrain, 15 ep (total steps ~ a 30-ep single diet) ==="
run_stage B0 7200 "${COMMON[@]}" \
  --batch_size 64 --lr 5e-5 --pretrain 1 --pretrain_format mixed \
  --max_epochs 15 \
  --output_dir "$OUT/pt_mixed" --log_dir "$OUT/logs/tb_pt_mixed"
B0_RC=$?
if [ "$B0_RC" -eq 0 ] && [ -d "$OUT/pt_mixed/ckpt" ]; then
  run_stage B0ft 5400 "${COMMON[@]}" \
    --batch_size 32 --lr 5e-5 --alpha 0.43 --seed 7 --max_epochs 15 \
    --checkpoint "$OUT/pt_mixed/ckpt" \
    --output_dir "$OUT/ft15_mixed_s7" --log_dir "$OUT/logs/tb_ft15_mixed_s7"
else
  echo "B0_FAILED rc=$B0_RC: skipping mixed finetune"
fi

echo "=== [B1] alpha=0 analogy pretrain control, 15 ep ==="
run_stage B1 7200 "${COMMON[@]}" \
  --batch_size 64 --lr 5e-5 --pretrain 1 --pretrain_format analogy \
  --alpha 0.0 --max_epochs 15 \
  --output_dir "$OUT/pt_analogy_a0" --log_dir "$OUT/logs/tb_pt_analogy_a0"
B1_RC=$?
if [ "$B1_RC" -eq 0 ] && [ -d "$OUT/pt_analogy_a0/ckpt" ]; then
  run_stage B1ft 5400 "${COMMON[@]}" \
    --batch_size 32 --lr 5e-5 --alpha 0.43 --seed 7 --max_epochs 15 \
    --checkpoint "$OUT/pt_analogy_a0/ckpt" \
    --output_dir "$OUT/ft15_a0_s7" --log_dir "$OUT/logs/tb_ft15_a0_s7"
else
  echo "B1_FAILED rc=$B1_RC: skipping alpha-0 finetune"
fi
echo "QUEUE_B_DONE"
