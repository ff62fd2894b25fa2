#!/usr/bin/env bash
# Round-4 continuation queue (session restart extended the wall-clock past
# the r4b supervisors' 12:48 deadline): the arms r4b_quality2.sh will skip.
# Priority order:
#   1. vil_synthetic_noise — second ViLBERT region-ablation arm (pairs with
#      the vil_synthetic arm; VERDICT r3 "RESULTS dangling references").
#   2. poly15_s21 — third gelu_poly quality seed (completes the 3-seed
#      erf-vs-poly table in RESULTS.md).
#   3. B0/B0ft mixed-diet pretrain->finetune (VERDICT r3 item 6).
#   4. B1/B1ft alpha=0 analogy-pretrain control (prices relaxation-in-
#      pretrain, the documented deliberate extension).
#   5. scratch15_s21_tanh — tanh seed-21 pair (lowest value; only if time).
# Guards: waits for the r4b_quality2 supervisor to finish AND for every
# cli.main child to drain (wrapper-PID gotcha), probes the tunnel, refuses
# to start stages after DEADLINE_UTC so the driver's end-of-round bench
# never shares the chip.
set -x -o pipefail
cd /root/repo
DREF=/root/reference/MarT/dataset
CACHE=/tmp/mkg_runs/cache
OUT=/tmp/r4b
DEADLINE_UTC=${DEADLINE_UTC:-"15:30"}
mkdir -p "$OUT/logs"

# Wait for the old queue (it self-terminates after vil_synthetic, whose
# timeout expires by ~12:52 UTC).
for i in $(seq 1 120); do
  pgrep -f "mkg_analogy_tpu.cli.main" >/dev/null 2>&1 || break
  sleep 30
done
pgrep -f "mkg_analogy_tpu.cli.main" >/dev/null 2>&1 && {
  echo "OLD_QUEUE_STILL_RUNNING: refusing to share the chip"; exit 3; }

TUNNEL_OK=0
for i in $(seq 1 30); do
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

run_stage () {  # usage: run_stage NAME TIMEOUT_S cli-args...
  local name=$1 tmo=$2; shift 2
  if past_deadline; then echo "=== [$name] SKIPPED (past $DEADLINE_UTC UTC) ==="; return 9; fi
  local cap=$(( $(secs_to_deadline) + 240 ))
  [ "$tmo" -gt "$cap" ] && tmo=$cap
  echo "=== [$name] start $(date -u '+%F %T') timeout=${tmo}s ==="
  timeout "$tmo" python -m mkg_analogy_tpu.cli.main "$@" \
    > "$OUT/logs/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc end $(date -u '+%F %T') ==="
  tail -4 "$OUT/logs/$name.log"
  return $rc
}

COMMON=( --model_class MKGformerKGC --max_seq_length 128 --eval_batch_size 128
         --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" )

ft () {  # usage: ft NAME SEED extra-args...
  local name=$1 seed=$2; shift 2
  run_stage "$name" 3600 "${COMMON[@]}" \
    --batch_size 32 --lr 5e-5 --alpha 0.43 --seed "$seed" --max_epochs 15 \
    --output_dir "$OUT/$name" --log_dir "$OUT/logs/tb_$name" "$@"
}

# 1. Second ViLBERT region arm (same poly default as the completed
#    vil_synthetic arm — the synthetic-vs-noise comparison is internal).
#    The r4b_quality2 queue may have finished this arm itself if its
#    1478s deadline cap sufficed; skip iff its log carries test metrics.
if grep -q "test/Eval_entity/mrr" "$OUT/logs/vil_synthetic_noise.log" 2>/dev/null; then
  echo "=== [vil_synthetic_noise] already complete (old queue), skipping ==="
else
  run_stage vil_synthetic_noise 3000 \
    --model_class VilBertKGC --max_seq_length 128 --eval_batch_size 128 \
    --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" \
    --batch_size 64 --lr 5e-5 --alpha 0.43 --max_epochs 20 \
    --image_features synthetic_noise \
    --output_dir "$OUT/vil_synthetic_noise" --log_dir "$OUT/logs/tb_vil_synthetic_noise"
fi

# 2. Third poly quality seed.
ft poly15_s21 21 --gelu_impl poly

# 3. Mixed-diet pretrain -> finetune (erf pinned: the comparison set —
#    pt_analogy arms + scratch control — all ran under erf).
run_stage B0 4800 "${COMMON[@]}" \
  --batch_size 64 --lr 5e-5 --pretrain 1 --pretrain_format mixed \
  --max_epochs 15 --gelu_impl erf \
  --output_dir "$OUT/pt_mixed" --log_dir "$OUT/logs/tb_pt_mixed"
B0_RC=$?
if [ "$B0_RC" -eq 0 ] && [ -d "$OUT/pt_mixed/ckpt" ]; then
  ft ft15_mixed_s7 7 --checkpoint "$OUT/pt_mixed/ckpt" --gelu_impl erf
else
  echo "B0_FAILED rc=$B0_RC: skipping mixed finetune"
fi

# 4. alpha=0 analogy-pretrain control.
run_stage B1 4800 "${COMMON[@]}" \
  --batch_size 64 --lr 5e-5 --pretrain 1 --pretrain_format analogy \
  --alpha 0.0 --max_epochs 15 --gelu_impl erf \
  --output_dir "$OUT/pt_analogy_a0" --log_dir "$OUT/logs/tb_pt_analogy_a0"
B1_RC=$?
if [ "$B1_RC" -eq 0 ] && [ -d "$OUT/pt_analogy_a0/ckpt" ]; then
  ft ft15_a0_s7 7 --checkpoint "$OUT/pt_analogy_a0/ckpt" --gelu_impl erf
else
  echo "B1_FAILED rc=$B1_RC: skipping alpha-0 finetune"
fi

# 5. Deadline-permitting: tanh seed-21 pair.
ft scratch15_s21_tanh 21 --exact_gelu 0

echo "QUEUE_R4C_DONE"
