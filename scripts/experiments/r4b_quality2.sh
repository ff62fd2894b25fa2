#!/usr/bin/env bash
# Remainder of the r4b quality queue, reordered mid-session: the gelu_poly
# throughput win (+6.8% at B=32) makes a SECOND poly quality seed more
# valuable than the second ViLBERT arm, and the erf seed spread observed
# at s13 (MRR 0.2823 vs s7's 0.2965) confirms single-seed gelu deltas are
# inside seed chaos. Run after killing the original queue between stages.
set -x -o pipefail
cd /root/repo
DREF=/root/reference/MarT/dataset
CACHE=/tmp/mkg_runs/cache
OUT=/tmp/r4b
DEADLINE_UTC=${DEADLINE_UTC:-"12:48"}
mkdir -p "$OUT/logs"

# The original queue's supervisor is killed BETWEEN stages, but its
# current `timeout python -m ...cli.main` child survives reparented to
# PID 1 (CLAUDE.md wrapper-PID gotcha) — wait for it to drain so the chip
# stays single-client.
for i in $(seq 1 120); do
  pgrep -f "mkg_analogy_tpu.cli.main" >/dev/null 2>&1 || break
  sleep 30
done

past_deadline () { [ "$(date -u +%H:%M)" \> "$DEADLINE_UTC" ]; }
secs_to_deadline () {
  local now dl
  now=$(date -u +%s); dl=$(date -u -d "today $DEADLINE_UTC" +%s)
  echo $(( dl > now ? dl - now : 0 ))
}

run_stage () {
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

ft () {
  local name=$1 seed=$2; shift 2
  run_stage "$name" 3600 "${COMMON[@]}" \
    --batch_size 32 --lr 5e-5 --alpha 0.43 --seed "$seed" --max_epochs 15 \
    --output_dir "$OUT/$name" --log_dir "$OUT/logs/tb_$name" "$@"
}

ft poly15_s13 13 --gelu_impl poly

for feat in synthetic synthetic_noise; do
  run_stage "vil_$feat" 5400 \
    --model_class VilBertKGC --max_seq_length 128 --eval_batch_size 128 \
    --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" \
    --batch_size 64 --lr 5e-5 --alpha 0.43 --max_epochs 20 \
    --image_features "$feat" \
    --output_dir "$OUT/vil_$feat" --log_dir "$OUT/logs/tb_vil_$feat"
done

ft poly15_s21 21 --gelu_impl poly
ft scratch15_s21_tanh 21 --exact_gelu 0

echo "QUEUE_R4B_QUALITY2_DONE"
