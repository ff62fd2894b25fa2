#!/usr/bin/env bash
# Round-4 final continuation (v4): replaces supervisor v2's E0 branch.
# Rationale: at the observed degraded-tunnel pace (~320 ex/s arms), the
# E0 erf-pretrain (90+ min) would consume the rest of the window with no
# time for its downstream finetunes, and its /tmp checkpoint would not
# survive an inter-round VM restart. Better allocation for the remaining
# window, in priority order:
#   1. ft30_s7 — headline attempt: 30-epoch erf finetune from the existing
#      analogy pretrain (ft15 interim shows strong transfer: dev MRR
#      0.071/0.121/0.161 @ epochs 1-3 vs scratch 0.027-0.05)
#   2. scratch15_s13_erf — second same-seed gelu pair (tanh s13 = 0.2912)
#   3. ViLBERT region arms (RESULTS queue-E promise)
#   4. scratch15_s21_erf2 / s21_tanh — third pair + boundary-arm id
set -x -o pipefail
cd /root/repo
DREF=/root/reference/MarT/dataset
OUT=/tmp/r4q
DEADLINE_UTC=${DEADLINE_UTC:-"08:55"}
mkdir -p "$OUT/logs"

past_deadline () { [ "$(date -u +%H:%M)" \> "$DEADLINE_UTC" ]; }
secs_to_deadline () {
  local now dl
  now=$(date -u +%s)
  dl=$(date -u -d "today $DEADLINE_UTC" +%s)
  echo $(( dl > now ? dl - now : 0 ))
}

run_stage () {
  local name=$1 tmo=$2; shift 2
  if past_deadline; then echo "=== [$name] SKIPPED (past $DEADLINE_UTC UTC) ==="; return 9; fi
  local cap=$(( $(secs_to_deadline) + 300 ))
  [ "$tmo" -gt "$cap" ] && tmo=$cap
  echo "=== [$name] start $(date -u '+%F %T') timeout=${tmo}s ==="
  timeout "$tmo" python -m mkg_analogy_tpu.cli.main "$@" \
    > "$OUT/logs/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc end $(date -u '+%F %T') ==="
  tail -3 "$OUT/logs/$name.log"
  return $rc
}

COMMON=( --model_class MKGformerKGC --max_seq_length 128 --eval_batch_size 128
         --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG"
         --cache_dir /tmp/mkg_runs/cache )

run_stage ft30_s7 5400 "${COMMON[@]}" \
  --batch_size 32 --lr 5e-5 --alpha 0.43 --seed 7 --max_epochs 30 \
  --checkpoint "$OUT/pt_analogy/ckpt" \
  --output_dir "$OUT/ft30_s7" --log_dir "$OUT/logs/tb_ft30_s7"

run_stage scratch15_s13_erf 3600 "${COMMON[@]}" \
  --batch_size 32 --lr 5e-5 --alpha 0.43 --seed 13 --max_epochs 15 \
  --exact_gelu 1 \
  --output_dir "$OUT/scratch15_s13_erf" --log_dir "$OUT/logs/tb_scratch15_s13_erf"

for feat in synthetic synthetic_noise; do
  run_stage "vil_$feat" 5400 \
    --model_class VilBertKGC --max_seq_length 128 --eval_batch_size 128 \
    --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" \
    --cache_dir /tmp/mkg_runs/cache \
    --batch_size 64 --lr 5e-5 --alpha 0.43 --max_epochs 20 \
    --image_features "$feat" \
    --output_dir "$OUT/vil_$feat" --log_dir "$OUT/logs/tb_vil_$feat"
done

run_stage scratch15_s21_erf2 3600 "${COMMON[@]}" \
  --batch_size 32 --lr 5e-5 --alpha 0.43 --seed 21 --max_epochs 15 \
  --exact_gelu 1 \
  --output_dir "$OUT/scratch15_s21_erf2" --log_dir "$OUT/logs/tb_scratch15_s21_erf2"

run_stage scratch15_s21_tanh 3600 "${COMMON[@]}" \
  --batch_size 32 --lr 5e-5 --alpha 0.43 --seed 21 --max_epochs 15 \
  --exact_gelu 0 \
  --output_dir "$OUT/scratch15_s21_tanh" --log_dir "$OUT/logs/tb_scratch15_s21_tanh"

echo "QUEUE_V4_DONE"
