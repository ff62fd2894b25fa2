#!/usr/bin/env bash
# Round-5 chip queue A (VERDICT r4 items 1, 2, 5):
#   1. poly30_s{7,13,21} — the 3-seed scratch-30 headline re-anchor on the
#      shipping gelu_poly default; the new eval instrumentation dumps
#      per-mode metrics + tie counts + test_ranks.npz for the Hits@k
#      flatness investigation (VERDICT item 2) for free.
#   2. attr_poly — step-anatomy snapshot at the poly base (the ledger's
#      tail percentages were measured on the erf base).
#   3. ls0_s7 / a0scr_s7 — scratch-15 A/Bs of label_smoothing=0 and
#      alpha=0 against poly15_s7 (0.2783/0.2924) for their effect on
#      H@5/H@10 specifically.
#   4. flava15 — FLAVA at its full reference recipe (run_finetune_flava.sh:
#      lr 5e-5, alpha 0.45, bsz 24, 15 epochs) for the honest family table.
# Serial on the chip; tunnel-probed between stages; each stage logs to
# /tmp/r5/logs/<name>.log and the driver log carries start/end/rc lines.
set -x -o pipefail
cd /root/repo
DREF=/root/reference/MarT/dataset
CACHE=/tmp/mkg_runs/cache
OUT=/tmp/r5
mkdir -p "$OUT/logs"

probe_tunnel () {
  for i in $(seq 1 10); do
    if timeout 60 python -c "import jax; assert jax.devices()" 2>/dev/null; then
      return 0
    fi
    sleep 20
  done
  echo "TUNNEL_DEAD"; return 1
}

run_stage () {  # usage: run_stage NAME TIMEOUT_S -- cmd...
  local name=$1 tmo=$2; shift 2
  probe_tunnel || return 3
  echo "=== [$name] start $(date -u '+%F %T') timeout=${tmo}s ==="
  timeout "$tmo" "$@" > "$OUT/logs/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc end $(date -u '+%F %T') ==="
  tail -3 "$OUT/logs/$name.log"
  return $rc
}

COMMON=( --model_class MKGformerKGC --max_seq_length 128 --eval_batch_size 128
         --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" )

for seed in 7 13 21; do
  run_stage "poly30_s$seed" 3600 python -m mkg_analogy_tpu.cli.main "${COMMON[@]}" \
    --batch_size 32 --lr 5e-5 --alpha 0.43 --seed "$seed" --max_epochs 30 \
    --output_dir "$OUT/poly30_s$seed" --log_dir "$OUT/logs/tb_poly30_s$seed"
done

run_stage attr_poly 1500 python tools/attr_trace.py --batch 32 --out /tmp/mkg_attr_poly

run_stage ls0_s7 1800 python -m mkg_analogy_tpu.cli.main "${COMMON[@]}" \
  --batch_size 32 --lr 5e-5 --alpha 0.43 --seed 7 --max_epochs 15 \
  --label_smoothing 0.0 \
  --output_dir "$OUT/ls0_s7" --log_dir "$OUT/logs/tb_ls0_s7"

run_stage a0scr_s7 1800 python -m mkg_analogy_tpu.cli.main "${COMMON[@]}" \
  --batch_size 32 --lr 5e-5 --alpha 0.0 --seed 7 --max_epochs 15 \
  --output_dir "$OUT/a0scr_s7" --log_dir "$OUT/logs/tb_a0scr_s7"

run_stage flava15 3600 python -m mkg_analogy_tpu.cli.main \
  --model_class FlavaKGC --max_seq_length 128 --eval_batch_size 128 \
  --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" \
  --batch_size 24 --lr 5e-5 --alpha 0.45 --seed 7 --max_epochs 15 \
  --output_dir "$OUT/flava15" --log_dir "$OUT/logs/tb_flava15"

echo "QUEUE_R5A_DONE"
