#!/usr/bin/env bash
# Round-4 quality pipeline, regenerated FROM ZERO (the round-3 VM restart
# wiped /tmp: all checkpoints and npz/data caches are gone). Strictly
# serial, one TPU client.
#
# Closes VERDICT r3 items 1 (analogy-pretrain -> finetune A/B vs the
# scratch control) and 5 (seed variance bars: 3 seeds x scratch-15 and
# 3 seeds x the pretrain->ft15 arm), plus the ViLBERT region arms.
#
# Advisor findings addressed (ADVICE.md r3):
#  - set -o pipefail + per-stage rc capture; Q1/Q2/seed-ft arms are
#    SKIPPED (marked Q0_FAILED) unless Q0 exits 0.
#  - tunnel probe exits 3 instead of falling through to a dead device.
#  - Q0 budget raised 10800 -> 14400 s (wall-clock of the r3b analogy
#    pretrain was never recorded; the pipeline is serial so slack is free).
set -x -o pipefail
cd /root/repo
DREF=/root/reference/MarT/dataset
CACHE=/tmp/mkg_runs/cache
OUT=/tmp/r4q
mkdir -p "$OUT/logs"

TUNNEL_OK=0
for i in $(seq 1 120); do
  if timeout 60 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "TUNNEL_OK after $i probes"; TUNNEL_OK=1; break
  fi
  sleep 25
done
if [ "$TUNNEL_OK" != 1 ]; then echo "TUNNEL_DEAD: no device, aborting"; exit 3; fi

run_stage () {  # usage: run_stage NAME TIMEOUT_S cli-args...
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] start $(date -u '+%F %T') ==="
  timeout "$tmo" python -m mkg_analogy_tpu.cli.main "$@" \
    > "$OUT/logs/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc end $(date -u '+%F %T') ==="
  tail -6 "$OUT/logs/$name.log"
  return $rc
}

COMMON=( --model_class MKGformerKGC --max_seq_length 128 --eval_batch_size 128
         --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" )

echo "=== [Q0] analogy-format MarKG pretrain, 30 ep (rebuilds caches) ==="
run_stage Q0 14400 "${COMMON[@]}" \
  --batch_size 64 --lr 5e-5 --pretrain 1 --pretrain_format analogy \
  --max_epochs 30 \
  --output_dir "$OUT/pt_analogy" --log_dir "$OUT/logs/tb_pt_analogy"
Q0_RC=$?
echo "Q0_RC=$Q0_RC"
PT_CKPT="$OUT/pt_analogy/ckpt"

ft () {  # usage: ft NAME SEED EPOCHS [extra args...]
  local name=$1 seed=$2 epochs=$3; shift 3
  run_stage "$name" 5400 "${COMMON[@]}" \
    --batch_size 32 --lr 5e-5 --alpha 0.43 --seed "$seed" \
    --max_epochs "$epochs" \
    --output_dir "$OUT/$name" --log_dir "$OUT/logs/tb_$name" "$@"
}

# Scratch controls first (independent of Q0): same-code seed-variance arms.
for seed in 7 13 21; do
  ft "scratch15_s$seed" "$seed" 15
done

if [ "$Q0_RC" -eq 0 ] && [ -d "$PT_CKPT" ]; then
  echo "=== [Q1] ft15 from analogy pretrain, 3 seeds (A/B vs scratch) ==="
  for seed in 7 13 21; do
    ft "ft15_s$seed" "$seed" 15 --checkpoint "$PT_CKPT"
  done
  echo "=== [Q2] ft30 from analogy pretrain (headline attempt vs 0.301) ==="
  ft "ft30_s7" 7 30 --checkpoint "$PT_CKPT"
else
  echo "Q0_FAILED rc=$Q0_RC ckpt_present=$([ -d "$PT_CKPT" ] && echo yes || echo no): skipping Q1/Q2 pretrain arms"
fi

echo "=== [Q3] ViLBERT region ablation: synthetic / synthetic_noise ==="
for feat in synthetic synthetic_noise; do
  run_stage "vil_$feat" 7200 \
    --model_class VilBertKGC --max_seq_length 128 --eval_batch_size 128 \
    --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" \
    --batch_size 64 --lr 5e-5 --alpha 0.43 --max_epochs 20 \
    --image_features "$feat" \
    --output_dir "$OUT/vil_$feat" --log_dir "$OUT/logs/tb_vil_$feat"
done

echo "=== [C] curriculum: triple pretrain -> analogy pretrain -> finetune ==="
# VERDICT r4 item 6 (the r3i I0/I1 sketch): stack link-prediction knowledge
# (triple format) under the analogy format. seq 128 throughout so the chain
# shares the finetune geometry. Gated stage-by-stage like Q0->Q1.
run_stage C0 7200 "${COMMON[@]}" \
  --batch_size 64 --lr 5e-5 --pretrain 1 --pretrain_format triple \
  --max_epochs 15 \
  --output_dir "$OUT/pt_triple" --log_dir "$OUT/logs/tb_pt_triple"
C0_RC=$?
if [ "$C0_RC" -eq 0 ] && [ -d "$OUT/pt_triple/ckpt" ]; then
  run_stage C1 7200 "${COMMON[@]}" \
    --batch_size 64 --lr 5e-5 --pretrain 1 --pretrain_format analogy \
    --max_epochs 15 --checkpoint "$OUT/pt_triple/ckpt" \
    --output_dir "$OUT/pt_chain" --log_dir "$OUT/logs/tb_pt_chain"
  C1_RC=$?
  if [ "$C1_RC" -eq 0 ] && [ -d "$OUT/pt_chain/ckpt" ]; then
    ft "ft15_chain_s7" 7 15 --checkpoint "$OUT/pt_chain/ckpt"
  else
    echo "C1_FAILED rc=$C1_RC: skipping chain finetune"
  fi
else
  echo "C0_FAILED rc=$C0_RC: skipping curriculum chain"
fi
echo "QUEUE_Q_DONE"
