#!/usr/bin/env bash
# Round-5 chip queue B+C (VERDICT r4 items 3, 4, 8), runs after r5_queue_a:
#   B — KGE silos at the REFERENCE budgets with a real held-out split:
#     rsme_pt      ComplEx rank 1000, 300 ep, batch 1000, Adagrad 1e-2
#                  (RSME/run.sh + learn.py defaults; reg 0), 98/1/1 holdout
#     rsme_ft      ComplEx finetune, lr 5e-3, 300 ep (run_finetune.sh recipe;
#                  same model class — the reference's strict state_dict load
#                  requires shape-identical pretrain anyway, learn.py:112-117)
#     ikrl_transe_pt  2000 epochs x 100 batches, neg 25+25, margin 5, lr 1.0
#                  (IKRL.py:990-1046), native sampler on the 90/5/5 holdout
#                  export (train split only — no leakage), + triple cls
#     ikrl_transe_ft  1000 epochs, bsz 128, Adam 1e-4 (IKRL.py:1044-1056)
#     transae_pt   TransAE 2000 epochs + held-out LP (VERDICT item 4)
#     ikrl_analogy_pt dim 200 softplus 2000 epochs (IKRL.py:1014-1037)
#   C — quality-ceiling probe (item 8): mixed-diet pretrain (the best
#     measured composition, RESULTS.md round-4 mixed-diet section) chained
#     into the 30-epoch finetune at 3 seeds under the shipping poly default,
#     vs queue A's scratch-30 poly arms.
# Guards: waits for r5_queue_a to finish AND cli drain; tunnel probes; a
# DEADLINE_UTC stop so the driver's end-of-round bench gets the chip alone.
set -x -o pipefail
cd /root/repo
DREF=/root/reference/MarT/dataset
CACHE=/tmp/mkg_runs/cache
OPENKE=/tmp/r5kge/openke_holdout
OUT=/tmp/r5
DEADLINE_UTC=${DEADLINE_UTC:-"03:15"}
mkdir -p "$OUT/logs"

# Wait for queue A (it prints QUEUE_R5A_DONE; also drain any cli children).
for i in $(seq 1 360); do
  if ! pgrep -f "r5_queue_a.sh" >/dev/null 2>&1 \
     && ! pgrep -f "mkg_analogy_tpu.cli" >/dev/null 2>&1; then
    break
  fi
  sleep 60
done
pgrep -f "mkg_analogy_tpu.cli" >/dev/null 2>&1 && {
  echo "QUEUE_A_STILL_RUNNING: refusing to share the chip"; exit 3; }

probe_tunnel () {
  for i in $(seq 1 15); do
    if timeout 60 python -c "import jax; assert jax.devices()" 2>/dev/null; then
      return 0
    fi
    sleep 20
  done
  echo "TUNNEL_DEAD"; return 1
}

# Deadline math must survive crossing midnight UTC: deadline hours 00-06
# mean "tomorrow" whenever the current hour is later than the deadline hour.
secs_to_deadline () {
  local now dl
  now=$(date -u +%s); dl=$(date -u -d "today $DEADLINE_UTC" +%s)
  [ "$dl" -le "$now" ] && dl=$(date -u -d "tomorrow $DEADLINE_UTC" +%s)
  echo $(( dl - now ))
}

run_stage () {  # usage: run_stage NAME TIMEOUT_S MODULE cli-args...
  local name=$1 tmo=$2 mod=$3; shift 3
  local left; left=$(secs_to_deadline)
  if [ "$left" -lt 600 ] || [ "$left" -gt 64800 ]; then
    echo "=== [$name] SKIPPED (deadline $DEADLINE_UTC UTC, left=${left}s) ==="
    return 9
  fi
  [ "$tmo" -gt "$left" ] && tmo=$left
  probe_tunnel || return 3
  echo "=== [$name] start $(date -u '+%F %T') timeout=${tmo}s ==="
  timeout "$tmo" python -m "mkg_analogy_tpu.cli.$mod" "$@" \
    > "$OUT/logs/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc end $(date -u '+%F %T') ==="
  tail -4 "$OUT/logs/$name.log"
  return $rc
}

KGE_COMMON=( --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG"
             --in_path "$OPENKE" --use_native_sampler --seed 0
             --log_dir "$OUT/logs/tb_kge" )

# ---- B1: RSME at the reference budget ------------------------------------
run_stage rsme_pt 7200 rsme \
  --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" \
  --model ComplEx --rank 1000 --learning_rate 1e-2 --max_epochs 300 \
  --batch_size 1000 --valid 3 --seed 0 \
  --output_dir "$OUT/rsme_pt" --log_dir "$OUT/logs/tb_rsme"
if [ -d "$OUT/rsme_pt/ckpt" ]; then
  run_stage rsme_ft 5400 rsme \
    --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" \
    --model ComplEx --rank 1000 --finetune --ckpt "$OUT/rsme_pt/ckpt" \
    --learning_rate 5e-3 --max_epochs 300 --batch_size 1000 --seed 0 \
    --output_dir "$OUT/rsme_ft" --log_dir "$OUT/logs/tb_rsme"
fi

# ---- B2: IKRL-TransE at the reference budget ------------------------------
run_stage ikrl_transe_pt 10800 ikrl "${KGE_COMMON[@]}" \
  --model transe --dim 400 --train_times 2000 --nbatches 100 \
  --neg_ent 25 --neg_rel 25 --margin 5.0 --alpha 1.0 --task_mode random \
  --triple_classification --output_dir "$OUT/ikrl_transe"
if [ -d "$OUT/ikrl_transe/ckpt" ]; then
  run_stage ikrl_transe_ft 7200 ikrl "${KGE_COMMON[@]}" \
    --model transe --dim 400 --finetune --ckpt "$OUT/ikrl_transe/ckpt" \
    --finetune_epochs 1000 --finetune_bsz 128 --finetune_lr 1e-4 \
    --task_mode random --output_dir "$OUT/ikrl_transe_ft"
fi

# ---- B3: TransAE with the held-out LP eval --------------------------------
run_stage transae_pt 10800 ikrl "${KGE_COMMON[@]}" \
  --transae --model transe --dim 400 --train_times 2000 --nbatches 100 \
  --neg_ent 25 --neg_rel 25 --margin 5.0 --alpha 1.0 --task_mode text \
  --output_dir "$OUT/transae"

# ---- C: mixed-diet pretrain -> ft30 x 3 seeds (poly default) --------------
run_stage pt_mixed 6000 main \
  --model_class MKGformerKGC --max_seq_length 128 --eval_batch_size 128 \
  --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" \
  --batch_size 64 --lr 5e-5 --pretrain 1 --pretrain_format mixed \
  --max_epochs 15 --output_dir "$OUT/pt_mixed" --log_dir "$OUT/logs/tb_pt_mixed"
if [ -d "$OUT/pt_mixed/ckpt" ]; then
  for seed in 7 13 21; do
    run_stage "ft30_mixed_s$seed" 3600 main \
      --model_class MKGformerKGC --max_seq_length 128 --eval_batch_size 128 \
      --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" \
      --batch_size 32 --lr 5e-5 --alpha 0.43 --seed "$seed" --max_epochs 30 \
      --checkpoint "$OUT/pt_mixed/ckpt" \
      --output_dir "$OUT/ft30_mixed_s$seed" --log_dir "$OUT/logs/tb_ft30_mixed_s$seed"
  done
fi

# ---- B4 (droppable): IKRL-ANALOGY at the reference budget -----------------
run_stage ikrl_analogy_pt 10800 ikrl "${KGE_COMMON[@]}" \
  --model analogy --dim 200 --train_times 2000 --nbatches 100 \
  --neg_ent 25 --neg_rel 25 --alpha 1.0 --task_mode random \
  --output_dir "$OUT/ikrl_analogy"

echo "QUEUE_R5BC_DONE"
