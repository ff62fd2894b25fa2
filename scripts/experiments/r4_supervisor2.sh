#!/usr/bin/env bash
# Round-4 serial TPU supervisor, v2 — reprioritized after scratch15_s7
# (tanh-GELU code) landed at test MRR 0.2466 vs the round-3 erf control's
# 0.2965: the tanh default's metric-neutrality arm (r3 H5) never actually
# ran, so the first job is to separate "tanh hurts" from "seed noise is
# bigger than believed" (VERDICT r3 item 5):
#
#   1. scratch15_s7_erf  (--exact_gelu 1, same seed as s7)  -> gelu effect
#   2. scratch15_s21     (tanh)                             -> seed spread
#   3. ft15_s7/s13/s21 from the analogy pretrain (tanh, same-code A/B)
#   4. perf session
#   5. branch on |erf - tanh| at seed 7:
#      a. erf clearly better  -> erf analogy pretrain + erf finetune
#         (headline attempt with the corrected default)
#      b. within seed noise   -> ft30 headline + ViLBERT arms
#
# scratch15_s13 (tanh) runs as the orphan WAIT_PID stage.
set -x -o pipefail
cd /root/repo
DREF=/root/reference/MarT/dataset
CACHE=/tmp/mkg_runs/cache
OUT=/tmp/r4q
DEADLINE_UTC=${DEADLINE_UTC:-"08:50"}
mkdir -p "$OUT/logs"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while [ -d "/proc/$WAIT_PID" ]; do sleep 20; done
  echo "orphan stage $WAIT_PID finished at $(date -u '+%F %T')"
fi

TUNNEL_OK=0
for i in $(seq 1 60); do
  if timeout 60 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    TUNNEL_OK=1; break
  fi
  sleep 20
done
[ "$TUNNEL_OK" = 1 ] || { echo "TUNNEL_DEAD"; exit 3; }

past_deadline () { [ "$(date -u +%H:%M)" \> "$DEADLINE_UTC" ]; }
secs_to_deadline () {
  local now dl
  now=$(date -u +%s)
  dl=$(date -u -d "today $DEADLINE_UTC" +%s)
  echo $(( dl > now ? dl - now : 0 ))
}

run_stage () {  # usage: run_stage NAME TIMEOUT_S cli-args...
  local name=$1 tmo=$2; shift 2
  if past_deadline; then echo "=== [$name] SKIPPED (past $DEADLINE_UTC UTC) ==="; return 9; fi
  local cap=$(( $(secs_to_deadline) + 600 ))
  [ "$tmo" -gt "$cap" ] && tmo=$cap
  echo "=== [$name] start $(date -u '+%F %T') timeout=${tmo}s ==="
  timeout "$tmo" python -m mkg_analogy_tpu.cli.main "$@" \
    > "$OUT/logs/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc end $(date -u '+%F %T') ==="
  tail -4 "$OUT/logs/$name.log"
  return $rc
}

test_mrr () {  # prints the stage's test MRR or "none"
  grep -o "test/Eval_entity/mrr=[0-9.]*" "$OUT/logs/$1.log" 2>/dev/null \
    | tail -1 | cut -d= -f2 || echo none
}

COMMON=( --model_class MKGformerKGC --max_seq_length 128 --eval_batch_size 128
         --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" )
PT_CKPT="$OUT/pt_analogy/ckpt"

ft () {  # usage: ft NAME SEED EPOCHS [extra args...]
  local name=$1 seed=$2 epochs=$3; shift 3
  run_stage "$name" 5400 "${COMMON[@]}" \
    --batch_size 32 --lr 5e-5 --alpha 0.43 --seed "$seed" \
    --max_epochs "$epochs" \
    --output_dir "$OUT/$name" --log_dir "$OUT/logs/tb_$name" "$@"
}

# ---- 1. gelu isolation arm: same seed as s7, exact erf
ft "scratch15_s7_erf" 7 15 --exact_gelu 1

# ---- 2. third tanh seed
ft "scratch15_s21" 21 15

# ---- 3. the A/B: ft15 from the analogy pretrain, 3 seeds (tanh, same-code)
if [ -d "$PT_CKPT" ]; then
  for seed in 7 13 21; do
    ft "ft15_s$seed" "$seed" 15 --checkpoint "$PT_CKPT"
  done
else
  echo "NO_PT_CKPT: skipping ft15 arms"
fi
echo "QUEUE_AB_DONE"

# ---- 4. perf session
if ! past_deadline; then
  echo "=== [P0] bench.py anchors (tanh base, B=32) ==="
  for i in 1 2; do timeout 1800 python bench.py 2>&1 | tail -1; done
  echo "=== [P1] batch sweep on the tanh base ==="
  for b in 48 64 96; do
    timeout 900 python tools/bench_opts.py --variant base --batch "$b" 2>&1 | tail -1
  done
  echo "=== [P1e] erf anchors (in case the default reverts) ==="
  timeout 900 python tools/bench_opts.py --variant geluexact --batch 32 2>&1 | tail -1
  timeout 900 python tools/bench_opts.py --variant geluexact --batch 64 2>&1 | tail -1
  echo "=== [P1b] AUTO-layout state (copy-done tail candidate) ==="
  for i in 1 2; do
    timeout 900 python tools/bench_opts.py --variant autolayout --batch 32 2>&1 | tail -1
  done
  echo "=== [P2] XLA flag sweep at the recipe point (r3 H7) ==="
  for opt in \
    xla_tpu_enable_latency_hiding_scheduler=true \
    xla_latency_hiding_scheduler_rerun=3 \
    xla_tpu_aggressive_opt_barrier_removal=true \
    xla_tpu_rwb_fusion=false \
    ; do
    echo "=== copt: $opt ==="
    timeout 900 python tools/bench_opts.py --variant base --batch 32 --copt "$opt" 2>&1 | tail -1
  done
  echo "=== [P3] attr_trace step anatomy ==="
  timeout 1200 python tools/attr_trace.py --batch 32 2>&1 | tail -25
fi
echo "QUEUE_P_DONE"

# ---- 5. branch on the gelu verdict
ERF=$(test_mrr scratch15_s7_erf)
TANH=$(test_mrr scratch15_s7)
GELU_GAP=$(python - "$ERF" "$TANH" <<'EOF'
import sys
try:
    erf, tanh = float(sys.argv[1]), float(sys.argv[2])
    print("erf_wins" if erf - tanh > 0.02 else "neutral")
except ValueError:
    print("unknown")
EOF
)
echo "GELU_VERDICT erf=$ERF tanh=$TANH -> $GELU_GAP"

if [ "$GELU_GAP" = "erf_wins" ]; then
  echo "=== [E0] erf analogy pretrain 30ep (corrected-default headline path) ==="
  run_stage E0 10800 "${COMMON[@]}" \
    --batch_size 64 --lr 5e-5 --pretrain 1 --pretrain_format analogy \
    --exact_gelu 1 --max_epochs 30 \
    --output_dir "$OUT/pt_analogy_erf" --log_dir "$OUT/logs/tb_pt_analogy_erf"
  if [ $? -eq 0 ] && [ -d "$OUT/pt_analogy_erf/ckpt" ]; then
    ft "ft15_erf_s7" 7 15 --exact_gelu 1 --checkpoint "$OUT/pt_analogy_erf/ckpt"
    ft "ft30_erf_s7" 7 30 --exact_gelu 1 --checkpoint "$OUT/pt_analogy_erf/ckpt"
  fi
else
  [ -d "$PT_CKPT" ] && ft "ft30_s7" 7 30 --checkpoint "$PT_CKPT"
  for feat in synthetic synthetic_noise; do
    run_stage "vil_$feat" 7200 \
      --model_class VilBertKGC --max_seq_length 128 --eval_batch_size 128 \
      --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" \
      --batch_size 64 --lr 5e-5 --alpha 0.43 --max_epochs 20 \
      --image_features "$feat" \
      --output_dir "$OUT/vil_$feat" --log_dir "$OUT/logs/tb_vil_$feat"
  done
fi

# ---- 6. whatever still fits: curriculum chain, then mixed/alpha-0 arms
run_stage C0 7200 "${COMMON[@]}" \
  --batch_size 64 --lr 5e-5 --pretrain 1 --pretrain_format triple \
  --max_epochs 15 \
  --output_dir "$OUT/pt_triple" --log_dir "$OUT/logs/tb_pt_triple"
if [ $? -eq 0 ] && [ -d "$OUT/pt_triple/ckpt" ]; then
  run_stage C1 7200 "${COMMON[@]}" \
    --batch_size 64 --lr 5e-5 --pretrain 1 --pretrain_format analogy \
    --max_epochs 15 --checkpoint "$OUT/pt_triple/ckpt" \
    --output_dir "$OUT/pt_chain" --log_dir "$OUT/logs/tb_pt_chain"
  [ $? -eq 0 ] && [ -d "$OUT/pt_chain/ckpt" ] && \
    ft "ft15_chain_s7" 7 15 --checkpoint "$OUT/pt_chain/ckpt"
fi

run_stage B0 7200 "${COMMON[@]}" \
  --batch_size 64 --lr 5e-5 --pretrain 1 --pretrain_format mixed \
  --max_epochs 15 \
  --output_dir "$OUT/pt_mixed" --log_dir "$OUT/logs/tb_pt_mixed"
[ $? -eq 0 ] && [ -d "$OUT/pt_mixed/ckpt" ] && \
  ft "ft15_mixed_s7" 7 15 --checkpoint "$OUT/pt_mixed/ckpt"

echo "QUEUE_ALL_DONE"
