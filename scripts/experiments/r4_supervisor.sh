#!/usr/bin/env bash
# Round-4 serial TPU supervisor — replaces the tail of
# r4_quality_from_zero.sh + r4_perf.sh + r4b_mixed.sh after the observed
# ~1.5-2.5 min/epoch arm cadence showed the original three-queue plan
# would overrun the round. ONE serial queue in priority order:
#
#   1. remaining seed-variance scratch arms        (VERDICT r3 item 5)
#   2. analogy-pretrain ft15 x 3 seeds (the A/B)   (item 1)
#   3. perf session: bench anchors, batch sweep,
#      AUTO-layout, XLA flag sweep, attr_trace     (item 2)
#   4. ft30 headline attempt                       (item 1)
#   5. ViLBERT region-ablation arms                (RESULTS queue E)
#   6. curriculum chain C0/C1/chain-ft             (item 6)
#   7. mixed-diet + alpha-0 pretrain arms          (item 6)
#
# Every stage is deadline-guarded (default 08:50 UTC) so the driver's
# end-of-round bench.py never shares the chip. Usage:
#   r4_supervisor.sh [WAIT_PID]   — waits for WAIT_PID (the orphaned
#   in-flight arm of the killed original driver) to exit first.
set -x -o pipefail
cd /root/repo
DREF=/root/reference/MarT/dataset
CACHE=/tmp/mkg_runs/cache
OUT=/tmp/r4q
PERFOUT=/tmp/r4perf
DEADLINE_UTC=${DEADLINE_UTC:-"08:50"}
mkdir -p "$OUT/logs" "$PERFOUT"

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
  # seconds from now to DEADLINE_UTC today (0 if already past)
  local now dl
  now=$(date -u +%s)
  dl=$(date -u -d "today $DEADLINE_UTC" +%s)
  echo $(( dl > now ? dl - now : 0 ))
}

run_stage () {  # usage: run_stage NAME TIMEOUT_S cli-args...
  local name=$1 tmo=$2; shift 2
  if past_deadline; then echo "=== [$name] SKIPPED (past $DEADLINE_UTC UTC) ==="; return 9; fi
  # a stage may not overrun the deadline either: cap its timeout to the
  # remaining window (+10 min grace for the final eval/test fetch)
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

# ---- 1. remaining scratch seed arms (s7 ran under the original driver)
for seed in 13 21; do
  [ -f "$OUT/logs/scratch15_s$seed.log" ] && \
    grep -q "test/Eval_entity" "$OUT/logs/scratch15_s$seed.log" && continue
  ft "scratch15_s$seed" "$seed" 15
done

# ---- 2. the A/B: ft15 from the analogy pretrain, 3 seeds
if [ -d "$PT_CKPT" ]; then
  for seed in 7 13 21; do
    ft "ft15_s$seed" "$seed" 15 --checkpoint "$PT_CKPT"
  done
else
  echo "NO_PT_CKPT: skipping ft15 arms"
fi
echo "QUEUE_AB_DONE"

# ---- 3. perf session (strictly serial with everything else here)
if ! past_deadline; then
  echo "=== [P0] bench.py anchors (tanh base, B=32) ==="
  for i in 1 2; do timeout 1800 python bench.py 2>&1 | tail -1; done

  echo "=== [P1] batch sweep on the tanh base ==="
  for b in 48 64 96; do
    timeout 900 python tools/bench_opts.py --variant base --batch "$b" 2>&1 | tail -1
  done

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

  echo "=== [P3] attr_trace step anatomy on the current base ==="
  timeout 1200 python tools/attr_trace.py --batch 32 2>&1 | tail -25
fi
echo "QUEUE_P_DONE"

# ---- 4. ft30 headline attempt
[ -d "$PT_CKPT" ] && ft "ft30_s7" 7 30 --checkpoint "$PT_CKPT"

# ---- 5. ViLBERT region-ablation arms
for feat in synthetic synthetic_noise; do
  run_stage "vil_$feat" 7200 \
    --model_class VilBertKGC --max_seq_length 128 --eval_batch_size 128 \
    --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" \
    --batch_size 64 --lr 5e-5 --alpha 0.43 --max_epochs 20 \
    --image_features "$feat" \
    --output_dir "$OUT/vil_$feat" --log_dir "$OUT/logs/tb_vil_$feat"
done

# ---- 6. curriculum chain (gated stage-by-stage)
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

# ---- 7. mixed-diet + alpha-0 arms
run_stage B0 7200 "${COMMON[@]}" \
  --batch_size 64 --lr 5e-5 --pretrain 1 --pretrain_format mixed \
  --max_epochs 15 \
  --output_dir "$OUT/pt_mixed" --log_dir "$OUT/logs/tb_pt_mixed"
[ $? -eq 0 ] && [ -d "$OUT/pt_mixed/ckpt" ] && \
  ft "ft15_mixed_s7" 7 15 --checkpoint "$OUT/pt_mixed/ckpt"

run_stage B1 7200 "${COMMON[@]}" \
  --batch_size 64 --lr 5e-5 --pretrain 1 --pretrain_format analogy \
  --alpha 0.0 --max_epochs 15 \
  --output_dir "$OUT/pt_analogy_a0" --log_dir "$OUT/logs/tb_pt_analogy_a0"
[ $? -eq 0 ] && [ -d "$OUT/pt_analogy_a0/ckpt" ] && \
  ft "ft15_a0_s7" 7 15 --checkpoint "$OUT/pt_analogy_a0/ckpt"

echo "QUEUE_ALL_DONE"
