#!/usr/bin/env bash
# Round-4 continuation quality queue. Runs AFTER r4b_perf.sh releases the
# chip (waits on its QUEUE_R4B_PERF_DONE marker). Strictly serial.
#
# Arms, in priority order for the remaining window:
#   S1/S2  scratch-15 erf at seeds 13/21 — variance bars on the headline
#          (VERDICT r3 item 5; s7 = 0.2849/0.2965 is already measured)
#   G1..   gelu_poly scratch-15 at seeds 7/13 — the end-to-end quality A/B
#          that gates any gelu default change (tanh retraction lesson).
#          GATED on the perf verdict: skipped unless gelupoly beat the erf
#          base by >=2% in r4b_perf.sh (no throughput win -> no reason).
#   V1/V2  ViLBERT synthetic region arms — the RESULTS.md round-3 promise
#   T3     scratch-15 tanh at seed 21 — third tanh/erf same-seed pair
#          (supervisor4 context: tanh s13 landed at 0.2912, so the s7
#          6-point gap needs seed pairs before it can be called typical)
# Collect with: python tools/collect_quality.py /tmp/r4b
set -x -o pipefail
cd /root/repo
DREF=/root/reference/MarT/dataset
CACHE=/tmp/mkg_runs/cache
OUT=/tmp/r4b
DEADLINE_UTC=${DEADLINE_UTC:-"12:40"}
mkdir -p "$OUT/logs"

for i in $(seq 1 90); do
  grep -q QUEUE_R4B_PERF_DONE /tmp/r4b_perf_driver.log 2>/dev/null && break
  sleep 60
done
grep -q QUEUE_R4B_PERF_DONE /tmp/r4b_perf_driver.log 2>/dev/null || {
  echo "PERF_STILL_RUNNING after 90 min: refusing to share the chip"; exit 3; }

TUNNEL_OK=0
for i in $(seq 1 20); do
  if timeout 60 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    TUNNEL_OK=1; break
  fi
  sleep 20
done
if [ "$TUNNEL_OK" != 1 ]; then echo "TUNNEL_DEAD"; exit 3; fi

# The perf queue's gelupoly rows measured the v1 (plain-autodiff) kernel
# (720.7 ex/s — the backward tripled the elementwise cost). Re-measure the
# v2 custom-JVP kernel fresh here, then gate the poly quality arms on it:
# >=2% over the erf base median.
echo "=== [G0] gelupoly v2 (custom-JVP) re-measure ==="
for i in 1 2; do
  timeout 900 python tools/bench_opts.py --variant gelupoly --batch 32 \
    2>&1 | tail -1 | tee -a "$OUT/gelupoly_v2.jsonl"
done
timeout 900 python tools/bench_opts.py --variant gelupoly --batch 64 \
  2>&1 | tail -1 | tee -a "$OUT/gelupoly_v2.jsonl"

POLY_GO=$(python - <<'EOF'
import json
base, poly = [], []
for line in open("/tmp/r4b_perf_driver.log", errors="replace"):
    if line.startswith("{"):
        try:
            d = json.loads(line)
        except Exception:
            continue
        if d.get("batch") == 32 and d.get("variant") == "base":
            base.append(d["ex_per_sec"])
try:
    for line in open("/tmp/r4b/gelupoly_v2.jsonl", errors="replace"):
        if line.startswith("{"):
            d = json.loads(line)
            if d.get("batch") == 32:
                poly.append(d["ex_per_sec"])
except FileNotFoundError:
    pass
med = lambda v: sorted(v)[len(v) // 2] if v else 0.0
b, p = med(base), med(poly)
print("yes" if b and p >= 1.02 * b else "no", b, p)
EOF
)
echo "POLY_GO: $POLY_GO"

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

ft () {  # usage: ft NAME SEED [extra args...]
  local name=$1 seed=$2; shift 2
  run_stage "$name" 3600 "${COMMON[@]}" \
    --batch_size 32 --lr 5e-5 --alpha 0.43 --seed "$seed" --max_epochs 15 \
    --output_dir "$OUT/$name" --log_dir "$OUT/logs/tb_$name" "$@"
}

ft scratch15_s13_erf 13
ft scratch15_s21_erf 21

case "$POLY_GO" in yes*)
  ft poly15_s7 7 --gelu_impl poly
  ;;
esac

for feat in synthetic synthetic_noise; do
  run_stage "vil_$feat" 5400 \
    --model_class VilBertKGC --max_seq_length 128 --eval_batch_size 128 \
    --data_dir "$DREF/MARS" --pretrain_path "$DREF/MarKG" --cache_dir "$CACHE" \
    --batch_size 64 --lr 5e-5 --alpha 0.43 --max_epochs 20 \
    --image_features "$feat" \
    --output_dir "$OUT/vil_$feat" --log_dir "$OUT/logs/tb_vil_$feat"
done

case "$POLY_GO" in yes*)
  ft poly15_s13 13 --gelu_impl poly
  ;;
esac

ft scratch15_s21_tanh 21 --exact_gelu 0

case "$POLY_GO" in yes*)
  ft poly15_s21 21 --gelu_impl poly
  ;;
esac

echo "QUEUE_R4B_QUALITY_DONE"
