#!/usr/bin/env bash
# Round-4 chain v3: opportunistic same-seed gelu pairs + seed bars, run
# only if supervisor v2 exits before the deadline. Evidence state at
# writing (MARS scratch-15, test MRR):
#   tanh: s7 0.2466 (clean), s13 0.2912 (twin-run caveat), s21 0.2816
#         (gelu-indeterminate boundary arm)
#   erf:  s7 0.2965 (exact repro of the round-3 control)
# Each arm here adds a same-seed erf partner so the tanh-vs-erf delta can
# be separated from the (newly observed, +/-0.02) seed spread.
set -x -o pipefail
cd /root/repo
DREF=/root/reference/MarT/dataset
OUT=/tmp/r4q
DEADLINE_UTC=${DEADLINE_UTC:-"09:05"}
mkdir -p "$OUT/logs"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while [ -d "/proc/$WAIT_PID" ]; do sleep 30; done
fi

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

ftgelu () {  # usage: ftgelu NAME SEED EXACT
  run_stage "$1" 3600 "${COMMON[@]}" \
    --batch_size 32 --lr 5e-5 --alpha 0.43 --seed "$2" --max_epochs 15 \
    --exact_gelu "$3" \
    --output_dir "$OUT/$1" --log_dir "$OUT/logs/tb_$1"
}

# same-seed erf partners for the tanh arms (priority order)
ftgelu scratch15_s13_erf 13 1
ftgelu scratch15_s21_erf2 21 1
# explicit tanh s21 (identifies the boundary arm by exact reproduction)
ftgelu scratch15_s21_tanh 21 0
echo "QUEUE_V3_DONE"
