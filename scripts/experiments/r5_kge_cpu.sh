#!/usr/bin/env bash
# Round-5 KGE queue (VERDICT r4 items 3 + 4): run the IKRL/TransAE silos at
# the REFERENCE budgets (IKRL.py:985-1107: pretrain 2000 epochs x 100
# batches, neg 25+25, margin 5, lr 1.0; finetune 1000 epochs, bsz 128,
# Adam 1e-4; TransAE.py:1006,1052: same 2000/1000) with a REAL held-out
# link-prediction split (the reference's valid2id/test2id are byte-copies
# of train2id — kge/sampling.split_store docstring).
#
# SUPERSEDED for the full budgets by scripts/experiments/r5_queue_bc.sh (the
# chip queue): a CPU timing probe showed the per-batch img_project GEMM
# (4096->400 over ~15k rows incl. negatives) makes 2000 CPU epochs take
# days, not hours. Kept as the CPU recipe for small-budget smoke runs
# (reduce --train_times) when the chip is busy or the tunnel is dead;
# the jax.config.update in tools/cpu_cli.py beats the sitecustomize pin.
set -x -o pipefail
cd /root/repo
OUT=/tmp/r5kge
OPENKE=$OUT/openke_holdout
mkdir -p "$OUT/logs"

run_stage () {  # usage: run_stage NAME TIMEOUT_S -- cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] start $(date -u '+%F %T') timeout=${tmo}s ==="
  timeout "$tmo" "$@" > "$OUT/logs/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc end $(date -u '+%F %T') ==="
  tail -4 "$OUT/logs/$name.log"
  return $rc
}

# 0. Export MarKG as an OpenKE dir with a seeded 90/5/5 split so the native
#    sampler trains ONLY on the train split (no holdout leakage).
python -c "
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from mkg_analogy_tpu.data.readers import MarKG
from mkg_analogy_tpu.data.openke_tools import write_id_files
from mkg_analogy_tpu.kge.sampling import TripleStore, split_store
markg = MarKG('/root/reference/MarT/dataset/MarKG')
store = TripleStore.from_arrays(markg.triples_as_ids(), markg.num_entities,
                                markg.num_relations)
tr, va, te = split_store(store, 0.05, seed=0)
def rows(s):
    return [(int(h), int(r), int(t))
            for h, t, r in zip(s.heads, s.tails, s.rels)]
from mkg_analogy_tpu.data.readers import MARS
mars = MARS('/root/reference/MarT/dataset/MARS', markg)
write_id_files('$OPENKE', markg, mars=mars,
               splits={'train': rows(tr), 'valid': rows(va), 'test': rows(te)})
print('exported', len(tr), len(va), len(te))
"

COMMON=( --data_dir /root/reference/MarT/dataset/MARS
         --pretrain_path /root/reference/MarT/dataset/MarKG
         --in_path "$OPENKE" --use_native_sampler --seed 0
         --log_dir "$OUT/logs/tb" )

# 1. IKRL-TransE at the reference pretrain budget + held-out LP + triple cls
run_stage ikrl_transe_pt 43200 python tools/cpu_cli.py ikrl "${COMMON[@]}" \
  --model transe --dim 400 --train_times 2000 --nbatches 100 \
  --neg_ent 25 --neg_rel 25 --margin 5.0 --alpha 1.0 --task_mode random \
  --triple_classification --output_dir "$OUT/ikrl_transe"

# 2. IKRL finetune at the reference budget (1000 epochs, bsz 128, Adam 1e-4)
run_stage ikrl_transe_ft 43200 python tools/cpu_cli.py ikrl "${COMMON[@]}" \
  --model transe --dim 400 --finetune --ckpt "$OUT/ikrl_transe/ckpt" \
  --finetune_epochs 1000 --finetune_bsz 128 --finetune_lr 1e-4 \
  --task_mode random --output_dir "$OUT/ikrl_transe_ft"

# 3. IKRL-ANALOGY at the reference pretrain budget (dim 200, softplus, reg 1.0)
run_stage ikrl_analogy_pt 43200 python tools/cpu_cli.py ikrl "${COMMON[@]}" \
  --model analogy --dim 200 --train_times 2000 --nbatches 100 \
  --neg_ent 25 --neg_rel 25 --alpha 1.0 --task_mode random \
  --output_dir "$OUT/ikrl_analogy"

# 4. TransAE at the reference budget with the held-out LP eval (VERDICT item 4)
run_stage transae_pt 43200 python tools/cpu_cli.py ikrl "${COMMON[@]}" \
  --transae --model transe --dim 400 --train_times 2000 --nbatches 100 \
  --neg_ent 25 --neg_rel 25 --margin 5.0 --alpha 1.0 --task_mode text \
  --output_dir "$OUT/transae"

echo "QUEUE_R5KGE_DONE"
