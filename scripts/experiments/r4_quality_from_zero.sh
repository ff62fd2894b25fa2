#!/usr/bin/env bash
# Quality pipeline, regenerated FROM ZERO (the VM restart wiped /tmp: all
# round-3 checkpoints and the npz/data caches are gone — r3h/r3i's
# checkpoint inputs no longer exist). Strictly serial, one TPU client.
#
# Closes the one pending RESULTS.md cell: final test MRR of the
# analogy-format-pretrain -> finetune arm vs the scratch control
# (0.2849 Hits@1 / 0.2965 MRR). Interim evidence (dev MRR 0.110/0.177 at
# epochs 1/2 vs scratch 0.027) says the format transfers; this measures
# how far it carries.
set -x
cd /root/repo
DREF=/root/reference/MarT/dataset
CACHE=/tmp/mkg_runs/cache

for i in $(seq 1 1440); do
  if timeout 60 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "TUNNEL_OK after $i probes"; break
  fi
  sleep 25
done

echo "=== [Q0] analogy-format MarKG pretrain, 30 ep (rebuilds caches) ==="
timeout 10800 python -m mkg_analogy_tpu.cli.main \
  --model_class MKGformerKGC --batch_size 64 --lr 5e-5 \
  --pretrain 1 --pretrain_format analogy --max_epochs 30 \
  --max_seq_length 128 --eval_batch_size 128 \
  --data_dir $DREF/MARS --pretrain_path $DREF/MarKG --cache_dir $CACHE \
  --output_dir /tmp/r4q/pt_analogy --log_dir /tmp/r4q/logs/pt_analogy \
  2>&1 | tail -4

echo "=== [Q1] finetune 15 ep from the analogy pretrain (A/B vs scratch 0.2965) ==="
timeout 5400 python -m mkg_analogy_tpu.cli.main \
  --model_class MKGformerKGC --batch_size 32 --lr 5e-5 --alpha 0.43 \
  --max_epochs 15 --max_seq_length 128 --eval_batch_size 128 \
  --data_dir $DREF/MARS --pretrain_path $DREF/MarKG --cache_dir $CACHE \
  --checkpoint /tmp/r4q/pt_analogy/ckpt \
  --output_dir /tmp/r4q/ft15 --log_dir /tmp/r4q/logs/ft15 \
  2>&1 | tail -5

echo "=== [Q2] finetune 30 ep from the analogy pretrain (headline attempt vs 0.301) ==="
timeout 7200 python -m mkg_analogy_tpu.cli.main \
  --model_class MKGformerKGC --batch_size 32 --lr 5e-5 --alpha 0.43 \
  --max_epochs 30 --max_seq_length 128 --eval_batch_size 128 \
  --data_dir $DREF/MARS --pretrain_path $DREF/MarKG --cache_dir $CACHE \
  --checkpoint /tmp/r4q/pt_analogy/ckpt \
  --output_dir /tmp/r4q/ft30 --log_dir /tmp/r4q/logs/ft30 \
  2>&1 | tail -5

echo "=== [Q3] ViLBERT region ablation: synthetic / synthetic_noise ==="
for feat in synthetic synthetic_noise; do
  timeout 7200 python -m mkg_analogy_tpu.cli.main \
    --model_class VilBertKGC --batch_size 64 --lr 5e-5 --alpha 0.43 \
    --max_epochs 20 --max_seq_length 128 --eval_batch_size 128 \
    --image_features $feat \
    --data_dir $DREF/MARS --pretrain_path $DREF/MarKG --cache_dir $CACHE \
    --output_dir /tmp/r4q/vil_$feat --log_dir /tmp/r4q/logs/vil_$feat \
    2>&1 | tail -5
done
echo "QUEUE_Q_DONE"
