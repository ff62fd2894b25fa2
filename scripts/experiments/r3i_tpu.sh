#!/usr/bin/env bash
# Round-3 TPU serial driver (part I): quality push from the analogy-format
# pretrain finding (format transfers: dev MRR 0.11/0.18 at epochs 1/2 vs
# scratch 0.027). Arms: chained curriculum + longer finetunes.
set -x
cd /root/repo
DREF=/root/reference/MarT/dataset
CACHE=/tmp/mkg_runs/cache
for i in $(seq 1 1440); do
  grep -q "QUEUE_H_DONE" /tmp/r3h_queue.log && break
  sleep 30
done
echo "=== [I0] chained curriculum: analogy-pretrain 15ep FROM the round-2 triple-pretrain ckpt ==="
timeout 7200 python -m mkg_analogy_tpu.cli.main \
  --model_class MKGformerKGC --batch_size 64 --lr 5e-5 \
  --pretrain 1 --pretrain_format analogy --max_epochs 15 \
  --max_seq_length 128 --eval_batch_size 128 \
  --data_dir $DREF/MARS --pretrain_path $DREF/MarKG --cache_dir $CACHE \
  --checkpoint /tmp/mkg_runs/pt/ckpt \
  --output_dir /tmp/r3i/pt_chain --log_dir /tmp/r3i/logs/pt_chain \
  2>&1 | tail -4
echo "=== [I1] finetune 15ep from the chained ckpt ==="
timeout 5400 python -m mkg_analogy_tpu.cli.main \
  --model_class MKGformerKGC --batch_size 32 --lr 5e-5 --alpha 0.43 \
  --max_epochs 15 --max_seq_length 128 --eval_batch_size 128 \
  --data_dir $DREF/MARS --pretrain_path $DREF/MarKG --cache_dir $CACHE \
  --checkpoint /tmp/r3i/pt_chain/ckpt \
  --output_dir /tmp/r3i/ft_chain --log_dir /tmp/r3i/logs/ft_chain \
  2>&1 | tail -4
echo "=== [I2] finetune 30ep from the pure analogy-pretrain ckpt (headline attempt vs 0.301) ==="
timeout 7200 python -m mkg_analogy_tpu.cli.main \
  --model_class MKGformerKGC --batch_size 32 --lr 5e-5 --alpha 0.43 \
  --max_epochs 30 --max_seq_length 128 --eval_batch_size 128 \
  --data_dir $DREF/MARS --pretrain_path $DREF/MarKG --cache_dir $CACHE \
  --checkpoint /tmp/r3b/pt_analogy/ckpt \
  --output_dir /tmp/r3i/ft_analogy30 --log_dir /tmp/r3i/logs/ft_analogy30 \
  2>&1 | tail -4
echo "QUEUE_I_DONE"
