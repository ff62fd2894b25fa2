#!/usr/bin/env bash
# Round-3 TPU serial driver (part H): consolidated pipeline, gated on the
# TPU tunnel relay being back (it died ~19:06; orchestrator must restore it).
# Strictly serial — one TPU client at a time.
set -x
cd /root/repo
DREF=/root/reference/MarT/dataset
CACHE=/tmp/mkg_runs/cache

# Wait for the relay: probe until jax.devices() answers quickly.
for i in $(seq 1 1440); do
  if timeout 60 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "TUNNEL_BACK after $i probes"; break
  fi
  sleep 25
done

echo "=== [H0] finetune 15ep from analogy-pretrain ==="
timeout 5400 python -m mkg_analogy_tpu.cli.main \
  --model_class MKGformerKGC --batch_size 32 --lr 5e-5 --alpha 0.43 \
  --max_epochs 15 --max_seq_length 128 --eval_batch_size 128 \
  --data_dir $DREF/MARS --pretrain_path $DREF/MarKG --cache_dir $CACHE \
  --checkpoint /tmp/r3b/pt_analogy/ckpt \
  --output_dir /tmp/r3e/ft_analogy2 --log_dir /tmp/r3e/logs/ft_analogy2 \
  2>&1 | tail -5
echo "=== [H1] ViLBERT region ablation: synthetic (rank-1 identity codes) ==="
timeout 7200 python -m mkg_analogy_tpu.cli.main \
  --model_class VilBertKGC --batch_size 64 --lr 5e-5 --alpha 0.43 \
  --max_epochs 20 --max_seq_length 128 --eval_batch_size 128 \
  --image_features synthetic \
  --data_dir $DREF/MARS --pretrain_path $DREF/MarKG --cache_dir $CACHE \
  --output_dir /tmp/r3e/vil_synth2 --log_dir /tmp/r3e/logs/vil_synth2 \
  2>&1 | tail -5
echo "=== [H2] ViLBERT region ablation: synthetic_noise (iid control) ==="
timeout 7200 python -m mkg_analogy_tpu.cli.main \
  --model_class VilBertKGC --batch_size 64 --lr 5e-5 --alpha 0.43 \
  --max_epochs 20 --max_seq_length 128 --eval_batch_size 128 \
  --image_features synthetic_noise \
  --data_dir $DREF/MARS --pretrain_path $DREF/MarKG --cache_dir $CACHE \
  --output_dir /tmp/r3e/vil_noise2 --log_dir /tmp/r3e/logs/vil_noise2 \
  2>&1 | tail -5

echo "=== [H3] flash TPU dropout-VJP recheck (fixed single-coord probe) ==="
timeout 2400 python tools/check_flash_tpu.py
echo "CHECK_EXIT=$?"
echo "=== [H4] gelu bench sanity: new default (tanh under bf16) ==="
timeout 900 python tools/bench_opts.py --variant base --batch 32 2>&1 | tail -1
echo "=== [H4b] geluexact control ==="
timeout 900 python tools/bench_opts.py --variant geluexact --batch 32 2>&1 | tail -1
echo "=== [H5] scratch 15ep with tanh-gelu default (metric neutrality vs 0.2965 erf control) ==="
timeout 5400 python -m mkg_analogy_tpu.cli.main \
  --model_class MKGformerKGC --batch_size 32 --lr 5e-5 --alpha 0.43 \
  --max_epochs 15 --max_seq_length 128 --eval_batch_size 128 \
  --data_dir $DREF/MARS --pretrain_path $DREF/MarKG --cache_dir $CACHE \
  --output_dir /tmp/r3f/ft_gelutanh --log_dir /tmp/r3f/logs/ft_gelutanh \
  2>&1 | tail -4
echo "=== [H6] optimizer-moment dtype pricing ==="
timeout 900 python tools/bench_opts.py --variant bf16mu --batch 32 2>&1 | tail -1
timeout 900 python tools/bench_opts.py --variant bf16mom --batch 32 2>&1 | tail -1
echo "=== [H7] XLA flag sweep at the recipe point ==="
for opt in \
  xla_tpu_enable_latency_hiding_scheduler=true \
  xla_tpu_enable_latency_hiding_scheduler=false \
  xla_latency_hiding_scheduler_rerun=3 \
  xla_tpu_aggressive_opt_barrier_removal=true \
  xla_tpu_rwb_fusion=false \
  xla_tpu_licm_size_inflation_ratio=2.0 \
  ; do
  echo "=== copt: $opt ==="
  timeout 900 python tools/bench_opts.py --variant base --batch 32 --copt "$opt" 2>&1 | tail -2
done
echo "=== [H8] attr_trace on tanh default ==="
timeout 1200 python tools/attr_trace.py --batch 32 2>&1 | tail -30
echo "=== [H9] bench.py anchor ==="
timeout 1200 python bench.py 2>&1 | tail -1
echo "QUEUE_H_DONE"
