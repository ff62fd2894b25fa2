"""MetricLogger sinks: JSONL + the wandb-offline-format run directory
(--wandb parity with MarT/main.py:136-139)."""

import glob
import json
import os

from mkg_analogy_tpu.utils.logging import MetricLogger


def test_wandb_offline_sink(tmp_path):
    log_dir = str(tmp_path)
    logger = MetricLogger(log_dir, wandb=True,
                          config={"lr": 5e-5, "model_class": "MKGformerKGC"})
    logger.log(1, {"loss": 2.5}, prefix="train/")
    logger.log(2, {"loss": 2.0, "ce": 1.5}, prefix="train/")
    logger.log(2, {"Eval_entity/mrr": 0.3})
    logger.close()

    runs = glob.glob(os.path.join(log_dir, "wandb", "offline-run-*", "files"))
    assert len(runs) == 1
    files = runs[0]

    history = [json.loads(l) for l in
               open(os.path.join(files, "wandb-history.jsonl"))]
    assert len(history) == 3
    assert history[0]["train/loss"] == 2.5 and history[0]["_step"] == 1
    assert "_timestamp" in history[0]

    summary = json.load(open(os.path.join(files, "wandb-summary.json")))
    # summary keeps the LATEST value per key
    assert summary["train/loss"] == 2.0
    assert summary["Eval_entity/mrr"] == 0.3

    cfg = open(os.path.join(files, "config.yaml")).read()
    assert "wandb_version: 1" in cfg
    assert "model_class" in cfg and "MKGformerKGC" in cfg

    # JSONL sink still works alongside
    jsonl = [json.loads(l) for l in
             open(os.path.join(log_dir, "train_metrics.jsonl"))]
    assert len(jsonl) == 3


def test_no_wandb_by_default(tmp_path):
    logger = MetricLogger(str(tmp_path))
    logger.log(1, {"loss": 1.0})
    logger.close()
    assert not glob.glob(os.path.join(str(tmp_path), "wandb", "*"))
