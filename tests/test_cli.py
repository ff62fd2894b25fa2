"""End-to-end CLI flows on the tiny synthetic KG (tiny model overrides)."""

import numpy as np
import pytest

from tests.util import make_tiny_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_kg")
    markg_dir, mars_dir = make_tiny_dataset(str(root))
    return str(root), markg_dir, mars_dir


def test_main_cli_finetune(dataset, tmp_path):
    from mkg_analogy_tpu.cli.main import main

    root, markg_dir, mars_dir = dataset
    metrics = main([
        "--data_dir", mars_dir,
        "--pretrain_path", markg_dir,
        "--model_class", "MKGformerKGC",
        "--max_epochs", "1",
        "--batch_size", "8",
        "--eval_batch_size", "8",
        "--max_seq_length", "48",
        "--text_vocab_size", "256",
        "--hidden_size", "32",
        "--num_layers", "2",
        "--num_heads", "2",
        "--intermediate_size", "64",
        "--dtype", "float32",
        "--dp", "8",
        "--output_dir", str(tmp_path / "out"),
        "--log_dir", str(tmp_path / "logs"),
        "--cache_dir", str(tmp_path / "cache"),
    ])
    assert "Eval_entity/mrr" in metrics
    assert 0 < metrics["Eval_entity/mrr"] <= 1


def test_ikrl_cli_pretrain_and_finetune(dataset, tmp_path):
    from mkg_analogy_tpu.cli.ikrl import main

    root, markg_dir, mars_dir = dataset
    common = [
        "--data_dir", mars_dir, "--pretrain_path", markg_dir,
        "--model", "transe", "--dim", "16",
        "--output_dir", str(tmp_path / "ikrl"),
        "--log_dir", str(tmp_path / "logs"),
        "--nbatches", "2",
    ]
    m = main(common + ["--train_times", "2"])
    assert 0 < m["mrr"] <= 1
    m2 = main(common + ["--finetune", "--finetune_epochs", "2",
                        "--finetune_bsz", "6",
                        "--ckpt", str(tmp_path / "ikrl" / "ckpt")])
    assert "mrr" in m2
    # eval-only re-scores the finetuned checkpoint identically and dumps
    # per-example ranks in the analyze_ranks layout
    dump = tmp_path / "ikrl_ranks.npz"
    m3 = main(common + ["--finetune", "--eval_only",
                        "--ckpt", str(tmp_path / "ikrl" / "ckpt"),
                        "--dump_ranks", str(dump)])
    assert m3["mrr"] == pytest.approx(m2["mrr"], abs=1e-6)
    d = np.load(dump)
    assert d["ranks"].shape == d["mode"].shape == d["tie"].shape
    assert (d["ranks"] >= 1).all()


def test_rsme_cli(dataset, tmp_path):
    from mkg_analogy_tpu.cli.rsme import main

    root, markg_dir, mars_dir = dataset
    m = main([
        "--data_dir", mars_dir, "--pretrain_path", markg_dir,
        "--model", "ComplEx", "--rank", "8", "--max_epochs", "2",
        "--valid", "2", "--batch_size", "16", "--learning_rate", "0.1",
        "--output_dir", str(tmp_path / "rsme"),
        "--log_dir", str(tmp_path / "logs"),
    ])
    assert 0 < m["mrr"] <= 1
    m2 = main([
        "--data_dir", mars_dir, "--pretrain_path", markg_dir,
        "--model", "Analogy", "--rank", "8", "--max_epochs", "2",
        "--batch_size", "6", "--learning_rate", "0.1", "--finetune",
        "--output_dir", str(tmp_path / "rsme_ft"),
        "--log_dir", str(tmp_path / "logs"),
    ])
    assert "mrr" in m2
    dump = tmp_path / "rsme_ranks.npz"
    m3 = main([
        "--data_dir", mars_dir, "--pretrain_path", markg_dir,
        "--model", "Analogy", "--rank", "8", "--finetune", "--eval_only",
        "--ckpt", str(tmp_path / "rsme_ft" / "ckpt"),
        "--dump_ranks", str(dump),
        "--output_dir", str(tmp_path / "rsme_ft2"),
        "--log_dir", str(tmp_path / "logs"),
    ])
    assert m3["mrr"] == pytest.approx(m2["mrr"], abs=1e-6)
    d = np.load(dump)
    assert d["ranks"].shape == d["mode"].shape
    assert (d["ranks"] >= 1).all()


def test_transae_cli(dataset, tmp_path):
    from mkg_analogy_tpu.cli.ikrl import main

    root, markg_dir, mars_dir = dataset
    m = main([
        "--data_dir", mars_dir, "--pretrain_path", markg_dir,
        "--transae", "--dim", "16", "--train_times", "1", "--nbatches", "2",
        "--output_dir", str(tmp_path / "transae"),
        "--log_dir", str(tmp_path / "logs"),
    ])
    assert "mrr" in m


def test_main_cli_pretrain(dataset, tmp_path):
    from mkg_analogy_tpu.cli.main import main

    root, markg_dir, mars_dir = dataset
    metrics = main([
        "--data_dir", mars_dir,
        "--pretrain_path", markg_dir,
        "--model_class", "MKGformerKGC",
        "--pretrain", "1",
        "--max_epochs", "1",
        "--batch_size", "8",
        "--eval_batch_size", "8",
        "--max_seq_length", "48",
        "--text_vocab_size", "256",
        "--hidden_size", "32",
        "--num_layers", "2",
        "--num_heads", "2",
        "--intermediate_size", "64",
        "--dtype", "float32",
        "--dp", "8",
        "--output_dir", str(tmp_path / "out"),
        "--log_dir", str(tmp_path / "logs"),
        "--cache_dir", str(tmp_path / "cache"),
    ])
    # pretrain evaluates both entity and relation ranks
    assert "Eval_entity/mrr" in metrics
    assert "Eval_relation/mrr" in metrics


def test_main_cli_analogy_pretrain_then_finetune(dataset, tmp_path):
    """--pretrain_format analogy (pseudo-analogy MarKG pretraining in the
    finetune prompt layout, data/prompt.py build_pseudo_analogy_features)
    end-to-end, then a finetune restoring its checkpoint — the chained path
    of scripts/run_pretrain_analogy.sh (the missing `/ckpt` suffix on the
    restore once silently broke the real A/B arm)."""
    from mkg_analogy_tpu.cli.main import main

    root, markg_dir, mars_dir = dataset
    base = [
        "--data_dir", mars_dir,
        "--pretrain_path", markg_dir,
        "--model_class", "MKGformerKGC",
        "--max_epochs", "1",
        "--batch_size", "8",
        "--eval_batch_size", "8",
        "--max_seq_length", "48",
        "--text_vocab_size", "256",
        "--hidden_size", "32",
        "--num_layers", "2",
        "--num_heads", "2",
        "--intermediate_size", "64",
        "--dtype", "float32",
        "--dp", "8",
        "--log_dir", str(tmp_path / "logs"),
        "--cache_dir", str(tmp_path / "cache"),
    ]
    pt = main(base + [
        "--pretrain", "1", "--pretrain_format", "analogy",
        "--output_dir", str(tmp_path / "pt"),
    ])
    # analogy-format pretrain is masked-entity only (full MarKG range):
    # entity ranks, no relation ranks
    assert "Eval_entity/mrr" in pt
    assert "Eval_relation/mrr" not in pt
    ft = main(base + [
        "--checkpoint", str(tmp_path / "pt" / "ckpt"),
        "--output_dir", str(tmp_path / "ft"),
    ])
    assert 0 < ft["Eval_entity/mrr"] <= 1


def test_main_cli_curriculum_chain(dataset, tmp_path):
    """Triple-format pretrain -> analogy-format pretrain restoring its
    checkpoint -> finetune restoring THAT checkpoint: the curriculum chain
    of scripts/experiments/r4_quality_from_zero.sh stages C0->C1->C2. The
    middle hop is a pretrain->pretrain restore (same param tree, full
    overlap through partial_restore) that no other test exercises."""
    from mkg_analogy_tpu.cli.main import main

    root, markg_dir, mars_dir = dataset
    base = [
        "--data_dir", mars_dir,
        "--pretrain_path", markg_dir,
        "--model_class", "MKGformerKGC",
        "--max_epochs", "1",
        "--batch_size", "8",
        "--eval_batch_size", "8",
        "--max_seq_length", "48",
        "--text_vocab_size", "256",
        "--hidden_size", "32",
        "--num_layers", "2",
        "--num_heads", "2",
        "--intermediate_size", "64",
        "--dtype", "float32",
        "--dp", "8",
        "--log_dir", str(tmp_path / "logs"),
        "--cache_dir", str(tmp_path / "cache"),
    ]
    c0 = main(base + [
        "--pretrain", "1", "--pretrain_format", "triple",
        "--output_dir", str(tmp_path / "c0"),
    ])
    assert "Eval_relation/mrr" in c0  # triple format trains both ranges
    c1 = main(base + [
        "--pretrain", "1", "--pretrain_format", "analogy",
        "--checkpoint", str(tmp_path / "c0" / "ckpt"),
        "--output_dir", str(tmp_path / "c1"),
    ])
    assert "Eval_entity/mrr" in c1 and "Eval_relation/mrr" not in c1
    ft = main(base + [
        "--checkpoint", str(tmp_path / "c1" / "ckpt"),
        "--output_dir", str(tmp_path / "ft"),
    ])
    assert 0 < ft["Eval_entity/mrr"] <= 1


def test_main_cli_mixed_pretrain_then_finetune(dataset, tmp_path):
    """--pretrain_format mixed (VERDICT r3 item 6's batch diet): every
    epoch interleaves triple-format link-prediction batches with
    pseudo-analogy batches — two compiled train steps over one donated
    state (train/trainer.py fit, cfg.mixed_pretrain) — and evaluates in
    the analogy geometry; then a finetune restores its checkpoint."""
    from mkg_analogy_tpu.cli.main import main

    root, markg_dir, mars_dir = dataset
    base = [
        "--data_dir", mars_dir,
        "--pretrain_path", markg_dir,
        "--model_class", "MKGformerKGC",
        "--max_epochs", "1",
        "--batch_size", "8",
        "--eval_batch_size", "8",
        "--max_seq_length", "48",
        "--text_vocab_size", "256",
        "--hidden_size", "32",
        "--num_layers", "2",
        "--num_heads", "2",
        "--intermediate_size", "64",
        "--dtype", "float32",
        "--dp", "8",
        "--log_dir", str(tmp_path / "logs"),
        "--cache_dir", str(tmp_path / "cache"),
    ]
    pt = main(base + [
        "--pretrain", "1", "--pretrain_format", "mixed",
        "--output_dir", str(tmp_path / "pt"),
    ])
    # eval runs in the analogy geometry: entity ranks only
    assert "Eval_entity/mrr" in pt
    assert "Eval_relation/mrr" not in pt
    ft = main(base + [
        "--checkpoint", str(tmp_path / "pt" / "ckpt"),
        "--output_dir", str(tmp_path / "ft"),
    ])
    assert 0 < ft["Eval_entity/mrr"] <= 1


@pytest.mark.parametrize("mode", ["synthetic", "synthetic_noise"])
def test_main_cli_synthetic_images(dataset, tmp_path, mode):
    """--image_features synthetic|synthetic_noise builds the identity/noise
    pixel table on device and trains/evals end-to-end (cli/main.py synthetic
    branch; noise fell through to the zeros baseline before round 3)."""
    from mkg_analogy_tpu.cli.main import main

    root, markg_dir, mars_dir = dataset
    metrics = main([
        "--data_dir", mars_dir,
        "--pretrain_path", markg_dir,
        "--model_class", "MKGformerKGC",
        "--image_features", mode,
        "--max_epochs", "1",
        "--batch_size", "8",
        "--eval_batch_size", "8",
        "--max_seq_length", "48",
        "--text_vocab_size", "256",
        "--hidden_size", "32",
        "--num_layers", "2",
        "--num_heads", "2",
        "--intermediate_size", "64",
        "--dtype", "float32",
        "--dp", "8",
        "--output_dir", str(tmp_path / "out"),
        "--log_dir", str(tmp_path / "logs"),
        "--cache_dir", str(tmp_path / "cache"),
    ])
    assert "Eval_entity/mrr" in metrics
    assert 0 < metrics["Eval_entity/mrr"] <= 1


@pytest.mark.parametrize("mode", ["synthetic", "synthetic_noise"])
def test_main_cli_synthetic_regions(dataset, tmp_path, mode):
    """--image_features synthetic|synthetic_noise on a region-feature model
    builds the (N, 36, 2048) identity/noise table on device and trains/evals
    end-to-end (cli/main.py region-ablation branch)."""
    from mkg_analogy_tpu.cli.main import main

    root, markg_dir, mars_dir = dataset
    metrics = main([
        "--data_dir", mars_dir,
        "--pretrain_path", markg_dir,
        "--model_class", "VisualBertKGC",
        "--image_features", mode,
        "--max_epochs", "1",
        "--batch_size", "8",
        "--eval_batch_size", "8",
        "--max_seq_length", "48",
        "--text_vocab_size", "256",
        "--hidden_size", "32",
        "--num_layers", "2",
        "--num_heads", "2",
        "--intermediate_size", "64",
        "--dtype", "float32",
        "--dp", "8",
        "--output_dir", str(tmp_path / "out"),
        "--log_dir", str(tmp_path / "logs"),
        "--cache_dir", str(tmp_path / "cache"),
    ])
    assert "Eval_entity/mrr" in metrics
    assert 0 < metrics["Eval_entity/mrr"] <= 1


def test_main_cli_flash_attention_dp8(dataset, tmp_path):
    """--fused_attention flash end-to-end under the dp=8 mesh: the CLI's
    set_fused_attention now auto-selects interpret mode on the CPU backend
    (Pallas has no CPU lowering — this crashed before round 3), and the
    kernel composes with sharded batches (grid dim 0 is batch)."""
    from mkg_analogy_tpu.cli.main import main
    from mkg_analogy_tpu.models import common

    root, markg_dir, mars_dir = dataset
    try:
        metrics = main([
            "--data_dir", mars_dir,
            "--pretrain_path", markg_dir,
            "--model_class", "MKGformerKGC",
            "--fused_attention", "flash",
            "--max_epochs", "1",
            "--batch_size", "8",
            "--eval_batch_size", "8",
            "--max_seq_length", "48",
            "--text_vocab_size", "256",
            "--hidden_size", "32",
            "--num_layers", "2",
            "--num_heads", "2",
            "--intermediate_size", "64",
            "--dtype", "float32",
            "--dp", "8",
            "--output_dir", str(tmp_path / "out"),
            "--log_dir", str(tmp_path / "logs"),
            "--cache_dir", str(tmp_path / "cache"),
        ])
    finally:
        common.set_fused_attention(False)
    assert "Eval_entity/mrr" in metrics
    assert 0 < metrics["Eval_entity/mrr"] <= 1


def test_main_cli_xla_opt_passthrough(dataset, tmp_path):
    """--xla_opt k=v reaches XLA for every jitted trainer function
    (TrainConfig.compiler_options): verified via xla_dump_to producing
    compile artifacts; a bogus key would instead fail at compile time."""
    from mkg_analogy_tpu.cli.main import main

    root, markg_dir, mars_dir = dataset
    dump = tmp_path / "xladump"
    metrics = main([
        "--data_dir", mars_dir,
        "--pretrain_path", markg_dir,
        "--model_class", "MKGformerKGC",
        "--xla_opt", f"xla_dump_to={dump}",
        "--max_epochs", "1",
        "--batch_size", "8",
        "--eval_batch_size", "8",
        "--max_seq_length", "48",
        "--text_vocab_size", "256",
        "--hidden_size", "32",
        "--num_layers", "2",
        "--num_heads", "2",
        "--intermediate_size", "64",
        "--dtype", "float32",
        "--dp", "8",
        "--output_dir", str(tmp_path / "out"),
        "--log_dir", str(tmp_path / "logs"),
        "--cache_dir", str(tmp_path / "cache"),
    ])
    assert "Eval_entity/mrr" in metrics
    assert dump.exists() and any(dump.iterdir())


def test_main_cli_missing_feature_path_errors(dataset, tmp_path):
    """An explicit --image_features path that doesn't exist must fail loudly,
    not silently train the zero-feature baseline (open_store's zeros
    fallback is for the no-flag default only)."""
    from mkg_analogy_tpu.cli.main import main

    root, markg_dir, mars_dir = dataset
    with pytest.raises(SystemExit, match="image_features"):
        main([
            "--data_dir", mars_dir,
            "--pretrain_path", markg_dir,
            "--model_class", "MKGformerKGC",
            "--image_features", str(tmp_path / "no_such_cache.npz"),
            "--max_epochs", "1",
            "--batch_size", "8",
            "--eval_batch_size", "8",
            "--max_seq_length", "48",
            "--text_vocab_size", "256",
            "--hidden_size", "32",
            "--num_layers", "2",
            "--num_heads", "2",
            "--intermediate_size", "64",
            "--dtype", "float32",
            "--dp", "8",
            "--output_dir", str(tmp_path / "out"),
            "--log_dir", str(tmp_path / "logs"),
            "--cache_dir", str(tmp_path / "cache"),
        ])


def test_limit_train_batches_int_vs_fraction():
    """ADVICE r2: '--limit_train_batches 1' is ONE batch (int), '1.0' is the
    full epoch (fraction) — the pl.Trainer int/float distinction must survive
    argparse."""
    from mkg_analogy_tpu.cli.main import build_parser

    base = ["--data_dir", "x"]
    args = build_parser().parse_args(base + ["--limit_train_batches", "1"])
    assert args.limit_train_batches == 1
    assert isinstance(args.limit_train_batches, int)
    args = build_parser().parse_args(base + ["--limit_train_batches", "1.0"])
    assert isinstance(args.limit_train_batches, float)
    args = build_parser().parse_args(base + ["--limit_train_batches", "0.5"])
    assert args.limit_train_batches == 0.5

    # trainer-side resolution
    from mkg_analogy_tpu.train.trainer import TrainConfig

    def resolve(limit, steps_per_epoch):
        if limit and isinstance(limit, float) and limit <= 1.0:
            limit = max(1, int(steps_per_epoch * limit))
        return int(limit) if limit else None

    assert resolve(1, 100) == 1
    assert resolve(1.0, 100) == 100
    assert resolve(0.25, 100) == 25
    assert resolve(None, 100) is None
    assert resolve(7, 100) == 7


def test_gelu_flag_dispatch(dataset, tmp_path):
    """Round-4 default flip (models/common.py GELU_IMPL = "poly"): the CLI
    must leave the module default alone unless a gelu flag is given —
    --exact_gelu now defaults to None (NOT 1) so that "no flag" means
    "quality-gated poly under bf16", while an explicit --exact_gelu 1
    still pins exact erf and --gelu_impl overrides everything."""
    from mkg_analogy_tpu.cli.main import main
    from mkg_analogy_tpu.models import common

    root, markg_dir, mars_dir = dataset
    entering = common.GELU_IMPL
    tiny = [
        "--data_dir", mars_dir,
        "--pretrain_path", markg_dir,
        "--model_class", "MKGformerKGC",
        "--max_epochs", "1",
        "--limit_train_batches", "1",
        "--batch_size", "8",
        "--eval_batch_size", "8",
        "--max_seq_length", "48",
        "--text_vocab_size", "256",
        "--hidden_size", "32",
        "--num_layers", "2",
        "--num_heads", "2",
        "--intermediate_size", "64",
        "--dtype", "float32",
        "--cache_dir", str(tmp_path / "cache"),
        "--log_dir", str(tmp_path / "logs"),
    ]
    try:
        assert common.GELU_IMPL == "poly"  # module default
        main(tiny + ["--output_dir", str(tmp_path / "o1")])
        assert common.GELU_IMPL == "poly", "no flag must not disturb the default"
        main(tiny + ["--output_dir", str(tmp_path / "o2"), "--exact_gelu", "1"])
        assert common.GELU_IMPL == "erf", "--exact_gelu 1 pins exact erf"
        main(tiny + ["--output_dir", str(tmp_path / "o3"), "--gelu_impl", "poly",
                     "--exact_gelu", "1"])
        assert common.GELU_IMPL == "poly", "--gelu_impl overrides --exact_gelu"
    finally:
        common.set_gelu_impl(entering)
