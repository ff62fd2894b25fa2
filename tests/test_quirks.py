"""Reference-quirk compat flags: both paths run, and the metric delta
between the corrected default and the reference-exact behavior is
quantified (VERDICT r1 item 6).

Quirks covered:
1. ViLT/VisualBERT adaptive-mask image offset
   (modeling_vilt.py:843-844, modeling_visual_bert.py:864-866)
2. RSME mode-1 gold scoring inconsistency (models.py:252-266 vs :69-78)
3. IKRL softplus sign (IKRL.py:887-911 + 1030-1040)

Bit-exactness of the compat paths against torch is covered by
tests/test_masks.py and tests/test_torch_parity_families.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_vilt_mask_offset_quirk_delta():
    """Same params, same batch: compat (reference geometry) vs corrected
    mask produce different but finite outputs; the delta is reported."""
    from mkg_analogy_tpu.models.unimo import TextConfig
    from mkg_analogy_tpu.models.vilt import ViltConfig, ViltForMaskedLM

    text = TextConfig(vocab_size=64, hidden_size=32, num_layers=2,
                      num_heads=2, intermediate_size=64,
                      max_position_embeddings=64, hidden_dropout=0.0,
                      attention_dropout=0.0)
    cfg = ViltConfig(text=text, image_size=32, patch_size=16, dtype="float32")
    rng = np.random.default_rng(0)
    B, L = 2, 12
    batch = dict(
        input_ids=jnp.asarray(rng.integers(1, 64, (B, L))),
        attention_mask=jnp.ones((B, L), jnp.int32),
        token_type_ids=jnp.zeros((B, L), jnp.int32),
        pixel_values=jnp.asarray(
            rng.standard_normal((B, 2, 3, 32, 32)).astype(np.float32)),
        positions=jnp.tile(jnp.arange(L), (B, 1)),
        boundary=jnp.asarray([6, 8]),
    )
    model = ViltForMaskedLM(cfg)
    params = model.init(jax.random.PRNGKey(0), **batch, deterministic=True)
    out_fixed = model.apply(params, **batch, deterministic=True)
    compat = ViltForMaskedLM(
        dataclasses.replace(cfg, compat_ref_mask_offset=True)
    )
    out_compat = compat.apply(params, **batch, deterministic=True)
    assert np.isfinite(np.asarray(out_fixed)).all()
    assert np.isfinite(np.asarray(out_compat)).all()
    delta = float(np.abs(np.asarray(out_fixed) - np.asarray(out_compat)).mean())
    assert delta > 0  # the geometries genuinely differ
    print(f"vilt mask-offset quirk: mean |d trans_hidden| = {delta:.5f}")


def test_rsme_mode1_gold_quirk_delta():
    """Compat gold scoring changes mode-1 filtered ranks only."""
    from mkg_analogy_tpu.kge.rsme import RSMEConfig, RSMEModel, filtered_eval

    rng = np.random.default_rng(1)
    E, R = 20, 3
    img = rng.standard_normal((E, 8)).astype(np.float32)
    queries = np.stack([
        rng.integers(0, E, 30),
        rng.integers(0, 2 * R, 30),
        rng.integers(0, E, 30),
        np.repeat([0, 1, 2], 10),
    ], axis=1).astype(np.int64)
    to_skip = {}

    ranks = {}
    for compat in (False, True):
        cfg = RSMEConfig(num_entities=E, num_relations=R, rank=8, img_dim=8,
                         compat_ref_mode1_gold=compat)
        model = RSMEModel(cfg, img_vec=img)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.asarray(queries[:2, :4]))
        ranks[compat] = filtered_eval(model, variables, queries, to_skip,
                                      batch_size=16)
    mode = queries[:, 3]
    # mode 2: reference score() fuses rhs and applies the same blend as the
    # candidate path -> identical ranks. Modes 0/1: the reference's gold
    # skips rhs image-fusion (and for mode 1 the beta blend) that every
    # candidate gets -> ranks shift.
    np.testing.assert_array_equal(ranks[False][mode == 2],
                                  ranks[True][mode == 2])
    diff1 = ranks[True][mode == 1] - ranks[False][mode == 1]
    assert np.any(diff1 != 0), "mode-1 quirk produced no rank delta"
    diff0 = ranks[True][mode == 0] - ranks[False][mode == 0]
    print(f"rsme gold-scoring quirk: mean rank delta mode0={diff0.mean():+.2f}"
          f" mode1={diff1.mean():+.2f}")


def test_ikrl_softplus_sign_quirk():
    """Corrected sign drives positive-pair energies BELOW negatives (the
    evaluator ranks lower-energy-first); the reference's sign does the
    opposite."""
    from mkg_analogy_tpu.kge.ikrl import IKRLConfig, create_ikrl
    from mkg_analogy_tpu.kge.sampling import NegativeSampler, TripleStore
    from mkg_analogy_tpu.kge.trainer import KGETrainConfig, KGETrainer

    N_ENT, N_REL = 20, 4
    rng = np.random.default_rng(0)
    triples = set()
    while len(triples) < 60:
        triples.add((int(rng.integers(N_ENT)), int(rng.integers(N_REL)),
                     int(rng.integers(N_ENT))))
    arr = np.array(sorted(triples), np.int64)
    store = TripleStore(arr[:, 0], arr[:, 2], arr[:, 1], N_ENT, N_REL)

    # Pin the PRNG implementation: the CLI tests leak a global
    # jax_default_prng_impl=unsafe_rbg when they run first, and after only
    # 60 training steps the absolute energy gaps shift enough with the
    # stream to cross the margins below (caught twice as an order-dependent
    # failure: threefry-solo vs rbg-in-suite).
    prev_impl = jax.config.jax_default_prng_impl
    jax.config.update("jax_default_prng_impl", "threefry2x32")
    try:
        gaps = {}
        for compat in (False, True):
            cfg = IKRLConfig(N_ENT, N_REL, dim=16, scorer="analogy",
                             visual_dim=16)
            model = create_ikrl(cfg)
            tcfg = KGETrainConfig(train_times=1, lr=0.05, loss="softplus",
                                  compat_ref_softplus_sign=compat)
            trainer = KGETrainer(model, tcfg, batch_size=20, neg_total=10)
            sampler = NegativeSampler(store, batch_size=20, neg_ent=5,
                                      neg_rel=5, seed=1)
            state = trainer.init_state(jax.random.PRNGKey(0))
            step_rng = jax.random.PRNGKey(2)
            batch = next(iter(sampler))
            dev = {k: jnp.asarray(batch[k])
                   for k in ("batch_h", "batch_t", "batch_r")}
            for _ in range(60):
                state, _ = trainer.pretrain_step(state, dict(dev), step_rng)
            energies = model.apply(
                {"params": state.params, "frozen": state.frozen},
                dev["batch_h"], dev["batch_t"], dev["batch_r"],
                jnp.zeros_like(dev["batch_h"]),
            )
            p, n = energies[:20], energies[20:]
            gaps[compat] = float(jnp.mean(p) - jnp.mean(n))
    finally:
        jax.config.update("jax_default_prng_impl", prev_impl)
    # The semantic claim is the *relative* direction: the corrected sign
    # drives positive-pair energies DOWN relative to the reference's
    # inverted loss.
    assert gaps[False] < gaps[True] - 0.05, gaps
    assert gaps[False] < 0.01, gaps
    # reference sign: positives pushed to HIGHER energy (inverted)
    assert gaps[True] > 0.05, gaps
    print(f"ikrl softplus quirk: mean(p)-mean(n) corrected={gaps[False]:+.3f} "
          f"reference={gaps[True]:+.3f}")


def test_gelu_dispatch_default_erf_tanh_opt_in():
    """Round-4 retraction of the round-3 tanh default: "gelu" under fp32
    (the torch-parity dtype) is ALWAYS the reference's exact erf — the
    round-3 tanh metric-neutrality claim failed its validation arm
    (same-seed MARS scratch-15: tanh test Hits@1 0.2203 vs erf 0.2849;
    models/common.py). The bf16 default is the quality-gated gelu_poly
    (see test_gelu_poly_matches_erf); --gelu_impl erf restores exact erf
    under bf16; the tanh approximation stays available for throughput
    experiments via set_gelu_exact(False) / --exact_gelu 0, bf16 only."""
    from flax import linen as nn

    from mkg_analogy_tpu.models import common

    # include deep-tail points where the two variants differ even at bf16
    x = jnp.asarray([0.5, -1.5, 2.69, -5.0, -6.5], jnp.float32)
    g = common.get_activation("gelu")
    assert common.GELU_IMPL == "poly", "gelu_poly is the bf16 default"
    # fp32 is exact erf regardless of the configured bf16 impl
    np.testing.assert_array_equal(
        np.asarray(g(x)), np.asarray(nn.gelu(x, approximate=False)))
    xb = x.astype(jnp.bfloat16)
    # sanity: tanh and erf ARE distinguishable on these inputs
    assert np.any(np.asarray(nn.gelu(xb, approximate=True), np.float32)
                  != np.asarray(nn.gelu(xb, approximate=False), np.float32))
    entering = common.GELU_IMPL
    try:
        common.set_gelu_impl("erf")
        # --gelu_impl erf restores exact erf under bf16
        np.testing.assert_array_equal(
            np.asarray(g(xb), np.float32),
            np.asarray(nn.gelu(xb, approximate=False), np.float32))
        common.set_gelu_exact(False)
        # opt-in tanh applies to bf16 ...
        np.testing.assert_array_equal(
            np.asarray(g(xb), np.float32),
            np.asarray(nn.gelu(xb, approximate=True), np.float32))
        # ... but never to fp32 (torch-parity dtype)
        np.testing.assert_array_equal(
            np.asarray(g(x)), np.asarray(nn.gelu(x, approximate=False)))
    finally:
        common.set_gelu_impl(entering)


def test_gelu_poly_matches_erf():
    """gelu_poly (models/common.py) — the bf16-compute default since
    round 4, quality-gated by the 2-seed same-seed A/B in RESULTS.md —
    validated here against the fp64 ground truth and the production fp32
    erf path (full gates in tools/fit_gelu_poly.py). Unlike the retracted
    tanh approximation, its GRADIENT is a custom-JVP fitted series
    agreeing with erf-gelu's to 4.3e-6 over the whole real line (tanh:
    8.7e-4)."""
    from flax import linen as nn

    from mkg_analogy_tpu.models import common

    x64 = np.linspace(-10, 10, 200_001)
    ref64 = 0.5 * x64 * (1.0 + _erf64(x64 / np.sqrt(2.0)))
    got = np.asarray(common.gelu_poly(jnp.asarray(x64, jnp.float32)),
                     np.float64)
    assert np.abs(got - ref64).max() < 3e-6

    # gradient agreement (jax autodiff of erf vs the custom-JVP series)
    xs = jnp.asarray(np.linspace(-9, 9, 20_001), jnp.float32)
    dref = jax.vmap(jax.grad(lambda v: nn.gelu(v, approximate=False)))(xs)
    dgot = jax.vmap(jax.grad(common.gelu_poly))(xs)
    assert np.abs(np.asarray(dref) - np.asarray(dgot)).max() < 2e-5

    # bf16 bit-identity vs the production fp32-erf path on activations
    acts = np.random.default_rng(0).normal(0, 1.5, 500_000)
    ab = jnp.asarray(acts, jnp.bfloat16)
    ref_b = np.asarray(
        nn.gelu(ab.astype(jnp.float32), approximate=False)
    ).astype(jnp.bfloat16)
    got_b = np.asarray(common.gelu_poly(ab))
    ident = (ref_b.view(np.uint16) == got_b.view(np.uint16)).mean()
    assert ident > 0.99, f"bf16 bit-identity {ident:.4f}"

    # dispatch: poly applies to bf16 only; fp32 keeps exact erf
    g = common.get_activation("gelu")
    entering = common.GELU_IMPL
    try:
        common.set_gelu_impl("poly")
        xb = jnp.asarray([0.5, -1.5, 2.69], jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(g(xb), np.float32),
            np.asarray(common.gelu_poly(xb), np.float32))
        xf = xb.astype(jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(g(xf)), np.asarray(nn.gelu(xf, approximate=False)))
    finally:
        common.set_gelu_impl(entering)


def _erf64(x):
    try:
        from scipy.special import erf
        return erf(x)
    except Exception:  # pragma: no cover
        import math
        return np.vectorize(math.erf)(x)
