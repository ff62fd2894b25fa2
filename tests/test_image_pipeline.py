"""Image pipeline: resize kernel parity, pHash, MRP gates, OpenKE export."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mkg_analogy_tpu.data.gates import (
    build_gates,
    calculate_mrp,
    image_only_ranks,
    mrp_to_forget_gate,
    mrp_to_sigmoid_alpha,
)
from mkg_analogy_tpu.data.openke_tools import (
    relation_categories,
    write_category_splits,
    write_id_files,
    write_type_constraints,
)
from mkg_analogy_tpu.data.phash import best_image_index, hamming, phash, to_gray32
from mkg_analogy_tpu.kernels.image_prep import (
    resize_normalize,
    resize_normalize_pallas,
)


def test_resize_matches_torch_bilinear():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    h, w = 40, 50
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    canvas = np.zeros((1, 64, 64, 3), np.uint8)
    canvas[0, :h, :w] = img
    out = np.asarray(
        resize_normalize(jnp.asarray(canvas), jnp.asarray([[h, w]], np.int32),
                         out_size=32, mean=(0, 0, 0), std=(1, 1, 1))
    )
    t = torch.from_numpy(img.transpose(2, 0, 1)[None].astype(np.float32) / 255.0)
    ref = F.interpolate(t, size=(32, 32), mode="bilinear",
                        align_corners=False, antialias=False).numpy()[0]
    np.testing.assert_allclose(out[0], ref, atol=1e-5)


def test_pallas_kernel_matches_xla_path():
    rng = np.random.default_rng(1)
    canvas = np.zeros((3, 64, 64, 3), np.uint8)
    sizes = np.array([[64, 64], [20, 60], [33, 7]], np.int32)
    for i, (h, w) in enumerate(sizes):
        canvas[i, :h, :w] = rng.integers(0, 256, (h, w, 3))
    a = np.asarray(resize_normalize(jnp.asarray(canvas), jnp.asarray(sizes),
                                    out_size=32))
    b = np.asarray(resize_normalize_pallas(jnp.asarray(canvas),
                                           jnp.asarray(sizes), out_size=32,
                                           interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_phash_properties():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (32, 32)).astype(np.float64)
    h1 = phash(img)
    assert h1.shape == (63,)
    # invariant to brightness shift (median thresholding)
    h2 = phash(img + 25.0)
    assert hamming(h1, h2) == 0
    # different image -> large distance
    h3 = phash(rng.integers(0, 256, (32, 32)).astype(np.float64))
    assert hamming(h1, h3) > 10


def test_best_image_index():
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (32, 32)).astype(np.float64)
    near1 = base + rng.normal(0, 4, (32, 32))
    near2 = base + rng.normal(0, 4, (32, 32))
    far = rng.integers(0, 256, (32, 32)).astype(np.float64)
    # the odd-one-out should never be chosen
    assert best_image_index([near1, near2, far]) in (0, 1)


def test_to_gray32_shapes():
    rng = np.random.default_rng(4)
    g = to_gray32(rng.integers(0, 256, (100, 57, 3)).astype(np.uint8))
    assert g.shape == (32, 32)
    assert np.isfinite(g).all()


def test_mrp_and_gates():
    rng = np.random.default_rng(5)
    E, R = 20, 4
    img = rng.standard_normal((E, 8)).astype(np.float32)
    # relation 0: image-informative (rhs image == lhs image)
    trips = []
    for i in range(10):
        a = rng.integers(0, E)
        trips.append((a, 0, a))  # cos(a, a)=1 -> rank 1
        trips.append((rng.integers(0, E), 1, rng.integers(0, E)))
    trips = np.asarray(trips)
    mrp = calculate_mrp(trips, img, R)
    assert mrp[0] < mrp[1]
    alpha = mrp_to_sigmoid_alpha(mrp)
    assert alpha.shape == (R, 1)
    assert alpha[0, 0] > alpha[1, 0]
    gate = mrp_to_forget_gate(mrp, remember_rate=25)
    assert gate.sum() == 1 and gate[0, 0] == 1.0
    m, a, g = build_gates(trips, img, R)
    assert m.shape == (R,) and a.shape == (R, 1) and g.shape == (R, 1)


def test_openke_export(tmp_path):
    from tests.util import build_tiny

    markg, mars, vocab = build_tiny(str(tmp_path / "kg"))
    out = str(tmp_path / "openke")
    triples = markg.triples_as_ids()
    n = len(triples)
    splits = {"train": triples[: n - 6], "valid": triples[n - 6 : n - 3],
              "test": triples[n - 3 :]}
    write_id_files(out, markg, mars, splits=splits)
    for f in ("entity2id.txt", "relation2id.txt", "train2id.txt",
              "test2id.txt", "train2id_ft.txt", "test2id_ft.txt"):
        assert os.path.exists(os.path.join(out, f)), f
    # loadable by the native sampler's reader
    from mkg_analogy_tpu.kge.sampling import TripleStore

    store = TripleStore.from_openke_dir(out)
    assert len(store) == n - 6
    # type constraints + category splits
    as_htr = [(h, t, r) for h, r, t in triples]
    p = write_type_constraints(out, as_htr)
    assert os.path.getsize(p) > 0
    paths = write_category_splits(out, as_htr[: n - 3], as_htr[n - 3 :])
    assert len(paths) == 4
    cats = relation_categories(as_htr)
    assert set(cats.values()) <= {"1-1", "1-n", "n-1", "n-n"}


def test_vision_encoders_forward():
    import jax

    from mkg_analogy_tpu.models.vision_encoders import (
        ViTClassifier,
        ViTConfig,
        VGG16Features,
    )

    vgg = VGG16Features()
    px = jnp.zeros((1, 3, 224, 224), jnp.float32)
    params = vgg.init(jax.random.PRNGKey(0), px)
    out = vgg.apply(params, px)
    assert out.shape == (1, 4096)

    vit = ViTClassifier(ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                                  num_layers=2, num_heads=2,
                                  intermediate_size=64, num_classes=10))
    px = jnp.zeros((2, 3, 32, 32), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), px)
    out = vit.apply(params, px)
    assert out.shape == (2, 10)


def test_store_reference_formats(tmp_path):
    """Reference cache formats load: .pth pixel tensors, .pickle region dicts."""
    torch = pytest.importorskip("torch")
    import pickle

    from mkg_analogy_tpu.data.images import PixelStore, RegionStore

    feats = np.arange(2 * 3 * 4 * 4, dtype=np.float32).reshape(2, 3, 4, 4)
    p = tmp_path / "pixels.pth"
    torch.save(torch.from_numpy(feats), str(p))
    store = PixelStore.open(str(p))
    np.testing.assert_array_equal(store.features, feats)

    d = {"Q1": np.ones((36, 2048), np.float32)}
    p2 = tmp_path / "regions.pickle"
    with open(p2, "wb") as f:
        pickle.dump(d, f)
    rstore = RegionStore.open(str(p2), entities=["Q0", "Q1"])
    assert rstore.features.shape == (2, 36, 2048)
    assert rstore.features[0].sum() == 0 and rstore.features[1].sum() > 0
