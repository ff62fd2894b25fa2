"""Fused image preprocessing: bilinear resize + channel normalization.

Replaces the reference's host-side CLIPProcessor/ViltProcessor loops
(MarT/tools/encode_images_data.py:15-43) with a device pipeline:

- images are host-decoded onto a fixed canvas (CANVAS x CANVAS, top-left
  anchored) so every batch has a static shape;
- bilinear resize is *separable*: out = W_y @ img @ W_x^T per channel, where
  W_y/W_x are (OUT, CANVAS) interpolation matrices with <= 2 nonzeros per
  row built from the true (h, w) via iota math — the resize becomes two MXU
  matmuls instead of gather soup;
- normalization ((x/255 - mean)/std) fuses into the same kernel.

Two implementations with identical numerics: a jnp/XLA path (einsum; XLA
fuses the normalize) and a Pallas kernel (grid over batch, canvas block in
VMEM, weights computed in-kernel from scalar-prefetched sizes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# CLIP pixel statistics (openai/clip-vit-base-patch32 processor config).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
# ViLT uses ImageNet-0.5 statistics.
VILT_MEAN = (0.5, 0.5, 0.5)
VILT_STD = (0.5, 0.5, 0.5)

CANVAS = 512


def _interp_matrix(size: jnp.ndarray, out_dim: int, canvas: int) -> jnp.ndarray:
    """(out_dim, canvas) bilinear interpolation matrix for a source extent
    ``size`` (align_corners=False convention, PIL/torch parity)."""
    scale = size.astype(jnp.float32) / out_dim
    dst = jnp.arange(out_dim, dtype=jnp.float32)
    src = (dst + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, size.astype(jnp.float32) - 1.0)
    lo = jnp.floor(src)
    frac = src - lo
    cols = jnp.arange(canvas, dtype=jnp.float32)[None, :]
    lo_ = lo[:, None]
    w = jnp.where(cols == lo_, 1.0 - frac[:, None], 0.0)
    w = w + jnp.where(cols == lo_ + 1.0, frac[:, None], 0.0)
    # last source pixel: lo == size-1 -> all weight on lo
    at_edge = (lo_ + 1.0 >= size.astype(jnp.float32)) & (cols == lo_)
    w = jnp.where(at_edge, 1.0, w)
    return w


@functools.partial(jax.jit, static_argnames=("out_size", "mean", "std"))
def resize_normalize(
    canvas: jnp.ndarray,  # (B, CANVAS, CANVAS, 3) uint8/float
    sizes: jnp.ndarray,  # (B, 2) int32 — true (h, w) of each image
    out_size: int = 224,
    mean: Tuple[float, ...] = CLIP_MEAN,
    std: Tuple[float, ...] = CLIP_STD,
) -> jnp.ndarray:
    """XLA path -> (B, 3, out_size, out_size) float32."""
    x = canvas.astype(jnp.float32) / 255.0
    cv = canvas.shape[1]

    def per_image(img, size):  # img (C, C, 3)
        wy = _interp_matrix(size[0], out_size, cv)  # (O, C)
        wx = _interp_matrix(size[1], out_size, cv)
        out = jnp.einsum("oc,cwk->owk", wy, img)  # rows: (O, C, 3)
        out = jnp.einsum("pw,owk->opk", wx, out)  # cols: (O, O, 3)
        return out

    out = jax.vmap(per_image)(x, sizes)  # (B, O, O, 3)
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    out = (out - m) / s
    return out.transpose(0, 3, 1, 2)


def _resize_kernel(sizes_ref, canvas_ref, out_ref, *, out_size, canvas,
                   mean, std):
    """Pallas kernel body: one image per grid step."""
    h = sizes_ref[pl.program_id(0), 0]
    w = sizes_ref[pl.program_id(0), 1]

    def interp(size):
        scale = size.astype(jnp.float32) / out_size
        dst = jax.lax.broadcasted_iota(jnp.float32, (out_size, canvas), 0)
        cols = jax.lax.broadcasted_iota(jnp.float32, (out_size, canvas), 1)
        src = jnp.clip((dst + 0.5) * scale - 0.5, 0.0,
                       size.astype(jnp.float32) - 1.0)
        lo = jnp.floor(src)
        frac = src - lo
        wgt = jnp.where(cols == lo, 1.0 - frac, 0.0)
        wgt = wgt + jnp.where(cols == lo + 1.0, frac, 0.0)
        at_edge = (lo + 1.0 >= size.astype(jnp.float32)) & (cols == lo)
        return jnp.where(at_edge, 1.0, wgt)

    wy = interp(h)  # (O, C)
    wx = interp(w)  # (O, C)
    img = canvas_ref[0].astype(jnp.float32) / 255.0  # (C, C, 3)
    for k in range(3):
        rows = jnp.dot(wy, img[:, :, k], preferred_element_type=jnp.float32)
        full = jnp.dot(rows, wx.T, preferred_element_type=jnp.float32)
        out_ref[0, k] = (full - mean[k]) / std[k]


def resize_normalize_pallas(
    canvas: jnp.ndarray,
    sizes: jnp.ndarray,
    out_size: int = 224,
    mean: Tuple[float, ...] = CLIP_MEAN,
    std: Tuple[float, ...] = CLIP_STD,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas path — identical numerics to :func:`resize_normalize`."""
    b, cv = canvas.shape[0], canvas.shape[1]
    kernel = functools.partial(
        _resize_kernel, out_size=out_size, canvas=cv, mean=mean, std=std
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, cv, cv, 3), lambda i, s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, out_size, out_size),
                               lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 3, out_size, out_size), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(sizes, jnp.int32), canvas)
