"""Pallas TPU kernel: exact grouped crop + adaptive-area resize.

Replaces the XLA two-einsum formulation of
:func:`ops.image.grouped_crop_area_resize` on the cascade's hot path
(reference semantics: integer crop + torch adaptive_avg_pool2d,
detect_face.py:109-112, 304-306). The XLA version is exact but
materialises the row-contracted intermediate
``tmp[b, k, o, w, c]`` (~94 MB bf16 per RNet stage at production
shapes) through HBM twice — ~1.3 ms of a 32-frame chunk is pure
bandwidth on that tensor. Here both contractions stay VMEM-resident:

  * grid over images; per step the [C, H, W] bf16 planes load once and
    feed every crop of that image;
  * crop-blocks of G crops build a [G*S, H] 0/1 row mask IN-KERNEL
    (iota compares against prefetched adaptive-pool bin bounds) and
    contract it against each plane on the MXU (bf16 x bf16 -> f32:
    masks and uint8-valued pixels are exact in bf16, so the sums are
    the same integers the XLA path produces);
  * the column contraction runs on 4-crop sub-blocks as ONE
    [G2*S, W] @ [W, G2*S] f32 GEMM per channel — the MXU computes the
    4x4 crop cross-terms too, and the kernel keeps only the diagonal
    [S, S] blocks (a 4x flop overspend that stays cheap because stage
    2 is ~36x smaller than stage 1). f32 keeps it exact: products are
    T * {0,1} and every sum stays far below 2^24;
  * the unnormalised output leaves as [B, C, S, K*S]; XLA applies the
    1/cell-area division and the [B, K, S, S, C] relayout in one
    fused elementwise+transpose.

Bit-compatibility: output equals ops.image.grouped_crop_area_resize
EXACTLY for uint8-valued inputs (both paths sum exact integers in
f32); tests/test_crop_pallas.py pins equality on clamped random boxes
at 24 and 48 on odd-sized images.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .image import _area_pool_bounds


def _crop_kernel(planes_ref, ybnd_ref, xbnd_ref, out_ref, t_buf, *,
                 s, k, h, w, ch, g, g2):
    rows = g * s          # crop-block rows (k, o)
    sub = g2 * s          # sub-block rows for the column contraction
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (rows, h), 1).astype(
        jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (sub, w), 1).astype(
        jnp.float32)

    for blk in range(k // g):
        r0 = blk * rows
        p0 = ybnd_ref[0, r0:r0 + rows, 0:1]
        p1 = ybnd_ref[0, r0:r0 + rows, 1:2]
        my = jnp.where((iota_h >= p0) & (iota_h < p1), 1.0, 0.0).astype(
            jnp.bfloat16)
        for c in range(ch):
            t_buf[c] = jax.lax.dot_general(
                my, planes_ref[0, c],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        for sb in range(rows // sub):
            q0 = r0 + sb * sub
            x0 = xbnd_ref[0, q0:q0 + sub, 0:1]
            x1 = xbnd_ref[0, q0:q0 + sub, 1:2]
            mx = jnp.where((iota_w >= x0) & (iota_w < x1), 1.0, 0.0)
            for c in range(ch):
                t_sub = t_buf[c, sb * sub:(sb + 1) * sub, :]
                o_full = jax.lax.dot_general(
                    t_sub, mx,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [sub, sub]: (k, o) x (k', p); need k == k'
                for kk in range(g2):
                    a = kk * s
                    col = (blk * g + sb * g2 + kk) * s
                    out_ref[0, c, :, col:col + s] = o_full[a:a + s,
                                                           a:a + s]


def grouped_crop_area_resize_pallas(images, boxes, size,
                                    interpret=False):
    """Drop-in for :func:`ops.image.grouped_crop_area_resize`.

    images: [B, H, W, C]; boxes: [B, K, 4] 1-based inclusive integer-
    valued floats (clamp_boxes output). Returns [B, K, S, S, C] f32.
    """
    b, h, w, c = images.shape
    k = boxes.shape[1]
    s = int(size)

    # crop-block sizes: keep the stage-1 GEMM ~384 rows and the stage-2
    # GEMM ~96 rows; degrade gracefully for tiny K in tests
    g = max(1, min(k, 384 // s))
    g2 = max(1, min(g, 96 // s))
    g = (g // g2) * g2                     # g2 must divide g
    k_pad = -(-k // g) * g
    if k_pad != k:
        filler = jnp.ones((b, k_pad - k, 4), boxes.dtype)
        boxes = jnp.concatenate([boxes, filler], axis=1)

    flat = boxes.reshape(b * k_pad, 4)
    py0, py1 = _area_pool_bounds(flat[:, 1], flat[:, 3], s)  # [BK, S]
    px0, px1 = _area_pool_bounds(flat[:, 0], flat[:, 2], s)
    ybnd = jnp.stack([py0, py1], -1).reshape(b, k_pad * s, 2)
    xbnd = jnp.stack([px0, px1], -1).reshape(b, k_pad * s, 2)

    planes = jnp.transpose(images, (0, 3, 1, 2)).astype(jnp.bfloat16)

    kernel = functools.partial(_crop_kernel, s=s, k=k_pad, h=h, w=w,
                               ch=c, g=g, g2=g2)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad * s, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad * s, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, s, k_pad * s),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, s, k_pad * s),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, g * s, w), jnp.float32),
        ],
        interpret=interpret,
    )(planes, ybnd.astype(jnp.float32), xbnd.astype(jnp.float32))

    # [B, C, S, K*S] -> [B, K, S, S, C], then the exact 1/area division
    out = out.reshape(b, c, s, k_pad, s)[:, :, :, :k, :]
    out = jnp.transpose(out, (0, 3, 2, 4, 1))
    wy = (py1 - py0).reshape(b, k_pad, s)[:, :k]
    wx = (px1 - px0).reshape(b, k_pad, s)[:, :k]
    norm = (wy[:, :, :, None] * wx[:, :, None, :])[..., None]
    return out / jnp.maximum(norm, 1.0)
