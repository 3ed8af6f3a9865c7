"""Pallas TPU kernel for masked greedy NMS.

The XLA formulation (ops/boxes.nms_keep_mask) materialises the [K, K]
IoU matrix in HBM and re-reads it every fixpoint sweep. This kernel
keeps the whole working set — boxes, the IoU/suppressor matrix and the
keep vector — in VMEM for one image per grid step, so the sweeps are
pure on-chip MXU/VPU work with zero HBM traffic after the initial box
load (K=512: 1 MB suppressor matrix, well under the ~16 MB VMEM
budget).

Mosaic rejects blocks whose last two dims are neither (8, 128)-aligned
nor full-array, so the per-box payload travels PACKED as one
[B, K, 8] f32 tensor (x1, y1, x2, y2, score, valid, 0, 0) — a (1, K,
8) block is legal because K is sublane-aligned and 8 equals the array's
lane dim — and the keep mask returns as a [B, 8, K] plane (row 0 is
the answer).

Semantics are identical to ops.boxes.nms_keep_mask (exact greedy NMS:
priority = descending score, ties by row index; strict-> threshold;
optional +1 pixel-area offset and "Min" denominator), including the
two-Jacobi-sweeps-per-round convergence scheme.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(data_ref, out_ref, *, iou_thr, offset, min_mode):
    data = data_ref[...][0]         # [K, 8] packed boxes+score+valid
    k = data.shape[0]

    x1 = data[:, 0]
    y1 = data[:, 1]
    x2 = data[:, 2]
    y2 = data[:, 3]
    scores = data[:, 4]
    valid = data[:, 5] != 0.0
    area = (x2 - x1 + offset) * (y2 - y1 + offset)

    # pairwise IoU on the VPU ([K, K] broadcasting)
    lt_x = jnp.maximum(x1[:, None], x1[None, :])
    lt_y = jnp.maximum(y1[:, None], y1[None, :])
    rb_x = jnp.minimum(x2[:, None], x2[None, :])
    rb_y = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(rb_x - lt_x + offset, 0.0)
    h = jnp.maximum(rb_y - lt_y + offset, 0.0)
    inter = w * h
    if min_mode:
        denom = jnp.minimum(area[:, None], area[None, :])
    else:
        denom = area[:, None] + area[None, :] - inter
    iou = inter / jnp.maximum(denom, 1e-12)

    s = jnp.where(valid, scores, -jnp.inf)  # [K]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    higher = (s[:, None] > s[None, :]) | (
        (s[:, None] == s[None, :]) & (row_ids < col_ids)
    )
    sup = jnp.where(
        higher & (iou > iou_thr) & valid[:, None], 1.0, 0.0
    )  # [K, K] suppressor matrix, f32 for the MXU matvec

    valid_f = jnp.where(valid, 1.0, 0.0)[None]  # [1, K]

    def cond(state):
        keep, changed, it = state
        return changed & (it < k)

    def body(state):
        # two Jacobi sweeps per round (sup is nilpotent, extra sweeps
        # past the fixpoint are no-ops; halves convergence checks)
        keep, _, it = state
        mid = jnp.where(
            jnp.dot(keep, sup, preferred_element_type=jnp.float32)
            > 0.0, 0.0, valid_f)
        new_keep = jnp.where(
            jnp.dot(mid, sup, preferred_element_type=jnp.float32)
            > 0.0, 0.0, valid_f)
        changed = jnp.any(new_keep != mid) | jnp.any(mid != keep)
        return new_keep, changed, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid_f, jnp.asarray(True), jnp.asarray(0))
    )
    out_ref[...] = jnp.broadcast_to(keep, (8, k))[None]


def nms_keep_mask_pallas(boxes, scores, valid, iou_thr, offset=0.0,
                         min_mode=False, interpret=False):
    """Batched NMS keep mask via the Pallas kernel.

    boxes [B, K, 4], scores [B, K], valid [B, K] bool -> keep [B, K]
    bool. One grid step per image; everything VMEM-resident.
    """
    b, k = scores.shape
    kp = -(-k // 8) * 8  # sublane-align the box count
    pad = kp - k
    packed = jnp.concatenate(
        [
            boxes.astype(jnp.float32),
            scores.astype(jnp.float32)[..., None],
            valid.astype(jnp.float32)[..., None],
            jnp.zeros((b, k, 2), jnp.float32),
        ],
        axis=-1,
    )
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad), (0, 0)))
    kernel = partial(
        _nms_kernel, iou_thr=float(iou_thr), offset=float(offset),
        min_mode=bool(min_mode),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kp, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, kp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, kp), jnp.float32),
        interpret=interpret,
    )(packed)
    return out[:, 0, :k] > 0.0
