"""Pallas TPU kernel for masked greedy NMS.

The XLA formulation (ops/boxes.nms_keep_mask) materialises the [K, K]
IoU matrix in HBM and re-reads it every fixpoint sweep. This kernel
keeps the whole working set — boxes, the IoU/suppressor matrix and the
keep vector — in VMEM for one image per grid step, so the sweeps are
pure on-chip MXU/VPU work with zero HBM traffic after the initial box
load (K=512: 1 MB suppressor matrix, well under the ~16 MB VMEM
budget).

Semantics are identical to ops.boxes.nms_keep_mask (exact greedy NMS:
priority = descending score, ties by row index; strict-> threshold;
optional +1 pixel-area offset and "Min" denominator).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, scores_ref, valid_ref, out_ref, *, iou_thr,
                offset, min_mode):
    boxes = boxes_ref[...][0]       # [K, 4]
    scores = scores_ref[...]        # [1, K]
    valid = valid_ref[...] != 0     # [1, K]
    k = boxes.shape[0]

    x1 = boxes[:, 0]
    y1 = boxes[:, 1]
    x2 = boxes[:, 2]
    y2 = boxes[:, 3]
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

    s = jnp.where(valid, scores, -jnp.inf)[0]  # [K]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    higher = (s[:, None] > s[None, :]) | (
        (s[:, None] == s[None, :]) & (row_ids < col_ids)
    )
    valid_col = valid[0]  # [K]
    sup = jnp.where(
        higher & (iou > iou_thr) & valid_col[:, None], 1.0, 0.0
    )  # [K, K] suppressor matrix, f32 for the MXU matvec

    valid_f = jnp.where(valid, 1.0, 0.0)  # [1, K]

    def cond(state):
        keep, changed, it = state
        return changed & (it < k)

    def body(state):
        keep, _, it = state
        suppressed = jnp.dot(
            keep, sup, preferred_element_type=jnp.float32
        )  # [1, K]
        new_keep = jnp.where(suppressed > 0.0, 0.0, valid_f)
        return new_keep, jnp.any(new_keep != keep), it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid_f, jnp.asarray(True), jnp.asarray(0))
    )
    out_ref[...] = (keep > 0.0).astype(jnp.int8)


def nms_keep_mask_pallas(boxes, scores, valid, iou_thr, offset=0.0,
                         min_mode=False, interpret=False):
    """Batched NMS keep mask via the Pallas kernel.

    boxes [B, K, 4], scores [B, K], valid [B, K] bool -> keep [B, K]
    bool. One grid step per image; everything VMEM-resident.
    """
    b, k = scores.shape
    kernel = partial(
        _nms_kernel, iou_thr=float(iou_thr), offset=float(offset),
        min_mode=bool(min_mode),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k), jnp.int8),
        interpret=interpret,
    )(
        boxes.astype(jnp.float32),
        scores.astype(jnp.float32),
        valid.astype(jnp.int8),
    )
    return out != 0
