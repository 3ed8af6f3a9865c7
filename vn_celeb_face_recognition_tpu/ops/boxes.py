"""Box math + masked fixed-capacity NMS, all shape-static and jittable.

These replace the reference's mixture of torchvision ``batched_nms``
(CUDA), NumPy greedy NMS (/root/reference/models/mtcnn_utils/
detect_face.py:221-274, retina_face_utils/nms/py_cpu_nms.py), anchor
generation via host-side itertools loops (retina_face_utils/
prior_box.py:17-34) and box encode/decode (retina_face_utils/
box_utils.py:156-247).

TPU design notes
----------------
* All candidate sets are *capacity-bounded* (padded to a fixed K with a
  validity mask) so every stage has static shapes under ``jit``.
* NMS is the O(K^2) matrix formulation: one [K, K] IoU matrix (VPU work,
  batched), then a sequential keep scan via ``lax.fori_loop``. The
  sequential scan is unavoidable (greedy NMS is a chain), but each step
  is a vectorised K-wide op and K is bounded by the stage capacity.
* Two IoU conventions exist in the reference and both are kept:
  ``offset=1.0`` (the classic +1 pixel-area convention used by the MTCNN
  NumPy NMS and RetinaFace's py_cpu_nms) and ``offset=0.0``
  (torchvision's convention used in MTCNN stages 1-2).
* "Min" mode divides the intersection by min(area_i, area_j) instead of
  the union (MTCNN stage 3, detect_face.py:250-253).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# IoU
# ---------------------------------------------------------------------------


def pairwise_iou(boxes_a, boxes_b, offset=0.0, min_mode=False):
    """IoU matrix between two [N,4] / [M,4] xyxy box sets -> [N, M]."""
    area_a = (boxes_a[:, 2] - boxes_a[:, 0] + offset) * (
        boxes_a[:, 3] - boxes_a[:, 1] + offset
    )
    area_b = (boxes_b[:, 2] - boxes_b[:, 0] + offset) * (
        boxes_b[:, 3] - boxes_b[:, 1] + offset
    )
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.maximum(rb - lt + offset, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    if min_mode:
        denom = jnp.minimum(area_a[:, None], area_b[None, :])
    else:
        denom = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(denom, 1e-12)


def jaccard(boxes_a, boxes_b):
    """Plain IoU (offset 0), the train-time matching overlap
    (reference box_utils.py:48-68)."""
    return pairwise_iou(boxes_a, boxes_b, offset=0.0, min_mode=False)


# ---------------------------------------------------------------------------
# NMS (masked, fixed capacity)
# ---------------------------------------------------------------------------


def nms_keep_mask(boxes, scores, valid, iou_thr, offset=0.0, min_mode=False):
    """Greedy NMS over a padded box set — EXACT, via Jacobi fixpoint.

    Greedy NMS is the unique solution of
        keep_i = valid_i  AND  not EXISTS j>i_priority:
                 (iou(j, i) > thr AND keep_j)
    (priority = descending score, ties by original row order). Instead
    of the reference's O(K) *sequential* scan (detect_face.py:235-254 —
    a K-step data-dependent chain that serializes terribly on a
    systolic-array machine), iterate keep <- valid & ~(S^T keep) from
    keep = valid until fixpoint. Each sweep is one [K,K] x [K]
    matrix-vector product on the MXU; convergence takes the suppression
    -chain DEPTH (typically < 8) rather than K steps, and the while
    loop exits exactly at the greedy solution.

    Args:
      boxes:  [K, 4] xyxy (padding rows arbitrary).
      scores: [K] float scores.
      valid:  [K] bool mask of real rows.
      iou_thr: suppression threshold (strict >, matching the reference's
        ``o <= threshold`` keep condition).

    Returns:
      keep: [K] bool mask, in the ORIGINAL row order.
    """
    k = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(valid, scores, neg_inf)
    iou = pairwise_iou(boxes, boxes, offset=offset, min_mode=min_mode)
    idx = jnp.arange(k)
    higher = (s[:, None] > s[None, :]) | (
        (s[:, None] == s[None, :]) & (idx[:, None] < idx[None, :])
    )
    # suppressor matrix: S[j, i] = 1 iff j can suppress i. Stored bf16:
    # the sweeps re-read S from HBM every round and are bandwidth-bound
    # at large K (RetinaFace nms_cap=1024 -> 2 MB/image/sweep instead
    # of 4), and the result is EXACT — 0/1 entries are exactly
    # representable and the MXU accumulates bf16 products in f32
    # (preferred_element_type), so the >0 test cannot flip.
    sup = (higher & (iou > iou_thr) & valid[:, None]).astype(jnp.bfloat16)

    def _sweep(vec):
        hits = jnp.dot(vec.astype(jnp.bfloat16), sup,
                       preferred_element_type=jnp.float32)
        return valid & ~(hits > 0.0)

    def cond(state):
        keep, changed, it = state
        return changed & (it < k)

    def body(state):
        # TWO Jacobi sweeps per while iteration: S is nilpotent (strict
        # priority order), so the iteration converges monotonically in
        # chain-depth sweeps and extra sweeps past the fixpoint are
        # no-ops — doubling up halves the number of sequential
        # convergence-check rounds, which dominate the cost on TPU.
        # (keep @ S) == (S^T keep) for vectors — no transpose needed.
        keep, _, it = state
        mid = _sweep(keep)
        new_keep = _sweep(mid)
        changed = jnp.any(new_keep != mid) | jnp.any(mid != keep)
        return new_keep, changed, it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.asarray(True), jnp.asarray(0))
    )
    return keep


def batched_nms_keep_mask(boxes, scores, valid, iou_thr, offset=0.0,
                          min_mode=False):
    """vmap of :func:`nms_keep_mask` over a leading batch axis."""
    fn = partial(nms_keep_mask, iou_thr=iou_thr, offset=offset,
                 min_mode=min_mode)
    return jax.vmap(fn)(boxes, scores, valid)


def top_k_select(values, mask, k):
    """Top-k by value among masked rows. Returns (indices [k], valid [k]).
    k is clamped to the row count (capacities may exceed small inputs)."""
    k = min(int(k), values.shape[-1])
    neg_inf = jnp.asarray(-jnp.inf, values.dtype)
    masked = jnp.where(mask, values, neg_inf)
    top_vals, top_idx = jax.lax.top_k(masked, k)
    return top_idx, top_vals > neg_inf


def gather_rows(arrays, idx):
    """Gather the same row indices from a pytree of [K, ...] arrays."""
    return jax.tree_util.tree_map(lambda a: a[idx], arrays)


# ---------------------------------------------------------------------------
# MTCNN box utilities (reference detect_face.py:188-301)
# ---------------------------------------------------------------------------


def bbreg(boxes, reg):
    """Apply P/R/O-net bounding-box regression offsets.

    boxes [..., 4] xyxy, reg [..., 4]; the +1 width convention matches
    detect_face.py:188-200.
    """
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    return jnp.stack(
        [
            boxes[..., 0] + reg[..., 0] * w,
            boxes[..., 1] + reg[..., 1] * h,
            boxes[..., 2] + reg[..., 2] * w,
            boxes[..., 3] + reg[..., 3] * h,
        ],
        axis=-1,
    )


def rerec(boxes):
    """Square-ify boxes around their centre (detect_face.py:292-301)."""
    h = boxes[..., 3] - boxes[..., 1]
    w = boxes[..., 2] - boxes[..., 0]
    l = jnp.maximum(w, h)
    x1 = boxes[..., 0] + w * 0.5 - l * 0.5
    y1 = boxes[..., 1] + h * 0.5 - l * 0.5
    return jnp.stack([x1, y1, x1 + l, y1 + l], axis=-1)


def clamp_boxes(boxes, width, height):
    """Truncate-to-int and clamp into [1, w] x [1, h], the reference's
    ``pad`` (detect_face.py:277-289). Returns float boxes (x1,y1,x2,y2)
    holding the clamped integer coordinates."""
    b = jnp.trunc(boxes)
    x1 = jnp.maximum(b[..., 0], 1.0)
    y1 = jnp.maximum(b[..., 1], 1.0)
    x2 = jnp.minimum(b[..., 2], float(width))
    y2 = jnp.minimum(b[..., 3], float(height))
    return jnp.stack([x1, y1, x2, y2], axis=-1)


# ---------------------------------------------------------------------------
# SSD-style anchor (prior box) generation + encode/decode
# ---------------------------------------------------------------------------


def make_priors(image_size, min_sizes, steps, clip=False):
    """Prior boxes in (cx, cy, w, h) normalised form as a static ndarray.

    Vectorised equivalent of the reference PriorBox host loop
    (prior_box.py:17-34), evaluated ONCE per image size in NumPy and
    cached by callers — the reference rebuilt anchors per inference call.
    """
    im_h, im_w = image_size
    all_anchors = []
    for k, step in enumerate(steps):
        fm_h = math.ceil(im_h / step)
        fm_w = math.ceil(im_w / step)
        ii, jj = np.meshgrid(
            np.arange(fm_h, dtype=np.float32),
            np.arange(fm_w, dtype=np.float32),
            indexing="ij",
        )
        cx = (jj + 0.5) * step / im_w  # [fm_h, fm_w]
        cy = (ii + 0.5) * step / im_h
        for min_size in min_sizes[k]:
            s_kx = min_size / im_w
            s_ky = min_size / im_h
            anch = np.stack(
                [
                    cx,
                    cy,
                    np.full_like(cx, s_kx),
                    np.full_like(cy, s_ky),
                ],
                axis=-1,
            ).reshape(-1, 4)
            all_anchors.append(anch)
        # interleave the per-min_size anchors in the reference's order:
        # (cell-major, min_size-minor)
        n_ms = len(min_sizes[k])
        stacked = np.stack(all_anchors[-n_ms:], axis=1).reshape(-1, 4)
        del all_anchors[-n_ms:]
        all_anchors.append(stacked)
    priors = np.concatenate(all_anchors, axis=0).astype(np.float32)
    if clip:
        priors = np.clip(priors, 0.0, 1.0)
    return priors


def decode_boxes(loc, priors, variances):
    """Undo SSD box encoding -> xyxy in [0,1] (box_utils.py:209-227)."""
    centers = priors[..., :2] + loc[..., :2] * variances[0] * priors[..., 2:]
    sizes = priors[..., 2:] * jnp.exp(loc[..., 2:] * variances[1])
    tl = centers - sizes / 2.0
    br = tl + sizes
    return jnp.concatenate([tl, br], axis=-1)


def decode_landmarks(pre, priors, variances):
    """Decode 5-point landmarks -> [..., 10] in [0,1]
    (box_utils.py:229-247)."""
    pts = pre.reshape(pre.shape[:-1] + (5, 2))
    out = priors[..., None, :2] + pts * variances[0] * priors[..., None, 2:]
    return out.reshape(pre.shape)


def encode_boxes(matched, priors, variances):
    """SSD box encoding of matched GT (xyxy) against priors (cxcywh)
    (box_utils.py:156-177)."""
    g_cxcy = (matched[..., :2] + matched[..., 2:]) / 2.0 - priors[..., :2]
    g_cxcy = g_cxcy / (variances[0] * priors[..., 2:])
    g_wh = (matched[..., 2:] - matched[..., :2]) / priors[..., 2:]
    g_wh = jnp.log(g_wh) / variances[1]
    return jnp.concatenate([g_cxcy, g_wh], axis=-1)


def encode_landmarks(matched, priors, variances):
    """Landmark encoding (box_utils.py:179-205)."""
    pts = matched.reshape(matched.shape[:-1] + (5, 2))
    g = (pts - priors[..., None, :2]) / (variances[0] * priors[..., None, 2:])
    return g.reshape(matched.shape[:-1] + (10,))


def point_form(priors):
    """(cx, cy, w, h) -> (x1, y1, x2, y2) (box_utils.py point_form)."""
    half = priors[..., 2:] / 2.0
    return jnp.concatenate(
        [priors[..., :2] - half, priors[..., :2] + half], axis=-1
    )


def match_priors(truths, labels, landms, priors, variances, threshold,
                 truths_valid=None):
    """Train-time GT <-> prior assignment (box_utils.py:96-153), shape-
    static over a padded GT set.

    Args:
      truths: [G, 4] GT boxes xyxy (padded rows arbitrary).
      labels: [G] int class labels (1 = face, -1 = ignore-landmark face
        per the RetinaFace convention).
      landms: [G, 10] GT landmarks.
      priors: [P, 4] cxcywh anchors.
      variances: (0.1, 0.2).
      threshold: positive-match IoU threshold.
      truths_valid: [G] bool mask of real GT rows.

    Returns:
      (loc_t [P, 4], conf_t [P], landm_t [P, 10]) — encoded regression
      targets, per-prior class (0 = background), encoded landmarks.
    """
    g = truths.shape[0]
    if truths_valid is None:
        truths_valid = jnp.ones((g,), bool)

    overlaps = jaccard(truths, point_form(priors))  # [G, P]
    overlaps = jnp.where(truths_valid[:, None], overlaps, -1.0)

    # best prior per GT and best GT per prior
    best_prior_idx = jnp.argmax(overlaps, axis=1)            # [G]
    best_prior_overlap = jnp.max(overlaps, axis=1)           # [G]
    best_truth_overlap = jnp.max(overlaps, axis=0)           # [P]
    best_truth_idx = jnp.argmax(overlaps, axis=0)            # [P]

    # the reference drops GTs whose best prior IoU <= 0.2
    # (box_utils.py valid_gt_idx) and force-assigns each remaining GT's
    # best prior to it with overlap 2
    gt_keep = truths_valid & (best_prior_overlap > 0.2)
    p = priors.shape[0]
    # out-of-bounds index + mode='drop' skips non-kept GT rows safely
    force_idx = jnp.where(gt_keep, best_prior_idx, p)
    gt_range = jnp.arange(g)
    best_truth_overlap = best_truth_overlap.at[force_idx].set(
        jnp.full((g,), 2.0), mode="drop"
    )
    best_truth_idx = best_truth_idx.at[force_idx].set(
        gt_range, mode="drop"
    )

    matches = truths[best_truth_idx]                 # [P, 4]
    conf = labels[best_truth_idx]                    # [P]
    conf = jnp.where(best_truth_overlap < threshold, 0, conf)
    loc_t = encode_boxes(matches, priors, variances)
    landm_t = encode_landmarks(landms[best_truth_idx], priors, variances)
    return loc_t, conf, landm_t
