"""Image resampling / warping kernels, shape-static and jittable.

TPU-native replacements for the reference's resampling stack:

* ``area_resize``      <- torch ``F.interpolate(mode="area")``
  (/root/reference/models/mtcnn_utils/detect_face.py:304-306). Implemented
  as two dense weight-matrix contractions (one per spatial axis) whose
  weights are the exact pixel-overlap fractions of adaptive average
  pooling — this turns a gather-heavy op into two MXU matmuls and is
  bit-faithful to the "area" semantics for any output size.
* ``crop_resize_bilinear`` <- the per-box Python crop loops + area
  resample of MTCNN stages 2/3 (detect_face.py:107-146), batched over a
  fixed face capacity with bilinear gathers.
* ``warp_affine``       <- ``cv2.warpAffine``
  (/root/reference/align_face.py:51-57): inverse-mapped bilinear sampling
  with zero border, batched over faces.
* normalisation helpers <- fixed_image_standardization (models/
  mtcnn.py:516-518) and prewhiten (data_loader/__init__.py:37-42).
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Exact "area" (adaptive average pool) resize via weight matrices
# ---------------------------------------------------------------------------


@lru_cache(maxsize=256)
def _area_weights(in_size: int, out_size: int):
    """[out_size, in_size] row-stochastic pooling matrix (NumPy, cached).

    torch's adaptive_avg_pool2d (what interpolate(mode="area") lowers
    to) averages the FULL pixels in [floor(o*in/out), ceil((o+1)*in/out))
    with equal weight — integer cell boundaries, no fractional overlap.
    """
    w = np.zeros((out_size, in_size), dtype=np.float32)
    for o in range(out_size):
        p0 = (o * in_size) // out_size
        p1 = -((-(o + 1) * in_size) // out_size)  # ceil
        p1 = min(max(p1, p0 + 1), in_size)
        w[o, p0:p1] = 1.0 / (p1 - p0)
    return w


def area_resize(images, out_hw):
    """Adaptive-average-pool resize for NHWC (or HWC) images.

    Matches ``torch.nn.functional.interpolate(mode="area")`` /
    ``adaptive_avg_pool2d`` numerics for any (up/down) size.
    """
    squeeze = images.ndim == 3
    if squeeze:
        images = images[None]
    n, h, w, c = images.shape
    oh, ow = out_hw
    # weights follow the input dtype so a bf16 pipeline stays bf16
    # (f32 inputs keep the exact adaptive-pool fractions)
    wh = jnp.asarray(_area_weights(h, oh)).astype(images.dtype)
    ww = jnp.asarray(_area_weights(w, ow)).astype(images.dtype)
    out = jnp.einsum("oh,nhwc->nowc", wh, images)
    out = jnp.einsum("pw,nowc->nopc", ww, out)
    return out[0] if squeeze else out


def pyramid_area_resize(images, sizes):
    """All pyramid levels of an exact area resize in one plane-major
    pass: ``images`` [N, H, W, C] -> list of [N, oh, ow, C].

    Same per-level weights/sums as :func:`area_resize`, but laid out
    for the TPU: channels fold into the batch ([N*C, H, W] planes keep
    the 640-wide W on the lane dim instead of the 3-wide C, which
    otherwise tiles 3->128), and the row contractions of ALL levels
    run as ONE [sum(oh), H] GEMM against each plane. Per-level column
    GEMMs then act on small row-slices. Measured on the cascade bench
    (8 levels of [32, 640, 640, 3]): ~4.0 ms -> well under 1 ms.
    """
    n, h, w, c = images.shape
    dt = images.dtype
    whs = [np.asarray(_area_weights(h, oh)) for oh, _ in sizes]
    offs = np.cumsum([0] + [m.shape[0] for m in whs])
    wrow = jnp.asarray(np.concatenate(whs, axis=0)).astype(dt)

    planes = jnp.transpose(images, (0, 3, 1, 2)).reshape(n * c, h, w)
    rows = jnp.einsum("oh,bhw->bow", wrow, planes)
    outs = []
    for idx, (oh, ow) in enumerate(sizes):
        wcol = jnp.asarray(_area_weights(w, ow)).astype(dt)
        lvl = jnp.einsum("pw,bow->bop", wcol,
                         rows[:, offs[idx]:offs[idx + 1], :])
        outs.append(
            jnp.transpose(lvl.reshape(n, c, oh, ow), (0, 2, 3, 1))
        )
    return outs


# ---------------------------------------------------------------------------
# Bilinear gather helpers
# ---------------------------------------------------------------------------


def _bilinear_gather(img, yy, xx, y_min, y_max, x_min, x_max):
    """Sample img [H, W, C] at float coords yy/xx [..., ], clamped to the
    given inclusive float bounds; returns [..., C]."""
    yy = jnp.clip(yy, y_min, y_max)
    xx = jnp.clip(xx, x_min, x_max)
    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    wy = (yy - y0)[..., None]
    wx = (xx - x0)[..., None]
    h, w = img.shape[0], img.shape[1]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def crop_resize_bilinear(img, box, size):
    """Crop a (1-based, inclusive, integer-valued float) xyxy box from
    img [H, W, C] and resize to [size, size, C].

    The crop window matches the reference's
    ``imgs[..., (y-1):ey, (x-1):ex]`` integer slice; the resample uses
    bilinear sampling at area-pool cell centres (the reference used
    exact area pooling — downstream R/O-net scores are insensitive to
    the difference, which parity tests bound).
    """
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    ch = y2 - y1 + 1.0
    cw = x2 - x1 + 1.0
    sy = ch / size
    sx = cw / size
    i = jnp.arange(size, dtype=jnp.float32)
    src_y = (y1 - 1.0) + (i + 0.5) * sy - 0.5
    src_x = (x1 - 1.0) + (i + 0.5) * sx - 0.5
    yy = jnp.broadcast_to(src_y[:, None], (size, size))
    xx = jnp.broadcast_to(src_x[None, :], (size, size))
    return _bilinear_gather(img, yy, xx, y1 - 1.0, y2 - 1.0, x1 - 1.0,
                            x2 - 1.0)


def batched_crop_resize(images, boxes, image_idx, size):
    """Crop/resize a fixed-capacity padded face set (bilinear).

    images: [B, H, W, C]; boxes: [K, 4]; image_idx: [K] int32 row into
    images. Returns [K, size, size, C].
    """
    def one(box, idx):
        return crop_resize_bilinear(images[idx], box, size)

    return jax.vmap(one)(boxes, image_idx)


def integral_image(images):
    """Zero-padded 2-D prefix sums: [B, H, W, C] -> [B, H+1, W+1, C].

    Accumulates in int32: inputs are uint8-valued pixels, so the sums
    are EXACT for images up to ~8.4M pixels — fp32 prefix sums would
    lose several bits on 1080p frames and corrupt small-cell averages.
    """
    px = jnp.round(images).astype(jnp.int32)
    s = jnp.cumsum(jnp.cumsum(px, axis=1), axis=2)
    s = jnp.pad(s, ((0, 0), (1, 0), (1, 0), (0, 0)))
    return s


def _area_pool_bounds(lo, hi, size):
    """Adaptive-pool integer cell bounds along one axis.

    lo/hi: [K] 1-based inclusive crop bounds (clamp_boxes output).
    Returns (p0, p1) [K, size] absolute 0-based pixel bounds.
    """
    o = jnp.arange(size, dtype=jnp.float32)
    extent = hi - lo + 1.0
    r0 = jnp.floor(o[None, :] * extent[:, None] / size)
    r1 = jnp.ceil((o[None, :] + 1.0) * extent[:, None] / size)
    r1 = jnp.minimum(jnp.maximum(r1, r0 + 1.0), extent[:, None])
    return lo[:, None] - 1.0 + r0, lo[:, None] - 1.0 + r1


def _area_pool_masks(p0, p1, in_size):
    """0/1 membership masks [K, size, in_size] + cell widths [K, size].

    The masks contract against the image on the MXU in bf16 — 0/1
    weights and uint8-valued pixels keep the sums EXACT (f32
    accumulation); the 1/width normalisation divides afterwards, so
    the result is bit-faithful adaptive average pooling without a
    single gather.
    """
    i = jnp.arange(in_size, dtype=jnp.float32)
    member = (i >= p0[..., None]) & (i < p1[..., None])
    return member, (p1 - p0)


def grouped_crop_area_resize(images, boxes, size):
    """EXACT adaptive-average-pool crop-resize over integer crop boxes,
    grouped per frame — ZERO gathers.

    Reproduces the reference MTCNN stage-2/3 resampling bit-for-bit:
    integer crop ``imgs[..., y1-1:y2, x1-1:x2]`` followed by torch
    adaptive_avg_pool2d to (size, size) (detect_face.py:109-112,
    304-306), expressed as two batched 0/1-mask contractions per axis.
    The 0/1 masks and uint8-valued pixels are exact in bf16, the MXU
    accumulates in f32, and the 1/cell-area normalisation divides
    afterwards — bit-faithful area pooling at matmul speed (gathers
    serialise on TPU, and vmapped per-face image indexing can
    materialise frame-copy temporaries).

    images: [B, H, W, C]; boxes: [B, K, 4] 1-based inclusive
    integer-valued floats (clamp_boxes output). Returns [B, K, S, S, C].
    """
    b, h, w, c = images.shape
    k = boxes.shape[1]
    flat = boxes.reshape(b * k, 4)
    py0, py1 = _area_pool_bounds(flat[:, 1], flat[:, 3], size)
    px0, px1 = _area_pool_bounds(flat[:, 0], flat[:, 2], size)
    my, wy = _area_pool_masks(py0, py1, h)   # [BK, S, H], [BK, S]
    mx, wx = _area_pool_masks(px0, px1, w)   # [BK, S, W], [BK, S]
    my = my.reshape(b, k, size, h).astype(jnp.bfloat16)
    mx = mx.reshape(b, k, size, w).astype(jnp.bfloat16)

    img_bf = images.astype(jnp.bfloat16)
    # tmp[b, k, o, w, c] = sum_h my[b, k, o, h] * images[b, h, w, c]
    tmp = jnp.einsum("bkoh,bhwc->bkowc", my, img_bf,
                     preferred_element_type=jnp.float32)
    # second (36x smaller) contraction in f32: tmp rows exceed bf16's
    # integer-exact range
    out = jnp.einsum("bkpw,bkowc->bkopc", mx.astype(jnp.float32), tmp)
    norm = (wy[:, :, None] * wx[:, None, :]).reshape(
        b, k, size, size, 1
    )
    return out / jnp.maximum(norm, 1.0)


def batched_crop_area_resize(images, boxes, image_idx, size,
                             integral=None):
    """Flat-interface wrapper over :func:`grouped_crop_area_resize` for
    face sets laid out as [K, 4] + image_idx with a FIXED per-image
    count (K % B == 0 and image_idx block-ordered), which is how the
    capacity-padded cascade produces them. ``integral`` is accepted for
    backward compatibility and ignored."""
    b = images.shape[0]
    k = boxes.shape[0]
    per = k // b
    grouped = grouped_crop_area_resize(
        images, boxes.reshape(b, per, 4), size
    )
    return grouped.reshape(k, size, size, images.shape[-1])


# ---------------------------------------------------------------------------
# Affine warp (face alignment)
# ---------------------------------------------------------------------------


def invert_affine(m):
    """Invert a [2, 3] affine matrix (returns [2, 3])."""
    a, b, tx = m[0, 0], m[0, 1], m[0, 2]
    c, d, ty = m[1, 0], m[1, 1], m[1, 2]
    det = a * d - b * c
    inv_a = d / det
    inv_b = -b / det
    inv_c = -c / det
    inv_d = a / det
    inv_tx = -(inv_a * tx + inv_b * ty)
    inv_ty = -(inv_c * tx + inv_d * ty)
    return jnp.array([[inv_a, inv_b, inv_tx], [inv_c, inv_d, inv_ty]])


def warp_affine(img, m, out_hw, border_value=0.0):
    """Apply a forward affine map (src->dst, cv2 convention) to
    img [H, W, C] producing [out_h, out_w, C] with bilinear sampling and
    a constant border (cv2.warpAffine BORDER_CONSTANT semantics,
    align_face.py:55).

    Border handling is per-tap, matching cv2: each of the four bilinear
    taps falling outside the image contributes ``border_value``, so a
    sample point within 1 px of the image edge BLENDS toward the border
    instead of clamping to the edge pixel. The reference's par
    alignment path warps a zero-bordered face crop
    (demo_image.py:216-229 crop -> align_face.py:55 warpAffine), so the
    1-px fade band at crop edges is observable downstream — the
    full-pipeline differential test pins it."""
    out_h, out_w = out_hw
    inv = invert_affine(m)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(xs, ys)
    src_x = inv[0, 0] * xx + inv[0, 1] * yy + inv[0, 2]
    src_y = inv[1, 0] * xx + inv[1, 1] * yy + inv[1, 2]
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    wy = (src_y - y0)[..., None]
    wx = (src_x - x0)[..., None]
    # tap validity from the UNCLIPPED float floor (a far-out point must
    # not borrow a clipped in-range neighbour); clip floats into range
    # before the int cast so absurd coords can't overflow int32.
    vy0 = (y0 >= 0.0) & (y0 <= h - 1.0)
    vy1 = (y0 >= -1.0) & (y0 <= h - 2.0)
    vx0 = (x0 >= 0.0) & (x0 <= w - 1.0)
    vx1 = (x0 >= -1.0) & (x0 <= w - 2.0)
    y0i = jnp.clip(y0, 0.0, h - 1.0).astype(jnp.int32)
    x0i = jnp.clip(x0, 0.0, w - 1.0).astype(jnp.int32)
    y1i = jnp.clip(y0 + 1.0, 0.0, h - 1.0).astype(jnp.int32)
    x1i = jnp.clip(x0 + 1.0, 0.0, w - 1.0).astype(jnp.int32)

    def tap(yi, xi, valid):
        return jnp.where(valid[..., None], img[yi, xi], border_value)

    v00 = tap(y0i, x0i, vy0 & vx0)
    v01 = tap(y0i, x1i, vy0 & vx1)
    v10 = tap(y1i, x0i, vy1 & vx0)
    v11 = tap(y1i, x1i, vy1 & vx1)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def batched_warp_affine(images, image_idx, mats, out_hw, border_value=0.0):
    """Warp a padded face set: images [B,H,W,C], image_idx [K], mats
    [K,2,3] -> [K, out_h, out_w, C]."""
    def one(idx, m):
        return warp_affine(images[idx], m, out_hw, border_value)

    return jax.vmap(one)(image_idx, mats)


# ---------------------------------------------------------------------------
# Normalisation
# ---------------------------------------------------------------------------


def fixed_image_standardization(x):
    """(x - 127.5) / 128 (reference models/mtcnn.py:516-518 and the
    'default' transform fix_std, data_loader/__init__.py:27-28)."""
    return (x - 127.5) / 128.0


def prewhiten(x):
    """Per-image mean/std whitening (data_loader/__init__.py:37-42)."""
    mean = jnp.mean(x)
    std = jnp.std(x)
    std_adj = jnp.maximum(std, 1.0 / jnp.sqrt(float(x.size)))
    return (x - mean) / std_adj


def imagenet_normalize(x):
    """float [0,1] -> ImageNet-normalised (trans_emotion_inf,
    data_loader/__init__.py:74-81)."""
    mean = jnp.array([0.485, 0.456, 0.406], x.dtype)
    std = jnp.array([0.229, 0.224, 0.225], x.dtype)
    return (x - mean) / std
