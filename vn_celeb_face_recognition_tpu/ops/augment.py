"""On-device data augmentation, replacing the reference's imgaug stack.

The reference augments on the host with imgaug inside the Dataset
(__getitem__), one image at a time (/root/reference/data_loader/
__init__.py:10-25,45-49,58-65). Here every augmenter is a pure, jittable
function of ``(rng_key, image)`` on float images in [0, 255], vmapped
over the batch and fused into the training step — the online-aug trainer
therefore keeps its frozen-encoder forward and its augmentation on the
TPU with zero host round trips.

Pipelines provided (matching reference names):
  * ``rank1_vn_celeb_aug``: Fliplr(0.5) + Sometimes(0.8, OneOf[grayscale,
    hue/sat +-20, add +-20, multiply 0.5-1.5, gaussian blur 0-2,
    contrast 0.5-2, sharpen, emboss]) then per-image prewhiten
    (data_loader/__init__.py:11-25,45-49).
  * ``facenet_aug``: rotation +-10deg, random crop to 160 with pad 2,
    horizontal flip, then fixed standardisation
    (data_loader/__init__.py:58-65).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .image import fixed_image_standardization, prewhiten, warp_affine


# ---------------------------------------------------------------------------
# Colour-space helpers
# ---------------------------------------------------------------------------


def rgb_to_hsv(rgb):
    """RGB [0,1] -> HSV [0,1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe_delta = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0.0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    """HSV [0,1] -> RGB [0,1]."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# Single-image augmenters (float images in [0, 255])
# ---------------------------------------------------------------------------


def aug_grayscale(key, img):
    alpha = jax.random.uniform(key)
    gray = (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )[..., None]
    return (1.0 - alpha) * img + alpha * gray


def aug_hue_saturation(key, img, value_range=(-20.0, 20.0)):
    k1, k2 = jax.random.split(key)
    dh = jax.random.uniform(k1, minval=value_range[0], maxval=value_range[1])
    ds = jax.random.uniform(k2, minval=value_range[0], maxval=value_range[1])
    hsv = rgb_to_hsv(jnp.clip(img / 255.0, 0.0, 1.0))
    h = (hsv[..., 0] + dh / 255.0) % 1.0
    s = jnp.clip(hsv[..., 1] + ds / 255.0, 0.0, 1.0)
    out = hsv_to_rgb(jnp.stack([h, s, hsv[..., 2]], axis=-1)) * 255.0
    return out


def aug_add(key, img, value_range=(-20.0, 20.0), per_channel_prob=0.5):
    k1, k2, k3 = jax.random.split(key, 3)
    per_channel = jax.random.bernoulli(k1, per_channel_prob)
    add_c = jax.random.uniform(k2, (3,), minval=value_range[0],
                               maxval=value_range[1])
    add_s = jax.random.uniform(k3, minval=value_range[0],
                               maxval=value_range[1])
    add = jnp.where(per_channel, add_c, add_s)
    return jnp.clip(img + add, 0.0, 255.0)


def aug_multiply(key, img, value_range=(0.5, 1.5), per_channel_prob=0.5):
    k1, k2, k3 = jax.random.split(key, 3)
    per_channel = jax.random.bernoulli(k1, per_channel_prob)
    mul_c = jax.random.uniform(k2, (3,), minval=value_range[0],
                               maxval=value_range[1])
    mul_s = jax.random.uniform(k3, minval=value_range[0],
                               maxval=value_range[1])
    mul = jnp.where(per_channel, mul_c, mul_s)
    return jnp.clip(img * mul, 0.0, 255.0)


def aug_gaussian_blur(key, img, sigma_range=(0.0, 2.0), radius=4):
    sigma = jax.random.uniform(key, minval=sigma_range[0],
                               maxval=sigma_range[1])
    sigma = jnp.maximum(sigma, 1e-3)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    kernel = jnp.exp(-0.5 * (x / sigma) ** 2)
    kernel = kernel / jnp.sum(kernel)
    # Separable blur via two 1-D convolutions (VPU-friendly, static size).
    img_t = jnp.moveaxis(img, -1, 0)[:, None]  # [C, 1, H, W]
    kh = kernel[None, None, :, None]
    kw = kernel[None, None, None, :]
    out = jax.lax.conv_general_dilated(img_t, kh, (1, 1),
                                       [(radius, radius), (0, 0)])
    out = jax.lax.conv_general_dilated(out, kw, (1, 1),
                                       [(0, 0), (radius, radius)])
    return jnp.moveaxis(out[:, 0], 0, -1)


def aug_contrast(key, img, alpha_range=(0.5, 2.0), per_channel_prob=0.5):
    k1, k2, k3 = jax.random.split(key, 3)
    per_channel = jax.random.bernoulli(k1, per_channel_prob)
    a_c = jax.random.uniform(k2, (3,), minval=alpha_range[0],
                             maxval=alpha_range[1])
    a_s = jax.random.uniform(k3, minval=alpha_range[0], maxval=alpha_range[1])
    alpha = jnp.where(per_channel, a_c, a_s)
    return jnp.clip((img - 127.5) * alpha + 127.5, 0.0, 255.0)


def _conv3x3_per_channel(img, kernel):
    img_t = jnp.moveaxis(img, -1, 0)[:, None]  # [C, 1, H, W]
    k = kernel[None, None]
    out = jax.lax.conv_general_dilated(img_t, k, (1, 1),
                                       [(1, 1), (1, 1)])
    return jnp.moveaxis(out[:, 0], 0, -1)


def aug_sharpen(key, img, alpha_range=(0.0, 0.5), lightness_range=(0.7, 1.3)):
    k1, k2 = jax.random.split(key)
    alpha = jax.random.uniform(k1, minval=alpha_range[0],
                               maxval=alpha_range[1])
    lightness = jax.random.uniform(k2, minval=lightness_range[0],
                                   maxval=lightness_range[1])
    effect = jnp.array(
        [[-1.0, -1.0, -1.0], [-1.0, 8.0 + lightness, -1.0],
         [-1.0, -1.0, -1.0]]
    )
    sharp = _conv3x3_per_channel(img, effect)
    return jnp.clip((1.0 - alpha) * img + alpha * sharp, 0.0, 255.0)


def aug_emboss(key, img, alpha_range=(0.0, 0.5), strength_range=(0.0, 1.5)):
    k1, k2 = jax.random.split(key)
    alpha = jax.random.uniform(k1, minval=alpha_range[0],
                               maxval=alpha_range[1])
    strength = jax.random.uniform(k2, minval=strength_range[0],
                                  maxval=strength_range[1])
    effect = jnp.array(
        [
            [-1.0 - strength, 0.0 - strength, 0.0],
            [0.0 - strength, 1.0, 0.0 + strength],
            [0.0, 0.0 + strength, 1.0 + strength],
        ]
    )
    embossed = _conv3x3_per_channel(img, effect)
    return jnp.clip((1.0 - alpha) * img + alpha * embossed, 0.0, 255.0)


def aug_hflip(key, img, prob=0.5):
    flip = jax.random.bernoulli(key, prob)
    return jnp.where(flip, img[:, ::-1, :], img)


def aug_rotate(key, img, degree_range=(-10.0, 10.0)):
    deg = jax.random.uniform(key, minval=degree_range[0],
                             maxval=degree_range[1])
    rad = deg * jnp.pi / 180.0
    h, w = img.shape[0], img.shape[1]
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    # Forward map rotating about the image centre.
    m = jnp.array(
        [
            [cos, -sin, cx - cos * cx + sin * cy],
            [sin, cos, cy - sin * cx - cos * cy],
        ]
    )
    return warp_affine(img, m, (h, w))


def aug_random_crop(key, img, size, padding=2):
    padded = jnp.pad(
        img, ((padding, padding), (padding, padding), (0, 0))
    )
    max_y = padded.shape[0] - size
    max_x = padded.shape[1] - size
    k1, k2 = jax.random.split(key)
    y0 = jax.random.randint(k1, (), 0, max_y + 1)
    x0 = jax.random.randint(k2, (), 0, max_x + 1)
    return jax.lax.dynamic_slice(padded, (y0, x0, 0),
                                 (size, size, img.shape[2]))


# ---------------------------------------------------------------------------
# Pipelines
# ---------------------------------------------------------------------------

_RANK1_OPS = (
    aug_grayscale,
    aug_hue_saturation,
    aug_add,
    aug_multiply,
    aug_gaussian_blur,
    aug_contrast,
    aug_sharpen,
    aug_emboss,
)


def rank1_vn_celeb_aug(key, img):
    """One image of the rank-1 VN-celeb pipeline; returns a prewhitened
    float image (matches transforms_rank1_VNceleb_aug semantics)."""
    k_flip, k_some, k_choice, k_op = jax.random.split(key, 4)
    img = aug_hflip(k_flip, img)
    apply_one = jax.random.bernoulli(k_some, 0.8)
    op_idx = jax.random.randint(k_choice, (), 0, len(_RANK1_OPS))
    augmented = jax.lax.switch(
        op_idx, [partial(op, k_op) for op in _RANK1_OPS], img
    )
    img = jnp.where(apply_one, augmented, img)
    return prewhiten(img)


def facenet_aug(key, img, out_size=None):
    """One image of the facenet pipeline; returns standardised float.

    The reference pipeline crops to its fixed encoder size (160) with
    2px padding, i.e. a +-2px jitter on same-sized inputs
    (data_loader/__init__.py:58-65); ``out_size=None`` keeps that
    jitter semantic for any input size instead of hard-coding 160.
    """
    if out_size is None:
        out_size = img.shape[0]
    k_rot, k_crop, k_flip = jax.random.split(key, 3)
    img = aug_rotate(k_rot, img)
    img = aug_random_crop(k_crop, img, out_size, padding=2)
    img = aug_hflip(k_flip, img)
    return fixed_image_standardization(img)


def batch_apply(aug_fn, key, images, **kwargs):
    """vmap an augmenter over a batch with per-image keys."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, x: aug_fn(k, x, **kwargs))(keys, images)


# ---------------------------------------------------------------------------
# Batched 3-shear facenet_aug — the training hot path
# ---------------------------------------------------------------------------


def _shear_pass(x, shift, axis, kmax):
    """Fractional 1-D resample: out[..p..] = x[..p + shift..] along
    ``axis``, per-(image, line) ``shift`` [B, L] (L = the other
    spatial axis). Gather-free AND materialisation-free: zero-pad the
    axis once, then the integer part picks among 2*kmax+2 STATIC
    SLICES of the padded buffer with ONE ``lax.select_n`` (each
    output element reads exactly one input element — XLA fuses the
    slices as offset reads of one buffer, unlike a masked-roll
    accumulate chain which materialises every term: measured 45.6 ms
    -> see facenet_aug_shear). The fractional part is one lerp
    against the +1 slice select. Out-of-range samples read the zero
    pad (rotation border semantics) — no masks needed."""
    n = x.shape[axis]
    kk = jnp.floor(shift)
    frac = shift - kk
    idx = jnp.clip(kk.astype(jnp.int32) + kmax, 0, 2 * kmax)
    if axis == 2:
        idxb = idx[:, :, None, None]
        fb = frac[:, :, None, None]
    else:
        idxb = idx[:, None, :, None]
        fb = frac[:, None, :, None]
    idxb = jnp.broadcast_to(idxb, x.shape)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (kmax, kmax + 1)
    xp = jnp.pad(x, pad)
    cases = [
        jax.lax.slice_in_dim(xp, k, k + n, axis=axis)
        for k in range(2 * kmax + 2)
    ]
    a = jax.lax.select_n(idxb, *cases[:2 * kmax + 1])
    b = jax.lax.select_n(idxb, *cases[1:])
    return (1.0 - fb) * a + fb * b


def _shear_geometry(h, w, degree_range, tmax):
    """Static pads and slice counts covering every rotation in range
    plus a folded per-image translation of magnitude <= tmax."""
    dmax = max(abs(degree_range[0]), abs(degree_range[1]))
    rmax = dmax * np.pi / 180.0
    amax = abs(np.tan(rmax / 2.0))
    bmax = abs(np.sin(rmax))
    my = 8
    for _ in range(4):
        mx = int(np.ceil(2 * amax * (h / 2.0 + my) + tmax)) + 2
        my = int(np.ceil(bmax * (w / 2.0 + mx) + tmax)) + 2
    mx = max(mx, 4)
    kmax_x = int(np.ceil(amax * (h + 2 * my) / 2.0 + 1.1 * tmax)) + 1
    kmax_y = int(np.ceil(bmax * (w + 2 * mx) / 2.0 + tmax)) + 1
    return my, mx, kmax_x, kmax_y


def facenet_aug_shear(key, images, out_size=None,
                      degree_range=(-10.0, 10.0), padding=2):
    """Batched facenet_aug with the rotation as THREE shear passes —
    the training hot path (same distributions as ``facenet_aug``,
    reference data_loader/__init__.py:58-65).

    ``batch_apply(facenet_aug, ...)``'s exact bilinear rotation costs
    137.4 ms of the 171.2 ms train step on the v5e (80%! —
    tools/profile_train_step.py): XLA lowers the vmapped warp's 4
    gathers/pixel poorly at batch 256. The sampling rotation
    R(-theta) = Sx(tan(theta/2)) . Sy(-sin(theta)) . Sx(tan(theta/2))
    is exact as an operator identity; each shear is a separable 1-D
    fractional shift LINEAR in the other coordinate, so its integer
    part takes only ~6-12 distinct values per pass — a K-way masked
    select over static rolls that XLA fuses into one elementwise op.
    No gathers, no Pallas, fully batched. The double-lerp chain is
    the same documented slightly-softer bilinear as the alignment
    path (ops/warp_fast.py); the reference's own rotation is BICUBIC,
    so exact-bilinear was already a family choice, and the consumer
    is a training-time augmentation.

    Zero-fill parity: passes run on a zero-padded canvas sized so no
    in-range rotation clips content (``_shear_geometry``); the
    central h x w box is then masked (true rotate clips to the input
    canvas) before the pad-``padding`` random crop and hflip.
    """
    b, h, w, _ = images.shape
    if out_size is None:
        out_size = h
    k_rot, k_crop, k_flip = jax.random.split(key, 3)
    deg = jax.random.uniform(k_rot, (b,), minval=degree_range[0],
                             maxval=degree_range[1])
    rad = deg * jnp.pi / 180.0
    a = jnp.tan(rad / 2.0)
    s2 = -jnp.sin(rad)
    k1, k2 = jax.random.split(k_crop)
    max_y = h + 2 * padding - out_size
    max_x = w + 2 * padding - out_size
    y0 = jax.random.randint(k1, (b,), 0, max_y + 1)
    x0 = jax.random.randint(k2, (b,), 0, max_x + 1)
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))

    # the crop is the per-image translation t = (x0-p, y0-p) of the
    # rotated canvas; since shears are affine it folds into the pass
    # constants — rotated translation (rx, ry) = R(-theta) t lands as
    # pass2 += ry, pass3 += rx - a*ry (augmented-matrix identity) —
    # making the final crop a STATIC slice (a vmapped dynamic_slice
    # cost a full extra pass)
    tx = (x0 - padding).astype(jnp.float32)
    ty = (y0 - padding).astype(jnp.float32)
    cosr, sinr = jnp.cos(rad), jnp.sin(rad)
    rx = cosr * tx + sinr * ty
    ry = -sinr * tx + cosr * ty

    tmax = float(np.ceil(1.2 * max(padding, max_y - padding,
                                   max_x - padding)) + 1)
    my, mx, kmax_x, kmax_y = _shear_geometry(h, w, degree_range, tmax)
    x = jnp.pad(images.astype(jnp.float32),
                ((0, 0), (my, my), (mx, mx), (0, 0)))
    hp, wp = h + 2 * my, w + 2 * mx
    cy, cx = (hp - 1) / 2.0, (wp - 1) / 2.0
    ys = jnp.arange(hp, dtype=jnp.float32)[None, :] - cy   # [1, Hp]
    xs = jnp.arange(wp, dtype=jnp.float32)[None, :] - cx   # [1, Wp]
    # composite sampling map = Sx(pass1) . Sy(pass2) . Sx(pass3) with
    # pass3 innermost; translation column (w=0 innermost): pass1 gets
    # u = rx - a*ry, pass2 gets v = ry
    x = _shear_pass(x, a[:, None] * ys + (rx - a * ry)[:, None], 2,
                    kmax_x)
    x = _shear_pass(x, s2[:, None] * xs + ry[:, None], 1, kmax_y)
    x = _shear_pass(x, a[:, None] * ys, 2, kmax_x)
    # static crop at the content origin (the reference's window sits
    # at rot[p + t]; t already rode the shears)
    out = x[:, my:my + out_size, mx:mx + out_size]
    # the reference crops the PADDED rotated canvas: output pixel p is
    # the zero pad (not rotated content) wherever p + t leaves the
    # h x w canvas — separable per-image band masks
    ys_o = jnp.arange(out_size, dtype=jnp.float32)[None, :]
    row_ok = ((ys_o + ty[:, None] >= -0.5)
              & (ys_o + ty[:, None] < h - 0.5))
    col_ok = ((ys_o + tx[:, None] >= -0.5)
              & (ys_o + tx[:, None] < w - 0.5))
    band = row_ok[:, :, None, None] & col_ok[:, None, :, None]
    out = jnp.where(band, out, 0.0)
    out = jnp.where(flip[:, None, None, None], out[:, :, ::-1, :], out)
    return fixed_image_standardization(out)


def _facenet_aug_params(key, batch, h, w, out_size, padding=2,
                        degree_range=(-10.0, 10.0)):
    """Sample the facenet_aug geometry for a batch and fold it into ONE
    forward similarity matrix per image.

    rotate(+-10 deg about the centre) then pad-``padding``-and-crop to
    ``out_size`` is translation-composed-with-rotation — a similarity.
    Returns (mats [B, 2, 3] forward src->dst, flip [B] bool).
    """
    k_rot, k_crop, k_flip = jax.random.split(key, 3)
    deg = jax.random.uniform(k_rot, (batch,), minval=degree_range[0],
                             maxval=degree_range[1])
    rad = deg * jnp.pi / 180.0
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    k1, k2 = jax.random.split(k_crop)
    max_y = h + 2 * padding - out_size
    max_x = w + 2 * padding - out_size
    y0 = jax.random.randint(k1, (batch,), 0, max_y + 1)
    x0 = jax.random.randint(k2, (batch,), 0, max_x + 1)
    # crop at offset (y0, x0) of the padded plane == translate by
    # -(o - padding) after the centre rotation (zero border both ways)
    tx = cx - cos * cx + sin * cy - (x0.astype(jnp.float32) - padding)
    ty = cy - sin * cx - cos * cy - (y0.astype(jnp.float32) - padding)
    mats = jnp.stack(
        [jnp.stack([cos, -sin, tx], -1),
         jnp.stack([sin, cos, ty], -1)],
        axis=1,
    )
    flip = jax.random.bernoulli(k_flip, 0.5, (batch,))
    offs = jnp.stack([y0 - padding, x0 - padding], -1)  # [B, 2] (oy, ox)
    return mats, flip, offs


def facenet_aug_batch(key, images, out_size=None):
    """Batched, gather-free ``facenet_aug`` — MEASURED AND REJECTED for
    the training hot path; kept opt-in as a documented negative result.

    Hypothesis: ``batch_apply(facenet_aug, ...)`` warps each image with
    the exact bilinear ``warp_affine`` (4 gathers per output pixel), so
    folding the rotation + crop jitter into ONE similarity map per
    image and running the batch through the alignment hot-path warp
    (ops/warp_fast.batched_similarity_warp: quadrant + 3-shear +
    hat-matrix matmuls, no gathers) should win like it does for
    alignment. Measured on the v5e (bench.py --train, 256x112px batch,
    frozen iresnet100 + MLP step): this path 559.0 ms/step vs the
    vmapped exact-warp path's 171.2 ms/step — a 3.3x REGRESSION. XLA
    lowers the batch-vmapped small-image gather warp efficiently, while
    the shear chain pays its static worst-case rotation envelope, the
    [H, C, W] relayout, and per-grid-step serialization for 256 tiny
    images; the alignment win (224px windows cut from 640px frames)
    does not transfer. Adds to docs/tpu_kernel_patterns.md rule #4:
    XLA's gather lowering is only catastrophic for LARGE source planes.

    Semantics (pinned by tests/test_facenet_aug_batch.py): same
    parameter distributions as ``facenet_aug`` (reference
    data_loader/__init__.py:58-65); the 3-shear chain is the documented
    slightly-softer bilinear of the align path.
    """
    from .warp_fast import batched_similarity_warp

    b, h, w, _ = images.shape
    if out_size is None:
        out_size = h
    mats, flip, offs = _facenet_aug_params(key, b, h, w, out_size)
    out = batched_similarity_warp(images, mats, out_size)
    # pad-band mask: the sequential pipeline crops the PADDED rotated
    # canvas, so output pixel (y, x) is the zero pad (not image
    # content) whenever (y + oy, x + ox) leaves the canvas — the
    # folded warp would otherwise sample real pixels there
    oy = offs[:, 0, None]
    ox = offs[:, 1, None]
    ys = jnp.arange(out_size)[None, :]
    row_ok = (ys + oy >= 0) & (ys + oy < h)  # [B, out]
    col_ok = (ys + ox >= 0) & (ys + ox < w)
    mask = (row_ok[:, :, None] & col_ok[:, None, :])[..., None]
    out = jnp.where(mask, out, 0.0)
    out = jnp.where(flip[:, None, None, None], out[:, :, ::-1, :], out)
    return fixed_image_standardization(out)
