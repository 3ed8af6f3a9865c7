"""Fused Pallas stage-1 v2: DMA halo windows + aligned-slice taps.

Round-3's flat-lane kernels (ops/planar_s1_pallas.py) measured 9.13 ms
on the bench shapes vs the flax NHWC stage's 5.12; the round-4
attribution run (tools/exp_planar_s1.py --stages=p_*) split that as
**4.15 ms XLA glue** (banded overlapping copies + unband/s2d/band
transposes between the three kernels) and **3.83 ms kernel time**
(dominated by 9 masked lane-rolls per depthwise stencil). This v2
attacks both:

  * **No banded copies.** Activations live in HBM as natural
    ``[B, C, (2 + H + 1) * Wp]`` bf16 arrays — two zero halo rows on
    top, one below, columns zero-padded from W to Wp (the next
    multiple of 128, so every row starts lane-tile aligned). The
    kernel takes the array as a ``memory_space=ANY`` ref and each
    (image, band) grid step ``make_async_copy``s its own overlapping
    ``(band+3)``-row window straight into VMEM scratch — the XLA-side
    band materialisation (an extra full read+write per segment, plus
    halo duplication) disappears entirely. Between segments only the
    space-to-depth phase transpose remains (one fused XLA pad+
    transpose on a small bf16 array).

  * **Taps are aligned slices, not masked rolls.** With rows padded
    to Wp lanes and pad columns kept zero, a depthwise tap at
    (dy, dx) is a ``(dy + const) * Wp``-offset lane slice — Wp is a
    multiple of 128, so the slice is free vreg re-addressing — of one
    of at most three buffers: the window itself and its +-1-lane
    rolled copies. One stencil therefore costs 2 rolls total
    (1 for the stride-2 phase stencils, whose column shifts are
    one-sided) instead of 9 arbitrary-distance rolls, and the
    9-per-stencil column-validity masks vanish: a +-1 roll pulls the
    neighbouring row's zero pad column into the seam, which is
    exactly the conv's zero-padding semantics. The only masking left
    is one pad-column re-zero after each stencil's BN (BN(0) != 0)
    and the two phantom edge rows, as in v1.

Layout, weight folding (``fold_stage1_weights``), segment split
(conv0+block1 / blocks2-3 / blocks4-5) and numerics contracts are
shared with v1; parity is pinned against ops/planar_mnet.planar_stage1
(itself pinned to the flax NHWC modules — reference blocks
/root/reference/models/retina_face_utils/components.py:9-38).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .planar_s1_pallas import _leaky, fold_stage1_weights

# max output rows per band, per segment (bounds VMEM working sets;
# _pick_band rounds down to a divisor of the segment's row count)
_MAX_BANDS = (80, 40, 40)


def _pad_to_128(w):
    return -(-w // 128) * 128


def _pick_band(h_out, cap):
    band = min(cap, h_out)
    while h_out % band:
        band -= 1
    return band


def _roll_m1(x):
    """xL[n] = x[n - 1] (reads the previous lane; lane 0 wraps to the
    window end — only ever consumed through pad/halo positions)."""
    return pltpu.roll(x, 1, axis=1)


def _roll_p1(x):
    """xR[n] = x[n + 1]."""
    n = x.shape[-1]
    return pltpu.roll(x, n - 1, axis=1)


def _mxu(a, b, mxu_dt):
    return jax.lax.dot_general(
        a.astype(mxu_dt), b.astype(mxu_dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _phantom_zero(y1, band, wp, nb):
    """Zero y1's first row on band 0 (real row -1) and its last row on
    the last band (real row H) so the next stencil sees true zero
    padding — the stencil wrote post-BN values there (BN(0) != 0)."""
    i = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, y1.shape[-1]), 1)
    top = (i == 0) & (lane < wp)
    bot = (i == nb - 1) & (lane >= (band + 1) * wp)
    return jnp.where(top | bot, jnp.zeros((), y1.dtype), y1)


def _dma_window(x_hbm, xin, sem, band, wp):
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = band + 3
    dma = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * band * wp, rows * wp)], xin, sem)
    dma.start()
    dma.wait()


def _dw_slices(y1, y1l, y1r, kmat, band, wp, dtype):
    """Stride-1 depthwise 3x3 on y1 (rows = window rows [1, band+3)):
    output rows [2, band+2) (the emitted band). Tap (dy, dx) is the
    ((1+dy)*wp)-offset slice of {y1l, y1, y1r}[dx]."""
    n = band * wp
    acc = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            src = y1l if dx == -1 else (y1r if dx == 1 else y1)
            t = jax.lax.slice_in_dim(
                src, (1 + dy) * wp, (1 + dy) * wp + n, axis=1)
            i = (dy + 1) * 3 + dx + 1
            k = jax.lax.slice_in_dim(kmat, i, i + 1, axis=1)
            term = t * k
            acc = term if acc is None else acc + term
    return acc


def _seg1_kernel(x_hbm, b00, b01, b10, b11, bn0m, bn0a,
                 k1, m11, a11, pw1, m21, a21, cmask, out_ref,
                 xin, sem, *, dtype, nb, band, wp):
    """conv0 (3x3/s2 as four tap matmuls on the 12-plane s2d input)
    + BN + leaky, then block 1 (dw3x3/s1 + BN + leaky + pw + BN +
    leaky). f32 in-kernel; ``dtype`` sets MXU operand + output HBM
    precision."""
    dt = jnp.float32
    mxu_dt = jnp.dtype(dtype)
    _dma_window(x_hbm, xin, sem, band, wp)
    x = xin[...].astype(dt)              # [12, (band+3)*wp]
    xl = _roll_m1(x)
    n1 = (band + 2) * wp
    acc = None
    for (ry, rx), bref in zip(((0, 0), (0, 1), (1, 0), (1, 1)),
                              (b00, b01, b10, b11)):
        src = xl if rx else x
        t = jax.lax.slice_in_dim(src, (1 - ry) * wp,
                                 (1 - ry) * wp + n1, axis=1)
        term = _mxu(bref[...], t, mxu_dt)
        acc = term if acc is None else acc + term
    y1 = _leaky(acc * bn0m[...] + bn0a[...], dt)
    y1 = y1 * jax.lax.slice_in_dim(cmask[...], 0, n1, axis=1)
    y1 = _phantom_zero(y1, band, wp, nb)
    y = _dw_slices(y1, _roll_m1(y1), _roll_p1(y1), k1[...], band, wp,
                   dt)
    y = _leaky(y * m11[...] + a11[...], dt)
    y = _leaky(_mxu(pw1[...], y, mxu_dt) * m21[...] + a21[...], dt)
    out_ref[...] = y[None].astype(out_ref.dtype)


def _seg23_kernel(x_hbm, ka, m1a, a1a, pwa, m2a, a2a,
                  kb, m1b, a1b, pwb, m2b, a2b, cmask, out_ref,
                  xin, sem, *, dtype, nb, band, wp, cin):
    """One stride-2 block (phase-plane dw + BN + leaky + pw + BN +
    leaky) then one stride-1 block, fused — segments 2 (blocks 2-3)
    and 3 (blocks 4-5)."""
    dt = jnp.float32
    mxu_dt = jnp.dtype(dtype)
    _dma_window(x_hbm, xin, sem, band, wp)
    x = xin[...].astype(dt)              # [4*cin, (band+3)*wp]
    xl = _roll_m1(x)
    n1 = (band + 2) * wp
    acc = None
    for dy in range(3):
        py, ry = (dy + 1) % 2, 1 if dy == 0 else 0
        for dx in range(3):
            px, rx = (dx + 1) % 2, 1 if dx == 0 else 0
            p = py * 2 + px
            src = xl if rx else x
            plane = jax.lax.slice_in_dim(src, p * cin, (p + 1) * cin,
                                         axis=0)
            t = jax.lax.slice_in_dim(plane, (1 - ry) * wp,
                                     (1 - ry) * wp + n1, axis=1)
            k = jax.lax.slice_in_dim(ka[...], dy * 3 + dx,
                                     dy * 3 + dx + 1, axis=1)
            term = t * k
            acc = term if acc is None else acc + term
    y = _leaky(acc * m1a[...] + a1a[...], dt)
    y1 = _leaky(_mxu(pwa[...], y, mxu_dt) * m2a[...] + a2a[...], dt)
    y1 = y1 * jax.lax.slice_in_dim(cmask[...], 0, n1, axis=1)
    y1 = _phantom_zero(y1, band, wp, nb)
    y = _dw_slices(y1, _roll_m1(y1), _roll_p1(y1), kb[...], band, wp,
                   dt)
    y = _leaky(y * m1b[...] + a1b[...], dt)
    y = _leaky(_mxu(pwb[...], y, mxu_dt) * m2b[...] + a2b[...], dt)
    out_ref[...] = y[None].astype(out_ref.dtype)


def _colmask(band, w, wp):
    m = np.zeros((1, (band + 3) * wp), np.float32)
    m.reshape(band + 3, wp)[:, :w] = 1.0
    return jnp.asarray(m)


def _run_segment(kernel, x, weights, cin, cout, h, band, w, wp, dtype,
                 interpret, extra=None):
    """x: [B, cin, (h+3)*wp] bf16 natural-layout array (2 zero halo
    rows on top, 1 below, zero pad cols). Returns [B, cout, h*wp]."""
    b = x.shape[0]
    nb = h // band
    cm = _colmask(band, w, wp)
    kw = dict(dtype=dtype, nb=nb, band=band, wp=wp)
    if extra:
        kw.update(extra)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    for arr in list(weights) + [cm]:
        in_specs.append(pl.BlockSpec(
            arr.shape, partial(lambda i, j, _n=arr.ndim: (0,) * _n),
            memory_space=pltpu.VMEM))
    return pl.pallas_call(
        partial(kernel, **kw),
        grid=(b, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, cout, band * wp),
                               lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cout, h * wp), dtype),
        scratch_shapes=[
            pltpu.VMEM((cin, (band + 3) * wp), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, *weights, cm)


def _halo_pad(x4, wp):
    """[B, C, H, W] -> [B, C, (2 + H + 1) * wp] flat: 2 zero halo rows
    on top, 1 below, zero pad cols to wp."""
    b, c, h, w = x4.shape
    x4 = jnp.pad(x4, ((0, 0), (0, 0), (2, 1), (0, wp - w)))
    return x4.reshape(b, c, (h + 3) * wp)


def _s2d_glue(y, b, c, h, w, wp_old, wp_new):
    """Segment output [B, C, h*wp_old] -> next segment's input
    [B, 4C, (h/2 + 3) * wp_new]: drop pad cols, space-to-depth to
    plane-major 2x2 phases (p = py*2 + px), re-pad with halo."""
    y = y.reshape(b, c, h, wp_old)[:, :, :, :w]
    y = y.reshape(b, c, h // 2, 2, w // 2, 2)
    y = y.transpose(0, 3, 5, 1, 2, 4).reshape(b, 4 * c, h // 2, w // 2)
    return _halo_pad(y, wp_new)


def supports(h, w):
    """Needs the 2x2 s2d plus three clean halvings."""
    return h % 16 == 0 and w % 16 == 0


def planar_stage1_pallas_v2(params, stats, imgs_nhwc, sub, dtype=None,
                            interpret=False, _upto=None):
    """MobileNetV1-0.25 stage 1 as three fused Pallas programs with
    DMA halo windows. Same contract as planar_mnet.planar_stage1:
    [B, H, W, 3] uint8 (or float) frames -> NHWC [B, H/8, W/8, 64]."""
    dt = jnp.dtype(dtype) if dtype is not None else jnp.float32
    interpret = interpret or jax.default_backend() == "cpu"
    b, h, w, _ = imgs_nhwc.shape
    if not supports(h, w):
        raise ValueError(
            f"planar_stage1_pallas_v2 needs H, W % 16 == 0, got "
            f"{(h, w)}")
    h2, w2 = h // 2, w // 2
    wp1 = _pad_to_128(w2)
    # s2d + plane-major in ONE transpose; cast+sub in the cheap
    # 12-plane layout; c' = (py*2 + px)*3 + c
    x = imgs_nhwc.reshape(b, h2, 2, w2, 2, 3)
    x = x.transpose(0, 2, 4, 5, 1, 3).reshape(b, 12, h2, w2).astype(dt)
    x = x - jnp.tile(jnp.asarray(sub, dt), 4)[:, None, None]
    # Mosaic DMA slices must align to the (8, 128) tiling: pad the
    # 12-plane dim to 16 sublanes (zero planes; the conv0 tap matmuls
    # get matching zero weight columns below)
    x = jnp.pad(x, ((0, 0), (0, 4), (0, 0), (0, 0)))
    x = _halo_pad(x, wp1)
    if _upto == "x1":
        return x

    weights = fold_stage1_weights(params, stats)
    w_seg1, w_seg2, w_seg3 = (weights[:12], weights[12:24],
                              weights[24:36])
    w_seg1 = [jnp.pad(m, ((0, 0), (0, 4))) for m in w_seg1[:4]] + \
        list(w_seg1[4:])

    band1 = _pick_band(h2, _MAX_BANDS[0])
    y = _run_segment(_seg1_kernel, x, w_seg1, 16, 16, h2, band1, w2,
                     wp1, dt, interpret)
    if _upto == "k1":
        return y

    h4, w4 = h2 // 2, w2 // 2
    wp2 = _pad_to_128(w4)
    x = _s2d_glue(y, b, 16, h2, w2, wp1, wp2)
    if _upto == "x2":
        return x
    band2 = _pick_band(h4, _MAX_BANDS[1])
    y = _run_segment(_seg23_kernel, x, w_seg2, 64, 32, h4, band2, w4,
                     wp2, dt, interpret, extra={"cin": 16})
    if _upto == "k2":
        return y

    h8, w8 = h4 // 2, w4 // 2
    wp3 = _pad_to_128(w8)
    x = _s2d_glue(y, b, 32, h4, w4, wp2, wp3)
    if _upto == "x3":
        return x
    band3 = _pick_band(h8, _MAX_BANDS[2])
    y = _run_segment(_seg23_kernel, x, w_seg3, 128, 64, h8, band3, w8,
                     wp3, dt, interpret, extra={"cin": 32})
    if _upto == "k3":
        return y

    y = y.reshape(b, 64, h8, wp3)[:, :, :, :w8]
    return y.transpose(0, 2, 3, 1)
