"""Fused Pallas kernels for MobileNetV1-0.25 stage 1 (flat-lane).

Why a kernel: the stage's six blocks run at 8-64 channels, where NHWC
lane-tiles C to 128 (16x padding at C=8) — the flax stage measures
~5 ms/chunk on the bench shapes against a ~2 ms HBM roofline. The XLA
plane-major rewrite (ops/planar_mnet.py) fixed the layout but measured
17.2 ms: XLA materialises each of the nine shifted stencil taps (and
the 2x2 phase split) as full HBM arrays instead of fusing them
(tools/exp_planar_parts.py attribution). Pallas fuses the whole block
chain in VMEM, so HBM sees each activation exactly once.

Layout: activations live as [C, N] with C in SUBLANES and the image
FLATTENED into lanes (N = rows * W). Every op is then Mosaic-native:

  * pointwise 1x1 convs are true 2D MXU matmuls [O, C] @ [C, N];
  * depthwise 3x3 taps are static lane rolls (pltpu.roll) by
    dy * W + dx with column-validity masks (a precomputed lane%W
    vector) — pure VPU, zero HBM traffic;
  * BatchNorm (eval) folds to [C, 1] scale+bias sublane broadcasts;
  * stride-2 convs never compact in-kernel: the caller space-to-depth
    splits the input into 2x2 phase planes ([4C, N/4], plane-major),
    so each stride-2 tap is a rolled phase plane at the ALREADY
    compacted resolution — the same mapping as the first conv, whose
    3x3/s2 becomes four [8, 12] tap matmuls on the 12-plane input.

The stage runs as THREE kernels split at the stride-2 boundaries
(blocks 0-1 / 2-3 / 4-5); between them XLA does only reshape/
transpose/pad glue (no stencil taps — the planar-XLA failure mode).
Each kernel grids over (image, row-band): bands carry a 3-row halo
(2 top, 1 bottom) materialised by the caller with zero edge rows, so
VMEM holds ~1 MB working sets and the only row fix-up is zeroing the
two phantom edge rows between the segment's two stencils.

The weights are derived from the ordinary flax/torch checkpoint tree
in `fold_stage1_weights` (traceable — runs under jit on live params),
so published checkpoints need no re-conversion, and outputs match
ops/planar_mnet.planar_stage1 (the parity-tested XLA reference, itself
pinned to the flax NHWC modules) to float-reassociation tolerance.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .planar_mnet import _STAGE1_SPECS, _fold_bn

_LEAKY = 0.1
# Max output rows per band: bounds per-step VMEM (~(band+3)*W lanes
# per live array). _n_bands rounds the band down to a divisor of the
# row count, so 96 yields e.g. 80-row bands at 320 rows / 96 cap.
_MAX_BAND = 96


def _leaky(y, dtype):
    return jnp.where(y >= 0, y, y * jnp.asarray(_LEAKY, dtype))


def _tap(x, dy, dx, wn, colmod, dtype):
    """t[., w*wn + j] = x[., (w+dy)*wn + (j+dx)], zero where the column
    j+dx leaves [0, wn). Row wrap-around is the caller's business (the
    band halo guarantees used rows never read wrapped data)."""
    n = x.shape[-1]
    d = dy * wn + dx
    t = x if d == 0 else pltpu.roll(x, (-d) % n, axis=1)
    if dx > 0:
        t = jnp.where(colmod < wn - dx, t, jnp.zeros((), dtype))
    elif dx < 0:
        t = jnp.where(colmod >= -dx, t, jnp.zeros((), dtype))
    return t


def _dw_s1(y, kmat, wn, colmod, dtype):
    """Stride-1 depthwise 3x3 (SAME): nine rolled taps. kmat [C, 9]
    tap-minor (index (dy+1)*3 + dx+1)."""
    acc = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            t = _tap(y, dy, dx, wn, colmod, dtype)
            i = (dy + 1) * 3 + dx + 1
            k = jax.lax.slice_in_dim(kmat, i, i + 1, axis=1)  # [C, 1]
            term = t * k
            acc = term if acc is None else acc + term
    return acc


def _dw_phase(x4, c, kmat, wn, colmod, dtype):
    """Stride-2 depthwise 3x3 (SAME) on plane-major s2d input
    [4C, N]: out[u, v] = sum k[dy, dx] * x[2u+dy-1, 2v+dx-1]; padded
    row 2u+dy-1 lives in phase (dy+1)%2 at index u - (1 iff dy==0)
    (and likewise for columns), so every tap is one rolled plane."""
    acc = None
    for dy in range(3):
        py, ry = (dy + 1) % 2, 1 if dy == 0 else 0
        for dx in range(3):
            px, rx = (dx + 1) % 2, 1 if dx == 0 else 0
            p = py * 2 + px
            plane = jax.lax.slice_in_dim(x4, p * c, (p + 1) * c, axis=0)
            t = _tap(plane, -ry, -rx, wn, colmod, dtype)
            k = jax.lax.slice_in_dim(kmat, dy * 3 + dx,
                                     dy * 3 + dx + 1, axis=1)
            term = t * k
            acc = term if acc is None else acc + term
    return acc


def _pw(y, pw, m2, a2, mxu_dt):
    """1x1 conv + BN + leaky: [O, C] @ [C, N] on the MXU (operands in
    the compute dtype, f32 accumulation; BN/leaky stay f32 — Mosaic's
    lane rotate only handles 32-bit data, so every roll-touching
    array in these kernels is f32)."""
    o = jax.lax.dot_general(pw.astype(mxu_dt), y.astype(mxu_dt),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return _leaky(o * m2 + a2, jnp.float32)


def _zero_phantom_rows(y, band_id, nb, band, wn, dtype):
    """Zero the two halo rows that sit OUTSIDE the real image (real
    rows -1 and H) so the next stencil sees true zero padding — the
    first stencil wrote post-BN values there (BN(0) != 0)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (1, y.shape[-1]), 1)
    top = (band_id == 0) & (p >= wn) & (p < 2 * wn)
    bot = (band_id == nb - 1) & (p >= (band + 2) * wn)
    return jnp.where(top | bot, jnp.zeros((), dtype), y)


def _emit(y, band, wn, out_ref):
    """Drop the 2 leading halo rows and the trailing one; write the
    band's real rows. Roll-then-slice keeps the lane offset at 0."""
    n = y.shape[-1]
    yo = pltpu.roll(y, n - 2 * wn, axis=1)
    out = jax.lax.slice_in_dim(yo, 0, band * wn, axis=1)
    out_ref[...] = out[None, None].astype(out_ref.dtype)


def _seg1_kernel(x_ref, b00, b01, b10, b11, bn0m, bn0a,
                 k1, m11, a11, pw1, m21, a21, cm_ref, out_ref,
                 *, dtype, nb, band, wn):
    """Conv0 (3x3/s2 as four tap matmuls on the 12-plane s2d input)
    + BN + leaky, then block 1 (dw3x3/s1 + BN + leaky + pw + BN +
    leaky). Works on one (image, band) per grid step. In-kernel
    arrays are f32 (rolls need 32-bit lanes); ``dtype`` sets the MXU
    matmul operand precision and the HBM output dtype."""
    dt = jnp.float32
    mxu_dt = jnp.dtype(dtype)
    x = x_ref[0, 0].astype(dt)          # [12, rows*wn]
    colmod = cm_ref[...]                # [1, rows*wn] int32
    acc = None
    for (ry, rx), bref in zip(((0, 0), (0, 1), (1, 0), (1, 1)),
                              (b00, b01, b10, b11)):
        t = _tap(x, -ry, -rx, wn, colmod, dt)
        term = jax.lax.dot_general(
            bref[...].astype(mxu_dt), t.astype(mxu_dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    y = _leaky(acc * bn0m[...] + bn0a[...], dt)
    y = _zero_phantom_rows(y, pl.program_id(1), nb, band, wn, dt)
    y = _dw_s1(y, k1[...], wn, colmod, dt)
    y = _leaky(y * m11[...] + a11[...], dt)
    y = _pw(y, pw1[...], m21[...], a21[...], mxu_dt)
    _emit(y, band, wn, out_ref)


def _seg23_kernel(x_ref, ka, m1a, a1a, pwa, m2a, a2a,
                  kb, m1b, a1b, pwb, m2b, a2b, cm_ref, out_ref,
                  *, dtype, nb, band, wn, cin):
    """One stride-2 block (phase-plane dw + BN + leaky + pw + BN +
    leaky) then one stride-1 block, fused — segments 2 (blocks 2-3)
    and 3 (blocks 4-5) of the stage. f32 in-kernel (see _seg1)."""
    dt = jnp.float32
    mxu_dt = jnp.dtype(dtype)
    x4 = x_ref[0, 0].astype(dt)         # [4*cin, rows*wn]
    colmod = cm_ref[...]
    y = _dw_phase(x4, cin, ka[...], wn, colmod, dt)
    y = _leaky(y * m1a[...] + a1a[...], dt)
    y = _pw(y, pwa[...], m2a[...], a2a[...], mxu_dt)
    y = _zero_phantom_rows(y, pl.program_id(1), nb, band, wn, dt)
    y = _dw_s1(y, kb[...], wn, colmod, dt)
    y = _leaky(y * m1b[...] + a1b[...], dt)
    y = _pw(y, pwb[...], m2b[...], a2b[...], mxu_dt)
    _emit(y, band, wn, out_ref)


def fold_stage1_weights(params, stats):
    """Checkpoint `body/stage1` subtree -> kernel operands.

    Returns [B00, B01, B10, B11, bn0_mul, bn0_add, then per ConvDW
    block (kmat [C, 9], m1 [C, 1], a1 [C, 1], pw [O, C], m2 [C, 1],
    a2 [C, 1])], all float32 (cast to the compute dtype in-kernel).
    Traceable (jnp throughout) so it can run under jit on live params.
    """
    ops = []
    k0 = jnp.asarray(params["0"]["0"]["kernel"],
                     jnp.float32)  # [3,3,3,8]
    # s2d channel c' = (py*2 + px)*3 + c ; tap (dy, dx) lives at phase
    # p = (d+1) % 2 with shift r = 1 iff d == 0 (rows and cols alike).
    # Each tap lands in a UNIQUE (ry, rx) column, so .set is exact.
    bmats = jnp.zeros((2, 2, 8, 12), jnp.float32)
    for dy in range(3):
        py, ry = (dy + 1) % 2, 1 if dy == 0 else 0
        for dx in range(3):
            px, rx = (dx + 1) % 2, 1 if dx == 0 else 0
            col = (py * 2 + px) * 3
            bmats = bmats.at[ry, rx, :, col:col + 3].set(
                k0[dy, dx].T)
    for ry in range(2):
        for rx in range(2):
            ops.append(bmats[ry, rx])
    mul, add = _fold_bn(params["0"]["1"], stats["0"]["1"])
    ops += [mul[:, None], add[:, None]]
    for i in range(1, len(_STAGE1_SPECS)):
        p, s = params[str(i)], stats[str(i)]
        k = jnp.asarray(p["0"]["kernel"], jnp.float32)[:, :, 0, :]
        kmat = k.reshape(9, -1).T  # [C, 9] tap-minor
        m1, a1 = _fold_bn(p["1"], s["1"])
        pw = jnp.asarray(p["3"]["kernel"])[0, 0].T  # [O, C]
        m2, a2 = _fold_bn(p["4"], s["4"])
        ops += [kmat, m1[:, None], a1[:, None], pw,
                m2[:, None], a2[:, None]]
    return ops


def _n_bands(h_out):
    nb = max(1, -(-h_out // _MAX_BAND))
    while h_out % nb:
        nb += 1
    return nb


def _band_rows(band, wn):
    """Rows per band: the 3-row halo (2 top, 1 bottom), rounded up so
    the flattened lane count is a multiple of 128 — Mosaic's lane
    rotates (pltpu.roll) need 128-aligned vectors. The extra rows are
    zero pad (or unread neighbour rows) past the bottom halo."""
    align = 128 // math.gcd(wn, 128)
    return -(-(band + 3) // align) * align


def _bands(x, band, rows):
    """[B, C, H, W] -> [B, nb, C, rows*W] overlapping band slices:
    2 zero halo rows on top, the rest of the halo + lane-alignment
    pad below (zero past the image bottom)."""
    b, c, h, w = x.shape
    nb = h // band
    x = jnp.pad(x, ((0, 0), (0, 0), (2, rows - band - 2), (0, 0)))
    sl = [jax.lax.slice_in_dim(x, i * band, i * band + rows,
                               axis=2) for i in range(nb)]
    y = jnp.stack(sl, axis=1)
    return y.reshape(b, nb, c, rows * w)


def _s2d_planes(y, b, c, h, w):
    """[B, C, H*W] -> [B, 4C, H/2, W/2], plane-major p*C + c with
    p = py*2 + px (matches _dw_phase / fold_stage1_weights)."""
    y = y.reshape(b, c, h // 2, 2, w // 2, 2)
    y = y.transpose(0, 3, 5, 1, 2, 4)
    return y.reshape(b, 4 * c, h // 2, w // 2)


def _unband(o, b, nb, c, band, w):
    """[B, nb, C, band*W] -> [B, C, H*W]."""
    o = o.reshape(b, nb, c, band, w).transpose(0, 2, 1, 3, 4)
    return o.reshape(b, c, nb * band * w)


def _colmod(n, wn):
    return jnp.asarray((np.arange(n, dtype=np.int32) % wn)[None])


def _run_segment(kernel, x, weights, cout, band, wn, dtype,
                 interpret, extra=None):
    b, nb, cin, n = x.shape
    cm = _colmod(n, wn)
    kw = dict(dtype=dtype, nb=nb, band=band, wn=wn)
    if extra:
        kw.update(extra)
    in_specs = [pl.BlockSpec((1, 1, cin, n), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)]
    for arr in list(weights) + [cm]:
        in_specs.append(pl.BlockSpec(
            arr.shape, partial(lambda i, j, _n=arr.ndim: (0,) * _n),
            memory_space=pltpu.VMEM))
    return pl.pallas_call(
        partial(kernel, **kw),
        grid=(b, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, cout, band * wn),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nb, cout, band * wn), dtype),
        interpret=interpret,
    )(x, *weights, cm)


def supports(h, w):
    """The kernel needs the 2x2 s2d plus three clean halvings."""
    return h % 16 == 0 and w % 16 == 0


def planar_stage1_pallas(params, stats, imgs_nhwc, sub, dtype=None,
                         interpret=False, _upto=None):
    """MobileNetV1-0.25 stage 1 as three fused Pallas programs.

    Same contract as ops/planar_mnet.planar_stage1: the flax
    ``body/stage1`` param and batch_stats subtrees, [B, H, W, 3] uint8
    (or float) frames, per-channel means; returns s1 as NHWC
    [B, H/8, W/8, 64] in ``dtype``.
    """
    dt = jnp.dtype(dtype) if dtype is not None else jnp.float32
    # Mosaic kernels need a TPU; the CPU backend (tests, -dv CPU
    # demo drives) runs the same programs through the interpreter.
    interpret = interpret or jax.default_backend() == "cpu"
    b, h, w, _ = imgs_nhwc.shape
    if not supports(h, w):
        raise ValueError(
            f"planar_stage1_pallas needs H, W % 16 == 0, got {(h, w)}")
    h2, w2 = h // 2, w // 2
    # space-to-depth + plane-major in ONE transpose, cast+sub in the
    # cheap 12-plane layout (the NHWC [..., 3] cast would lane-pad
    # 3 -> 128); c' = (py*2 + px)*3 + c
    x = imgs_nhwc.reshape(b, h2, 2, w2, 2, 3)
    x = x.transpose(0, 2, 4, 5, 1, 3).reshape(b, 12, h2, w2).astype(dt)
    x = x - jnp.tile(jnp.asarray(sub, dt), 4)[:, None, None]

    weights = fold_stage1_weights(params, stats)
    w_seg1, w_seg2, w_seg3 = (weights[:12], weights[12:24],
                              weights[24:36])

    # segment 1: conv0 + block1 at (H/2, W/2)
    band1 = h2 // _n_bands(h2)
    x1 = _bands(x.reshape(b, 12, h2, w2), band1, _band_rows(band1, w2))
    if _upto == "x1":
        return x1
    y = _run_segment(_seg1_kernel, x1, w_seg1, 16, band1, w2, dt,
                     interpret)
    if _upto == "k1":
        return y
    y = _unband(y, b, h2 // band1, 16, band1, w2)

    # segment 2: blocks 2-3 at (H/4, W/4)
    h4, w4 = h2 // 2, w2 // 2
    band2 = h4 // _n_bands(h4)
    x2 = _bands(_s2d_planes(y, b, 16, h2, w2), band2,
                _band_rows(band2, w4))
    if _upto == "x2":
        return x2
    y = _run_segment(_seg23_kernel, x2, w_seg2, 32, band2, w4, dt,
                     interpret, extra={"cin": 16})
    if _upto == "k2":
        return y
    y = _unband(y, b, h4 // band2, 32, band2, w4)

    # segment 3: blocks 4-5 at (H/8, W/8)
    h8, w8 = h4 // 2, w4 // 2
    band3 = h8 // _n_bands(h8)
    x3 = _bands(_s2d_planes(y, b, 32, h4, w4), band3,
                _band_rows(band3, w8))
    if _upto == "x3":
        return x3
    y = _run_segment(_seg23_kernel, x3, w_seg3, 64, band3, w8, dt,
                     interpret, extra={"cin": 32})
    if _upto == "k3":
        return y
    y = _unband(y, b, h8 // band3, 64, band3, w8)

    return y.reshape(b, 64, h8, w8).transpose(0, 2, 3, 1)
