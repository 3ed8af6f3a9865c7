"""Fused pyramid+PNet: phase-split resize GEMMs + one Pallas kernel.

The MTCNN stage-1 currently runs as ``pyramid_area_resize`` (all
levels' row contractions in one GEMM) followed by 8 per-level
``_fused_pnet_apply`` conv stacks (reference loop being replaced:
/root/reference/models/mtcnn_utils/detect_face.py:70-81, PNet module
/root/reference/models/mtcnn_utils/mtcnn.py:9-49).  Measured on the
bench shapes (tools/profile_cascade.py, 32x640x640, 8 levels) the
pyramid+PNet block costs 2.29 ms/chunk net — at ~2.4% MFU, because
every PNet conv runs at 10-40 output channels (16x lane padding) and
XLA re-reads HBM between the 8 levels x 5 layers.

This module replaces the block with two TPU-shaped pieces:

1. **Phase-split pyramid (XLA GEMMs, no s2d transpose).**  The fused
   PNet formulation consumes the level through a 2x2 space-to-depth;
   instead of resizing and then transposing pixels, the area-resize
   weight matrices themselves are split by output-row/column parity
   (host-side static slicing — zero runtime cost), so the resize
   GEMMs directly produce the four s2d phase planes of every level:
   ``plane[(py*2+px)*3 + c] = resize(img_c)[py::2, px::2]``.  All
   levels' row contractions stay fused in ONE [sum(oh), H] GEMM (the
   ``pyramid_area_resize`` trick, with phase-reordered rows); per
   (level, col-phase) column GEMMs finish the job.  Levels are
   normalized, zero-padded to 128 lanes, flattened row-major and
   concatenated: one [B, 12, sum(oh2)*128] bf16 feed.

2. **One Pallas kernel for the whole PNet conv chain, all levels.**
   Per grid step (= one image) the kernel walks the 8 levels fully
   unrolled.  With rows padded to exactly 128 lanes, a conv tap at
   (dy, dx) is a ``dy*128 + dx`` lane offset: the dy part is a free
   aligned slice, the dx part comes from at most two single-lane
   ``pltpu.roll`` copies whose row-wrap garbage only ever lands in
   the lane-pad columns (valid output cols never read past a row's
   real width).  Each conv is ONE MXU GEMM against an in-VMEM im2col
   scratch: conv1'+ceil-pool as the 2x2/48->40 space-to-depth fusion
   (weights scattered exactly as models/mtcnn._fused_pnet_apply),
   conv2 [16,90], conv3 [32,144], and both heads folded into a single
   [6,32] GEMM.  Activations never touch HBM between layers or
   levels; the only HBM traffic is the phase feed in and a
   [B, 6, sum((hp-4)*128)] logit map out.

Numerics contract: identical to the ``pyramid_area_resize`` +
``_fused_pnet_apply`` path (same area-pool fractions, same normalize
-then-zero-pad semantics, same ceil-pool edge masks), pinned by
tests/test_pyramid_pnet.py in interpret mode.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .image import _area_weights

_LANES = 128
_NORM_SCALE = 0.0078125  # detect_face.py:72 normalisation
_NEG = -1e9  # ceil-pool out-of-range filler (reference uses -inf)


# ---------------------------------------------------------------------------
# Level geometry
# ---------------------------------------------------------------------------


class _Level:
    """Static per-level shapes: oh x ow resized level, oh2 = ceil(oh/2)
    s2d grid rows (== hp + 1), hp x wp conv1/pool grid, hc x wc = PNet
    output cells."""

    def __init__(self, oh, ow):
        self.oh, self.ow = oh, ow
        self.oh2 = -(-oh // 2)
        self.ow2 = -(-ow // 2)
        self.hp = self.oh2 - 1
        self.wp = self.ow2 - 1
        self.hc = self.hp - 4
        self.wc = self.wp - 4
        if self.hc < 1 or self.wc < 1:
            raise ValueError(f"level {oh}x{ow} too small for PNet")


def _levels(sizes):
    return [_Level(oh, ow) for oh, ow in sizes]


def supports(sizes):
    """The flat-lane kernel keeps one s2d row per 128-lane tile, so
    every level's s2d width must fit: ceil(ow/2) + 1 tap <= 128.
    Big frames with small min_face_size (e.g. 640px at the stock
    min_face_size=20 -> first level 385 px wide) exceed this; callers
    fall back to the per-level XLA path there."""
    try:
        lv = _levels(sizes)
    except ValueError:  # a level too small for PNet
        return False
    return all(l.ow2 <= _LANES for l in lv)


# ---------------------------------------------------------------------------
# Phase-split pyramid (XLA)
# ---------------------------------------------------------------------------


def _phase_row_weights(h, sizes):
    """[sum(oh), h] f32: per level, even-parity output rows then odd —
    the s2d row split becomes a static reorder of the one fused row
    GEMM's output rows."""
    blocks = []
    for oh, _ in sizes:
        m = _area_weights(h, oh)
        blocks.append(m[0::2])
        blocks.append(m[1::2])
    return np.concatenate(blocks, axis=0)


def phase_pyramid(imgs, sizes, dtype):
    """[B, H, W, 3] (float) frames -> [B, 12, sum(oh2)*128] ``dtype``
    feed of normalized, zero-padded s2d phase planes, plane index
    (py*2 + px)*3 + c (matching models.mtcnn._space_to_depth2)."""
    n, h, w, c = imgs.shape
    lv = _levels(sizes)
    wrow = jnp.asarray(_phase_row_weights(h, sizes)).astype(dtype)
    planes = jnp.transpose(imgs, (0, 3, 1, 2)).astype(dtype)
    rows = jnp.einsum("oh,bchw->bcow", wrow, planes)

    feeds = []
    off = 0
    for l in lv:
        he = rows[:, :, off:off + l.oh2, :]
        ho = rows[:, :, off + l.oh2:off + l.oh2 + l.oh // 2, :]
        off += l.oh
        phases = []
        for py, rp in ((0, he), (1, ho)):
            for px in (0, 1):
                wcol = jnp.asarray(
                    _area_weights(w, l.ow)[px::2]).astype(dtype)
                ph = jnp.einsum("pw,bcow->bcop", wcol, rp)
                ph = (ph - jnp.asarray(127.5, dtype)) \
                    * jnp.asarray(_NORM_SCALE, dtype)
                # pad AFTER normalising: the reference zero-pads the
                # normalized level, so phantom rows/cols are 0, not
                # normalize(0) = -127.5/128. The odd row phase is one
                # row short when oh is odd; cols pad to the lane tile.
                ph = jnp.pad(ph, ((0, 0), (0, 0),
                                  (0, l.oh2 - ph.shape[-2]),
                                  (0, _LANES - ph.shape[-1])))
                phases.append(ph)
        lvl = jnp.stack(phases, axis=1)  # [B, 4, 3, oh2, 128]
        feeds.append(lvl.reshape(n, 12, l.oh2 * _LANES))
    return jnp.concatenate(feeds, axis=-1)


# ---------------------------------------------------------------------------
# Weight folding (traceable — runs under jit on live params)
# ---------------------------------------------------------------------------


def fold_pnet_weights(pvars):
    """PNet flax params -> the kernel's GEMM operands:
    [W1 [40,48], b1 [40,1], a1 [40,1], W2 [16,90], b2, a2,
    W3 [32,144], b3, a3, W4 [6,32], b4 [6,1]], all f32."""
    p = pvars["params"]
    w1 = jnp.asarray(p["conv1"]["kernel"], jnp.float32)  # [3,3,3,10]
    # scatter the 3x3x3->10 taps into the 2x2 s2d kernel exactly as
    # models.mtcnn._fused_pnet_apply: sub-position (di, dj) tap
    # (ky, kx) lands at s2d cell ((di+ky)//2, (dj+kx)//2), channel
    # parity ((di+ky)%2, (dj+kx)%2), output channel q = di*2 + dj
    w2 = jnp.zeros((2, 2, 12, 4, 10), jnp.float32)
    for di in range(2):
        for dj in range(2):
            for ky in range(3):
                for kx in range(3):
                    r, c = di + ky, dj + kx
                    ch0 = (r % 2) * 6 + (c % 2) * 3
                    w2 = w2.at[r // 2, c // 2, ch0:ch0 + 3,
                               di * 2 + dj, :].set(w1[ky, kx])
    # [40, 48]: GEMM rows q*10+co (q-major, matching the pool's
    # q-block slicing), cols (ry*2+rx)*12+cin (tap-major, matching
    # the kernel's im2col stacking order)
    mat1 = w2.reshape(4 * 12, 40).T
    b1 = jnp.tile(jnp.asarray(p["conv1"]["bias"], jnp.float32), 4)
    a1 = jnp.tile(jnp.asarray(p["prelu1"]["alpha"], jnp.float32), 4)

    def conv_mat(name):
        k = jnp.asarray(p[name]["kernel"], jnp.float32)
        kh, kw, ci, co = k.shape
        return k.reshape(kh * kw * ci, co).T, jnp.asarray(
            p[name]["bias"], jnp.float32)

    mat2, b2 = conv_mat("conv2")
    a2 = jnp.asarray(p["prelu2"]["alpha"], jnp.float32)
    mat3, b3 = conv_mat("conv3")
    a3 = jnp.asarray(p["prelu3"]["alpha"], jnp.float32)
    m41, b41 = conv_mat("conv4_1")
    m42, b42 = conv_mat("conv4_2")
    mat4 = jnp.concatenate([m41, m42], axis=0)  # [6, 32]
    b4 = jnp.concatenate([b41, b42], axis=0)

    col = lambda v: v[:, None]
    return [mat1, col(b1), col(a1), mat2, col(b2), col(a2),
            mat3, col(b3), col(a3), mat4, col(b4)]


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _prelu(y, a):
    return jnp.where(y >= 0, y, y * a)


def _gemm(w_ref, b_scr, rows, n, mxu_dt):
    return jax.lax.dot_general(
        w_ref[...].astype(mxu_dt),
        b_scr[0:rows, 0:n].astype(mxu_dt),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _pnet_kernel(x_ref, w1, b1, a1, w2, b2, a2, w3, b3, a3, w4, b4,
                 out_ref, b_scr, *, levels, in_offs, out_offs, mxu):
    """All 8 levels' conv1'+pool / conv2 / conv3 / heads per image.
    f32 in-VMEM (lane rolls need 32-bit data); ``mxu`` sets the GEMM
    operand precision (the im2col scratch dtype)."""
    mxu_dt = jnp.dtype(mxu)
    for l, ioff, ooff in zip(levels, in_offs, out_offs):
        x = x_ref[0, :, ioff * _LANES:(ioff + l.oh2) * _LANES].astype(
            jnp.float32)
        nx = x.shape[-1]
        xr = pltpu.roll(x, nx - 1, axis=1)  # xr[n] = x[n+1]
        n1 = l.hp * _LANES
        for t, (ry, rx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            src = xr if rx else x
            tap = jax.lax.slice_in_dim(src, ry * _LANES,
                                       ry * _LANES + n1, axis=1)
            b_scr[t * 12:(t + 1) * 12, 0:n1] = tap.astype(b_scr.dtype)
        y = _gemm(w1, b_scr, 48, n1, mxu_dt) + b1[...]
        y = _prelu(y, a1[...])
        # ceil-mode pool over the 4 sub-positions (q-major channel
        # blocks); only the last pooled row/col can be out of range,
        # and only when the level side is odd
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n1), 1)
        subs = [jax.lax.slice_in_dim(y, q * 10, (q + 1) * 10, axis=0)
                for q in range(4)]
        if l.oh % 2:
            rm = lane >= (l.hp - 1) * _LANES
            subs[2] = jnp.where(rm, _NEG, subs[2])
            subs[3] = jnp.where(rm, _NEG, subs[3])
        if l.ow % 2:
            cm = jnp.bitwise_and(lane, _LANES - 1) == l.wp - 1
            subs[1] = jnp.where(cm, _NEG, subs[1])
            subs[3] = jnp.where(cm, _NEG, subs[3])
        pooled = jnp.maximum(jnp.maximum(subs[0], subs[1]),
                             jnp.maximum(subs[2], subs[3]))

        def conv3x3(src0, cin, w_ref, b_ref, a_ref, nout):
            ns = src0.shape[-1]
            sr1 = pltpu.roll(src0, ns - 1, axis=1)
            sr2 = pltpu.roll(src0, ns - 2, axis=1)
            srcs = (src0, sr1, sr2)
            for t in range(9):
                dy, dx = t // 3, t % 3
                tap = jax.lax.slice_in_dim(
                    srcs[dx], dy * _LANES, dy * _LANES + nout, axis=1)
                b_scr[t * cin:(t + 1) * cin, 0:nout] = tap.astype(
                    b_scr.dtype)
            o = _gemm(w_ref, b_scr, 9 * cin, nout, mxu_dt) + b_ref[...]
            return _prelu(o, a_ref[...])

        n2 = (l.hp - 2) * _LANES
        y2 = conv3x3(pooled, 10, w2, b2, a2, n2)
        n3 = (l.hp - 4) * _LANES
        y3 = conv3x3(y2, 16, w3, b3, a3, n3)
        out = jax.lax.dot_general(
            w4[...].astype(mxu_dt), y3.astype(mxu_dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b4[...]
        out_ref[0, :, ooff:ooff + n3] = out


def pyramid_pnet(pvars, imgs, sizes, dtype=jnp.bfloat16,
                 interpret=False):
    """Fused pyramid + PNet for all levels.

    imgs: [B, H, W, 3] float frames (pre-normalisation pixel values).
    Returns per level (probs1 [B, hc, wc] f32, reg [B, hc, wc, 4] f32)
    — the exact maps ``_fused_pnet_apply`` + softmax would produce.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    lv = _levels(sizes)
    b = imgs.shape[0]
    feed = phase_pyramid(imgs, sizes, dtype)

    in_offs, off = [], 0
    for l in lv:
        in_offs.append(off)
        off += l.oh2
    out_offs, out_total = [], 0
    for l in lv:
        out_offs.append(out_total)
        out_total += (l.hp - 4) * _LANES

    weights = [w.astype(dtype) if w.ndim == 2 and w.shape[1] > 1 else w
               for w in fold_pnet_weights(pvars)]
    max_rows = 144
    max_cols = max(l.hp * _LANES for l in lv)

    in_specs = [pl.BlockSpec((1, 12, feed.shape[-1]),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    for arr in weights:
        in_specs.append(pl.BlockSpec(
            arr.shape, partial(lambda i, _n=arr.ndim: (0,) * _n),
            memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        partial(_pnet_kernel, levels=lv, in_offs=in_offs,
                out_offs=out_offs, mxu=dtype),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 6, out_total), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 6, out_total), jnp.float32),
        scratch_shapes=[pltpu.VMEM((max_rows, max_cols), dtype)],
        interpret=interpret,
    )(feed, *weights)

    results = []
    for l, ooff in zip(lv, out_offs):
        n3 = (l.hp - 4) * _LANES
        o = out[:, :, ooff:ooff + n3].reshape(b, 6, l.hc, _LANES)
        o = o[:, :, :, :l.wc]
        probs1 = jax.nn.sigmoid(o[:, 1] - o[:, 0])
        reg = jnp.transpose(o[:, 2:6], (0, 2, 3, 1))
        results.append((probs1, reg))
    return results
