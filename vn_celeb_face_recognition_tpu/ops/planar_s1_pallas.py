"""Fused Pallas kernel for MobileNetV1-0.25 stage 1 (plane-major).

Why a kernel: the stage's six blocks run at 8-64 channels, where NHWC
lane-tiles C to 128 (16x padding at C=8) — the flax stage measures
~5 ms/chunk on the bench shapes against a ~2 ms HBM roofline. The XLA
plane-major rewrite (ops/planar_mnet.py) fixed the layout but measured
17.2 ms: XLA materialises each of the nine shifted stencil taps (and
the 2x2 phase split) as full HBM arrays instead of fusing them
(tools/exp_planar_parts.py attribution). This kernel runs the WHOLE
stage for one image per grid step inside VMEM — HBM traffic is one
read of the space-to-depth input and one write of the s1 output.

Layout: blocks carry activations as [H, C, W] — C in SUBLANES (8/16/
32/64 are tile-exact multiples of 8), W in lanes, H untiled. Per block:

  * depthwise 3x3 = 3 leading-dim (H) slices x 3 one-lane rolls with
    edge masks — pure VPU, zero HBM traffic;
  * stride-2 rows = leading-dim strided slices (untiled — free);
    stride-2 cols = one MXU matmul with a 0/1 even-column selection
    matrix (contraction over lanes — native, and exact);
  * pointwise 1x1 = dot_general([O, C] @ [H, C, W] over C) — the MXU's
    native lanes-x-sublanes contraction; the [O, H, W] result returns
    to [H, O, W] either by a VMEM transpose or (RETILE="matmul") by an
    exact 0/1 identity matmul, whichever Mosaic schedules better;
  * BatchNorm (eval) folds to per-channel scale+bias broadcasts, and
    the first 3x3/stride-2 conv arrives as a space-to-depth 2x2 conv:
    four [8, 12] tap matrices on the [H/2, 12, W/2] phase tensor, so
    it needs no stride handling at all.

The weights are derived (host-side, in `fold_stage1_weights`) from the
ordinary flax/torch checkpoint tree — published checkpoints need no
re-conversion — and outputs match ops/planar_mnet.planar_stage1 (the
parity-tested XLA reference, itself pinned to the flax NHWC modules)
to float-reassociation tolerance.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .planar_mnet import _STAGE1_SPECS, _fold_bn

_LEAKY = 0.1
# How [O, H, W] pointwise outputs return to the [H, O, W] block
# layout: "transpose" = jnp.transpose VMEM copy, "matmul" = exact 0/1
# identity dot_general (kept as the fallback if Mosaic schedules the
# retiling transpose poorly).
RETILE = "transpose"


def _leaky(y, dtype):
    return jnp.where(y >= 0, y, y * jnp.asarray(_LEAKY, dtype))


def _retile(y, ident, dtype):
    """[O, H, W] -> [H, O, W]."""
    if RETILE == "transpose":
        return jnp.transpose(y, (1, 0, 2))
    return jax.lax.dot_general(
        ident, y, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)


def _lane_shift(t, shift, col, dtype):
    """Roll along lanes with zero fill (shift > 0 moves right)."""
    if shift == 0:
        return t
    w = t.shape[-1]
    t = jnp.roll(t, shift, axis=-1)
    if shift > 0:
        return jnp.where(col >= shift, t, jnp.asarray(0.0, dtype))
    return jnp.where(col < w + shift, t, jnp.asarray(0.0, dtype))


def _taps_dw(xp, h_out, stride, kmat, col, dtype):
    """9-tap depthwise accumulation on the H-padded [Hp, C, W] plane.

    kmat: [C, 9] (tap-minor). Returns [h_out, C, W] (full W; caller
    compacts columns for stride 2).
    """
    acc = None
    for dy in range(3):
        if stride == 1:
            xr = jax.lax.slice_in_dim(xp, dy, dy + h_out, axis=0)
        else:
            xr = jax.lax.slice_in_dim(
                xp, dy, dy + 2 * (h_out - 1) + 1, stride=2, axis=0)
        for dx in range(3):
            t = _lane_shift(xr, 1 - dx, col, dtype)
            k = jax.lax.slice_in_dim(kmat, dy * 3 + dx,
                                     dy * 3 + dx + 1, axis=1)  # [C, 1]
            term = t * k[None, :, :]
            acc = term if acc is None else acc + term
    return acc


def _dw_block(x, kmat, m1, a1, pw, m2, a2, stride, sel, ident, col,
              dtype):
    """One ConvDW block: dw3x3(s)+BN+leaky then pw1x1+BN+leaky.

    x [H, C, W] -> [H/s, O, W/s]. kmat [C, 9]; m/a [C, 1]; pw [O, C];
    sel [W, W/2] 0/1 or None; ident [H/s, H/s] 0/1 (matmul retile).
    """
    h = x.shape[0]
    h_out = h if stride == 1 else h // 2
    xp = jnp.pad(x, ((1, 1), (0, 0), (0, 0)))
    acc = _taps_dw(xp, h_out, stride, kmat, col, dtype)
    acc = _leaky(acc * m1[None, :, :] + a1[None, :, :], dtype)
    if sel is not None:
        acc = jax.lax.dot_general(
            acc, sel, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)
    out = jax.lax.dot_general(
        pw, acc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [O, H', W']
    out = _leaky(out.astype(dtype) * m2[:, :, None]
                 + a2[:, :, None], dtype)
    return _retile(out, ident, dtype)


def _stage1_kernel(*refs, dtype, n_blocks, aux_shapes):
    """refs: x, b00, b01, b10, b11, bn0_m, bn0_a,
    5 x (kmat, m1, a1, pw, m2, a2), *aux (sels + idents), out."""
    dt = jnp.dtype(dtype)
    x_ref = refs[0]
    b0_mats = refs[1:5]
    bn0m, bn0a = refs[5], refs[6]
    blk = refs[7:7 + 6 * n_blocks]
    aux = refs[7 + 6 * n_blocks:-1]
    out_ref = refs[-1]

    def sel_by_shape(s0):
        for r, shp in zip(aux, aux_shapes):
            if shp[0] == s0 and shp[0] != shp[1]:
                return r[...].astype(dt)
        raise AssertionError(f"no selection matrix with {s0} rows")

    def ident_for(h_out):
        if RETILE != "matmul":
            return None
        for r, shp in zip(aux, aux_shapes):
            if shp[0] == h_out and shp[0] == shp[1]:
                return r[...].astype(dt)
        raise AssertionError(f"no identity matrix of size {h_out}")

    x = x_ref[...][0]  # [H2, 12, W2] s2d input, mean-subtracted
    h2, w2 = x.shape[0], x.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w2), 2)

    # --- block 0: the 3x3/s2 conv as a 2x2 conv on the s2d planes ---
    xp = jnp.pad(x, ((1, 0), (0, 0), (0, 0)))  # ry=1 reads row h'-1
    acc = None
    for bref, (ry, rx) in zip(b0_mats,
                              ((0, 0), (0, 1), (1, 0), (1, 1))):
        xr = jax.lax.slice_in_dim(xp, 1 - ry, 1 - ry + h2, axis=0)
        xr = _lane_shift(xr, rx, col, dt)
        term = jax.lax.dot_general(
            bref[...].astype(dt), xr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [8, H2, W2]
        acc = term if acc is None else acc + term
    y = _leaky(acc.astype(dt) * bn0m[...].astype(dt)[:, :, None]
               + bn0a[...].astype(dt)[:, :, None], dt)
    y = _retile(y, ident_for(h2), dt)  # [H2, 8, W2]

    strides = [s for kind, cin, cout, s in _STAGE1_SPECS[1:]]
    for i in range(n_blocks):
        kmat, m1, a1, pw, m2, a2 = (r[...].astype(dt)
                                    for r in blk[6 * i:6 * i + 6])
        stride = strides[i]
        h_now, w_now = y.shape[0], y.shape[2]
        sel = sel_by_shape(w_now) if stride == 2 else None
        colw = col if w_now == w2 else jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, w_now), 2)
        y = _dw_block(y, kmat, m1, a1, pw, m2, a2, stride, sel,
                      ident_for(h_now // stride), colw, dt)
    out_ref[...] = y[None].astype(out_ref.dtype)


def fold_stage1_weights(params, stats):
    """Host-side: checkpoint `body/stage1` subtree -> kernel operands.

    Returns [B00, B01, B10, B11, bn0_mul, bn0_add, then per ConvDW
    block (kmat [C, 9], m1 [C, 1], a1 [C, 1], pw [O, C], m2 [C, 1],
    a2 [C, 1])], all float32 (cast to the compute dtype in-kernel).
    """
    ops = []
    k0 = np.asarray(params["0"]["0"]["kernel"], np.float32)  # [3,3,3,8]
    # s2d channel c' = (py*2 + px)*3 + c ; tap (dy, dx) lives at phase
    # p = (d+1) % 2 with shift r = 1 iff d == 0 (rows and cols alike).
    bmats = np.zeros((2, 2, 8, 12), np.float32)
    for dy in range(3):
        py, ry = (dy + 1) % 2, 1 if dy == 0 else 0
        for dx in range(3):
            px, rx = (dx + 1) % 2, 1 if dx == 0 else 0
            for c in range(3):
                bmats[ry, rx, :, (py * 2 + px) * 3 + c] += k0[dy, dx, c]
    for ry in range(2):
        for rx in range(2):
            ops.append(jnp.asarray(bmats[ry, rx]))
    mul, add = _fold_bn(params["0"]["1"], stats["0"]["1"])
    ops += [jnp.asarray(mul)[:, None], jnp.asarray(add)[:, None]]
    for i in range(1, len(_STAGE1_SPECS)):
        p, s = params[str(i)], stats[str(i)]
        k = np.asarray(p["0"]["kernel"], np.float32)[:, :, 0, :]
        kmat = k.reshape(9, -1).T  # [C, 9] tap-minor
        m1, a1 = _fold_bn(p["1"], s["1"])
        pw = jnp.asarray(p["3"]["kernel"])[0, 0].T  # [O, C]
        m2, a2 = _fold_bn(p["4"], s["4"])
        ops += [jnp.asarray(kmat), jnp.asarray(m1)[:, None],
                jnp.asarray(a1)[:, None], pw,
                jnp.asarray(m2)[:, None], jnp.asarray(a2)[:, None]]
    return ops


def _sel_even(n):
    s = np.zeros((n, n // 2), np.float32)
    s[np.arange(0, n, 2), np.arange(n // 2)] = 1.0
    return jnp.asarray(s)


def supports(h, w):
    """The kernel needs the 2x2 s2d plus three clean halvings."""
    return h % 16 == 0 and w % 16 == 0


def planar_stage1_pallas(params, stats, imgs_nhwc, sub, dtype=None,
                         interpret=False):
    """MobileNetV1-0.25 stage 1 as one fused Pallas program.

    Same contract as ops/planar_mnet.planar_stage1: the flax
    ``body/stage1`` param and batch_stats subtrees, [B, H, W, 3] uint8
    (or float) frames, per-channel means; returns s1 as NHWC
    [B, H/8, W/8, 64] in ``dtype``.
    """
    dt = jnp.dtype(dtype) if dtype is not None else jnp.float32
    b, h, w, _ = imgs_nhwc.shape
    if not supports(h, w):
        raise ValueError(
            f"planar_stage1_pallas needs H, W % 16 == 0, got {(h, w)}")
    h2, w2 = h // 2, w // 2
    # space-to-depth + plane-major in ONE transpose, cast+sub in the
    # cheap [.., 12, W2] layout (the NHWC [..., 3] cast would lane-pad
    # 3 -> 128); c' = (py*2 + px)*3 + c
    x = imgs_nhwc.reshape(b, h2, 2, w2, 2, 3)
    x = x.transpose(0, 1, 2, 4, 5, 3).reshape(b, h2, 12, w2).astype(dt)
    x = x - jnp.tile(jnp.asarray(sub, dt), 4)[None, None, :, None]

    weights = fold_stage1_weights(params, stats)
    aux = [_sel_even(w2), _sel_even(w2 // 2)]
    if RETILE == "matmul":
        for n in {h2, h2 // 2, h2 // 4}:
            aux.append(jnp.asarray(np.eye(n, dtype=np.float32)))
    aux_shapes = tuple(a.shape for a in aux)
    n_blocks = len(_STAGE1_SPECS) - 1

    def zero_map(ndim):
        return lambda i, _n=ndim: (0,) * _n

    in_specs = [pl.BlockSpec((1, h2, 12, w2), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    for arr in weights + aux:
        in_specs.append(pl.BlockSpec(arr.shape, zero_map(arr.ndim),
                                     memory_space=pltpu.VMEM))

    ho, wo = h // 8, w // 8
    kernel = partial(_stage1_kernel, dtype=dt, n_blocks=n_blocks,
                     aux_shapes=aux_shapes)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ho, 64, wo), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, 64, wo), dt),
        interpret=interpret,
    )(x, *weights, *aux)
    return out.transpose(0, 1, 3, 2)  # [B, H/8, W/8, 64] NHWC
