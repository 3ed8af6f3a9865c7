"""Pallas TPU kernel: similarity warp (rotation+scale+translation).

The alignment warp is the pipeline's hot op. In plain XLA both
formulations lose: per-pixel bilinear gathers serialise (~180 ms /
128 faces), and vmapped per-row dynamic slices lower to row gathers
(~1.4 s / 256 faces). This kernel runs ONE FACE (all channels) per
grid step with every buffer VMEM-resident, using the SCALE-FIRST
factorisation

    out(p) = img_k( s R(phi_r) p + t' )
           = CenterCrop112( Rotate_{phi_r}( M ) ),
      M(q) = img_k( s q + t'' )   on a fixed 160x160 intermediate

  * quadrant pre-rotation (k * 90 deg) happens outside in XLA (dense
    flips; jnp.flip has no Pallas TPU lowering);
  * the pre-scale M is two hat-matrix matmuls on the MXU (built
    in-kernel from iota + the per-face scalars);
  * Paeth 3-shear rotation of the FIXED-SIZE M — each pass is a fori
    over 160 rows doing one integer dynamic ROTATE (Mosaic cannot
    prove alignment of lane-dim dynamic slices, but tpu.dynamic_rotate
    takes any scalar amount) + a 128-aligned static store; the
    FRACTIONAL part of each shear is applied afterwards as one
    plane-wide lerp against a static single-lane roll;
  * the final centred 112 crop is a one-hot matmul (static unaligned
    lane slices are also rejected by Mosaic).

Buffers keep the image axes on the (sublane, lane) dims — the 3-wide
channel axis must never reach the 128-lane dim (43x padding blowup).

Per-face parameters arrive via one [K, 8] scalar-prefetch row:
(alpha, beta, quadrant k, scale s, t''x, t''y, valid, pad).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .image import invert_affine

_M = 160          # intermediate (rotation) buffer size
_LO = 128         # aligned interior start lane
_DELTA = (_M - 112) / 2.0  # centred-crop offset for a 112 output


def _padded_width(m, pad):
    need = _LO + m + pad + 1
    return -(-need // 128) * 128


def _warp_kernel(params_ref, window_ref, out_ref, buf_a, buf_b, *,
                 n, ch, out_size, pad):
    i = pl.program_id(0)
    alpha = params_ref[i, 0]
    beta = params_ref[i, 1]
    s = params_ref[i, 3]
    ux = params_ref[i, 4]
    uy = params_ref[i, 5]

    m = _M
    cm = (m - 1) / 2.0
    np_w = _padded_width(m, pad)

    img = window_ref[0]  # [C, N, N] quadrant-rotated window

    # ---- pre-scale to the 160x160 intermediate: M = Ry @ img @ Rx^T
    o_m = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0).astype(
        jnp.float32)
    i_n = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1).astype(
        jnp.float32)
    # bf16 matmul tails: hat weights and uint8-valued pixels are near-
    # exact in bf16 and the MXU accumulates in f32
    ry = jnp.maximum(0.0, 1.0 - jnp.abs(s * o_m + uy - i_n)).astype(
        jnp.bfloat16)  # [m, n]
    rx = jnp.maximum(0.0, 1.0 - jnp.abs(s * o_m + ux - i_n)).astype(
        jnp.bfloat16)

    buf_a[...] = jnp.zeros((ch, m, np_w), jnp.float32)
    buf_b[...] = jnp.zeros((ch, m, np_w), jnp.float32)
    for cc in range(ch):
        t = jnp.dot(ry, img[cc].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        buf_a[cc, :, _LO:_LO + m] = jnp.dot(
            t.astype(jnp.bfloat16), rx.T,
            preferred_element_type=jnp.float32,
        )

    # ---- 3-shear rotation of the intermediate ----
    ys_col = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).astype(
        jnp.float32) - cm

    def shear_pass(src_ref, dst_ref, coeff, dev, blk_lo, blk_hi):
        # Integer part, ROW-BLOCKED: all 8 rows of a sublane-aligned
        # block share one dynamic rotate by the block-centre shift k0;
        # each row's exact shift k_y then differs from k0 by at most
        # `dev` (|coeff| <= tan(22.5deg)/sin(45deg) bounds the in-block
        # drift), so a handful of STATIC single-lane rotates + selects
        # recover per-row exactness. ~5-7 vector ops per 8 rows instead
        # of a 160-iteration scalar-orchestrated row loop.
        nb = 8
        for b in range(blk_lo, blk_hi):
            y0 = b * nb
            slab = src_ref[:, y0:y0 + nb, :]          # [C, nb, Wp]
            base = coeff * (y0 + (nb - 1) / 2.0 - cm)
            k0 = jnp.clip(jnp.floor(base).astype(jnp.int32),
                          -(pad - dev), pad - dev)
            r0 = pltpu.roll(slab, jnp.mod(-k0, np_w), axis=2)
            yv = (jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
                  .astype(jnp.float32) + (y0 - cm))
            ky = jnp.clip(
                jnp.floor(coeff * yv).astype(jnp.int32), -pad, pad)
            delta = ky - k0                           # in [-dev, dev]
            acc = jnp.zeros_like(r0)
            for d in range(-dev, dev + 1):
                rd = (pltpu.roll(r0, np_w - d, axis=2) if d > 0
                      else pltpu.roll(r0, -d, axis=2) if d < 0
                      else r0)
                acc = jnp.where(delta == d, rd, acc)
            dst_ref[:, y0:y0 + nb, _LO:_LO + m] = acc[:, :, _LO:_LO + m]
        # ...fractional part as ONE plane-wide lerp, interior only
        sh_all = coeff * ys_col                      # [m, 1]
        f = (sh_all - jnp.floor(sh_all))[None]       # [1, m, 1]
        v = dst_ref[...]
        v1 = pltpu.roll(v, np_w - 1, axis=2)
        dst_ref[:, :, _LO:_LO + m] = (
            v * (1.0 - f) + v1 * f
        )[:, :, _LO:_LO + m]

    nblk = _M // 8
    # |alpha| <= tan(pi/8): in-block drift 0.415*3.5 -> floor diff <= 2
    # |beta|  <= sin(pi/4): 0.708*3.5 -> floor diff <= 3
    shear_pass(buf_a, buf_b, alpha, 2, 0, nblk)
    # y-shear == x-shear on the transposed interior
    buf_a[:, :, _LO:_LO + m] = jnp.swapaxes(
        buf_b[:, :, _LO:_LO + m], 1, 2
    )
    shear_pass(buf_a, buf_b, beta, 3, 0, nblk)
    buf_a[:, :, _LO:_LO + m] = jnp.swapaxes(
        buf_b[:, :, _LO:_LO + m], 1, 2
    )
    # the final crop reads rows DELTA..DELTA+111 only -> blocks 3..16
    shear_pass(buf_a, buf_b, alpha, 2, 3, 17)
    rot = buf_b[:, :, _LO:_LO + m]  # [C, m, m]

    # ---- centred 112 crop via one-hot matmuls (aligned-slice-free)
    o_c = jax.lax.broadcasted_iota(jnp.int32, (out_size, m), 0).astype(
        jnp.float32)
    i_m = jax.lax.broadcasted_iota(jnp.int32, (out_size, m), 1).astype(
        jnp.float32)
    crop = jnp.where(
        jnp.abs(o_c + _DELTA - i_m) < 0.5, 1.0, 0.0
    ).astype(jnp.bfloat16)  # [out, m] one-hot rows (exact in bf16)
    for cc in range(ch):
        t = jnp.dot(crop, rot[cc].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        out_ref[0, cc] = jnp.dot(t.astype(jnp.bfloat16), crop.T,
                                 preferred_element_type=jnp.float32)


def _plane_params(mats):
    """[K, 2, 3] similarity mats -> per-face scalars."""
    def one(m):
        a_mat = invert_affine(m)
        s = jnp.sqrt(a_mat[0, 0] ** 2 + a_mat[1, 0] ** 2)
        phi = jnp.arctan2(a_mat[1, 0], a_mat[0, 0])
        t = a_mat[:, 2]
        kq = jnp.round(phi / (jnp.pi / 2))
        phi_r = phi - kq * (jnp.pi / 2)
        return phi, phi_r, kq % 4, s, t[0], t[1]

    return jax.vmap(one)(mats)


def batched_similarity_warp_pallas(windows, mats, out_size,
                                   interpret=False):
    """windows [K, N, N, C], mats [K, 2, 3] -> [K, out, out, C] f32.

    Drop-in for ops.warp_fast.batched_similarity_warp, running the
    Pallas kernel (or its interpreter on CPU). out_size must be 112
    (the centred-crop constant matches the 160 intermediate).
    """
    assert out_size == 112, "kernel is specialised to 112 outputs"
    k, n, _, ch = windows.shape
    # shear shifts on the 160 intermediate: |alpha| <= tan(22.5deg),
    # |beta| <= sin(45deg) -> max |shift| = 0.7071 * 80 ~= 57
    pad = int(0.36 * _M) + 2

    phi, phi_r, kq, s, tx, ty = _plane_params(mats)
    # scale-then-rotate translation:
    # t' = R(-k pi/2)(t - c_w) + c_w   (quadrant fold)
    # t'' = t' - s R(phi_r) (delta - c_m) - s c_m
    c_w = (n - 1) / 2.0
    cm = (_M - 1) / 2.0
    cosk = jnp.cos(-kq * (jnp.pi / 2))
    sink = jnp.sin(-kq * (jnp.pi / 2))
    dxw, dyw = tx - c_w, ty - c_w
    tpx = cosk * dxw - sink * dyw + c_w
    tpy = sink * dxw + cosk * dyw + c_w
    cosr, sinr = jnp.cos(phi_r), jnp.sin(phi_r)
    dmx = _DELTA - cm
    dmy = _DELTA - cm
    ux = tpx - s * (cosr * dmx - sinr * dmy) - s * cm
    uy = tpy - s * (sinr * dmx + cosr * dmy) - s * cm
    alpha = -jnp.tan(phi_r / 2.0)
    beta = jnp.sin(phi_r)

    params = jnp.stack(
        [alpha, beta, kq.astype(jnp.float32), s, ux, uy,
         jnp.ones_like(s), jnp.zeros_like(s)],
        axis=-1,
    )  # [K, 8]
    planes = jnp.transpose(windows, (0, 3, 1, 2))  # [K, C, N, N]

    # quadrant pre-rotation in XLA: dense flips/transposes blended by a
    # one-hot select (take_along_axis would lower to a whole-stack
    # gather, which costs ~300ms at this size)
    kq_i = kq.astype(jnp.int32)
    swap = jnp.swapaxes(planes, 2, 3)
    variants = [
        planes,
        jnp.flip(swap, axis=2),
        jnp.flip(planes, axis=(2, 3)),
        jnp.flip(swap, axis=3),
    ]
    onehot = jax.nn.one_hot(kq_i, 4, dtype=planes.dtype)  # [K, 4]
    planes = sum(
        onehot[:, q, None, None, None] * variants[q] for q in range(4)
    )

    np_w = _padded_width(_M, pad)
    kernel = functools.partial(_warp_kernel, n=n, ch=ch,
                               out_size=out_size, pad=pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, ch, n, n), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ch, out_size, out_size),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ch, _M, np_w), jnp.float32),
            pltpu.VMEM((ch, _M, np_w), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, ch, out_size, out_size),
                                       jnp.float32),
        interpret=interpret,
    )(params, planes.astype(jnp.float32))
    return jnp.transpose(out, (0, 2, 3, 1))
