"""Pallas TPU kernel: similarity warp (rotation+scale+translation).

The alignment warp is the pipeline's hot op. In plain XLA both
formulations lose: per-pixel bilinear gathers serialise (~180 ms /
128 faces), and vmapped per-row dynamic slices lower to row gathers
(~1.4 s / 256 faces). This kernel runs ONE FACE (all channels) per
grid step with every buffer VMEM-resident:

  * quadrant pre-rotation (k * 90 deg) happens outside in XLA (dense
    flips; jnp.flip has no Pallas TPU lowering);
  * Paeth 3-shear rotation — each shear pass is a fori over rows; the
    variable row offset is TWO dynamic ROTATEs on a [C, Wp] tile
    (Mosaic cannot prove alignment of lane-dim dynamic slices, but
    tpu.dynamic_rotate takes any scalar amount) + 128-aligned static
    slices + a 2-tap lerp. Channels share the row loop;
  * the axis-aligned scale+translate tail as hat-matrix matmuls on the
    MXU, built in-kernel from broadcasted iota.

Buffers keep the image axes on the (sublane, lane) dims — the 3-wide
channel axis must never reach the 128-lane dim (43x padding blowup).

Per-face parameters arrive via one [K, 8] scalar-prefetch row:
(alpha, beta, quadrant k, scale s, ux, uy, pad, pad).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .image import invert_affine


def _padded_width(n, pad):
    """Interior at lane 128, right margin >= pad+1, total a multiple
    of 128 (Mosaic alignment)."""
    need = 128 + n + pad + 1
    return -(-need // 128) * 128


def _warp_kernel(params_ref, plane_ref, out_ref, buf_a, buf_b, *,
                 n, ch, out_size, pad, dtype):
    i = pl.program_id(0)
    alpha = params_ref[i, 0]
    beta = params_ref[i, 1]
    s = params_ref[i, 3]
    ux = params_ref[i, 4]
    uy = params_ref[i, 5]

    c = (n - 1) / 2.0
    img = plane_ref[0]  # [C, N, N] (already quadrant-rotated)

    np_w = _padded_width(n, pad)
    lo = 128

    def shear_pass(src_ref, dst_ref, coeff):
        # dst[:, y, lo:lo+n] = src(:, y, x + coeff*(y - c)) bilinear,
        # all channels in one [C, Wp] tile per row.
        def row(y, _):
            sh = coeff * (y.astype(jnp.float32) - c)
            k = jnp.floor(sh)
            f = (sh - k).astype(dtype)
            k = jnp.clip(k.astype(jnp.int32), -pad, pad)
            r = src_ref[:, y, :]  # [C, Wp]
            r0 = pltpu.roll(r, jnp.mod(-k, np_w), axis=1)
            r1 = pltpu.roll(r0, np_w - 1, axis=1)
            dst_ref[:, pl.ds(y, 1), lo:lo + n] = (
                r0[:, lo:lo + n] * (1.0 - f) + r1[:, lo:lo + n] * f
            )[:, None]
            return 0

        jax.lax.fori_loop(0, n, row, 0)

    # zero both scratch buffers once (borders stay zero)
    buf_a[...] = jnp.zeros((ch, n, np_w), dtype)
    buf_b[...] = jnp.zeros((ch, n, np_w), dtype)
    buf_a[:, :, lo:lo + n] = img.astype(dtype)

    # pass 1: x-shear
    shear_pass(buf_a, buf_b, alpha)
    # pass 2: y-shear == x-shear on the transposed interior
    buf_a[:, :, lo:lo + n] = jnp.swapaxes(buf_b[:, :, lo:lo + n], 1, 2)
    shear_pass(buf_a, buf_b, beta)
    buf_a[:, :, lo:lo + n] = jnp.swapaxes(buf_b[:, :, lo:lo + n], 1, 2)
    # pass 3: x-shear
    shear_pass(buf_a, buf_b, alpha)
    rot = buf_b[:, :, lo:lo + n]  # [C, n, n]

    # scale+translate tail: out[c] = Ry @ rot[c] @ Rx^T (hat matrices;
    # iota must be integer-typed on TPU)
    o = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, n), 0
    ).astype(jnp.float32)
    i2 = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, n), 1
    ).astype(jnp.float32)
    ry = jnp.maximum(0.0, 1.0 - jnp.abs(s * o + uy - i2)).astype(dtype)
    rx = jnp.maximum(0.0, 1.0 - jnp.abs(s * o + ux - i2)).astype(dtype)
    # per-channel MXU matmuls (ch is tiny and static)
    for cc in range(ch):
        t = jnp.dot(ry, rot[cc], preferred_element_type=jnp.float32)
        out_ref[0, cc] = jnp.dot(t.astype(dtype), rx.T,
                                 preferred_element_type=jnp.float32)


def _plane_params(mats):
    """[K, 2, 3] similarity mats -> per-face kernel parameters."""
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
                                   interpret=False, dtype=jnp.float32):
    """windows [K, N, N, C], mats [K, 2, 3] -> [K, out, out, C] f32.

    Drop-in for ops.warp_fast.batched_similarity_warp, running the
    Pallas kernel (or its interpreter on CPU). ``dtype`` selects the
    shear-buffer precision: bfloat16 halves VMEM traffic with sub-level
    pixel error (uint8 inputs are exact in bf16; only the lerp rounds).
    """
    k, n, _, ch = windows.shape
    pad = int(0.36 * n) + 2
    c = (n - 1) / 2.0

    phi, phi_r, kq, s, tx, ty = _plane_params(mats)
    cosr, sinr = jnp.cos(phi), jnp.sin(phi)
    dx, dy = tx - c, ty - c
    ux = c + cosr * dx + sinr * dy
    uy = c - sinr * dx + cosr * dy
    alpha = -jnp.tan(phi_r / 2.0)
    beta = jnp.sin(phi_r)

    params = jnp.stack(
        [alpha, beta, kq.astype(jnp.float32), s, ux, uy,
         jnp.ones_like(s), jnp.zeros_like(s)],
        axis=-1,
    )  # [K, 8]
    planes = jnp.transpose(windows, (0, 3, 1, 2))  # [K, C, N, N]

    # quadrant pre-rotation in XLA (dense flips/transposes)
    kq_i = kq.astype(jnp.int32)
    swap = jnp.swapaxes(planes, 2, 3)
    rot_variants = jnp.stack(
        [
            planes,
            jnp.flip(swap, axis=2),
            jnp.flip(planes, axis=(2, 3)),
            jnp.flip(swap, axis=3),
        ],
        axis=0,
    )
    planes = jnp.take_along_axis(
        rot_variants, kq_i[None, :, None, None, None], axis=0
    )[0]

    np_w = _padded_width(n, pad)
    kernel = functools.partial(_warp_kernel, n=n, ch=ch,
                               out_size=out_size, pad=pad, dtype=dtype)
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
            pltpu.VMEM((ch, n, np_w), dtype),
            pltpu.VMEM((ch, n, np_w), dtype),
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
