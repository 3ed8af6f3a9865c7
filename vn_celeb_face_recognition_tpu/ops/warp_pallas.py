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

  * quadrant pre-rotation (k * 90 deg) is absorbed INTO the pre-scale
    matmuls: rot90^k conjugated through "Ry @ V @ Rx^T" only flips the
    hat-weight column index (i_eff = a*i + b with per-face scalars
    a,b) and, for odd k, contracts the window's other axis (a
    pl.when-predicated dot_general variant). The XLA formulation paid
    ~3 ms/chunk in dense reverses + transposes + a one-hot blend of
    [K,C,224,224] stacks; the scalar-side absorption is free;
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


def _warp_kernel(params_ref, window_ref, out_ref, buf_a, buf_b, tbuf, *,
                 n, ch, out_size, pad, nf):
    """Warps ``nf`` faces per grid step. Only the integer block shift
    k0 is per-face data-dependent (one dynamic rotate per face per
    block); every static +-dev correction roll, the fractional lerp
    and the interior transposes run ONCE on the [nf*C, ...] stack —
    per-face select masks recover exactness. That batching is where
    the speed comes from: the single-face kernel was dominated by
    per-op overhead on ~700 tiny roll/select ops per face."""
    i = pl.program_id(0)
    alphas = [params_ref[i * nf + f, 0] for f in range(nf)]
    betas = [params_ref[i * nf + f, 1] for f in range(nf)]

    m = _M
    cm = (m - 1) / 2.0
    np_w = _padded_width(m, pad)

    # ---- pre-scale to the 160x160 intermediate: M = Ry @ img @ Rx^T
    o_m = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0).astype(
        jnp.float32)
    i_n = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1).astype(
        jnp.float32)
    buf_a[...] = jnp.zeros((nf * ch, m, np_w), jnp.float32)
    buf_b[...] = jnp.zeros((nf * ch, m, np_w), jnp.float32)
    for f in range(nf):
        kq = params_ref[i * nf + f, 2]
        s = params_ref[i * nf + f, 3]
        ux = params_ref[i * nf + f, 4]
        uy = params_ref[i * nf + f, 5]
        # quadrant absorption: M = Ry @ rot90^k(X) @ Rx^T equals
        #   k=0:  Ry    @ X   @  Rx^T          (no flips)
        #   k=1: (Ry J) @ X^T @  Rx^T          (flip L, contract X.T)
        #   k=2: (Ry J) @ X   @ (Rx J)^T       (flip both)
        #   k=3:  Ry    @ X^T @ (Rx J)^T       (flip R, contract X.T)
        # where J reverses hat-weight columns — built directly from a
        # flipped iota (i_eff = a*i + b), so flips are free scalars.
        flip_l = jnp.logical_or(kq == 1.0, kq == 2.0)
        flip_r = jnp.logical_or(kq == 2.0, kq == 3.0)
        x_t = jnp.logical_or(kq == 1.0, kq == 3.0)
        a_l = jnp.where(flip_l, -1.0, 1.0)
        b_l = jnp.where(flip_l, n - 1.0, 0.0)
        a_r = jnp.where(flip_r, -1.0, 1.0)
        b_r = jnp.where(flip_r, n - 1.0, 0.0)
        # bf16 matmul tails: hat weights and uint8-valued pixels are
        # near-exact in bf16 and the MXU accumulates in f32
        ry = jnp.maximum(
            0.0, 1.0 - jnp.abs(s * o_m + uy - (a_l * i_n + b_l))
        ).astype(jnp.bfloat16)  # [m, n]
        rx = jnp.maximum(
            0.0, 1.0 - jnp.abs(s * o_m + ux - (a_r * i_n + b_r))
        ).astype(jnp.bfloat16)
        img = window_ref[f]  # [C, N, N] raw (unrotated) window

        @pl.when(jnp.logical_not(x_t))
        def _row_contract():
            for cc in range(ch):
                tbuf[cc] = jax.lax.dot_general(
                    ry, img[cc],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        @pl.when(x_t)
        def _col_contract():
            for cc in range(ch):
                tbuf[cc] = jax.lax.dot_general(
                    ry, img[cc],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        for cc in range(ch):
            buf_a[f * ch + cc, :, _LO:_LO + m] = jax.lax.dot_general(
                tbuf[cc].astype(jnp.bfloat16), rx,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    # ---- 3-shear rotation of the intermediates ----
    ys_col = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).astype(
        jnp.float32) - cm

    def shear_pass(src_ref, dst_ref, coeffs, dev, blk_lo, blk_hi):
        # Integer part, ROW-BLOCKED: all 8 rows of a sublane-aligned
        # block share one per-face dynamic rotate by the block-centre
        # shift k0; each row's exact shift k_y differs from k0 by at
        # most `dev` (|coeff| <= tan(22.5deg)/sin(45deg) bounds the
        # in-block drift), so the static single-lane rotates + selects
        # that recover per-row exactness batch across ALL faces.
        #
        # The FRACTIONAL lerp is fused into the same variant loop:
        # shift k_y's +1 neighbour (variant d+1) is already the next
        # chained roll, so two select-accumulators (integer result and
        # its +1 neighbour) and one per-block lerp replace the old
        # separate full-plane roll + full-plane read-modify-write per
        # pass — the variants chain as single-lane rolls (v_{d+1} =
        # roll(v_d, -1)) instead of independent multi-lane rotates.
        nb = 8
        yv8 = (jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
               .astype(jnp.float32))
        for b in range(blk_lo, blk_hi):
            y0 = b * nb
            base_y = y0 + (nb - 1) / 2.0 - cm
            slabs, deltas, frs = [], [], []
            for f in range(nf):
                coeff = coeffs[f]
                k0 = jnp.clip(
                    jnp.floor(coeff * base_y).astype(jnp.int32),
                    -(pad - dev), pad - dev)
                slab = src_ref[f * ch:(f + 1) * ch, y0:y0 + nb, :]
                slabs.append(
                    pltpu.roll(slab, jnp.mod(-k0, np_w), axis=2))
                sy = coeff * (yv8 + (y0 - cm))
                ky = jnp.clip(
                    jnp.floor(sy).astype(jnp.int32), -pad, pad)
                deltas.append(jnp.broadcast_to(ky - k0, (ch, nb, 1)))
                frs.append(jnp.broadcast_to(sy - jnp.floor(sy),
                                            (ch, nb, 1)))
            r0 = jnp.concatenate(slabs, axis=0)    # [nf*C, nb, Wp]
            delta = jnp.concatenate(deltas, axis=0)
            fr = jnp.concatenate(frs, axis=0)
            acc0 = jnp.zeros_like(r0)
            acc1 = jnp.zeros_like(r0)
            # independent variants d = -dev .. dev+1 (a chained
            # single-lane formulation serialised on the VPU and
            # measured 1.2 ms/chunk SLOWER); d covers the integer
            # accumulator, d+1 feeds the neighbour accumulator
            for d in range(-dev, dev + 2):
                rd = (pltpu.roll(r0, (np_w - d) % np_w, axis=2)
                      if d > 0
                      else pltpu.roll(r0, -d, axis=2) if d < 0
                      else r0)
                if d <= dev:
                    acc0 = jnp.where(delta == d, rd, acc0)
                if d > -dev:
                    acc1 = jnp.where(delta == d - 1, rd, acc1)
            out_blk = acc0 * (1.0 - fr) + acc1 * fr
            dst_ref[:, y0:y0 + nb, _LO:_LO + m] = \
                out_blk[:, :, _LO:_LO + m]

    nblk = _M // 8
    # |alpha| <= tan(pi/8): in-block drift 0.415*3.5 -> floor diff <= 2
    # |beta|  <= sin(pi/4): 0.708*3.5 -> floor diff <= 3
    shear_pass(buf_a, buf_b, alphas, 2, 0, nblk)
    # y-shear == x-shear on the transposed interior
    buf_a[:, :, _LO:_LO + m] = jnp.swapaxes(
        buf_b[:, :, _LO:_LO + m], 1, 2
    )
    shear_pass(buf_a, buf_b, betas, 3, 0, nblk)
    buf_a[:, :, _LO:_LO + m] = jnp.swapaxes(
        buf_b[:, :, _LO:_LO + m], 1, 2
    )
    # the final crop reads rows DELTA..DELTA+111 only -> blocks 3..16
    shear_pass(buf_a, buf_b, alphas, 2, 3, 17)

    # ---- centred 112 crop via one-hot matmuls (aligned-slice-free)
    o_c = jax.lax.broadcasted_iota(jnp.int32, (out_size, m), 0).astype(
        jnp.float32)
    i_m = jax.lax.broadcasted_iota(jnp.int32, (out_size, m), 1).astype(
        jnp.float32)
    crop = jnp.where(
        jnp.abs(o_c + _DELTA - i_m) < 0.5, 1.0, 0.0
    ).astype(jnp.bfloat16)  # [out, m] one-hot rows (exact in bf16)
    for f in range(nf):
        for cc in range(ch):
            rot = buf_b[f * ch + cc, :, _LO:_LO + m]  # [m, m]
            t = jnp.dot(crop, rot.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            out_ref[f, cc] = jnp.dot(t.astype(jnp.bfloat16), crop.T,
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
                                   interpret=False, faces_per_step=2):
    """windows [K, N, N, C], mats [K, 2, 3] -> [K, out, out, C] f32.

    Drop-in for ops.warp_fast.batched_similarity_warp, running the
    Pallas kernel (or its interpreter on CPU). out_size must be 112
    (the centred-crop constant matches the 160 intermediate).
    ``faces_per_step`` faces share each grid step (K is padded up to a
    multiple); per-face results are independent of the grouping.
    Measured on v5e at [256, 224, 224, 3]: nf=2 is the sweet spot
    (12.1 ms vs 12.9 at nf=1; nf=4's bigger scratch stacks regress to
    24 ms), so 2 is the default.
    """
    assert out_size == 112, "kernel is specialised to 112 outputs"
    k, n, _, ch = windows.shape
    nf = max(1, min(int(faces_per_step), k))
    k_pad = -(-k // nf) * nf
    if k_pad != k:
        windows = jnp.concatenate([
            windows,
            jnp.zeros((k_pad - k,) + windows.shape[1:], windows.dtype),
        ])
        eye = jnp.zeros((k_pad - k, 2, 3), mats.dtype).at[:, 0, 0].set(
            1.0).at[:, 1, 1].set(1.0)
        mats = jnp.concatenate([mats, eye])
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
    # raw windows, channel-major; the quadrant rotation is absorbed
    # into the kernel's hat-weight scalars (flipped iotas + a
    # predicated transposed contraction) — the previous XLA pre-
    # rotation (flips + transposes + one-hot blend over 4 variants of
    # the [K, C, N, N] stack) cost ~3 ms/chunk of pure HBM traffic
    planes = jnp.transpose(windows, (0, 3, 1, 2))  # [K, C, N, N]

    np_w = _padded_width(_M, pad)
    kernel = functools.partial(_warp_kernel, n=n, ch=ch,
                               out_size=out_size, pad=pad, nf=nf)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k_pad // nf,),
        in_specs=[
            pl.BlockSpec((nf, ch, n, n), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nf, ch, out_size, out_size),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nf * ch, _M, np_w), jnp.float32),
            pltpu.VMEM((nf * ch, _M, np_w), jnp.float32),
            pltpu.VMEM((ch, _M, n), jnp.float32),
        ],
    )
    # ship the pixel planes in bf16: the kernel's first touch is
    # img.astype(bf16) for the MXU pre-scale, so this is bit-identical
    # and halves the double-buffered VMEM input block
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k_pad, ch, out_size, out_size),
                                       jnp.float32),
        interpret=interpret,
    )(params, planes.astype(jnp.bfloat16))
    return jnp.transpose(out[:k], (0, 2, 3, 1))
