"""Plane-major [B, C, H, W] forward for MobileNetV1-0.25's stage 1.

Why: RetinaFace's cfg_mnet trunk spends its first six blocks at 8-64
channels and 640-80 px (reference retina_face_utils/components.py:
102-115). In NHWC those layers put the CHANNEL count in the TPU lane
dimension, which tiles to 128 — so a C=8 activation is stored (and
streamed) at 16x its logical size, a C=16 one at 8x. The stage-1
forward is bandwidth-bound, so the lane padding is the measured cost:
the whole mobilenet body read ~6 ms/chunk on the bench shapes while
its roofline is ~2 ms (tools/profile_retinaface.py).

Here stage 1 runs in a plane-major layout instead: [B, C, H, W] keeps
channels in the SUBLANE dimension (tile 8 — C=8/16/32/64 pad-free) and
full image rows in lanes. The math is unchanged:

  * pointwise 1x1 convs become one GEMM over C per image
    (einsum oc,bchw->bohw — the MXU contracts tiny C against huge HW);
  * depthwise 3x3 convs become nine statically-shifted weighted adds
    that XLA fuses into a single pass over the padded plane;
  * stride-2 depthwise convs split the padded plane into four
    even/odd phase planes first (a reshape, no gathers), so every tap
    stays a STATIC slice — never a strided lane access;
  * BatchNorm (inference) folds to a per-channel scale+bias broadcast
    along sublanes, exactly its eval-mode arithmetic.

The weights are the ordinary flax/torch checkpoint tree — same keys,
same values — so published checkpoints need no re-conversion, and the
outputs match the NHWC modules to float-reassociation tolerance.
"""

from typing import Any

import jax.numpy as jnp
import numpy as np


def _fold_bn(bn_params, bn_stats, eps=1e-5):
    """Eval-mode BN as per-channel (mul, add) — identical arithmetic."""
    mul = bn_params["scale"] * jnp.reciprocal(
        jnp.sqrt(bn_stats["var"] + eps))
    add = bn_params["bias"] - bn_stats["mean"] * mul
    return mul, add


def _bn_leaky(x, mul, add, leaky, dtype):
    mul = mul.astype(dtype)[None, :, None, None]
    add = add.astype(dtype)[None, :, None, None]
    y = x * mul + add
    return jnp.where(y >= 0, y, y * jnp.asarray(leaky, dtype))


def _pointwise(x, kernel, dtype):
    """1x1 conv: kernel [1, 1, Cin, Cout] (flax HWIO) on [B, C, H, W]."""
    w = kernel[0, 0].astype(dtype)  # [Cin, Cout]
    return jnp.einsum("co,bchw->bohw", w, x,
                      preferred_element_type=dtype)


def _depthwise(x, kernel, stride, dtype):
    """3x3 depthwise, pad 1: kernel [3, 3, 1, C] (flax HWIO, grouped).

    Nine statically-shifted weighted adds on the padded plane; stride 2
    goes through four phase planes so every tap is a static slice.
    """
    b, c, h, w = x.shape
    k = kernel[:, :, 0, :].astype(dtype)  # [3, 3, C]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    if stride == 1:
        acc = None
        for dy in range(3):
            for dx in range(3):
                term = xp[:, :, dy:dy + h, dx:dx + w] * \
                    k[dy, dx][None, :, None, None]
                acc = term if acc is None else acc + term
        return acc
    # stride 2: out size floor((H + 2 - 3) / 2) + 1 = (H + 1) // 2.
    # Odd sizes get one extra (never-read) pad row/col so the phase
    # reshape stays even.
    ho, wo = (h + 1) // 2, (w + 1) // 2
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, h % 2), (0, w % 2)))
    hp, wp = xp.shape[2], xp.shape[3]
    # phase planes P[a, b][u, v] = xp[2u + a, 2v + b]
    ph = xp.reshape(b, c, hp // 2, 2, wp // 2, 2).transpose(
        0, 1, 3, 5, 2, 4)  # [B, C, 2, 2, Hp/2, Wp/2]
    acc = None
    for dy in range(3):
        for dx in range(3):
            plane = ph[:, :, dy % 2, dx % 2]
            term = plane[:, :, dy // 2:dy // 2 + ho,
                         dx // 2:dx // 2 + wo] * \
                k[dy, dx][None, :, None, None]
            acc = term if acc is None else acc + term
    return acc


def _first_conv(x, kernel, dtype):
    """3x3 stride-2 conv from 3 input channels, pad 1 (block 0).

    Phase-split like the stride-2 depthwise, then one 27->C GEMM over
    the nine taps x three channels.
    """
    b, c, h, w = x.shape
    ho, wo = (h + 1) // 2, (w + 1) // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1 + h % 2), (1, 1 + w % 2)))
    ph = xp.reshape(b, c, xp.shape[2] // 2, 2, xp.shape[3] // 2,
                    2).transpose(0, 1, 3, 5, 2, 4)
    taps = [
        ph[:, :, dy % 2, dx % 2][:, :, dy // 2:dy // 2 + ho,
                                 dx // 2:dx // 2 + wo]
        for dy in range(3) for dx in range(3)
    ]
    stack = jnp.concatenate(taps, axis=1)  # [B, 9*3, Ho, Wo]
    # kernel [3, 3, 3, Cout] -> [9*3, Cout] in the same tap-major order
    w9 = kernel.astype(dtype).transpose(0, 1, 2, 3).reshape(-1,
                                                            kernel.shape[3])
    return jnp.einsum("co,bchw->bohw", w9, stack,
                      preferred_element_type=dtype)


_STAGE1_SPECS = (
    ("conv_bn", 3, 8, 2),
    ("conv_dw", 8, 16, 1),
    ("conv_dw", 16, 32, 2),
    ("conv_dw", 32, 32, 1),
    ("conv_dw", 32, 64, 2),
    ("conv_dw", 64, 64, 1),
)


def planar_stage1(params, stats, imgs_nhwc, sub, dtype=None):
    """MobileNetV1-0.25 stage 1 in plane-major layout.

    Args:
      params/stats: the flax ``body/stage1`` param and batch_stats
        subtrees (ordinary checkpoint layout — ConvBN is ``{'0': conv,
        '1': bn}``, ConvDW is ``{'0': dw, '1': bn, '3': pw, '4': bn}``).
      imgs_nhwc: [B, H, W, 3] uint8 (or float) frames.
      sub: per-channel mean to subtract (the reference's [104, 117,
        123] BGR means).
      dtype: compute dtype (None -> float32).

    Returns s1 as NHWC [B, H/8, W/8, 64] in ``dtype``.
    """
    dt = jnp.dtype(dtype) if dtype is not None else jnp.float32
    # one u8 transpose into plane-major, then cast+sub in the cheap
    # layout (the NHWC [..., 3] cast would lane-pad 3 -> 128)
    x = imgs_nhwc.transpose(0, 3, 1, 2).astype(dt) - \
        jnp.asarray(sub, dt)[None, :, None, None]
    for i, (kind, cin, cout, stride) in enumerate(_STAGE1_SPECS):
        p = params[str(i)]
        s = stats[str(i)]
        if kind == "conv_bn":
            x = _first_conv(x, p["0"]["kernel"], dt)
            mul, add = _fold_bn(p["1"], s["1"])
            x = _bn_leaky(x, mul, add, 0.1, dt)
        else:
            x = _depthwise(x, p["0"]["kernel"], stride, dt)
            mul, add = _fold_bn(p["1"], s["1"])
            x = _bn_leaky(x, mul, add, 0.1, dt)
            x = _pointwise(x, p["3"]["kernel"], dt)
            mul, add = _fold_bn(p["4"], s["4"])
            x = _bn_leaky(x, mul, add, 0.1, dt)
    return x.transpose(0, 2, 3, 1)  # NHWC for stage 2+
