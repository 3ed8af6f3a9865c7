"""Batch-packed NHWC forward for MobileNetV1-0.25's stage 1.

The stage's six blocks run at 8-64 channels; plain NHWC lane-tiles the
channel dim to 128, so a C=8 activation is streamed at 16x its logical
size — the measured cost of the flax stage (~5 ms/chunk vs a ~2 ms
roofline). The Pallas flat-lane kernels (ops/planar_s1_pallas.py) fix
the padding but pay ~4 ms of grid-step overhead plus ~4 ms of XLA
layout glue between stride-2 segments (tools/exp_planar_s1.py
attribution).

This formulation fixes the padding INSIDE stock XLA instead: pack
G=16 images along the lane dim, so activations are [B/G, H, W, G*C]
with 128/256/512/1024 lanes — every layer pad-free. The math is the
ordinary conv graph:

  * depthwise 3x3 stays a grouped conv (feature_group_count = G*C)
    with the per-channel taps tiled G times;
  * pointwise 1x1 becomes a G-grouped conv (feature_group_count = G)
    with the [C, O] matrix tiled per group — block-diagonal on lanes,
    which the MXU contracts natively;
  * the first 3x3/s2 conv likewise (G groups of 3 input channels);
  * BatchNorm (eval) folds to tiled per-lane scale+bias, fused by XLA
    into the convs; explicit ((1,1),(1,1)) padding keeps the torch
    stride-2 tap placement (XLA SAME would shift by one).

G stays fixed through the stage, so packing happens ONCE on the uint8
input and unpacking ONCE on the s1 output — two cheap transposes.
Weights are the ordinary flax/torch checkpoint tree (same keys); the
outputs match the parity-tested planar/NHWC paths to float tolerance.

MEASURED AND REJECTED (tools/exp_planar_s1.py, v5e, [32, 640, 640, 3]
bf16): 35.4 ms/chunk vs 5.03 ms for the plain NHWC flax stage (and
9.1 ms for the Pallas flat-lane kernels). The lane accounting is
right, but XLA's TPU lowering of ``feature_group_count`` convs does
NOT contract the groups as one block-diagonal MXU call — each group
is padded/tiled separately, so the formulation pays the small-channel
padding PER GROUP plus the grouped-conv overhead, 7x worse than the
padding it set out to avoid. Kept (with the parity test,
tests/test_planar_mnet.py::test_packed_stage1_matches_nhwc) as the
record that batch-to-lane packing via grouped convs is a dead end on
this backend; a fused Pallas stage-1 kernel remains the only open
lever for the stage-1 lane problem.
"""

from typing import Any

import jax
import jax.numpy as jnp

from .planar_mnet import _STAGE1_SPECS, _fold_bn

_LEAKY = 0.1


def _leaky(y, dtype):
    return jnp.where(y >= 0, y, y * jnp.asarray(_LEAKY, dtype))


_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, kernel, stride, groups, dtype):
    # explicit pad-1 for the 3x3s (XLA SAME at stride 2 would place
    # the even-H pad asymmetrically and shift the taps vs torch)
    pad = ((1, 1), (1, 1)) if kernel.shape[0] == 3 else ((0, 0), (0, 0))
    return jax.lax.conv_general_dilated(
        x, kernel.astype(dtype), (stride, stride),
        pad, dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=dtype)


def _bn_leaky(y, mul, add, g, dtype):
    mul = jnp.tile(mul.astype(dtype), g)
    add = jnp.tile(add.astype(dtype), g)
    return _leaky(y * mul + add, dtype)


def pick_groups(batch, lane_target=16):
    """Largest divisor of the batch that is <= lane_target: C=8 times
    16 packed images fills 128 lanes exactly."""
    g = min(lane_target, batch)
    while batch % g:
        g -= 1
    return g


def packed_stage1(params, stats, imgs_nhwc, sub, dtype=None,
                  groups=None):
    """Same contract as ops/planar_mnet.planar_stage1: the flax
    ``body/stage1`` param and batch_stats subtrees, [B, H, W, 3] uint8
    (or float) frames, per-channel means; returns s1 as NHWC
    [B, H/8, W/8, 64] in ``dtype``."""
    dt = jnp.dtype(dtype) if dtype is not None else jnp.float32
    b, h, w, _ = imgs_nhwc.shape
    g = pick_groups(b) if groups is None else groups
    bp = b // g
    # pack: lane index = packed_image * 3 + c (group-major)
    x = imgs_nhwc.reshape(bp, g, h, w, 3).transpose(0, 2, 3, 1, 4)
    x = x.reshape(bp, h, w, g * 3).astype(dt)
    x = x - jnp.tile(jnp.asarray(sub, dt), g)

    # block 0: 3x3/s2 conv + BN + leaky, G groups of 3 -> 8
    k0 = params["0"]["0"]["kernel"]          # [3, 3, 3, 8]
    y = _conv(x, jnp.tile(k0, (1, 1, 1, g)), 2, g, dt)
    mul, add = _fold_bn(params["0"]["1"], stats["0"]["1"])
    y = _bn_leaky(y, mul, add, g, dt)

    for i in range(1, len(_STAGE1_SPECS)):
        _, cin, cout, stride = _STAGE1_SPECS[i]
        p, s = params[str(i)], stats[str(i)]
        kd = p["0"]["kernel"]                # [3, 3, 1, C]
        y = _conv(y, jnp.tile(kd, (1, 1, 1, g)), stride, g * cin, dt)
        m1, a1 = _fold_bn(p["1"], s["1"])
        y = _bn_leaky(y, m1, a1, g, dt)
        kp = p["3"]["kernel"]                # [1, 1, C, O]
        y = _conv(y, jnp.tile(kp, (1, 1, 1, g)), 1, g, dt)
        m2, a2 = _fold_bn(p["4"], s["4"])
        y = _bn_leaky(y, m2, a2, g, dt)

    ho, wo = y.shape[1], y.shape[2]
    y = y.reshape(bp, ho, wo, g, 64).transpose(0, 3, 1, 2, 4)
    return y.reshape(b, ho, wo, 64)
