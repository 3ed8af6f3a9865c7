"""VMEM-resident bottleneck-block chains for the emotion trunk's
bandwidth-bound ResNet layers (l1/l2).

tools/profile_emotion.py at the production shapes (cap=512, bf16)
measures layer1 at 14.19 ms vs a 9.28 ms HBM roofline and layer2 at
13.88 vs 7.78 — both bandwidth-bound, with XLA moving ~1.5x the model
bytes (each Bottleneck's two quarter-width intermediates and the
residual make extra HBM round trips). This kernel runs a chain of
STRIDE-1 Bottleneck blocks (reference
/root/reference/models/resnet_2_branch_utils/resnet.py:23-67 — conv1x1
-> BN -> relu -> conv3x3 -> BN -> relu -> conv1x1 -> BN -> +residual
-> relu) entirely in VMEM per image band: the input is read from HBM
once, the output written once, and every intermediate — including the
residual — stays on-chip. Zero recompute (the builder's rule after the
stem/crops-net rejections): 1x1 convs have no spatial overlap and the
3x3 reads only in-band rows plus masked edges.

Formulation per block (all BN folded into GEMM weights host-side,
inference running stats):
  * conv1:  one MXU GEMM  [M, C] @ [C, P]           (M = images*H*W)
  * conv2:  9 shifted sublane slices of the conv1 output (tap (dy,dx)
    is a (dy*W+dx)-row offset of the row-flattened map; out-of-image
    taps masked by a host-precomputed [M, 16] mask plane) concatenated
    into an im2col scratch -> ONE GEMM [M, 9P] @ [9P, P]
  * conv3 + residual + relu: GEMM [M, P] @ [P, C] chunked over 128
    output lanes, residual added from the resident map, written back
    in place (the final block writes straight to the output buffer).

Applicability: layer1 blocks 1-2 (56x56, P=64, C=256) and layer2
blocks 1-3 (28x28, P=128, C=512). The stride-2/downsample block 0 of
each layer stays in XLA (one-off shapes, no chain to fuse). layer3/4
are flop-bound at 88%+ MFU (profile_emotion) — XLA keeps them.

**MEASURED AND REJECTED** (kept in-tree, parity-tested, opt-in via
``FusedRecognitionEngine(fused_bottlenecks=True)``). Two variants on
the v5e at cap=512 (tools/profile_emotion.py --stages=l1f,l2f):
im2col-scratch conv2 measured l1 27.25 / l2 18.59 ms; direct
9-accumulated-GEMM conv2 (this file) l1 22.09 / l2 16.66 — vs XLA's
14.19 / 13.88 for the FULL layers (incl. block 0 the kernel doesn't
even cover). The bytes the chain removes (~2.5 GB/chunk) are real,
but the formulation cannot reach the GEMM rate needed to tie
(achieved 36/78 TFLOP/s vs the ~74/110 needed): every 3x3 tap with
dx=+-1 is a sublane-misaligned slice whose Mosaic relayout copy
costs more than the HBM traffic saved, dynamic band slices must be
8-aligned (forcing whole-M static tap materialisation), bf16 cannot
use pltpu.roll (32-bit-only), and the l1 GEMMs run at N=64 half-lane
utilisation. Third negative boundary of the byte-removal fusion
pattern (after ops/emotion_stem_pallas.py and ops/crops_net_pallas.py
— see docs/tpu_kernel_patterns.md rule #3): removing intermediate
bytes loses unless the fusion also deletes a dispatch chain or FLOPs.
The emotion l1/l2 bandwidth gap (measured ~9 ms over the byte-model
roofline) is hereby CLOSED as not addressable by hand kernels under
Mosaic's alignment rules at these channel counts: XLA's conv pipeline
at 54/85 TFLOP/s with ~515-600 GB/s is the practical frontier.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GUARD = 64      # zeroed sublane guard rows above/below the t1 map
_CH = 128        # conv3 output-lane chunk (bounds the f32 accumulator)
_BN_EPS = 1e-5
_TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


# ---------------------------------------------------------------------------
# Host-side folding
# ---------------------------------------------------------------------------


def _bn_fold(bn_params, bn_stats, eps=_BN_EPS):
    scale = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    shift = bn_params["bias"] - bn_stats["mean"] * scale
    return scale, shift


def fold_bottleneck_block(block_params, block_stats):
    """Fold one stride-1 Bottleneck's three BNs into its conv weights.

    Returns (W1a [C+1, P], W2a [9P+1, P] tap-major, W3a [P+1, 4P]) —
    f32, each with the folded BN shift appended as a final ROW so the
    MXU adds the bias through a ones column (Mosaic rejects
    sublane-broadcasting a [1, P] bias over [M, P]; lane broadcasts
    are fine, sublane ones are not).
    """
    s1, h1 = _bn_fold(block_params["bn1"], block_stats["bn1"])
    w1 = block_params["conv1"]["kernel"][0, 0] * s1[None, :]
    s2, h2 = _bn_fold(block_params["bn2"], block_stats["bn2"])
    k2 = block_params["conv2"]["kernel"] * s2[None, None, None, :]
    w2cat = jnp.concatenate(
        [k2[dy + 1, dx + 1] for dy, dx in _TAPS], axis=0
    )  # [9P, P]
    s3, h3 = _bn_fold(block_params["bn3"], block_stats["bn3"])
    w3 = block_params["conv3"]["kernel"][0, 0] * s3[None, :]
    aug = lambda w, h: jnp.concatenate(
        [w, h[None, :].astype(w.dtype)], axis=0)
    return (aug(w1, h1), aug(w2cat, h2), aug(w3, h3))


def fold_layer_tail(layer_params, layer_stats, n_blocks):
    """Folded weights for blocks 1..n_blocks of a ResLayer (block 0 —
    the stride/downsample block — stays in XLA)."""
    out = []
    for i in range(1, n_blocks + 1):
        out.extend(fold_bottleneck_block(layer_params[str(i)],
                                         layer_stats[str(i)]))
    return out


def _tap_masks(h, w, g):
    """[g*h*w, 16] f32: column t<9 = validity of tap t's source pixel;
    column 9 = ones (the conv2 bias row's implicit operand)."""
    yy, xx = np.mgrid[0:h, 0:w]
    m = np.zeros((h * w, 16), np.float32)
    for t, (dy, dx) in enumerate(_TAPS):
        ok = ((yy + dy >= 0) & (yy + dy < h)
              & (xx + dx >= 0) & (xx + dx < w))
        m[:, t] = ok.reshape(-1)
    m[:, 9] = 1.0
    return np.tile(m, (g, 1))


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _chain_kernel(x_ref, masks_ref, *refs, h, w, planes, n_blocks,
                  images, mxu, band):
    out_ref, t1_scr, t2_scr, y_scr = refs[-4:]
    wrefs = refs[:-4]
    m = images * h * w
    c = 4 * planes
    mxu_dt = jnp.dtype(mxu)

    # resident map [M, C] plus a persistent ones column feeding the
    # bias row of every conv1 (conv3 writes never touch column C)
    y_scr[:, 0:c] = x_ref[...].reshape(m, c)
    ones = jnp.ones((m, 1), y_scr.dtype)
    y_scr[:, c:c + 1] = ones
    zeros = jnp.zeros((_GUARD, planes), t1_scr.dtype)
    t1_scr[0:_GUARD] = zeros
    t1_scr[_GUARD + m:2 * _GUARD + m] = zeros
    t2_scr[:, planes:planes + 1] = jnp.ones((m, 1), t2_scr.dtype)

    n_bands = m // band
    for b in range(n_blocks):
        w1, w2, w3 = wrefs[3 * b:3 * b + 3]

        # band loops are fori_loops, NOT unrolled python loops: Mosaic
        # keeps every unrolled iteration's vector temporaries live on
        # the kernel stack (docs/tpu_kernel_patterns.md), which blew
        # the 16 MB scoped limit by ~5 MB at the l1 shapes
        def body1(i, _, w1=w1):
            r = i * band
            t1 = jax.lax.dot_general(
                y_scr[pl.ds(r, band)].astype(mxu_dt),
                w1[...].astype(mxu_dt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            t1_scr[pl.ds(_GUARD + r, band)] = jnp.maximum(
                t1, 0.0).astype(t1_scr.dtype)
            return 0

        jax.lax.fori_loop(0, n_bands, body1, 0)

        # conv2: 9 masked shifted tap slices feed 9 accumulated GEMMs
        # directly (an explicit im2col scratch round-trip measured
        # WORSE). Tap slices are STATIC — Mosaic allows misaligned
        # static sublane slices but not misaligned dynamic ones
        # ("index in dimension 0 must be a multiple of 8"). The bias
        # row 9P of W2 contracts against masks_ref's ones column 9.
        t2 = None
        for t, (dy, dx) in enumerate(_TAPS):
            o = dy * w + dx
            tap = t1_scr[_GUARD + o:_GUARD + o + m]
            tap = tap * masks_ref[:, t:t + 1].astype(tap.dtype)
            part = jax.lax.dot_general(
                tap.astype(mxu_dt),
                w2[t * planes:(t + 1) * planes].astype(mxu_dt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            t2 = part if t2 is None else t2 + part
        t2 = t2 + jax.lax.dot_general(
            masks_ref[:, 9:10].astype(mxu_dt),
            w2[9 * planes:9 * planes + 1].astype(mxu_dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        t2_scr[:, 0:planes] = jnp.maximum(t2, 0.0).astype(
            t2_scr.dtype)

        # conv3 + residual + relu, banded over rows and output lanes;
        # the last block streams straight to the output buffer
        dst = out_ref if b == n_blocks - 1 else y_scr

        def body3(i, _, w3=w3, dst=dst):
            r = i * band
            t2b = t2_scr[pl.ds(r, band)].astype(mxu_dt)
            for ch in range(0, c, _CH):
                o3 = jax.lax.dot_general(
                    t2b, w3[...][:, ch:ch + _CH].astype(mxu_dt),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o3 = o3 + y_scr[pl.ds(r, band),
                                ch:ch + _CH].astype(jnp.float32)
                dst[pl.ds(r, band), ch:ch + _CH] = jnp.maximum(
                    o3, 0.0).astype(dst.dtype)
            return 0

        jax.lax.fori_loop(0, n_bands, body3, 0)


def bottleneck_chain(x, folded, h, w, planes, images_per_step=None,
                     interpret=None):
    """Apply a chain of stride-1 Bottleneck blocks to x [N, H, W, C]
    (C = 4*planes) with BN-folded weights from ``fold_layer_tail``.
    Returns [N, H, W, C] in x.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = x.shape[0]
    c = 4 * planes
    n_blocks = len(folded) // 3
    if images_per_step is None:
        # one 56x56 image (l1) / two 28x28 images (l2) per grid step
        # keeps the im2col scratch + double-buffered IO under VMEM
        images_per_step = max(1, 2048 // (h * w))
    g = images_per_step
    while n % g:
        g -= 1
    m = g * h * w
    band = m
    for nb in range(1, 9):
        if m % nb == 0 and m // nb <= 1024:
            band = m // nb
            break

    dt = x.dtype
    masks = jnp.asarray(_tap_masks(h, w, g), dtype=dt)
    weights = [a.astype(dt) for a in folded]

    flat = x.reshape(n, h * w, c)
    in_specs = [
        pl.BlockSpec((g, h * w, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(masks.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for arr in weights:
        in_specs.append(pl.BlockSpec(
            arr.shape, partial(lambda i, _nd=arr.ndim: (0,) * _nd),
            memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        partial(_chain_kernel, h=h, w=w, planes=planes,
                n_blocks=n_blocks, images=g, mxu=dt, band=band),
        grid=(n // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * h * w, c), dt),
        scratch_shapes=[
            pltpu.VMEM((m + 2 * _GUARD, planes), dt),
            pltpu.VMEM((m, planes + 1), dt),
            pltpu.VMEM((m, c + 1), dt),
        ],
        # the default 16 MB scoped limit is conservative; the resident
        # map + im2col scratch + double-buffered IO for a 56x56x256
        # image band runs ~20 MB (v5e VMEM is far larger)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(flat, masks, *weights)
    return out.reshape(n, h, w, c)


# ---------------------------------------------------------------------------
# Fused emotion-net apply (stem + block0s in XLA, chains in Pallas)
# ---------------------------------------------------------------------------


def emotion_apply_fused_l12(model, variables, ex, interpret=None):
    """ResNet2Branch.apply with layer1 blocks 1-2 and layer2 blocks 1-3
    run through ``bottleneck_chain`` (reference resnet_2_branch.py:12-89
    semantics; BN uses running stats — inference only). ``ex`` is the
    normalised [N, 224, 224, 3] input in the model's compute dtype."""
    import flax.linen as nn

    from ..models.resnet_common import Bottleneck, ResLayer, _bn

    p = variables["params"]
    s = variables["batch_stats"]
    dt = model.dtype

    x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                use_bias=False, dtype=dt, name="conv1").apply(
        {"params": p["conv1"]}, ex)
    x = _bn("bn1", False, dt).apply(
        {"params": p["bn1"], "batch_stats": s["bn1"]}, x)
    x = nn.relu(x)
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    def block0(planes, stride, inplanes, lp, ls, y):
        needs_ds = stride != 1 or inplanes != planes * 4
        return Bottleneck(planes, stride, needs_ds, dtype=dt).apply(
            {"params": lp["0"], "batch_stats": ls["0"]}, y, train=False)

    # layer1: block0 in XLA, blocks 1-2 fused
    x = block0(64, 1, 64, p["layer1"], s["layer1"], x)
    x = bottleneck_chain(
        x, fold_layer_tail(p["layer1"], s["layer1"], 2),
        56, 56, 64, interpret=interpret)
    # layer2: block0 (stride 2 + downsample) in XLA, blocks 1-3 fused
    x = block0(128, 2, 256, p["layer2"], s["layer2"], x)
    x = bottleneck_chain(
        x, fold_layer_tail(p["layer2"], s["layer2"], 3),
        28, 28, 128, interpret=interpret)
    # layer3/4: flop-bound at 88%+ MFU — XLA keeps them
    x = ResLayer(256, model.layers[2], 2, 512, dtype=dt).apply(
        {"params": p["layer3"], "batch_stats": s["layer3"]}, x,
        train=False)
    x = ResLayer(512, model.layers[3], 2, 1024, dtype=dt).apply(
        {"params": p["layer4"], "batch_stats": s["layer4"]}, x,
        train=False)

    x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    x_cls = nn.Dense(model.num_classes, name="fc").apply(
        {"params": p["fc"]}, x)
    x_proj = nn.Dense(model.num_projections, name="proj").apply(
        {"params": p["proj"]}, x)
    return x_cls, x_proj
