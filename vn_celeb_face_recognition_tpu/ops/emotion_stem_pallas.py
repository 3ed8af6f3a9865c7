"""Fused emotion stem: resize+conv7x7/s2+BN+ReLU+maxpool as ONE GEMM.

The production emotion stage feeds 112px aligned faces through an
exact-area upsample to 224px, then the 2-branch ResNet-50's stem
(reference /root/reference/models/resnet_2_branch.py:12-89 — stock
conv1 7x7/s2 + BN + ReLU + maxpool 3x3/s2). Measured per-layer
(tools/profile_emotion.py) the resize+stem block runs against its HBM
roofline: the [K,224,224,3] resized tensor and the [K,112,112,64]
conv1 output are pure intermediate traffic (~1.3 GB per 512-face
chunk).

Both disappear, exactly:

* **The 112->224 area upsample is 2x2 pixel duplication** (the
  adaptive-pool cells have width 1), so conv7x7/s2 on the upsampled
  image folds into a 4x4/s1 conv on the 112px face: output row r
  reads up224 rows 2r+ky-3 whose source row is r + floor((ky-3)/2) —
  taps ky in {1,2}, {3,4}, {5,6} sum pairwise into folded offsets
  {-1, 0, +1} with ky=0 alone at -2. The imagenet normalisation
  commutes with duplication and is applied on the SMALL face before
  zero-padding (keeping the conv's zero-pad semantics exact).

* **conv + ceil-pool fuse via subposition channels at pooled
  resolution** (the pyramid+PNet pattern): maxpool cell p covers conv
  rows 2p+sy, sy in {-1,0,1}, and those read face rows 2p+sy+delta —
  all expressible as 4x4 taps x 2x2 phases of the SPACE-TO-DEPTH'd
  face, whose 56-grid coincides 1:1 with the pooled output grid. One
  [9*64, 16*12] matrix (BN folded into its rows) turns
  resize+conv+BN+pool into a single MXU GEMM per band; ReLU commutes
  with max and applies after, on 64 channels instead of 576. The
  pool's -1e9 edge subpositions (flax max_pool zero... -inf pads) are
  two static masks (sy=-1 at p=0, sx=-1 at q=0).

Faces pack 2-per-128-lanes (56-grid + 2-lane left pad for the -2 col
taps in a 64-lane half-block); activations never touch HBM between
the face pixels and the [K,56,56,64] pooled map layer1 consumes.

**MEASURED AND REJECTED** (kept in-tree, parity-tested, opt-in via
``FusedRecognitionEngine(fused_emotion_stem=True)``): the production
line measured 3,201 faces/sec at 160.0 ms/chunk vs 3,330 at 153.4 for
the XLA resize+stem. The ~1.3 GB of intermediates the fusion removes
(~1.6 ms of HBM at 512 faces) is outweighed by the formulation's
arithmetic inflation — the subposition expansion recomputes
overlapping pool windows (2.25x) and the 56-wide pooled grid pads to
64 lanes, ~282 extra GFLOP/chunk (~2 ms) — plus the s2d pack and
NHWC unpack transposes XLA must add around the kernel. Together with
ops/crops_net_pallas.py this bounds the fused conv+pool GEMM pattern
from the losing side twice; the winning side (ops/
pyramid_pnet_pallas.py) removed a dispatch chain as well as a
resolution level, which neither rejected case has.

Parity: tests/test_emotion_stem.py pins the fused apply against
ResNet2Branch.apply end to end.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_NEG = -1e9
_SG = 56           # s2d grid == pooled grid
_ROWS = _SG + 3    # 2 zero pad rows on top, 1 below
_BLOCK = 64        # lanes per face: 2 pad + 56 + 6 pad
_RB = 14           # pooled rows per in-kernel band
_BN_EPS = 1e-5

# imagenet affine (matches utils' imagenet_normalize on x/255)
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def fold_stem_weights(params, stats):
    """conv1 [7,7,3,64] + bn1 -> A [576, 192] (BN scale folded into
    rows) and bias col [576, 1]."""
    k = jnp.asarray(params["conv1"]["kernel"], jnp.float32)
    # pairwise ky sums -> folded 4x4 kernel over the 112px face
    fold = [(0,), (1, 2), (3, 4), (5, 6)]
    kf = jnp.stack([sum(k[i] for i in g) for g in fold], 0)
    kf = jnp.stack([sum(kf[:, i] for i in g) for g in fold], 1)
    # kf [4, 4, 3, 64], folded tap offsets delta in {-2..1} at idx+2
    a = jnp.zeros((9 * 64, 16 * 12), jnp.float32)
    for sy in (-1, 0, 1):
        for sx in (-1, 0, 1):
            row = ((sy + 1) * 3 + (sx + 1)) * 64
            for dy in range(4):
                for dx in range(4):
                    ey, ex = sy + dy - 2, sx + dx - 2
                    tyo, py = ey // 2 + 2, ey % 2
                    txo, px = ex // 2 + 2, ex % 2
                    col = (tyo * 4 + txo) * 12 + (py * 2 + px) * 3
                    a = a.at[row:row + 64, col:col + 3].set(
                        kf[dy, dx].T)
    m = jnp.asarray(stats["bn1"]["mean"], jnp.float32)
    v = jnp.asarray(stats["bn1"]["var"], jnp.float32)
    sc = jnp.asarray(params["bn1"]["scale"], jnp.float32)
    bi = jnp.asarray(params["bn1"]["bias"], jnp.float32)
    inv = sc / jnp.sqrt(v + _BN_EPS)
    a = a * jnp.tile(inv, 9)[:, None]
    b = jnp.tile(bi - m * inv, 9)[:, None]
    return a, b


def pack_faces(faces, dtype):
    """[K, 112, 112, 3] raw-pixel faces -> [K/2, 12, 59*128] bf16
    normalized s2d feed (2 faces per 128 lanes; K must be even)."""
    k = faces.shape[0]
    x = faces.astype(jnp.float32) / 255.0
    x = (x - _MEAN) / _STD
    x = x.astype(dtype).reshape(k, _SG, 2, _SG, 2, 3)
    x = x.transpose(0, 2, 4, 5, 1, 3).reshape(k, 12, _SG, _SG)
    # 2 faces per lane row; rows t at t+2 (2 pad top, 1 bottom);
    # cols c at half*64 + c + 2
    x = x.reshape(k // 2, 2, 12, _SG, _SG)
    x = x.transpose(0, 2, 3, 1, 4)           # [G, 12, 56, 2, 56]
    x = jnp.pad(x, ((0, 0), (0, 0), (2, 1), (0, 0),
                    (2, _BLOCK - _SG - 2)))
    return x.reshape(k // 2, 12, _ROWS * _LANES)


def _kernel(x_ref, a, b, out_ref, b_scr, *, groups, mxu):
    mxu_dt = jnp.dtype(mxu)
    n = _RB * _LANES
    bands = _SG // _RB
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    col_edge = jnp.bitwise_and(lane, _BLOCK - 1) == 0  # q == 0
    row_edge = lane < _LANES                           # p == 0 (band 0)

    def body(ci, carry):
        g, bd = ci // bands, ci % bands
        base = g * (_ROWS * _LANES) + bd * (_RB * _LANES)
        x = x_ref[0, :, pl.ds(base, (_RB + 3) * _LANES)].astype(
            jnp.float32)
        xr = [x]
        for d in (1, 2, 3):
            xr.append(pltpu.roll(x, x.shape[-1] - d, axis=1))
        for t in range(16):
            tyo, txo = t // 4, t % 4
            tap = xr[txo] if tyo == 0 else pltpu.roll(
                xr[txo], xr[txo].shape[-1] - tyo * _LANES, axis=1)
            b_scr[t * 12:(t + 1) * 12, 0:n] = jax.lax.slice_in_dim(
                tap, 0, n, axis=1).astype(b_scr.dtype)
        y = jax.lax.dot_general(
            a[...].astype(mxu_dt), b_scr[...].astype(mxu_dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b[...]
        pooled = None
        for sy in range(3):
            for sx in range(3):
                s = jax.lax.slice_in_dim(y, (sy * 3 + sx) * 64,
                                         (sy * 3 + sx + 1) * 64,
                                         axis=0)
                if sx == 0:
                    s = jnp.where(col_edge, _NEG, s)
                if sy == 0:
                    s = jnp.where((bd == 0) & row_edge, _NEG, s)
                pooled = s if pooled is None else jnp.maximum(pooled,
                                                              s)
        pooled = jnp.maximum(pooled, 0.0)  # ReLU commutes with max
        out_ref[0, :, pl.ds(g * (_SG * _LANES) + bd * n, n)] = \
            pooled.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, groups * bands, body, 0)


def emotion_stem_pallas(params, stats, faces, dtype=jnp.bfloat16,
                        interpret=False, groups_per_step=4):
    """Raw 112px faces [K, 112, 112, 3] -> pooled stem output
    [K, 56, 56, 64] in ``dtype`` — exactly
    maxpool(relu(bn(conv1(imagenet_normalize(area_resize(x,224)/255)))))
    of the 2-branch ResNet-50."""
    interpret = interpret or jax.default_backend() == "cpu"
    k = faces.shape[0]
    pad_k = (-k) % (2 * groups_per_step)
    if pad_k:
        faces = jnp.pad(faces, ((0, pad_k), (0, 0), (0, 0), (0, 0)))
    feed = pack_faces(faces, dtype)
    g_total = feed.shape[0]
    gs = min(groups_per_step, g_total)
    while g_total % gs:
        gs -= 1
    steps = g_total // gs
    feed = feed.reshape(steps, gs, 12, _ROWS * _LANES)
    feed = feed.transpose(0, 2, 1, 3).reshape(
        steps, 12, gs * _ROWS * _LANES)
    a, b = fold_stem_weights(params, stats)
    a = a.astype(dtype)

    in_specs = [pl.BlockSpec((1, 12, feed.shape[-1]),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    for arr in (a, b):
        in_specs.append(pl.BlockSpec(
            arr.shape, partial(lambda i, _n=arr.ndim: (0,) * _n),
            memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        partial(_kernel, groups=gs, mxu=dtype),
        grid=(steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 64, gs * _SG * _LANES),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (steps, 64, gs * _SG * _LANES), dtype),
        scratch_shapes=[pltpu.VMEM((192, _RB * _LANES), dtype)],
        interpret=interpret,
    )(feed, a, b)

    out = out.reshape(steps, 64, gs, _SG, 2, _BLOCK)
    out = out[..., :_SG]
    out = out.transpose(0, 2, 4, 3, 5, 1)  # [S, gs, 2, 56, 56, 64]
    out = out.reshape((k + pad_k), _SG, _SG, 64)
    return out[:k] if pad_k else out


def emotion_apply_fused(module, variables, faces, dtype=jnp.bfloat16,
                        interpret=False):
    """Full 2-branch emotion net on RAW 112px faces via the fused stem
    + the model's own ResLayers/heads. Returns (x_cls, x_proj) f32 —
    matching imagenet_normalize+resize+module.apply."""
    from ..models.resnet_common import ResLayer

    p, st = variables["params"], variables["batch_stats"]
    x = emotion_stem_pallas(p, st, faces, dtype, interpret)
    cfg = ((64, module.layers[0], 1, 64),
           (128, module.layers[1], 2, 256),
           (256, module.layers[2], 2, 512),
           (512, module.layers[3], 2, 1024))
    for i, (planes, blocks, stride, cin) in enumerate(cfg, start=1):
        mod = ResLayer(planes, blocks, stride, cin, dtype=dtype)
        x = mod.apply({"params": p[f"layer{i}"],
                       "batch_stats": st[f"layer{i}"]},
                      x.astype(dtype), train=False)
    x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    x_cls = x @ p["fc"]["kernel"] + p["fc"]["bias"]
    x_proj = x @ p["proj"]["kernel"] + p["proj"]["bias"]
    return x_cls, x_proj
