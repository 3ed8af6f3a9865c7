"""Fused RNet/ONet trunks for batched crops: one Pallas kernel each.

After round 4's pyramid+PNet fusion, the MTCNN cascade's remaining
cost is its RNet/ONet stages (reference nets
/root/reference/models/mtcnn_utils/mtcnn.py:52-144): XLA runs their
tiny-channel convs (27->28, 252->48, 288->64 contractions) at ~6-9%
MXU and re-reads HBM between every layer, measuring ~0.9 ms (RNet,
2048 crops) and ~1.3 ms (ONet, 1024 crops) per bench chunk.

This module runs each net's trunk — conv1 + PReLU + ceil-pool1 +
conv2 + PReLU, which is 85%+ of the net's FLOPs — as ONE Pallas
kernel on a packed flat-lane layout, leaving the small tail (pool2
onward + fc + heads, a few Mops on tiny maps) to XLA.

**MEASURED AND REJECTED** (kept in-tree, parity-tested, opt-in via
``MTCNN(fused_crop_nets=True)``): on the 32x640x640 bench shapes the
fused cascade regressed 5.96 -> 9.00 ms (unrolled chunks; a fori-loop
variant measured 9.69, and the first cut at 384 fine grid steps also
9.00). Root cause, in the numbers: the RNet/ONet stages are VPU- and
data-movement-bound, not MXU-bound — the subposition-GEMM
formulation materialises 9 f32 subposition maps (9*C1 channels) per
pooled cell, ~2x the data XLA's plain conv+pool moves, and unlike
the PNet case there is no resolution level to collapse and no
8-level x 5-layer dispatch chain to eliminate. The fused conv+pool
GEMM pattern pays exactly when it removes one of those two costs;
this file is its measured negative boundary. Design notes below are
kept as written for that record:

* **Packing.** Crops are space-to-depth'd (2x2 -> 12 channels) on the
  XLA side, which halves the grid (24 -> 12 for RNet, 48 -> 24 for
  ONet) so 8 (RNet) / 4 (ONet) crops fit one 128-lane row at 16/32
  lanes each. Rows stack below each other (+1 zero pad row for the
  pool's ceil overhang); R crop-groups stack per grid step. Taps
  never escape a crop's lane block: the conv/pool chain's reach stays
  inside the original crop footprint, so blocks tile with NO gap
  lanes (geometry audited per net below).

* **conv1 + PReLU + ceil-pool fused into one GEMM + max** (the PNet
  trick, generalised): pooled cell (p, q) maxes the 9 conv outputs at
  (2p+sy, 2q+sx), and conv output (2p+sy) reads input rows
  2p+sy..2p+sy+2 — all inside s2d rows p..p+2. So a [9*C1, 9*12]
  matrix A1 (A1[(sy,sx,co),(ty,tx,ph,ci)] = k1[ky,kx,ci,co] where
  sy+ky = 2*ty+py etc.) turns conv1 into a single ~80%-dense MXU GEMM
  producing all 9 subposition channels at POOLED resolution —
  compact, no strided reads anywhere. Bias + PReLU apply per
  subposition, torch's ceil-mode out-of-range subpositions are static
  -1e9 masks (precomputed per lane), and the max over subposition
  channel blocks is the pool.

* **conv2 is stride-1 on the compact pooled grid**: plain flat-lane
  im2col (9 taps at dy*128+dx offsets, two single-lane rolls) into a
  [9*C1, n] scratch, one [C2, 9*C1] GEMM, bias + PReLU, out to HBM.

Parity is pinned against the flax RNet/ONet modules (themselves
torch-parity-tested) in tests/test_crops_net_pallas.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_NEG = -1e9


class CropNetSpec:
    """Static geometry for one net's fused trunk.

    size: crop side (24 RNet / 48 ONet). c1/c2: conv1/conv2 output
    channels. The s2d grid is size/2; feed rows add one zero pad row
    for the pool window's +2 reach; crop lane blocks are the s2d grid
    rounded up to a power-of-two lane count.
    """

    def __init__(self, size, c1, c2):
        self.size = size
        self.c1, self.c2 = c1, c2
        self.sg = size // 2              # s2d grid side
        self.feed_rows = self.sg + 1     # + zero pad row (tap reach)
        self.block = 16 if self.sg <= 15 else 32
        self.per_row = _LANES // self.block
        self.conv1_out = size - 2        # conv1 VALID side
        self.pg = -(-(self.conv1_out - 3) // 2) + 1  # ceil pool out
        self.c2_out = self.pg - 2        # conv2 VALID side
        # subposition (sy) is invalid at pooled row p when the conv1
        # output row 2p+sy falls past the valid range (torch ceil-mode
        # ignores out-of-range positions)
        self.edge_p = self.pg - 1
        self.edge_subs = tuple(
            s for s in (1, 2) if 2 * self.edge_p + s > self.conv1_out - 1
        )

    @property
    def group_lanes(self):
        return self.feed_rows * _LANES


RNET_SPEC = CropNetSpec(24, 28, 48)
ONET_SPEC = CropNetSpec(48, 32, 64)


def _fold_a1(k1, spec):
    """[3,3,3,c1] conv1 kernel -> A1 [9*c1, 9*12] fused conv+pool
    matrix (rows (sy*3+sx)*c1+co, cols (ty*3+tx)*12+(py*2+px)*3+ci)."""
    c1 = spec.c1
    a1 = jnp.zeros((9 * c1, 9 * 12), k1.dtype)
    for sy in range(3):
        for sx in range(3):
            for ky in range(3):
                for kx in range(3):
                    ry, rx = sy + ky, sx + kx
                    ty, py = ry // 2, ry % 2
                    tx, px = rx // 2, rx % 2
                    col = (ty * 3 + tx) * 12 + (py * 2 + px) * 3
                    row = (sy * 3 + sx) * c1
                    a1 = a1.at[row:row + c1, col:col + 3].set(
                        k1[ky, kx].T)
    return a1


def fold_crop_net_weights(params, spec):
    """Flax {conv1, prelu1, conv2, prelu2} params -> kernel operands
    [A1, b1, a1, W2, b2, a2] (f32; matrices cast to the MXU dtype by
    the caller)."""
    k1 = jnp.asarray(params["conv1"]["kernel"], jnp.float32)
    a1m = _fold_a1(k1, spec)
    b1 = jnp.tile(jnp.asarray(params["conv1"]["bias"], jnp.float32), 9)
    al1 = jnp.tile(jnp.asarray(params["prelu1"]["alpha"], jnp.float32),
                   9)
    k2 = jnp.asarray(params["conv2"]["kernel"], jnp.float32)
    w2 = k2.reshape(9 * spec.c1, spec.c2).T
    b2 = jnp.asarray(params["conv2"]["bias"], jnp.float32)
    al2 = jnp.asarray(params["prelu2"]["alpha"], jnp.float32)
    col = lambda v: v[:, None]
    return [a1m, col(b1), col(al1), w2, col(b2), col(al2)]


def _edge_masks(spec, r_groups):
    """0/1 f32 [1, n_step] masks: m_row zeroes (-> -1e9) positions at
    pooled row edge_p, m_col at pooled col edge_p of each crop block.
    Junk rows/cols beyond the pooled grid need no mask — the XLA tail
    never reads them."""
    n = r_groups * spec.group_lanes
    lane = np.arange(n, dtype=np.int64)
    row = (lane // _LANES) % spec.feed_rows
    colc = (lane % _LANES) % spec.block
    m_row = (row != spec.edge_p).astype(np.float32)[None]
    m_col = (colc != spec.edge_p).astype(np.float32)[None]
    return jnp.asarray(m_row), jnp.asarray(m_col)


def _kernel(x_ref, a1, b1, al1, w2, b2, al2, mrow, mcol, out_ref,
            b_scr, *, spec, mxu, chunks):
    """``chunks`` n-slices per grid step: a single chunk's VMEM
    working set (the [9*C1, n] subposition map is the fat one) stays
    bounded while the grid stays short — per-step overhead was 3 ms
    of a 384-step first cut."""
    mxu_dt = jnp.dtype(mxu)
    c1 = spec.c1
    n = x_ref.shape[-1] // chunks
    mr, mc = mrow[...], mcol[...]

    # a REAL loop (not unrolled): Mosaic's scheduler keeps every
    # unrolled chunk's [9*C1, n] f32 subposition map alive at once —
    # 8 chunks OOM'd the 16 MB scoped vmem. n is a multiple of 128,
    # so the dynamic lane slices stay tile-aligned.
    def body(ci, carry):
        o = ci * n
        x = x_ref[0, :, pl.ds(o, n)].astype(jnp.float32)   # [12, n]
        xr1 = pltpu.roll(x, n - 1, axis=1)
        xr2 = pltpu.roll(x, n - 2, axis=1)
        srcs = (x, xr1, xr2)
        # taps keep the full length n: a row offset is an aligned
        # roll whose wrap garbage lands only in the junk tail rows
        # (valid pooled cells stop feed_rows-2 short of a group end)
        for t in range(9):
            ty, tx = t // 3, t % 3
            tap = srcs[tx] if ty == 0 else pltpu.roll(
                srcs[tx], n - ty * _LANES, axis=1)
            b_scr[t * 12:(t + 1) * 12, 0:n] = tap.astype(b_scr.dtype)
        y = jax.lax.dot_general(
            a1[...].astype(mxu_dt), b_scr[0:108, 0:n].astype(mxu_dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [9*c1, n]
        y = y + b1[...]
        y = jnp.where(y >= 0, y, y * al1[...])
        pooled = None
        for sy in range(3):
            for sx in range(3):
                s = jax.lax.slice_in_dim(y, (sy * 3 + sx) * c1,
                                         (sy * 3 + sx + 1) * c1,
                                         axis=0)
                if sy in spec.edge_subs:
                    s = jnp.where(mr == 0.0, _NEG, s)
                if sx in spec.edge_subs:
                    s = jnp.where(mc == 0.0, _NEG, s)
                pooled = s if pooled is None else jnp.maximum(pooled,
                                                              s)
        pr1 = pltpu.roll(pooled, n - 1, axis=1)
        pr2 = pltpu.roll(pooled, n - 2, axis=1)
        psrc = (pooled, pr1, pr2)
        for t in range(9):
            ty, tx = t // 3, t % 3
            tap = psrc[tx] if ty == 0 else pltpu.roll(
                psrc[tx], n - ty * _LANES, axis=1)
            b_scr[t * c1:(t + 1) * c1, 0:n] = tap.astype(b_scr.dtype)
        y2 = jax.lax.dot_general(
            w2[...].astype(mxu_dt),
            b_scr[0:9 * c1, 0:n].astype(mxu_dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y2 = y2 + b2[...]
        y2 = jnp.where(y2 >= 0, y2, y2 * al2[...])
        out_ref[0, :, pl.ds(o, n)] = y2.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, chunks, body, 0)


def pack_crops(crops, spec, dtype):
    """[N, size, size, 3] normalized crops -> [G, 12, feed_rows*128]
    s2d flat-lane feed (N must divide by per_row)."""
    n, size, _, _ = crops.shape
    sg, pr, bl = spec.sg, spec.per_row, spec.block
    x = crops.astype(dtype).reshape(n, sg, 2, sg, 2, 3)
    x = x.transpose(0, 2, 4, 5, 1, 3)          # [N, 2, 2, 3, sg, sg]
    x = x.reshape(n, 12, sg, sg)
    g = n // pr
    x = x.reshape(g, pr, 12, sg, sg).transpose(0, 2, 3, 1, 4)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0),
                    (0, bl - sg)))             # pad row + lane block
    return x.reshape(g, 12, spec.feed_rows * _LANES)


def crop_net_trunk(params, crops, spec, dtype=jnp.bfloat16,
                   interpret=False, r_groups=2, chunks=8):
    """Fused conv1+PReLU+ceil-pool1+conv2+PReLU on packed crops.

    crops: [N, size, size, 3] NORMALIZED (the caller applies the
    reference's (x-127.5)*0.0078125). Returns [N, c2_out, c2_out, c2]
    NHWC f32 — exactly the flax trunk's activation entering pool2.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    n = crops.shape[0]
    pad_n = (-n) % spec.per_row
    if pad_n:
        crops = jnp.pad(crops, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
    feed = pack_crops(crops, spec, dtype)
    g = feed.shape[0]
    r = min(r_groups, g)
    while g % r:
        r -= 1
    nc = min(chunks, g // r)
    while (g // r) % nc:
        nc -= 1
    steps = g // (r * nc)
    # [g, 12, gl] -> [steps, 12, nc*r*gl]: the groups must land on
    # the LANE axis (a bare reshape would interleave with channels)
    feed = feed.reshape(steps, nc * r, 12, spec.group_lanes)
    feed = feed.transpose(0, 2, 1, 3).reshape(
        steps, 12, nc * r * spec.group_lanes)
    weights = fold_crop_net_weights(params, spec)
    weights = [w.astype(dtype) if w.shape[1] > 1 else w
               for w in weights]
    mrow, mcol = _edge_masks(spec, r)
    n_step = nc * r * spec.group_lanes

    in_specs = [pl.BlockSpec((1, 12, n_step), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    for arr in weights + [mrow, mcol]:
        in_specs.append(pl.BlockSpec(
            arr.shape, partial(lambda i, _n=arr.ndim: (0,) * _n),
            memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        partial(_kernel, spec=spec, mxu=dtype, chunks=nc),
        grid=(steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, spec.c2, n_step),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps, spec.c2, n_step),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM(
            (9 * spec.c1, r * spec.group_lanes), dtype)],
        interpret=interpret,
    )(feed, *weights, mrow, mcol)

    # [steps, c2, nc*r*rows*128] -> [N, c2_out, c2_out, c2] NHWC
    pr, bl = spec.per_row, spec.block
    out = out.reshape(steps, spec.c2, nc * r, spec.feed_rows, pr, bl)
    out = out[:, :, :, :spec.c2_out, :, :spec.c2_out]
    out = out.transpose(0, 2, 4, 3, 5, 1)  # [S, r, pr, rows, cols, c2]
    out = out.reshape(n + pad_n, spec.c2_out, spec.c2_out, spec.c2)
    return out[:n] if pad_n else out


def _prelu_p(x, alpha):
    return jnp.where(x >= 0, x, x * alpha)


def rnet_apply_fused(variables, crops_norm, dtype=jnp.bfloat16,
                     interpret=False):
    """Full RNet on normalized crops via the fused trunk + XLA tail.
    Matches models.mtcnn.RNet.apply: returns (reg [N,4], prob [N,2])."""
    from ..models.mtcnn import max_pool_ceil

    p = variables["params"]
    t = crop_net_trunk(p, crops_norm, RNET_SPEC, dtype, interpret)
    t = t.astype(dtype)
    x = max_pool_ceil(t, 3, 2, ceil_mode=True)          # [N,4,4,48]
    x = jax.lax.conv_general_dilated(
        x, p["conv3"]["kernel"].astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["conv3"]["bias"].astype(dtype)
    x = _prelu_p(x, p["prelu3"]["alpha"].astype(dtype))  # [N,3,3,64]
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(x.shape[0], -1)
    x = x.astype(jnp.float32)
    x = x @ p["dense4"]["kernel"] + p["dense4"]["bias"]
    x = _prelu_p(x, p["prelu4"]["alpha"])
    a = x @ p["dense5_1"]["kernel"] + p["dense5_1"]["bias"]
    a = jax.nn.softmax(a, axis=-1)
    b = x @ p["dense5_2"]["kernel"] + p["dense5_2"]["bias"]
    return b, a


def onet_apply_fused(variables, crops_norm, dtype=jnp.bfloat16,
                     interpret=False):
    """Full ONet via the fused trunk + XLA tail. Matches
    models.mtcnn.ONet.apply: returns (reg, landmarks, prob)."""
    from ..models.mtcnn import max_pool_ceil

    p = variables["params"]
    # r_groups=1: ONet's 25-row groups at 288 subposition channels
    # already fill ~11 MB of VMEM per step
    t = crop_net_trunk(p, crops_norm, ONET_SPEC, dtype, interpret,
                       r_groups=1)
    t = t.astype(dtype)
    x = max_pool_ceil(t, 3, 2, ceil_mode=True)          # [N,10,10,64]
    x = jax.lax.conv_general_dilated(
        x, p["conv3"]["kernel"].astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["conv3"]["bias"].astype(dtype)
    x = _prelu_p(x, p["prelu3"]["alpha"].astype(dtype))  # [N,8,8,64]
    x = max_pool_ceil(x, 2, 2, ceil_mode=True)           # [N,4,4,64]
    x = jax.lax.conv_general_dilated(
        x, p["conv4"]["kernel"].astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["conv4"]["bias"].astype(dtype)
    x = _prelu_p(x, p["prelu4"]["alpha"].astype(dtype))  # [N,3,3,128]
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(x.shape[0], -1)
    x = x.astype(jnp.float32)
    x = x @ p["dense5"]["kernel"] + p["dense5"]["bias"]
    x = _prelu_p(x, p["prelu5"]["alpha"])
    a = x @ p["dense6_1"]["kernel"] + p["dense6_1"]["bias"]
    a = jax.nn.softmax(a, axis=-1)
    b = x @ p["dense6_2"]["kernel"] + p["dense6_2"]["bias"]
    c = x @ p["dense6_3"]["kernel"] + p["dense6_3"]["bias"]
    return b, c, a
