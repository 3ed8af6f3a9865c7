"""MTCNN cascade face detector, TPU-native.

Reference behaviour: /root/reference/models/mtcnn.py (P/R/O-net modules,
MTCNN.detect/select_boxes/extract/inference) and models/mtcnn_utils/
detect_face.py:25-185 (scale pyramid, three cascade stages, NMS chain,
landmark decode). Same architecture, thresholds and box math — but the
engine is redesigned for XLA:

  * The reference loops in Python per scale, per box and per image, with
    device<->host round trips at every NMS. Here the WHOLE cascade is a
    single jitted program per (batch, height, width) signature.
  * Data-dependent box counts become fixed CAPACITIES with validity
    masks: top-K per pyramid scale after PNet, ``rnet_cap`` candidates
    into stage 2, ``onet_cap`` into stage 3, ``out_cap`` final faces.
    Capacities are config knobs; thresholded-out or NMS-suppressed rows
    simply carry valid=False and ride along at zero marginal cost.
  * The per-box Python crop loops (detect_face.py:109-112,138-141)
    become one batched bilinear crop-resize gather over the padded
    candidate set; pyramid resizes are exact "area" resampling expressed
    as two MXU matmul contractions (ops/image.area_resize).
  * All three NMS variants (per-scale 0.5 / cross-scale+stage-2 0.7 IoU,
    stage-3 0.7 "Min" with the +1 area convention) run on device via the
    masked O(K^2) formulation in ops/boxes.

Weights: the reference ships pnet/rnet/onet torch state_dicts in-repo
(models/weights_mtcnn/*.pt); ``load_mtcnn_variables`` converts them via
models/torch_convert (tools/convert_weights.py caches the converted
npz so torch is only needed once).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..ops import boxes as B
from ..ops.image import (
    area_resize,
    grouped_crop_area_resize,
    pyramid_area_resize,
)
from .layers import PReLU, coerce_dtype, max_pool_ceil


# ---------------------------------------------------------------------------
# The three cascade networks (architectures per reference mtcnn.py:9-157)
# ---------------------------------------------------------------------------


class PNet(nn.Module):
    """Proposal net: fully-convolutional 12x12 face scorer."""

    dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(10, (3, 3), padding="VALID", name="conv1")(x)
        x = PReLU(10, name="prelu1")(x)
        x = max_pool_ceil(x, 2, 2, ceil_mode=True)
        x = nn.Conv(16, (3, 3), padding="VALID", name="conv2")(x)
        x = PReLU(16, name="prelu2")(x)
        x = nn.Conv(32, (3, 3), padding="VALID", name="conv3")(x)
        x = PReLU(32, name="prelu3")(x)
        a = nn.Conv(2, (1, 1), padding="VALID", name="conv4_1")(x)
        a = nn.softmax(a, axis=-1)
        b = nn.Conv(4, (1, 1), padding="VALID", name="conv4_2")(x)
        return b, a


class RNet(nn.Module):
    """Refinement net on 24x24 crops."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(28, (3, 3), padding="VALID", name="conv1")(x)
        x = PReLU(28, name="prelu1")(x)
        x = max_pool_ceil(x, 3, 2, ceil_mode=True)
        x = nn.Conv(48, (3, 3), padding="VALID", name="conv2")(x)
        x = PReLU(48, name="prelu2")(x)
        x = max_pool_ceil(x, 3, 2, ceil_mode=True)
        x = nn.Conv(64, (2, 2), padding="VALID", name="conv3")(x)
        x = PReLU(64, name="prelu3")(x)
        # torch flattens NCHW permuted to (N, W, H, C); our NHWC needs the
        # same (W, H, C) element order for dense4 weight parity
        # (reference mtcnn.py:93-94).
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(x.shape[0], -1)
        x = nn.Dense(128, name="dense4")(x)
        x = PReLU(128, name="prelu4")(x)
        a = nn.Dense(2, name="dense5_1")(x)
        a = nn.softmax(a, axis=-1)
        b = nn.Dense(4, name="dense5_2")(x)
        return b, a


class ONet(nn.Module):
    """Output net on 48x48 crops; adds 5-point landmarks."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (3, 3), padding="VALID", name="conv1")(x)
        x = PReLU(32, name="prelu1")(x)
        x = max_pool_ceil(x, 3, 2, ceil_mode=True)
        x = nn.Conv(64, (3, 3), padding="VALID", name="conv2")(x)
        x = PReLU(64, name="prelu2")(x)
        x = max_pool_ceil(x, 3, 2, ceil_mode=True)
        x = nn.Conv(64, (3, 3), padding="VALID", name="conv3")(x)
        x = PReLU(64, name="prelu3")(x)
        x = max_pool_ceil(x, 2, 2, ceil_mode=True)
        x = nn.Conv(128, (2, 2), padding="VALID", name="conv4")(x)
        x = PReLU(128, name="prelu4")(x)
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(x.shape[0], -1)
        x = nn.Dense(256, name="dense5")(x)
        x = PReLU(256, name="prelu5")(x)
        a = nn.Dense(2, name="dense6_1")(x)
        a = nn.softmax(a, axis=-1)
        b = nn.Dense(4, name="dense6_2")(x)
        c = nn.Dense(10, name="dense6_3")(x)
        return b, c, a


# ---------------------------------------------------------------------------
# Weight loading
# ---------------------------------------------------------------------------

# vendored npz first; an optional reference checkout (for torch-.pt
# conversion experiments) only via the VN_REFERENCE_DIR env var
_DEFAULT_WEIGHT_SOURCES = tuple(
    p for p in (
        os.path.join(os.path.dirname(__file__), "weights_mtcnn"),
        os.path.join(os.environ.get("VN_REFERENCE_DIR", ""),
                     "models", "weights_mtcnn")
        if os.environ.get("VN_REFERENCE_DIR") else None,
    ) if p
)


def load_mtcnn_variables(weights_dir=None):
    """Load the published pnet/rnet/onet torch weights and convert.

    Looks for converted ``{p,r,o}net.npz`` first (written by
    tools/convert_weights.py), then falls back to torch ``.pt`` files.
    Returns dict of flax variables per net, or None if nothing found.
    """
    from .torch_convert import convert_state_dict, load_torch_checkpoint

    dirs = [weights_dir] if weights_dir else list(_DEFAULT_WEIGHT_SOURCES)
    for d in dirs:
        if d is None or not os.path.isdir(d):
            continue
        out = {}
        ok = True
        for net in ("pnet", "rnet", "onet"):
            npz = os.path.join(d, f"{net}.npz")
            pt = os.path.join(d, f"{net}.pt")
            if os.path.exists(npz):
                loaded = np.load(npz)
                sd = {k: loaded[k] for k in loaded.files}
                out[net] = convert_state_dict(sd)
            elif os.path.exists(pt):
                out[net] = convert_state_dict(load_torch_checkpoint(pt))
            else:
                ok = False
                break
        if ok:
            return out
    return None


# ---------------------------------------------------------------------------
# Cascade engine
# ---------------------------------------------------------------------------


def _normalize(x):
    return (x - 127.5) * 0.0078125  # detect_face.py:72,114,143


def _stage1_boxes(score, reg, scale, h_cells, w_cells, threshold):
    """Dense PNet outputs -> candidate boxes (generateBoundingBox,
    detect_face.py:203-218). score [B, h, w], reg [B, h, w, 4]."""
    stride, cellsize = 2.0, 12.0
    jj = jnp.arange(w_cells, dtype=jnp.float32)[None, :]
    ii = jnp.arange(h_cells, dtype=jnp.float32)[:, None]
    q1x = jnp.floor((stride * jj + 1.0) / scale)
    q1y = jnp.floor((stride * ii + 1.0) / scale)
    q2x = jnp.floor((stride * jj + cellsize) / scale)
    q2y = jnp.floor((stride * ii + cellsize) / scale)
    b = score.shape[0]
    n = h_cells * w_cells
    boxes = jnp.stack(
        [
            jnp.broadcast_to(q1x, (h_cells, w_cells)),
            jnp.broadcast_to(q1y, (h_cells, w_cells)),
            jnp.broadcast_to(q2x, (h_cells, w_cells)),
            jnp.broadcast_to(q2y, (h_cells, w_cells)),
        ],
        axis=-1,
    ).reshape(1, n, 4)
    boxes = jnp.broadcast_to(boxes, (b, n, 4))
    score = score.reshape(b, n)
    reg = reg.reshape(b, n, 4)
    valid = score >= threshold
    return boxes, score, reg, valid


def _stage1_bbreg(boxes, reg):
    """Stage-1 regression WITHOUT the +1 width convention
    (detect_face.py:96-102)."""
    regw = boxes[..., 2] - boxes[..., 0]
    regh = boxes[..., 3] - boxes[..., 1]
    return jnp.stack(
        [
            boxes[..., 0] + reg[..., 0] * regw,
            boxes[..., 1] + reg[..., 1] * regh,
            boxes[..., 2] + reg[..., 2] * regw,
            boxes[..., 3] + reg[..., 3] * regh,
        ],
        axis=-1,
    )


def _space_to_depth2(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C]; channel = p*2C + q*C + c for
    row/col parities (p, q). H, W must be even."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _fused_pnet_apply(pvars, x, cdtype):
    """PNet with conv1+PReLU+ceil-pool fused into ONE space-to-depth
    2x2 conv — numerically exact, MXU-shaped.

    The stock PNet spends its time in a [.., 3]->[.., 10] 3x3 conv at
    FULL pyramid resolution followed by a 2x2 ceil-mode max pool:
    tiny contraction (27), tiny output lane dim (10), and the biggest
    intermediate of the whole cascade ([B, H-2, W-2, 10]) written then
    immediately 4:1-reduced. Fusing pool into conv1: every pooled cell
    (i, j) maxes the 4 conv outputs at (2i+di, 2j+dj), and all four
    read input rows/cols 2i..2i+4 — i.e. one 2x2 kernel over the
    space-to-depth input (12 channels) computing all 4 sub-position
    outputs (40 channels) at POOLED resolution. PReLU is elementwise
    (broadcast over the 4 sub-positions) and torch's ceil-mode pool
    ignores out-of-range positions, which becomes a static -inf mask
    on the sub-position axis before the max. 4x fewer output
    positions, 48-wide contraction, 40-wide lanes, and the hot
    intermediate shrinks ~4x. conv2/conv3/heads are unchanged
    (reference mtcnn.py:9-49 semantics throughout).
    """
    p = pvars["params"]
    w1 = p["conv1"]["kernel"].astype(cdtype)  # [3, 3, 3, 10]
    b1 = p["conv1"]["bias"].astype(cdtype)
    a1 = p["prelu1"]["alpha"].astype(cdtype)

    bsz, h, w, _ = x.shape
    h1, w1o = h - 2, w - 2  # conv1 VALID output
    hp, wp = -(-h1 // 2), -(-w1o // 2)  # ceil-pool output
    he, we = 2 * hp + 2, 2 * wp + 2
    x = jnp.pad(x, ((0, 0), (0, he - h), (0, we - w), (0, 0)))

    # scatter the 3x3x3->10 taps into the 2x2x12->40 s2d kernel:
    # sub-position (di, dj) tap (ky, kx) lands at s2d cell
    # ((di+ky)//2, (dj+kx)//2), channel parity ((di+ky)%2, (dj+kx)%2)
    w2 = jnp.zeros((2, 2, 12, 4, 10), cdtype)
    for di in range(2):
        for dj in range(2):
            for ky in range(3):
                for kx in range(3):
                    r, c = di + ky, dj + kx
                    ch0 = (r % 2) * 6 + (c % 2) * 3
                    w2 = w2.at[r // 2, c // 2, ch0:ch0 + 3,
                               di * 2 + dj, :].set(w1[ky, kx])
    w2 = w2.reshape(2, 2, 12, 40)

    y = jax.lax.conv_general_dilated(
        _space_to_depth2(x), w2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, hp, wp, 40]
    y = y.reshape(bsz, hp, wp, 4, 10) + b1
    y = jnp.where(y >= 0, y, a1 * y)  # PReLU
    # ceil-mode pool: drop sub-positions past the conv output edge
    # sub-position q = di*2 + dj -> row offsets [0,0,1,1],
    # col offsets [0,1,0,1]
    sub_r = jnp.arange(hp)[:, None] * 2 + jnp.array([0, 0, 1, 1])
    sub_c = jnp.arange(wp)[:, None] * 2 + jnp.array([0, 1, 0, 1])
    mask = (sub_r[:, None, :] < h1) & (sub_c[None, :, :] < w1o)
    y = jnp.where(mask[None, :, :, :, None], y,
                  jnp.asarray(-jnp.inf, y.dtype))
    y = y.max(axis=3)  # [B, hp, wp, 10]

    def conv(name, v, kernel_valid=True):
        return jax.lax.conv_general_dilated(
            v, p[name]["kernel"].astype(cdtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p[name]["bias"].astype(cdtype)

    def prelu(v, name):
        a = p[name]["alpha"].astype(cdtype)
        return jnp.where(v >= 0, v, a * v)

    y = prelu(conv("conv2", y), "prelu2")
    y = prelu(conv("conv3", y), "prelu3")
    a = jax.nn.softmax(conv("conv4_1", y), axis=-1)
    b = conv("conv4_2", y)
    return b, a


class MTCNN:
    """Batched MTCNN detector with the reference's public surface.

    Constructor args mirror reference mtcnn.py:200-227 (margin,
    min_face_size, thresholds, factor, post_process, select_largest,
    selection_method, keep_all); capacity knobs are new and bound the
    padded candidate sets per stage.
    """

    def __init__(
        self,
        image_size=160,
        margin=0,
        min_face_size=20,
        thresholds=(0.6, 0.7, 0.7),
        factor=0.709,
        post_process=True,
        select_largest=True,
        selection_method=None,
        keep_all=False,
        device=None,
        weights_dir=None,
        pnet_cap_per_scale=None,
        cross_cap=None,
        rnet_cap=None,
        onet_cap=None,
        out_cap=64,
        dtype=jnp.float32,
        fast_pnet=True,
        pallas_crops=None,
        fused_pyramid_pnet=None,
        fused_crop_nets=None,
    ):
        self.image_size = image_size
        self.margin = margin
        self.min_face_size = min_face_size
        self.thresholds = tuple(thresholds)
        self.factor = factor
        self.post_process = post_process
        self.select_largest = select_largest
        self.keep_all = keep_all
        self.selection_method = selection_method or (
            "largest" if select_largest else "probability"
        )
        # capacity knobs: None = auto — the 640x640-tuned base profile
        # scaled UP with frame area (candidate counts grow ~linearly
        # with pixels; a 1080p crowd must not silently lean on top-k
        # ordering at 640x640-sized caps). Explicit values are used
        # verbatim. out_cap stays static: it is the engine's per-frame
        # output contract, not an intermediate buffer.
        self.pnet_cap_per_scale = pnet_cap_per_scale
        self.cross_cap = cross_cap
        self.rnet_cap = rnet_cap
        self.onet_cap = onet_cap
        self.out_cap = out_cap
        self.dtype = coerce_dtype(dtype)
        # fuse conv1+PReLU+ceil-pool into one space-to-depth conv in
        # the cascade's stage 1 (numerically exact; see
        # _fused_pnet_apply)
        self.fast_pnet = fast_pnet
        # RNet/ONet crops via the VMEM-resident Pallas kernel (exact;
        # ops/crop_pallas.py). Default OFF: measured on v5e the kernel
        # runs the crops in 1.5 ms vs the XLA einsums' 1.8 ms, but the
        # NHWC->planes transpose it needs (+0.3 ms) and the output
        # relayout cancel the win inside the fused engine (bench
        # 10011 vs 10560 faces/sec) — XLA already overlaps the
        # intermediate's HBM traffic with neighbouring work. Kept as
        # an opt-in backend for standalone crop workloads.
        self.pallas_crops = bool(pallas_crops)
        # stage 1 as phase-split resize GEMMs + ONE Pallas kernel for
        # every level's full PNet conv chain (ops/pyramid_pnet_pallas;
        # measured 2.29 ms -> ~0 ms net on the 32x640x640 bench
        # shapes). None = auto: on for TPU, off elsewhere — the CPU
        # backend would run the kernel through the (slow) interpreter,
        # and parity with the default path is pinned by
        # tests/test_pyramid_pnet.py anyway.
        if fused_pyramid_pnet is None:
            # mirrors the kernels' interpret gate: any non-CPU backend
            # (tpu, or this rig's "axon" relay) runs Mosaic natively
            fused_pyramid_pnet = jax.default_backend() != "cpu"
        self.fused_pyramid_pnet = bool(fused_pyramid_pnet)
        # RNet/ONet trunks as fused conv+pool GEMM Pallas kernels
        # (ops/crops_net_pallas). Default OFF — measured and REJECTED
        # on the v5e: the bench cascade regressed 5.96 -> 9.0-9.7 ms
        # (both an unrolled-chunk and a fori-loop variant). The
        # subposition-GEMM formulation that won for PNet loses here:
        # these nets are VPU-bound, and materialising 9 subposition
        # maps moves ~2x more data than XLA's plain conv+pool while
        # there is no resolution level or per-level dispatch to
        # eliminate. Kept parity-tested as the pattern's measured
        # negative boundary (tests/test_crops_net_pallas.py).
        self.fused_crop_nets = bool(fused_crop_nets)

        self.pnet = PNet()
        self.rnet = RNet()
        self.onet = ONet()
        variables = load_mtcnn_variables(weights_dir)
        if variables is None:
            # random init (tests/training-from-scratch path)
            key = jax.random.PRNGKey(0)
            variables = {
                "pnet": self.pnet.init(key, jnp.zeros((1, 12, 12, 3))),
                "rnet": self.rnet.init(key, jnp.zeros((1, 24, 24, 3))),
                "onet": self.onet.init(key, jnp.zeros((1, 48, 48, 3))),
            }
        self.variables = variables
        self._jit_cache = {}

    # -- scale pyramid (detect_face.py:50-60) ---------------------------

    def _scales(self, h, w):
        m = 12.0 / self.min_face_size
        minl = min(h, w) * m
        scales = []
        scale = m
        while minl >= 12.0:
            scales.append(scale)
            scale *= self.factor
            minl *= self.factor
        return scales

    # -- capacity profile ----------------------------------------------

    # base per-stage caps, tuned on 640x640 frames (bench.py / the
    # STATUS.md chunk budget table)
    _BASE_CAPS = {
        "pnet_cap_per_scale": 448,
        "cross_cap": 512,
        "rnet_cap": 256,
        "onet_cap": 128,
    }
    _BASE_CAP_AREA = 640.0 * 640.0

    def capacity_profile(self, h, w):
        """Effective per-stage caps for an ``h`` x ``w`` frame.

        Auto knobs (left as None) scale the base profile linearly with
        frame area above the 640x640 tuning point, rounded up to a
        multiple of 64 (top-k/NMS tile friendliness) and clamped at 8x
        — a 1920x1080 frame gets rnet_cap 1344 instead of silently
        truncating a 50+ face crowd at 256. Smaller frames keep the
        base profile (caps never shrink below it)."""
        area_scale = min(max(1.0, (h * w) / self._BASE_CAP_AREA), 8.0)
        caps = {}
        for name, base in self._BASE_CAPS.items():
            explicit = getattr(self, name)
            if explicit is not None:
                caps[name] = int(explicit)
            elif area_scale <= 1.0:
                caps[name] = base
            else:
                caps[name] = int(-(-base * area_scale // 64) * 64)
        caps["out_cap"] = int(self.out_cap)
        return caps

    # -- the jitted cascade --------------------------------------------

    def _build_detect_fn(self, batch, h, w, _upto=None):
        # _upto: profiling checkpoints — "s1" returns after the
        # stage-1 box chain (pre-crops), "s2" after RNet + its NMS/
        # bbreg/cap. tools/profile_cascade.py uses these to attribute
        # the cascade's per-stage cost; None (production) is the full
        # cascade.
        scales = self._scales(h, w)
        thr = self.thresholds
        caps = self.capacity_profile(h, w)
        self._last_caps = caps
        k1 = caps["pnet_cap_per_scale"]
        kx = caps["cross_cap"]
        k2 = caps["rnet_cap"]
        k3 = caps["onet_cap"]
        kout = caps["out_cap"]
        pnet, rnet, onet = self.pnet, self.rnet, self.onet
        cdtype = self.dtype  # compute dtype for resizes + nets; box
        # math and scores stay f32
        if self.pallas_crops:
            from ..ops.crop_pallas import grouped_crop_area_resize_pallas
            crop_fn = grouped_crop_area_resize_pallas
        else:
            crop_fn = grouped_crop_area_resize

        def net_apply(net, var, x):
            if cdtype != jnp.float32:
                var = jax.tree_util.tree_map(
                    lambda a: a.astype(cdtype), var
                )
            out = net.apply(var, x.astype(cdtype))
            return jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32), out
            )

        def detect(variables, imgs_u8):
            imgs = imgs_u8.astype(jnp.float32)
            all_boxes, all_scores, all_regs, all_valid = [], [], [], []
            # per-stage max valid count BEFORE each capacity cap; the
            # host compares these to the caps and warns on saturation
            sat_s1 = jnp.zeros((), jnp.int32)

            # ---- stage 1: pyramid + PNet + per-scale NMS(0.5) ----
            # all levels' resizes in one plane-major pass (the naive
            # per-level channels-minor einsums cost ~4 ms/chunk alone)
            level_sizes = [
                (int(h * s + 1), int(w * s + 1)) for s in scales
            ]
            # hybrid per-level split: levels wider than the fused
            # kernel's one-row-per-128-lane layout (big frames with
            # small min_face_size) run through the per-level XLA path
            # — where XLA's big convs are efficient anyway — while
            # the tail of small levels (where per-level dispatch and
            # lane padding dominated) goes through the ONE fused
            # kernel. supports() decides per level.
            level_maps = {}
            if self.fused_pyramid_pnet:
                from ..ops.pyramid_pnet_pallas import (
                    pyramid_pnet,
                    supports as _pp_ok,
                )
                narrow = [i for i in range(len(scales))
                          if _pp_ok(level_sizes[i:i + 1])]
                if narrow:
                    maps = pyramid_pnet(
                        variables["pnet"], imgs,
                        [level_sizes[i] for i in narrow], dtype=cdtype
                    )
                    level_maps = dict(zip(narrow, maps))
            wide = [i for i in range(len(scales)) if i not in level_maps]
            if wide:
                pyr_wide = pyramid_area_resize(
                    imgs.astype(cdtype),
                    [level_sizes[i] for i in wide]
                )
                pyramid = dict(zip(wide, pyr_wide))
            for li, scale in enumerate(scales):
                if li in level_maps:
                    probs1, reg = level_maps[li]
                elif self.fast_pnet:
                    reg, probs = _fused_pnet_apply(
                        variables["pnet"],
                        _normalize(pyramid[li]).astype(cdtype), cdtype,
                    )
                    reg = reg.astype(jnp.float32)
                    probs1 = probs[..., 1].astype(jnp.float32)
                else:
                    reg, probs = net_apply(
                        pnet, variables["pnet"],
                        _normalize(pyramid[li])
                    )
                    probs1 = probs[..., 1]
                hc, wc = reg.shape[1], reg.shape[2]
                boxes, score, reg, valid = _stage1_boxes(
                    probs1, reg, scale, hc, wc, thr[0]
                )
                if valid.shape[-1] >= k1:
                    sat_s1 = jnp.maximum(
                        sat_s1, valid.sum(-1).max().astype(jnp.int32)
                    )
                # cap per scale by score
                def cap_one(bx, sc, rg, vl):
                    idx, still = B.top_k_select(sc, vl, min(k1, sc.shape[0]))
                    return bx[idx], sc[idx], rg[idx], still

                boxes, score, reg, valid = jax.vmap(cap_one)(
                    boxes, score, reg, valid
                )
                all_boxes.append(boxes)
                all_scores.append(score)
                all_regs.append(reg)
                all_valid.append(valid)

            # per-scale NMS(0.5) for ALL scales in ONE batched call:
            # scales are independent, so folding them into the vmapped
            # batch axis replaces S sequential while-loops (each paying
            # its own convergence-round latency) with one. Small pyramid
            # levels are padded to k1 with invalid rows first.
            def pad_k1(a, fill):
                padn = k1 - a.shape[1]
                if padn <= 0:
                    return a
                cfg = [(0, 0), (0, padn)] + [(0, 0)] * (a.ndim - 2)
                return jnp.pad(a, cfg, constant_values=fill)

            ns = len(scales)
            boxes = jnp.stack([pad_k1(a, 0.0) for a in all_boxes], 1)
            score = jnp.stack([pad_k1(a, 0.0) for a in all_scores], 1)
            reg = jnp.stack([pad_k1(a, 0.0) for a in all_regs], 1)
            valid = jnp.stack([pad_k1(a, False) for a in all_valid], 1)
            keep = B.batched_nms_keep_mask(
                boxes.reshape(batch * ns, k1, 4),
                score.reshape(batch * ns, k1),
                valid.reshape(batch * ns, k1),
                0.5,
            ).reshape(batch, ns, k1)
            valid = valid & keep

            boxes = boxes.reshape(batch, ns * k1, 4)
            score = score.reshape(batch, ns * k1)
            reg = reg.reshape(batch, ns * k1, 4)
            valid = valid.reshape(batch, ns * k1)

            # cap total candidates before the cross-scale NMS: only a
            # handful survive the per-scale NMS, so the top-kx by score
            # are lossless while the [K,K] IoU work drops ~(S*k1/kx)^2
            sat_cross = valid.sum(-1).max().astype(jnp.int32)

            def cap_cross(bx, sc, rg, vl):
                idx, still = B.top_k_select(sc, vl, kx)
                return bx[idx], sc[idx], rg[idx], still

            boxes, score, reg, valid = jax.vmap(cap_cross)(
                boxes, score, reg, valid
            )

            # ---- cross-scale NMS(0.7) + cap to rnet capacity ----
            keep = B.batched_nms_keep_mask(boxes, score, valid, 0.7)
            valid = valid & keep
            sat_rnet = valid.sum(-1).max().astype(jnp.int32)

            def cap2(bx, sc, rg, vl):
                idx, still = B.top_k_select(sc, vl, k2)
                return bx[idx], sc[idx], rg[idx], still

            boxes, score, reg, valid = jax.vmap(cap2)(boxes, score, reg,
                                                      valid)
            boxes = _stage1_bbreg(boxes, reg)
            boxes = B.rerec(boxes)
            if _upto == "s1":
                return boxes, score, valid

            # ---- stage 2: batched 24x24 crops + RNet ----
            # crop coords are clamped ints (the reference's pad()), but
            # the box math below keeps the unclamped floats; crops are
            # exact adaptive-area pooling as 0/1-mask matmuls
            crop_boxes = B.clamp_boxes(boxes, w, h)
            crops = crop_fn(imgs, crop_boxes, 24)
            crops = crops.reshape(batch * k2, 24, 24, 3)
            if self.fused_crop_nets:
                from ..ops.crops_net_pallas import rnet_apply_fused
                r_reg, r_prob = rnet_apply_fused(
                    variables["rnet"], _normalize(crops), cdtype)
                r_reg = r_reg.astype(jnp.float32)
                r_prob = r_prob.astype(jnp.float32)
            else:
                r_reg, r_prob = net_apply(rnet, variables["rnet"],
                                          _normalize(crops))
            r_score = r_prob[:, 1].reshape(batch, k2)
            r_reg = r_reg.reshape(batch, k2, 4)
            valid = valid & (r_score > thr[1])
            keep = B.batched_nms_keep_mask(boxes, r_score, valid, 0.7)
            valid = valid & keep
            boxes = B.bbreg(boxes, r_reg)
            boxes = B.rerec(boxes)
            sat_onet = valid.sum(-1).max().astype(jnp.int32)

            def cap3(bx, sc, vl):
                idx, still = B.top_k_select(sc, vl, k3)
                return bx[idx], sc[idx], still

            boxes, score, valid = jax.vmap(cap3)(boxes, r_score, valid)
            if _upto == "s2":
                return boxes, score, valid

            # ---- stage 3: batched 48x48 crops + ONet ----
            crop_boxes = B.clamp_boxes(boxes, w, h)
            crops = crop_fn(imgs, crop_boxes, 48)
            crops = crops.reshape(batch * k3, 48, 48, 3)
            if self.fused_crop_nets:
                from ..ops.crops_net_pallas import onet_apply_fused
                o_reg, o_landm, o_prob = onet_apply_fused(
                    variables["onet"], _normalize(crops), cdtype)
                o_reg = o_reg.astype(jnp.float32)
                o_landm = o_landm.astype(jnp.float32)
                o_prob = o_prob.astype(jnp.float32)
            else:
                o_reg, o_landm, o_prob = net_apply(
                    onet, variables["onet"], _normalize(crops)
                )
            o_score = o_prob[:, 1].reshape(batch, k3)
            o_reg = o_reg.reshape(batch, k3, 4)
            o_landm = o_landm.reshape(batch, k3, 10)
            valid = valid & (o_score > thr[2])

            # landmark decode BEFORE bbreg, on the unclamped boxes
            # (detect_face.py:159-163)
            bw = boxes[..., 2] - boxes[..., 0] + 1.0
            bh = boxes[..., 3] - boxes[..., 1] + 1.0
            pts_x = bw[..., None] * o_landm[..., :5] + boxes[..., 0:1] - 1.0
            pts_y = bh[..., None] * o_landm[..., 5:10] + boxes[..., 1:2] - 1.0
            points = jnp.stack([pts_x, pts_y], axis=-1)  # [B, K, 5, 2]

            boxes = B.bbreg(boxes, o_reg)
            keep = B.batched_nms_keep_mask(
                boxes, o_score, valid, 0.7, offset=1.0, min_mode=True
            )
            valid = valid & keep
            sat_out = valid.sum(-1).max().astype(jnp.int32)

            def cap_out(bx, sc, pt, vl):
                idx, still = B.top_k_select(sc, vl, kout)
                return bx[idx], sc[idx], pt[idx], still

            boxes, score, points, valid = jax.vmap(cap_out)(
                boxes, o_score, points, valid
            )
            # 5th output: per-stage max valid counts before each cap
            # (host warns when a count reaches its cap). Consumers that
            # only need detections slice [:4].
            sat = jnp.stack([sat_s1, sat_cross, sat_rnet, sat_onet,
                             sat_out])
            return boxes, score, points, valid, sat

        return jax.jit(detect)

    def _detect_padded(self, imgs_u8):
        batch, h, w = imgs_u8.shape[:3]
        key = (batch, h, w)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build_detect_fn(batch, h, w)
        return self._jit_cache[key](self.variables, imgs_u8)

    _SAT_STAGES = ("pnet_cap_per_scale", "cross_cap", "rnet_cap",
                   "onet_cap", "out_cap")

    def warn_capacity_saturation(self, sat_counts, hw=None):
        """Warn when any stage's pre-cap valid count reached its
        capacity knob — the top-k cap then silently drops the
        lowest-score candidates. ``sat_counts`` is the cascade's 5th
        output (per-stage max counts). ``hw`` is the frame (height,
        width) the counts came from — the caps scale with frame area
        (capacity_profile), so callers juggling several frame shapes
        must pass it; without it the caps of the last-BUILT shape are
        used (wrong when a cached program for another shape ran)."""
        import warnings

        counts = np.asarray(sat_counts).reshape(-1)
        if hw is not None:
            cap_map = self.capacity_profile(int(hw[0]), int(hw[1]))
        else:
            cap_map = getattr(self, "_last_caps", None) or \
                self.capacity_profile(0, 0)
        caps = tuple(cap_map[name] for name in self._SAT_STAGES)
        saturated = []
        for name, count, cap in zip(self._SAT_STAGES, counts, caps):
            if int(count) >= cap:
                saturated.append((name, int(count), cap))
        for name, count, cap in saturated:
            warnings.warn(
                "MTCNN capacity saturated: {} candidates hit {}={} — "
                "detections may be truncated; raise the cap.".format(
                    count, name, cap
                ),
                RuntimeWarning,
                stacklevel=3,
            )
        return saturated

    # -- host-side API (parity with reference mtcnn.py:278-513) ---------

    @staticmethod
    def _as_batch(img):
        """Normalise PIL / ndarray / list input to (array [B,H,W,3],
        batch_mode flag)."""
        if isinstance(img, (list, tuple)):
            arrs = [np.asarray(x, dtype=np.uint8) for x in img]
            if any(a.shape != arrs[0].shape for a in arrs):
                raise Exception(
                    "MTCNN batch processing only compatible with "
                    "equal-dimension images."
                )
            return np.stack(arrs), True
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 3:
            return arr[None], False
        return arr, True

    def detect(self, img, landmarks=False):
        imgs, batch_mode = self._as_batch(img)
        b_boxes, b_score, b_points, b_valid, sat = jax.device_get(
            self._detect_padded(imgs)
        )
        self.warn_capacity_saturation(sat, hw=imgs.shape[1:3])
        boxes_out, probs_out, points_out = [], [], []
        for i in range(imgs.shape[0]):
            v = b_valid[i]
            if not v.any():
                boxes_out.append([])
                probs_out.append([])
                points_out.append([])
                continue
            bx = b_boxes[i][v]
            sc = b_score[i][v]
            pt = b_points[i][v]
            if self.select_largest:
                order = np.argsort(
                    (bx[:, 2] - bx[:, 0]) * (bx[:, 3] - bx[:, 1])
                )[::-1]
            else:
                order = np.argsort(sc)[::-1]
            boxes_out.append(bx[order])
            probs_out.append(sc[order])
            points_out.append(pt[order])

        boxes_np = np.array(boxes_out, dtype=object)
        probs_np = np.array(probs_out, dtype=object)
        points_np = np.array(points_out, dtype=object)
        if not batch_mode:
            boxes_np, probs_np, points_np = (
                boxes_out[0], probs_out[0], points_out[0]
            )
        if landmarks:
            return boxes_np, probs_np, points_np
        return boxes_np, probs_np

    def inference(self, rgb_image, landmark=True):
        """Reference mtcnn.py:511-513."""
        return self.detect(rgb_image, landmark)

    def select_boxes(self, all_boxes, all_probs, all_points, imgs,
                     method="probability", threshold=0.9,
                     center_weight=2.0):
        """Single-face selection heuristics (mtcnn.py:363-456)."""
        batch_mode = isinstance(imgs, (list, tuple)) or (
            isinstance(imgs, np.ndarray) and imgs.ndim == 4
        )
        if not batch_mode:
            imgs = [imgs]
            all_boxes = [all_boxes]
            all_probs = [all_probs]
            all_points = [all_points]

        sel_boxes, sel_probs, sel_points = [], [], []
        for boxes, points, probs, img in zip(all_boxes, all_points,
                                             all_probs, imgs):
            boxes = np.asarray(boxes)
            probs = np.asarray(probs)
            points = np.asarray(points)
            if len(boxes) == 0:
                sel_boxes.append(None)
                sel_probs.append([None])
                sel_points.append(None)
                continue
            if method == "largest":
                order = np.argsort(
                    (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
                )[::-1]
            elif method == "probability":
                order = np.argsort(probs)[::-1]
            elif method == "center_weighted_size":
                sizes = (boxes[:, 2] - boxes[:, 0]) * (
                    boxes[:, 3] - boxes[:, 1]
                )
                img_arr = np.asarray(img)
                center = (img_arr.shape[1] / 2, img_arr.shape[0] / 2)
                centers = np.stack(
                    [
                        (boxes[:, 0] + boxes[:, 2]) / 2,
                        (boxes[:, 1] + boxes[:, 3]) / 2,
                    ],
                    axis=1,
                )
                off2 = np.sum((centers - center) ** 2, axis=1)
                order = np.argsort(sizes - off2 * center_weight)[::-1]
            elif method == "largest_over_threshold":
                mask = probs > threshold
                if mask.sum() == 0:
                    sel_boxes.append(None)
                    sel_probs.append([None])
                    sel_points.append(None)
                    continue
                boxes, probs, points = boxes[mask], probs[mask], points[mask]
                order = np.argsort(
                    (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
                )[::-1]
            else:
                raise ValueError(f"Unknown selection method '{method}'")
            sel_boxes.append(boxes[order][[0]])
            sel_probs.append(probs[order][[0]])
            sel_points.append(points[order][[0]])

        if batch_mode:
            return (
                np.array(sel_boxes, dtype=object),
                np.array(sel_probs, dtype=object),
                np.array(sel_points, dtype=object),
            )
        return sel_boxes[0], sel_probs[0][0], sel_points[0]

    def extract(self, img, batch_boxes, save_path=None):
        """Crop faces to image_size with margin (mtcnn.py:458-509),
        returning float arrays [n, S, S, 3] (standardised when
        post_process=True). ``save_path`` writes the UN-standardised
        crops; extra faces get a ``_<i>`` suffix like the reference."""
        imgs, batch_mode = self._as_batch(img)
        if not batch_mode:
            batch_boxes = [batch_boxes]
        if save_path is not None and isinstance(save_path, str):
            save_path = [save_path]
        if save_path is None:
            save_path = [None] * imgs.shape[0]
        faces = []
        for i, box_im in enumerate(batch_boxes):
            if box_im is None or len(box_im) == 0:
                faces.append(None)
                continue
            box_im = np.asarray(box_im, dtype=np.float32)
            if not self.keep_all:
                box_im = box_im[[0]]
            face_list = []
            for j, box in enumerate(box_im):
                face = extract_face(
                    imgs[i], box, self.image_size, self.margin
                )
                path_im = save_path[i]
                if path_im is not None:
                    if j > 0:
                        stem, ext = os.path.splitext(path_im)
                        path_im = f"{stem}_{j + 1}{ext}"
                    from PIL import Image

                    os.makedirs(
                        os.path.dirname(os.path.abspath(path_im)),
                        exist_ok=True,
                    )
                    Image.fromarray(
                        np.clip(face, 0, 255).astype(np.uint8)
                    ).save(path_im)
                if self.post_process:
                    face = (face - 127.5) / 128.0
                face_list.append(face)
            faces.append(
                np.stack(face_list) if self.keep_all else face_list[0]
            )
        if not batch_mode:
            return faces[0]
        return faces

    def __call__(self, img, save_path=None, return_prob=False,
                 extract_face_flag=True):
        batch_boxes, batch_probs, batch_points = self.detect(
            img, landmarks=True
        )
        if not self.keep_all:
            batch_boxes, batch_probs, batch_points = self.select_boxes(
                batch_boxes, batch_probs, batch_points, img,
                method=self.selection_method,
            )
        faces = (
            self.extract(img, batch_boxes, save_path)
            if extract_face_flag else None
        )
        if return_prob:
            return faces, batch_boxes, batch_probs
        return faces, batch_boxes

    # torch-API no-op for drop-in compatibility
    def eval(self):
        return self


def extract_face(img, box, image_size=160, margin=0):
    """Crop + margin + area resize on the host (detect_face.py:342-377).
    img: uint8 [H, W, 3]; returns float32 [S, S, 3]."""
    from PIL import Image

    margin_px = [
        margin * (box[2] - box[0]) / (image_size - margin),
        margin * (box[3] - box[1]) / (image_size - margin),
    ] if margin else [0, 0]
    h, w = img.shape[:2]
    x1 = int(max(box[0] - margin_px[0] / 2, 0))
    y1 = int(max(box[1] - margin_px[1] / 2, 0))
    x2 = int(min(box[2] + margin_px[0] / 2, w))
    y2 = int(min(box[3] + margin_px[1] / 2, h))
    crop = img[y1:y2, x1:x2]
    pil = Image.fromarray(crop).resize(
        (image_size, image_size), Image.BILINEAR
    )
    return np.asarray(pil, dtype=np.float32)
