"""RetinaFace single-shot face detector, TPU-native.

Reference: /root/reference/models/retina_face.py (heads :20-52, model
:54-258) and retina_face_utils/components.py (MobileNetV1-0.25, FPN,
SSH). Architecture, anchor layout ([16,32]/[64,128]/[256,512] at strides
8/16/32, 2 anchors per cell, variances [0.1, 0.2]) and thresholds are
identical; the inference path is redesigned:

  * the reference regenerated priors with host-side itertools loops on
    EVERY call (retina_face.py:172-175) and ran decode->cpu->NumPy NMS
    per image (:177-227). Here priors are precomputed once per image
    size (ops/boxes.make_priors) and the whole batch decodes, filters,
    top-k's and NMS's on device in one jitted program with a fixed
    candidate capacity (``nms_cap``) and validity masks;
  * ``py_cpu_nms`` (+1 area convention) becomes the masked O(K^2) NMS
    kernel (ops/boxes.nms_keep_mask with offset=1.0);
  * NHWC layouts; module names mirror torch attributes (body.*, fpn.*,
    ssh1..3, ClassHead/BboxHead/LandmarkHead ModuleLists) so published
    checkpoints convert via models/torch_convert after a 'module.'
    prefix strip.

Capacity note: the reference NMS'd up to topk_bf_nms=5000 candidates;
a 5000x5000 IoU matrix per image is wasteful on any hardware. Candidates
ranked below ``nms_cap`` (default 1024) by score essentially never
survive the final vis_thres=0.6 cut; the cap is configurable for exact
sweeps.
"""

import os
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import boxes as B
from .layers import coerce_dtype
from .resnet_common import ResLayer, _bn as _res_bn


# ---------------------------------------------------------------------------
# Backbone configs (reference retina_face_utils/config.py)
# ---------------------------------------------------------------------------

cfg_mnet: Dict[str, Any] = {
    "name": "mobilenet0.25",
    "min_sizes": [[16, 32], [64, 128], [256, 512]],
    "steps": [8, 16, 32],
    "variance": [0.1, 0.2],
    "clip": False,
    "in_channel": 32,
    "out_channel": 64,
}

cfg_re50: Dict[str, Any] = {
    "name": "Resnet50",
    "min_sizes": [[16, 32], [64, 128], [256, 512]],
    "steps": [8, 16, 32],
    "variance": [0.1, 0.2],
    "clip": False,
    "in_channel": 256,
    "out_channel": 256,
}

_CONFIGS = {"cfg_mnet": cfg_mnet, "cfg_re50": cfg_re50}


# ---------------------------------------------------------------------------
# MobileNetV1-0.25 blocks (components.py:9-136)
# ---------------------------------------------------------------------------


class ConvBN(nn.Module):
    features: int
    stride: int = 1
    leaky: float = 0.0
    kernel: int = 3
    padding: int = 1
    relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.padding
        x = nn.Conv(self.features, (self.kernel,) * 2,
                    strides=(self.stride,) * 2,
                    padding=((p, p), (p, p)), use_bias=False,
                    dtype=self.dtype, name="0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="1")(x)
        if self.relu:
            x = nn.leaky_relu(x, negative_slope=self.leaky)
        return x


class ConvDW(nn.Module):
    """Depthwise-separable conv block (components.py:29-38)."""

    in_features: int
    out_features: int
    stride: int
    leaky: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = nn.Conv(self.in_features, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)),
                    feature_group_count=self.in_features, use_bias=False,
                    dtype=dt, name="0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=dt, name="1")(x)
        x = nn.leaky_relu(x, negative_slope=self.leaky)
        x = nn.Conv(self.out_features, (1, 1), use_bias=False, dtype=dt,
                    name="3")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=dt, name="4")(x)
        return nn.leaky_relu(x, negative_slope=self.leaky)


class MobileNetV1Stage(nn.Module):
    specs: Tuple[Tuple[str, int, int, int], ...]  # (kind, in, out, stride)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (kind, cin, cout, stride) in enumerate(self.specs):
            if kind == "conv_bn":
                x = ConvBN(cout, stride, leaky=0.1, dtype=self.dtype,
                           name=str(i))(x, train)
            else:
                x = ConvDW(cin, cout, stride, dtype=self.dtype,
                           name=str(i))(x, train)
        return x


_S1_SPECS = (
    ("conv_bn", 3, 8, 2),
    ("conv_dw", 8, 16, 1),
    ("conv_dw", 16, 32, 2),
    ("conv_dw", 32, 32, 1),
    ("conv_dw", 32, 64, 2),
    ("conv_dw", 64, 64, 1),
)
_S2_SPECS = (
    ("conv_dw", 64, 128, 2),
    ("conv_dw", 128, 128, 1),
    ("conv_dw", 128, 128, 1),
    ("conv_dw", 128, 128, 1),
    ("conv_dw", 128, 128, 1),
    ("conv_dw", 128, 128, 1),
)
_S3_SPECS = (("conv_dw", 128, 256, 2), ("conv_dw", 256, 256, 1))


class MobileNetV1Body(nn.Module):
    """The three stages tapped by the FPN (components.py:102-124)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        s1 = MobileNetV1Stage(_S1_SPECS, dtype=self.dtype,
                              name="stage1")(x, train)
        s2 = MobileNetV1Stage(_S2_SPECS, dtype=self.dtype,
                              name="stage2")(s1, train)
        s3 = MobileNetV1Stage(_S3_SPECS, dtype=self.dtype,
                              name="stage3")(s2, train)
        return s1, s2, s3


class MobileNetBodyFromS1(nn.Module):
    """Stages 2-3 only, fed a precomputed s1 — same param tree paths
    (``body/stage2``, ``body/stage3``) as the full body, so the one
    checkpoint serves both graphs."""

    dtype: Any = None

    @nn.compact
    def __call__(self, s1, train: bool = False):
        s2 = MobileNetV1Stage(_S2_SPECS, dtype=self.dtype,
                              name="stage2")(s1, train)
        s3 = MobileNetV1Stage(_S3_SPECS, dtype=self.dtype,
                              name="stage3")(s2, train)
        return s1, s2, s3


class ResNet50Body(nn.Module):
    """torchvision resnet50 trunk tapped at layer2/3/4
    (retina_face.py:86-90, return_layers)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=dt, name="conv1")(x)
        x = _res_bn("bn1", train, dt)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        c1 = ResLayer(64, 3, 1, 64, dtype=dt, name="layer1")(x, train)
        c2 = ResLayer(128, 4, 2, 256, dtype=dt, name="layer2")(c1, train)
        c3 = ResLayer(256, 6, 2, 512, dtype=dt, name="layer3")(c2, train)
        c4 = ResLayer(512, 3, 2, 1024, dtype=dt, name="layer4")(c3, train)
        return c2, c3, c4


# ---------------------------------------------------------------------------
# FPN + SSH (components.py:40-98)
# ---------------------------------------------------------------------------


class FPN(nn.Module):
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        dt = self.dtype
        leaky = 0.1 if self.out_channels <= 64 else 0.0
        o1 = ConvBN(self.out_channels, 1, leaky, kernel=1, padding=0,
                    dtype=dt, name="output1")(inputs[0], train)
        o2 = ConvBN(self.out_channels, 1, leaky, kernel=1, padding=0,
                    dtype=dt, name="output2")(inputs[1], train)
        o3 = ConvBN(self.out_channels, 1, leaky, kernel=1, padding=0,
                    dtype=dt, name="output3")(inputs[2], train)
        up3 = jax.image.resize(o3, o2.shape, method="nearest")
        o2 = ConvBN(self.out_channels, 1, leaky, dtype=dt, name="merge2")(
            o2 + up3, train)
        up2 = jax.image.resize(o2, o1.shape, method="nearest")
        o1 = ConvBN(self.out_channels, 1, leaky, dtype=dt, name="merge1")(
            o1 + up2, train)
        return [o1, o2, o3]


class SSH(nn.Module):
    out_channel: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        leaky = 0.1 if self.out_channel <= 64 else 0.0
        half = self.out_channel // 2
        quarter = self.out_channel // 4
        c3 = ConvBN(half, 1, relu=False, dtype=dt, name="conv3X3")(x, train)
        c5_1 = ConvBN(quarter, 1, leaky, dtype=dt, name="conv5X5_1")(x, train)
        c5 = ConvBN(quarter, 1, relu=False, dtype=dt,
                    name="conv5X5_2")(c5_1, train)
        c7_2 = ConvBN(quarter, 1, leaky, dtype=dt,
                      name="conv7X7_2")(c5_1, train)
        c7 = ConvBN(quarter, 1, relu=False, dtype=dt,
                    name="conv7x7_3")(c7_2, train)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class Head(nn.Module):
    """1x1 conv head reshaped to [N, anchors, dims]
    (retina_face.py:20-52)."""

    dims: int
    num_anchors: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.num_anchors * self.dims, (1, 1),
                      dtype=self.dtype, name="conv1x1")(x)
        # heads feed the box/landmark decode: hand back f32
        return out.reshape(out.shape[0], -1, self.dims).astype(
            jnp.float32)


class HeadList(nn.Module):
    dims: int
    num_anchors: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, features):
        outs = [
            Head(self.dims, self.num_anchors, dtype=self.dtype,
                 name=str(i))(f)
            for i, f in enumerate(features)
        ]
        return jnp.concatenate(outs, axis=1)


def _net_tail(mod, feats, train):
    """FPN -> SSH -> heads, shared by the full net and the from-s1
    variant (submodules bind to the CALLER's compact scope, so both
    graphs address the same checkpoint paths)."""
    dt = mod.dtype
    fpn = FPN(mod.out_channel, dtype=dt, name="fpn")(list(feats), train)
    f1 = SSH(mod.out_channel, dtype=dt, name="ssh1")(fpn[0], train)
    f2 = SSH(mod.out_channel, dtype=dt, name="ssh2")(fpn[1], train)
    f3 = SSH(mod.out_channel, dtype=dt, name="ssh3")(fpn[2], train)
    features = [f1, f2, f3]
    bbox = HeadList(4, dtype=dt, name="BboxHead")(features)
    cls = HeadList(2, dtype=dt, name="ClassHead")(features)
    ldm = HeadList(10, dtype=dt, name="LandmarkHead")(features)
    if mod.phase == "train":
        return bbox, cls, ldm
    return bbox, nn.softmax(cls, axis=-1), ldm


class RetinaFaceNet(nn.Module):
    backbone: str  # 'mobilenet0.25' | 'Resnet50'
    out_channel: int
    phase: str = "test"
    # flax compute dtype: bf16 runs the trunk/FPN/SSH on the MXU in
    # bf16 with f32 params (heads hand back f32 for the decode); None
    # keeps full f32 (the parity path)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        if self.backbone == "mobilenet0.25":
            feats = MobileNetV1Body(dtype=dt, name="body")(x, train)
        else:
            feats = ResNet50Body(dtype=dt, name="body")(x, train)
        return _net_tail(self, feats, train)


class RetinaFaceNetFromS1(nn.Module):
    """The mobilenet net with stage 1 hoisted out of flax: the caller
    computes s1 (ops/planar_mnet.planar_stage1 — the plane-major fast
    path) and this module runs stages 2-3 + FPN/SSH/heads on the SAME
    checkpoint tree (the stage1 subtree simply goes unread)."""

    out_channel: int
    phase: str = "test"
    dtype: Any = None

    @nn.compact
    def __call__(self, s1, train: bool = False):
        feats = MobileNetBodyFromS1(dtype=self.dtype, name="body")(
            s1, train)
        return _net_tail(self, feats, train)


# ---------------------------------------------------------------------------
# Detector wrapper (host API parity with reference RetinaFace)
# ---------------------------------------------------------------------------

# Measured default for the plane-major stage-1 path (tools/
# exp_planar_s1.py on v5e bench shapes): the planar formulation read
# 17.2 ms vs 4.96 ms for the NHWC flax stage — the phase-split
# transposes and per-tap shifted adds materialize more HBM traffic
# than the lane padding they avoid. Kept opt-in for study.
_PLANAR_S1_DEFAULT = False


class RetinaFace:
    def __init__(self, backbone_cfg="cfg_mnet", phase="test",
                 backbone_path=None, device=None, conf_thres=0.02,
                 topk_bf_nms=5000, keep_top_k=750, nms_thres=0.4,
                 vis_thres=0.6, checkpoint_path=None, nms_cap=1024,
                 weights_path=None, dtype=None, planar_stage1=None):
        self.cfg = _CONFIGS[backbone_cfg] if isinstance(backbone_cfg, str) \
            else backbone_cfg
        self.phase = phase
        self.conf_thres = conf_thres
        self.topk_bf_nms = topk_bf_nms
        self.keep_top_k = keep_top_k
        self.nms_thres = nms_thres
        self.vis_thres = vis_thres
        self.nms_cap = min(nms_cap, topk_bf_nms)
        self.out_cap = 16  # fused-engine per-frame face capacity
        self.channels_subtract = (104.0, 117.0, 123.0)

        dtype = coerce_dtype(dtype)
        self.dtype = dtype
        self.net = RetinaFaceNet(
            backbone=self.cfg["name"], out_channel=self.cfg["out_channel"],
            phase=phase, dtype=dtype,
        )
        # plane-major stage 1: identical math, fast layout for the
        # tiny-channel blocks; mobilenet trunk only. None -> auto
        # (measured default); True/"pallas" -> the fused Pallas
        # kernels (ops/planar_s1_pallas); "xla" -> the measured-and-
        # rejected XLA formulation (ops/planar_mnet, kept for study);
        # False -> the NHWC flax stage.
        if planar_stage1 is None:
            planar_stage1 = _PLANAR_S1_DEFAULT
        if planar_stage1 is True:
            planar_stage1 = "pallas"
        self.planar_stage1 = planar_stage1 if (
            planar_stage1 and self.cfg["name"] == "mobilenet0.25"
        ) else False
        self._tail_net = RetinaFaceNetFromS1(
            out_channel=self.cfg["out_channel"], phase=phase,
            dtype=dtype,
        ) if self.planar_stage1 else None
        self.variables = None
        for path in [weights_path, checkpoint_path]:
            if path and os.path.exists(path):
                self.load_model(path)
                break
        if self.variables is None:
            key = jax.random.PRNGKey(0)
            size = 128
            self.variables = self.net.init(
                key, jnp.zeros((1, size, size, 3)), train=False
            )
        self._jit_cache = {}
        self._prior_cache = {}

    def load_model(self, pretrained_path):
        from .torch_convert import (
            convert_state_dict,
            load_torch_checkpoint,
            strip_prefix,
        )

        print("Loading pretrained model from {}".format(pretrained_path))
        if pretrained_path.endswith(".npz"):
            loaded = np.load(pretrained_path)
            sd = {k: loaded[k] for k in loaded.files}
        else:
            sd = load_torch_checkpoint(pretrained_path)
        sd = strip_prefix(sd, "module.")
        self.variables = convert_state_dict(sd)

    def priors(self, image_size):
        if image_size not in self._prior_cache:
            self._prior_cache[image_size] = B.make_priors(
                image_size, self.cfg["min_sizes"], self.cfg["steps"],
                self.cfg["clip"],
            )
        return self._prior_cache[image_size]

    def _build_infer_fn(self, h, w):
        priors = jnp.asarray(self.priors((h, w)))
        variances = tuple(self.cfg["variance"])
        cap = self.nms_cap
        conf_thres = self.conf_thres
        nms_thres = self.nms_thres
        net = self.net
        scale = jnp.array([w, h, w, h], jnp.float32)
        sub = jnp.array(self.channels_subtract, jnp.float32)

        use_planar = self.planar_stage1
        if use_planar == "pallas":
            from ..ops import planar_s1_pallas

            if not planar_s1_pallas.supports(h, w):
                use_planar = False  # odd size: the flax stage is exact
        tail_net = self._tail_net
        sub_tuple = self.channels_subtract
        net_dtype = self.dtype

        def infer(variables, imgs_u8):
            if use_planar:
                if use_planar == "pallas":
                    from ..ops.planar_s1_pallas import (
                        planar_stage1_pallas as stage1_fn,
                    )
                else:
                    from ..ops.planar_mnet import (
                        planar_stage1 as stage1_fn,
                    )

                s1 = stage1_fn(
                    variables["params"]["body"]["stage1"],
                    variables["batch_stats"]["body"]["stage1"],
                    imgs_u8, sub_tuple, dtype=net_dtype,
                )
                loc, conf, landms = tail_net.apply(variables, s1,
                                                   train=False)
            else:
                x = imgs_u8.astype(jnp.float32) - sub
                loc, conf, landms = net.apply(variables, x, train=False)
            score = conf[..., 1]
            valid = score > conf_thres

            # decode AFTER the per-image top-k: the decode is
            # elementwise per anchor, so gathering raw loc/landm rows
            # first is exact and 16x cheaper than decoding all 16.8k
            # anchors per frame (the reference decoded everything,
            # retina_face.py:177-190; only `cap` survive the cut)
            def per_image(lc, ld, sc, vl):
                idx, still = B.top_k_select(sc, vl, cap)
                pr = priors[idx]
                bx = B.decode_boxes(lc[idx], pr, variances) * scale
                pt = B.decode_landmarks(ld[idx], pr, variances)
                pt = pt.reshape(-1, 5, 2) * jnp.array(
                    [w, h], jnp.float32)
                sc = sc[idx]
                keep = B.nms_keep_mask(bx, sc, still, nms_thres, offset=1.0)
                return bx, sc, pt, still & keep

            return jax.vmap(per_image)(loc, landms, score, valid)

        return jax.jit(infer)

    def _infer_padded(self, imgs_u8):
        b, h, w = imgs_u8.shape[:3]
        key = (b, h, w)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build_infer_fn(h, w)
        return self._jit_cache[key](self.variables, imgs_u8)

    def _build_detect_fn(self, batch, h, w, out_cap=None):
        """MTCNN-compatible cascade contract for the fused engine:
        (variables, frames_u8) -> (boxes [B,K,4], scores [B,K], points
        [B,K,5,2], valid [B,K]) with K = out_cap top detections above
        vis_thres."""
        from ..ops import boxes as B

        out_cap = out_cap or self.out_cap
        infer = self._build_infer_fn(h, w)
        vis = self.vis_thres

        def detect(variables, imgs_u8):
            boxes, scores, pts, valid = infer(variables, imgs_u8)
            valid = valid & (scores >= vis)

            def cap(bx, sc, pt, vl):
                idx, still = B.top_k_select(sc, vl, out_cap)
                return bx[idx], sc[idx], pt[idx], still

            return jax.vmap(cap)(boxes, scores, pts, valid)

        return jax.jit(detect)

    def inference(self, rgb_images, landmark=True):
        """Reference retina_face.py:154-232 API: list of RGB images in,
        per-image (dets, scores[, landmarks]) numpy lists out."""
        single = not isinstance(rgb_images, (list, tuple)) and \
            np.asarray(rgb_images).ndim == 3
        if single:
            rgb_images = [rgb_images]
        imgs = np.stack(
            [np.asarray(im, dtype=np.uint8) for im in rgb_images]
        )
        boxes, scores, landms, valid = jax.device_get(
            self._infer_padded(imgs)
        )
        ret_dets, ret_scores, ret_landms = [], [], []
        for i in range(imgs.shape[0]):
            v = valid[i]
            bx, sc, pt = boxes[i][v], scores[i][v], landms[i][v]
            order = np.argsort(sc)[::-1][: self.keep_top_k]
            bx, sc, pt = bx[order], sc[order], pt[order]
            chosen = sc >= self.vis_thres
            ret_dets.append(bx[chosen])
            ret_scores.append(sc[chosen])
            ret_landms.append(pt[chosen])
        if landmark:
            return ret_dets, ret_scores, ret_landms
        return ret_dets, ret_scores

    def eval(self):
        return self
