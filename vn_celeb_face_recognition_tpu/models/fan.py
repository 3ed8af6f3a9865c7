"""FAN 68-point face landmark network (2D-FAN), TPU-native.

The reference's ``seq_fd_vs_aln`` pipeline and the batch aligner run
the third-party ``face_alignment`` package's FAN per face
(/root/reference/demo_image.py:366, align_face.py:161): a stacked-
hourglass CNN on a 256x256 face crop producing 68 heatmaps at 64x64,
decoded to landmark coordinates with a quarter-pixel neighbour-sign
offset and mapped back to image coordinates through the crop's
scale/translate transform.

This is a from-scratch flax implementation of the published 2DFAN-4
architecture (module/key names mirror the torch release so the
checkpoint converts through models/torch_convert like every other
model in this package):

  * ``ConvBlock`` — BN-ReLU-conv bottleneck whose three 3x3 stages
    (out/2, out/4, out/4 channels) concatenate, with a BN-ReLU-1x1
    projection skip when channel counts change;
  * ``HourGlass`` — depth-4 recursive encoder/decoder, avg-pool down,
    nearest-neighbour up, ConvBlocks everywhere;
  * ``FAN`` — 7x7/2 stem + three ConvBlocks, then ``num_modules``
    stacked hourglasses with intermediate supervision heads; module
    ``i``'s heatmap re-enters the trunk through the ``al<i>``/``bl<i>``
    1x1 convs.

TPU-first differences from the reference package:

  * the crop is an axis-aligned scale+translate, so it runs as two
    separable bilinear hat-matrix matmuls (no gathers, MXU-friendly)
    instead of an integer crop + cv2.resize;
  * the whole batch of faces runs as ONE jitted program: crop ->
    stacked hourglasses -> heatmap decode; only the final [N, 68, 2]
    coordinates return to the host;
  * heatmap decode keeps sub-pixel precision (the reference package
    truncates the inverse transform to ints, api.py transform()); the
    quarter-pixel neighbour-sign offset itself is reproduced exactly.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def _bn(name, dtype=None):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        dtype=dtype, name=name)


class ConvBlock(nn.Module):
    """BN-ReLU bottleneck with concatenated 3x3 stages (torch FAN
    ConvBlock): out1 = conv3x3(out/2), out2 = conv3x3(out/4),
    out3 = conv3x3(out/4), concat -> out channels."""

    in_planes: int
    out_planes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        half = self.out_planes // 2
        quarter = self.out_planes // 4
        out1 = _bn("bn1", dt)(x)
        out1 = nn.Conv(half, (3, 3), padding=1, use_bias=False,
                       dtype=dt, name="conv1")(nn.relu(out1))
        out2 = _bn("bn2", dt)(out1)
        out2 = nn.Conv(quarter, (3, 3), padding=1, use_bias=False,
                       dtype=dt, name="conv2")(nn.relu(out2))
        out3 = _bn("bn3", dt)(out2)
        out3 = nn.Conv(quarter, (3, 3), padding=1, use_bias=False,
                       dtype=dt, name="conv3")(nn.relu(out3))
        out = jnp.concatenate([out1, out2, out3], axis=-1)
        residual = x
        if self.in_planes != self.out_planes:
            residual = DownsampleSkip(self.out_planes, dtype=dt,
                                      name="downsample")(x)
        return out + residual


class DownsampleSkip(nn.Module):
    """torch nn.Sequential(BatchNorm2d, ReLU, Conv1x1) -> keys 0/2."""

    out_planes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = _bn("0", self.dtype)(x)
        x = nn.relu(x)
        return nn.Conv(self.out_planes, (1, 1), use_bias=False,
                       dtype=self.dtype, name="2")(x)


class HourGlass(nn.Module):
    """Depth-``depth`` recursive hourglass over ``features`` channels."""

    depth: int = 4
    features: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        f = self.features
        dt = self.dtype

        def level(n, inp):
            up1 = ConvBlock(f, f, dtype=dt, name=f"b1_{n}")(inp)
            low1 = nn.avg_pool(inp, (2, 2), strides=(2, 2))
            low1 = ConvBlock(f, f, dtype=dt, name=f"b2_{n}")(low1)
            if n > 1:
                low2 = level(n - 1, low1)
            else:
                low2 = ConvBlock(f, f, dtype=dt,
                                 name=f"b2_plus_{n}")(low1)
            low3 = ConvBlock(f, f, dtype=dt, name=f"b3_{n}")(low2)
            up2 = jnp.repeat(jnp.repeat(low3, 2, axis=1), 2, axis=2)
            return up1 + up2

        return level(self.depth, x)


class FAN(nn.Module):
    """Stacked-hourglass landmark net; returns the per-module 68-channel
    heatmap list (NHWC, 64x64)."""

    num_modules: int = 4
    # compute dtype: bf16 runs the hourglass convs on the MXU in bf16
    # with f32 params; heatmaps return f32 for the decode. None keeps
    # full f32 (the torch-parity path).
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                    dtype=dt, name="conv1")(x)
        x = nn.relu(_bn("bn1", dt)(x))
        x = ConvBlock(64, 128, dtype=dt, name="conv2")(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(128, 128, dtype=dt, name="conv3")(x)
        x = ConvBlock(128, 256, dtype=dt, name="conv4")(x)

        previous = x
        outputs = []
        for i in range(self.num_modules):
            hg = HourGlass(dtype=dt, name=f"m{i}")(previous)
            ll = ConvBlock(256, 256, dtype=dt, name=f"top_m_{i}")(hg)
            ll = nn.Conv(256, (1, 1), dtype=dt, name=f"conv_last{i}")(ll)
            ll = nn.relu(_bn(f"bn_end{i}", dt)(ll))
            tmp_out = nn.Conv(68, (1, 1), dtype=dt, name=f"l{i}")(ll)
            outputs.append(tmp_out.astype(jnp.float32))
            if i < self.num_modules - 1:
                ll = nn.Conv(256, (1, 1), dtype=dt, name=f"bl{i}")(ll)
                tmp_out_ = nn.Conv(256, (1, 1), dtype=dt,
                                   name=f"al{i}")(tmp_out)
                previous = previous + ll + tmp_out_
        return outputs


# ---------------------------------------------------------------------------
# Crop + decode (face_alignment api.py transform/crop/get_preds_fromhm
# semantics, reformulated gather-free)
# ---------------------------------------------------------------------------


def box_center_scale(box):
    """face_alignment's box -> (center, scale) convention: centre
    shifted up by 12% of the box height, scale = (w+h)/195."""
    box = jnp.asarray(box, jnp.float32)
    cx = (box[..., 0] + box[..., 2]) / 2.0
    cy = (box[..., 1] + box[..., 3]) / 2.0
    cy = cy - (box[..., 3] - box[..., 1]) * 0.12
    scale = ((box[..., 2] - box[..., 0])
             + (box[..., 3] - box[..., 1])) / 195.0
    return jnp.stack([cx, cy], axis=-1), scale


def _hat(positions, in_size):
    i = jnp.arange(in_size, dtype=jnp.float32)[None, :]
    return jnp.maximum(0.0, 1.0 - jnp.abs(positions[:, None] - i))


def crop_face_window(image, center, scale, resolution=256):
    """Separable bilinear sampling of the 200*scale-wide square around
    ``center`` to [resolution, resolution, C]; zero outside the image
    (the reference package pads its integer crop with zeros too)."""
    h_img, w_img = image.shape[0], image.shape[1]
    side = 200.0 * scale
    o = (jnp.arange(resolution, dtype=jnp.float32) + 0.5) / resolution
    ys = center[1] - side / 2.0 + o * side - 0.5
    xs = center[0] - side / 2.0 + o * side - 0.5
    ry = _hat(ys, h_img)
    rx = _hat(xs, w_img)
    out = jnp.einsum("oh,hwc->owc", ry, image)
    return jnp.einsum("pw,owc->opc", rx, out)


def decode_heatmaps(hm, center, scale):
    """[H, W, 68] heatmaps -> [68, 2] image-coordinate landmarks.

    Reproduces get_preds_fromhm: argmax peak, +-0.25px shift toward the
    higher neighbour (only strictly inside the map), half-pixel
    correction, then the inverse crop transform (kept sub-pixel rather
    than truncated to ints)."""
    hh, ww, c = hm.shape
    flat = jnp.transpose(hm, (2, 0, 1)).reshape(c, hh * ww)
    idx = jnp.argmax(flat, axis=-1)
    px = (idx % ww).astype(jnp.int32)
    py = (idx // ww).astype(jnp.int32)

    hmc = jnp.transpose(hm, (2, 0, 1))  # [68, H, W]

    def neighbour_sign(plane, y, x):
        xm = plane[y, jnp.clip(x - 1, 0, ww - 1)]
        xp = plane[y, jnp.clip(x + 1, 0, ww - 1)]
        ym = plane[jnp.clip(y - 1, 0, hh - 1), x]
        yp = plane[jnp.clip(y + 1, 0, hh - 1), x]
        return jnp.sign(xp - xm), jnp.sign(yp - ym)

    sx, sy = jax.vmap(neighbour_sign)(hmc, py, px)
    in_x = (px > 0) & (px < ww - 1)
    in_y = (py > 0) & (py < hh - 1)
    fx = px.astype(jnp.float32) + jnp.where(in_x & in_y, 0.25 * sx, 0.0)
    fy = py.astype(jnp.float32) + jnp.where(in_x & in_y, 0.25 * sy, 0.0)
    # reference: preds (1-based) - 0.5 => 0-based + 0.5
    fx = fx + 0.5
    fy = fy + 0.5
    # inverse transform: crop-resolution point -> image coords
    side = 200.0 * scale
    ix = (fx / ww) * side + center[0] - side / 2.0
    iy = (fy / hh) * side + center[1] - side / 2.0
    return jnp.stack([ix, iy], axis=-1)


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


class FANLandmarker:
    """Batched 68-point landmarker with the reference package's API
    shape: boxes in, landmarks out — one jitted crop->FAN->decode
    program per input signature.

    Args:
      num_modules: stacked hourglass count (published 2DFAN-4 uses 4).
      weights_path: converted .npz of the released torch state_dict
        (tools/convert_weights.py generic); random init otherwise.
    """

    def __init__(self, num_modules=4, weights_path=None, variables=None,
                 dtype=None):
        from .layers import coerce_dtype

        self.net = FAN(num_modules=num_modules,
                       dtype=coerce_dtype(dtype))
        if variables is None:
            import os

            if weights_path and os.path.exists(weights_path):
                from .torch_convert import convert_state_dict

                loaded = np.load(weights_path)
                sd = {k: loaded[k] for k in loaded.files}
                variables = convert_state_dict(sd)
            else:
                if weights_path:
                    print(
                        f"Warning: FAN weights '{weights_path}' not "
                        "found; the landmarker is randomly initialised."
                    )
                variables = self.net.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3))
                )
        self.variables = jax.device_put(variables)
        self._jit_cache = {}

    def _build(self, batch, h, w):
        net = self.net

        def run(variables, images_u8, centers, scales):
            imgs = images_u8.astype(jnp.float32) / 255.0

            def crop_one(img, ctr, scl):
                return crop_face_window(img, ctr, scl, 256)

            crops = jax.vmap(crop_one)(imgs, centers, scales)
            heatmaps = net.apply(variables, crops, train=False)[-1]
            return jax.vmap(decode_heatmaps)(heatmaps, centers, scales)

        return jax.jit(run)

    def landmarks_for_boxes(self, images_u8, boxes):
        """images_u8 [N, H, W, 3] uint8 (one face region each), boxes
        [N, 4] xyxy in image coords -> [N, 68, 2] float landmarks.

        Shapes are BUCKETED before jit (H/W up to multiples of 64, N
        to a power of two) so a mixed-size dataset compiles a bounded
        set of programs instead of one per crop size — remote
        compilation costs minutes per program on this rig. Bucketing
        is EXACT: the crop's hat weights read zero outside the
        original extent, which is precisely what zero-padding adds."""
        images_u8 = np.ascontiguousarray(images_u8)
        n, h, w = images_u8.shape[:3]
        centers, scales = box_center_scale(np.asarray(boxes,
                                                      np.float32))
        hp = -(-h // 64) * 64
        wp = -(-w // 64) * 64
        np_pad = 1 << (n - 1).bit_length()
        if (hp, wp, np_pad) != (h, w, n):
            padded = np.zeros((np_pad, hp, wp, 3), np.uint8)
            padded[:n, :h, :w] = images_u8
            images_u8 = padded
            centers = np.concatenate(
                [np.asarray(centers),
                 np.ones((np_pad - n, 2), np.float32) * 32.0])
            scales = np.concatenate(
                [np.asarray(scales),
                 np.ones((np_pad - n,), np.float32) * 0.3])
        key = (np_pad, hp, wp)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build(np_pad, hp, wp)
        out = np.asarray(jax.device_get(self._jit_cache[key](
            self.variables, images_u8, centers, scales
        )))
        return out[:n]

    def get_landmarks(self, rgb_image, detected_box=None):
        """Single pre-cropped face image -> [[68, 2]] (list-of-arrays
        like face_alignment.get_landmarks) — the whole image is treated
        as the face box when none is given, matching how the reference
        pipelines call it on already-cropped faces
        (demo_image.py:201-214, align_face.py:88-104)."""
        img = np.ascontiguousarray(rgb_image)
        h, w = img.shape[:2]
        if detected_box is None:
            detected_box = [0.0, 0.0, float(w), float(h)]
        pts = self.landmarks_for_boxes(
            img[None], np.asarray(detected_box, np.float32)[None]
        )
        return [pts[0]]


def reduce_to_5_points(points68):
    """68 -> 5 canonical points + the geometric sanity gate
    (demo_image.py:218-233): eye centres, nose tip, mouth corners;
    returns (dst [5,2], ok)."""
    from ..pipeline.recognition import landmarks_geometrically_sane

    p = np.asarray(points68, np.float32)
    p1 = p[36:42].mean(axis=0)
    p2 = p[42:48].mean(axis=0)
    p3 = p[33]
    p4 = p[48]
    p5 = p[54]
    dst = np.stack([p1, p2, p3, p4, p5])
    return dst, bool(landmarks_geometrically_sane(dst))


def build_fan(num_modules=4, weights_path=None):
    """Registry factory."""
    return FANLandmarker(num_modules=num_modules,
                         weights_path=weights_path)
