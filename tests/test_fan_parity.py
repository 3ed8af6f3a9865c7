"""FAN (2D-FAN stacked hourglass) parity vs a torch oracle.

The ``face_alignment`` package is not installed in this image, so the
oracle is a faithful torch implementation of the published 2DFAN
architecture (same module names as the released state_dict), built
here and fed random weights through the converter — exactly the scheme
the encoder parity tests use. The published 2DFAN4 checkpoint then
drops in through tools/convert_weights.py generic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vn_celeb_face_recognition_tpu.models.fan import (
    FAN,
    FANLandmarker,
    box_center_scale,
    crop_face_window,
    decode_heatmaps,
    reduce_to_5_points,
)
from vn_celeb_face_recognition_tpu.models.torch_convert import (
    assert_tree_compatible,
    convert_state_dict,
)

torch = pytest.importorskip("torch")
torch_nn = torch.nn
F = torch.nn.functional


def conv3x3(inp, out):
    return torch_nn.Conv2d(inp, out, kernel_size=3, stride=1, padding=1,
                           bias=False)


class TConvBlock(torch_nn.Module):
    def __init__(self, in_planes, out_planes):
        super().__init__()
        self.bn1 = torch_nn.BatchNorm2d(in_planes)
        self.conv1 = conv3x3(in_planes, out_planes // 2)
        self.bn2 = torch_nn.BatchNorm2d(out_planes // 2)
        self.conv2 = conv3x3(out_planes // 2, out_planes // 4)
        self.bn3 = torch_nn.BatchNorm2d(out_planes // 4)
        self.conv3 = conv3x3(out_planes // 4, out_planes // 4)
        if in_planes != out_planes:
            self.downsample = torch_nn.Sequential(
                torch_nn.BatchNorm2d(in_planes),
                torch_nn.ReLU(True),
                torch_nn.Conv2d(in_planes, out_planes, 1, 1, bias=False),
            )
        else:
            self.downsample = None

    def forward(self, x):
        out1 = self.conv1(F.relu(self.bn1(x)))
        out2 = self.conv2(F.relu(self.bn2(out1)))
        out3 = self.conv3(F.relu(self.bn3(out2)))
        out = torch.cat((out1, out2, out3), 1)
        residual = x if self.downsample is None else self.downsample(x)
        return out + residual


class THourGlass(torch_nn.Module):
    def __init__(self, depth=4, features=256):
        super().__init__()
        self.depth = depth
        self.features = features
        self._generate(depth)

    def _generate(self, level):
        self.add_module("b1_" + str(level),
                        TConvBlock(self.features, self.features))
        self.add_module("b2_" + str(level),
                        TConvBlock(self.features, self.features))
        if level > 1:
            self._generate(level - 1)
        else:
            self.add_module("b2_plus_" + str(level),
                            TConvBlock(self.features, self.features))
        self.add_module("b3_" + str(level),
                        TConvBlock(self.features, self.features))

    def _forward(self, level, inp):
        up1 = self._modules["b1_" + str(level)](inp)
        low1 = F.avg_pool2d(inp, 2, stride=2)
        low1 = self._modules["b2_" + str(level)](low1)
        if level > 1:
            low2 = self._forward(level - 1, low1)
        else:
            low2 = self._modules["b2_plus_" + str(level)](low1)
        low3 = self._modules["b3_" + str(level)](low2)
        up2 = F.interpolate(low3, scale_factor=2, mode="nearest")
        return up1 + up2

    def forward(self, x):
        return self._forward(self.depth, x)


class TFAN(torch_nn.Module):
    def __init__(self, num_modules=1):
        super().__init__()
        self.num_modules = num_modules
        self.conv1 = torch_nn.Conv2d(3, 64, kernel_size=7, stride=2,
                                     padding=3)
        self.bn1 = torch_nn.BatchNorm2d(64)
        self.conv2 = TConvBlock(64, 128)
        self.conv3 = TConvBlock(128, 128)
        self.conv4 = TConvBlock(128, 256)
        for m in range(num_modules):
            self.add_module("m" + str(m), THourGlass())
            self.add_module("top_m_" + str(m), TConvBlock(256, 256))
            self.add_module("conv_last" + str(m),
                            torch_nn.Conv2d(256, 256, 1, 1, 0))
            self.add_module("bn_end" + str(m), torch_nn.BatchNorm2d(256))
            self.add_module("l" + str(m), torch_nn.Conv2d(256, 68, 1, 1, 0))
            if m < num_modules - 1:
                self.add_module("bl" + str(m),
                                torch_nn.Conv2d(256, 256, 1, 1, 0))
                self.add_module("al" + str(m),
                                torch_nn.Conv2d(68, 256, 1, 1, 0))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)), True)
        x = F.avg_pool2d(self.conv2(x), 2, stride=2)
        x = self.conv3(x)
        x = self.conv4(x)
        previous = x
        outputs = []
        for i in range(self.num_modules):
            hg = self._modules["m" + str(i)](previous)
            ll = self._modules["top_m_" + str(i)](hg)
            ll = F.relu(self._modules["bn_end" + str(i)](
                self._modules["conv_last" + str(i)](ll)), True)
            tmp_out = self._modules["l" + str(i)](ll)
            outputs.append(tmp_out)
            if i < self.num_modules - 1:
                ll = self._modules["bl" + str(i)](ll)
                tmp_out_ = self._modules["al" + str(i)](tmp_out)
                previous = previous + ll + tmp_out_
        return outputs


@pytest.mark.slow
@pytest.mark.parametrize("num_modules", [2, 4])
def test_fan_parity(rng, num_modules):
    """Stacked-module parity: 2 modules exercise the al/bl feedback
    path, 4 modules are the released 2DFAN4 depth — random shared
    weights, every intermediate heatmap set must match."""
    torch.manual_seed(0)
    ref = TFAN(num_modules=num_modules)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    net = FAN(num_modules=num_modules)
    variables = convert_state_dict(sd)
    init_vars = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 256, 256, 3)))
    assert_tree_compatible(variables, init_vars)

    x = rng.uniform(0, 1, size=(2, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    got = net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    train=False)
    assert len(got) == len(want) == num_modules
    for g, w in zip(got, want):
        g = np.asarray(g).transpose(0, 3, 1, 2)
        w = w.numpy()
        np.testing.assert_allclose(g, w, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_fan4_manifest():
    """The released 2DFAN4 state_dict manifest (4 modules) must map
    1:1 through the converter — the drop-in guarantee for the real
    checkpoint."""
    torch.manual_seed(0)
    ref = TFAN(num_modules=4)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    net = FAN(num_modules=4)
    variables = convert_state_dict(sd)
    init_vars = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 256, 256, 3)))
    assert_tree_compatible(variables, init_vars)


def test_crop_window_matches_reference_semantics(rng):
    """crop_face_window equals the face_alignment crop (integer-free
    affine form): a constant image crops to a constant, and content
    centred under (center, scale) lands centred in the 256 window."""
    img = np.zeros((160, 120, 3), np.float32)
    img[40:120, 30:90] = 1.0
    center = jnp.asarray([60.0, 80.0])
    scale = 100.0 / 195.0 * 1.95  # side = 200*scale
    out = np.asarray(crop_face_window(jnp.asarray(img), center, scale,
                                      128))
    assert out.shape == (128, 128, 3)
    # the bright block occupies the middle of the window
    assert out[64, 64, 0] == pytest.approx(1.0, abs=1e-5)
    assert out[2, 2, 0] == pytest.approx(0.0, abs=1e-5)


def test_decode_heatmaps_peak_roundtrip():
    """A synthetic Gaussian peak at a known image location decodes back
    to (near) that location through crop + decode."""
    center = jnp.asarray([100.0, 90.0])
    scale = 0.9
    side = 200.0 * scale
    # target image point -> heatmap cell
    target = np.array([115.0, 82.0], np.float32)
    hx = (target[0] - (100.0 - side / 2)) / side * 64.0
    hy = (target[1] - (90.0 - side / 2)) / side * 64.0
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    peak = np.exp(-((xx - hx) ** 2 + (yy - hy) ** 2) / 3.0)
    hm = np.repeat(peak[:, :, None], 68, axis=2)
    pts = np.asarray(decode_heatmaps(jnp.asarray(hm), center, scale))
    assert pts.shape == (68, 2)
    # heatmap cells are side/64 image px wide -> within one cell
    assert np.all(np.abs(pts - target[None]) <= side / 64.0 + 1e-3)


def test_landmarker_end_to_end_shapes(rng):
    """Random-weight landmarker: API shape parity with
    fa_model.get_landmarks + the 68->5 reduction contract."""
    lm = FANLandmarker(num_modules=1)
    img = rng.integers(0, 255, size=(120, 100, 3)).astype(np.uint8)
    out = lm.get_landmarks(img)
    assert isinstance(out, list) and len(out) == 1
    assert out[0].shape == (68, 2)

    dst, ok = reduce_to_5_points(out[0])
    assert dst.shape == (5, 2)
    assert isinstance(ok, bool)

    ctr, scl = box_center_scale(np.array([10.0, 20.0, 90.0, 110.0]))
    assert np.asarray(ctr).shape == (2,)
    assert float(scl) == pytest.approx((80.0 + 90.0) / 195.0)
    # centre shifted UP by 12% of box height
    assert float(ctr[1]) == pytest.approx(65.0 - 90.0 * 0.12)


def test_landmarker_bf16_matches_f32(rng):
    """The bf16 compute-dtype fast path decodes (near-)identical
    landmarks: heatmap deltas are ~1% of range and the decode is
    argmax-based, so points agree within one heatmap cell."""
    lm32 = FANLandmarker(num_modules=1)
    lm16 = FANLandmarker(num_modules=1, dtype="bfloat16",
                         variables=lm32.variables)
    img = rng.integers(0, 255, size=(128, 128, 3)).astype(np.uint8)
    p32 = lm32.get_landmarks(img)[0]
    p16 = lm16.get_landmarks(img)[0]
    # one heatmap cell on a 128px face window = 128/64 = 2 px; random
    # weights produce flat heatmaps (the adversarial case for argmax
    # stability) so allow a few cells of drift on a minority of points
    d = np.linalg.norm(p32 - p16, axis=-1)
    assert np.median(d) <= 2.0 + 1e-3
    assert (d <= 8.0).mean() >= 0.9
