"""RetinaFace network + inference parity vs the reference torch model
(mobilenet0.25 backbone), with random weights shared via the
torch->flax converter. Covers the raw head outputs and the full
decode/filter/NMS inference path."""

import numpy as np
import pytest

import jax.numpy as jnp

from vn_celeb_face_recognition_tpu.models.retinaface import (
    RetinaFace,
    RetinaFaceNet,
)
from vn_celeb_face_recognition_tpu.models.torch_convert import (
    assert_tree_compatible,
    convert_state_dict,
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_and_ours():
    import jax

    from ref_oracle import load_ref_module

    ref_cfg = load_ref_module("retina_face_utils.config")
    ref_cfg.cfg_mnet["pretrain"] = False  # no backbone file download
    ref_mod = load_ref_module("retina_face")
    torch.manual_seed(0)
    ref = ref_mod.RetinaFace(backbone_cfg="cfg_mnet", phase="test",
                             device="cpu")
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    net = RetinaFaceNet(backbone="mobilenet0.25", out_channel=64,
                        phase="test")
    variables = convert_state_dict(sd)
    init_vars = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 128, 128, 3)))
    assert_tree_compatible(variables, init_vars)
    return ref, net, variables


@pytest.mark.slow
def test_retinaface_head_outputs_match(ref_and_ours, rng):
    ref, net, variables = ref_and_ours
    x = rng.uniform(-120, 130, size=(2, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        want_loc, want_conf, want_ldm = ref(torch.from_numpy(x))
    got_loc, got_conf, got_ldm = net.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got_loc), want_loc.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_conf), want_conf.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_ldm), want_ldm.numpy(),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_retinaface_resnet50_head_outputs_match(rng):
    """cfg_re50 was the reference's production detector
    (scripts/celeb_stat_dynamic_itv.sh:1-8) — full-net head parity for
    the resnet50 trunk (retina_face.py:86-90), random shared weights
    through the converter."""
    import jax

    from ref_oracle import install_torchvision_resnet50, load_ref_module

    install_torchvision_resnet50()
    ref_cfg = load_ref_module("retina_face_utils.config")
    ref_cfg.cfg_re50["pretrain"] = False
    ref_mod = load_ref_module("retina_face")
    torch.manual_seed(0)
    ref = ref_mod.RetinaFace(backbone_cfg="cfg_re50", phase="test",
                             device="cpu")
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    net = RetinaFaceNet(backbone="Resnet50", out_channel=256,
                        phase="test")
    variables = convert_state_dict(sd)
    init_vars = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 96, 96, 3)))
    assert_tree_compatible(variables, init_vars)

    x = rng.uniform(-120, 130, size=(1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        want_loc, want_conf, want_ldm = ref(torch.from_numpy(x))
    got_loc, got_conf, got_ldm = net.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got_loc), want_loc.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_conf), want_conf.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_ldm), want_ldm.numpy(),
                               rtol=1e-3, atol=1e-3)


class _FixedNet:
    """Stub net returning fixed predictions — isolates the decode/
    top-k/NMS/vis-threshold postprocess for exact comparison."""

    def __init__(self, loc, conf, landms):
        self._out = (jnp.asarray(loc), jnp.asarray(conf),
                     jnp.asarray(landms))

    def apply(self, variables, x, train=False):
        return self._out


@pytest.mark.slow
def test_retinaface_postprocess_matches(rng):
    """Same synthetic predictions (well-separated scores) through the
    reference decode+py_cpu_nms steps and our jitted device
    postprocess: identical survivor sets, boxes and scores."""
    from ref_oracle import load_ref_module

    h = w = 96
    ref_cfg = load_ref_module("retina_face_utils.config").cfg_mnet
    box_utils = load_ref_module("retina_face_utils.box_utils")
    prior_box = load_ref_module("retina_face_utils.prior_box")
    nms_mod = load_ref_module("retina_face_utils.nms.py_cpu_nms")

    priors_t = prior_box.PriorBox(ref_cfg, image_size=(h, w)).forward()
    n = priors_t.shape[0]
    loc = rng.normal(scale=0.4, size=(1, n, 4)).astype(np.float32)
    scores = rng.uniform(0.0, 1.0, size=n).astype(np.float32)
    conf = np.stack([1.0 - scores, scores], axis=-1)[None]
    landms = rng.normal(scale=0.3, size=(1, n, 10)).astype(np.float32)

    # reference postprocess
    boxes_r = box_utils.decode(torch.from_numpy(loc[0]), priors_t,
                               ref_cfg["variance"])
    boxes_r = (boxes_r * torch.tensor([w, h, w, h]).float()).numpy()
    inds = np.where(scores > 0.02)[0]
    b, s = boxes_r[inds], scores[inds]
    order = s.argsort()[::-1][:5000]
    b, s = b[order], s[order]
    dets = np.hstack((b, s[:, None])).astype(np.float32)
    keep = nms_mod.py_cpu_nms(dets, 0.4)
    dets = dets[keep][:750]
    chosen = dets[:, 4] >= 0.6
    ref_dets, ref_scores = dets[chosen, :4], dets[chosen, 4]

    # our postprocess via the detector with a stubbed net
    det = RetinaFace(backbone_cfg="cfg_mnet", vis_thres=0.6,
                     conf_thres=0.02, nms_thres=0.4)
    det.net = _FixedNet(loc, conf, landms)
    det._jit_cache = {}
    img = np.zeros((h, w, 3), dtype=np.uint8)
    got_dets, got_scores, _ = det.inference([img], landmark=True)
    got_dets, got_scores = got_dets[0], got_scores[0]

    assert len(got_dets) == len(ref_dets)
    oref = np.argsort(-ref_scores)
    ogot = np.argsort(-got_scores)
    np.testing.assert_allclose(got_scores[ogot], ref_scores[oref],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_dets[ogot], ref_dets[oref],
                               rtol=1e-4, atol=5e-3)


def _iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(area_a + area_b - inter, 1e-9)
