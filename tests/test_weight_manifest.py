"""Offline published-checkpoint manifest guarantees.

Zero egress means the released checkpoints themselves can't be
downloaded here. Each published checkpoint's state_dict manifest
(keys + shapes) is reconstructed EXACTLY from the reference model
definitions at the published configuration — including the
DataParallel ``module.`` wrappers real files carry — written to the
on-disk .npz format tools/convert_weights.py produces, and pushed
through the repo's ACTUAL load path (factory/loader + prefix strip +
convert_state_dict + assert_tree_compatible). A failure here means the
converter would reject (or silently mis-map) a real checkpoint:

  * facenet vggface2 / casia-webface heads —
    reference inception_resnet_v1.py:306-331 (logits 8631 / 10575)
  * iresnet100 backbone — reference iresnet_encoder.py:8-12,162-181
  * RetinaFace mobilenet0.25 + resnet50, with the ``module.`` strip —
    reference retina_face.py:235-265
  * emotion resnet50 2-branch under nn.DataParallel —
    reference resnet_2_branch.py:73-89 (fc 690, proj 300)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vn_celeb_face_recognition_tpu.models.torch_convert import (
    assert_tree_compatible,
)

torch = pytest.importorskip("torch")


def _state_dict(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _save_npz(tmp_path, name, sd):
    if not name.endswith(".npz"):
        name += ".npz"
    path = str(tmp_path / name)
    np.savez(path, **sd)
    return path


@pytest.mark.slow
@pytest.mark.parametrize("pretrained,n_cls", [
    ("vggface2", 8631), ("casia-webface", 10575),
])
def test_facenet_checkpoint_manifests(tmp_path, pretrained, n_cls):
    """The published facenet checkpoints carry the classify head
    (logits.{weight,bias} at 8631/10575). Both load flows must accept
    them: embedding mode (logits dropped) and classify mode (logits
    kept)."""
    from ref_oracle import load_ref_module

    from vn_celeb_face_recognition_tpu.models.inception_resnet_v1 import (
        build_inception_resnet_v1,
    )

    ref_mod = load_ref_module("inception_resnet_v1")
    torch.manual_seed(0)
    ref = ref_mod.InceptionResnetV1(pretrained=None, classify=True,
                                    num_classes=n_cls)
    sd = _state_dict(ref)
    assert f"logits.weight" in sd and sd["logits.weight"].shape[0] == n_cls
    path = _save_npz(tmp_path, f"{pretrained}.npz", sd)

    # embedding mode: logits dropped, rest must map 1:1
    model, variables = build_inception_resnet_v1(
        pretrained=pretrained, classify=False, weights_path=path
    )
    assert variables is not None, "factory did not load the checkpoint"
    init_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 160, 160, 3)))
    assert_tree_compatible(variables, init_vars)

    # classify mode: the full manifest, logits included
    model_c, variables_c = build_inception_resnet_v1(
        pretrained=pretrained, classify=True, weights_path=path
    )
    assert variables_c is not None
    init_c = model_c.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 160, 160, 3)))
    assert_tree_compatible(variables_c, init_c)
    np.testing.assert_array_equal(
        variables_c["params"]["logits"]["kernel"],
        sd["logits.weight"].T,
    )


@pytest.mark.slow
def test_iresnet100_checkpoint_manifest(tmp_path):
    from ref_oracle import load_ref_module

    from vn_celeb_face_recognition_tpu.models.iresnet import build_iresnet

    ref_mod = load_ref_module("iresnet_encoder")
    torch.manual_seed(0)
    ref = ref_mod.iresnet100(pretrained=False, freeze_weights=False)
    sd = _state_dict(ref)
    path = _save_npz(tmp_path, "iresnet100.npz", sd)

    model, variables = build_iresnet(100, pretrained=True,
                                     weights_path=path)
    assert variables is not None
    init_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 112, 112, 3)))
    assert_tree_compatible(variables, init_vars)


@pytest.mark.slow
@pytest.mark.parametrize("cfg_name,backbone,out_channel,wrap", [
    ("cfg_mnet", "mobilenet0.25", 64, False),
    ("cfg_re50", "Resnet50", 256, True),
])
def test_retinaface_checkpoint_manifests(tmp_path, cfg_name, backbone,
                                         out_channel, wrap):
    """Published RetinaFace checkpoints (mobilenet0.25_Final.pth,
    Resnet50_Final.pth) — resnet50 released with DataParallel
    ``module.`` keys, which load_model must strip
    (retina_face.py:261-265)."""
    from ref_oracle import install_torchvision_resnet50, load_ref_module

    from vn_celeb_face_recognition_tpu.models.retinaface import RetinaFace

    install_torchvision_resnet50()
    ref_cfg = load_ref_module("retina_face_utils.config")
    getattr(ref_cfg, cfg_name)["pretrain"] = False
    ref_mod = load_ref_module("retina_face")
    torch.manual_seed(0)
    ref = ref_mod.RetinaFace(backbone_cfg=cfg_name, phase="test",
                             device="cpu")
    sd = _state_dict(ref)
    if wrap:
        sd = {f"module.{k}": v for k, v in sd.items()}
    path = _save_npz(tmp_path, f"{cfg_name}.npz", sd)

    det = RetinaFace(backbone_cfg=cfg_name)
    init_vars = det.net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 96, 96, 3)))
    det.load_model(path)
    assert_tree_compatible(det.variables, init_vars)


@pytest.mark.slow
def test_emotion_checkpoint_manifest(tmp_path):
    """The emotion release was saved from nn.DataParallel
    (resnet_2_branch.py:86): every key rides under ``module.``; the
    published heads are fc=690 emotion tags, proj=300."""
    from ref_oracle import load_ref_module

    from vn_celeb_face_recognition_tpu.models.resnet_2_branch import (
        build_resnet_2branch_50,
    )

    ref_mod = load_ref_module("resnet_2_branch")
    torch.manual_seed(0)
    ref = ref_mod.resnet_2branch_50(pretrained=False,
                                    checkpoint_path=None,
                                    num_classes=690,
                                    num_projections=300)
    sd = {f"module.{k}": v for k, v in _state_dict(ref).items()}
    path = _save_npz(tmp_path, "emotion.npz", sd)

    model, variables = build_resnet_2branch_50(
        num_classes=690, num_projections=300, weights_path=path
    )
    assert variables is not None
    init_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 224, 224, 3)))
    assert_tree_compatible(variables, init_vars)
