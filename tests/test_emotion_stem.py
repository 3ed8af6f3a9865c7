"""Parity for the fused emotion stem (interpret mode).

Oracle: imagenet_normalize + area_resize(224) + ResNet2Branch.apply —
the exact feed the fused engine's emotion stage runs
(pipeline/engine.py:283-285).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vn_celeb_face_recognition_tpu.models import resnet_2branch_50
from vn_celeb_face_recognition_tpu.ops.emotion_stem_pallas import (
    emotion_apply_fused,
    emotion_stem_pallas,
)
from vn_celeb_face_recognition_tpu.ops.image import area_resize
from vn_celeb_face_recognition_tpu.ops.image import imagenet_normalize


@pytest.fixture(scope="module")
def setup():
    model = resnet_2branch_50(num_classes=17, dtype=None)
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, 64, 64, 3)))
    gen = np.random.default_rng(4)
    faces = jnp.asarray(
        gen.uniform(0, 255, (6, 112, 112, 3)).astype(np.float32))
    return model, variables, faces


def _ref_stem(variables, faces):
    p, st = variables["params"], variables["batch_stats"]
    ex = imagenet_normalize(area_resize(faces, (224, 224)) / 255.0)
    x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                use_bias=False, name="conv1").apply(
        {"params": p["conv1"]}, ex)
    m, v = st["bn1"]["mean"], st["bn1"]["var"]
    x = (x - m) / jnp.sqrt(v + 1e-5) * p["bn1"]["scale"] \
        + p["bn1"]["bias"]
    x = nn.relu(x)
    return nn.max_pool(x, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))


def test_stem_matches_reference_f32(setup):
    _, variables, faces = setup
    ref = _ref_stem(variables, faces)
    got = emotion_stem_pallas(variables["params"],
                              variables["batch_stats"], faces,
                              dtype=jnp.float32, interpret=True)
    assert got.shape == ref.shape == (6, 56, 56, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_full_apply_matches_model(setup):
    model, variables, faces = setup
    ex = imagenet_normalize(area_resize(faces, (224, 224)) / 255.0)
    ref_cls, ref_proj = model.apply(variables, ex, train=False)
    cls_, proj = emotion_apply_fused(model, variables, faces,
                                     dtype=jnp.float32,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(cls_), np.asarray(ref_cls),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(ref_proj),
                               rtol=2e-4, atol=2e-4)


def test_engine_fused_stem_matches_default(setup):
    """FusedRecognitionEngine(fused_emotion_stem=True) emits the same
    emotion top-k as the default resize+apply path (real 2-branch
    net, interpret on CPU)."""
    from PIL import Image

    from vn_celeb_face_recognition_tpu.models import MLPModel, MTCNN
    from vn_celeb_face_recognition_tpu.pipeline.engine import (
        FusedRecognitionEngine,
    )
    from toy_data import toy_face_files

    model, variables, _ = setup
    files = toy_face_files()
    if not files:
        pytest.skip("toy face fixture unavailable")
    face = np.asarray(
        Image.open(files[0]).convert("RGB").resize((120, 120)))
    key = jax.random.PRNGKey(0)
    det = MTCNN(min_face_size=40, keep_all=True,
                pnet_cap_per_scale=128, rnet_cap=64, onet_cap=32,
                out_cap=4)
    enc_vars_mlp = MLPModel(input_dim=512, num_classes=6).init(
        key, jnp.zeros((1, 512)))

    import flax.linen as nn

    class TinyEnc(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.Conv(8, (3, 3), strides=(4, 4))(x)
            return nn.Dense(512)(jnp.mean(h, axis=(1, 2)))

    enc = TinyEnc()
    ev = enc.init(key, jnp.zeros((1, 112, 112, 3)))
    clf = MLPModel(input_dim=512, num_classes=6)

    frames = np.full((1, 224, 224, 3), 90, dtype=np.uint8)
    frames[0, 40:160, 50:170] = face
    outs = []
    for fused in (False, True):
        engine = FusedRecognitionEngine(
            det, enc, ev, clf, enc_vars_mlp, target_fs=112,
            emotion=model, emotion_variables=variables,
            emotion_topk=3, fused_emotion_stem=fused)
        assert engine.fused_emotion_stem == fused
        outs.append(jax.device_get(engine.process(frames)))
    np.testing.assert_array_equal(outs[0]["emotion_idx"],
                                  outs[1]["emotion_idx"])
    np.testing.assert_allclose(outs[0]["emotion_prob"],
                               outs[1]["emotion_prob"],
                               rtol=5e-3, atol=5e-4)


def test_stem_bf16_close(setup):
    _, variables, faces = setup
    f32 = emotion_stem_pallas(variables["params"],
                              variables["batch_stats"], faces,
                              dtype=jnp.float32, interpret=True)
    b16 = emotion_stem_pallas(variables["params"],
                              variables["batch_stats"], faces,
                              dtype=jnp.bfloat16, interpret=True)
    scale = np.abs(np.asarray(f32)).max() + 1e-3
    assert np.abs(np.asarray(b16, np.float32)
                  - np.asarray(f32)).max() < 0.05 * scale
