"""Parity for the VMEM bottleneck-chain kernel (ops/bottleneck_pallas)
vs the flax Bottleneck blocks it replaces (interpret mode on CPU).

Reference semantics: /root/reference/models/resnet_2_branch_utils/
resnet.py:23-67 (conv1x1-BN-relu -> conv3x3-BN-relu -> conv1x1-BN ->
+residual -> relu), inference running stats.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vn_celeb_face_recognition_tpu.models.resnet_common import (
    Bottleneck,
    ResLayer,
)
from vn_celeb_face_recognition_tpu.ops.bottleneck_pallas import (
    bottleneck_chain,
    emotion_apply_fused_l12,
    fold_layer_tail,
)


def _layer_variables(planes, blocks, stride, inplanes, side, key=0,
                     dtype=None):
    mod = ResLayer(planes, blocks, stride, inplanes, dtype=dtype)
    variables = mod.init(
        jax.random.PRNGKey(key),
        jnp.zeros((1, side, side, inplanes)),
    )
    # non-trivial running stats so the BN fold is actually exercised
    gen = np.random.default_rng(key + 1)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            gen.uniform(0.5, 1.5, a.shape).astype(np.float32))
        if a.ndim else a,
        variables["batch_stats"],
    )
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            gen.normal(0, 0.1, a.shape).astype(np.float32)),
        variables["params"],
    )
    return mod, {"params": params, "batch_stats": stats}


def _tail_reference(variables, planes, n_blocks, x):
    p, s = variables["params"], variables["batch_stats"]
    for i in range(1, n_blocks + 1):
        x = Bottleneck(planes, 1, False).apply(
            {"params": p[str(i)], "batch_stats": s[str(i)]}, x,
            train=False)
    return x


def test_chain_matches_flax_l1_shape():
    _, variables = _layer_variables(64, 3, 1, 64, 56)
    gen = np.random.default_rng(0)
    x = jnp.asarray(gen.normal(0, 1, (2, 56, 56, 256)).astype(
        np.float32))
    ref = _tail_reference(variables, 64, 2, x)
    folded = fold_layer_tail(variables["params"],
                             variables["batch_stats"], 2)
    got = bottleneck_chain(x, folded, 56, 56, 64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_chain_matches_flax_l2_shape_and_seams():
    """l2 shapes run 2 images per grid step — the tap masks must stop
    taps leaking across the image seam inside a step."""
    _, variables = _layer_variables(128, 4, 2, 256, 28, key=3)
    gen = np.random.default_rng(1)
    x = jnp.asarray(gen.normal(0, 1, (4, 28, 28, 512)).astype(
        np.float32))
    ref = _tail_reference(variables, 128, 3, x)
    folded = fold_layer_tail(variables["params"],
                             variables["batch_stats"], 3)
    got2 = bottleneck_chain(x, folded, 28, 28, 128,
                            images_per_step=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    got1 = bottleneck_chain(x, folded, 28, 28, 128,
                            images_per_step=1, interpret=True)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(got2),
                               rtol=1e-5, atol=1e-5)


def test_chain_bf16_family_tolerance():
    _, variables = _layer_variables(64, 3, 1, 64, 56, key=5,
                                    dtype=jnp.bfloat16)
    gen = np.random.default_rng(2)
    x32 = jnp.asarray(gen.normal(0, 1, (1, 56, 56, 256)).astype(
        np.float32))
    ref = _tail_reference(variables, 64, 2, x32).astype(jnp.float32)
    folded = fold_layer_tail(variables["params"],
                             variables["batch_stats"], 2)
    got = bottleneck_chain(x32.astype(jnp.bfloat16), folded, 56, 56,
                           64, interpret=True).astype(jnp.float32)
    r, g = np.asarray(ref).ravel(), np.asarray(got).ravel()
    cos = float(np.dot(r, g) / (np.linalg.norm(r) * np.linalg.norm(g)
                                + 1e-9))
    assert cos > 0.995
    scale = float(np.abs(r).max())
    assert float(np.abs(r - g).max()) < 0.1 * scale + 0.3


def test_fused_emotion_apply_matches_model():
    from vn_celeb_face_recognition_tpu.models import resnet_2branch_50

    model = resnet_2branch_50(num_classes=11, num_projections=7)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    gen = np.random.default_rng(4)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            gen.uniform(0.5, 1.5, a.shape).astype(np.float32))
        if a.ndim else a,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    ex = jnp.asarray(gen.normal(0, 1, (2, 224, 224, 3)).astype(
        np.float32))
    ref_cls, ref_proj = model.apply(variables, ex, train=False)
    got_cls, got_proj = emotion_apply_fused_l12(model, variables, ex,
                                                interpret=True)
    np.testing.assert_allclose(np.asarray(got_cls),
                               np.asarray(ref_cls), rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_proj),
                               np.asarray(ref_proj), rtol=2e-3,
                               atol=2e-3)


def test_engine_fused_bottlenecks_matches_default():
    """FusedRecognitionEngine(fused_bottlenecks=True) emits the same
    emotion top-k as the default emotion.apply path (real 2-branch
    net, interpret on CPU)."""
    from PIL import Image

    import flax.linen as nn

    from vn_celeb_face_recognition_tpu.models import (
        MLPModel,
        MTCNN,
        resnet_2branch_50,
    )
    from vn_celeb_face_recognition_tpu.pipeline.engine import (
        FusedRecognitionEngine,
    )
    from toy_data import toy_face_files

    model = resnet_2branch_50(num_classes=17, dtype=None)
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, 64, 64, 3)))
    files = toy_face_files()
    if not files:
        pytest.skip("toy face fixture unavailable")
    face = np.asarray(
        Image.open(files[0]).convert("RGB").resize((120, 120)))
    key = jax.random.PRNGKey(0)
    det = MTCNN(min_face_size=40, keep_all=True,
                pnet_cap_per_scale=128, rnet_cap=64, onet_cap=32,
                out_cap=4)
    clf_vars = MLPModel(input_dim=512, num_classes=6).init(
        key, jnp.zeros((1, 512)))

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
            det, enc, ev, clf, clf_vars, target_fs=112,
            emotion=model, emotion_variables=variables,
            emotion_topk=3, fused_bottlenecks=fused)
        assert engine.fused_bottlenecks == fused
        outs.append(jax.device_get(engine.process(frames)))
    np.testing.assert_array_equal(outs[0]["emotion_idx"],
                                  outs[1]["emotion_idx"])
    np.testing.assert_allclose(outs[0]["emotion_prob"],
                               outs[1]["emotion_prob"],
                               rtol=5e-3, atol=5e-4)
