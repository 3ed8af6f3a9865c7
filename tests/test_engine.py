"""FusedRecognitionEngine integration: detection, alignment, embedding
and identification of real faces pasted into frames — one program."""

import glob

import numpy as np
import pytest

from toy_data import toy_face_files

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_fused_engine_end_to_end(rng):
    from PIL import Image

    from vn_celeb_face_recognition_tpu.models import (
        InceptionResnetV1,
        MLPModel,
        MTCNN,
    )
    from vn_celeb_face_recognition_tpu.pipeline.engine import (
        FusedRecognitionEngine,
    )

    files = toy_face_files()
    if not files:
        pytest.skip("toy face fixture unavailable")
    face = np.asarray(
        Image.open(files[0]).convert("RGB").resize((120, 120))
    )

    det = MTCNN(min_face_size=40, keep_all=True, pnet_cap_per_scale=128,
                rnet_cap=64, onet_cap=32, out_cap=8)
    enc = InceptionResnetV1()
    key = jax.random.PRNGKey(0)
    enc_vars = enc.init(key, jnp.zeros((1, 112, 112, 3)))
    clf = MLPModel(input_dim=512, num_classes=16)
    clf_vars = clf.init(key, jnp.zeros((1, 512)))
    engine = FusedRecognitionEngine(det, enc, enc_vars, clf, clf_vars,
                                    target_fs=112)

    frames = np.full((2, 240, 240, 3), 80, dtype=np.uint8)
    frames[0, 20:140, 30:150] = face
    frames[1, 60:180, 60:180] = face
    out = jax.device_get(engine.process(frames))

    assert out["valid"].sum() >= 2
    assert out["embeddings"].shape == (2, 8, 512)
    # embeddings of the same face in both frames should agree closely
    idx0 = np.nonzero(out["valid"][0])[0][0]
    idx1 = np.nonzero(out["valid"][1])[0][0]
    e0 = out["embeddings"][0][idx0]
    e1 = out["embeddings"][1][idx1]
    cos = float(
        np.dot(e0, e1) / (np.linalg.norm(e0) * np.linalg.norm(e1))
    )
    assert cos > 0.99

    import pandas as pd

    df = pd.DataFrame(
        {"label": range(16), "name": [f"P{i}" for i in range(16)]}
    )
    results = engine.identify(out, df, 0.0)
    assert len(results) == 2
    for names, boxes in results:
        assert len(names) >= 1
        assert len(names) == len(boxes)

    # threshold 1.1 -> everything Unknown
    results = engine.identify(out, df, 1.1)
    for names, _ in results:
        assert all(n == "Unknown" for n in names)


def test_fused_engine_with_retinaface(rng):
    """Engine generality: RetinaFace supplies the detector contract.
    Random weights find nothing — the padded plumbing must still run
    and produce all-invalid outputs."""
    from vn_celeb_face_recognition_tpu.models import MLPModel, RetinaFace
    import flax.linen as nn

    class TinyEnc(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(4, 4))(x)
            return nn.Dense(512)(jnp.mean(x, axis=(1, 2)))

    from vn_celeb_face_recognition_tpu.pipeline.engine import (
        FusedRecognitionEngine,
    )

    det = RetinaFace(backbone_cfg="cfg_mnet", nms_cap=64, vis_thres=0.99)
    enc = TinyEnc()
    key = jax.random.PRNGKey(0)
    enc_vars = enc.init(key, jnp.zeros((1, 112, 112, 3)))
    clf = MLPModel(input_dim=512, num_classes=4)
    clf_vars = clf.init(key, jnp.zeros((1, 512)))
    engine = FusedRecognitionEngine(det, enc, enc_vars, clf, clf_vars,
                                    target_fs=112)
    frames = rng.integers(0, 255, size=(2, 128, 128, 3)).astype(np.uint8)
    out = jax.device_get(engine.process(frames))
    assert out["boxes"].shape == (2, 16, 4)
    assert out["pred"].shape == (2, 16)
    assert np.isfinite(out["prob"]).all()


def test_fused_engine_sharded_matches_single(rng):
    """The mesh-sharded engine (frame chunk over 'data', weights
    replicated) must produce the same padded outputs as the
    single-device engine — including for a ragged chunk that needs
    blank-frame padding (batch 6 on an 8-way data axis)."""
    import glob

    import flax.linen as nn
    from PIL import Image

    from vn_celeb_face_recognition_tpu.models import MLPModel, MTCNN
    from vn_celeb_face_recognition_tpu.parallel import make_mesh
    from vn_celeb_face_recognition_tpu.pipeline.engine import (
        FusedRecognitionEngine,
    )

    files = toy_face_files()
    if not files:
        pytest.skip("toy face fixture unavailable")
    face = np.asarray(
        Image.open(files[0]).convert("RGB").resize((80, 80))
    )

    class TinyEnc(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(4, 4))(x)
            return nn.Dense(512)(jnp.mean(x, axis=(1, 2)))

    key = jax.random.PRNGKey(0)
    enc = TinyEnc()
    enc_vars = enc.init(key, jnp.zeros((1, 112, 112, 3)))
    clf = MLPModel(input_dim=512, num_classes=16)
    clf_vars = clf.init(key, jnp.zeros((1, 512)))

    def build(mesh):
        det = MTCNN(min_face_size=40, keep_all=True,
                    pnet_cap_per_scale=128, rnet_cap=64, onet_cap=32,
                    out_cap=4)
        return FusedRecognitionEngine(det, enc, enc_vars, clf, clf_vars,
                                      target_fs=112, mesh=mesh)

    frames = np.full((6, 160, 160, 3), 80, dtype=np.uint8)
    for i in range(6):
        o = 10 * i
        frames[i, 10 + o // 2:90 + o // 2, o:80 + o] = face

    single = jax.device_get(build(None).process(frames))
    mesh = make_mesh(n_data=8, n_model=1)
    sharded_engine = build(mesh)
    sharded = jax.device_get(sharded_engine.process(frames))

    # a divisible chunk (batch 8, same compiled program) really lands
    # distributed across all 8 devices
    frames8 = np.concatenate([frames, frames[:2]])
    out8 = sharded_engine.process(frames8)
    assert len(out8["boxes"].sharding.device_set) == 8

    assert single["valid"].sum() >= 6
    np.testing.assert_array_equal(sharded["valid"], single["valid"])
    for k in ("boxes", "points", "scores", "prob", "embeddings"):
        np.testing.assert_allclose(
            sharded[k], single[k], rtol=1e-4, atol=1e-4, err_msg=k
        )
    np.testing.assert_array_equal(
        sharded["pred"][single["valid"].astype(bool)],
        single["pred"][single["valid"].astype(bool)],
    )
    # outputs were sliced back from the padded batch of 8
    assert sharded["boxes"].shape[0] == 6


def test_fused_engine_face_cap_compaction(rng):
    """face_cap gathers the top-G slots across the chunk: with the
    budget >= the valid-face count, pred/prob/embeddings on VALID
    slots equal the uncapped engine; with a tiny budget, identify()
    raises the overflow warning."""
    import glob
    import warnings

    import flax.linen as nn
    from PIL import Image

    from vn_celeb_face_recognition_tpu.models import MLPModel, MTCNN
    from vn_celeb_face_recognition_tpu.pipeline.engine import (
        FusedRecognitionEngine,
    )

    files = toy_face_files()
    if not files:
        pytest.skip("toy face fixture unavailable")
    face = np.asarray(
        Image.open(files[0]).convert("RGB").resize((80, 80))
    )

    class TinyEnc(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(4, 4))(x)
            return nn.Dense(512)(jnp.mean(x, axis=(1, 2)))

    key = jax.random.PRNGKey(0)
    enc = TinyEnc()
    enc_vars = enc.init(key, jnp.zeros((1, 112, 112, 3)))
    clf = MLPModel(input_dim=512, num_classes=16)
    clf_vars = clf.init(key, jnp.zeros((1, 512)))

    def build(cap):
        det = MTCNN(min_face_size=40, keep_all=True,
                    pnet_cap_per_scale=128, rnet_cap=64, onet_cap=32,
                    out_cap=4)
        return FusedRecognitionEngine(det, enc, enc_vars, clf, clf_vars,
                                      target_fs=112, face_cap=cap)

    frames = np.full((4, 160, 160, 3), 80, dtype=np.uint8)
    for i in range(4):
        frames[i, 20:100, 10 * i:80 + 10 * i] = face

    full = jax.device_get(build(None).process(frames))
    capped = jax.device_get(build(8).process(frames))  # 8 < 4*4 slots

    nvalid = int(full["valid"].sum())
    assert nvalid >= 4
    assert nvalid <= 8  # budget covers every valid face
    np.testing.assert_array_equal(capped["valid"], full["valid"])
    v = full["valid"].astype(bool)
    np.testing.assert_array_equal(capped["pred"][v], full["pred"][v])
    np.testing.assert_allclose(capped["prob"][v], full["prob"][v],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(capped["embeddings"][v],
                               full["embeddings"][v],
                               rtol=1e-5, atol=1e-5)
    assert int(capped["face_cap_overflow"]) == 0

    # overflow: budget below the valid count drops faces and warns
    tiny_engine = build(2)
    tiny = tiny_engine.process(frames)
    import pandas as pd

    df = pd.DataFrame(
        {"label": range(16), "name": [f"P{i}" for i in range(16)]}
    )
    assert int(jax.device_get(tiny["face_cap_overflow"])) == nvalid - 2
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        tiny_engine.identify(tiny, df, 0.0)
    assert any("face_cap" in str(w.message) for w in caught)

    # ---- bucketed compaction + speculative hint ----------------------
    # face_hint=1 forces the FIRST chunk onto the too-small bucket (2);
    # process_adaptive detects the on-device overflow and re-runs the
    # same chunk at the next bucket up, landing output-identical to the
    # uncapped engine. identify() then tracks the observed valid count
    # as the next chunk's hint.
    bucketed = build([2, 8])
    bucketed._face_hint = 1
    first = bucketed.process(frames)
    assert first["_face_cap_used"] == 2
    assert int(jax.device_get(first["face_cap_overflow"])) == nvalid - 2
    adaptive = jax.device_get(bucketed.process_adaptive(frames))
    assert adaptive["_face_cap_used"] == 8
    assert int(adaptive["face_cap_overflow"]) == 0
    np.testing.assert_array_equal(adaptive["pred"][v], full["pred"][v])
    np.testing.assert_allclose(adaptive["embeddings"][v],
                               full["embeddings"][v],
                               rtol=1e-5, atol=1e-5)
    # identify() keeps the hint tracking the observed count
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        bucketed.identify(adaptive, df, 0.0)
    assert bucketed._face_hint == nvalid
    assert bucketed._select_cap(4 * 4) == 8


def test_fused_engine_sharded_with_face_cap(rng):
    """Compaction's global top-k spans the sharded batch: mesh +
    face_cap together must still equal the plain single-device
    engine on valid slots (XLA inserts the cross-shard collectives)."""
    import glob

    import flax.linen as nn
    from PIL import Image

    from vn_celeb_face_recognition_tpu.models import MLPModel, MTCNN
    from vn_celeb_face_recognition_tpu.parallel import make_mesh
    from vn_celeb_face_recognition_tpu.pipeline.engine import (
        FusedRecognitionEngine,
    )

    files = toy_face_files()
    if not files:
        pytest.skip("toy face fixture unavailable")
    face = np.asarray(
        Image.open(files[0]).convert("RGB").resize((80, 80))
    )

    class TinyEnc(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(4, 4))(x)
            return nn.Dense(512)(jnp.mean(x, axis=(1, 2)))

    key = jax.random.PRNGKey(0)
    enc = TinyEnc()
    enc_vars = enc.init(key, jnp.zeros((1, 112, 112, 3)))
    clf = MLPModel(input_dim=512, num_classes=16)
    clf_vars = clf.init(key, jnp.zeros((1, 512)))

    def build(mesh, cap):
        det = MTCNN(min_face_size=40, keep_all=True,
                    pnet_cap_per_scale=128, rnet_cap=64, onet_cap=32,
                    out_cap=4)
        return FusedRecognitionEngine(det, enc, enc_vars, clf, clf_vars,
                                      target_fs=112, mesh=mesh,
                                      face_cap=cap)

    frames = np.full((8, 160, 160, 3), 80, dtype=np.uint8)
    for i in range(8):
        frames[i, 20:100, 8 * i:80 + 8 * i] = face

    single = jax.device_get(build(None, None).process(frames))
    mesh = make_mesh(n_data=8, n_model=1)
    capped = jax.device_get(build(mesh, 16).process(frames))

    nvalid = int(single["valid"].sum())
    assert 8 <= nvalid <= 16
    np.testing.assert_array_equal(capped["valid"], single["valid"])
    v = single["valid"].astype(bool)
    np.testing.assert_array_equal(capped["pred"][v], single["pred"][v])
    np.testing.assert_allclose(capped["embeddings"][v],
                               single["embeddings"][v],
                               rtol=1e-4, atol=1e-4)
    assert int(capped["face_cap_overflow"]) == 0


def test_fused_engine_emotion_head(rng):
    """Optional emotion branch: top-k indices/probs per padded face
    slot, fused into the same program."""
    import flax.linen as nn

    from vn_celeb_face_recognition_tpu.models import MLPModel, MTCNN
    from vn_celeb_face_recognition_tpu.pipeline.engine import (
        FusedRecognitionEngine,
    )
    import glob

    from PIL import Image

    files = toy_face_files()
    if not files:
        pytest.skip("toy face fixture unavailable")
    face = np.asarray(
        Image.open(files[0]).convert("RGB").resize((120, 120))
    )

    class TinyEnc(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(4, 4))(x)
            return nn.Dense(512)(jnp.mean(x, axis=(1, 2)))

    class TinyEmotion(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.Conv(8, (7, 7), strides=(8, 8))(x)
            h = jnp.mean(h, axis=(1, 2))
            return nn.Dense(12, name="fc")(h), nn.Dense(5, name="proj")(h)

    key = jax.random.PRNGKey(0)
    det = MTCNN(min_face_size=40, keep_all=True, pnet_cap_per_scale=128,
                rnet_cap=64, onet_cap=32, out_cap=4)
    enc = TinyEnc(); ev = enc.init(key, jnp.zeros((1, 112, 112, 3)))
    clf = MLPModel(input_dim=512, num_classes=6)
    cv = clf.init(key, jnp.zeros((1, 512)))
    emt = TinyEmotion(); emv = emt.init(key, jnp.zeros((1, 224, 224, 3)))

    engine = FusedRecognitionEngine(
        det, enc, ev, clf, cv, target_fs=112, emotion=emt,
        emotion_variables=emv, emotion_topk=3,
    )
    frames = np.full((1, 224, 224, 3), 90, dtype=np.uint8)
    frames[0, 40:160, 50:170] = face
    out = jax.device_get(engine.process(frames))
    assert out["emotion_idx"].shape == (1, 4, 3)
    assert out["emotion_prob"].shape == (1, 4, 3)
    # probs sorted descending, within [0, 1]
    ep = out["emotion_prob"][0, 0]
    assert (np.diff(ep) <= 1e-6).all()
    assert (ep >= 0).all() and (ep <= 1).all()
