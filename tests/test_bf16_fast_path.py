"""The bf16 compute paths (the TPU bench/deployment profile) must find
the same faces as the f32 parity paths.

f32 is the reference-parity configuration (pinned elsewhere against
torch); bf16 is what bench.py and production configs run on the MXU.
These tests pin that the fast path is a deployment-grade approximation:
same detection set, box/landmark deltas within bf16 tolerance, and
embedding cosine >= 0.999 (the pipeline contract, SURVEY §6).
"""

import glob

import numpy as np
import pytest

from toy_data import toy_face_files

import jax
import jax.numpy as jnp
from PIL import Image


def _face_image(size=160):
    files = toy_face_files()
    if not files:
        pytest.skip("toy face fixture unavailable")
    face = np.asarray(
        Image.open(files[0]).convert("RGB").resize((100, 100))
    )
    img = np.full((size, size, 3), 70, dtype=np.uint8)
    img[30:130, 28:128] = face
    return img


def test_mtcnn_bf16_cascade_same_faces():
    from vn_celeb_face_recognition_tpu.models import MTCNN

    img = _face_image()
    kwargs = dict(min_face_size=40, keep_all=True,
                  pnet_cap_per_scale=128, rnet_cap=64, onet_cap=32,
                  out_cap=8)
    det32 = MTCNN(**kwargs)
    detbf = MTCNN(dtype=jnp.bfloat16, **kwargs)

    b32, _, p32 = det32.detect([img], landmarks=True)
    bbf, _, pbf = detbf.detect([img], landmarks=True)
    assert len(b32[0]) == len(bbf[0]) == 1
    # the host API wraps per-image results in object arrays (ragged
    # counts); compare as f32. bf16 RNet/ONet regressions move the box
    # by a few px on a ~100px face — a deployment-grade delta.
    f = lambda a: np.asarray(list(a), dtype=np.float32)
    np.testing.assert_allclose(f(bbf[0]), f(b32[0]), atol=4.0)
    np.testing.assert_allclose(f(pbf[0]), f(p32[0]), atol=4.0)


def test_retinaface_bf16_same_detections():
    from vn_celeb_face_recognition_tpu.models import RetinaFace

    img = _face_image()
    # random weights: compare the two dtypes' top-k candidate sets on
    # the same program contract rather than absolute detections
    det32 = RetinaFace(nms_cap=128)
    detbf = RetinaFace(nms_cap=128, dtype=jnp.bfloat16)
    detbf.variables = det32.variables

    b32, s32, p32, v32 = map(
        np.asarray, det32._infer_padded(jnp.asarray(img[None])))
    bbf, sbf, pbf, vbf = map(
        np.asarray, detbf._infer_padded(jnp.asarray(img[None])))
    # random weights cluster scores, so top-k ORDER shuffles between
    # dtypes; compare as sets — every f32 top candidate must have a
    # bf16 counterpart within tolerance (and scores agree sorted)
    k = min(16, v32.shape[1])
    np.testing.assert_allclose(np.sort(sbf[0, :k]), np.sort(s32[0, :k]),
                               atol=0.02)
    for row in b32[0, :8]:
        d = np.abs(bbf[0, :k] - row[None]).max(axis=1).min()
        assert d < 3.0, (row, d)


def test_encoder_bf16_embedding_cosine():
    from vn_celeb_face_recognition_tpu.models import InceptionResnetV1

    key = jax.random.PRNGKey(0)
    enc32 = InceptionResnetV1()
    encbf = InceptionResnetV1(dtype=jnp.bfloat16)
    v = enc32.init(key, jnp.zeros((1, 112, 112, 3)))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 112, 112, 3),
                           minval=-1.0, maxval=1.0)
    e32 = np.asarray(enc32.apply(v, x, train=False))
    ebf = np.asarray(encbf.apply(v, x.astype(jnp.bfloat16), train=False))
    cos = (e32 * ebf).sum(-1) / (
        np.linalg.norm(e32, axis=-1) * np.linalg.norm(ebf, axis=-1)
    )
    assert cos.min() > 0.999, cos


def test_iresnet_bf16_embedding_cosine():
    from vn_celeb_face_recognition_tpu.models import iresnet34

    m32 = iresnet34()
    mbf = iresnet34(dtype=jnp.bfloat16)
    v = m32.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 112, 112, 3),
                           minval=-1.0, maxval=1.0)
    a = np.asarray(m32.apply(v, x, train=False))
    b = np.asarray(mbf.apply(v, x.astype(jnp.bfloat16), train=False))
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert cos.min() > 0.999, cos
