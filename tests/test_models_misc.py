"""ArcMargin + SE-IR encoder unit tests."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vn_celeb_face_recognition_tpu.models import ArcMarginModel, resnet101


def test_arcmargin_math(rng):
    """s*cos(theta+m) applied exactly on the target class, plain
    s*cos(theta) elsewhere (reference resnet_encoder.py:283-297)."""
    n_classes, emb = 7, 16
    model = ArcMarginModel(num_classes=n_classes, emb_size=emb,
                           margin_m=0.5, margin_s=64.0)
    x = rng.normal(size=(4, emb)).astype(np.float32)
    y = rng.integers(0, n_classes, size=4).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(y))
    out = np.asarray(model.apply(variables, jnp.asarray(x),
                                 jnp.asarray(y)))
    w = np.asarray(variables["params"]["weight"])
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    wn = w / np.linalg.norm(w, axis=1, keepdims=True)
    cos = xn @ wn.T
    th = math.cos(math.pi - 0.5)
    mm = math.sin(math.pi - 0.5) * 0.5
    for i in range(4):
        for j in range(n_classes):
            c = cos[i, j]
            if j == int(y[i]):
                phi = c * math.cos(0.5) - math.sqrt(
                    max(1 - c * c, 0)) * math.sin(0.5)
                want = phi if c > th else c - mm
            else:
                want = c
            assert abs(out[i, j] - 64.0 * want) < 1e-3


def test_resnet_se_forward_shapes(rng):
    model = resnet101(use_se=True)
    x = jnp.asarray(
        rng.uniform(-1, 1, size=(1, 112, 112, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 512)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-4
    )
