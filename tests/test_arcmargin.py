"""ArcMargin head parity + semantics (reference resnet_encoder.py:264-297).

The reference never wires ArcMarginModel into a training config, but it
is part of the public surface, so pin it: (1) exact numeric parity vs
the torch head with a shared weight matrix, (2) the margin semantics —
the target-class logit is penalised by the additive angular margin,
non-target logits are plain scaled cosines.
"""

import math
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vn_celeb_face_recognition_tpu.models.resnet_encoder import (
    ArcMarginModel,
)

torch = pytest.importorskip("torch")


def _make_ref(num_classes, emb_size, margin_m, margin_s, easy_margin):
    from ref_oracle import load_ref_module

    ref_mod = load_ref_module("resnet_encoder")
    args = types.SimpleNamespace(
        emb_size=emb_size,
        easy_margin=easy_margin,
        margin_m=margin_m,
        margin_s=margin_s,
    )
    return ref_mod.ArcMarginModel(args, torch.device("cpu"), num_classes)


@pytest.mark.parametrize("easy_margin", [False, True])
def test_arcmargin_matches_reference(rng, easy_margin):
    num_classes, emb, batch = 37, 64, 12
    margin_m, margin_s = 0.5, 64.0

    torch.manual_seed(0)
    ref = _make_ref(num_classes, emb, margin_m, margin_s, easy_margin)
    ref.eval()
    weight = ref.weight.detach().numpy().copy()

    x = rng.normal(size=(batch, emb)).astype(np.float32)
    label = rng.integers(0, num_classes, size=(batch,))
    with torch.no_grad():
        want = ref(
            torch.from_numpy(x), torch.from_numpy(label.astype(np.int64))
        ).numpy()

    model = ArcMarginModel(
        num_classes=num_classes,
        emb_size=emb,
        margin_m=margin_m,
        margin_s=margin_s,
        easy_margin=easy_margin,
    )
    variables = {"params": {"weight": jnp.asarray(weight)}}
    got = np.asarray(
        model.apply(variables, jnp.asarray(x), jnp.asarray(label))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_arcmargin_margin_semantics(rng):
    """Target logit = s*cos(theta+m) when cos(theta) > cos(pi-m);
    every non-target logit = s*cos(theta)."""
    num_classes, emb, batch = 11, 32, 6
    m, s = 0.5, 64.0
    model = ArcMarginModel(
        num_classes=num_classes, emb_size=emb, margin_m=m, margin_s=s
    )
    x = rng.normal(size=(batch, emb)).astype(np.float32)
    label = rng.integers(0, num_classes, size=(batch,))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(label)
    )
    out = np.asarray(
        model.apply(variables, jnp.asarray(x), jnp.asarray(label))
    )

    w = np.asarray(variables["params"]["weight"])
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    wn = w / np.linalg.norm(w, axis=1, keepdims=True)
    cosine = xn @ wn.T

    rows = np.arange(batch)
    off = out.copy()
    off[rows, label] = np.nan
    cos_off = cosine.copy()
    cos_off[rows, label] = np.nan
    mask = ~np.isnan(off)
    np.testing.assert_allclose(
        off[mask], (s * cos_off)[mask], rtol=1e-4, atol=1e-4
    )

    theta = np.arccos(np.clip(cosine[rows, label], -1.0, 1.0))
    in_range = cosine[rows, label] > math.cos(math.pi - m)
    expect_target = np.where(
        in_range,
        s * np.cos(theta + m),
        s * (cosine[rows, label] - math.sin(math.pi - m) * m),
    )
    np.testing.assert_allclose(
        out[rows, label], expect_target, rtol=1e-4, atol=1e-4
    )
    # the margin strictly lowers the target logit for in-range angles
    assert (out[rows, label] < s * cosine[rows, label] + 1e-5).all()


def test_arcmargin_gradients_flow(rng):
    """The head trains: cross-entropy through ArcMargin produces a
    finite, nonzero gradient for both the weight and the embedding."""
    import optax

    num_classes, emb, batch = 7, 16, 5
    model = ArcMarginModel(num_classes=num_classes, emb_size=emb)
    x = jnp.asarray(rng.normal(size=(batch, emb)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, num_classes, size=(batch,)))
    variables = model.init(jax.random.PRNGKey(1), x, label)

    def loss_fn(params, x):
        logits = model.apply({"params": params}, x, label)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, label
        ).mean()

    (loss, gx), gw = (
        jax.value_and_grad(loss_fn, argnums=1)(variables["params"], x),
        jax.grad(loss_fn)(variables["params"], x),
    )
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(gx)).all() and np.abs(gx).max() > 0
    gwv = np.asarray(gw["weight"])
    assert np.isfinite(gwv).all() and np.abs(gwv).max() > 0
