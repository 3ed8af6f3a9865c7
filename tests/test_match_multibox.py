"""Train-time matching parity vs the reference box_utils.match, plus
MultiBox loss sanity."""

import numpy as np
import pytest

import jax.numpy as jnp

from vn_celeb_face_recognition_tpu.ops import boxes as B
from vn_celeb_face_recognition_tpu.training.multibox_loss import (
    multibox_loss,
)

torch = pytest.importorskip("torch")


@pytest.mark.slow
def test_match_parity_with_reference(rng):
    from ref_oracle import load_ref_module

    box_utils = load_ref_module("retina_face_utils.box_utils")

    priors = B.make_priors((64, 64), [[16, 32], [64, 128]], [8, 16])
    p = priors.shape[0]
    g = 3
    centers = rng.uniform(0.2, 0.8, size=(g, 2))
    sizes = rng.uniform(0.1, 0.3, size=(g, 2))
    truths = np.concatenate(
        [centers - sizes / 2, centers + sizes / 2], axis=1
    ).astype(np.float32)
    labels = np.array([1, -1, 1], dtype=np.int32)
    landms = rng.uniform(0.2, 0.8, size=(g, 10)).astype(np.float32)
    variances = [0.1, 0.2]
    threshold = 0.35

    # reference (torch, in-place output buffers)
    loc_t = torch.zeros(1, p, 4)
    conf_t = torch.zeros(1, p, dtype=torch.long)
    landm_t = torch.zeros(1, p, 10)
    box_utils.match(
        threshold,
        torch.from_numpy(truths),
        torch.from_numpy(np.asarray(priors)),
        variances,
        torch.from_numpy(labels.astype(np.int64)),
        torch.from_numpy(landms),
        loc_t,
        conf_t,
        landm_t,
        0,
    )

    got_loc, got_conf, got_landm = B.match_priors(
        jnp.asarray(truths), jnp.asarray(labels), jnp.asarray(landms),
        jnp.asarray(priors), tuple(variances), threshold,
    )
    np.testing.assert_array_equal(np.asarray(got_conf),
                                  conf_t[0].numpy())
    np.testing.assert_allclose(np.asarray(got_loc), loc_t[0].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_landm), landm_t[0].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_multibox_loss_behaviour(rng):
    p = 128
    loc_t = rng.normal(size=(2, p, 4)).astype(np.float32)
    landm_t = rng.normal(size=(2, p, 10)).astype(np.float32)
    conf_t = np.zeros((2, p), dtype=np.int32)
    conf_t[:, :5] = 1
    conf_t[:, 5:7] = -1

    # perfect localisation, confident correct classification
    good_conf = np.zeros((2, p, 2), dtype=np.float32)
    good_conf[..., 0] = 8.0
    good_conf[conf_t != 0, 0] = 0.0
    good_conf[conf_t != 0, 1] = 8.0
    out_good = multibox_loss(
        (jnp.asarray(loc_t), jnp.asarray(good_conf), jnp.asarray(landm_t)),
        (jnp.asarray(loc_t), jnp.asarray(conf_t), jnp.asarray(landm_t)),
    )
    # garbage predictions
    bad = multibox_loss(
        (
            jnp.asarray(loc_t + 3.0),
            jnp.asarray(-good_conf),
            jnp.asarray(landm_t + 3.0),
        ),
        (jnp.asarray(loc_t), jnp.asarray(conf_t), jnp.asarray(landm_t)),
    )
    assert float(out_good["loss"]) < 0.1
    assert float(bad["loss"]) > float(out_good["loss"]) + 1.0
    for k in ("loss_loc", "loss_conf", "loss_landm"):
        assert np.isfinite(float(out_good[k]))
