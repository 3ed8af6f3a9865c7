"""SSD-style MultiBox loss for detector training (RetinaFace recipe).

The reference ships the train-time box math (match / encode,
retina_face_utils/box_utils.py:96-205) but no detector trainer; this
provides the standard loss those targets feed: smooth-L1 localisation
(weight ``loc_weight``, cfg 2.0), softmax confidence with hard negative
mining at ``neg_pos_ratio`` 7:1, and smooth-L1 landmark regression on
landmark-valid positives — all shape-static (masked top-k mining
instead of per-image sorting loops).
"""

import jax
import jax.numpy as jnp


def smooth_l1(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def multibox_loss(predictions, targets, neg_pos_ratio=7.0,
                  loc_weight=2.0):
    """Args:
      predictions: (loc [B,P,4], conf_logits [B,P,2], landm [B,P,10]).
      targets: (loc_t [B,P,4], conf_t [B,P] int, landm_t [B,P,10]) from
        ops.boxes.match_priors; conf_t: 0 background, 1 face,
        -1 face-without-landmarks.

    Returns dict(loss, loss_loc, loss_conf, loss_landm).
    """
    loc, conf, landm = predictions
    loc_t, conf_t, landm_t = targets

    pos_landm = conf_t > 0
    pos = conf_t != 0  # faces with or without landmarks

    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    n_pos_landm = jnp.maximum(jnp.sum(pos_landm), 1.0)

    loss_landm = jnp.sum(
        smooth_l1(landm - landm_t).sum(-1) * pos_landm
    ) / n_pos_landm
    loss_loc = jnp.sum(smooth_l1(loc - loc_t).sum(-1) * pos) / n_pos

    # classification with hard negative mining
    labels = (conf_t != 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(conf, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]

    neg_scores = jnp.where(pos, -jnp.inf, ce)  # rank negatives by loss
    n_pos_per_img = jnp.sum(pos, axis=1)
    n_neg_per_img = jnp.minimum(
        (neg_pos_ratio * n_pos_per_img).astype(jnp.int32),
        pos.shape[1] - 1,
    )

    # a negative is mined iff its loss rank (desc) < n_neg for its image
    order = jnp.argsort(-neg_scores, axis=1)
    ranks = jnp.argsort(order, axis=1)
    neg = (~pos) & (ranks < n_neg_per_img[:, None])

    chosen = pos | neg
    loss_conf = jnp.sum(ce * chosen) / n_pos

    total = loc_weight * loss_loc + loss_conf + loss_landm
    return {
        "loss": total,
        "loss_loc": loss_loc,
        "loss_conf": loss_conf,
        "loss_landm": loss_landm,
    }
