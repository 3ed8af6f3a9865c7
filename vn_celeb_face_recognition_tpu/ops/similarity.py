"""Closed-form Umeyama similarity-transform estimation in JAX.

Replaces ``skimage.transform.SimilarityTransform.estimate`` in the
alignment solve (/root/reference/align_face.py:51-57): given 5 detected
face landmarks and the canonical 5-point template, produce the 2x3
similarity (rotation + isotropic scale + translation) that maps the
detected points onto the template, in least-squares sense (Umeyama 1991).

Jittable and vmap-able over a padded face capacity, so a whole frame
batch's alignment solves run as one fused device computation instead of
one skimage call per face.
"""

import jax.numpy as jnp


def umeyama_similarity(src, dst):
    """Least-squares similarity transform mapping src -> dst.

    Args:
      src: [N, 2] source points (e.g. detected landmarks).
      dst: [N, 2] destination points (e.g. canonical template).

    Returns:
      [2, 3] affine matrix M with dst ~= M[:, :2] @ src + M[:, 2].
    """
    n = src.shape[0]
    src_mean = jnp.mean(src, axis=0)
    dst_mean = jnp.mean(dst, axis=0)
    src_c = src - src_mean
    dst_c = dst - dst_mean

    # Covariance of the demeaned point sets.
    cov = dst_c.T @ src_c / n  # [2, 2]
    u, s, vt = jnp.linalg.svd(cov)

    # Reflection guard: d = sign(det(U) * det(V)).
    det_sign = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    d = jnp.array([1.0, 1.0]) * jnp.array([1.0, 0.0]) + jnp.array(
        [0.0, 1.0]
    ) * det_sign
    rot = u @ jnp.diag(d) @ vt

    var_src = jnp.mean(jnp.sum(src_c ** 2, axis=1))
    scale = jnp.sum(s * d) / jnp.maximum(var_src, 1e-12)

    t = dst_mean - scale * rot @ src_mean
    m = jnp.concatenate([scale * rot, t[:, None]], axis=1)
    return m
