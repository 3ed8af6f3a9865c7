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

    In 2-D the Umeyama problem (min ||dst - (s R src + t)||^2 over
    R in SO(2)) has a CLOSED FORM: with demeaned points, the optimal
    s*cos(theta) and s*sin(theta) are the normalised dot and cross
    correlations. This avoids per-face SVD iterations entirely — the
    vmapped alignment solve for a whole face batch reduces to a few
    fused reductions on the VPU. (Identical to the SVD formulation
    whenever the optimal orthogonal map is a rotation, which the
    reflection guard enforces anyway.)

    Args:
      src: [N, 2] source points (e.g. detected landmarks).
      dst: [N, 2] destination points (e.g. canonical template).

    Returns:
      [2, 3] affine matrix M with dst ~= M[:, :2] @ src + M[:, 2].
    """
    src_mean = jnp.mean(src, axis=0)
    dst_mean = jnp.mean(dst, axis=0)
    src_c = src - src_mean
    dst_c = dst - dst_mean

    den = jnp.maximum(jnp.sum(src_c ** 2), 1e-12)
    # s*cos(theta), s*sin(theta)
    a = jnp.sum(src_c * dst_c) / den
    b = jnp.sum(
        src_c[:, 0] * dst_c[:, 1] - src_c[:, 1] * dst_c[:, 0]
    ) / den

    rot_scale = jnp.array([[a, -b], [b, a]])
    t = dst_mean - rot_scale @ src_mean
    return jnp.concatenate([rot_scale, t[:, None]], axis=1)
