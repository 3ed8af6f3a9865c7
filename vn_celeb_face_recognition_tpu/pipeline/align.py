"""Face alignment: canonical 5-point templates + similarity warp.

Replaces the reference's skimage-estimate + cv2.warpAffine combo
(/root/reference/align_face.py:12-57). The canonical landmark targets
are the published ArcFace/insightface template coordinates per output
size (align_face.py:12-48 — numeric constants, reproduced as data).

Two paths:
  * ``alignment(img, src, dst, w, h)``: single-face host API matching
    the reference signature (estimate dst->src, warp, zero border).
  * ``align_faces_batch``: the TPU path — vmapped Umeyama solves plus a
    batched bilinear warp gather over a padded face set, one jitted
    program for a whole frame batch (no per-face host round trips).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import batched_warp_affine, warp_affine
from ..ops.similarity import umeyama_similarity

center_point_dict = {
    "(96, 112)": np.array(
        [
            [30.2946, 51.6963],
            [65.5318, 51.5014],
            [48.0252, 71.7366],
            [33.5493, 92.3655],
            [62.7299, 92.2041],
        ],
        dtype=np.float32,
    ),
    "(112, 112)": np.array(
        [
            [38.2946, 51.6963],
            [73.5318, 51.5014],
            [56.0252, 71.7366],
            [41.5493, 92.3655],
            [70.7299, 92.2041],
        ],
        dtype=np.float32,
    ),
    "(150, 150)": np.array(
        [
            [51.287415, 69.23612],
            [98.48009, 68.97509],
            [75.03375, 96.075806],
            [55.646385, 123.7038],
            [94.72754, 123.48763],
        ],
        dtype=np.float32,
    ),
    "(160, 160)": np.array(
        [
            [54.706573, 73.85186],
            [105.045425, 73.573425],
            [80.036, 102.48086],
            [59.356144, 131.95071],
            [101.04271, 131.72014],
        ],
        dtype=np.float32,
    ),
    "(224, 224)": np.array(
        [
            [76.589195, 103.3926],
            [147.0636, 103.0028],
            [112.0504, 143.4732],
            [83.098595, 184.731],
            [141.4598, 184.4082],
        ],
        dtype=np.float32,
    ),
}


@lru_cache(maxsize=16)
def _jit_single_align(out_w, out_h):
    @jax.jit
    def run(img, src, dst):
        m = umeyama_similarity(dst, src)
        return warp_affine(img, m, (out_h, out_w))

    return run


def alignment(cv_img, src, dst, dst_w, dst_h):
    """Warp so the detected landmarks ``dst`` land on the canonical
    template ``src`` (reference align_face.py:51-57 argument order).

    cv_img: [H, W, 3] uint8/float array (any channel order — warped
    as-is). Returns the same dtype as the input.
    """
    img = np.asarray(cv_img)
    out = _jit_single_align(int(dst_w), int(dst_h))(
        jnp.asarray(img, jnp.float32),
        jnp.asarray(src, jnp.float32),
        jnp.asarray(dst, jnp.float32),
    )
    out = np.asarray(out)
    if np.issubdtype(img.dtype, np.integer):
        out = np.clip(np.round(out), 0, 255).astype(img.dtype)
    return out


@partial(jax.jit, static_argnames=("out_w", "out_h"))
def _align_batch(images, image_idx, landmarks, template, out_w, out_h):
    mats = jax.vmap(lambda lm: umeyama_similarity(lm, template))(landmarks)
    return batched_warp_affine(images, image_idx, mats, (out_h, out_w))


def align_faces_batch(images, image_idx, landmarks, template, out_size):
    """Batched device alignment.

    images: [B, H, W, 3] float; image_idx: [K] int32; landmarks:
    [K, 5, 2]; template: [5, 2]; out_size: (w, h).
    Returns [K, h, w, 3] aligned crops.
    """
    return _align_batch(
        images, image_idx, landmarks, jnp.asarray(template),
        int(out_size[0]), int(out_size[1]),
    )
