"""RetinaFace detector training: synthetic scenes + jitted SSD step.

The reference ships the train-time box math (match/encode,
retina_face_utils/box_utils.py:96-205) but no detector trainer — its
published checkpoints were trained elsewhere. This module makes
detector training a first-class capability: a host-side synthetic
scene generator (real vendored face crops pasted on varied
backgrounds with exact box + 5-point landmark ground truth) and ONE
jitted train step (forward in train mode -> per-image prior matching
-> MultiBox loss -> optimizer update) built from the previously
unwired pieces ``ops.boxes.match_priors`` and
``training.multibox_loss``.

TPU notes: the step is a single shape-static program (padded GT set,
matching vmapped over the batch on device); batch-norm statistics
update through flax's ``mutable=['batch_stats']`` path and are saved
as the checkpoint's running stats.
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..ops import boxes as B
from .multibox_loss import multibox_loss

# 5-point alignment template of a 112x112 face chip
# (pipeline/align.py center_point_dict["(112, 112)"]) — the landmark
# fallback for crops where the MTCNN probe finds nothing.
_TEMPLATE_112 = np.array(
    [
        [38.2946, 51.6963],
        [73.5318, 51.5014],
        [56.0252, 71.7366],
        [41.5493, 92.3655],
        [70.7299, 92.2041],
    ],
    dtype=np.float32,
)


def template_landmarks(crop_px):
    """Template 5 points scaled to a crop_px-square face crop."""
    return _TEMPLATE_112 / 112.0 * float(crop_px)


def probe_crop_landmarks(crops, mtcnn=None):
    """Per-crop 5-point landmarks via the published-weight MTCNN.

    Runs the in-repo vendored cascade once on the host over each face
    crop; crops where the cascade finds nothing fall back to the
    alignment template. Returns [N, 5, 2] float32 in crop pixels.
    """
    if mtcnn is None:
        from ..models import MTCNN

        mtcnn = MTCNN(min_face_size=40, keep_all=False)
    out = []
    for crop in crops:
        boxes, _, points = mtcnn.detect(crop, landmarks=True)
        if boxes is None or len(boxes) == 0 or points is None:
            out.append(template_landmarks(crop.shape[0]))
        else:
            out.append(np.asarray(points[0], np.float32))
    return np.stack(out)


def synth_scene(rng, size, crops, crop_landmarks, max_faces,
                min_px=48, max_px=224):
    """One synthetic frame with exact detection ground truth.

    Returns (frame u8 [S,S,3], boxes f32 [G,4] xyxy, landms f32 [G,10],
    valid bool [G]). Backgrounds rotate through flat gray / uniform
    noise / a smooth gradient so the confidence head cannot learn a
    trivial constant-background cue; face scale and position are
    uniform within bounds.
    """
    from PIL import Image

    mode = rng.integers(0, 3)
    if mode == 0:
        frame = np.full((size, size, 3), rng.integers(50, 160),
                        dtype=np.uint8)
    elif mode == 1:
        frame = rng.integers(0, 255, size=(size, size, 3),
                             dtype=np.uint8)
    else:
        ramp = np.linspace(rng.integers(0, 100),
                           rng.integers(120, 255), size)
        axis = rng.integers(0, 2)
        plane = ramp[:, None] if axis == 0 else ramp[None, :]
        frame = np.broadcast_to(
            plane[..., None], (size, size, 3)
        ).astype(np.uint8).copy()

    g = int(rng.integers(1, max_faces + 1))
    boxes = np.zeros((max_faces, 4), np.float32)
    landms = np.zeros((max_faces, 10), np.float32)
    valid = np.zeros((max_faces,), bool)
    hi = min(max_px, size - 2)
    for i in range(g):
        px = int(rng.integers(min_px, hi + 1))
        x0 = int(rng.integers(0, size - px))
        y0 = int(rng.integers(0, size - px))
        j = int(rng.integers(0, len(crops)))
        crop = np.asarray(
            Image.fromarray(crops[j]).resize((px, px)), np.uint8
        )
        frame[y0:y0 + px, x0:x0 + px] = crop
        boxes[i] = (x0, y0, x0 + px, y0 + px)
        scale = px / float(crops[j].shape[0])
        pts = crop_landmarks[j] * scale + np.array([x0, y0], np.float32)
        landms[i] = pts.reshape(-1)
        valid[i] = True
    return frame, boxes, landms, valid


def synth_batch(rng, batch, size, crops, crop_landmarks, max_faces=6,
                **kw):
    """Batch of synthetic scenes (normalised GT boxes/landmarks, as
    ``match_priors`` expects — priors are in normalised cxcywh)."""
    frames = np.empty((batch, size, size, 3), np.uint8)
    boxes = np.empty((batch, max_faces, 4), np.float32)
    landms = np.empty((batch, max_faces, 10), np.float32)
    valid = np.empty((batch, max_faces), bool)
    for b in range(batch):
        frames[b], boxes[b], landms[b], valid[b] = synth_scene(
            rng, size, crops, crop_landmarks, max_faces, **kw)
    labels = valid.astype(np.int32)  # 1 = face with landmarks
    return (frames, boxes / size, labels, landms / size, valid)


def make_detection_train_step(net, priors, variances, tx,
                              match_thresh=0.35, neg_pos_ratio=7.0,
                              loc_weight=2.0,
                              sub=(104.0, 117.0, 123.0)):
    """One jitted detector train step.

    ``net`` must be a ``phase='train'`` RetinaFaceNet (raw conf
    logits). Matching runs on device, vmapped over the batch; the
    match threshold / mining ratio / loc weight default to the
    cfg_mnet training recipe (reference train.py + multibox loss
    conventions).
    """
    priors = jnp.asarray(priors)
    sub = jnp.asarray(sub, jnp.float32)

    def loss_fn(params, batch_stats, imgs_u8, truths, labels, landms,
                tvalid):
        x = imgs_u8.astype(jnp.float32) - sub
        (loc, conf, landm), mutated = net.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            train=True, mutable=["batch_stats"],
        )
        loc_t, conf_t, landm_t = jax.vmap(
            lambda t, l, lm, v: B.match_priors(
                t, l, lm, priors, variances, match_thresh, v)
        )(truths, labels, landms, tvalid)
        losses = multibox_loss(
            (loc, conf, landm), (loc_t, conf_t, landm_t),
            neg_pos_ratio=neg_pos_ratio, loc_weight=loc_weight,
        )
        return losses["loss"], (losses, mutated["batch_stats"])

    @jax.jit
    def step(params, batch_stats, opt_state, imgs_u8, truths, labels,
             landms, tvalid):
        grads, (losses, batch_stats) = jax.grad(
            loss_fn, has_aux=True
        )(params, batch_stats, imgs_u8, truths, labels, landms, tvalid)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, batch_stats, opt_state, losses

    return step


def make_eval_fns(rf, batch, size):
    """Build the two jitted eval programs ONCE (remote TPU compiles
    cost minutes each; re-tracing per eval is free on CPU but not
    here): a conf-score pass and the full detect path."""
    sub = jnp.asarray(rf.channels_subtract, jnp.float32)

    @jax.jit
    def conf_fn(variables, imgs_u8):
        x = imgs_u8.astype(jnp.float32) - sub
        _, conf, _ = rf.net.apply(variables, x, train=False)
        return conf[..., 1]

    return conf_fn, rf._build_detect_fn(batch, size, size)


def conf_sparsity(rf, frames_u8, conf_thres=None, conf_fn=None):
    """Mean anchors per frame passing the confidence filter — the
    quantity that drives the NMS fixpoint's convergence cost (dense
    random-weight confidences are its worst case)."""
    conf_thres = rf.conf_thres if conf_thres is None else conf_thres
    if conf_fn is None:
        conf_fn, _ = make_eval_fns(rf, *frames_u8.shape[:2])
    score = np.asarray(conf_fn(rf.variables, jnp.asarray(frames_u8)))
    return float((score > conf_thres).sum(axis=1).mean())


def detection_recall(rf, frames_u8, gt_boxes, gt_valid, iou=0.5,
                     detect_fn=None):
    """Fraction of GT faces matched (IoU>=iou) by an above-vis_thres
    detection from the full detect path (decode -> top-k -> NMS)."""
    fn = detect_fn or rf._build_detect_fn(*frames_u8.shape[:3])
    boxes, scores, _, valid = jax.device_get(
        fn(rf.variables, jnp.asarray(frames_u8)))
    hit = 0
    total = 0
    for b in range(frames_u8.shape[0]):
        det = boxes[b][valid[b]]
        for g in np.nonzero(gt_valid[b])[0]:
            total += 1
            gt = gt_boxes[b, g]
            if det.size == 0:
                continue
            x1 = np.maximum(det[:, 0], gt[0])
            y1 = np.maximum(det[:, 1], gt[1])
            x2 = np.minimum(det[:, 2], gt[2])
            y2 = np.minimum(det[:, 3], gt[3])
            inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
            a_det = (det[:, 2] - det[:, 0]) * (det[:, 3] - det[:, 1])
            a_gt = (gt[2] - gt[0]) * (gt[3] - gt[1])
            if (inter / (a_det + a_gt - inter + 1e-9)).max() >= iou:
                hit += 1
    return hit / max(total, 1)
