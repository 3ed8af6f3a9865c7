"""Stage-level TPU timing for the RetinaFace cascade's budget.

The production bench's cascade stage reads ~10 ms/chunk under random
weights (worst-case NMS density: every anchor passes conf 0.02). This
splits it, each stage its own jitted program on the bench shapes
(640x640, batch 32, cfg_mnet, nms_cap=1024):

  noop     — per-iteration variant roll + drain floor
  net      — backbone+FPN+SSH+heads forward only
  decode   — net + per-image top-k + box/landmark decode (no NMS)
  nms      — isolated batched fixpoint NMS on [32, 1024] dense random
             boxes (the worst-case shape the full program sees)
  full     — the complete _build_infer_fn program

Timing rules for this rig (CLAUDE.md): one TPU job at a time; fetch a
scalar from the LAST output to drain the in-order queue.

Usage: python tools/profile_retinaface.py [--iters=60] [--stages=a,b,..]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from vn_celeb_face_recognition_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from bench import build_frames
    from vn_celeb_face_recognition_tpu.models import RetinaFace
    from vn_celeb_face_recognition_tpu.ops import boxes as B

    iters = int(next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--iters=")), 60))
    only = next((a.split("=")[1].split(",") for a in sys.argv
                 if a.startswith("--stages=")), None)

    batch, size = 32, 640
    detector = RetinaFace(
        backbone_cfg="cfg_mnet",
        weights_path="vn_celeb_face_recognition_tpu/models/weights/"
                     "retinaface_mnet025.npz",
        dtype=jnp.bfloat16,
    )
    det_vars = detector.variables
    frames_dev = jax.device_put(build_frames(batch, size, 4))
    cap = detector.nms_cap
    priors = jnp.asarray(detector.priors((size, size)))
    variances = tuple(detector.cfg["variance"])
    scale = jnp.array([size, size, size, size], jnp.float32)
    sub = jnp.array(detector.channels_subtract, jnp.float32)

    @jax.jit
    def variant(x, i):
        return jnp.roll(x, i * 3, axis=2)

    def _drain(out):
        leaf = jax.tree_util.tree_leaves(out)[-1]
        np.asarray(jax.device_get(leaf)).reshape(-1)[0]

    def timeit(name, fn, *args):
        out = fn(*args, 0)
        _drain(out)
        t0 = time.time()
        for i in range(iters):
            out = fn(*args, i)
        _drain(out)
        dt = (time.time() - t0) / iters * 1000.0
        print(f"{name:>8}: {dt:8.2f} ms/chunk")
        return dt

    def stage_noop(frames_u8, i):
        return variant(frames_u8, i)[0, 0, 0, 0].astype(jnp.float32)

    def stage_net(variables, frames_u8, i):
        x = variant(frames_u8, i).astype(jnp.float32) - sub
        loc, conf, landms = detector.net.apply(variables, x, train=False)
        return loc.sum() + conf.sum() + landms.sum()

    from vn_celeb_face_recognition_tpu.models.retinaface import (
        MobileNetV1Body,
        MobileNetV1Stage,
    )

    body_mod = MobileNetV1Body(dtype=jnp.bfloat16)
    body_vars = {"params": det_vars["params"]["body"],
                 "batch_stats": det_vars["batch_stats"]["body"]}
    stage1_mod = MobileNetV1Stage(
        (
            ("conv_bn", 3, 8, 2),
            ("conv_dw", 8, 16, 1),
            ("conv_dw", 16, 32, 2),
            ("conv_dw", 32, 32, 1),
            ("conv_dw", 32, 64, 2),
            ("conv_dw", 64, 64, 1),
        ),
        dtype=jnp.bfloat16,
    )
    s1_vars = {"params": det_vars["params"]["body"]["stage1"],
               "batch_stats": det_vars["batch_stats"]["body"]["stage1"]}

    def stage_body(variables, frames_u8, i):
        x = variant(frames_u8, i).astype(jnp.float32) - sub
        s1, s2, s3 = body_mod.apply(variables, x, train=False)
        return s1.sum().astype(jnp.float32) + \
            s2.sum().astype(jnp.float32) + s3.sum().astype(jnp.float32)

    def stage_s1(variables, frames_u8, i):
        x = variant(frames_u8, i).astype(jnp.float32) - sub
        s1 = stage1_mod.apply(variables, x, train=False)
        return s1.sum().astype(jnp.float32)

    def stage_decode(variables, frames_u8, i):
        x = variant(frames_u8, i).astype(jnp.float32) - sub
        loc, conf, landms = detector.net.apply(variables, x, train=False)
        score = conf[..., 1]
        valid = score > detector.conf_thres

        def per_image(lc, ld, sc, vl):
            idx, still = B.top_k_select(sc, vl, cap)
            pr = priors[idx]
            bx = B.decode_boxes(lc[idx], pr, variances) * scale
            pt = B.decode_landmarks(ld[idx], pr, variances)
            return bx.sum() + pt.sum() + sc[idx].sum() + still.sum()

        return jax.vmap(per_image)(loc, landms, score, valid).sum()

    # worst-case NMS shape: every candidate valid, dense random boxes
    gen = np.random.default_rng(0)
    xy = gen.uniform(1.0, size - 120.0, (batch, cap, 2))
    wh = gen.uniform(30.0, 118.0, (batch, cap, 2))
    bxx = jnp.asarray(np.round(
        np.concatenate([xy, xy + wh], -1)).astype(np.float32))
    scx = jnp.asarray(gen.uniform(size=(batch, cap)).astype(np.float32))
    vlx = jnp.ones((batch, cap), bool)

    def stage_nms(bxs, scs, vls, i):
        keep = B.batched_nms_keep_mask(
            bxs + i, scs, vls, detector.nms_thres, offset=1.0)
        return keep.sum()

    raw_infer = detector._build_infer_fn(size, size)

    def stage_full(variables, frames_u8, i):
        bx, sc, pt, vl = raw_infer(variables, variant(frames_u8, i))
        return bx.sum() + sc.sum() + vl.sum()

    stages = {
        "noop": lambda: timeit("noop", jax.jit(stage_noop), frames_dev),
        "net": lambda: timeit(
            "net", jax.jit(stage_net), det_vars, frames_dev),
        "body": lambda: timeit(
            "body", jax.jit(stage_body), body_vars, frames_dev),
        "s1": lambda: timeit(
            "s1", jax.jit(stage_s1), s1_vars, frames_dev),
        "decode": lambda: timeit(
            "decode", jax.jit(stage_decode), det_vars, frames_dev),
        "nms": lambda: timeit(
            "nms", jax.jit(stage_nms), bxx, scx, vlx),
        "full": lambda: timeit(
            "full", jax.jit(stage_full), det_vars, frames_dev),
    }
    for name, fn in stages.items():
        if only and name not in only:
            continue
        fn()


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
