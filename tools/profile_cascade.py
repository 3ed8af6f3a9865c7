"""Stage-level TPU timing for the fused engine's budget table.

Times, each as its own jitted program on the production bench shapes
(640x640, batch 32, production capacity profile):

  pyramid   — the 8 area-resize levels alone
  pnet      — pyramid + PNet forwards (no box work)
  cascade   — the full MTCNN detect program
  warp      — window cut + Umeyama + Pallas warp for out_cap faces
  engine    — the whole fused detect+align+embed+classify program

Timing rules for this rig (CLAUDE.md): one TPU job at a time; fetch a
scalar from the LAST output to drain the in-order queue —
block_until_ready does not track remote completion.

Usage: python tools/profile_cascade.py [--iters=10] [--stages=a,b,...]
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
    from vn_celeb_face_recognition_tpu.models import (
        InceptionResnetV1,
        MLPModel,
        MTCNN,
    )
    from vn_celeb_face_recognition_tpu.models.mtcnn import (
        _fused_pnet_apply,
    )
    from vn_celeb_face_recognition_tpu.ops.image import (
        fixed_image_standardization,
        pyramid_area_resize,
    )
    from vn_celeb_face_recognition_tpu.ops.similarity import (
        umeyama_similarity,
    )
    from vn_celeb_face_recognition_tpu.ops.warp_pallas import (
        batched_similarity_warp_pallas,
    )
    from vn_celeb_face_recognition_tpu.pipeline.engine import (
        FusedRecognitionEngine,
    )

    iters = int(next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--iters=")), 10))
    nf = int(next((a.split("=")[1] for a in sys.argv
                   if a.startswith("--nf=")), 2))
    only = next((a.split("=")[1].split(",") for a in sys.argv
                 if a.startswith("--stages=")), None)

    batch, size = 32, 640
    detector = MTCNN(min_face_size=50, keep_all=True,
                     pnet_cap_per_scale=128, cross_cap=256, rnet_cap=64,
                     onet_cap=32, out_cap=8, dtype=jnp.bfloat16)
    encoder = InceptionResnetV1(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    enc_vars = encoder.init(key, jnp.zeros((1, 112, 112, 3)))
    classifier = MLPModel(input_dim=512, num_classes=1001)
    clf_vars = classifier.init(key, jnp.zeros((1, 512)))
    engine = FusedRecognitionEngine(
        detector, encoder, enc_vars, classifier, clf_vars,
        target_fs=112, compute_dtype=jnp.bfloat16,
        face_cap=batch * 4 + batch,  # bench.py's budget
    )

    frames = build_frames(batch, size, 4)
    frames_dev = jax.device_put(frames)
    det_vars = detector.variables

    scales = detector._scales(size, size)
    sizes = [(int(size * s + 1), int(size * s + 1)) for s in scales]

    @jax.jit
    def variant(x, i):
        return jnp.roll(x, i * 3, axis=2)

    def timeit(name, fn, *args):
        out = fn(*args, 0)
        _drain(out)
        t0 = time.time()
        for i in range(iters):
            out = fn(*args, i)
        _drain(out)
        dt = (time.time() - t0) / iters * 1000.0
        print(f"{name:>10}: {dt:8.2f} ms/chunk")
        return dt

    def _drain(out):
        leaf = jax.tree_util.tree_leaves(out)[-1]
        np.asarray(jax.device_get(leaf)).reshape(-1)[0]

    def stage_pyramid(frames_u8, i):
        imgs = variant(frames_u8, i).astype(jnp.bfloat16)
        acc = jnp.zeros((), jnp.float32)
        for im in pyramid_area_resize(imgs, sizes):
            # sum the WHOLE level: reducing a corner pixel lets XLA
            # dead-code-eliminate the resize (measured ~0 ms net)
            acc = acc + im.sum().astype(jnp.float32)
        return acc

    def stage_pnet(variables, frames_u8, i):
        imgs = variant(frames_u8, i).astype(jnp.bfloat16)
        acc = jnp.zeros((), jnp.float32)
        for im in pyramid_area_resize(imgs, sizes):
            reg, prob = _fused_pnet_apply(
                variables["pnet"], (im - 127.5) * 0.0078125,
                jnp.bfloat16,
            )
            acc = acc + prob[..., 1].sum().astype(jnp.float32) \
                + reg.sum().astype(jnp.float32)
        return acc

    def stage_pypn(variables, frames_u8, i):
        from vn_celeb_face_recognition_tpu.ops.pyramid_pnet_pallas \
            import pyramid_pnet
        imgs = variant(frames_u8, i).astype(jnp.float32)
        acc = jnp.zeros((), jnp.float32)
        for probs1, reg in pyramid_pnet(variables["pnet"], imgs,
                                        sizes, jnp.bfloat16):
            acc = acc + probs1.sum() + reg.sum()
        return acc

    raw_detect = detector._build_detect_fn(batch, size, size)

    def stage_cascade(variables, frames_u8, i):
        out = raw_detect(variables, variant(frames_u8, i))
        return out[0].sum() + out[1].sum()

    fused_det = MTCNN(min_face_size=50, keep_all=True,
                      pnet_cap_per_scale=128, cross_cap=256,
                      rnet_cap=64, onet_cap=32, out_cap=8,
                      dtype=jnp.bfloat16, fused_pyramid_pnet=True)
    raw_detect_fused = fused_det._build_detect_fn(batch, size, size)

    def stage_cascade_fused(variables, frames_u8, i):
        out = raw_detect_fused(variables, variant(frames_u8, i))
        return out[0].sum() + out[1].sum()

    def make_upto(upto):
        raw = fused_det._build_detect_fn(batch, size, size, _upto=upto)

        def fn(variables, frames_u8, i):
            out = raw(variables, variant(frames_u8, i))
            return out[0].sum() + out[1].sum()
        return fn

    def stage_engine(frames_u8, i):
        out = engine.process(variant(frames_u8, i))
        return out["scores"]

    # ---- align (window cut + Umeyama + Pallas warp) on synthetic
    # boxes/landmarks at the engine's face capacity ----
    kfaces = batch * detector.out_cap
    gen = np.random.default_rng(0)
    cx = gen.uniform(120, size - 120, kfaces).astype(np.float32)
    cy = gen.uniform(120, size - 120, kfaces).astype(np.float32)
    lm_t = np.asarray(
        [[-30, -30], [30, -30], [0, 0], [-25, 30], [25, 30]], np.float32
    )
    lms = (np.stack([cx, cy], -1)[:, None, :] + lm_t[None]
           + gen.normal(scale=3.0, size=(kfaces, 5, 2))).astype(
               np.float32)
    image_idx = np.repeat(np.arange(batch, dtype=np.int32),
                          detector.out_cap)
    template = jnp.asarray(engine.template)
    win = engine.face_window

    def stage_warp(frames_u8, lms_in, idx_in, i):
        frames = variant(frames_u8, i).astype(jnp.float32)
        ox = jnp.clip(jnp.round(lms_in[:, 2, 0] - win / 2), 0,
                      size - win)
        oy = jnp.clip(jnp.round(lms_in[:, 2, 1] - win / 2), 0,
                      size - win)

        def cut(idx, oyi, oxi):
            return jax.lax.dynamic_slice(
                frames, (idx, oyi.astype(jnp.int32),
                         oxi.astype(jnp.int32), 0), (1, win, win, 3)
            )[0]

        windows = jax.vmap(cut)(idx_in, oy, ox)
        local = lms_in - jnp.stack([ox, oy], -1)[:, None, :]
        mats = jax.vmap(
            lambda l: umeyama_similarity(l, template)
        )(local)
        faces = batched_similarity_warp_pallas(windows, mats, 112,
                                               faces_per_step=nf)
        return faces.sum()

    faces_fixed = jnp.asarray(
        gen.uniform(0, 255, size=(kfaces, 112, 112, 3)).astype(
            np.float32)
    )

    def stage_embed(enc_v, clf_v, faces_in, i):
        x = fixed_image_standardization(
            faces_in + jnp.float32(i)).astype(jnp.bfloat16)
        emb = encoder.apply(enc_v, x, train=False).astype(jnp.float32)
        logp = classifier.apply(clf_v, emb, train=False)
        return logp.sum()

    def stage_noop(frames_u8, i):
        # isolates the per-iteration variant-roll cost every other
        # stage also pays
        return variant(frames_u8, i)[0, 0, 0, 0].astype(jnp.float32)

    def stage_cut(frames_u8, lms_in, idx_in, i):
        frames = variant(frames_u8, i).astype(jnp.float32)
        ox = jnp.clip(jnp.round(lms_in[:, 2, 0] - win / 2), 0,
                      size - win)
        oy = jnp.clip(jnp.round(lms_in[:, 2, 1] - win / 2), 0,
                      size - win)

        def cut(idx, oyi, oxi):
            return jax.lax.dynamic_slice(
                frames, (idx, oyi.astype(jnp.int32),
                         oxi.astype(jnp.int32), 0), (1, win, win, 3)
            )[0]

        return jax.vmap(cut)(idx_in, oy, ox).sum()

    # ---- cascade sub-stages: crop einsums, NMS fixpoints, topk+gather
    from vn_celeb_face_recognition_tpu.ops import boxes as B
    from vn_celeb_face_recognition_tpu.ops.image import (
        grouped_crop_area_resize,
    )

    def _rand_boxes(key, bsz, kk):
        k1, k2 = jax.random.split(key)
        xy = jax.random.uniform(k1, (bsz, kk, 2), minval=1.0,
                                maxval=size - 120.0)
        wh = jax.random.uniform(k2, (bsz, kk, 2), minval=30.0,
                                maxval=118.0)
        bx = jnp.concatenate([xy, xy + wh], -1)
        return jnp.round(bx)

    bx2 = _rand_boxes(jax.random.PRNGKey(1), batch, detector.rnet_cap)
    bx3 = _rand_boxes(jax.random.PRNGKey(2), batch, detector.onet_cap)
    bxx = _rand_boxes(jax.random.PRNGKey(3), batch, detector.cross_cap)
    scx = jax.random.uniform(jax.random.PRNGKey(4),
                             (batch, detector.cross_cap))
    vlx = jnp.ones(scx.shape, bool)

    def stage_crops(frames_u8, b2, b3, i):
        imgs = variant(frames_u8, i).astype(jnp.float32)
        c2 = grouped_crop_area_resize(imgs, b2, 24)
        c3 = grouped_crop_area_resize(imgs, b3, 48)
        return c2.sum() + c3.sum()

    def stage_nms(bxs, scs, vls, i):
        keep = B.batched_nms_keep_mask(bxs + i, scs, vls, 0.7)
        return keep.sum()

    def stage_topkg(bxs, scs, vls, i):
        def one(bx, sc, vl):
            idx, still = B.top_k_select(sc + i, vl, detector.rnet_cap)
            return bx[idx], sc[idx], still
        b, s, v = jax.vmap(one)(bxs, scs, vls)
        return b.sum() + s.sum() + v.sum()

    stages = {
        "noop": lambda i=0: timeit(
            "noop", jax.jit(stage_noop), frames_dev),
        "crops": lambda i=0: timeit(
            "crops", jax.jit(stage_crops), frames_dev, bx2, bx3),
        "nms": lambda i=0: timeit(
            "nms", jax.jit(stage_nms), bxx, scx, vlx),
        "topkg": lambda i=0: timeit(
            "topkg", jax.jit(stage_topkg), bxx, scx, vlx),
        "cut": lambda i=0: timeit(
            "cut", jax.jit(stage_cut), frames_dev,
            jnp.asarray(lms), jnp.asarray(image_idx)),
        "pyramid": lambda i=0: timeit(
            "pyramid", jax.jit(stage_pyramid), frames_dev),
        "pnet": lambda i=0: timeit(
            "pnet", jax.jit(stage_pnet), det_vars, frames_dev),
        "cascade": lambda i=0: timeit(
            "cascade", jax.jit(stage_cascade), det_vars, frames_dev),
        "pypn": lambda i=0: timeit(
            "pypn", jax.jit(stage_pypn), det_vars, frames_dev),
        "cascade_fused": lambda i=0: timeit(
            "cascade_fused", jax.jit(stage_cascade_fused), det_vars,
            frames_dev),
        "c_s1": lambda i=0: timeit(
            "c_s1", jax.jit(make_upto("s1")), det_vars, frames_dev),
        "c_s2": lambda i=0: timeit(
            "c_s2", jax.jit(make_upto("s2")), det_vars, frames_dev),
        "warp": lambda i=0: timeit(
            "warp", jax.jit(stage_warp), frames_dev,
            jnp.asarray(lms), jnp.asarray(image_idx)),
        "embed": lambda i=0: timeit(
            "embed", jax.jit(stage_embed), enc_vars, clf_vars,
            faces_fixed),
        "engine": lambda i=0: timeit("engine", stage_engine, frames_dev),
    }
    for name, fn in stages.items():
        if only and name not in only:
            continue
        fn()


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
