"""Analytic per-stage FLOP audit for the bench configurations.

Lowers each pipeline stage (cascade, encoder, classifier, emotion) and
the FULL fused engine program on the CPU backend and reads XLA's
analytic ``cost_analysis()['flops']`` — backend-independent HLO flop
counts (the op-level arithmetic, not a measurement). The align/warp +
glue share is the full-program count minus the named stages.

Results are cached in ``bench_flops.json`` at the repo root, keyed by
the bench configuration, and committed — bench.py reads the table to
report MFU (achieved TFLOP/s over the v5e bf16 peak) without paying a
CPU lowering at bench time. Regenerate after touching the models:

    python tools/flops_audit.py                     # default config
    python tools/flops_audit.py --production        # + every preset
    python tools/flops_audit.py --detector=retinaface --encoder=iresnet100

Caveat: on CPU the engine lowers the XLA 3-shear warp (the TPU run
uses the Pallas kernel, an opaque custom call to XLA's counter); the
two implement the same shear/matmul algorithm, so the analytic count
stands for both within a few percent.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLE_PATH = os.path.join(REPO_ROOT, "bench_flops.json")


def config_key(det, enc, emotion, batch, size, face_cap, num_classes,
               target_fs=112):
    return (f"det={det}|enc={enc}|emotion={int(bool(emotion))}"
            f"|batch={batch}|size={size}|face_cap={face_cap}"
            f"|nc={num_classes}|tfs={target_fs}")


def _flops(lowerable, *args, **kwargs):
    import jax

    compiled = jax.jit(lowerable).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"])


def audit(det_kind="mtcnn", enc_kind="facenet", emotion=False,
          batch=32, size=640, faces_per_frame=4, face_cap=None,
          num_classes=1001, target_fs=112, log=True):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from vn_celeb_face_recognition_tpu.models import (
        InceptionResnetV1,
        MLPModel,
        MTCNN,
        RetinaFace,
        iresnet100,
    )
    from vn_celeb_face_recognition_tpu.pipeline.engine import (
        FusedRecognitionEngine,
    )

    if face_cap is None:
        face_cap = batch * faces_per_frame + batch

    if det_kind == "retinaface":
        detector = RetinaFace(backbone_cfg="cfg_mnet",
                              dtype=jnp.bfloat16)
    elif det_kind == "mtcnn_stock":
        # the reference's stock demo config (bench.py's stock line)
        detector = MTCNN(min_face_size=20, keep_all=True, out_cap=8,
                         dtype=jnp.bfloat16)
    else:
        detector = MTCNN(min_face_size=50, keep_all=True,
                         pnet_cap_per_scale=128, cross_cap=256,
                         rnet_cap=64, onet_cap=32, out_cap=8,
                         dtype=jnp.bfloat16)
    if enc_kind == "iresnet100":
        encoder = iresnet100(dtype=jnp.bfloat16)
    else:
        encoder = InceptionResnetV1(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    enc_vars = encoder.init(key, jnp.zeros((1, target_fs, target_fs, 3)))
    classifier = MLPModel(input_dim=512, num_classes=num_classes)
    clf_vars = classifier.init(key, jnp.zeros((1, 512)))

    emotion_mod = emotion_vars = None
    if emotion:
        from vn_celeb_face_recognition_tpu.models import (
            resnet_2branch_50,
        )

        emotion_mod = resnet_2branch_50(num_classes=690,
                                        dtype=jnp.bfloat16)
        emotion_vars = emotion_mod.init(
            key, jnp.zeros((1, 224, 224, 3))
        )

    engine = FusedRecognitionEngine(
        detector, encoder, enc_vars, classifier, clf_vars,
        target_fs=target_fs, compute_dtype=jnp.bfloat16,
        face_cap=face_cap, emotion=emotion_mod,
        emotion_variables=emotion_vars, use_pallas_warp=False,
    )

    frames = jnp.zeros((batch, size, size, 3), jnp.uint8)

    stage = {}
    if log:
        print(f"[flops] lowering cascade ({det_kind}) ...")
    raw_detect = detector._build_detect_fn(batch, size, size)
    stage["cascade"] = _flops(
        lambda v, f: raw_detect(v, f), detector.variables, frames
    )
    if log:
        print(f"[flops] lowering encoder ({enc_kind}) ...")
    faces = jnp.zeros((face_cap, target_fs, target_fs, 3), jnp.float32)
    stage["encoder"] = _flops(
        lambda v, x: encoder.apply(v, x, train=False), enc_vars, faces
    )
    if log:
        print("[flops] lowering classifier ...")
    stage["classifier"] = _flops(
        lambda v, e: classifier.apply(v, e, train=False),
        clf_vars, jnp.zeros((face_cap, 512), jnp.float32),
    )
    if emotion:
        if log:
            print("[flops] lowering emotion head ...")
        stage["emotion"] = _flops(
            lambda v, x: emotion_mod.apply(v, x, train=False),
            emotion_vars,
            jnp.zeros((face_cap, 224, 224, 3), jnp.float32),
        )
    if log:
        print("[flops] lowering full engine program ...")
    cap = face_cap if face_cap < batch * detector.out_cap else None
    total = _flops(
        engine._build(batch, size, size, cap),
        detector.variables, enc_vars, clf_vars, frames,
    )
    named = sum(stage.values())
    stage["warp_glue"] = max(total - named, 0.0)

    entry = {
        "total_flops": total,
        "stage_flops": stage,
        "batch": batch,
        "face_cap": face_cap,
    }
    key_str = config_key(det_kind, enc_kind, emotion, batch, size,
                         face_cap, num_classes, target_fs)
    table = {}
    if os.path.exists(TABLE_PATH):
        with open(TABLE_PATH) as fh:
            table = json.load(fh)
    table[key_str] = entry
    with open(TABLE_PATH, "w") as fh:
        json.dump(table, fh, indent=1, sort_keys=True)
    if log:
        print(f"[flops] {key_str}")
        for name, fl in sorted(stage.items(), key=lambda kv: -kv[1]):
            print(f"[flops]   {name:<10} {fl / 1e9:10.2f} GFLOP "
                  f"({100 * fl / total:5.1f}%)")
        print(f"[flops]   total      {total / 1e9:10.2f} GFLOP "
              f"-> {TABLE_PATH}")
    return entry


def audit_train(enc_kind="iresnet100", batch=256, num_classes=1001,
                target_fs=112, log=True):
    """Analytic FLOPs of bench.py's --train step (aug + frozen encoder
    fwd + MLP fwd/bwd/update), CPU-lowered like the inference stages."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from vn_celeb_face_recognition_tpu.training.aug_step import (
        make_aug_train_step,
    )

    # the SAME program bench.py --train times (shared builder — the
    # MFU is only honest if timed and counted steps cannot drift)
    train_step, variables, opt_state = make_aug_train_step(
        enc_kind, num_classes, target_fs)

    if log:
        print(f"[flops] lowering train step ({enc_kind}, batch "
              f"{batch}) ...")
    total = _flops(
        train_step, variables, opt_state,
        jnp.zeros((batch, target_fs, target_fs, 3), jnp.uint8),
        jnp.zeros((batch,), jnp.int32),
        jnp.ones((batch,), jnp.float32),
        jax.random.PRNGKey(1),
    )
    key_str = (f"train|enc={enc_kind}|batch={batch}|nc={num_classes}"
               f"|tfs={target_fs}")
    entry = {"total_flops": total, "stage_flops": {"train": total},
             "batch": batch}
    table = {}
    if os.path.exists(TABLE_PATH):
        with open(TABLE_PATH) as fh:
            table = json.load(fh)
    table[key_str] = entry
    with open(TABLE_PATH, "w") as fh:
        json.dump(table, fh, indent=1, sort_keys=True)
    if log:
        print(f"[flops] {key_str}: {total / 1e9:.2f} GFLOP/step "
              f"-> {TABLE_PATH}")
    return entry


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--detector", default="mtcnn")
    # per-mode defaults filled after parsing: inference lines audit
    # facenet/batch-32, --train audits bench.py's train line
    # (iresnet100/batch-256) so the obvious regeneration command writes
    # the exact key bench.run_train looks up
    p.add_argument("--encoder", default=None)
    p.add_argument("--emotion", action="store_true")
    p.add_argument("--batch", default=None, type=int)
    p.add_argument("--size", default=640, type=int)
    p.add_argument("--faces_per_frame", default=4, type=int)
    p.add_argument("--face_cap", default=None, type=int)
    p.add_argument("--num_classes", default=1001, type=int)
    p.add_argument("--target_fs", default=112, type=int)
    p.add_argument("--all_presets", action="store_true",
                   help="audit the default, retinaface, iresnet100 and "
                        "production bench lines in one go")
    p.add_argument("--train", action="store_true",
                   help="audit the online-aug train step instead")
    args = p.parse_args(argv)

    if args.train:
        audit_train(args.encoder or "iresnet100", args.batch or 256,
                    args.num_classes, args.target_fs)
        return 0
    if args.encoder is None:
        args.encoder = "facenet"
    if args.batch is None:
        args.batch = 32

    if args.all_presets:
        # two caps per preset: the steady compaction bucket (= the
        # bench's pasted-face count) and the legacy safety bucket
        caps = (args.batch * args.faces_per_frame,
                args.batch * args.faces_per_frame + args.batch)
        for cap in caps:
            audit("mtcnn", "facenet", False, args.batch, args.size,
                  face_cap=cap, num_classes=1001)
            audit("retinaface", "facenet", False, args.batch,
                  args.size, face_cap=cap, num_classes=1001)
            audit("mtcnn", "iresnet100", False, args.batch, args.size,
                  face_cap=cap, num_classes=1001)
            audit("retinaface", "iresnet100", True, args.batch,
                  args.size, face_cap=cap, num_classes=1020)
        return 0
    audit(args.detector, args.encoder, args.emotion, args.batch,
          args.size, args.faces_per_frame, args.face_cap,
          args.num_classes, args.target_fs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
