"""Fit RetinaFace(cfg_mnet) on synthetic scenes and vendor the npz.

Closes the bench's random-weight artifact: with random weights every
anchor passes the conf filter (the Jacobi NMS fixpoint's worst case,
~18% of the production chunk); a detector fitted until confidences are
sparse makes the flagship bench line representative of real-weight
deployment, and arms the production recall assertion in
``__graft_entry__.dryrun_multichip``.

The published checkpoint (biubug6 Retinaface mobilenet0.25, see
WEIGHTS.md) cannot be downloaded in this zero-egress environment;
this fit trains the SAME architecture from scratch on the vendored
toy face crops pasted over varied backgrounds (exact box + landmark
ground truth; landmarks probed once by the in-repo published-weight
MTCNN). The exported npz uses the same torch-keyed format the real
conversion produces (models/torch_convert.flax_to_torch_state_dict),
so `RetinaFace(weights_path=...)` loads either interchangeably and
the published npz can simply overwrite this file the day egress
exists.

Usage (CPU is the intended device — the TPU stays free):
  python tools/fit_detector.py --steps 1500 --out \
      vn_celeb_face_recognition_tpu/models/weights/retinaface_mnet025.npz
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def load_crops(face_px=None):
    from PIL import Image

    files = sorted(glob.glob(os.path.join(ROOT, "data", "*.png")))
    if not files:
        raise FileNotFoundError("no vendored face crops under data/")
    return [np.asarray(Image.open(f).convert("RGB"), np.uint8)
            for f in files]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--max_faces", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--device", "-dv", default="CPU",
                    help="jax platform (default CPU: leaves the TPU "
                         "free; the step is one jitted program either "
                         "way)")
    ap.add_argument("--landmarks_cache", default=os.path.join(
        ROOT, "meta_data", "crop_landmarks.npz"),
        help="npz cache of the MTCNN-probed crop landmarks (the probe "
             "costs per-crop cascade compiles on a remote-compile TPU)")
    ap.add_argument("--out", default=os.path.join(
        ROOT, "vn_celeb_face_recognition_tpu", "models", "weights",
        "retinaface_mnet025.npz"))
    args = ap.parse_args()

    from vn_celeb_face_recognition_tpu.utils import select_platform
    from vn_celeb_face_recognition_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    select_platform(args.device)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from vn_celeb_face_recognition_tpu.models import RetinaFace
    from vn_celeb_face_recognition_tpu.models.retinaface import (
        RetinaFaceNet,
        cfg_mnet,
    )
    from vn_celeb_face_recognition_tpu.models.torch_convert import (
        convert_state_dict,
        flax_to_torch_state_dict,
    )
    from vn_celeb_face_recognition_tpu.ops import boxes as B
    from vn_celeb_face_recognition_tpu.training.detector import (
        conf_sparsity,
        detection_recall,
        make_detection_train_step,
        make_eval_fns,
        probe_crop_landmarks,
        synth_batch,
    )

    rng = np.random.default_rng(args.seed)
    crops = load_crops()
    if args.landmarks_cache and os.path.exists(args.landmarks_cache):
        cached = np.load(args.landmarks_cache)
        crop_landmarks = cached["landmarks"]
        assert crop_landmarks.shape[0] == len(crops), (
            "landmark cache is stale: re-run with --landmarks_cache "
            "pointing at a fresh path")
        print(f"[fit] loaded cached crop landmarks "
              f"({args.landmarks_cache})")
    else:
        print(f"[fit] probing landmarks on {len(crops)} vendored "
              "crops with the published-weight MTCNN ...")
        crop_landmarks = probe_crop_landmarks(crops)
        if args.landmarks_cache:
            np.savez_compressed(args.landmarks_cache,
                                landmarks=crop_landmarks)

    net = RetinaFaceNet(backbone=cfg_mnet["name"],
                        out_channel=cfg_mnet["out_channel"],
                        phase="train")
    key = jax.random.PRNGKey(args.seed)
    variables = net.init(
        key, jnp.zeros((1, args.size, args.size, 3)), train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]

    priors = B.make_priors((args.size, args.size),
                           cfg_mnet["min_sizes"], cfg_mnet["steps"],
                           cfg_mnet["clip"])
    sched = optax.cosine_decay_schedule(args.lr, args.steps, 0.01)
    tx = optax.adamw(sched, weight_decay=5e-4)
    opt_state = tx.init(params)
    step = make_detection_train_step(
        net, priors, tuple(cfg_mnet["variance"]), tx)

    # ONE wrapper + ONE pair of jitted eval programs for every eval
    # call (remote TPU compiles cost minutes; see CLAUDE.md)
    rf = RetinaFace(backbone_cfg="cfg_mnet")
    conf_fn, detect_fn = make_eval_fns(rf, 8, args.size)

    def evaluate():
        erng = np.random.default_rng(12345)
        frames, boxes_n, labels, landms_n, valid = synth_batch(
            erng, 8, args.size, crops, crop_landmarks,
            max_faces=args.max_faces)
        rf.variables = {"params": params, "batch_stats": batch_stats}
        sparse = conf_sparsity(rf, frames, conf_fn=conf_fn)
        rec = detection_recall(rf, frames, boxes_n * args.size, valid,
                               detect_fn=detect_fn)
        # the bench's own frame distribution: flat-90 background,
        # 144px faces in a grid of 4
        sys.path.insert(0, ROOT)
        from bench import build_frames

        bframes = build_frames(8, args.size, 4)
        bvalid = np.zeros((8, 4), bool)
        bvalid[:] = True
        grid = 2
        cell = args.size // grid
        pad = (cell - 144) // 2
        bboxes = np.zeros((8, 4, 4), np.float32)
        for f in range(4):
            r, c = divmod(f, grid)
            bboxes[:, f] = (c * cell + pad, r * cell + pad,
                            c * cell + pad + 144, r * cell + pad + 144)
        bsparse = conf_sparsity(rf, bframes, conf_fn=conf_fn)
        brec = detection_recall(rf, bframes, bboxes, bvalid,
                                detect_fn=detect_fn)
        return sparse, rec, bsparse, brec

    t0 = time.time()
    for i in range(args.steps):
        frames, boxes_n, labels, landms_n, valid = synth_batch(
            rng, args.batch, args.size, crops, crop_landmarks,
            max_faces=args.max_faces)
        params, batch_stats, opt_state, losses = step(
            params, batch_stats, opt_state, jnp.asarray(frames),
            jnp.asarray(boxes_n), jnp.asarray(labels),
            jnp.asarray(landms_n), jnp.asarray(valid))
        if i % 50 == 0 or i == args.steps - 1:
            losses = jax.device_get(losses)
            print(f"[fit] step {i:5d} loss {losses['loss']:.4f} "
                  f"(loc {losses['loss_loc']:.4f} conf "
                  f"{losses['loss_conf']:.4f} landm "
                  f"{losses['loss_landm']:.4f}) "
                  f"{(time.time() - t0):.0f}s", flush=True)
        if args.eval_every and i and i % args.eval_every == 0:
            sparse, rec, bsparse, brec = evaluate()
            print(f"[fit] eval step {i}: synth sparsity "
                  f"{sparse:.0f} anchors/frame recall {rec:.3f} | "
                  f"bench sparsity {bsparse:.0f} recall {brec:.3f}",
                  flush=True)

    sparse, rec, bsparse, brec = evaluate()
    print(f"[fit] final: synth sparsity {sparse:.0f} anchors/frame "
          f"recall {rec:.3f} | bench-frames sparsity {bsparse:.0f} "
          f"recall {brec:.3f}")

    sd = flax_to_torch_state_dict(
        {"params": params, "batch_stats": batch_stats})
    # round-trip sanity before vendoring
    rt = convert_state_dict(sd)
    flat_a = jax.tree_util.tree_leaves(rt)
    flat_b = jax.tree_util.tree_leaves(
        {"params": params, "batch_stats": batch_stats})
    assert all(np.allclose(a, b) for a, b in zip(flat_a, flat_b))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **sd)
    meta = {
        "provenance": "tools/fit_detector.py synthetic-scene fit "
                      "(NOT the published checkpoint; see WEIGHTS.md)",
        "steps": args.steps, "batch": args.batch, "size": args.size,
        "lr": args.lr, "seed": args.seed,
        "synth_sparsity_anchors_per_frame": sparse,
        "synth_recall_iou50": rec,
        "bench_sparsity_anchors_per_frame": bsparse,
        "bench_recall_iou50": brec,
    }
    with open(args.out + ".json", "w") as fh:
        json.dump(meta, fh, indent=1)
    print(f"[fit] saved {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.2f} MB) + provenance "
          "json")


if __name__ == "__main__":
    main()
