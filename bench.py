"""Headline benchmark: detect + align + embed + classify faces/sec/chip.

Runs the fused recognition engine (MTCNN with the published cascade
weights -> Umeyama/warp alignment -> InceptionResnetV1 512-d embedding
-> MLP classifier over 1001 classes) on synthetic 640x640 frame chunks
carrying real face crops (the reference repo's shipped toy faces), and
reports end-to-end VALID faces recognised per second on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "faces/sec/chip", "vs_baseline": N}
Baseline: 5000 faces/sec/chip (BASELINE.md driver target).
"""

import glob
import json
import sys
import time

import numpy as np


def build_frames(batch, size, faces_per_frame, face_px=144):
    """Frames with real face crops pasted on a flat background."""
    from PIL import Image

    files = sorted(glob.glob("/root/reference/data/*.png"))
    if not files:  # fall back to noise (detector finds nothing; still
        # measures the full pipeline cost)
        gen = np.random.default_rng(0)
        return gen.integers(0, 255, size=(batch, size, size, 3),
                            dtype=np.uint8)
    crops = [
        np.asarray(
            Image.open(f).convert("RGB").resize((face_px, face_px)),
            dtype=np.uint8,
        )
        for f in files[:faces_per_frame * batch]
    ]
    frames = np.full((batch, size, size, 3), 90, dtype=np.uint8)
    grid = int(np.ceil(np.sqrt(faces_per_frame)))
    cell = size // grid
    pad = max((cell - face_px) // 2, 0)
    idx = 0
    for b in range(batch):
        for f in range(faces_per_frame):
            r, c = divmod(f, grid)
            y0 = r * cell + pad
            x0 = c * cell + pad
            frames[b, y0:y0 + face_px, x0:x0 + face_px] = crops[
                idx % len(crops)
            ]
            idx += 1
    return frames


def main():
    import jax
    import jax.numpy as jnp

    from vn_celeb_face_recognition_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from vn_celeb_face_recognition_tpu.models import (
        InceptionResnetV1,
        MLPModel,
        MTCNN,
    )
    from vn_celeb_face_recognition_tpu.pipeline.engine import (
        FusedRecognitionEngine,
    )

    batch = int(float(next((a.split("=")[1] for a in sys.argv
                            if a.startswith("--batch=")), 32)))
    size = 640
    faces_per_frame = int(float(next(
        (a.split("=")[1] for a in sys.argv
         if a.startswith("--faces_per_frame=")), 4)))
    # the single drain fetch at the end pays one relay round trip
    # (25-100 ms through this rig's tunnel); 60 iterations amortise it
    # to <2% of a ~12 ms chunk (at 20 it was up to 5 ms/chunk of noise)
    iters = int(float(next((a.split("=")[1] for a in sys.argv
                            if a.startswith("--iters=")), 60)))
    det_kind = next((a.split("=")[1] for a in sys.argv
                     if a.startswith("--detector=")), "mtcnn").lower()

    if det_kind == "retinaface":
        # the reference's PRODUCTION detector
        # (scripts/celeb_stat_dynamic_itv.sh: -det RetinaFace,
        # cfg/detection/retina_face.json -> cfg_mnet). Published
        # weights can't be downloaded in this environment; if the
        # converted npz is absent the net runs randomly initialised.
        # The program is shape-static (net, decode, top-k, aligned
        # face slots, encoder, classifier all fixed) and the one
        # data-dependent piece — the Jacobi NMS fixpoint — sees its
        # WORST case under random weights (every anchor passes
        # conf 0.02, dense overlapping candidates), so this line is a
        # conservative bound on real-weight deployment throughput.
        from vn_celeb_face_recognition_tpu.models import RetinaFace

        detector = RetinaFace(
            backbone_cfg="cfg_mnet",
            weights_path="vn_celeb_face_recognition_tpu/models/weights/"
                         "retinaface_mnet025.npz",
            dtype=jnp.bfloat16,
        )
    else:
        detector = MTCNN(min_face_size=50, keep_all=True,
                         pnet_cap_per_scale=128, cross_cap=256,
                         rnet_cap=64, onet_cap=32, out_cap=8,
                         dtype=jnp.bfloat16)
    enc_kind = next((a.split("=")[1] for a in sys.argv
                     if a.startswith("--encoder=")), "facenet").lower()
    if enc_kind == "iresnet100":
        # the production embedding config's encoder
        # (cfg/embedding/iresnet100_enc.json, the reference demo CLIs'
        # default -eargs)
        from vn_celeb_face_recognition_tpu.models import iresnet100

        encoder = iresnet100(dtype=jnp.bfloat16)
    else:
        encoder = InceptionResnetV1(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    enc_vars = encoder.init(key, jnp.zeros((1, 112, 112, 3)))
    classifier = MLPModel(input_dim=512, num_classes=1001)
    clf_vars = classifier.init(key, jnp.zeros((1, 512)))

    # global align/embed budget: 4 faces/frame pasted, 25% headroom;
    # the engine warns + reports face_cap_overflow if a chunk exceeds
    # it (compaction is output-identical below the cap)
    face_cap = int(float(next((a.split("=")[1] for a in sys.argv
                               if a.startswith("--face_cap=")),
                              batch * faces_per_frame + batch)))
    engine = FusedRecognitionEngine(
        detector, encoder, enc_vars, classifier, clf_vars,
        target_fs=112, compute_dtype=jnp.bfloat16, face_cap=face_cap,
    )

    frames = build_frames(batch, size, faces_per_frame)
    # two distinct pre-uploaded chunks alternate per iteration: frames
    # still vary call-to-call, but no device-side transform rides
    # inside the timed region (a real TPU host streams fresh frames
    # over PCIe without spending chip compute; the old on-device roll
    # charged ~2 ms/chunk of pure benchmark artifact to the pipeline)
    chunk_devs = [
        jax.device_put(frames),
        jax.device_put(np.roll(frames, 97, axis=2)),
    ]

    # warmup / compile; the fetch forces real remote execution. BOTH
    # chunks contribute half the timed iterations, so the faces/sec
    # basis averages their valid counts (the 97px roll wraps ~10px of
    # the rightmost pasted faces across the frame edge, which can
    # change the detection count)
    valid_counts = []
    for cd in chunk_devs:
        out = engine.process(cd)
        valid_counts.append(
            int(np.asarray(jax.device_get(out["valid"])).sum())
        )
    valid_per_chunk = sum(valid_counts) / len(valid_counts)

    # measure the warm host->device path (the dev-relay tunnel on this
    # rig moves ~50 MB/s; real TPU hosts stream frames at GB/s over
    # PCIe, so the chunk upload is reported separately rather than
    # letting the tunnel masquerade as chip time)
    t0 = time.time()
    probe = jax.device_put(frames)
    np.asarray(probe)[0, 0, 0, 0]
    transfer_s = time.time() - t0

    # NOTE on timing: on this relay backend block_until_ready does NOT
    # track remote completion — executions run in order on the single
    # chip, so fetching a scalar from the LAST output drains the whole
    # queue and bounds the true end-to-end time.
    t0 = time.time()
    for i in range(iters):
        out = engine.process(chunk_devs[i % 2])
    float(np.asarray(jax.device_get(out["scores"]))[0, 0])
    dt = time.time() - t0

    import os as _os

    faces_basis = valid_per_chunk
    basis_note = f"{valid_per_chunk:g} valid faces/chunk"
    if det_kind == "retinaface" and not _os.path.exists(
        "vn_celeb_face_recognition_tpu/models/weights/"
        "retinaface_mnet025.npz"
    ):
        # random-weight RetinaFace: detections are meaningless but the
        # program is shape-static, so chip cost equals deployment —
        # count the pasted faces as the recognised basis
        faces_basis = batch * faces_per_frame
        basis_note = (f"{faces_basis} pasted faces/chunk (RetinaFace "
                      "weights npz absent; random init, same "
                      "shape-static program cost)")

    total_faces = faces_basis * iters
    faces_per_sec = total_faces / dt
    frames_per_sec = batch * iters / dt
    result = {
        "metric": f"detect[{det_kind}]+align+embed[{enc_kind}]"
                  "+classify throughput "
                  f"(640x640 frames, {faces_per_frame} faces/frame, "
                  f"batch {batch}, {basis_note}, "
                  f"video {frames_per_sec:.1f} frames/sec on-chip; "
                  f"host->device upload of a chunk costs "
                  f"{transfer_s * 1000:.0f} ms through this rig's "
                  "relay tunnel)",
        "value": round(faces_per_sec, 2),
        "unit": "faces/sec/chip",
        "vs_baseline": round(faces_per_sec / 5000.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
    # the relay client leaves non-daemon threads that block interpreter
    # shutdown on this rig; the JSON line is out, leave decisively
    import os
    import sys

    sys.stdout.flush()
    os._exit(0)
