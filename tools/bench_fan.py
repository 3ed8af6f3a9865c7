"""Measure the seq-path FAN landmarker throughput on the TPU.

The reference's seq_fd_vs_aln flow runs a per-face 68-point 2DFAN4
stack (demo_image.py:201-234) — the most expensive op in the repo when
enabled. This gives the capability a number: faces/sec through the
batched crop -> 4-module FAN -> heatmap decode program
(models/fan.py FANLandmarker.landmarks_for_boxes).

    python tools/bench_fan.py [--batch=64] [--iters=20] [--modules=4]

Weights are random-init (the released 2DFAN4 checkpoint cannot be
downloaded here); the program is shape-static, so chip cost equals
deployment cost.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _arg(name, default):
    return next((a.split("=", 1)[1] for a in sys.argv
                 if a.startswith(f"--{name}=")), default)


def main():
    import jax

    from vn_celeb_face_recognition_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from vn_celeb_face_recognition_tpu.models.fan import FANLandmarker

    batch = int(_arg("batch", 64))
    iters = int(_arg("iters", 20))
    modules = int(_arg("modules", 4))
    dtype = _arg("dtype", None)  # e.g. bfloat16 for the MXU fast path

    lm = FANLandmarker(num_modules=modules, dtype=dtype)
    gen = np.random.default_rng(0)
    faces = gen.integers(0, 255, size=(batch, 192, 192, 3),
                         dtype=np.uint8)
    boxes = np.tile(
        np.asarray([8.0, 8.0, 184.0, 184.0], np.float32), (batch, 1))

    # warm + compile, then drain (block_until_ready does not track
    # remote completion on this rig — fetch a scalar)
    out = lm.landmarks_for_boxes(faces, boxes)
    assert out.shape == (batch, 68, 2)

    t0 = time.time()
    for _ in range(iters):
        out = lm.landmarks_for_boxes(faces, boxes)
    # landmarks_for_boxes device_gets internally, so the loop is
    # synchronous per call — the host-visible rate, which on this rig
    # includes a 30-100 ms relay round trip PER CALL
    dt_host = time.time() - t0

    # device rate: queue the cached jitted program back-to-back and
    # drain once (the in-order queue bounds true chip time; a real
    # TPU host sees ~this rate)
    key = next(iter(lm._jit_cache))
    fn = lm._jit_cache[key]
    n_pad, hp, wp = key
    import jax as _jax

    faces_pad = np.zeros((n_pad, hp, wp, 3), np.uint8)
    faces_pad[:batch, :192, :192] = faces
    faces_dev = _jax.device_put(faces_pad)
    centers = np.tile(np.asarray([96.0, 96.0], np.float32),
                      (n_pad, 1))
    scales = np.full((n_pad,), 176.0 / 195.0 * 1.0, np.float32)
    out = fn(lm.variables, faces_dev, centers, scales)
    float(np.asarray(_jax.device_get(out))[0, 0, 0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(lm.variables, faces_dev, centers, scales)
    float(np.asarray(_jax.device_get(out))[0, 0, 0])
    dt_dev = time.time() - t0

    faces_per_sec = batch * iters / dt_dev
    print(json.dumps({
        "metric": f"FAN{modules} 68-pt landmarks (crop+decode fused, "
                  f"dtype {dtype or 'float32'}), "
                  f"batch {batch}, 192px face windows, queued "
                  "device rate (single drain fetch)",
        "value": round(faces_per_sec, 1),
        "unit": "faces/sec/chip",
        "ms_per_batch": round(dt_dev / iters * 1000.0, 1),
        "host_api_ms_per_batch": round(dt_host / iters * 1000.0, 1),
        "host_api_faces_per_sec": round(batch * iters / dt_host, 1),
    }))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
