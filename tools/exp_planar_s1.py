"""Measure plane-major stage 1 vs the NHWC flax stage 1 on TPU.

Bench shapes: [32, 640, 640, 3] u8 frames, bf16 compute.
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
    from vn_celeb_face_recognition_tpu.models.retinaface import (
        MobileNetV1Stage,
    )
    from vn_celeb_face_recognition_tpu.ops.planar_mnet import (
        _STAGE1_SPECS,
        planar_stage1,
    )
    from vn_celeb_face_recognition_tpu.ops.planar_s1_pallas import (
        planar_stage1_pallas,
    )
    from vn_celeb_face_recognition_tpu.ops.planar_s1_pallas_v2 import (
        planar_stage1_pallas_v2,
    )
    from vn_celeb_face_recognition_tpu.ops.packed_mnet import (
        packed_stage1,
    )

    iters = int(next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--iters=")), 60))
    sub = jnp.array([104.0, 117.0, 123.0], jnp.float32)
    mod = MobileNetV1Stage(_STAGE1_SPECS, dtype=jnp.bfloat16)
    variables = mod.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3)))
    frames_dev = jax.device_put(build_frames(32, 640, 4))

    @jax.jit
    def variant(x, i):
        return jnp.roll(x, i * 3, axis=2)

    def timeit(name, fn, *args):
        out = fn(*args, 0)
        np.asarray(jax.device_get(out)).reshape(-1)[0]
        t0 = time.time()
        for i in range(iters):
            out = fn(*args, i)
        np.asarray(jax.device_get(out)).reshape(-1)[0]
        dt = (time.time() - t0) / iters * 1000.0
        print(f"{name:>8}: {dt:8.2f} ms/chunk")

    def nhwc(v, frames_u8, i):
        x = variant(frames_u8, i).astype(jnp.float32) - sub
        return mod.apply(v, x, train=False).sum().astype(jnp.float32)

    def planar(v, frames_u8, i):
        s1 = planar_stage1(v["params"], v["batch_stats"],
                           variant(frames_u8, i), (104.0, 117.0, 123.0),
                           dtype=jnp.bfloat16)
        return s1.sum().astype(jnp.float32)

    def pallas(v, frames_u8, i):
        s1 = planar_stage1_pallas(
            v["params"], v["batch_stats"], variant(frames_u8, i),
            (104.0, 117.0, 123.0), dtype=jnp.bfloat16)
        return s1.sum().astype(jnp.float32)

    def pallas_upto(upto):
        def fn(v, frames_u8, i):
            y = planar_stage1_pallas(
                v["params"], v["batch_stats"], variant(frames_u8, i),
                (104.0, 117.0, 123.0), dtype=jnp.bfloat16, _upto=upto)
            return y.sum().astype(jnp.float32)
        return fn

    def pallas2(v, frames_u8, i):
        s1 = planar_stage1_pallas_v2(
            v["params"], v["batch_stats"], variant(frames_u8, i),
            (104.0, 117.0, 123.0), dtype=jnp.bfloat16)
        return s1.sum().astype(jnp.float32)

    def pallas2_upto(upto):
        def fn(v, frames_u8, i):
            y = planar_stage1_pallas_v2(
                v["params"], v["batch_stats"], variant(frames_u8, i),
                (104.0, 117.0, 123.0), dtype=jnp.bfloat16, _upto=upto)
            return y.sum().astype(jnp.float32)
        return fn

    def packed(v, frames_u8, i):
        s1 = packed_stage1(v["params"], v["batch_stats"],
                           variant(frames_u8, i), (104.0, 117.0, 123.0),
                           dtype=jnp.bfloat16)
        return s1.sum().astype(jnp.float32)

    def noop(frames_u8, i):
        return variant(frames_u8, i)[0, 0, 0, 0].astype(jnp.float32)

    only = next((a.split("=")[1].split(",") for a in sys.argv
                 if a.startswith("--stages=")), None)
    stages = {
        "noop": (jax.jit(noop), (frames_dev,)),
        "pallas": (jax.jit(pallas), (variables, frames_dev)),
        "packed": (jax.jit(packed), (variables, frames_dev)),
        "planar": (jax.jit(planar), (variables, frames_dev)),
        "nhwc": (jax.jit(nhwc), (variables, frames_dev)),
    }
    stages["pallas2"] = (jax.jit(pallas2), (variables, frames_dev))
    for upto in ("x1", "k1", "x2", "k2", "x3", "k3"):
        stages[f"p_{upto}"] = (jax.jit(pallas_upto(upto)),
                               (variables, frames_dev))
        stages[f"v_{upto}"] = (jax.jit(pallas2_upto(upto)),
                               (variables, frames_dev))
    for name, (fn, fargs) in stages.items():
        if only is None or name in only:
            timeit(name, fn, *fargs)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
