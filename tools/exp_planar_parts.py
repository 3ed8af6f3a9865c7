"""Attribute the plane-major stage-1 cost: prefixes + isolated op types.

Times progressive prefixes of planar_stage1 plus pointwise-only and
depthwise-only chains on correctly-shaped random planar tensors.
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
    from vn_celeb_face_recognition_tpu.ops import planar_mnet as P

    iters = int(next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--iters=")), 60))
    only = next((a.split("=")[1].split(",") for a in sys.argv
                 if a.startswith("--stages=")), None)
    dt = jnp.bfloat16
    mod = MobileNetV1Stage(P._STAGE1_SPECS, dtype=dt)
    variables = mod.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3)))
    params, stats = variables["params"], variables["batch_stats"]
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
        dt_ms = (time.time() - t0) / iters * 1000.0
        print(f"{name:>8}: {dt_ms:8.2f} ms/chunk")

    def planar_prefix(n_blocks):
        def fn(frames_u8, i):
            x = variant(frames_u8, i).transpose(0, 3, 1, 2).astype(dt) \
                - jnp.asarray([104.0, 117.0, 123.0], dt)[None, :, None,
                                                         None]
            for bi, (kind, cin, cout, stride) in enumerate(
                    P._STAGE1_SPECS[:n_blocks]):
                p, s = params[str(bi)], stats[str(bi)]
                if kind == "conv_bn":
                    x = P._first_conv(x, p["0"]["kernel"], dt)
                    mul, add = P._fold_bn(p["1"], s["1"])
                    x = P._bn_leaky(x, mul, add, 0.1, dt)
                else:
                    x = P._depthwise(x, p["0"]["kernel"], stride, dt)
                    mul, add = P._fold_bn(p["1"], s["1"])
                    x = P._bn_leaky(x, mul, add, 0.1, dt)
                    x = P._pointwise(x, p["3"]["kernel"], dt)
                    mul, add = P._fold_bn(p["4"], s["4"])
                    x = P._bn_leaky(x, mul, add, 0.1, dt)
            return x.sum().astype(jnp.float32)
        return fn

    gen = np.random.default_rng(0)

    def rand_planar(c, hw):
        return jax.device_put(np.asarray(
            gen.standard_normal((32, c, hw, hw)), np.float32))

    planes = {
        "p8_320": rand_planar(8, 320),
        "p16_320": rand_planar(16, 320),
        "p16_160": rand_planar(16, 160),
        "p32_160": rand_planar(32, 160),
        "p32_80": rand_planar(32, 80),
        "p64_80": rand_planar(64, 80),
    }
    k3 = {c: jnp.asarray(gen.standard_normal((3, 3, 1, c)), jnp.float32)
          for c in (8, 16, 32, 64)}
    kpw = {(a, b): jnp.asarray(gen.standard_normal((1, 1, a, b)),
                               jnp.float32)
           for (a, b) in ((8, 16), (16, 32), (32, 32), (32, 64),
                          (64, 64))}

    def pwonly(p8, p16s, p32, p32s, p64, i):
        acc = jnp.float32(i)
        acc += P._pointwise(p8.astype(dt), kpw[(8, 16)], dt).sum() \
            .astype(jnp.float32)
        acc += P._pointwise(p16s.astype(dt), kpw[(16, 32)], dt).sum() \
            .astype(jnp.float32)
        acc += P._pointwise(p32.astype(dt), kpw[(32, 32)], dt).sum() \
            .astype(jnp.float32)
        acc += P._pointwise(p32s.astype(dt), kpw[(32, 64)], dt).sum() \
            .astype(jnp.float32)
        acc += P._pointwise(p64.astype(dt), kpw[(64, 64)], dt).sum() \
            .astype(jnp.float32)
        return acc

    def dwonly(p8, p16, p32, p64, i):
        acc = jnp.float32(i)
        acc += P._depthwise(p8.astype(dt), k3[8], 1, dt).sum() \
            .astype(jnp.float32)
        acc += P._depthwise(p16.astype(dt), k3[16], 2, dt).sum() \
            .astype(jnp.float32)
        acc += P._depthwise(p32.astype(dt), k3[32], 1, dt).sum() \
            .astype(jnp.float32)
        acc += P._depthwise(p32.astype(dt), k3[32], 2, dt).sum() \
            .astype(jnp.float32)
        acc += P._depthwise(p64.astype(dt), k3[64], 1, dt).sum() \
            .astype(jnp.float32)
        return acc

    stages = {
        "pfx1": lambda: timeit("pfx1", jax.jit(planar_prefix(1)),
                               frames_dev),
        "pfx2": lambda: timeit("pfx2", jax.jit(planar_prefix(2)),
                               frames_dev),
        "pfx3": lambda: timeit("pfx3", jax.jit(planar_prefix(3)),
                               frames_dev),
        "pwonly": lambda: timeit(
            "pwonly", jax.jit(pwonly), planes["p8_320"],
            planes["p16_160"], planes["p32_160"], planes["p32_80"],
            planes["p64_80"]),
        "dwonly": lambda: timeit(
            "dwonly", jax.jit(dwonly), planes["p8_320"],
            planes["p16_320"], planes["p32_160"], planes["p64_80"]),
    }
    for name, fn in stages.items():
        if only and name not in only:
            continue
        fn()


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
