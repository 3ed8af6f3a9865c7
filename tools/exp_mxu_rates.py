"""Raw MXU rate probe: pure GEMM vs XLA 3x3 conv vs 1x1 conv.

Motivation: per-layer stage timings (tools/profile_emotion.py) with
`net = total - noop` subtraction "measured" flop-bound resnet layers
at 219-274 TFLOP/s — ABOVE the 197 nominal v5e bf16 peak.  This
probe settles what the hardware can actually do on iresnet100's
layer3 shapes (14x14x256 -> 256, batch 128) and on a big square
GEMM:

  gemm    [25088, 2304] x [2304, 256]   (pre-im2col'd layer3 conv;
                                         streams 115 MB/op -> HBM-bound)
  conv3   [128,14,14,256] *3x3* 256     (what flax/XLA runs today;
                                         859 flop/byte, compute-bound)
  conv1   [128,14,14,2304] *1x1* 256    (conv-lowered big GEMM)
  big     [4096,4096] x [4096,4096]     (peak probe, 137 GFLOP/op)

Measured (v5e, 40 iters, 8 ops/dispatch): big **170 TFLOP/s** (86%
of nominal — the real ceiling), conv3 **121 TFLOP/s** (71% of the
achievable GEMM rate — the XLA spatial-conv lowering's gap), gemm/
conv1 ~118-121 (HBM-bound as predicted by their 229 flop/byte vs
the ~240 ridge point).  Conclusion: the >197 per-layer numbers were
a methodology artifact — host dispatch (~1 ms/call) OVERLAPS device
execution on this relay, so wall/iter = max(dispatch, execute) and
subtracting the noop floor over-corrects.  Read stage tables as
total ms, unsubtracted, once above the floor.

Two buggy generations of this probe are preserved as warnings:
  v1: per-iter `jnp.roll` of the 115 MB operand + a `[0, :8]` output
      slice — XLA propagates output slices INTO dot/conv, so every
      GEMM shrank to one row and everything timed at the dispatch
      floor ("35 TFLOP/s", all stages equal).
  v2: 8 ops/dispatch but still output-sliced — the big GEMM
      "measured" 980 TFLOP/s of work that was never done.
Consume probe outputs with full `.sum()`, nothing less.

Usage: python tools/exp_mxu_rates.py [--iters=50] [--stages=a,b]
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

    iters = int(next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--iters=")), 50))
    only = next((a.split("=")[1].split(",") for a in sys.argv
                 if a.startswith("--stages=")), None)

    gen = np.random.default_rng(0)
    dt = jnp.bfloat16

    def dev(shape):
        return jax.device_put(jnp.asarray(
            gen.standard_normal(shape).astype(np.float32) * 0.05, dt))

    a_g = dev((25088, 2304))
    b_g = dev((2304, 256))
    x_c3 = dev((128, 14, 14, 256))
    k_c3 = dev((3, 3, 256, 256))
    x_c1 = dev((128, 14, 14, 2304))
    k_c1 = dev((1, 1, 2304, 256))
    a_b = dev((4096, 4096))
    b_b = dev((4096, 4096))

    def drain(out):
        np.asarray(jax.device_get(out)).reshape(-1)[0]

    def timeit(name, fn, gflop, *args):
        f = jax.jit(fn)
        out = f(*args, 0)
        drain(out)
        t0 = time.time()
        for i in range(iters):
            out = f(*args, i)
        drain(out)
        ms = (time.time() - t0) / iters * 1000.0
        tf = gflop / ms  # GFLOP / ms == TFLOP/s
        print(f"{name:>6}: {ms:8.3f} ms  {tf:8.1f} TFLOP/s")

    # 8 ops per dispatch: a single op is ~0.15-0.35 ms of MXU work
    # under a ~0.7 ms dispatch floor (the first probe measured the
    # floor, not the MXU). Only the SMALL operand varies per op (the
    # big one stays resident; varying it would add an HBM pass that
    # biases the rate down), each op gets a distinct weight so XLA
    # cannot CSE, and the tiny output slices sum so nothing DCEs.
    REP = 8

    # outputs are consumed with FULL sums: any output slice lets XLA
    # narrow the GEMM/conv to the sliced rows (the first two probe
    # versions "measured" 980 TFLOP/s on a [0,:8]-sliced big GEMM —
    # that was one row's worth of work at the dispatch floor)

    def st_noop(a, b, i):
        return (b.astype(jnp.float32) + i).sum()

    def st_gemm(a, b, i):
        acc = jnp.zeros((), jnp.float32)
        for j in range(REP):
            o = jax.lax.dot_general(
                a, b + jnp.asarray(i * REP + j, b.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = acc + o.sum()
        return acc

    def st_conv(x, k, i):
        acc = jnp.zeros((), jnp.float32)
        for j in range(REP):
            y = jax.lax.conv_general_dilated(
                x, k + jnp.asarray(i * REP + j, k.dtype), (1, 1),
                "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            acc = acc + y.sum()
        return acc

    flop_l3 = REP * 2.0 * 25088 * 2304 * 256 / 1e9
    stages = {
        "noop": (st_noop, 0.0, (a_g, b_g)),
        "gemm": (st_gemm, flop_l3, (a_g, b_g)),
        "conv3": (st_conv,
                  REP * 2.0 * 128 * 14 * 14 * 9 * 256 * 256 / 1e9,
                  (x_c3, k_c3)),
        "conv1": (st_conv, flop_l3, (x_c1, k_c1)),
        "big": (st_gemm, REP * 2.0 * 4096 ** 3 / 1e9, (a_b, b_b)),
    }
    for name, (fn, gflop, args) in stages.items():
        if only and name not in only:
            continue
        timeit(name, fn, gflop, *args)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
