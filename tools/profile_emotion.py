"""Per-layer TPU timing for the emotion stage's 13.9 ms budget.

STATUS's round-3 claim "measured 13.9 ms IS the emotion roofline"
rested on a hand model (~6.6 ms arithmetic + ~6.7 ms activation
traffic at bf16).  This measures it: each trunk segment of the
2-branch ResNet-50 (reference /root/reference/models/resnet_2_branch.py:12-89)
runs as its OWN jitted program on the production stage shapes
([face_cap, 224, 224, 3] f32, bf16 compute — exactly what
bench.run_stage_mfu times as "emotion"), next to its analytic FLOP
and HBM-byte roofline, so the ~50%-MFU-ceiling statement cites data.

Stages:
  noop    — input roll + drain floor (subtract from everything)
  resize  — the engine's area_resize(faces 112 -> 224) feeder
  stem    — conv1 7x7/s2 + BN + relu + maxpool 3x3/s2  (224 -> 56)
  l1..l4  — each ResLayer isolated on its true input shape
  heads   — global mean + fc(690) + proj(300)
  net     — the full 2-branch apply (what the bench times)
  full    — resize + net (the fused engine's actual sub-program)

Per stage the table prints measured ms, analytic GFLOP, achieved
TFLOP/s, MFU, the bf16 activation+weight HBM bytes, achieved GB/s,
and the roofline ms = max(flop-bound, bandwidth-bound) so each
segment shows WHICH wall it sits against.

CAVEAT (established by tools/exp_mxu_rates.py): on this relay the
~1 ms/call host dispatch OVERLAPS device execution, so wall/iter =
max(dispatch, execute). The net_ms column's `total - noop`
subtraction therefore OVER-corrects and can show impossible >peak
rates for stages near the floor; read the raw ms column
(unsubtracted) as the device execute time once a stage is above the
noop floor.

Usage: python tools/profile_emotion.py [--iters=60] [--cap=128]
       [--stages=a,b,...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12
V5E_HBM_GBS = 819.0  # v5e HBM bandwidth, GB/s


def conv_flops(n, h, w, cin, cout, k, stride):
    ho, wo = h // stride, w // stride
    return 2.0 * n * ho * wo * cin * cout * k * k, (ho, wo)


def bottleneck_cost(n, h, w, cin, planes, stride):
    """FLOPs + bf16 activation bytes for one Bottleneck (1x1 ->
    3x3/stride -> 1x1 * 4, optional downsample)."""
    fl = 0.0
    by = 2.0 * n * h * w * cin  # read input (bf16)
    f, _ = conv_flops(n, h, w, cin, planes, 1, 1)
    fl += f
    ho, wo = h // stride, w // stride
    f, _ = conv_flops(n, h, w, planes, planes, 3, stride)
    fl += f
    f, _ = conv_flops(n, ho, wo, planes, planes * 4, 1, 1)
    fl += f
    # intermediate activations written+read once each (XLA fuses BN/
    # relu into the convs): planes@h*w, planes@ho*wo, out 4planes@ho*wo
    by += 2.0 * 2 * n * (h * w * planes + ho * wo * planes)
    by += 2.0 * n * ho * wo * planes * 4
    if stride != 1 or cin != planes * 4:
        f, _ = conv_flops(n, h, w, cin, planes * 4, 1, stride)
        fl += f
        by += 2.0 * n * ho * wo * planes * 4
    return fl, by, (ho, wo)


def layer_cost(n, h, w, cin, planes, blocks, stride):
    fl, by, (h, w) = bottleneck_cost(n, h, w, cin, planes, stride)
    for _ in range(blocks - 1):
        f2, b2, (h, w) = bottleneck_cost(n, h, w, planes * 4, planes, 1)
        fl, by = fl + f2, by + b2
    return fl, by, (h, w)


def main():
    dev = next((a.split("=")[1] for a in sys.argv
                if a.startswith("--device=")), None)
    if dev:
        from vn_celeb_face_recognition_tpu.utils.platform import (
            select_platform,
        )

        select_platform(dev)

    import jax
    import jax.numpy as jnp

    from vn_celeb_face_recognition_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from vn_celeb_face_recognition_tpu.models import resnet_2branch_50
    from vn_celeb_face_recognition_tpu.models.resnet_common import (
        ResLayer,
    )
    from vn_celeb_face_recognition_tpu.ops.image import area_resize

    iters = int(next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--iters=")), 60))
    cap = int(next((a.split("=")[1] for a in sys.argv
                    if a.startswith("--cap=")), 128))
    only = next((a.split("=")[1].split(",") for a in sys.argv
                 if a.startswith("--stages=")), None)

    dt = jnp.bfloat16
    model = resnet_2branch_50(num_classes=690, dtype=dt)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, jnp.zeros((1, 64, 64, 3)))
    params, stats = variables["params"], variables["batch_stats"]

    gen = np.random.default_rng(0)
    faces112 = jax.device_put(
        gen.uniform(0, 255, (cap, 112, 112, 3)).astype(np.float32))
    faces224 = jax.device_put(
        gen.uniform(0, 255, (cap, 224, 224, 3)).astype(np.float32))

    # per-layer inputs at the trunk's true shapes (bf16 — the dtype the
    # trunk hands each layer)
    lshapes = {"l1": (56, 64), "l2": (56, 256), "l3": (28, 512),
               "l4": (14, 1024)}
    lcfg = {"l1": (64, 3, 1), "l2": (128, 4, 2), "l3": (256, 6, 2),
            "l4": (512, 3, 2)}
    linputs = {
        k: jax.device_put(gen.standard_normal(
            (cap, s, s, c)).astype(np.float32) * 0.1)
        for k, (s, c) in lshapes.items()
    }
    feat7 = jax.device_put(
        gen.standard_normal((cap, 7, 7, 2048)).astype(np.float32) * .1)

    def _drain(out):
        leaf = jax.tree_util.tree_leaves(out)[-1]
        np.asarray(jax.device_get(leaf)).reshape(-1)[0]

    def timeit(fn, *args):
        out = fn(*args, 0)
        _drain(out)
        t0 = time.time()
        for i in range(iters):
            out = fn(*args, i)
        _drain(out)
        return (time.time() - t0) / iters * 1000.0

    @jax.jit
    def variant(x, i):
        return jnp.roll(x, i, axis=2)

    import flax.linen as nn

    def stage_noop(x, i):
        return variant(x, i)[0, 0, 0, 0].astype(jnp.float32)

    def stage_resize(x, i):
        return area_resize(variant(x, i), (224, 224)).sum().astype(
            jnp.float32)

    def stage_stem(x, i):
        y = variant(x, i)
        y = nn.Conv(64, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False, dtype=dt,
                    name="conv1").apply(
            {"params": params["conv1"]}, y.astype(dt))
        m = stats["bn1"]["mean"]
        v = stats["bn1"]["var"]
        sc = params["bn1"]["scale"]
        bi = params["bn1"]["bias"]
        y = (y.astype(jnp.float32) - m) / jnp.sqrt(v + 1e-5) * sc + bi
        y = nn.relu(y.astype(dt))
        y = nn.max_pool(y, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        return y.sum().astype(jnp.float32)

    def make_layer_stage(name):
        planes, blocks, stride = lcfg[name]
        _, cin = lshapes[name]
        mod = ResLayer(planes, blocks, stride, cin, dtype=dt)
        lv = {"params": params[f"layer{name[1]}"],
              "batch_stats": stats[f"layer{name[1]}"]}

        def fn(x, i):
            return mod.apply(lv, variant(x, i).astype(dt),
                             train=False).sum().astype(jnp.float32)
        return fn

    def make_fused_layer_stage(name):
        # block0 (stride/downsample) in XLA + the VMEM bottleneck-chain
        # kernel for the stride-1 tail (ops/bottleneck_pallas)
        from vn_celeb_face_recognition_tpu.models.resnet_common import (
            Bottleneck,
        )
        from vn_celeb_face_recognition_tpu.ops.bottleneck_pallas import (
            bottleneck_chain,
            fold_layer_tail,
        )

        planes, blocks, stride = lcfg[name]
        _, cin = lshapes[name]
        lp = params[f"layer{name[1]}"]
        ls = stats[f"layer{name[1]}"]
        side = lshapes[name][0] // stride
        b0 = Bottleneck(planes, stride,
                        stride != 1 or cin != planes * 4, dtype=dt)
        folded = fold_layer_tail(lp, ls, blocks - 1)

        def fn(x, i):
            y = b0.apply({"params": lp["0"], "batch_stats": ls["0"]},
                         variant(x, i).astype(dt), train=False)
            y = bottleneck_chain(y, folded, side, side, planes,
                                 interpret=False)
            return y.sum().astype(jnp.float32)
        return fn

    def stage_netf(x, i):
        from vn_celeb_face_recognition_tpu.ops.bottleneck_pallas import (
            emotion_apply_fused_l12,
        )

        c, p = emotion_apply_fused_l12(model, variables,
                                       variant(x, i), interpret=False)
        return c.sum() + p.sum()

    def stage_heads(x, i):
        y = jnp.mean(variant(x, i).astype(jnp.float32), axis=(1, 2))
        c = nn.Dense(690, name="fc").apply({"params": params["fc"]}, y)
        p = nn.Dense(300, name="proj").apply(
            {"params": params["proj"]}, y)
        return c.sum() + p.sum()

    def stage_net(x, i):
        c, p = model.apply(variables, variant(x, i), train=False)
        return c.sum() + p.sum()

    def stage_full(x, i):
        ex = area_resize(variant(x, i), (224, 224))
        c, p = model.apply(variables, ex, train=False)
        return c.sum() + p.sum()

    # ---- analytic costs (bf16 activations, weights read once) -------
    n = cap
    costs = {}
    costs["resize"] = (0.0, 4.0 * n * (112 * 112 + 224 * 224) * 3)
    f, _ = conv_flops(n, 224, 224, 3, 64, 7, 2)
    stem_by = (4.0 * n * 224 * 224 * 3 + 2.0 * n * 112 * 112 * 64 * 2
               + 2.0 * n * 56 * 56 * 64)
    costs["stem"] = (f, stem_by)
    h, w, cin = 56, 56, 64
    for name in ("l1", "l2", "l3", "l4"):
        planes, blocks, stride = lcfg[name]
        fl, by, (h, w) = layer_cost(n, h, w, cin, planes, blocks,
                                    stride)
        # weights read once per call (bf16 in MXU)
        costs[name] = (fl, by)
        cin = planes * 4
    costs["heads"] = (2.0 * n * 2048 * (690 + 300),
                      2.0 * n * 7 * 7 * 2048 + 2.0 * 2048 * 990)
    for agg in ("net", "full"):
        costs[agg] = (
            sum(costs[k][0] for k in
                ("stem", "l1", "l2", "l3", "l4", "heads")),
            sum(costs[k][1] for k in
                (("stem", "l1", "l2", "l3", "l4", "heads")
                 if agg == "net" else
                 ("resize", "stem", "l1", "l2", "l3", "l4", "heads"))),
        )

    stages = {
        "noop": (stage_noop, faces112),
        "resize": (stage_resize, faces112),
        "stem": (stage_stem, faces224),
        "l1": (make_layer_stage("l1"), linputs["l1"]),
        "l2": (make_layer_stage("l2"), linputs["l2"]),
        "l3": (make_layer_stage("l3"), linputs["l3"]),
        "l4": (make_layer_stage("l4"), linputs["l4"]),
        "heads": (stage_heads, feat7),
        "net": (stage_net, faces224),
        "full": (stage_full, faces112),
        "l1f": (make_fused_layer_stage("l1"), linputs["l1"]),
        "l2f": (make_fused_layer_stage("l2"), linputs["l2"]),
        "netf": (stage_netf, faces224),
    }
    costs["l1f"], costs["l2f"] = costs["l1"], costs["l2"]
    costs["netf"] = costs["net"]
    noop_ms = None
    print(f"cap={cap} iters={iters} "
          f"(per-stage programs pay their own ~0.5-1 ms dispatch)")
    print(f"{'stage':>7} {'ms':>8} {'net_ms':>8} {'GFLOP':>8} "
          f"{'TFLOP/s':>8} {'MFU':>6} {'GB':>7} {'GB/s':>7} "
          f"{'roof_ms':>8} {'wall':>5}")
    for name, (fn, arg) in stages.items():
        if only and name not in only:
            continue
        ms = timeit(jax.jit(fn), arg)
        if name == "noop":
            noop_ms = ms
            print(f"{name:>7} {ms:8.2f}")
            continue
        net_ms = ms - (noop_ms or 0.0)
        fl, by = costs.get(name, (0.0, 0.0))
        t_fl = fl / V5E_BF16_PEAK * 1e3
        t_by = by / (V5E_HBM_GBS * 1e9) * 1e3
        roof = max(t_fl, t_by)
        wall = "flop" if t_fl >= t_by else "hbm"
        tf = fl / (net_ms / 1e3) / 1e12 if net_ms > 0 else 0.0
        gbs = by / (net_ms / 1e3) / 1e9 if net_ms > 0 else 0.0
        print(f"{name:>7} {ms:8.2f} {net_ms:8.2f} {fl / 1e9:8.2f} "
              f"{tf:8.2f} {fl / (net_ms / 1e3) / V5E_BF16_PEAK if net_ms > 0 else 0:6.3f} "
              f"{by / 1e9:7.3f} {gbs:7.1f} {roof:8.2f} {wall:>5}")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
