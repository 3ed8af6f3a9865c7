"""Attribute the online-aug train step's 171 ms (bench.py --train,
batch 256, iresnet100, v5e): device facenet_aug vs frozen-encoder
forward vs MLP update, each as its own jitted program.

Timing per CLAUDE.md rules: one drain fetch per run, total-ms read
(dispatch overlaps execution on this relay; never subtract the noop
floor), outputs consumed with a full .sum().

Usage: python tools/profile_train_step.py [--iters=40] [--batch=256]
       [--stages=aug,enc,step,...] [--device=CPU]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


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
    import optax

    from vn_celeb_face_recognition_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from vn_celeb_face_recognition_tpu.models import MLPModel, iresnet100
    from vn_celeb_face_recognition_tpu.ops import augment as A
    from vn_celeb_face_recognition_tpu.training.losses import (
        neg_log_llhood,
    )
    from vn_celeb_face_recognition_tpu.training.optim import (
        make_optimizer,
    )

    iters = int(next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--iters=")), 40))
    batch = int(next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--batch=")), 256))
    only = next((a.split("=")[1].split(",") for a in sys.argv
                 if a.startswith("--stages=")), None)

    key = jax.random.PRNGKey(0)
    encoder = iresnet100(dtype=jnp.bfloat16)
    enc_vars = encoder.init(key, jnp.zeros((1, 112, 112, 3)))
    mlp = MLPModel(input_dim=512, num_classes=1001)
    variables = mlp.init(key, jnp.zeros((1, 512)))
    tx = make_optimizer("Adam", {"lr": 1e-4, "weight_decay": 1e-4})
    opt_state = tx.init(variables["params"])

    gen = np.random.default_rng(0)
    imgs = jax.device_put(gen.integers(
        0, 255, (batch, 112, 112, 3), dtype=np.uint8))
    target = jax.device_put(gen.integers(0, 1001, size=(batch,)))
    weight = jax.device_put(np.ones((batch,), np.float32))
    emb0 = jax.device_put(
        gen.standard_normal((batch, 512)).astype(np.float32))

    # every stage fn takes its big operands as ARGUMENTS — a closure
    # capture inlines them as HLO constants and the relay's compile
    # upload rejects the 250 MB encoder body with HTTP 413
    def stage_noop(ev, rng, i):
        return jnp.roll(imgs, i, axis=2)[0, 0, 0, 0].astype(
            jnp.float32)

    def stage_aug(ev, rng, i):
        x = A.batch_apply(A.facenet_aug, rng,
                          jnp.roll(imgs, i, axis=2).astype(
                              jnp.float32))
        return x.sum().astype(jnp.float32)

    def stage_aug_shear(ev, rng, i):
        # the shipped batched 3-shear hot path
        x = A.facenet_aug_shear(rng, jnp.roll(imgs, i, axis=2).astype(
            jnp.float32))
        return x.sum().astype(jnp.float32)

    def stage_aug_batched(ev, rng, i):
        # the measured-and-rejected Pallas-warp rewrite, for the record
        x = A.facenet_aug_batch(rng, jnp.roll(imgs, i, axis=2).astype(
            jnp.float32))
        return x.sum().astype(jnp.float32)

    def stage_enc(ev, rng, i):
        x = (jnp.roll(imgs, i, axis=2).astype(jnp.float32)
             - 127.5) / 128.0
        emb = encoder.apply(ev, x, train=False)
        return emb.sum().astype(jnp.float32)

    def stage_mlp(ev, rng, i):
        rng_do = jax.random.fold_in(rng, 1)
        e = jnp.roll(emb0, i, axis=1)

        def loss_of(params):
            out = mlp.apply(dict(variables, params=params), e,
                            train=True, rngs={"dropout": rng_do})
            return neg_log_llhood(out, target, weight)

        loss, grads = jax.value_and_grad(loss_of)(variables["params"])
        upd, _ = tx.update(grads, opt_state, variables["params"])
        p = optax.apply_updates(variables["params"], upd)
        return loss + jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum(), p, 0.0)

    def stage_step(ev, rng, i):
        rng_tf, rng_do = jax.random.split(rng)
        x = A.facenet_aug_shear(rng_tf,
                                jnp.roll(imgs, i, axis=2).astype(
                                    jnp.float32))
        emb = jax.lax.stop_gradient(encoder.apply(ev, x, train=False))

        def loss_of(params):
            out = mlp.apply(dict(variables, params=params), emb,
                            train=True, rngs={"dropout": rng_do})
            return neg_log_llhood(out, target, weight)

        loss, grads = jax.value_and_grad(loss_of)(variables["params"])
        upd, _ = tx.update(grads, opt_state, variables["params"])
        p = optax.apply_updates(variables["params"], upd)
        return loss + jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum(), p, 0.0)

    stages = {
        "noop": stage_noop,
        "aug": stage_aug,
        "aug_shear": stage_aug_shear,
        "aug_batched": stage_aug_batched,
        "enc": stage_enc,
        "mlp": stage_mlp,
        "step": stage_step,
    }
    print(f"batch={batch} iters={iters} (total ms; dispatch overlaps "
          f"execution — do not subtract the noop floor)")
    rng = jax.random.PRNGKey(7)
    for name, fn in stages.items():
        if only and name not in only:
            continue
        jfn = jax.jit(fn)
        out = jfn(enc_vars, rng, 0)
        float(np.asarray(out))
        t0 = time.time()
        for i in range(iters):
            out = jfn(enc_vars, jax.random.fold_in(rng, i), i)
        float(np.asarray(out))
        ms = (time.time() - t0) / iters * 1000.0
        print(f"{name:>12} {ms:8.2f} ms")
    os._exit(0)


if __name__ == "__main__":
    main()
