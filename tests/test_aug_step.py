"""The shared online-aug train-step builder (training/aug_step.py).

bench.py --train times this step and tools/flops_audit.py --train
cost-analyses it; both import the ONE builder so the BENCH MFU's
timed and counted programs cannot drift. This pins the builder's
functional contract (one step runs, state updates, loss is finite and
falls over a few steps on separable data).
"""

import numpy as np
import jax
import jax.numpy as jnp


def test_aug_step_runs_and_learns():
    from vn_celeb_face_recognition_tpu.training.aug_step import (
        make_aug_train_step,
    )

    # 80px is the smallest CPU-fast size the facenet stem supports
    # (64px shrinks a VALID-padded stage to an empty pool window -> NaN)
    num_classes, batch, tfs = 4, 8, 80
    train_step, variables, opt_state = make_aug_train_step(
        "facenet", num_classes, tfs)
    step = jax.jit(train_step, donate_argnums=(0, 1))

    # flat-colour classes are separable even through a random encoder
    gen = np.random.default_rng(0)
    target = np.arange(batch) % num_classes
    imgs = np.stack([
        np.full((tfs, tfs, 3), 40 + 50 * int(t), np.uint8)
        for t in target
    ])
    weight = np.ones((batch,), np.float32)
    rng = jax.random.PRNGKey(1)

    losses = []
    for i in range(30):
        rng = jax.random.fold_in(rng, i)
        variables, opt_state, loss = step(
            variables, opt_state, jnp.asarray(imgs),
            jnp.asarray(target), jnp.asarray(weight), rng)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_bench_and_flops_audit_share_the_builder():
    """Both consumers must import the one builder — a private copy in
    either tool re-opens the timed-vs-counted drift the builder
    exists to close."""
    import inspect
    import sys
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, os.path.abspath(root))
    sys.path.insert(0, os.path.abspath(os.path.join(root, "tools")))
    import bench
    import flops_audit

    for mod in (bench, flops_audit):
        src = inspect.getsource(mod)
        assert "make_aug_train_step" in src, mod.__name__
