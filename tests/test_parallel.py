"""Multi-chip sharding tests on the 8-virtual-device CPU mesh:
dp/tp training step runs, matches single-device numerics, and the
batch really lands sharded."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vn_celeb_face_recognition_tpu.models import MLPModel
from vn_celeb_face_recognition_tpu.parallel import (
    data_sharding,
    make_dp_train_step,
    make_mesh,
)
from vn_celeb_face_recognition_tpu.training.optim import make_optimizer


def make_batch(rng, n=32, dim=64, classes=8):
    return {
        "data": rng.normal(size=(n, dim)).astype(np.float32),
        "target": rng.integers(0, classes, size=n).astype(np.int32),
        "weight": np.ones(n, dtype=np.float32),
    }


@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2), (2, 4)])
def test_dp_tp_step_runs(rng, n_data, n_model):
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    model = MLPModel(input_dim=64, num_classes=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64)))
    tx = make_optimizer("Adam", {"lr": 1e-3, "weight_decay": 1e-4})
    opt_state = tx.init(variables["params"])

    step, place_state, place_batch = make_dp_train_step(mesh, model, tx)
    variables, opt_state = place_state(variables, opt_state)
    batch = place_batch(make_batch(rng))
    with mesh:
        variables, opt_state, loss, metrics = step(
            variables, opt_state, batch, jax.random.PRNGKey(1)
        )
    assert np.isfinite(float(loss))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0


def test_dp_matches_single_device(rng):
    """The sharded step must produce the same loss trajectory as an
    unsharded step (same params, same batch, same rng)."""
    model = MLPModel(input_dim=64, num_classes=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64)))
    tx = make_optimizer("Adam", {"lr": 1e-2, "weight_decay": 0.0})

    batch = make_batch(rng)

    # single device
    mesh1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    step1, ps1, pb1 = make_dp_train_step(mesh1, model, tx,
                                         shard_mlp=False, donate=False)
    v1, o1 = ps1(variables, tx.init(variables["params"]))
    b1 = pb1(batch)

    # 8-way data parallel
    mesh8 = make_mesh(n_data=8, n_model=1)
    step8, ps8, pb8 = make_dp_train_step(mesh8, model, tx,
                                         shard_mlp=False, donate=False)
    v8, o8 = ps8(variables, tx.init(variables["params"]))
    b8 = pb8(batch)

    key = jax.random.PRNGKey(3)
    losses1, losses8 = [], []
    for i in range(3):
        v1, o1, l1, _ = step1(v1, o1, b1, key)
        v8, o8, l8, _ = step8(v8, o8, b8, key)
        losses1.append(float(l1))
        losses8.append(float(l8))
    np.testing.assert_allclose(losses1, losses8, rtol=1e-4)


def test_batch_is_sharded(rng):
    mesh = make_mesh(n_data=8, n_model=1)
    x = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    placed = jax.device_put(x, data_sharding(mesh, 2))
    assert len(placed.sharding.device_set) == 8


def test_sharded_encoder_matches_single(rng):
    """Sharded batched inference (embedding-extraction path) equals the
    single-device result."""
    import flax.linen as nn

    from vn_celeb_face_recognition_tpu.pipeline.recognition import \
        _JitApply

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(32)(nn.relu(nn.Dense(64)(x)))

    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))
    x = rng.normal(size=(23, 16)).astype(np.float32)  # odd count

    single = _JitApply(model, variables)(x)
    mesh = make_mesh(n_data=8, n_model=1)
    sharded = _JitApply(model, variables, mesh=mesh)(x)
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)
