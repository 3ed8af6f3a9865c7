"""Optimizer semantics parity: our optax chain must track
torch.optim.Adam(weight_decay=...) step-for-step on the reference MLP
(torch couples weight decay INTO the gradient before the moment
updates — not AdamW), and the LR schedulers must mirror torch's."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from vn_celeb_face_recognition_tpu.models import MLPModel
from vn_celeb_face_recognition_tpu.models.torch_convert import (
    convert_state_dict,
)
from vn_celeb_face_recognition_tpu.training.losses import neg_log_llhood
from vn_celeb_face_recognition_tpu.training.optim import (
    ReduceLROnPlateau,
    make_optimizer,
)

torch = pytest.importorskip("torch")


def torch_mlp(input_dim, n_classes):
    import torch.nn as nn

    model = nn.Sequential()
    model.dense_1 = nn.Linear(input_dim, 2048)
    model.dense_2 = nn.Linear(2048, n_classes)

    def forward(x):
        h = torch.relu(model.dense_1(x))
        return torch.log_softmax(model.dense_2(h), dim=1)

    return model, forward


def test_adam_matches_torch(rng):
    dim, classes, bs = 32, 5, 16
    torch.manual_seed(0)
    tmodel, tforward = torch_mlp(dim, classes)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_state_dict(sd)

    model = MLPModel(input_dim=dim, num_classes=classes)
    tx = make_optimizer("Adam", {"lr": 1e-3, "weight_decay": 1e-2})
    opt_state = tx.init(variables["params"])

    topt = torch.optim.Adam(tmodel.parameters(), lr=1e-3,
                            weight_decay=1e-2)
    tloss_fn = torch.nn.NLLLoss()

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_of(p):
            out = model.apply({"params": p}, x, train=False)
            return neg_log_llhood(out, y)

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    for i in range(5):
        x = rng.normal(size=(bs, dim)).astype(np.float32)
        y = rng.integers(0, classes, size=bs).astype(np.int64)

        # torch step
        topt.zero_grad()
        tout = tforward(torch.from_numpy(x))
        tloss = tloss_fn(tout, torch.from_numpy(y))
        tloss.backward()
        topt.step()

        # jax step
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x),
            jnp.asarray(y.astype(np.int32)),
        )
        assert abs(float(loss) - float(tloss)) < 1e-5

    # parameters equal after 5 coupled-weight-decay Adam steps
    t_sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    want = convert_state_dict(t_sd)["params"]
    for layer in ("dense_1", "dense_2"):
        np.testing.assert_allclose(
            np.asarray(params[layer]["kernel"]),
            want[layer]["kernel"], rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(params[layer]["bias"]),
            want[layer]["bias"], rtol=1e-4, atol=1e-6,
        )


def test_reduce_lr_on_plateau_matches_torch():
    tparam = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([tparam], lr=0.1)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        topt, mode="min", factor=0.5, patience=1, threshold=0.01,
        threshold_mode="rel", min_lr=1e-4,
    )
    ours = ReduceLROnPlateau(mode="min", factor=0.5, patience=1,
                             threshold=0.01, threshold_mode="rel",
                             min_lr=1e-4)
    lr = 0.1
    metrics = [1.0, 0.99, 0.985, 0.984, 0.9835, 0.983, 0.5, 0.51,
               0.512, 0.511, 0.5105]
    for m in metrics:
        tsched.step(m)
        lr = ours.step(m, lr)
        torch_lr = topt.param_groups[0]["lr"]
        assert abs(lr - torch_lr) < 1e-9, (m, lr, torch_lr)
