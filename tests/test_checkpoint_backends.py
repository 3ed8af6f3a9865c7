"""Checkpoint backends: pickle file and orbax directory round-trips
restore into the live optimizer/model state."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vn_celeb_face_recognition_tpu.models import MLPModel
from vn_celeb_face_recognition_tpu.training.checkpoint import (
    load_checkpoint,
    restore_variables,
    save_checkpoint,
)
from vn_celeb_face_recognition_tpu.training.optim import make_optimizer


@pytest.mark.parametrize("backend", ["pickle", "orbax"])
def test_checkpoint_roundtrip(tmp_path, backend):
    model = MLPModel(input_dim=16, num_classes=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))
    tx = make_optimizer("Adam", {"lr": 1e-3, "weight_decay": 1e-4})
    opt_state = tx.init(variables["params"])

    path = tmp_path / ("ckpt" if backend == "orbax"
                       else "checkpoint-epoch3.ckpt")
    save_checkpoint(
        str(path), arch="MLPModel", epoch=3, variables=variables,
        opt_state=opt_state, monitor_best=0.5,
        config={"loss": "neg_log_llhood"}, backend=backend,
    )
    cp = load_checkpoint(str(path))
    assert cp["epoch"] == 3
    assert abs(cp["monitor_best"] - 0.5) < 1e-9
    restored = restore_variables(variables, cp["state_dict"])
    np.testing.assert_allclose(
        np.asarray(restored["params"]["dense_1"]["kernel"]),
        np.asarray(variables["params"]["dense_1"]["kernel"]),
    )
    restored_opt = restore_variables(opt_state, cp["optimizer"])
    jax.tree_util.tree_map(lambda a, b: None, restored_opt, opt_state)
