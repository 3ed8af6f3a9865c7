"""ResNet2Branch (emotion) parity vs the reference torch model with
shared random weights."""

import numpy as np
import pytest

import jax.numpy as jnp

from vn_celeb_face_recognition_tpu.models import ResNet2Branch
from vn_celeb_face_recognition_tpu.models.torch_convert import (
    assert_tree_compatible,
    convert_state_dict,
)

torch = pytest.importorskip("torch")


@pytest.mark.slow
def test_resnet_2branch_parity(rng):
    import jax

    from ref_oracle import load_ref_module

    ref_mod = load_ref_module("resnet_2_branch")
    torch.manual_seed(0)
    ref = ref_mod.resnet_2branch_50(
        pretrained=False, checkpoint_path=None, num_classes=17,
        num_projections=30,
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = ResNet2Branch(num_classes=17, num_projections=30)
    variables = convert_state_dict(sd)
    init_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 224, 224, 3)))
    assert_tree_compatible(variables, init_vars)

    x = rng.uniform(-2, 2, size=(2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        want_cls, want_proj = ref(torch.from_numpy(x))
    got_cls, got_proj = model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got_cls), want_cls.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_proj), want_proj.numpy(),
                               rtol=1e-3, atol=1e-3)
