"""Parity of the flax P/R/O-nets against the PUBLISHED MTCNN weights.

Oracle: the torch state_dicts shipped with the reference
(models/weights_mtcnn/*.pt) evaluated with bare torch.nn.functional
calls (conv2d/prelu/max_pool2d/linear/softmax) — i.e. the defining
computation of each network, independent of any module code. The flax
models consume the same weights through the torch->flax converter; the
activations must match to float32 tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vn_celeb_face_recognition_tpu.models.mtcnn import PNet, RNet, ONet
from vn_celeb_face_recognition_tpu.models.torch_convert import (
    convert_state_dict,
    load_torch_checkpoint,
)

torch = pytest.importorskip("torch")
F = torch.nn.functional


def conv(x, sd, name):
    return F.conv2d(x, sd[name + ".weight"], sd[name + ".bias"])


def prelu(x, sd, name):
    return F.prelu(x, sd[name + ".weight"])


def dense(x, sd, name):
    return F.linear(x, sd[name + ".weight"], sd[name + ".bias"])


def oracle_pnet(sd, x):
    x = prelu(conv(x, sd, "conv1"), sd, "prelu1")
    x = F.max_pool2d(x, 2, 2, ceil_mode=True)
    x = prelu(conv(x, sd, "conv2"), sd, "prelu2")
    x = prelu(conv(x, sd, "conv3"), sd, "prelu3")
    a = F.softmax(conv(x, sd, "conv4_1"), dim=1)
    b = conv(x, sd, "conv4_2")
    return b, a


def oracle_rnet(sd, x):
    x = prelu(conv(x, sd, "conv1"), sd, "prelu1")
    x = F.max_pool2d(x, 3, 2, ceil_mode=True)
    x = prelu(conv(x, sd, "conv2"), sd, "prelu2")
    x = F.max_pool2d(x, 3, 2, ceil_mode=True)
    x = prelu(conv(x, sd, "conv3"), sd, "prelu3")
    x = x.permute(0, 3, 2, 1).contiguous().view(x.shape[0], -1)
    x = prelu(dense(x, sd, "dense4"), sd, "prelu4")
    a = F.softmax(dense(x, sd, "dense5_1"), dim=1)
    b = dense(x, sd, "dense5_2")
    return b, a


def oracle_onet(sd, x):
    x = prelu(conv(x, sd, "conv1"), sd, "prelu1")
    x = F.max_pool2d(x, 3, 2, ceil_mode=True)
    x = prelu(conv(x, sd, "conv2"), sd, "prelu2")
    x = F.max_pool2d(x, 3, 2, ceil_mode=True)
    x = prelu(conv(x, sd, "conv3"), sd, "prelu3")
    x = F.max_pool2d(x, 2, 2, ceil_mode=True)
    x = prelu(conv(x, sd, "conv4"), sd, "prelu4")
    x = x.permute(0, 3, 2, 1).contiguous().view(x.shape[0], -1)
    x = prelu(dense(x, sd, "dense5"), sd, "prelu5")
    a = F.softmax(dense(x, sd, "dense6_1"), dim=1)
    b = dense(x, sd, "dense6_2")
    c = dense(x, sd, "dense6_3")
    return b, c, a


def _sd(mtcnn_weight_dir, name):
    raw = load_torch_checkpoint(f"{mtcnn_weight_dir}/{name}.pt")
    return {k: torch.from_numpy(v) for k, v in raw.items()}


def _run_pair(net, oracle, sd, x_nchw, n_outputs):
    variables = convert_state_dict({k: v.numpy() for k, v in sd.items()})
    x_nhwc = jnp.asarray(x_nchw.permute(0, 2, 3, 1).numpy())
    got = net.apply(variables, x_nhwc)
    want = oracle(sd, x_nchw)
    assert len(got) == n_outputs == len(want)
    for g, w in zip(got, want):
        w = w.numpy()
        g = np.asarray(g)
        if w.ndim == 4:  # NCHW -> NHWC
            w = np.transpose(w, (0, 2, 3, 1))
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize("size", [12, 37, 101])
def test_pnet_parity(mtcnn_weight_dir, rng, size):
    sd = _sd(mtcnn_weight_dir, "pnet")
    x = torch.from_numpy(
        rng.uniform(-1, 1, size=(2, 3, size, size)).astype(np.float32)
    )
    _run_pair(PNet(), oracle_pnet, sd, x, 2)


@pytest.mark.parametrize("hw", [(14, 14), (15, 17), (33, 22), (101, 76)])
def test_fused_pnet_matches_module(mtcnn_weight_dir, rng, hw):
    """The cascade's space-to-depth conv1+PReLU+ceil-pool fusion must
    equal the stock PNet module to float rounding on odd AND even
    sizes (the ceil-pool edge sub-positions are where it would
    break)."""
    import jax.numpy as jnp

    from vn_celeb_face_recognition_tpu.models.mtcnn import (
        _fused_pnet_apply,
        load_mtcnn_variables,
    )

    v = load_mtcnn_variables(mtcnn_weight_dir)["pnet"]
    h, w = hw
    x = jnp.asarray(
        rng.uniform(-1, 1, size=(2, h, w, 3)).astype(np.float32)
    )
    want_reg, want_prob = PNet().apply(v, x)
    got_reg, got_prob = _fused_pnet_apply(v, x, jnp.float32)
    np.testing.assert_allclose(np.asarray(got_reg),
                               np.asarray(want_reg),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_prob),
                               np.asarray(want_prob),
                               rtol=1e-5, atol=1e-5)


def test_rnet_parity(mtcnn_weight_dir, rng):
    sd = _sd(mtcnn_weight_dir, "rnet")
    x = torch.from_numpy(
        rng.uniform(-1, 1, size=(4, 3, 24, 24)).astype(np.float32)
    )
    _run_pair(RNet(), oracle_rnet, sd, x, 2)


def test_onet_parity(mtcnn_weight_dir, rng):
    sd = _sd(mtcnn_weight_dir, "onet")
    x = torch.from_numpy(
        rng.uniform(-1, 1, size=(4, 3, 48, 48)).astype(np.float32)
    )
    _run_pair(ONet(), oracle_onet, sd, x, 3)
