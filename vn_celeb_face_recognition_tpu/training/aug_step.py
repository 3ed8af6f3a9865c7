"""Shared builder for the online-aug training step that bench.py times
and tools/flops_audit.py cost-analyses.

The MFU number in BENCH artifacts is only honest if the timed program
and the FLOP-counted program are the same; both tools therefore build
their step here instead of keeping private copies that could drift.
Semantics mirror AugClassificationTrainer's jitted step
(cfg/train_cfg_aug_emb_classify.json — device facenet_aug -> frozen
encoder -> trainable MLP, weight-masked NLL, reference-style Adam;
reference /root/reference/train.py + online_aug_trainer.py:6-33).
"""

import jax
import jax.numpy as jnp
import optax

from ..models import InceptionResnetV1, MLPModel, iresnet100
from ..ops import augment as A
from .losses import neg_log_llhood
from .optim import make_optimizer


def make_aug_train_step(enc_kind="iresnet100", num_classes=1001,
                        target_fs=112, seed=0):
    """Build the online-aug train step and its initial state.

    Returns ``(train_step, variables, opt_state)`` where ``train_step``
    is an UNJITTED ``(variables, opt_state, imgs_u8, target, weight,
    rng) -> (variables, opt_state, loss)`` function — bench.py jits it
    with donated state, flops_audit lowers it for cost analysis.
    """
    if enc_kind == "iresnet100":
        # cfg/train_cfg_aug_emb_classify.json chosen_idx_enc=2
        encoder = iresnet100(dtype=jnp.bfloat16)
    else:
        encoder = InceptionResnetV1(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(seed)
    enc_vars = encoder.init(key,
                            jnp.zeros((1, target_fs, target_fs, 3)))
    mlp = MLPModel(input_dim=512, num_classes=num_classes)
    variables = mlp.init(key, jnp.zeros((1, 512)))
    tx = make_optimizer("Adam", {"lr": 1e-4, "weight_decay": 1e-4})
    opt_state = tx.init(variables["params"])

    def train_step(variables, opt_state, imgs_u8, target, weight, rng):
        rng_tf, rng_do = jax.random.split(rng)
        x = A.facenet_aug_shear(rng_tf,
                                imgs_u8.astype(jnp.float32))
        emb = jax.lax.stop_gradient(
            encoder.apply(enc_vars, x, train=False))

        def loss_of(params):
            out = mlp.apply(dict(variables, params=params), emb,
                            train=True, rngs={"dropout": rng_do})
            return neg_log_llhood(out, target, weight)

        loss, grads = jax.value_and_grad(loss_of)(variables["params"])
        upd, opt_state2 = tx.update(grads, opt_state,
                                    variables["params"])
        params = optax.apply_updates(variables["params"], upd)
        return dict(variables, params=params), opt_state2, loss

    return train_step, variables, opt_state
