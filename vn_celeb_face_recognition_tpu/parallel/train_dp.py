"""Multi-chip training step: dp over 'data' x tp over 'model'.

One jitted SPMD program: batch sharded over the data axis, MLP head
parameters sharded over the model axis (Megatron column->row pairing),
encoder parameters replicated. XLA inserts the gradient psum over the
data axis and the activation psum after the row-parallel matmul over
the model axis — both ride ICI.

This is the full training-step path ``__graft_entry__.dryrun_multichip``
exercises, and the scale-out path for the online-aug trainer (frozen
encoder forward + MLP update, reference online_aug_trainer.py:22-33).
"""

import jax
import jax.numpy as jnp
import optax

from ..training.losses import neg_log_llhood, accuracy
from .mesh import data_sharding, mlp_param_sharding, replicated_sharding


def make_dp_train_step(mesh, model, optimizer, encoder=None,
                       encoder_variables=None, transform=None,
                       shard_mlp=True, donate=True):
    """Build (train_step, place_state, place_batch).

    train_step(variables, opt_state, batch, rng) -> (variables,
    opt_state, loss, metrics); all arguments already placed via the
    returned placement helpers.
    """

    def step(variables, opt_state, batch, rng):
        rng_tf, rng_do = jax.random.split(rng)
        x = jnp.asarray(batch["data"])
        if transform is not None:
            x = transform(x, rng_tf)
        if encoder is not None:
            x = jax.lax.stop_gradient(
                encoder.apply(encoder_variables, x, train=False)
            )
        target = batch["target"]
        weight = batch["weight"]

        def loss_of(params):
            out = model.apply(
                dict(variables, params=params), x, train=True,
                rngs={"dropout": rng_do},
            )
            return neg_log_llhood(out, target, weight), out

        (loss, out), grads = jax.value_and_grad(loss_of, has_aux=True)(
            variables["params"]
        )
        updates, new_opt_state = optimizer.update(
            grads, opt_state, variables["params"]
        )
        new_params = optax.apply_updates(variables["params"], updates)
        metrics = {"accuracy": accuracy(out, target, weight)}
        return dict(variables, params=new_params), new_opt_state, loss, \
            metrics

    donate_argnums = (0, 1) if donate else ()
    jit_step = jax.jit(step, donate_argnums=donate_argnums)

    def place_state(variables, opt_state):
        repl = replicated_sharding(mesh)
        if shard_mlp:
            params = mlp_param_sharding(mesh, variables["params"])
            variables = dict(variables, params=params)
            rest = {k: v for k, v in variables.items() if k != "params"}
            variables = dict(
                jax.device_put(rest, repl), params=params
            )
            opt_state = jax.tree_util.tree_map(
                lambda leaf: leaf, opt_state
            )
            # optimizer moments follow their parameters' shardings via
            # jit's propagation on first update; initial placement
            # replicated is fine for correctness.
            opt_state = jax.device_put(opt_state, repl)
        else:
            variables = jax.device_put(variables, repl)
            opt_state = jax.device_put(opt_state, repl)
        return variables, opt_state

    def place_batch(batch):
        out = {}
        for k, v in batch.items():
            if hasattr(v, "ndim"):
                out[k] = jax.device_put(v, data_sharding(mesh, v.ndim))
            else:
                out[k] = v
        return out

    return jit_step, place_state, place_batch
