"""Checkpoint save / load / resume.

Same payload semantics as the reference torch.save checkpoints
(/root/reference/trainer/base_trainer.py:83-105): arch, epoch,
state_dict (model variables), optimizer state, monitor_best and the full
config; files are ``checkpoint-epoch{N}.ckpt`` plus ``model_best.ckpt``
on monitored-metric improvement, and resume restores epoch/best/model/
optimizer (base_trainer.py:73-80).

Serialisation uses flax's state-dict flattening so arbitrary optax
states round-trip, written as a single pickle of numpy arrays (the
model sizes here are MBs; sharded orbax checkpointing is unnecessary
and would complicate the one-file semantics users of the reference
expect).
"""

import pickle

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, *, arch, epoch, variables, opt_state,
                    monitor_best, config, backend="pickle"):
    state = {
        "arch": arch,
        "epoch": int(epoch),
        "state_dict": _to_host(serialization.to_state_dict(variables)),
        "optimizer": _to_host(serialization.to_state_dict(opt_state)),
        "monitor_best": float(monitor_best),
        "config": config,
    }
    if backend == "orbax":
        import orbax.checkpoint as ocp
        import os

        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(str(path)), state, force=True)
        return
    with open(str(path), "wb") as fp:
        pickle.dump(state, fp)


def load_checkpoint(path):
    import os

    if os.path.isdir(str(path)):  # orbax checkpoints are directories
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            return ckptr.restore(os.path.abspath(str(path)))
    with open(str(path), "rb") as fp:
        return pickle.load(fp)


def restore_variables(template, state_dict):
    """Restore a variables pytree from its serialized state dict."""
    return serialization.from_state_dict(template, state_dict)
