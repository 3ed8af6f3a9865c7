"""Device mesh + sharding helpers.

The reference is a single-process single-GPU codebase with NO
distributed backend (SURVEY.md section 2.3 — the only parallelism
artefacts are a DataParallel checkpoint shim and a dead ``ngpu``
field). The TPU-native scale story is jax.sharding over an ICI mesh:

  * ``data`` axis — batch sharding for training steps, embedding
    extraction, and video frame chunks (the dominant axis for these
    model sizes);
  * ``model`` axis — tensor-parallel sharding for the classifier head
    when the class count grows (the MLP's 2048->N matmul is the only
    layer that meaningfully shards at this scale).

Parameters are replicated (or sharded along ``model``) with
NamedSharding; XLA inserts the gradient psum / activation collectives
over ICI automatically — there is no NCCL process-group management to
port.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_model=1, devices=None):
    """Build a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(
        n_data, n_model
    )
    return Mesh(devs, axis_names=("data", "model"))


def data_sharding(mesh, rank=1):
    """Shard the leading (batch) axis over 'data'."""
    spec = P("data", *([None] * (rank - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Place every array in a batch dict with its leading axis sharded
    over the data axis."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim"):
            out[k] = jax.device_put(v, data_sharding(mesh, v.ndim))
        else:
            out[k] = v
    return out


def mlp_param_sharding(mesh, params):
    """Tensor-parallel layout for the MLP head: dense_1 kernel column-
    sharded over 'model' (output features), dense_2 kernel row-sharded
    (contraction dim) — the standard Megatron column->row pairing, so
    the only collective is the psum XLA inserts after dense_2."""
    def place(path, leaf):
        names = [getattr(p, "key", None) for p in path]
        if "dense_1" in names:
            spec = P(None, "model") if leaf.ndim == 2 else P("model")
        elif "dense_2" in names:
            spec = P("model", None) if leaf.ndim == 2 else P()
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
