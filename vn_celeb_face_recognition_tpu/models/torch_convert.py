"""PyTorch state_dict -> flax variables converter.

The published checkpoints this stack consumes are all PyTorch
state_dicts: the in-repo MTCNN weights (reference
models/weights_mtcnn/*.pt), the facenet/arcface encoder releases
(inception_resnet_v1.py:306-331, iresnet_encoder.py:162-181) and
RetinaFace checkpoints (retina_face.py:235-265). This module converts
any flat torch state_dict into the nested {params, batch_stats} flax
variable tree, provided the flax module tree mirrors the torch
attribute names (which every model in this package does by design).

Conversion rules (driven by tensor shape + sibling keys, no torch
imports needed at inference time — tensors arrive as numpy). The torch
module path maps 1:1 onto the flax module path (flax modules are named
after the torch attributes), and the leaf renames are:
  * Conv2d weight  [O, I, kh, kw] -> kernel [kh, kw, I, O]
    (grouped/depthwise convs: torch [O, I/g, kh, kw] -> flax expects
    [kh, kw, I/g, O], same transpose).
  * Linear weight  [O, I]         -> kernel [I, O]
  * BatchNorm (detected by a sibling ``running_mean``):
      weight -> params/<path>/scale, bias -> scale's sibling bias,
      running_mean/var -> batch_stats/<path>/{mean,var}
  * PReLU weight [C] -> alpha
  * num_batches_tracked -> dropped
"""

from typing import Dict, Tuple

import numpy as np


def _to_numpy(t):
    # ALWAYS copy: torch's .numpy() shares storage with the live
    # parameter, and np.transpose returns a view — without a copy,
    # in-place torch optimizer steps would silently mutate the
    # converted flax parameters.
    if isinstance(t, np.ndarray):
        return np.array(t, copy=True)
    return np.array(t.detach().cpu().numpy(), copy=True)


def _set_path(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def convert_state_dict(state_dict, rename=None):
    """Convert a flat torch state_dict to flax variables.

    Args:
      state_dict: mapping of dotted torch keys to tensors/ndarrays.
      rename: optional callable mapping a torch key to a new dotted key
        (or None to drop the entry) before conversion.

    Returns:
      {"params": ..., "batch_stats": ...} nested dict (batch_stats may
      be empty).
    """
    entries = {}
    for key, value in state_dict.items():
        if rename is not None:
            key = rename(key)
            if key is None:
                continue
        entries[key] = _to_numpy(value)

    bn_prefixes = {
        key[: -len(".running_mean")]
        for key in entries
        if key.endswith(".running_mean")
    }

    params: Dict = {}
    batch_stats: Dict = {}
    for key, value in entries.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        prefix = ".".join(parts[:-1])
        leaf = parts[-1]
        scope = tuple(parts[:-1])

        if prefix in bn_prefixes:
            if leaf == "weight":
                _set_path(params, scope + ("scale",), value)
            elif leaf == "bias":
                _set_path(params, scope + ("bias",), value)
            elif leaf == "running_mean":
                _set_path(batch_stats, scope + ("mean",), value)
            elif leaf == "running_var":
                _set_path(batch_stats, scope + ("var",), value)
            continue

        if leaf == "weight":
            if value.ndim == 4:
                _set_path(params, scope + ("kernel",),
                          np.ascontiguousarray(
                              np.transpose(value, (2, 3, 1, 0))))
            elif value.ndim == 2:
                _set_path(params, scope + ("kernel",),
                          np.ascontiguousarray(
                              np.transpose(value, (1, 0))))
            elif value.ndim == 1:
                # PReLU negative-slope vector
                _set_path(params, scope + ("alpha",), value)
            else:
                raise ValueError(
                    f"Unhandled weight shape {value.shape} at {key}"
                )
        elif leaf == "bias":
            _set_path(params, scope + ("bias",), value)
        elif leaf == "alpha":
            _set_path(params, scope + ("alpha",), value)
        else:
            raise ValueError(f"Unhandled torch key: {key}")

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def flax_to_torch_state_dict(variables):
    """Inverse of :func:`convert_state_dict`: nested flax variables ->
    flat torch-keyed numpy state_dict.

    Used to export in-repo-trained weights (e.g. the synthetic-data
    RetinaFace fit, tools/fit_detector.py) in the SAME npz format the
    published-checkpoint conversion produces, so every loader
    (``RetinaFace(weights_path=...)``, the manifest tests) consumes one
    format. Round-trip invariant (pinned by tests/test_detector_fit.py):
    ``convert_state_dict(flax_to_torch_state_dict(v)) == v``.
    """
    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})
    bn_scopes = {path[:-1] for path, _ in flatten_tree(batch_stats)}

    out = {}
    for path, value in flatten_tree(batch_stats):
        scope, leaf = path[:-1], path[-1]
        key = ".".join(scope)
        if leaf == "mean":
            out[key + ".running_mean"] = np.asarray(value)
        elif leaf == "var":
            out[key + ".running_var"] = np.asarray(value)
        else:
            raise ValueError(f"Unhandled batch_stats leaf: {path}")
    for path, value in flatten_tree(params):
        scope, leaf = path[:-1], path[-1]
        key = ".".join(scope)
        value = np.asarray(value)
        if leaf == "scale":
            if scope not in bn_scopes:
                raise ValueError(f"scale outside BatchNorm at {path}")
            out[key + ".weight"] = value
        elif leaf == "kernel":
            if value.ndim == 4:
                out[key + ".weight"] = np.ascontiguousarray(
                    np.transpose(value, (3, 2, 0, 1)))
            elif value.ndim == 2:
                out[key + ".weight"] = np.ascontiguousarray(
                    np.transpose(value, (1, 0)))
            else:
                raise ValueError(
                    f"Unhandled kernel shape {value.shape} at {path}")
        elif leaf == "bias":
            out[key + ".bias"] = value
        elif leaf == "alpha":
            # PReLU: torch stores the slope vector as `weight`
            out[key + ".weight"] = value
        else:
            raise ValueError(f"Unhandled flax param leaf: {path}")
    return out


def load_torch_checkpoint(path):
    """torch.load a checkpoint file into numpy tensors (host only)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _to_numpy(v) for k, v in obj.items()}


def strip_prefix(state_dict, prefix="module."):
    """Drop a DataParallel-style prefix (retina_face.py:261-265)."""
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v
        for k, v in state_dict.items()
    }


def flatten_tree(tree, prefix=()):
    """Yield (path_tuple, leaf) from a nested dict."""
    for key, value in tree.items():
        path = prefix + (key,)
        if isinstance(value, dict):
            yield from flatten_tree(value, path)
        else:
            yield path, value


def assert_tree_compatible(converted, initialized):
    """Check converted variables match the model's initialised tree."""
    conv = {p: np.shape(v) for p, v in flatten_tree(converted)}
    init = {p: np.shape(v) for p, v in flatten_tree(initialized)}
    missing = set(init) - set(conv)
    unused = set(conv) - set(init)
    mismatched = {
        p: (conv[p], init[p])
        for p in set(conv) & set(init)
        if tuple(conv[p]) != tuple(init[p])
    }
    if missing or unused or mismatched:
        raise ValueError(
            "torch->flax conversion mismatch:\n"
            f"  missing from checkpoint: {sorted(missing)[:10]}\n"
            f"  unused checkpoint keys:  {sorted(unused)[:10]}\n"
            f"  shape mismatches:        {list(mismatched.items())[:10]}"
        )
