"""Test configuration: run JAX on CPU with 8 virtual devices so
multi-chip sharding tests run without TPU hardware (the standard JAX
substitute for multi-host fakes; SURVEY.md section 4).

Opt-in device runs: ``VN_TPU_TESTS=1 python -m pytest -m tpu`` keeps
the real TPU backend and runs only the ``tpu``-marked kernel
regression tests (device output vs interpret mode). Everything else
self-skips off-CPU; remember this rig's TPU is single-tenant — run one
TPU job at a time."""

import os

RUN_TPU_TESTS = os.environ.get("VN_TPU_TESTS") == "1"

if not RUN_TPU_TESTS:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

# jax may already be imported (site customisation) with another platform
# configured; the config update below still wins as long as no backend
# has been initialised yet.
import jax

if not RUN_TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np
import pytest

REFERENCE_DIR = Path("/root/reference")


def pytest_collection_modifyitems(config, items):
    """Under VN_TPU_TESTS=1 only the ``tpu``-marked device regressions
    may run: the CPU suite assumes an 8-virtual-device mesh, and every
    distinct jitted program costs minutes of remote compilation on the
    single-tenant chip. Deselect everything else so a forgotten
    ``-m tpu`` cannot flood the device."""
    if not RUN_TPU_TESTS:
        return
    skip = pytest.mark.skip(
        reason="VN_TPU_TESTS=1 runs only -m tpu device regressions"
    )
    for item in items:
        if "tpu" not in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def reference_available():
    return REFERENCE_DIR.is_dir()


@pytest.fixture(scope="session")
def mtcnn_weight_dir():
    d = REFERENCE_DIR / "models" / "weights_mtcnn"
    if not d.is_dir():
        pytest.skip("reference MTCNN weights not available")
    return str(d)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def toy_embedding_dataset(tmp_path_factory):
    """Synthetic VN-celeb-style embedding dataset: 16 classes with
    separable 512-d embeddings, train/val JSON manifests + npz files
    (the layout find_embedding.py produces)."""
    import json

    root = tmp_path_factory.mktemp("toy_emb")
    emb_dir = root / "train_emb"
    emb_dir.mkdir()
    gen = np.random.default_rng(42)
    n_classes, per_class = 16, 6
    centers = gen.normal(size=(n_classes, 512)).astype(np.float32) * 3.0
    train_manifest, val_manifest = {}, {}
    for c in range(n_classes):
        names = []
        for j in range(per_class):
            emb = centers[c] + gen.normal(size=512).astype(np.float32) * 0.3
            name = f"{c}_{j}.png"
            np.savez_compressed(emb_dir / f"{c}_{j}.npz", emb)
            names.append(name)
        train_manifest[str(c)] = names[:-1]
        val_manifest[str(c)] = [names[-1]]
    train_json = root / "train.json"
    val_json = root / "val.json"
    train_json.write_text(json.dumps(train_manifest))
    val_json.write_text(json.dumps(val_manifest))
    return {
        "emb_dir": str(emb_dir),
        "train_json": str(train_json),
        "val_json": str(val_json),
        "n_classes": n_classes,
    }
