"""Packaging metadata stays consistent with the package.

The wheel must ship the published MTCNN weights and the native runtime
sources (README "Install"); these tests pin the metadata without
building a wheel (tested manually: `pip wheel --no-build-isolation
--no-deps .` -> 62-file wheel, weights + native sources included,
imports and loads the cascade weights from an isolated install).
"""

import os
import re

import vn_celeb_face_recognition_tpu as pkg

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def _pyproject():
    with open(os.path.join(ROOT, "pyproject.toml")) as fh:
        return fh.read()


def test_version_is_dynamic_from_package():
    text = _pyproject()
    assert 'attr = "vn_celeb_face_recognition_tpu.__version__"' in text
    assert re.match(r"\d+\.\d+\.\d+", pkg.__version__)


def test_package_data_globs_resolve():
    """Every declared package-data glob matches real files."""
    import glob

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    checks = {
        os.path.join(pkg_dir, "models", "weights_mtcnn", "*.npz"): 3,
        os.path.join(pkg_dir, "native", "src", "*.cpp"): 3,
        os.path.join(pkg_dir, "native", "CMakeLists.txt"): 1,
    }
    for pattern, n in checks.items():
        assert len(glob.glob(pattern)) >= n, pattern


def test_declared_deps_importable():
    """The runtime deps named in pyproject exist in this environment."""
    text = _pyproject()
    for mod, dist in [("jax", "jax"), ("flax", "flax"),
                      ("optax", "optax"), ("numpy", "numpy"),
                      ("PIL", "pillow")]:
        assert dist in text
        __import__(mod)
