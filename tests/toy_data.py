"""First-party toy fixture resolution.

The repo vendors the reference's 20-image toy fixture (reference
``data/*.png`` + ``train_toy.csv`` — SURVEY.md section 4) under
``/root/repo/data`` so the functional suite runs standalone; the
reference checkout remains a fallback for older working copies.
Reference-oracle *parity* tests keep their own skip-if-absent gating —
this helper only serves tests that just need real face pixels.
"""

import glob
import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# vendored fixture first; an optional reference checkout only via env
TOY_DATA_DIRS = tuple(
    p for p in (
        os.path.join(_REPO_ROOT, "data"),
        os.path.join(os.environ["VN_REFERENCE_DIR"], "data")
        if os.environ.get("VN_REFERENCE_DIR") else None,
    ) if p
)


def toy_face_files():
    """Sorted toy face-crop paths from the first populated fixture dir."""
    for d in TOY_DATA_DIRS:
        files = sorted(glob.glob(os.path.join(d, "*.png")))
        if files:
            return files
    return []
