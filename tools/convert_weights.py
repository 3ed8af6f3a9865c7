"""Convert published PyTorch checkpoints into framework-native .npz.

Usage:
  python tools/convert_weights.py mtcnn  --src <dir with pnet/rnet/onet.pt> --dst <outdir>
  python tools/convert_weights.py generic --src model.pth --dst model.npz
      [--strip-prefix module.]

``generic`` handles every published release this stack consumes —
facenet vggface2/casia, iresnet100, RetinaFace (pass
``--strip-prefix module.`` for DataParallel-saved files), the emotion
resnet50 2-branch (same flag), and the face_alignment 2DFAN4
landmark checkpoint (tests/test_weight_manifest.py and
tests/test_fan_parity.py pin the exact key manifests offline).

The .npz holds the RAW torch state_dict tensors keyed by their torch
names; models convert at load time via models/torch_convert (keeping
one canonical converter). torch is only needed to RUN this tool — the
framework itself never imports it.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _load(path):
    from vn_celeb_face_recognition_tpu.models.torch_convert import (
        load_torch_checkpoint,
    )

    return load_torch_checkpoint(path)


def save_npz(dst, state_dict):
    np.savez(dst, **{k: np.asarray(v) for k, v in state_dict.items()})
    print(f"wrote {dst} ({len(state_dict)} tensors)")


def convert_mtcnn(src, dst):
    os.makedirs(dst, exist_ok=True)
    for net in ("pnet", "rnet", "onet"):
        sd = _load(os.path.join(src, f"{net}.pt"))
        save_npz(os.path.join(dst, f"{net}.npz"), sd)


def convert_generic(src, dst, strip_prefix=None):
    from vn_celeb_face_recognition_tpu.models.torch_convert import (
        strip_prefix as strip,
    )

    sd = _load(src)
    if strip_prefix:
        sd = strip(sd, strip_prefix)
    save_npz(dst, sd)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("mtcnn")
    p1.add_argument("--src",
                    default="/root/reference/models/weights_mtcnn")
    p1.add_argument("--dst",
                    default="vn_celeb_face_recognition_tpu/models/"
                            "weights_mtcnn")
    p2 = sub.add_parser("generic")
    p2.add_argument("--src", required=True)
    p2.add_argument("--dst", required=True)
    p2.add_argument("--strip-prefix", default=None)
    args = parser.parse_args()
    if args.cmd == "mtcnn":
        convert_mtcnn(args.src, args.dst)
    else:
        convert_generic(args.src, args.dst, args.strip_prefix)
