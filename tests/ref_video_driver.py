"""Run the REFERENCE video pipeline end-to-end as a subprocess oracle.

Drives /root/reference/demo_video.py's actual ``main`` loop (the
par_fd_vs_aln path: MTCNN.inference -> get_face_from_boxes ->
skimage-Umeyama + cv2.warpAffine alignment -> transforms_default ->
InceptionResnetV1 -> MLP -> identify_person -> emotion top-k -> the
tracker.csv row writer, demo_video.py:155-184) and the reference
statistic exporter (celeb_statistic.py:32-107) over a synthetic toy
video, with every weight SHARED with the repo side:

  * MTCNN: the published pnet/rnet/onet.pt under the reference tree
    (byte-identical to the repo's vendored npz conversions, pinned by
    tests/test_self_contained.py checksums);
  * encoder: a seeded random torch InceptionResnetV1 whose state_dict
    is saved to ``enc.pt`` for the repo side to convert;
  * classifier: the reference MLPModel trained IN THIS DRIVER on the
    reference pipeline's own embeddings of the toy faces (so class
    margins are large and names are stable across float-level pipeline
    differences), saved in the reference checkpoint format
    (``model_best.pth``: {epoch, state_dict});
  * emotion: the reference resnet_2branch_50 with its final fc
    weights scaled to ~0 and a staggered bias, making the top-k
    ranking deterministic — the differential then checks the emotion
    PLUMBING (transform, net execution, idx->tag mapping, row/json
    formatting) while the net's numerics stay covered by
    tests/test_emotion_parity.py.

Absent third-party deps of the reference (torchvision, imgaug,
face_alignment, skimage, pafy) are stubbed with minimal
documented-semantics stand-ins (skimage.transform.SimilarityTransform
implements the standard Umeyama closed form the reference relies on).

Usage: python tests/ref_video_driver.py --workdir /tmp/xxx
Expects workdir to contain toy.avi + label2name.csv; writes enc.pt,
model_best.pth, emo.pth, ref_tracker.csv, ref_tracker.json.

PUBLIC-UNTRUSTED note: this file only *executes* reference code as an
oracle; nothing is copied into the repo's library.
"""

import argparse
import json
import os
import sys
import types

REF_DIR = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))

NUM_CLASSES = 10
EMOTION_CLASSES = 690


def frame_label(i):
    """Face identity pasted on frame ``i`` of the toy video (shared
    with the repo-side test so MLP training labels line up)."""
    return (i // 4) % NUM_CLASSES


# ---------------------------------------------------------------------------
# Stubs
# ---------------------------------------------------------------------------


def _umeyama(src, dst, estimate_scale=True):
    """Umeyama 1991 closed-form similarity estimate, following the
    algorithm skimage.transform documents for SimilarityTransform
    (least-squares rotation+scale+translation src -> dst)."""
    import numpy as np

    num, dim = src.shape
    src_mean = src.mean(axis=0)
    dst_mean = dst.mean(axis=0)
    src_demean = src - src_mean
    dst_demean = dst - dst_mean
    A = dst_demean.T @ src_demean / num
    d = np.ones((dim,), dtype=np.float64)
    if np.linalg.det(A) < 0:
        d[dim - 1] = -1
    T = np.eye(dim + 1, dtype=np.float64)
    U, S, V = np.linalg.svd(A)
    rank = np.linalg.matrix_rank(A)
    if rank == 0:
        return T * np.nan
    if rank == dim - 1:
        if np.linalg.det(U) * np.linalg.det(V) > 0:
            T[:dim, :dim] = U @ V
        else:
            s = d[dim - 1]
            d[dim - 1] = -1
            T[:dim, :dim] = U @ np.diag(d) @ V
            d[dim - 1] = s
    else:
        T[:dim, :dim] = U @ np.diag(d) @ V
    if estimate_scale:
        scale = 1.0 / src_demean.var(axis=0).sum() * (S @ d)
    else:
        scale = 1.0
    T[:dim, dim] = dst_mean - scale * (T[:dim, :dim] @ src_mean.T)
    T[:dim, :dim] *= scale
    return T


def install_stubs():
    import numpy as np
    import torch
    from PIL import Image

    # the reference targets numpy 1.x: its row writer str()'s lists of
    # np.float64 / np.str_ scalars, whose numpy-2 reprs ("np.float64(x)")
    # would break its own ast.literal_eval statistic reader. Restore
    # the 1.x scalar reprs the code was written against.
    np.set_printoptions(legacy="1.25")

    sys.path.insert(0, HERE)  # tests/: ref_oracle
    from ref_oracle import install_torchvision_stub

    install_torchvision_stub()

    # ---- torchvision.transforms classes (documented semantics) ------
    tfm = sys.modules["torchvision.transforms"]

    class Compose:
        def __init__(self, steps):
            self.steps = steps

        def __call__(self, x):
            for s in self.steps:
                x = s(x)
            return x

    class Lambda:
        def __init__(self, fn):
            self.fn = fn

        def __call__(self, x):
            return self.fn(x)

    class Resize:
        """PIL bilinear resize; int size = shorter side (square inputs
        in this pipeline resize to size x size exactly)."""

        def __init__(self, size, interpolation=None):
            self.size = size

        def __call__(self, img):
            if isinstance(self.size, int):
                w, h = img.size
                if w <= h:
                    out = (self.size, int(round(h * self.size / w)))
                else:
                    out = (int(round(w * self.size / h)), self.size)
            else:
                out = (self.size[1], self.size[0])
            return img.resize(out, Image.BILINEAR)

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, dtype=np.float32) / 255.0
            return torch.from_numpy(arr.transpose(2, 0, 1))

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class _TrainOnly:
        """Augs constructed at import but never run at inference."""

        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            raise RuntimeError("training-only transform invoked")

    tfm.Compose = Compose
    tfm.Lambda = Lambda
    tfm.Resize = Resize
    tfm.ToTensor = ToTensor
    tfm.Normalize = Normalize
    tfm.RandomRotation = _TrainOnly
    tfm.RandomCrop = _TrainOnly
    tfm.RandomHorizontalFlip = _TrainOnly
    sys.modules["torchvision"].transforms = tfm

    # ---- face_alignment (FAN; unused on the par path) ---------------
    fa = types.ModuleType("face_alignment")

    class LandmarksType:
        _2D = "2d"

    class FaceAlignment:
        def __init__(self, *a, **k):
            pass

    fa.LandmarksType = LandmarksType
    fa.FaceAlignment = FaceAlignment
    sys.modules["face_alignment"] = fa

    # ---- imgaug (training-time augs, constructed at import) ---------
    imgaug = types.ModuleType("imgaug")
    augmenters = types.ModuleType("imgaug.augmenters")

    class _Aug:
        def __init__(self, *a, **k):
            pass

        def augment_image(self, *a, **k):
            raise RuntimeError("imgaug stub: augmentation invoked")

    def _aug_getattr(name):
        if name.startswith("__"):  # keep inspect/import machinery sane
            raise AttributeError(name)
        return _Aug

    augmenters.__getattr__ = _aug_getattr
    imgaug.augmenters = augmenters
    sys.modules["imgaug"] = imgaug
    sys.modules["imgaug.augmenters"] = augmenters

    # ---- skimage.transform.SimilarityTransform (Umeyama) ------------
    sk = types.ModuleType("skimage")
    sktr = types.ModuleType("skimage.transform")
    skio = types.ModuleType("skimage.io")

    class SimilarityTransform:
        def __init__(self):
            self.params = np.eye(3)

        def estimate(self, src, dst):
            self.params = _umeyama(
                np.asarray(src, np.float64), np.asarray(dst, np.float64)
            )
            return np.all(np.isfinite(self.params))

    sktr.SimilarityTransform = SimilarityTransform
    sk.transform = sktr
    sk.io = skio
    sys.modules["skimage"] = sk
    sys.modules["skimage.transform"] = sktr
    sys.modules["skimage.io"] = skio

    # ---- pafy (YouTube; celeb_statistic imports it at module level) -
    sys.modules["pafy"] = types.ModuleType("pafy")


# ---------------------------------------------------------------------------
# Shared-weight construction
# ---------------------------------------------------------------------------


def build_shared_models(workdir, model_md, dv, center_point):
    """Seeded encoder, margin-trained MLP, bias-staggered emotion —
    state dicts saved for the repo side."""
    import numpy as np
    import torch

    torch.manual_seed(0)
    enc = model_md.InceptionResnetV1(pretrained=None)

    # embeddings of the toy faces THROUGH the reference pipeline
    # (detect -> align -> transforms_default -> encoder), then train
    # the MLP to separate them with a large margin
    import cv2

    from data_loader import transforms_default
    from demo_image import parallel_detect_and_align

    cap = cv2.VideoCapture(os.path.join(workdir, "toy.avi"))
    frames, labels = [], []
    idx = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        labels.append(frame_label(idx))
        idx += 1
    cap.release()
    det = dv.detection_md
    alg_faces, _ = parallel_detect_and_align(
        frames, det, center_point, (112, 112), False
    )
    xs, ys = [], []
    for fl, lab in zip(alg_faces, labels):
        for face in fl:
            xs.append(transforms_default(face))
            ys.append(lab)
    assert xs, "reference pipeline found no faces in the toy video"
    # a freshly-initialised deep net in eval mode runs BatchNorm with
    # identity running stats, collapsing every face to near-identical
    # embeddings; calibrate the stats with a few train-mode passes so
    # the shared random encoder is actually discriminative, THEN
    # freeze and share the state dict (running stats ride along
    # through the repo-side converter)
    enc.train()
    with torch.no_grad():
        for _ in range(60):  # running stats -> batch stats (momentum
            enc(torch.stack(xs))  # 0.1: 8 passes leave them collapsed)
    enc.eval()
    torch.save(enc.state_dict(), os.path.join(workdir, "enc.pt"))
    with torch.no_grad():
        emb = enc(torch.stack(xs))
    mlp = model_md.MLPModel(512, NUM_CLASSES)
    opt = torch.optim.Adam(mlp.parameters(), lr=1e-3)
    target = torch.tensor(ys)
    mlp.train()
    for _ in range(300):
        opt.zero_grad()
        loss = torch.nn.functional.nll_loss(mlp(emb), target)
        loss.backward()
        opt.step()
    mlp.eval()
    with torch.no_grad():
        acc = (mlp(emb).argmax(1) == target).float().mean().item()
    assert acc == 1.0, f"driver MLP failed to separate toy faces ({acc})"
    torch.save(
        {"epoch": 0, "state_dict": mlp.state_dict()},
        os.path.join(workdir, "model_best.pth"),
    )

    # emotion: deterministic ranking via ~zero fc weight + staggered
    # bias (plumbing oracle; numerics covered by test_emotion_parity)
    torch.manual_seed(1)
    emo = model_md.resnet_2branch_50(
        pretrained=False, num_classes=EMOTION_CLASSES
    )
    sd = emo.state_dict()
    fc_w = [k for k, v in sd.items()
            if v.ndim == 2 and v.shape[0] == EMOTION_CLASSES]
    fc_b = [k for k, v in sd.items()
            if v.ndim == 1 and v.shape[0] == EMOTION_CLASSES]
    assert fc_w and fc_b, "could not locate the 690-way fc layer"
    for k in fc_w:
        sd[k] = sd[k] * 1e-7
    for k in fc_b:
        sd[k] = torch.arange(EMOTION_CLASSES, dtype=torch.float32) * 0.01
    # the reference loader wraps the net in nn.DataParallel before
    # load_state_dict (resnet_2_branch.py:83-86) -> 'module.' keys;
    # the repo-side converter strips the same prefix
    sd = {"module." + k: v for k, v in sd.items()}
    torch.save({"state_dict": sd}, os.path.join(workdir, "emo.pth"))
    return np.stack([t.numpy() for t in xs]).shape[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--n_frames", default=8, type=int)
    ap.add_argument("--n_intervals", default=3, type=int)
    ap.add_argument("--n_appear", default=3, type=int)
    args = ap.parse_args()
    workdir = os.path.abspath(args.workdir)

    install_stubs()
    sys.path.insert(0, REF_DIR)
    os.chdir(REF_DIR)  # reference reads its cfg/ + meta_data relatively

    import pandas as pd
    import torch

    import demo_video as dv
    import models as model_md
    from align_face import center_point_dict
    from utils import read_json

    target_fs = (112, 112)
    center_point = center_point_dict[str(target_fs)]

    det_args = read_json("cfg/detection/mtcnn.json")
    det_args.pop("device", None)
    dv.detection_md = model_md.MTCNN(**det_args)
    dv.detection_md.eval()

    n_faces = build_shared_models(workdir, model_md, dv, center_point)
    print(f"[ref driver] shared models built ({n_faces} train faces)")

    enc = model_md.InceptionResnetV1(pretrained=None)
    enc.load_state_dict(torch.load(os.path.join(workdir, "enc.pt")))
    dv.emb_model = enc.eval()

    mlp = model_md.MLPModel(512, NUM_CLASSES)
    mlp.load_state_dict(
        torch.load(os.path.join(workdir, "model_best.pth"))["state_dict"]
    )
    mlp.eval()

    label2name_df = pd.read_csv(os.path.join(workdir, "label2name.csv"))

    emt_cfg = {
        "pretrained": False,
        "num_classes": EMOTION_CLASSES,
        "checkpoint_path": os.path.join(workdir, "emo.pth"),
    }
    with open(os.path.join(workdir, "emotion_args.json"), "w") as fh:
        json.dump(emt_cfg, fh)

    run_args = argparse.Namespace(
        video_path=os.path.join(workdir, "toy.avi"),
        output_frame=os.path.join(workdir, "ref_frames"),
        output_tracker=os.path.join(workdir, "ref_tracker.csv"),
        inference_method="par_fd_vs_aln",
        min_dim_box=50,
        box_ratio=2.0,
        recog_threshold=0.0,
        recog_emotion=True,
        emotion="resnet_2branch_50",
        emotion_args=os.path.join(workdir, "emotion_args.json"),
        etag2idx_file=os.path.join(
            os.path.dirname(HERE), "meta_data", "emotion_recognition",
            "etag2idx.pkl",
        ),
        topk_emotions=6,
        n_frames=args.n_frames,
        log_step=10000,
        save_frame_recognized="",
        output_video="",
    )
    # this era's cv2 rejects the float coords the reference feeds
    # cv2.rectangle; drawing does not touch the tracker output, so
    # neutralise it rather than patch reference behaviour
    dv.draw_boxes_on_image = lambda img, boxes, names: img
    dv.draw_emotions = lambda *a, **k: None

    dv.main(
        run_args, dv.detection_md, dv.emb_model, mlp, None,
        torch.device("cpu"), label2name_df, target_fs, center_point,
    )

    # the statistic exporter (celeb_statistic.py:32-107) over the rows
    import celeb_statistic as ref_stat

    df = pd.read_csv(os.path.join(workdir, "ref_tracker.csv"))
    ref_stat.export_json_stat_dynamic_itv(
        df, os.path.join(workdir, "ref_tracker.json"), args.n_intervals,
        n_appear=args.n_appear,
    )
    print("[ref driver] done")


if __name__ == "__main__":
    main()
