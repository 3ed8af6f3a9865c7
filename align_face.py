"""Batch face-alignment CLI for dataset preparation.

Same surface as /root/reference/align_face.py: align every image in a
directory to a canonical size via 5-point landmarks, with a
progressive Gaussian-blur sweep when no landmarks are found (sigma in
linspace(0, 3, 11), align_face.py:91-119), the eye/nose/mouth
geometric sanity check, and a resize-and-keep fallback recording the
file into ``unknown.txt``.

Landmark source: the detector's 5-point landmarks (MTCNN ONet by
default) — or the FAN 68-point network (models/fan.py, the reference's
align_face.py:161 flow) with ``--fan_weights``; FAN landmarks pass the
same geometric sanity gate after the 68->5 reduction.
"""

import argparse
import os
from pathlib import Path

import numpy as np

from vn_celeb_face_recognition_tpu import models as model_md
from vn_celeb_face_recognition_tpu.pipeline import (
    alignment,
    center_point_dict,
)
from vn_celeb_face_recognition_tpu.pipeline.recognition import (
    landmarks_geometrically_sane,
)
from vn_celeb_face_recognition_tpu.utils import read_json


def gaussian_blur(img, sigma):
    import cv2

    if sigma <= 0:
        return img
    k = int(2 * round(3 * sigma) + 1)
    return cv2.GaussianBlur(img, (k, k), sigma)


def detect_landmarks(detector, rgb_image, fa_model=None):
    """5-point landmarks for the (single) face: FAN 68->5 when a FAN
    model is supplied (reference align_face.py:88-111), detector
    landmarks otherwise. Returns None when unusable."""
    if fa_model is not None:
        from vn_celeb_face_recognition_tpu.models.fan import (
            reduce_to_5_points,
        )

        # FAN expects a face-box crop scale, not the raw photo: find
        # the face with the detector first (the reference package ran
        # its own SFD detection inside get_landmarks); fall back to
        # the whole image as the box only when detection fails —
        # dataset images here are usually pre-cropped faces.
        box = None
        boxes, probs, _ = detector.inference(rgb_image, landmark=True)
        if len(boxes) > 0:
            box = np.asarray(boxes[0][:4], np.float32)
        pts68 = fa_model.get_landmarks(rgb_image, detected_box=box)[0]
        dst, sane = reduce_to_5_points(pts68)
        return np.asarray(dst, np.float32) if sane else None
    boxes, probs, points = detector.inference(rgb_image, landmark=True)
    if len(boxes) == 0:
        return None
    return np.asarray(points[0], dtype=np.float32)


def face_image_from_landmarks(center_points, dst, img_rgb, output_dir,
                              img_file, aligned_size):
    import cv2

    cv_img = cv2.cvtColor(img_rgb, cv2.COLOR_RGB2BGR)
    face_resized = alignment(cv_img, center_points, dst,
                             aligned_size[0], aligned_size[1])
    cv2.imwrite(str(Path(output_dir) / img_file), face_resized)
    print("Finding face for {} is done ...".format(img_file))


def align_face(input_dir, output_dir, aligned_size, detector,
               center_points, unknown_file, fa_model=None):
    import cv2

    n_no_face = 0
    total = 0
    img_files = sorted(os.listdir(input_dir))
    n_images = len(img_files)
    input_dir = Path(input_dir)
    output_dir = Path(output_dir)
    for idx, img_file in enumerate(img_files):
        img_path = str(input_dir / img_file)
        output_path = str(output_dir / img_file)
        print("---------{}/{}---------".format(idx, n_images))
        if os.path.exists(output_path):
            continue
        print("Processing {}".format(img_path))
        bgr_image = cv2.imread(img_path)
        rgb_image = cv2.cvtColor(bgr_image, cv2.COLOR_BGR2RGB)

        have_face = False
        dst = detect_landmarks(detector, rgb_image, fa_model)
        if dst is None:
            print("Step 1: unknown {}".format(img_path))
            for sigma in np.linspace(0.0, 3.0, num=11):
                image_aug = gaussian_blur(rgb_image, float(sigma))
                dst = detect_landmarks(detector, image_aug, fa_model)
                if dst is not None:
                    print("sigma {} help finding face".format(sigma))
                    if landmarks_geometrically_sane(dst):
                        face_image_from_landmarks(
                            center_points, dst, rgb_image, output_dir,
                            img_file, aligned_size,
                        )
                        have_face = True
                    break
        else:
            face_image_from_landmarks(center_points, dst, rgb_image,
                                      output_dir, img_file, aligned_size)
            have_face = True

        if not have_face:
            n_no_face += 1
            print("{} has no face".format(img_path))
            unknown_file.write(img_path + "\n")
            face_resized = cv2.resize(bgr_image, aligned_size,
                                      interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(str(output_dir / img_file), face_resized)
        total += 1
    print("No face: {}".format(n_no_face))
    print("Total images: {}".format(total))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Face alignment to specific size by landmarks"
    )
    parser.add_argument("-id", "--input_dir", default="test", type=str)
    parser.add_argument("-od", "--output_dir", default="test_aligned",
                        type=str)
    parser.add_argument("-as", "--aligned_size", nargs="+", type=int)
    parser.add_argument("-nf", "--un_face_file", default="unknown.txt",
                        type=str)
    parser.add_argument("-dv", "-d", "--device", default=None, type=str)
    parser.add_argument("-det", "--detection", default="MTCNN", type=str)
    parser.add_argument("-dargs", "--detection_args",
                        default="cfg/detection/mtcnn.json", type=str)
    parser.add_argument("--fan_dtype", default=None, type=str,
                        help="FAN compute dtype, e.g. bfloat16")
    parser.add_argument("--fan_weights", default=None, type=str,
                        help="converted 2DFAN4 .npz -> use the FAN "
                             "68-point landmarker (reference "
                             "align_face.py:161)")
    args = parser.parse_args()

    from vn_celeb_face_recognition_tpu.utils import select_platform

    select_platform(args.device)
    if not os.path.exists(args.output_dir):
        os.makedirs(args.output_dir)

    det_args = read_json(args.detection_args)
    det_args.pop("device", None)
    detector = model_md.build_detector(args.detection, **det_args)

    fa_model = None
    if args.fan_weights:
        from vn_celeb_face_recognition_tpu.models.fan import FANLandmarker

        fa_model = FANLandmarker(weights_path=args.fan_weights,
                                 dtype=args.fan_dtype)

    aligned_size = tuple(args.aligned_size)
    center_point = center_point_dict[str(aligned_size)]
    with open(args.un_face_file, "w") as unknown_file:
        align_face(args.input_dir, args.output_dir, aligned_size,
                   detector, center_point, unknown_file,
                   fa_model=fa_model)
