"""Batch face-crop CLI for dataset preparation.

Same surface as /root/reference/crop_face.py: detect faces over a
directory, write the single-face crop per image, quarantine no-face
and multi-face files into manifest text files. (The reference's
many-face counter never incremented — crop_face.py:41; fixed here.)
"""

import argparse
import os
from pathlib import Path

from vn_celeb_face_recognition_tpu import models as model_md
from vn_celeb_face_recognition_tpu.utils import read_json


def get_face_from_box(bgr_img, box):
    ori_h, ori_w = bgr_img.shape[:2]
    x1 = max(int(box[0]), 0)
    y1 = max(int(box[1]), 0)
    x2 = min(int(box[2] + 1), ori_w)
    y2 = min(int(box[3] + 1), ori_h)
    return bgr_img[y1:y2, x1:x2, :]


def crop_face(input_dir, output_dir, detection_md, unknown_file,
              many_boxes_file):
    import cv2

    n_no_face, many_boxes, total = 0, 0, 0
    img_files = sorted(os.listdir(input_dir))
    n_images = len(img_files)
    input_dir = Path(input_dir)
    output_dir = Path(output_dir)
    for idx, img_file in enumerate(img_files):
        total += 1
        print("---------{}/{}---------".format(idx, n_images))
        output_path = str(output_dir / img_file)
        if os.path.exists(output_path):
            continue
        img_path = str(input_dir / img_file)
        print("Processing {}".format(img_path))
        bgr_img = cv2.imread(img_path)
        rgb_img = cv2.cvtColor(bgr_img, cv2.COLOR_BGR2RGB)
        bboxes, _ = detection_md.inference(rgb_img, landmark=False)

        if len(bboxes) > 1:
            many_boxes_file.write(img_path + "\n")
            many_boxes += 1
        elif len(bboxes) < 1:
            unknown_file.write(img_path + "\n")
            n_no_face += 1
            continue

        face = get_face_from_box(bgr_img, bboxes[0])
        cv2.imwrite(output_path, face)
        print("Finding face for {} is done ...".format(img_file))

    print("Total images: {}.".format(total))
    print("No face images: {}.".format(n_no_face))
    print("Many face images: {}.".format(many_boxes))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Crop faces over a directory with a detector"
    )
    parser.add_argument("-id", "--input_dir", default="test", type=str)
    parser.add_argument("-od", "--output_dir", default="test_aligned",
                        type=str)
    parser.add_argument("-nf", "--un_face_file", default="unknown.txt",
                        type=str)
    parser.add_argument("-mf", "--many_boxes_file",
                        default="many_boxes.txt", type=str)
    parser.add_argument("-det", "--detection", default="MTCNN", type=str)
    parser.add_argument("-dargs", "--detection_args",
                        default="cfg/detection/mtcnn.json", type=str)
    parser.add_argument("-dv", "--device", default=None, type=str)
    args = parser.parse_args()

    from vn_celeb_face_recognition_tpu.utils import select_platform

    select_platform(args.device)
    if not os.path.exists(args.output_dir):
        os.makedirs(args.output_dir)

    det_args = read_json(args.detection_args)
    det_args.pop("device", None)
    detection_md = model_md.build_detector(args.detection, **det_args)

    with open(args.un_face_file, "w") as unknown_file, \
            open(args.many_boxes_file, "w") as many_boxes_file:
        crop_face(args.input_dir, args.output_dir, detection_md,
                  unknown_file, many_boxes_file)
