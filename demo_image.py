"""Single-image face recognition CLI.

Same flags and output as /root/reference/demo_image.py:308-425: load a
detector (-det + JSON args), encoder (-enc + JSON args), MLP classifier
checkpoint (-m), optional emotion model (--recog_emotion), run one
image through the sequential or parallel detect->align->embed->classify
pipeline and write the annotated image.

The library half of the reference file lives in
vn_celeb_face_recognition_tpu/pipeline/recognition.py.
"""

import argparse

import numpy as np

from vn_celeb_face_recognition_tpu import models as model_md
from vn_celeb_face_recognition_tpu.pipeline import (
    Classifier,
    EmotionModel,
    Encoder,
    center_point_dict,
    draw_boxes_on_image,
    draw_emotions,
    parallel_detect_and_align,
    recognize_celeb,
    recognize_emotion,
    sequential_detect_and_align,
)
from vn_celeb_face_recognition_tpu.utils import load_pickle, read_json


def build_arg_parser():
    p = argparse.ArgumentParser(
        description="Face recognition on a image (TPU)"
    )
    p.add_argument("-fs", "--face_size", default=160, type=int)
    p.add_argument("-mfs", "--min_face_size", default=50, type=int)
    p.add_argument("-i", "--image_path", default="demo.png", type=str)
    p.add_argument("-o", "--output_path", default="demo_recognition.png",
                   type=str)
    p.add_argument("-m", "--classify_model", default="model_best.pth",
                   type=str)
    p.add_argument("-l2n", "--label2name", default="label2name.csv",
                   type=str)
    p.add_argument("-w", "--pre_trained_emb", default="vggface2", type=str)
    p.add_argument("-dv", "-d", "--device", default="TPU", type=str)
    p.add_argument("-id", "--input_dim_emb", default=512, type=int)
    p.add_argument("-nc", "--num_classes", default=1001, type=int)
    p.add_argument("-enc", "--encoder", default="InceptionResnetV1",
                   type=str)
    p.add_argument("-det", "--detection", default="MTCNN", type=str)
    p.add_argument("-eargs", "--encoder_args",
                   default="cfg/embedding/iresnet100_enc.json", type=str)
    p.add_argument("-dargs", "--detection_args",
                   default="cfg/detection/mtcnn.json", type=str)
    p.add_argument("-tg_fs", "--target_face_size", default=112, type=int)
    p.add_argument("--inference_method", default="seq_fd_vs_aln", type=str)
    p.add_argument("--min_dim_box", default=50, type=int)
    p.add_argument("--box_ratio", default=2.0, type=float)
    p.add_argument("--recog_threshold", default=0.0, type=float)
    p.add_argument("--recog_emotion", action="store_true")
    p.add_argument("-emt", "--emotion", default="resnet_2branch_50",
                   type=str)
    p.add_argument("-emtargs", "--emotion_args",
                   default="cfg/emotion/resnet50_2_branch.json", type=str)
    p.add_argument("-t2i", "--etag2idx_file",
                   default="meta_data/emotion_recognition/etag2idx.pkl",
                   type=str)
    p.add_argument("--topk_emotions", default=6, type=int)
    p.add_argument("--fan_dtype", default=None, type=str,
                   help="FAN compute dtype, e.g. bfloat16 (MXU fast "
                        "path; params stay f32, heatmaps return f32)")
    p.add_argument("--fan_weights", default=None, type=str,
                   help="converted 2DFAN4 .npz; enables the reference's "
                        "per-face FAN 68-point landmark flow in "
                        "seq_fd_vs_aln (demo_image.py:366)")
    return p


def _reconcile_encoder_args(args, enc_args):
    """Make the stock flag defaults runnable (fixed reference bug).

    The reference defaults -enc to InceptionResnetV1 but -eargs to
    cfg/embedding/iresnet100_enc.json (demo_image.py:326-331), so a
    bare ``python demo_image.py -i img.png`` crashes upstream: the
    facenet constructor rejects the iresnet-only keys. Instead of
    crashing, drop the iresnet-only keys for InceptionResnetV1, map a
    boolean ``pretrained`` onto the -w/--pre_trained_emb dataset name
    (the flag the reference provides for exactly this choice), and
    route a non-empty checkpoint_path to weights_path. Explicit
    coherent -enc/-eargs pairs pass through untouched."""
    if args.encoder != "InceptionResnetV1":
        return enc_args
    out = dict(enc_args)
    dropped = [k for k in ("progress", "freeze_weights") if k in out]
    for k in dropped:
        out.pop(k)
    ckpt = out.pop("checkpoint_path", "")
    if ckpt and "weights_path" not in out:
        out["weights_path"] = ckpt
    pre = out.get("pretrained")
    if isinstance(pre, bool):
        out["pretrained"] = (
            getattr(args, "pre_trained_emb", "vggface2") if pre else None
        )
    if dropped or isinstance(pre, bool):
        print(
            "Reconciled encoder args for InceptionResnetV1 "
            "(reference default -eargs is the iresnet config): "
            "dropped {}, pretrained -> {}".format(
                dropped, out.get("pretrained"))
        )
    return out


def setup_models(args):
    """Shared model wiring used by the image/video/statistic CLIs."""
    import pandas as pd

    label2name_df = pd.read_csv(args.label2name)
    det_args = read_json(args.detection_args)
    det_args.pop("device", None)
    detection_md = model_md.build_detector(args.detection, **det_args)

    enc_args = _reconcile_encoder_args(args, read_json(args.encoder_args))
    emb_model = Encoder.build(args.encoder, **enc_args)

    classify_model = Classifier.build(
        args.input_dim_emb, args.num_classes,
        checkpoint_path=args.classify_model,
    )

    emt_model, idx2etag = None, None
    if getattr(args, "recog_emotion", False):
        idx2etag = load_pickle(args.etag2idx_file)["idx2key"]
        emt_args = read_json(args.emotion_args)
        emt_args.pop("device", None)
        emt_model = EmotionModel.build(args.emotion, **emt_args)
    return label2name_df, detection_md, emb_model, classify_model, \
        emt_model, idx2etag


def main(args):
    import cv2

    (label2name_df, detection_md, emb_model, classify_model, emt_model,
     idx2etag) = setup_models(args)

    target_fs = (args.target_face_size, args.target_face_size)
    center_point = center_point_dict[str(target_fs)]

    np_image = cv2.imread(args.image_path)
    rgb_image = cv2.cvtColor(np_image, cv2.COLOR_BGR2RGB)
    rgb_images = [rgb_image]

    if args.inference_method == "seq_fd_vs_aln":
        box_requirements = {
            "min_dim": args.min_dim_box,
            "box_ratio": args.box_ratio,
        }
        fa_model = None
        if getattr(args, "fan_weights", None):
            from vn_celeb_face_recognition_tpu.models.fan import (
                FANLandmarker,
            )

            fa_model = FANLandmarker(
                weights_path=args.fan_weights,
                dtype=getattr(args, "fan_dtype", None),
            )
        bth_alg_faces, bth_chosen_boxes = sequential_detect_and_align(
            rgb_images, detection_md, center_point, target_fs,
            box_requirements, True, fa_model=fa_model,
        )
    elif args.inference_method == "par_fd_vs_aln":
        bth_alg_faces, bth_chosen_boxes = parallel_detect_and_align(
            rgb_images, detection_md, center_point, target_fs, True
        )
    else:
        raise SystemExit(
            "Do not support {} method.".format(args.inference_method)
        )

    bth_names = recognize_celeb(
        bth_alg_faces, None, emb_model, classify_model, None,
        label2name_df, args.recog_threshold,
    )

    names = bth_names[0]
    chosen_boxes = bth_chosen_boxes[0]
    np_image_recog = draw_boxes_on_image(np_image, chosen_boxes, names)

    if args.recog_emotion:
        map_func = np.vectorize(lambda x: idx2etag[x])
        bth_emotions, bth_probs = recognize_emotion(
            bth_alg_faces, None, emt_model, None, map_func,
            args.topk_emotions,
        )
        np_image_recog = draw_emotions(
            np_image_recog, chosen_boxes, bth_emotions[0], bth_probs[0]
        )

    cv2.imwrite(args.output_path, np_image_recog)
    print("Face recognized image saved at {} ...".format(args.output_path))
    return names, chosen_boxes


if __name__ == "__main__":
    from vn_celeb_face_recognition_tpu.utils import select_platform

    _args = build_arg_parser().parse_args()
    select_platform(_args.device)
    main(_args)
