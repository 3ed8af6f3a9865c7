#!/bin/bash
# Canonical full-pipeline invocation, fixed-length intervals
python celeb_statistic.py -i "$1" -m "$2" -l2n meta_data/face_recognition/label2name_1020_cls.txt \
    -nc 1021 -det RetinaFace -dargs cfg/detection/retina_face.json \
    -enc iresnet100 -eargs cfg/embedding/iresnet100_enc.json \
    --inference_method par_fd_vs_aln --track_bbox --recog_emotion \
    --local_thresholds meta_data/face_recognition/local_thresholds.json \
    --statistic_mode fixed_itv --time_an_interval 5 --n_frames 120 -fidx 1 6 11 16
