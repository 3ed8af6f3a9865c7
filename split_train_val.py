"""Dataset split CLI.

Same behaviour as /root/reference/split_train_val.py: train.csv
(image,label) -> ``vn_celeb.json`` {label: [images]}; hold out the last
image of every multi-image class for validation; optional sequential
key remap.
"""

import argparse

from vn_celeb_face_recognition_tpu.utils import read_json, write_json


def create_file_describe_ds(describe_file, output_file):
    import numpy as np
    import pandas as pd

    df_label = pd.read_csv(describe_file)
    labels = np.unique(df_label["label"])
    dict_labels = {}
    for i in labels:
        chosen = df_label["label"] == i
        dict_labels[str(i)] = list(df_label["image"][chosen])
    write_json(output_file, dict_labels)
    print("Created {} for describe VN_celeb ...".format(output_file))
    return dict_labels


def split_train_val(desc_file, output_train, output_val):
    dict_labels = read_json(desc_file)
    dict_train, dict_val = {}, {}
    for k, v in dict_labels.items():
        if len(v) > 1:
            dict_train[k] = v[:-1]
            dict_val[k] = [v[-1]]
        else:
            dict_train[k] = [v[0]]
    write_json(output_train, dict_train)
    write_json(output_val, dict_val)
    return dict_train, dict_val


def remap_sequence_key(label_dict):
    return {
        str(idx): label_dict[key]
        for idx, key in enumerate(label_dict.keys())
    }


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Split training and validation set for VN celeb"
    )
    parser.add_argument("-d", "--describe_file", default="train.csv")
    parser.add_argument("-o", "--out_dict_labels",
                        default="vn_celeb.json")
    parser.add_argument("-tr", "--train_file", default="train.json")
    parser.add_argument("-v", "--val_file", default="val.json")
    parser.add_argument("--remap_key", action="store_true")
    args = parser.parse_args()

    dict_labels = create_file_describe_ds(args.describe_file,
                                          args.out_dict_labels)
    dict_train, dict_val = split_train_val(
        args.out_dict_labels, args.train_file, args.val_file
    )
    if args.remap_key:
        write_json(
            "{}_remap.json".format(args.describe_file.split(".")[0]),
            remap_sequence_key(dict_labels),
        )
        write_json(
            "{}_remap.json".format(args.train_file.split(".")[0]),
            remap_sequence_key(dict_train),
        )
        write_json(
            "{}_remap.json".format(args.val_file.split(".")[0]),
            remap_sequence_key(dict_val),
        )
