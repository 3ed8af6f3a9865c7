"""Dataset split CLI.

Capability parity with the reference splitter: a train.csv of
(image, label) rows becomes the ``{label: [images]}`` manifest JSON;
validation holds out the final image of every multi-image identity;
``--remap_key`` additionally writes manifests with labels renumbered
to a dense 0..N-1 range.
"""

import argparse

from vn_celeb_face_recognition_tpu.utils import read_json, write_json


def create_file_describe_ds(describe_file, output_file):
    import pandas as pd

    df = pd.read_csv(describe_file)
    # keep CSV row order within each identity: the held-out validation
    # image is the LAST row, matching the published split behaviour
    by_label = {
        str(label): group["image"].tolist()
        for label, group in df.groupby("label", sort=True)
    }
    write_json(output_file, by_label)
    print("Created {} for describe VN_celeb ...".format(output_file))
    return by_label


def split_train_val(desc_file, output_train, output_val):
    manifest = read_json(desc_file)
    train = {
        key: (images[:-1] if len(images) > 1 else images)
        for key, images in manifest.items()
    }
    val = {
        key: [images[-1]]
        for key, images in manifest.items()
        if len(images) > 1
    }
    write_json(output_train, train)
    write_json(output_val, val)
    return train, val


def remap_sequence_key(manifest):
    return {
        str(new): manifest[old]
        for new, old in enumerate(manifest)
    }


def _remap_name(path):
    return "{}_remap.json".format(path.rsplit(".", 1)[0])


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

    labels = create_file_describe_ds(args.describe_file,
                                     args.out_dict_labels)
    train, val = split_train_val(args.out_dict_labels, args.train_file,
                                 args.val_file)
    if args.remap_key:
        write_json(_remap_name(args.describe_file),
                   remap_sequence_key(labels))
        write_json(_remap_name(args.train_file),
                   remap_sequence_key(train))
        write_json(_remap_name(args.val_file), remap_sequence_key(val))
