"""Misc host helpers: time formatting, loss-curve plot, dataset re-layout.

Parity targets: convert_sec_to_max_time_quantity
(/root/reference/utils/utils.py:77-82) — its exact h:m:s string format is
part of the tracker.json schema — plus plot_train_val_loss (:66-74) and
the dataset folder flatteners (:85-129).
"""

import glob
import os
import shutil


def convert_sec_to_max_time_quantity(second):
    h = second // 3600
    remain_time = second % 3600
    m = remain_time // 60
    s = remain_time % 60
    return "{}h:{}m:{:.2f}s".format(h, m, s)


def plot_train_val_loss(log_file, out_file):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    df = pd.read_csv(log_file, index_col="Epoch")
    plt.plot(df["Train_loss"].values, label="Training loss")
    plt.plot(df["Validation_loss"].values, label="Validation loss")
    plt.ylabel("Loss")
    plt.xlabel("Epoch")
    plt.legend(loc="upper right")
    plt.savefig(out_file)
    print("Plot train and val loss to {}".format(out_file))


def _flatten_dataset(root_dir, output_dir, label_file, label_offset):
    import pandas as pd

    if not os.path.exists(output_dir):
        os.makedirs(output_dir)

    image_paths = glob.glob(root_dir + "/*/*")
    label_list = []
    for image_path in image_paths:
        if not os.path.isfile(image_path):
            continue
        label, image_file = image_path.split("/")[-2:]
        image_name, ext = image_file.split(".")
        new_image_file = "{}_{}.{}".format(label, image_name, ext)
        shutil.copyfile(image_path, os.path.join(output_dir, new_image_file))
        label_list.append((new_image_file, int(label) + label_offset))

    label_df = pd.DataFrame(data=label_list, columns=["image", "label"])
    label_df.to_csv(label_file, index=False)
    print("Saved label file {}.".format(label_file))


def convert_ds_folder_2_def_structure(root_dir, output_dir, label_file):
    """Folder-per-class layout -> flat files + CSV, 1-based class dirs."""
    _flatten_dataset(root_dir, output_dir, label_file, label_offset=-1)


def convert_id_ds_2_def_structure(root_dir, output_dir, label_file):
    """Folder-per-class layout -> flat files + CSV, 0-based class dirs."""
    _flatten_dataset(root_dir, output_dir, label_file, label_offset=0)
