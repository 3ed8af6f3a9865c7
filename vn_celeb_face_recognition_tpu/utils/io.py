"""Small host-side IO helpers (JSON / pickle / CSV / image files).

Functional parity with the reference utility layer
(/root/reference/utils/utils.py:34-64,132-134) with the same call
signatures, so configs and meta-data files round-trip identically.
"""

import json
import os
import pickle


def read_json(filename):
    with open(filename, "r") as fp:
        return json.load(fp)


def write_json(filename, content_dict, log=True):
    with open(filename, "w") as fp:
        json.dump(content_dict, fp, indent=True)
    if log:
        print("Write json file {}".format(filename))


def load_pickle(path):
    with open(path, "rb") as fp:
        return pickle.load(fp)


def save_pickle(path, obj):
    with open(path, "wb") as fp:
        pickle.dump(obj, fp)


def create_folder(path):
    path = str(path)
    if not os.path.exists(path):
        os.makedirs(path)


def save_pandas_df(data, filename, columns, index=None, use_index=True):
    import pandas as pd

    df = pd.DataFrame(data=data, index=index, columns=columns)
    df.to_csv(filename, index=use_index)


def read_image(image_path):
    from PIL import Image

    return Image.open(image_path)


def append_log_to_file(file_path, list_items):
    """Append one comma-joined CSV row (reference utils/utils.py:60-64)."""
    with open(file_path, "a") as opened_file:
        opened_file.write(",".join(list_items) + "\n")
