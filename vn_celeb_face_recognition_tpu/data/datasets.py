"""Datasets over the VN-celeb manifest layout.

Same on-disk formats as the reference (data_loader/vn_celeb_dataset.py,
vn_celeb_emb_dataset.py): a JSON manifest ``{label: [image_name, ...]}``
next to a flat directory of images (or of per-image ``<stem>.npz``
512-d embeddings produced by find_embedding).

Unlike the torch Datasets, samples come back as plain numpy (uint8 HWC
images / float32 embeddings): all normalisation and augmentation happens
on device inside the jitted step, so the host path is pure IO.
"""

from copy import deepcopy
from pathlib import Path

import numpy as np

from ..utils import read_json


class VNCelebDataset:
    """(image uint8 [H,W,3], int label, path str) triples."""

    def __init__(self, data_dir, label_file, transforms=None):
        self.data_dir = Path(data_dir)
        self.label_dict = read_json(label_file)
        self.transforms = transforms  # name of a device-side transform
        self.n_samples = sum(len(v) for v in self.label_dict.values())
        self.n_classes = len(self.label_dict.keys())
        self.img_names, self.labels = self._get_list_samples_labels()

    def _get_list_samples_labels(self):
        samples, labels = [], []
        for k, v in self.label_dict.items():
            sample_for_cls = deepcopy(v)
            sample_for_cls.sort()
            samples += sample_for_cls
            labels += len(sample_for_cls) * [int(k)]
        return samples, labels

    def __len__(self):
        return self.n_samples

    def __getitem__(self, index):
        from PIL import Image

        img_path = self.data_dir / self.img_names[index]
        with Image.open(str(img_path)) as img:
            arr = np.asarray(img.convert("RGB"), dtype=np.uint8)
        return arr, self.labels[index], str(img_path)


class VNCelebEmbDataset(VNCelebDataset):
    """(embedding float32 [D], int label, path str) triples from npz."""

    def __getitem__(self, index):
        emb_name = self.img_names[index].split(".")[0]
        emb_path = self.data_dir / "{}.npz".format(emb_name)
        emb = np.load(str(emb_path))["arr_0"].astype(np.float32)
        return emb, self.labels[index], str(emb_path)
