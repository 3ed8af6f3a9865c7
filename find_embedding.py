"""Dataset embedding extraction CLI.

Same surface as /root/reference/find_embedding.py: walk a directory of
(aligned) face images, embed them with the chosen encoder, write one
compressed ``<stem>.npz`` per image. TPU redesign: images are decoded
on the host while the previous batch embeds on device (double
buffering), the transform (fix_std) is fused into the jitted encoder
forward, and the batch size stays FIXED (tail padded) so the whole run
uses one compiled program.

(The reference also had a latent import bug — `from data_loader import
transforms` names a symbol that doesn't exist, find_embedding.py:2 —
fixed here by construction.)
"""

import argparse
import os
import queue
import threading
from pathlib import Path

import numpy as np

from vn_celeb_face_recognition_tpu.data.transforms import transforms_dict
from vn_celeb_face_recognition_tpu.pipeline import Encoder


def iter_image_batches_native(data_dir, list_files, batch_size, size,
                              prefetch=4):
    """Native C++ thread-pool decoder path (images resized to a fixed
    square ``size``; aligned datasets are already square)."""
    from vn_celeb_face_recognition_tpu import native

    paths = [str(Path(data_dir) / f) for f in list_files]
    loader = native.NativeBatchLoader(
        paths, batch_size=batch_size, width=size, height=size,
        threads=os.cpu_count() or 4, prefetch=prefetch,
    )
    offset = 0
    for data, ok, count in loader:
        names = list_files[offset: offset + count]
        offset += count
        yield data, names


def iter_image_batches(data_dir, list_files, batch_size, prefetch=4,
                       size=None):
    """Decode images on a background thread into fixed-size batches.

    ``size``: decode every image to ``size`` x ``size``. Default None
    locks onto the FIRST image's dimensions so mixed-size directories
    (e.g. the toy fixture: 181px and 127px crops) still batch — the
    reference's torch.stack simply crashed there. Producer exceptions
    propagate to the consumer instead of deadlocking the queue.
    """
    from PIL import Image

    q = queue.Queue(maxsize=prefetch)
    sentinel = object()

    def producer():
        try:
            target = (size, size) if size else None
            batch, names = [], []
            for fname in list_files:
                with Image.open(str(Path(data_dir) / fname)) as img:
                    img = img.convert("RGB")
                    if target is None:
                        target = img.size
                    if img.size != target:
                        img = img.resize(target, Image.BILINEAR)
                    batch.append(np.asarray(img, dtype=np.uint8))
                names.append(fname)
                if len(batch) == batch_size:
                    q.put((np.stack(batch), names))
                    batch, names = [], []
            if batch:
                n_real = len(batch)
                while len(batch) < batch_size:  # pad the tail batch
                    batch.append(batch[0])
                q.put((np.stack(batch), names[:n_real]))
        except BaseException as exc:  # noqa: BLE001 — re-raised below
            q.put(("__error__", exc))
            return
        q.put(sentinel)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, tuple) and len(item) == 2 \
                and isinstance(item[1], BaseException) \
                and item[0] == "__error__":
            raise item[1]
        yield item


def save_embeddings(embeddings, list_files, output_dir):
    output_dir_path = Path(output_dir)
    for i, fname in enumerate(list_files):
        emb_name = "{}.npz".format(fname.split(".")[0])
        np.savez_compressed(str(output_dir_path / emb_name), embeddings[i])


def cal_embedding(data_dir, batch_size, model, output_dir, log=True,
                  native_size=None):
    if not os.path.exists(output_dir):
        os.makedirs(output_dir)
    list_files = sorted(os.listdir(data_dir))
    n_batches = -(-len(list_files) // batch_size)
    done = 0
    use_native = False
    if native_size:
        try:
            from vn_celeb_face_recognition_tpu import native

            use_native = native.available()
        except Exception:
            use_native = False
    batches = (
        iter_image_batches_native(data_dir, list_files, batch_size,
                                  native_size)
        if use_native
        else iter_image_batches(data_dir, list_files, batch_size,
                                size=native_size)
    )
    for idx, (batch, names) in enumerate(batches):
        embeddings = model(batch.astype(np.float32))
        save_embeddings(embeddings[: len(names)], names, output_dir)
        done += len(names)
        if log:
            print("Processing for {}/{} batchs:".format(idx, n_batches))
    if log:
        print("Saved {} embeddings to {}".format(done, output_dir))
    return done


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Find embedding vectors for all images in a dataset"
    )
    parser.add_argument("-d", "--data_dir", default="train")
    parser.add_argument("-bz", "--batch_size", default=64, type=int)
    parser.add_argument("-o", "--output_dir", default="train_embedding")
    parser.add_argument("-w", "--pre_trained", default="vggface2")
    parser.add_argument("-dv", "--device", default="TPU")
    parser.add_argument("-enc", "--encoder", default="InceptionResnetV1")
    parser.add_argument("--image_size", default=None, type=int,
                        help="fixed decode size enabling the native "
                             "C++ loader (e.g. 160)")
    args = parser.parse_args()

    from vn_celeb_face_recognition_tpu.utils import select_platform

    select_platform(args.device)
    # '' / 'none' -> random init (lets the CLI run without the
    # published weights, e.g. for plumbing drives; the reference's
    # loader had no such escape and raised)
    pre_trained = args.pre_trained
    if isinstance(pre_trained, str) and pre_trained.lower() in ("",
                                                                "none"):
        pre_trained = None
    if args.encoder == "InceptionResnetV1":
        model = Encoder.build("InceptionResnetV1",
                              pretrained=pre_trained)
    else:
        model = Encoder.build(args.encoder, pretrained=bool(pre_trained))
    model.transform = transforms_dict["default"]
    cal_embedding(args.data_dir, args.batch_size, model, args.output_dir,
                  native_size=args.image_size)
