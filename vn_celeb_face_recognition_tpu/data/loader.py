"""Fixed-shape batching + background prefetch.

XLA recompiles on any shape change, so unlike the torch DataLoader the
final partial batch is PADDED to the full batch size and a per-row
``weight`` (1.0 real / 0.0 padding) rides along; losses and metrics are
weight-averaged, which reproduces the reference's sample-weighted
averaging (classification_trainer.py:21-24) exactly while keeping one
compiled program per epoch.

``prefetch_to_device`` overlaps host IO (image decode, npz reads) with
device compute via a small background thread + bounded queue — the
replacement for torch DataLoader workers (every reference config ran
num_workers=0, i.e. fully synchronous).
"""

import queue
import threading

import numpy as np


class DataLoader:
    def __init__(self, dataset, batch_size, shuffle=False, seed=0,
                 drop_last=False, num_workers=0):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        # num_workers accepted for config compatibility; decode threads
        # are handled by prefetch_to_device instead.

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        bs = self.batch_size
        n_batches = len(self)
        for b in range(n_batches):
            idx = order[b * bs:(b + 1) * bs]
            samples = [self.dataset[int(i)] for i in idx]
            data = np.stack([s[0] for s in samples])
            target = np.asarray([s[1] for s in samples], dtype=np.int32)
            paths = [s[2] for s in samples]
            weight = np.ones(len(samples), dtype=np.float32)
            pad = bs - len(samples)
            if pad > 0:
                data = np.concatenate(
                    [data, np.repeat(data[:1], pad, axis=0)], axis=0
                )
                target = np.concatenate(
                    [target, np.zeros(pad, dtype=np.int32)]
                )
                weight = np.concatenate(
                    [weight, np.zeros(pad, dtype=np.float32)]
                )
                paths = paths + [""] * pad
            yield {
                "data": data,
                "target": target,
                "weight": weight,
                "path": paths,
            }


def prefetch_to_device(iterator, size=2, sharding=None):
    """Wrap a host batch iterator with a bounded background queue and
    eager device transfer of the array fields."""
    import jax

    q = queue.Queue(maxsize=size)
    sentinel = object()
    err = []

    def producer():
        try:
            for item in iterator:
                arrays = {
                    k: v for k, v in item.items()
                    if isinstance(v, np.ndarray)
                }
                rest = {
                    k: v for k, v in item.items()
                    if not isinstance(v, np.ndarray)
                }
                if sharding is not None:
                    arrays = {
                        k: jax.device_put(v, sharding)
                        for k, v in arrays.items()
                    }
                else:
                    arrays = jax.device_put(arrays)
                arrays.update(rest)
                q.put(arrays)
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
