"""Image-classification fine-tune path (the reference's
train_cfg_img_classify.json): a BatchNorm-bearing model trained
directly on images with a device-side augmentation transform — covers
mutable batch_stats updates and the transforms config (name + resize)
inside the jitted step."""

import json

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp


class TinyBNClassifier(nn.Module):
    """Conv + BN + dense log-softmax head (stand-in for the
    InceptionResnetV1 classify mode)."""

    num_classes: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), strides=(2, 2))(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = nn.Dense(self.num_classes)(x)
        return nn.log_softmax(x, axis=-1)


@pytest.fixture(scope="module")
def color_image_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("img_cls")
    img_dir = root / "data"
    img_dir.mkdir()
    gen = np.random.default_rng(11)
    n_classes, per_class = 5, 6
    train_m, val_m = {}, {}
    palette = gen.integers(30, 225, size=(n_classes, 3))
    for c in range(n_classes):
        names = []
        for j in range(per_class):
            base = np.full((72, 72, 3), palette[c], dtype=np.int32)
            noise = gen.integers(-25, 25, size=(72, 72, 3))
            arr = np.clip(base + noise, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / f"{c}_{j}.png")
            names.append(f"{c}_{j}.png")
        train_m[str(c)] = names[:-1]
        val_m[str(c)] = [names[-1]]
    (root / "train.json").write_text(json.dumps(train_m))
    (root / "val.json").write_text(json.dumps(val_m))
    return root


def test_image_classify_with_bn_and_aug(color_image_dataset, tmp_path):
    from vn_celeb_face_recognition_tpu.data import (
        DataLoader,
        VNCelebDataset,
    )
    from vn_celeb_face_recognition_tpu.training import (
        ClassificationTrainer,
    )

    root = color_image_dataset
    config = {
        # facenet_aug with resize exercises with_resize + the batched
        # device augmentation inside the step
        "transforms": {"name": "facenet_aug", "resize": True,
                       "encoder_img_size": 72},
        "metrics": ["accuracy"],
        "loss": "neg_log_llhood",
        "trainer": {
            "name": "ClassificationTrainer",
            "resume_path": "",
            "save_dir": str(tmp_path / "saved"),
            "device": "CPU",
            "log_step": 100,
            "do_validation": True,
            "validation_step": 1,
            "epochs": 12,
            "tracked_metric": ["val_neg_log_llhood", "min"],
            "patience": 10,
            "save_period": 10,
            "track4plot": False,
        },
        "optimizer": {"name": "Adam",
                      "args": {"lr": 0.01, "weight_decay": 0.0}},
    }
    model = TinyBNClassifier(num_classes=5)
    trainer = ClassificationTrainer(config, model)
    train_ds = VNCelebDataset(str(root / "data"),
                              str(root / "train.json"))
    val_ds = VNCelebDataset(str(root / "data"), str(root / "val.json"))
    trainer.setup_loader(DataLoader(train_ds, 8, shuffle=True, seed=1),
                         DataLoader(val_ds, 8))

    first = trainer._train_epoch(1)
    for epoch in range(2, 13):
        last = trainer._train_epoch(epoch)

    # flat-colour classes are separable; BN stats must have moved
    assert last["neg_log_llhood"] < first["neg_log_llhood"]
    assert last["accuracy"] > 0.6
    stats = trainer.variables["batch_stats"]
    mean = np.asarray(jax.tree_util.tree_leaves(stats)[0])
    assert np.abs(mean).sum() > 0.0  # running stats updated
    # validation uses running stats (eval mode) and still separates
    assert last["val_accuracy"] > 0.5
