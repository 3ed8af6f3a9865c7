"""Online-augmentation trainer: raw images -> device augmentation ->
frozen encoder -> trainable MLP, all inside the jitted step
(reference online_aug_trainer.py semantics)."""

import json

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp


class TinyEncoder(nn.Module):
    """Stand-in frozen encoder: strided conv stack -> 512-d embedding."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(16, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        x = nn.Conv(32, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(512)(x)


@pytest.fixture(scope="module")
def toy_image_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("toy_imgs")
    img_dir = root / "train"
    img_dir.mkdir()
    gen = np.random.default_rng(3)
    n_classes, per_class = 6, 5
    manifest_train, manifest_val = {}, {}
    for c in range(n_classes):
        names = []
        base = gen.integers(0, 255, size=(3,), dtype=np.uint8)
        for j in range(per_class):
            arr = np.zeros((64, 64, 3), np.uint8) + base
            noise = gen.integers(0, 40, size=(64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr // 2 + noise).save(
                img_dir / f"{c}_{j}.png"
            )
            names.append(f"{c}_{j}.png")
        manifest_train[str(c)] = names[:-1]
        manifest_val[str(c)] = [names[-1]]
    (root / "train.json").write_text(json.dumps(manifest_train))
    (root / "val.json").write_text(json.dumps(manifest_val))
    return root


def test_aug_trainer_runs_and_learns(toy_image_dataset, tmp_path):
    from vn_celeb_face_recognition_tpu.data import DataLoader, \
        VNCelebDataset
    from vn_celeb_face_recognition_tpu.training import \
        AugClassificationTrainer

    root = toy_image_dataset
    config = {
        "transforms": {"name": "rank1_aug", "resize": False,
                       "encoder_img_size": 64},
        "metrics": ["accuracy"],
        "loss": "neg_log_llhood",
        "trainer": {
            "name": "AugClassificationTrainer",
            "resume_path": "",
            "save_dir": str(tmp_path / "saved"),
            "device": "CPU",
            "log_step": 100,
            "do_validation": True,
            "validation_step": 1,
            "epochs": 6,
            "tracked_metric": ["val_neg_log_llhood", "min"],
            "patience": 10,
            "save_period": 10,
            "track4plot": False,
            "chosen_idx_enc": 0,
            "encoders": [],
        },
        "optimizer": {"name": "Adam",
                      "args": {"lr": 0.003, "weight_decay": 0.0}},
    }
    from vn_celeb_face_recognition_tpu.models import MLPModel

    encoder = TinyEncoder()
    enc_vars = encoder.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))
    model = MLPModel(input_dim=512, num_classes=6)
    trainer = AugClassificationTrainer(
        config, model, encoder=encoder, encoder_variables=enc_vars
    )
    train_ds = VNCelebDataset(str(root / "train"),
                              str(root / "train.json"))
    val_ds = VNCelebDataset(str(root / "train"), str(root / "val.json"))
    trainer.setup_loader(DataLoader(train_ds, 8, shuffle=True, seed=0),
                         DataLoader(val_ds, 8))

    first = trainer._train_epoch(1)
    for epoch in range(2, 7):
        last = trainer._train_epoch(epoch)
    # flat-colour classes are separable even through a random encoder
    assert last["neg_log_llhood"] < first["neg_log_llhood"]
    assert last["accuracy"] > 0.5


def test_aug_trainer_inits_non_pretrained_encoder_from_config(tmp_path):
    """A config whose chosen encoder has no pretrained source must still
    get initialised encoder variables (the reference's torch modules
    self-initialise in __init__; flax needs an explicit init). Broke the
    train.py CLI drive with {"pretrained": null} before the fix. The
    init is lazy — it happens on the FIRST _encode call at the real
    batch shape, not at __init__ from the transforms' encoder_img_size
    guess, so spatially-fixed encoders (iresnet's flattened fc) get
    correctly-shaped params even when the config size disagrees with
    the data (see the iresnet test below)."""
    from vn_celeb_face_recognition_tpu.models import MLPModel
    from vn_celeb_face_recognition_tpu.training import \
        AugClassificationTrainer

    config = {
        "transforms": {"name": "facenet_aug", "resize": False,
                       "encoder_img_size": 160},
        "metrics": ["accuracy"],
        "loss": "neg_log_llhood",
        "trainer": {
            "name": "AugClassificationTrainer",
            "resume_path": "",
            "save_dir": str(tmp_path / "saved"),
            "device": "CPU",
            "log_step": 100,
            "do_validation": False,
            "validation_step": 1,
            "epochs": 1,
            "tracked_metric": ["val_neg_log_llhood", "min"],
            "patience": 10,
            "save_period": 10,
            "track4plot": False,
            "chosen_idx_enc": 0,
            "encoders": [
                {"name": "InceptionResnetV1",
                 "args": {"pretrained": None}},
            ],
        },
        "optimizer": {"name": "Adam",
                      "args": {"lr": 0.003, "weight_decay": 0.0}},
    }
    model = MLPModel(input_dim=512, num_classes=4)
    trainer = AugClassificationTrainer(config, model)
    import jax.numpy as jnp

    emb = trainer._encode(jnp.zeros((2, 160, 160, 3)))
    assert trainer.encoder_variables is not None
    assert emb.shape == (2, 512)


def test_aug_trainer_lazy_init_matches_batch_size_not_config(tmp_path):
    """A spatially-fixed encoder (iresnet34 flattens a fixed 7x7 grid
    into its fc Dense) fed 112px crops must get 112px-shaped params
    even when the transforms config guesses encoder_img_size=160 —
    eager init at the guessed size built a [51200, 512] fc kernel that
    crashed the first 112px train step."""
    from vn_celeb_face_recognition_tpu.models import MLPModel
    from vn_celeb_face_recognition_tpu.training import \
        AugClassificationTrainer

    config = {
        "transforms": {"name": "facenet_aug", "resize": False,
                       "encoder_img_size": 160},
        "metrics": ["accuracy"],
        "loss": "neg_log_llhood",
        "trainer": {
            "name": "AugClassificationTrainer",
            "resume_path": "",
            "save_dir": str(tmp_path / "saved"),
            "device": "CPU",
            "log_step": 100,
            "do_validation": False,
            "validation_step": 1,
            "epochs": 1,
            "tracked_metric": ["val_neg_log_llhood", "min"],
            "patience": 10,
            "save_period": 10,
            "track4plot": False,
            "chosen_idx_enc": 0,
            "encoders": [
                {"name": "iresnet34", "args": {"pretrained": None}},
            ],
        },
        "optimizer": {"name": "Adam",
                      "args": {"lr": 0.003, "weight_decay": 0.0}},
    }
    model = MLPModel(input_dim=512, num_classes=4)
    trainer = AugClassificationTrainer(config, model)
    import jax.numpy as jnp

    emb = trainer._encode(jnp.zeros((2, 112, 112, 3)))
    assert emb.shape == (2, 512)
