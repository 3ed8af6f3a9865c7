"""CLI tool coverage: find_embedding, split_train_val,
false_prediction_vlz, crop_face plumbing."""

import json
import os

import numpy as np
import pytest

from toy_data import toy_face_files


@pytest.fixture(scope="module")
def aligned_faces_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("aligned")
    gen = np.random.default_rng(5)
    for i in range(11):
        arr = gen.integers(0, 255, size=(160, 160, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"{i:03d}_0.png")
    return str(root)


def test_find_embedding_cli(aligned_faces_dir, tmp_path):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from find_embedding import cal_embedding
    from vn_celeb_face_recognition_tpu.data.transforms import \
        transforms_dict
    from vn_celeb_face_recognition_tpu.pipeline.recognition import \
        _JitApply

    class TinyEnc(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(4, 4))(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(512)(x)

    model = TinyEnc()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 160, 160, 3)))
    enc = _JitApply(model, variables,
                    transform=transforms_dict["default"])

    out_dir = str(tmp_path / "emb")
    n = cal_embedding(aligned_faces_dir, 4, enc, out_dir, log=False)
    assert n == 11
    files = sorted(os.listdir(out_dir))
    assert len(files) == 11
    emb = np.load(os.path.join(out_dir, files[0]))["arr_0"]
    assert emb.shape[-1] == 512

    # native C++ loader path produces the same embeddings
    from vn_celeb_face_recognition_tpu import native

    if native.available():
        out_dir2 = str(tmp_path / "emb_native")
        n2 = cal_embedding(aligned_faces_dir, 4, enc, out_dir2,
                           log=False, native_size=160)
        assert n2 == 11
        for f in files:
            a = np.load(os.path.join(out_dir, f))["arr_0"]
            b = np.load(os.path.join(out_dir2, f))["arr_0"]
            np.testing.assert_allclose(a, b, atol=1e-4)


def test_split_train_val_cli(tmp_path):
    import pandas as pd

    from split_train_val import create_file_describe_ds, split_train_val

    rows = []
    for label, count in [(0, 3), (1, 1), (2, 2)]:
        for j in range(count):
            rows.append((f"{label}_{j}.png", label))
    pd.DataFrame(rows, columns=["image", "label"]).to_csv(
        tmp_path / "train.csv", index=False
    )
    desc = str(tmp_path / "vn_celeb.json")
    create_file_describe_ds(str(tmp_path / "train.csv"), desc)
    tr, va = split_train_val(desc, str(tmp_path / "train.json"),
                             str(tmp_path / "val.json"))
    assert tr["0"] == ["0_0.png", "0_1.png"]
    assert va["0"] == ["0_2.png"]
    assert tr["1"] == ["1_0.png"] and "1" not in va


def test_false_prediction_vlz(tmp_path):
    import pandas as pd
    from PIL import Image

    from false_prediction_vlz import visualize_false_prediction

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    gen = np.random.default_rng(1)
    desc = {}
    paths = []
    for c in range(3):
        name = f"{c}_0.png"
        Image.fromarray(
            gen.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        ).save(img_dir / name)
        desc[str(c)] = [name]
        paths.append(str(img_dir / name))

    result = pd.DataFrame(
        {
            "Path": paths,
            "Target": [0, 1, 2],
            "Prediction": [0, 2, 2],  # one mismatch
            "Probability": [0.9, 0.8, 0.7],
        }
    )
    result.to_csv(tmp_path / "result.csv", index=False)
    out_dir = str(tmp_path / "vlz")
    visualize_false_prediction(
        str(tmp_path / "result.csv"), desc, str(img_dir), out_dir
    )
    assert len(os.listdir(out_dir)) == 1


def test_mtcnn_forward_extract(tmp_path):
    """MTCNN __call__ parity surface: returns standardised face crops
    + boxes (mtcnn.py forward/extract semantics)."""
    import glob

    from PIL import Image

    from vn_celeb_face_recognition_tpu.models import MTCNN

    files = toy_face_files()
    if not files:
        pytest.skip("toy face fixture unavailable")
    img = np.asarray(
        Image.open(files[0]).convert("RGB").resize((160, 160))
    )
    det = MTCNN(min_face_size=20, keep_all=False, image_size=160)
    faces, boxes, probs = det(img, return_prob=True)
    assert faces is not None
    assert faces.shape == (160, 160, 3)
    # post-processed: fixed standardisation range
    assert -1.1 <= float(faces.min()) and float(faces.max()) <= 1.1
    assert boxes.shape == (1, 4)


def test_download_url_to_file(tmp_path):
    """sha256-prefix verified download over a file:// URL."""
    import hashlib

    from vn_celeb_face_recognition_tpu.utils.download import (
        download_url_to_file,
    )

    src = tmp_path / "weights.bin"
    payload = b"fake weights " * 1000
    src.write_bytes(payload)
    digest = hashlib.sha256(payload).hexdigest()[:8]

    dst = tmp_path / f"model-{digest}.bin"
    download_url_to_file(src.as_uri(), str(dst), progress=False)
    assert dst.read_bytes() == payload

    bad_dst = tmp_path / "model-deadbeef.bin"
    with pytest.raises(RuntimeError):
        download_url_to_file(src.as_uri(), str(bad_dst), progress=False)
    assert not bad_dst.exists()


def test_export_video_face_recognition(tmp_path):
    cv2 = pytest.importorskip("cv2")

    from demo_video import export_video_face_recognition

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    gen = np.random.default_rng(2)
    for i in range(1, 6):
        img = gen.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(frames_dir / f"frame_{i}.png"), img)
    out = str(tmp_path / "out.mp4")
    export_video_face_recognition(str(frames_dir), 5.0, out)
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 5


def test_dataset_folder_converters(tmp_path):
    import pandas as pd
    from PIL import Image

    from vn_celeb_face_recognition_tpu.utils import (
        convert_ds_folder_2_def_structure,
        convert_id_ds_2_def_structure,
    )

    src = tmp_path / "per_class"
    for cls in ("1", "2"):
        (src / cls).mkdir(parents=True)
        for j in range(2):
            Image.new("RGB", (8, 8)).save(src / cls / f"img{j}.png")

    out1 = tmp_path / "flat1"
    convert_ds_folder_2_def_structure(str(src), str(out1),
                                      str(tmp_path / "l1.csv"))
    df1 = pd.read_csv(tmp_path / "l1.csv")
    assert sorted(df1["label"].unique()) == [0, 1]  # 1-based dirs -> -1
    assert len(df1) == 4

    out2 = tmp_path / "flat2"
    convert_id_ds_2_def_structure(str(src), str(out2),
                                  str(tmp_path / "l2.csv"))
    df2 = pd.read_csv(tmp_path / "l2.csv")
    assert sorted(df2["label"].unique()) == [1, 2]  # 0-based identity


def test_mtcnn_extract_save_path(tmp_path):
    import glob

    from PIL import Image

    from vn_celeb_face_recognition_tpu.models import MTCNN

    files = toy_face_files()
    if not files:
        pytest.skip("toy face fixture unavailable")
    img = np.asarray(
        Image.open(files[0]).convert("RGB").resize((160, 160))
    )
    det = MTCNN(min_face_size=20, keep_all=False, image_size=96)
    save_to = str(tmp_path / "crops" / "face.png")
    faces, boxes = det(img, save_path=save_to)
    assert os.path.exists(save_to)
    saved = np.asarray(Image.open(save_to))
    assert saved.shape == (96, 96, 3)


def test_json_dtype_strings_coerce():
    """cfg JSON names dtypes as strings; builders and detector
    constructors must accept them (CLI fast-path plumbing)."""
    import jax.numpy as jnp

    from vn_celeb_face_recognition_tpu.models import (
        MTCNN,
        RetinaFace,
        build_model,
    )

    model, _ = build_model("InceptionResnetV1", dtype="bfloat16")
    assert model.dtype == jnp.bfloat16
    det = MTCNN(dtype="bfloat16")
    assert det.dtype == jnp.bfloat16
    rf = RetinaFace(dtype="bfloat16")
    assert rf.net.dtype == jnp.bfloat16


def test_default_cli_encoder_args_reconcile():
    """The reference's stock defaults (-enc InceptionResnetV1 with the
    iresnet -eargs config, demo_image.py:326-331) crash upstream; the
    CLIs reconcile them instead (fixed reference bug)."""
    from demo_image import _reconcile_encoder_args, build_arg_parser
    from vn_celeb_face_recognition_tpu.pipeline.recognition import \
        Encoder
    from vn_celeb_face_recognition_tpu.utils import read_json

    args = build_arg_parser().parse_args([])
    enc_args = read_json(args.encoder_args)
    assert "freeze_weights" in enc_args  # the incoherent stock pair
    rec = _reconcile_encoder_args(args, enc_args)
    assert "freeze_weights" not in rec and "progress" not in rec
    # boolean pretrained maps onto the -w dataset name
    assert rec["pretrained"] == args.pre_trained_emb == "vggface2"
    # the default wiring now constructs (random init: no weights here)
    model = Encoder.build(args.encoder, **rec)
    assert model is not None

    # pretrained:false -> None; explicit checkpoint routes to weights
    rec2 = _reconcile_encoder_args(
        args, {"pretrained": False, "checkpoint_path": "x.npz"})
    assert rec2["pretrained"] is None
    assert rec2["weights_path"] == "x.npz"

    # coherent iresnet pairs pass through untouched
    args.encoder = "iresnet100"
    assert _reconcile_encoder_args(args, enc_args) == enc_args
