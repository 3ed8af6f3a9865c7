"""Native C++ IO runtime tests: JPEG/PNG decode vs PIL, the threaded
batch loader, and the libav video reader vs cv2."""

import glob
import os

import numpy as np
import pytest

native = pytest.importorskip(
    "vn_celeb_face_recognition_tpu.native", reason="native pkg missing"
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libvnruntime.so not built"
)


@pytest.fixture(scope="module")
def sample_images(tmp_path_factory, ):
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    gen = np.random.default_rng(0)
    paths = []
    for i in range(7):
        arr = gen.integers(0, 255, size=(50 + i, 40 + i, 3),
                           dtype=np.uint8)
        img = Image.fromarray(arr)
        p_png = root / f"img_{i}.png"
        img.save(p_png)
        paths.append(str(p_png))
        p_jpg = root / f"img_{i}.jpg"
        img.save(p_jpg, quality=95)
        paths.append(str(p_jpg))
    return paths


def test_decode_matches_pil(sample_images):
    from PIL import Image

    for p in sample_images:
        with Image.open(p) as img:
            ref = np.asarray(img.convert("RGB"), dtype=np.int16)
        h, w = ref.shape[:2]
        got = native.decode_image_file(p, w, h).astype(np.int16)
        if p.endswith(".png"):
            np.testing.assert_array_equal(got, ref)
        else:
            # JPEG decoders may differ by a couple of levels (IDCT)
            assert np.abs(got - ref).mean() < 2.0


def test_decode_with_resize(sample_images):
    got = native.decode_image_file(sample_images[0], 32, 24)
    assert got.shape == (24, 32, 3)
    assert got.std() > 0


def test_batch_loader_order_and_coverage(sample_images):
    loader = native.NativeBatchLoader(
        sample_images, batch_size=4, width=32, height=32, threads=3,
        prefetch=2,
    )
    seen = 0
    batches = 0
    for data, ok, count in loader:
        assert data.shape == (4, 32, 32, 3)
        assert ok[:count].all()
        seen += count
        batches += 1
    assert seen == len(sample_images)
    assert batches == -(-len(sample_images) // 4)


def test_batch_loader_bad_file(tmp_path, sample_images):
    bad = tmp_path / "broken.png"
    bad.write_bytes(b"not an image at all")
    loader = native.NativeBatchLoader(
        [sample_images[0], str(bad)], batch_size=2, width=16, height=16,
    )
    batches = list(loader)
    assert len(batches) == 1
    _, ok, count = batches[0]
    assert count == 2
    assert ok[0] and not ok[1]


def test_video_reader_matches_cv2(tmp_path):
    cv2 = pytest.importorskip("cv2")

    video_path = str(tmp_path / "clip.avi")
    w, h, n = 64, 48, 12
    writer = cv2.VideoWriter(
        video_path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (w, h)
    )
    gen = np.random.default_rng(1)
    frames = []
    for i in range(n):
        frame = np.full((h, w, 3), i * 20 % 255, dtype=np.uint8)
        frame[10:30, 10:30] = gen.integers(0, 255, size=(20, 20, 3))
        frames.append(frame)
        writer.write(frame)
    writer.release()

    reader = native.NativeVideoReader(video_path)
    assert (reader.width, reader.height) == (w, h)
    assert abs(reader.fps - 10.0) < 0.5
    got = []
    while True:
        chunk = reader.read(5)
        if len(chunk) == 0:
            break
        got.append(chunk)
    reader.close()
    got = np.concatenate(got)
    assert len(got) == n

    cap = cv2.VideoCapture(video_path)
    for i in range(n):
        ret, bgr = cap.read()
        assert ret
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.int16)
        # MJPEG decode differences between libav and cv2 are tiny
        assert np.abs(got[i].astype(np.int16) - rgb).mean() < 3.0
    cap.release()


def test_frame_chunks_native_matches_cv2(tmp_path):
    """demo_video.frame_chunks yields the same frames through the
    native libav reader and the cv2 fallback."""
    cv2 = pytest.importorskip("cv2")

    from demo_video import frame_chunks

    video_path = str(tmp_path / "chunks.avi")
    w, h, n = 64, 48, 10
    writer = cv2.VideoWriter(
        video_path, cv2.VideoWriter_fourcc(*"MJPG"), 8.0, (w, h)
    )
    gen = np.random.default_rng(4)
    for i in range(n):
        frame = np.full((h, w, 3), (i * 23) % 255, dtype=np.uint8)
        frame[8:24, 8:24] = gen.integers(0, 255, size=(16, 16, 3))
        writer.write(frame)
    writer.release()

    def collect(use_native):
        frames, infos = [], []
        for fs, inf in frame_chunks(video_path, 4,
                                    use_native=use_native):
            frames += fs
            infos += inf
        return frames, infos

    f_native, i_native = collect(True)
    f_cv2, i_cv2 = collect(False)
    assert len(f_native) == len(f_cv2) == n
    assert i_native == i_cv2
    for a, b in zip(f_native, f_cv2):
        assert np.abs(a.astype(np.int16) - b.astype(np.int16)).mean() < 3.0


@pytest.mark.parametrize("size", [(200, 200), (100, 76), (322, 242)])
def test_video_reader_unaligned_sizes(tmp_path, size):
    """Regression: swscale SIMD paths overran packed output strides at
    widths whose row bytes weren't vector-aligned (double-free crash at
    200x200); the reader stages through an aligned buffer now."""
    cv2 = pytest.importorskip("cv2")

    w, h = size
    video_path = str(tmp_path / f"clip_{w}x{h}.avi")
    writer = cv2.VideoWriter(
        video_path, cv2.VideoWriter_fourcc(*"MJPG"), 6.0, (w, h)
    )
    gen = np.random.default_rng(w)
    for i in range(7):
        writer.write(
            gen.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        )
    writer.release()

    for _ in range(3):  # repeated open/close caught the corruption
        reader = native.NativeVideoReader(video_path)
        total = 0
        while True:
            chunk = reader.read(4)
            if len(chunk) == 0:
                break
            assert chunk.shape[1:] == (h, w, 3)
            total += len(chunk)
        reader.close()
        assert total == 7
