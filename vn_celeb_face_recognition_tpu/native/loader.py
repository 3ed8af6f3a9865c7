"""ctypes bindings for the native IO runtime (libvnruntime.so).

Build once with ``python -m vn_celeb_face_recognition_tpu.native.loader
build`` (cmake + ninja/make); every consumer degrades gracefully to the
PIL/cv2 paths when the library is absent.
"""

import ctypes
import os
import subprocess
import sys

import numpy as np

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libvnruntime.so")

_lib = None


def build(force=False):
    """Compile libvnruntime.so with cmake (ninja if present)."""
    if os.path.exists(_LIB_PATH) and not force:
        return _LIB_PATH
    os.makedirs(_BUILD_DIR, exist_ok=True)
    gen = []
    if subprocess.run(["which", "ninja"], capture_output=True).returncode \
            == 0:
        gen = ["-G", "Ninja"]
    subprocess.run(
        ["cmake", *gen, ".."], cwd=_BUILD_DIR, check=True,
        capture_output=True,
    )
    subprocess.run(
        ["cmake", "--build", ".", "-j"], cwd=_BUILD_DIR, check=True,
        capture_output=True,
    )
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            build()
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.vn_decode_file.restype = ctypes.c_int
    lib.vn_decode_file.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vn_video_open.restype = ctypes.c_void_p
    lib.vn_video_open.argtypes = [ctypes.c_char_p]
    lib.vn_video_width.restype = ctypes.c_int
    lib.vn_video_width.argtypes = [ctypes.c_void_p]
    lib.vn_video_height.restype = ctypes.c_int
    lib.vn_video_height.argtypes = [ctypes.c_void_p]
    lib.vn_video_fps.restype = ctypes.c_double
    lib.vn_video_fps.argtypes = [ctypes.c_void_p]
    lib.vn_video_nframes.restype = ctypes.c_int64
    lib.vn_video_nframes.argtypes = [ctypes.c_void_p]
    lib.vn_video_read.restype = ctypes.c_int
    lib.vn_video_read.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.vn_video_close.restype = None
    lib.vn_video_close.argtypes = [ctypes.c_void_p]
    lib.vn_loader_create.restype = ctypes.c_void_p
    lib.vn_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.vn_loader_next.restype = ctypes.c_int
    lib.vn_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.vn_loader_destroy.restype = None
    lib.vn_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available():
    return _load() is not None


def decode_image_file(path, width, height):
    """Decode + bilinear-resize an image file to RGB [height,width,3]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    out = np.empty((height, width, 3), dtype=np.uint8)
    rc = lib.vn_decode_file(
        str(path).encode(), width, height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise IOError(f"vn_decode_file({path}) failed rc={rc}")
    return out


class NativeVideoReader:
    """Chunked RGB frame reader over libavformat/avcodec."""

    def __init__(self, path):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.vn_video_open(str(path).encode())
        if not self._h:
            raise IOError(f"cannot open video {path}")
        self.width = lib.vn_video_width(self._h)
        self.height = lib.vn_video_height(self._h)
        self.fps = lib.vn_video_fps(self._h) or 25.0
        self.nframes = lib.vn_video_nframes(self._h)

    def read(self, n):
        """Read up to n frames -> uint8 [m, H, W, 3] (m may be < n)."""
        buf = np.empty((n, self.height, self.width, 3), dtype=np.uint8)
        got = self._lib.vn_video_read(
            self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n,
        )
        return buf[:got]

    def close(self):
        if self._h:
            self._lib.vn_video_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeBatchLoader:
    """Threaded fixed-shape image batch loader (decode thread pool +
    bounded ring), the native replacement for DataLoader workers."""

    def __init__(self, paths, batch_size, width, height, threads=4,
                 prefetch=4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self.paths = [str(p) for p in paths]
        self.batch_size = batch_size
        self.width = width
        self.height = height
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths]
        )
        self._h = lib.vn_loader_create(
            arr, len(self.paths), batch_size, width, height, threads,
            prefetch,
        )

    def __iter__(self):
        while True:
            data = np.empty(
                (self.batch_size, self.height, self.width, 3),
                dtype=np.uint8,
            )
            ok = np.empty(self.batch_size, dtype=np.int32)
            count = self._lib.vn_loader_next(
                self._h,
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            if count == 0:
                return
            yield data, ok.astype(bool), count

    def close(self):
        if self._h:
            self._lib.vn_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "build":
        print(build(force=True))
