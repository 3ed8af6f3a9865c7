from .loader import (
    available,
    build,
    decode_image_file,
    NativeBatchLoader,
    NativeVideoReader,
)

__all__ = [
    "available",
    "build",
    "decode_image_file",
    "NativeBatchLoader",
    "NativeVideoReader",
]
