from . import boxes
from . import image
from . import similarity
from . import augment

__all__ = ["boxes", "image", "similarity", "augment"]
