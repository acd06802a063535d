from . import derived, codec, images

__all__ = ["derived", "codec", "images"]
