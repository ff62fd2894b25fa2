from .image_prep import resize_normalize, resize_normalize_pallas

__all__ = ["resize_normalize", "resize_normalize_pallas"]
