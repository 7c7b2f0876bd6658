"""I/O boundary: image + annotation codecs. The only package allowed to
import PIL/OpenCV (BASELINE.json: imaging libraries confined to I/O)."""

from .image import (
    depth_to_u8,
    depth_to_u16,
    image_size,
    imread_gray,
    imread_rgb,
    imwrite,
    load_annotation,
    save_annotation,
)

__all__ = [
    "depth_to_u8",
    "depth_to_u16",
    "image_size",
    "imread_gray",
    "imread_rgb",
    "imwrite",
    "load_annotation",
    "save_annotation",
]
