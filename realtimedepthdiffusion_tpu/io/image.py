"""Image + annotation I/O boundary.

Per BASELINE.json, external imaging libraries are confined to this module:
everything inside the framework operates on numpy/JAX arrays. PIL is used
for PNG/JPEG codec work (with an OpenCV fallback); nothing else imports it.

Annotation checkpoint format — exactly the reference contract
(src/main.cpp:160-170 load, :297-318 save):
- grayscale PNG, one byte per pixel
- value 32  = unannotated sentinel
- any other value = scribbled depth (the dataset uses {0,64,128,192,254})
The annotation PNG round-trips a session: it is the checkpoint/resume format
(SURVEY.md §5).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..config import DiffusionConfig


def _pil():
    from PIL import Image  # local import: I/O boundary only

    return Image


def imread_rgb(path: str) -> np.ndarray:
    """Load an image as (H, W, 3) uint8 RGB."""
    img = _pil().open(path).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def image_size(path: str) -> Tuple[int, int]:
    """(H, W) of an image from its header alone — no pixel decode. Matches
    ``imread_rgb``'s output shape (no EXIF transpose is applied on either
    path). Lets batch serving shape-bucket thousands of pairs without
    holding their decoded pixels in host RAM."""
    with _pil().open(path) as img:
        w, h = img.size
    return h, w


def imread_gray(path: str) -> np.ndarray:
    """Load an image as (H, W) uint8 grayscale (PIL 'L' mode)."""
    img = _pil().open(path).convert("L")
    return np.asarray(img, dtype=np.uint8)


def imwrite(path: str, arr: np.ndarray, png_level: int | None = None) -> None:
    """Write uint8 (H,W) gray / (H,W,3) RGB, or uint16 (H,W) gray (16-bit
    PNG — the ``depth_to_u16`` export path).

    ``png_level`` (0-9, PNG outputs only) sets the zlib effort: the codec
    default is 6; level 1 encodes ~3-5x faster at a modest size cost — the
    serving-throughput knob, since PNG encode (~150 ms/pair at 1080p)
    dominates a ~4 ms solve on a directly-attached TPU host."""
    arr = np.asarray(arr)
    if not (arr.dtype == np.uint16 and arr.ndim == 2):
        arr = arr.astype(np.uint8)
    kw = {}
    if png_level is not None and path.lower().endswith(".png"):
        kw["compress_level"] = int(png_level)
    _pil().fromarray(arr).save(path, **kw)


def load_annotation(
    path: str, cfg: DiffusionConfig = DiffusionConfig()
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode an annotation PNG into (mask bool, value uint8).

    Reference semantics (src/main.cpp:160-168): every pixel != sentinel(32)
    is annotated; its gray value is the scribbled depth.
    """
    ann = imread_gray(path)
    mask = ann != np.uint8(cfg.annotation_sentinel)
    value = np.where(mask, ann, np.uint8(0)).astype(np.uint8)
    return mask, value


def save_annotation(
    path: str,
    mask: np.ndarray,
    value: np.ndarray,
    cfg: DiffusionConfig = DiffusionConfig(),
) -> None:
    """Encode (mask, value) back to the annotation PNG contract: scribbled
    pixels keep their value, everything else becomes the sentinel. Inverse of
    ``load_annotation`` (the checkpoint round-trip)."""
    ann = np.where(mask, value, np.uint8(cfg.annotation_sentinel)).astype(np.uint8)
    imwrite(path, ann)


def depth_to_u8(depth: np.ndarray) -> np.ndarray:
    """float32 depth -> uint8 with saturation + round-half-to-even, matching
    GpuMat::convertTo(CV_8UC1) (src/main.cpp:290)."""
    return np.clip(np.rint(depth), 0, 255).astype(np.uint8)


def depth_to_u16(depth: np.ndarray) -> np.ndarray:
    """float32 depth -> uint16 at full solver precision (u16 = depth * 257,
    the standard 8-to-16-bit replication scale: 255 maps exactly to 65535
    and u16 // 257 recovers depth_to_u8 up to rounding). The solve converges
    well below one 8-bit gray level (post-solve RMS residual ~0.2, PERF.md),
    so the 16-bit export preserves real signal the u8 display path
    quantizes away — the reference has no such export (it saves the 8-bit
    display map, src/main.cpp:303-310). The multiply runs in float32 so this
    host form and DepthPipeline.depth_u16's on-device form are the same
    IEEE operation (a float64 product can round a knife-edge value to the
    other side of .5)."""
    scaled = depth.astype(np.float32) * np.float32(257.0)
    return np.clip(np.rint(scaled), 0, 65535).astype(np.uint16)
