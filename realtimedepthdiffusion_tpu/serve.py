"""Offline batch serving: solve depth maps for many (image, annotation)
pairs.

The reference is a strictly interactive desktop app; this module is the
framework's production-serving face: shape-bucketed compiled pipelines, an
optional data-parallel+spatially-sharded multi-chip path
(parallel.batched_step), and PNG export per pair.

    python -m realtimedepthdiffusion_tpu.serve \
        --pairs img1.jpg:ann1.png img2.jpg:ann2.png --out out/ [--effect h]

or directory mode (images matched to annotations by stem):

    python -m realtimedepthdiffusion_tpu.serve \
        --images dataset/images --annotations dataset/annotations --out out/
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

from .config import DiffusionConfig
from .core import effects as fx
from .io import depth_to_u8, imread_rgb, imwrite, load_annotation

_EFFECT_BY_KEY = {"b": fx.EFFECT_DEFOCUS, "g": fx.EFFECT_DESATURATION, "h": fx.EFFECT_HAZE}


def discover_pairs(images_dir: str, annotations_dir: str) -> List[Tuple[str, str]]:
    """Match images to annotations by filename stem (the dataset layout,
    SURVEY.md C21)."""
    anns = {}
    for f in os.listdir(annotations_dir):
        stem, ext = os.path.splitext(f)
        if ext.lower() in (".png", ".jpg", ".jpeg"):
            anns[stem] = os.path.join(annotations_dir, f)
    pairs = []
    for f in sorted(os.listdir(images_dir)):
        stem, ext = os.path.splitext(f)
        if ext.lower() in (".png", ".jpg", ".jpeg") and stem in anns:
            pairs.append((os.path.join(images_dir, f), anns[stem]))
    return pairs


def solve_pairs(
    pairs: List[Tuple[str, str]],
    out_dir: str,
    cfg: DiffusionConfig = DiffusionConfig(),
    effect: Optional[int] = None,
    progress=None,
) -> List[str]:
    """Solve every pair; returns the written depth-map paths. Pipelines are
    compiled once per distinct image shape (shape bucketing)."""
    import jax.numpy as jnp

    from .pipeline import DepthPipeline

    os.makedirs(out_dir, exist_ok=True)
    pipes: Dict[Tuple[int, int], DepthPipeline] = {}
    written = []
    for img_path, ann_path in pairs:
        rgb = imread_rgb(img_path)
        mask, value = load_annotation(ann_path, cfg)
        h, w = rgb.shape[:2]
        if mask.shape != (h, w):
            raise ValueError(f"{ann_path}: shape {mask.shape} != image {(h, w)}")
        if (h, w) not in pipes:
            pipes[(h, w)] = DepthPipeline(h, w, cfg)
        pipe = pipes[(h, w)]
        rgb_d, gpyr = pipe.prepare_image(rgb)
        state = pipe.initial_state()
        mask_d, value_d = jnp.asarray(mask), jnp.asarray(value)
        stem = os.path.splitext(os.path.basename(img_path))[0]
        if effect is None:
            depth, _ = pipe.solve(gpyr, mask_d, value_d, state)
        else:
            depth, _, art = pipe.solve_and_effect(
                effect, gpyr, rgb_d, mask_d, value_d, state
            )
            imwrite(os.path.join(out_dir, f"{stem}_effect.png"), np.asarray(art))
        dp = os.path.join(out_dir, f"{stem}_depth.png")
        imwrite(dp, depth_to_u8(np.asarray(depth)))
        written.append(dp)
        if progress:
            progress(img_path, dp)
    return written


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="rtdd-serve", description=__doc__)
    p.add_argument("--pairs", nargs="*", default=[],
                   help="image:annotation path pairs")
    p.add_argument("--images", help="directory of images")
    p.add_argument("--annotations", help="directory of annotations")
    p.add_argument("--out", required=True)
    p.add_argument("--effect", choices=list(_EFFECT_BY_KEY), default=None)
    p.add_argument("--backend", default="auto")
    a = p.parse_args(argv)

    pairs: List[Tuple[str, str]] = []
    for pr in a.pairs:
        img, ann = pr.split(":", 1)
        pairs.append((img, ann))
    if a.images and a.annotations:
        pairs.extend(discover_pairs(a.images, a.annotations))
    if not pairs:
        print("no input pairs", file=sys.stderr)
        return 2

    cfg = DiffusionConfig(backend=a.backend)
    eff = _EFFECT_BY_KEY.get(a.effect) if a.effect else None
    written = solve_pairs(
        pairs, a.out, cfg, eff,
        progress=lambda src, dst: print(f"{src} -> {dst}"),
    )
    print(f"solved {len(written)} pair(s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
