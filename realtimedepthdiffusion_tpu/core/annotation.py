"""Annotation (scribble) ops in JAX.

The reference carries scribbles as a pair of images — an 8UC3 "edited" image
whose channel 0 holds the depth value and an 8UC1 mask (255 = scribbled)
(src/main.cpp:24-27). Since a scribbled pixel always has all three channels
equal to the scribble value (paintImage, src/GPUImageProcessing.cu:65-68, and
the annotation loader, src/main.cpp:162-168), this framework represents an
annotation as the pair (mask: bool HxW, value: uint8 HxW) — strictly
equivalent and TPU-friendly (no interleaved channels).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def annotation_pyr_down(
    mask: jnp.ndarray, value: jnp.ndarray, out_shape: Tuple[int, int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Downsample an annotation one pyramid level.

    Semantics of the pyrDown kernel (src/GPUImageProcessing.cu:23-49): coarse
    (y,x) scans fine {2y-1,2y}x{2x-1,2x} in row-major order; any masked fine
    pixel masks the coarse pixel, and the LAST masked fine pixel in scan
    order supplies the value.
    """
    oh, ow = out_shape
    h, w = mask.shape
    # Pad one row/col on top/left so the (2y-1, 2x-1) taps are in-bounds;
    # padded border is unmasked, so it never contributes.
    mp = jnp.pad(mask, ((1, 1), (1, 1)))
    vp = jnp.pad(value, ((1, 1), (1, 1)))
    out_mask = jnp.zeros((oh, ow), dtype=bool)
    out_val = jnp.zeros((oh, ow), dtype=jnp.uint8)
    # Scan order (later iterations win): (-1,-1), (-1,0), (0,-1), (0,0).
    for dy in (-1, 0):
        for dx in (-1, 0):
            # Fine coords 2y+dy for y in [0,oh): padded index 2y+dy+1.
            m = mp[1 + dy : 1 + dy + 2 * oh : 2, 1 + dx : 1 + dx + 2 * ow : 2]
            v = vp[1 + dy : 1 + dy + 2 * oh : 2, 1 + dx : 1 + dx + 2 * ow : 2]
            out_val = jnp.where(m, v, out_val)
            out_mask = out_mask | m
    return out_mask, out_val


def seed_depth(depth: jnp.ndarray, mask: jnp.ndarray, value: jnp.ndarray) -> jnp.ndarray:
    """Dirichlet seeding (convert kernel, src/GPUImageProcessing.cu:8-21):
    where masked, depth := scribble value; elsewhere keep the incoming depth
    (initial 255 or the pyrUp'd coarse solution)."""
    return jnp.where(mask, value.astype(jnp.float32), depth.astype(jnp.float32))


def paint(
    mask: jnp.ndarray,
    value: jnp.ndarray,
    x: jnp.ndarray | int,
    y: jnp.ndarray | int,
    color: jnp.ndarray | int,
    radius: jnp.ndarray | int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Square-brush paint (paintImage kernel, src/GPUImageProcessing.cu:51-70).

    Jit-safe: brush position/color/radius may be traced scalars, so one
    compiled program serves every stroke of an interactive session. Paints
    pixels with |px-x| <= radius//2 and |py-y| <= radius//2.
    """
    h, w = mask.shape
    half = jnp.maximum(jnp.asarray(radius, jnp.int32), 0) // 2
    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, :]
    hit = (jnp.abs(xx - jnp.asarray(x, jnp.int32)) <= half) & (
        jnp.abs(yy - jnp.asarray(y, jnp.int32)) <= half
    )
    return mask | hit, jnp.where(hit, jnp.asarray(color, jnp.uint8), value)
