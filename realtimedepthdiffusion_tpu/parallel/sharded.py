"""Multi-chip spatially-sharded solve (shard_map over a ('batch','dy','dx')
mesh).

Scale-out design (SURVEY.md §5 "long-context" analog): each image is
partitioned into a dy x dx grid of per-chip blocks; every k sweeps the chips
exchange a k-wide halo over ICI (parallel/halo.py) and run k purely-local
Jacobi+Chebyshev sweeps — iteration blocking that amortizes ICI latency
exactly like the single-chip Pallas kernel amortizes HBM traffic. Coarse
pyramid levels whose blocks would be thinner than the halo run replicated
(they are tiny); fine levels run sharded. The 'batch' axis is plain data
parallelism over independent images (the framework's serving axis; the
reference is strictly single-image).

Numerics are identical to core.solver (same sweep, schedule, masking), so
single-chip and sharded solves agree to fp rounding.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DiffusionConfig
from ..core import effects as fx
from ..core.annotation import annotation_pyr_down, seed_depth
from ..core.pyramid import pyr_up
from ..core.weights import edge_weights
from .halo import crop_halo, extend_with_halo

# Halo width == sweeps between exchanges.
DEFAULT_HALO = 8


def _pad_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _use_pallas(cfg: DiffusionConfig) -> str:
    """'pallas' | 'pallas_interpret' | 'jnp' for the in-shard sweep blocks."""
    if cfg.backend == "pallas_interpret":
        return "pallas_interpret"
    if cfg.backend in ("pallas", "auto") and cfg.solver == "jacobi_chebyshev":
        from ..ops.dispatch import _is_tpu

        if cfg.backend == "pallas" or _is_tpu():
            return "pallas"
    return "jnp"


def _sharded_level_fn(mesh: Mesh, k: int, iters: int, cfg: DiffusionConfig):
    """Build the shard_map'd fixed-iteration solver for one level geometry.

    Expects globally padded (H,W) arrays whose dims divide (dy,dx); pad
    pixels must be masked (Dirichlet 0) and carry zero weights. Each k-sweep
    block between halo exchanges runs as ONE Pallas VMEM kernel on TPU (the
    multi-chip composition of the single-chip iteration blocking), or as an
    equivalent jnp roll-based loop elsewhere.
    """
    from ..ops.pallas_sweep import _abc_schedule, halo_block_sweeps

    abc_all = _abc_schedule(iters, cfg)
    n_full, rem = divmod(iters, k)
    mode = _use_pallas(cfg)

    def jnp_block(u_e, p_e, bh_e, bv_e, inv_e, m_e, abc):
        """jnp twin of the Pallas halo-block kernel (roll wraparound only
        corrupts the block edge ring, absorbed by the k-wide halo)."""
        wl_e = jnp.roll(bh_e, 1, 1)
        wu_e = jnp.roll(bv_e, 1, 0)
        for j in range(abc.shape[0]):
            a, b, c = (jnp.float32(abc[j, t]) for t in range(3))
            r = jnp.clip(
                (
                    wl_e * jnp.roll(u_e, 1, 1)
                    + bh_e * jnp.roll(u_e, -1, 1)
                    + wu_e * jnp.roll(u_e, 1, 0)
                    + bv_e * jnp.roll(u_e, -1, 0)
                )
                * inv_e,
                0.0,
                255.0,
            )
            out = a * r + b * u_e + c * p_e
            u_e, p_e = jnp.where(m_e, u_e, out), u_e
        return u_e, p_e

    def local(u, prev, bh, bv, inv, m):
        # One-time k-halo extension of the loop invariants.
        ext = lambda a: extend_with_halo(a, k)
        bh_e, bv_e, inv_e = ext(bh), ext(bv), ext(inv)
        m_e = ext(m)

        def sweeps(u_c, p_c, abc):
            """One halo exchange, then abc.shape[0] <= k local sweeps on the
            extended block (validity shrinks one ring per sweep; the interior
            crop is exact)."""
            u_e, p_e = ext(u_c), ext(p_c)
            if mode == "jnp":
                u_e, p_e = jnp_block(u_e, p_e, bh_e, bv_e, inv_e, m_e, abc)
            else:
                u_e, p_e = halo_block_sweeps(
                    u_e, p_e, bh_e, bv_e, inv_e, m_e, jnp.asarray(abc),
                    interpret=(mode == "pallas_interpret"),
                )
            return crop_halo(u_e, k), crop_halo(p_e, k)

        for blk in range(n_full):
            u, prev = sweeps(u, prev, abc_all[blk * k : (blk + 1) * k])
        if rem:
            u, prev = sweeps(u, prev, abc_all[n_full * k :])
        return u

    spec = P("dy", "dx")
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec,) * 6,
        out_specs=spec,
        # pallas_call's ShapeDtypeStruct outputs carry no varying-mesh-axes
        # annotation; skip the checker (all outputs vary over dy/dx).
        check_vma=False,
    )


def solve_level_sharded(
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    gray: jnp.ndarray,
    level: int,
    max_level: int,
    iters: int,
    mesh: Mesh,
    cfg: DiffusionConfig = DiffusionConfig(),
    halo: int = DEFAULT_HALO,
) -> jnp.ndarray:
    """Sharded equivalent of core.solver.solve_level: weights from the
    incoming depth, pad to the mesh grid, iterate with halo exchange, crop.

    Only the reference solver is implemented multi-chip in this round."""
    if cfg.solver != "jacobi_chebyshev":
        raise NotImplementedError(
            f"multi-chip path implements solver='jacobi_chebyshev' only, "
            f"got {cfg.solver!r}; use the single-chip pipeline for extended "
            f"solvers"
        )
    h, w = depth.shape
    dy, dx = mesh.shape["dy"], mesh.shape["dx"]
    wts = edge_weights(gray, depth, level, max_level, cfg)

    hp, wp = _pad_up(h, dy), _pad_up(w, dx)
    pad = lambda a, fill: jnp.pad(
        a, ((0, hp - h), (0, wp - w)), constant_values=fill
    )
    u = pad(depth.astype(jnp.float32), 0.0)
    m = pad(mask, True)  # pad pixels are Dirichlet-pinned at 0
    # Packed symmetric planes: bh = pair weight (x,x+1) = wr; bv = wd.
    planes = [pad(p, 0.0) for p in (wts.wr, wts.wd, wts.inv_count)]
    prev = jnp.zeros_like(u)

    fn = _sharded_level_fn(mesh, halo, iters, cfg)
    out = fn(u, prev, *planes, m)
    return out[:h, :w]


def solve_cascade_sharded(
    gray_pyr: Sequence[jnp.ndarray],
    mask0: jnp.ndarray,
    value0: jnp.ndarray,
    depth_state: Sequence[jnp.ndarray],
    mesh: Mesh,
    cfg: DiffusionConfig = DiffusionConfig(),
    halo: int = DEFAULT_HALO,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """Full coarse-to-fine solve with per-level shard/replicate choice.

    A level runs sharded when every chip's block is at least halo x halo;
    the tiny coarse levels run as ordinary global XLA ops (GSPMD replicates
    or subdivides them as it sees fit — they are microseconds of work).

    Only the reference solver/multigrid pair is implemented multi-chip.
    """
    if cfg.solver != "jacobi_chebyshev" or cfg.multigrid != "cascadic":
        raise NotImplementedError(
            "multi-chip path implements solver='jacobi_chebyshev' with "
            f"multigrid='cascadic' only, got ({cfg.solver!r}, {cfg.multigrid!r})"
        )
    from ..core.solver import solve_level  # local import to avoid cycle

    levels = len(gray_pyr)
    L = levels - 1
    sizes = [g.shape for g in gray_pyr]
    dy, dx = mesh.shape["dy"], mesh.shape["dx"]

    masks = [mask0]
    values = [value0]
    for l in range(1, levels):
        m, v = annotation_pyr_down(masks[-1], values[-1], sizes[l])
        masks.append(m)
        values.append(v)

    state = list(depth_state)
    state[L] = seed_depth(state[L], masks[L], values[L])
    for level in range(L, -1, -1):
        iters = cfg.level_iterations(levels, level)
        h, w = sizes[level]
        if h // dy >= halo and w // dx >= halo and (dy > 1 or dx > 1):
            state[level] = solve_level_sharded(
                state[level], masks[level], gray_pyr[level], level, L, iters,
                mesh, cfg, halo,
            )
        else:
            state[level] = solve_level(
                state[level], masks[level], gray_pyr[level], level, L, iters, cfg
            )
        if level > 0:
            up = pyr_up(state[level], sizes[level - 1])
            state[level - 1] = seed_depth(up, masks[level - 1], values[level - 1])
    return state[0], tuple(state)


def batched_step(
    mesh: Mesh,
    rows: int,
    cols: int,
    cfg: DiffusionConfig = DiffusionConfig(),
    effect: int = fx.EFFECT_HAZE,
    halo: int = DEFAULT_HALO,
):
    """The framework's full multi-chip step: data-parallel over a batch of
    images ('batch' axis), spatially sharded within each image ('dy','dx').

    Returns (jitted_fn, make_example_args): fn(rgb_batch, mask_batch,
    value_batch, depth_state_batch) -> (depth_batch, new_state, effect_batch).
    This is the "training step" analog the driver dry-runs multi-chip.

    NOTE: the batched path forces the XLA in-shard sweeps — Pallas TPU
    kernels with ANY-memory-space operands currently have no vmap batching
    rule (JAX limitation), so vmap(pallas strip kernel) fails to lower.
    Single-image multi-chip solves (solve_cascade_sharded) keep the Pallas
    halo-block kernel.
    """
    import dataclasses

    from ..core.color import rgb_to_gray
    from ..core.multigrid import build_gray_pyramid, initial_depth_state

    if cfg.backend in ("auto", "pallas"):
        cfg = dataclasses.replace(cfg, backend="xla")

    def single(rgb, mask, value, depth_state):
        gray0 = rgb_to_gray(rgb)
        gpyr = build_gray_pyramid(gray0, cfg)
        depth0, new_state = solve_cascade_sharded(
            gpyr, mask, value, depth_state, mesh, cfg, halo
        )
        out = fx.apply_effect(effect, rgb, gray0, jnp.clip(depth0, 0.0, 255.0), cfg)
        return depth0, new_state, out

    # Batch axis: vmap; XLA partitions it over 'batch' via the input
    # shardings below.
    step = jax.vmap(single)

    batch_spec = P("batch")
    img_spec = P("batch", "dy", "dx")

    def shardings():
        levels = cfg.num_levels(rows, cols)
        in_sh = (
            NamedSharding(mesh, P("batch", "dy", "dx", None)),  # rgb (B,H,W,3)
            NamedSharding(mesh, img_spec),  # mask
            NamedSharding(mesh, img_spec),  # value
            tuple(NamedSharding(mesh, img_spec) for _ in range(levels)),
        )
        return in_sh

    jitted = jax.jit(step, in_shardings=shardings())

    def make_example_args(batch: int | None = None):
        b = batch or mesh.shape["batch"]
        rng = np.random.default_rng(0)
        rgb = jnp.asarray(rng.integers(0, 256, (b, rows, cols, 3), dtype=np.uint8))
        mask = np.zeros((b, rows, cols), bool)
        value = np.zeros((b, rows, cols), np.uint8)
        mask[:, rows // 4, cols // 4] = True
        value[:, rows // 4, cols // 4] = 254
        mask[:, 3 * rows // 4, 3 * cols // 4] = True
        state = tuple(
            jnp.zeros((b,) + s.shape, jnp.float32) + jnp.float32(cfg.depth_init)
            for s in initial_depth_state(rows, cols, cfg)
        )
        return jnp.asarray(rgb), jnp.asarray(mask), jnp.asarray(value), state

    return jitted, make_example_args
