"""Pallas TPU kernels for the hot solver loop (SURVEY.md C12/C13).

Two kernels replace the reference's one-CUDA-launch-per-sweep design
(src/GPUSolver.cu:295-309, ~1937 launches/solve):

1. **Resident kernel** (`solve_level_resident`): the whole pyramid level —
   state, Chebyshev history, weights — lives in VMEM; ALL of the level's
   sweeps run inside one ``pallas_call`` with zero HBM traffic per sweep.
   Used for every level whose working set fits VMEM (everything above
   ~1 MPix), which carries ~90% of the cascade's iteration count.

2. **Strip MEGAKERNEL** (`solve_level_strips`): for full-resolution levels.
   ALL of a level's sweeps run in ONE pallas_call over a grid of
   (iteration blocks × row strips), blocks outer — the sequential TPU grid
   provides exactly the cross-strip dependency an iteration block needs.
   Each step runs k sweeps on a strip slab whose k-row halo's validity
   shrinks one ring per sweep, so the interior is exactly k-sweep Jacobi
   (the reference's 18x18 shared-memory-tile argument,
   src/GPUSolver.cu:239-245, scaled up ~100x); state ping-pongs between the
   halves of a (2, hp, wp) buffer by block parity. The four
   iteration-invariant planes load ONCE per strip into a persistent VMEM
   weight arena (v5e has 128 MiB physical VMEM). Levels whose f32 arena
   exceeds the VMEM cap (4K+) store u8 mask/gray/depth slabs instead and
   re-derive the weight planes in-kernel per grid step (the "uarena"
   kernel); a per-step-DMA kernel is the last fallback. A 3-deep state
   prefetch ring exists behind ``cfg.pallas_state_prefetch`` (measured
   slower than the plain arena on v5e — PERF.md).

Weight layout: instead of the reference's int2-packed LUT indices gathered
per sweep (src/GPUSolver.cu:222,250-254), weights are materialized once per
level as two symmetric planes bh/bv (w between x,x+1 / y,y+1) plus the
precomputed reciprocal weight-sum — 3 planes instead of 4, no gathers, no
per-sweep division.

All arrays are pre-padded with a 1-pixel zero ring so neighbor reads are
static in-bounds slices; the zero ring is never written and matches the
reference's index-256 "no neighbor" sentinel.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DiffusionConfig
from ..core.solver import chebyshev_omegas
from ..core.weights import edge_weights

# Kernel-variant selection (state-prefetch ring, static-copy arena,
# in-kernel halo bands, megakernel vs chunked red-black, VMEM budgets) lives
# in DiffusionConfig (pallas_* fields) so alternative hardware can flip the
# measured v5e defaults without editing this module; PERF.md carries the
# A/Bs behind each default.


def _pack_weights_padded(gray, depth, level, max_level, cfg):
    """(bh, bv, inv_count) planes, each padded with a 1-px zero ring.

    bh[y, x] = weight between (y,x) and (y,x+1) (zero in the last column);
    bv[y, x] = weight between (y,x) and (y+1,x). The directional planes of
    core.weights are recovered as shifted views: wl = bh shifted right, etc.
    """
    return _pack_wts_padded(edge_weights(gray, depth, level, max_level, cfg))


def _pack_wts_padded(wts):
    """Pack precomputed EdgeWeights into the kernels' ring-padded planes
    (callers that also need the raw ``wts``, e.g. for residual norms)."""
    bh = wts.wr  # wr[y,x] is exactly the (x,x+1) pair weight, 0 at x=W-1
    bv = wts.wd
    pad = lambda a: jnp.pad(a.astype(jnp.float32), ((1, 1), (1, 1)))
    return pad(bh), pad(bv), pad(wts.inv_count)


def _sweep_full(up, pp, wl, bh, wu, bv, inv, mask_u8, a, b, c):
    """One Jacobi+Chebyshev sweep over a FULL padded block (no interior
    slicing: every op is lane/sublane-aligned; neighbor access is a hardware
    roll). Correctness at edges relies on two invariants the callers
    maintain: (1) every non-real pixel (zero ring / alignment fill) carries
    mask=1 and value 0, so it is Dirichlet-pinned and roll wraparound reads
    only pinned zeros or weight-0 contributions; (2) boundary pair weights in
    bh/bv are zero (the reference's index-256 sentinel).

    wl/wu are the PRE-ROLLED weight planes (hoisted out of the sweep loop by
    the callers); (a, b, c) = (omega*gamma, omega*(1-gamma), 1-omega) is the
    algebraically-identical 3-FMA form of the Chebyshev update
    omega*(gamma*(r-u)+u-p)+p (src/GPUSolver.cu:259)."""
    hh, ww = up.shape
    ul = pltpu.roll(up, 1, 1)        # value of (y, x-1)
    ur = pltpu.roll(up, ww - 1, 1)   # (y, x+1)  (negative shifts unsupported)
    uu = pltpu.roll(up, 1, 0)        # (y-1, x)
    ud = pltpu.roll(up, hh - 1, 0)   # (y+1, x)
    r = jnp.clip((wl * ul + bh * ur + wu * uu + bv * ud) * inv, 0.0, 255.0)
    out = a * r + b * up + c * pp
    return jnp.where(mask_u8 != 0, up, out), up


def _abc_schedule(iters, cfg):
    """(iters, 3) float32 [a, b, c] per sweep from the omega schedule."""
    om = chebyshev_omegas(iters, cfg).astype(np.float32)
    g = np.float32(cfg.chebyshev_gamma)
    a = om * g
    return np.stack([a, om - a, np.float32(1.0) - om], axis=1)


def _resident_kernel(iters, unroll, om_ref, m_ref, bh_ref, bv_ref,
                     inv_ref, u_ref, out_ref, prev_scr, wl_scr, wu_scr):
    """All `iters` sweeps with every plane VMEM-resident. u_ref is aliased to
    out_ref (so out_ref starts holding the seeded input); prev_scr is the
    Chebyshev history scratch; wl/wu are rolled once into scratch.

    The sweep loop is manually partial-unrolled (cfg.pallas_resident_unroll):
    coarse levels are a few vregs, so the sweep chain is latency-bound and
    per-iteration scalar loop overhead is a real fraction of the cost
    (tools/ab_levels.py). Mosaic's fori_loop only supports unroll=1 or full
    unroll, so the body chains `unroll` sweeps through VALUES (one VMEM
    read-modify-write per block of sweeps) and the caller pads the omega
    table with identity rows (a, b, c) = (0, 1, 0) — an identity row leaves
    u unchanged (out = 0*r + 1*u + 0*prev) and only trails the LAST real
    sweep, where its clobbering of prev is unread."""
    del u_ref  # aliased: out_ref already contains the input state
    prev_scr[:] = jnp.zeros_like(prev_scr)
    wl_scr[:] = pltpu.roll(bh_ref[:], 1, 1)
    wu_scr[:] = pltpu.roll(bv_ref[:], 1, 0)

    unroll = max(int(unroll), 1)
    n_blocks = -(-iters // unroll)  # omega table is padded to n_blocks*unroll

    def body(i, _):
        u, prev = out_ref[:], prev_scr[:]
        for j in range(unroll):
            t = i * unroll + j
            u, prev = _sweep_full(
                u, prev, wl_scr[:], bh_ref[:], wu_scr[:],
                bv_ref[:], inv_ref[:], m_ref[:],
                om_ref[0, t], om_ref[1, t], om_ref[2, t],
            )
        prev_scr[:] = prev
        out_ref[:] = u
        return 0

    lax.fori_loop(0, n_blocks, body, 0, unroll=False)


def solve_level_resident(
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    gray: jnp.ndarray,
    level: int,
    max_level: int,
    iters: int,
    cfg: DiffusionConfig = DiffusionConfig(),
    interpret: bool = False,
) -> jnp.ndarray:
    """VMEM-resident fixed-iteration solve of one pyramid level."""
    h, w = depth.shape
    bh, bv, inv = _pack_weights_padded(gray, depth, level, max_level, cfg)
    up = jnp.pad(depth.astype(jnp.float32), ((1, 1), (1, 1)))
    # The zero ring is Dirichlet-pinned (mask=1, value 0): roll wraparound in
    # the kernel then only ever reads pinned zeros.
    mp = jnp.pad(mask.astype(jnp.uint8), ((1, 1), (1, 1)), constant_values=1)
    # SMEM tables ride TRANSPOSED, (3, iters): Mosaic pads an SMEM row's
    # minor dim to 128 lanes, so an (iters, 3) table costs 512 B/iteration
    # and overflows the 1 MiB SMEM at ~2048 iterations (a truth run at 8x
    # the reference schedule failed to compile); (3, iters) costs 12 B.
    # Pad the (iters, 3) schedule to a multiple of the unroll factor with
    # identity rows (0, 1, 0): each leaves u unchanged (see _resident_kernel).
    unroll = max(int(cfg.pallas_resident_unroll), 1)
    abc = _abc_schedule(iters, cfg)
    pad = -iters % unroll
    if pad:
        ident = np.tile(np.asarray([0.0, 1.0, 0.0], np.float32), (pad, 1))
        abc = np.concatenate([abc, ident], axis=0)
    omegas = jnp.asarray(abc.T)

    kernel = functools.partial(_resident_kernel, iters, unroll)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h + 2, w + 2), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # omegas (3, iters)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bh
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # inv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # u (aliased to out)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2), jnp.float32),  # prev
            pltpu.VMEM((h + 2, w + 2), jnp.float32),  # wl (rolled bh)
            pltpu.VMEM((h + 2, w + 2), jnp.float32),  # wu (rolled bv)
        ],
        input_output_aliases={5: 0},
        interpret=interpret,
    )(omegas, mp, bh, bv, inv, up)
    return out[1 : h + 1, 1 : w + 1]


# ---------------------------------------------------------------------------
# Strip kernel: k-sweep iteration blocking over row strips
# ---------------------------------------------------------------------------


def _strip_mega_kernel(k, pad_rows, block_h, n_strips,
                       om_ref, n_ref, u_in, p_in, m_hbm, bh_hbm, bv_hbm,
                       inv_hbm, u_pp, p_pp, u_s, p_s, m_s, bh_s, bv_s, inv_s,
                       wl_s, wu_s, sems):
    """Program (b, s): iteration block b (k sweeps) on row strip s — the
    WHOLE level is ONE pallas_call.

    Grid (n_blocks, n_strips), blocks outer: the TPU grid is sequential, so
    every strip of block b completes before block b+1 starts — exactly the
    dependency an iteration block needs from its neighbors' previous block.
    State lives in (2, hp, wp2) ping-pong buffers (aliased input->output):
    block b reads copy b%2 and writes copy (b+1)%2, so reads and writes
    never alias within a block. The kernels write interior rows only and
    the caller zeroes the halo bands of both copies ONCE — the bands are
    never dirtied, eliminating the round-1 design's per-launch host-level
    fix_halo passes (and its separate remainder launch: the last block
    masks off iterations past the active count; a padded omega row would
    corrupt the Chebyshev history, a masked sweep leaves it untouched).

    The active sweep count rides in SMEM (``n_ref[0]``) rather than being
    baked in statically: the early-exit path re-launches this same kernel
    per residual chunk with a DYNAMIC remaining-iteration count (a block
    whose sweeps are all masked still copies state src -> dst, keeping the
    ping-pong parity deterministic).

    Slab geometry as before: pad_rows >= k+1 zero rows top/bottom (sublane-
    aligned) and a 1-px zero column ring; halo validity shrinks one ring per
    sweep so the strip interior is exactly k-sweep Jacobi.
    """
    del u_in, p_in  # aliased: u_pp/p_pp ARE the state buffers
    b = pl.program_id(0)
    s = pl.program_id(1)
    src = b % 2
    dst = 1 - src
    row0 = s * block_h  # top of the slab in padded coords
    slab_h = block_h + 2 * pad_rows

    def dma_in(dstref, srcslice, slot):
        cp = pltpu.make_async_copy(srcslice, dstref, sems.at[slot])
        cp.start()
        return cp

    cps = [
        dma_in(u_s, u_pp.at[src, pl.ds(row0, slab_h), :], 0),
        dma_in(p_s, p_pp.at[src, pl.ds(row0, slab_h), :], 1),
        dma_in(m_s, m_hbm.at[pl.ds(row0, slab_h), :], 2),
        dma_in(bh_s, bh_hbm.at[pl.ds(row0, slab_h), :], 3),
        dma_in(bv_s, bv_hbm.at[pl.ds(row0, slab_h), :], 4),
        dma_in(inv_s, inv_hbm.at[pl.ds(row0, slab_h), :], 5),
    ]
    for cp in cps:
        cp.wait()

    wl_s[:] = pltpu.roll(bh_s[:], 1, 1)
    wu_s[:] = pltpu.roll(bv_s[:], 1, 0)
    base = b * k

    def body(i, _):
        @pl.when(base + i < n_ref[0])
        def _active():
            new_u, new_prev = _sweep_full(
                u_s[:], p_s[:], wl_s[:], bh_s[:], wu_s[:], bv_s[:], inv_s[:],
                m_s[:], om_ref[0, base + i], om_ref[1, base + i],
                om_ref[2, base + i],
            )
            p_s[:] = new_prev
            u_s[:] = new_u

        return 0

    lax.fori_loop(0, k, body, 0, unroll=False)

    # Write back the strip interior (skip the pad_rows halo rows).
    out_row = row0 + pad_rows
    uo = pltpu.make_async_copy(
        u_s.at[pl.ds(pad_rows, block_h), :],
        u_pp.at[dst, pl.ds(out_row, block_h), :], sems.at[6],
    )
    po = pltpu.make_async_copy(
        p_s.at[pl.ds(pad_rows, block_h), :],
        p_pp.at[dst, pl.ds(out_row, block_h), :], sems.at[7],
    )
    uo.start()
    po.start()
    uo.wait()
    po.wait()


def _strip_mega_kernel_arena(k, pad_rows, block_h, n_strips, static_copy,
                             om_ref, n_ref, u_in, p_in, m_hbm, bh_hbm, bv_hbm,
                             inv_hbm, u_pp, p_pp, u_s, p_s, wl_s, wu_s,
                             *scratch_rest):
    """Arena variant of _strip_mega_kernel: the four iteration-invariant
    planes (mask, bh, bv, inv) are DMA'd from HBM exactly ONCE per strip —
    into a persistent VMEM arena indexed by strip id during block 0 — instead
    of once per (block, strip) grid step. Only the ping-pong state still
    moves per step, cutting the steady-state HBM traffic roughly in half
    (the megakernel is bandwidth-bound, not VPU-bound: per-step DMA was
    ~6 slabs in + 2 out). Pallas scratch persists across grid steps, and the
    sequential TPU grid guarantees block 0's strip-s load completes before
    any later block touches strip s. v5e has 128 MiB of physical VMEM; the
    caller only selects this kernel when arena + working set fit."""
    del u_in, p_in  # aliased: u_pp/p_pp ARE the state buffers
    if static_copy:
        bhc_s, bvc_s, invc_s, mc_s, m_a, bh_a, bv_a, inv_a, sems = scratch_rest
    else:
        m_a, bh_a, bv_a, inv_a, sems = scratch_rest
    b = pl.program_id(0)
    s = pl.program_id(1)
    src = b % 2
    dst = 1 - src
    row0 = s * block_h
    slab_h = block_h + 2 * pad_rows

    def dma(dstref, srcslice, slot):
        cp = pltpu.make_async_copy(srcslice, dstref, sems.at[slot])
        cp.start()
        return cp

    cps = [
        dma(u_s, u_pp.at[src, pl.ds(row0, slab_h), :], 0),
        dma(p_s, p_pp.at[src, pl.ds(row0, slab_h), :], 1),
    ]

    @pl.when(b == 0)
    def _fill_arena():
        wps = [
            dma(m_a.at[s], m_hbm.at[pl.ds(row0, slab_h), :], 2),
            dma(bh_a.at[s], bh_hbm.at[pl.ds(row0, slab_h), :], 3),
            dma(bv_a.at[s], bv_hbm.at[pl.ds(row0, slab_h), :], 4),
            dma(inv_a.at[s], inv_hbm.at[pl.ds(row0, slab_h), :], 5),
        ]
        for cp in wps:
            cp.wait()

    for cp in cps:
        cp.wait()

    # Weight access per cfg.pallas_arena_static_copy: either sweeps read the arena
    # slabs through a tile-aligned dynamic (strip-indexed) offset each use,
    # or the four invariant slabs are copied once per grid step into
    # statically-addressed scratch. The rolled planes always need scratch.
    wl_s[:] = pltpu.roll(bh_a[s], 1, 1)
    wu_s[:] = pltpu.roll(bv_a[s], 1, 0)
    if static_copy:
        bhc_s[:] = bh_a[s]
        bvc_s[:] = bv_a[s]
        invc_s[:] = inv_a[s]
        mc_s[:] = m_a[s]
        bh_r, bv_r, inv_r, m_r = bhc_s, bvc_s, invc_s, mc_s
    else:
        bh_r, bv_r, inv_r, m_r = bh_a.at[s], bv_a.at[s], inv_a.at[s], m_a.at[s]
    base = b * k

    def body(i, _):
        @pl.when(base + i < n_ref[0])
        def _active():
            new_u, new_prev = _sweep_full(
                u_s[:], p_s[:], wl_s[:], bh_r[:], wu_s[:], bv_r[:],
                inv_r[:], m_r[:],
                om_ref[0, base + i], om_ref[1, base + i], om_ref[2, base + i],
            )
            p_s[:] = new_prev
            u_s[:] = new_u

        return 0

    lax.fori_loop(0, k, body, 0, unroll=False)

    out_row = row0 + pad_rows
    uo = pltpu.make_async_copy(
        u_s.at[pl.ds(pad_rows, block_h), :],
        u_pp.at[dst, pl.ds(out_row, block_h), :], sems.at[6],
    )
    po = pltpu.make_async_copy(
        p_s.at[pl.ds(pad_rows, block_h), :],
        p_pp.at[dst, pl.ds(out_row, block_h), :], sems.at[7],
    )
    uo.start()
    po.start()
    uo.wait()
    po.wait()


def _strip_mega_kernel_uarena(k, pad_rows, block_h, n_strips,
                              h_img, w_img, beta, thr, use_depth_rule,
                              om_ref, n_ref, u_in, p_in, m_hbm, g_hbm, d8_hbm,
                              u_pp, p_pp, u_s, p_s, bh_s, bv_s, inv_s,
                              wl_s, wu_s, m_a, g_a, d8_a, sems):
    """Derived-weights arena megakernel: the persistent VMEM arena holds the
    u8 SOURCE slabs (mask, gray, incoming-depth-u8 — 3 bytes/px of level)
    instead of the f32 weight planes (13 bytes/px), and the five weight
    planes are materialized into statically-addressed f32 scratch once per
    grid step — pure VPU exp/compares amortized over the block's k sweeps.
    This keeps 4K+ levels on the megakernel fast path (the f32 arena
    overflows VMEM there and round 2 fell back to per-step DMA: 26-46 ms for
    the 4K L0 alone, PERF.md).

    Weight rule == core/weights.edge_weights (src/GPUSolver.cu:136-224):
    base = exp(-beta*|gray SAD|) pinned to 0 below the f32 normal boundary;
    where the (u8-truncated) incoming depth differs by <= thr the pair
    weight is 1.0 (free diffusion); border/padding pairs are 0 via the
    static validity masks (the index-256 sentinel). Boundary-strip roll
    wraparound only corrupts the outermost slab rows' planes, absorbed by
    pad_rows >= k+1 exactly like the state halo.

    Parity standard (tests_tpu): the derivation block below is BIT-exact
    against the XLA-compiled edge_weights planes on hardware; the full
    solve matches the f32-arena kernel to ~1e-2 RMSE (0-255 scale), not
    bitwise — different Mosaic programs contract the sweep's FMAs
    differently (the knife-edge rule: bit-exactness only holds within one
    compilation context).
    """
    del u_in, p_in  # aliased: u_pp/p_pp ARE the state buffers
    b = pl.program_id(0)
    s = pl.program_id(1)
    src = b % 2
    dst = 1 - src
    row0 = s * block_h
    slab_h = block_h + 2 * pad_rows
    wp2 = u_s.shape[1]

    def dma(dstref, srcslice, slot):
        cp = pltpu.make_async_copy(srcslice, dstref, sems.at[slot])
        cp.start()
        return cp

    cps = [
        dma(u_s, u_pp.at[src, pl.ds(row0, slab_h), :], 0),
        dma(p_s, p_pp.at[src, pl.ds(row0, slab_h), :], 1),
    ]

    @pl.when(b == 0)
    def _fill_arena():
        wps = [
            dma(m_a.at[s], m_hbm.at[pl.ds(row0, slab_h), :], 2),
            dma(g_a.at[s], g_hbm.at[pl.ds(row0, slab_h), :], 3),
        ] + ([dma(d8_a.at[s], d8_hbm.at[pl.ds(row0, slab_h), :], 4)]
             if use_depth_rule else [])
        for cp in wps:
            cp.wait()

    # Materialize the weight planes for this strip (every grid step: scratch
    # is not strip-indexed; ~40 VPU ops/px amortized over k sweeps).
    g = g_a[s].astype(jnp.int32)
    gr = pltpu.roll(g, wp2 - 1, 1)   # gray at (r, c+1)
    gd = pltpu.roll(g, slab_h - 1, 0)  # gray at (r+1, c)
    tiny = jnp.float32(np.finfo(np.float32).tiny)
    nbeta = jnp.float32(-beta)
    base_h = jnp.exp(nbeta * jnp.abs(gr - g).astype(jnp.float32))
    base_v = jnp.exp(nbeta * jnp.abs(gd - g).astype(jnp.float32))
    base_h = jnp.where(base_h >= tiny, base_h, jnp.float32(0.0))
    base_v = jnp.where(base_v >= tiny, base_v, jnp.float32(0.0))
    if use_depth_rule:
        d = d8_a[s].astype(jnp.int32)
        dr = pltpu.roll(d, wp2 - 1, 1)
        dd = pltpu.roll(d, slab_h - 1, 0)
        one = jnp.float32(1.0)
        base_h = jnp.where(jnp.abs(dr - d) > thr, base_h, one)
        base_v = jnp.where(jnp.abs(dd - d) > thr, base_v, one)
    # Validity masks: image cols are padded cols [1, w_img]; image rows are
    # padded rows [pad_rows, pad_rows + h_img). A pair weight exists only
    # between two real pixels; everything else is the zero sentinel.
    col = lax.broadcasted_iota(jnp.int32, (slab_h, wp2), 1)
    row = lax.broadcasted_iota(jnp.int32, (slab_h, wp2), 0) + row0
    in_rows = (row >= pad_rows) & (row < pad_rows + h_img)
    zero = jnp.float32(0.0)
    bh_s[:] = jnp.where(
        in_rows & (col >= 1) & (col <= w_img - 1), base_h, zero
    )
    bv_s[:] = jnp.where(
        (row >= pad_rows) & (row < pad_rows + h_img - 1)
        & (col >= 1) & (col <= w_img),
        base_v, zero,
    )
    wl_s[:] = pltpu.roll(bh_s[:], 1, 1)
    wu_s[:] = pltpu.roll(bv_s[:], 1, 0)
    count = wl_s[:] + bh_s[:] + wu_s[:] + bv_s[:]
    inv_s[:] = jnp.where(count >= tiny, jnp.float32(1.0) / count, zero)

    for cp in cps:
        cp.wait()
    base = b * k

    def body(i, _):
        @pl.when(base + i < n_ref[0])
        def _active():
            new_u, new_prev = _sweep_full(
                u_s[:], p_s[:], wl_s[:], bh_s[:], wu_s[:], bv_s[:],
                inv_s[:], m_a[s],
                om_ref[0, base + i], om_ref[1, base + i], om_ref[2, base + i],
            )
            p_s[:] = new_prev
            u_s[:] = new_u

        return 0

    lax.fori_loop(0, k, body, 0, unroll=False)

    out_row = row0 + pad_rows
    uo = pltpu.make_async_copy(
        u_s.at[pl.ds(pad_rows, block_h), :],
        u_pp.at[dst, pl.ds(out_row, block_h), :], sems.at[5],
    )
    po = pltpu.make_async_copy(
        p_s.at[pl.ds(pad_rows, block_h), :],
        p_pp.at[dst, pl.ds(out_row, block_h), :], sems.at[6],
    )
    uo.start()
    po.start()
    uo.wait()
    po.wait()


def _uarena_bytes(wp2, slab_h, n_strips):
    """VMEM bytes for the derived-weights (u8) arena variant: 3 u8 source
    slabs per strip + a working set of 2 state + 5 weight scratch slabs and
    ~10 slab-sized Mosaic temporaries for the derivation and sweeps."""
    arena = n_strips * slab_h * wp2 * 3
    working = 17 * slab_h * wp2 * 4
    return arena + working


def _arena_bytes(wp2, slab_h, n_strips, static_copy=False):
    """VMEM bytes for the weight arena + the working set of the arena strip
    kernel (3x2 rotation state slabs + ~8 slab-sized Mosaic temporaries for
    the rolled weights, stencil rolls and sweep intermediates). The
    static-copy variant allocates 4 extra scratch slabs (3 f32 + 1 u8) that
    must count toward the requested vmem_limit."""
    arena = n_strips * slab_h * wp2 * (3 * 4 + 1)
    working = 14 * slab_h * wp2 * 4
    if static_copy:
        working += slab_h * wp2 * (3 * 4 + 1)
    return arena + working


def _strip_mega_kernel_prefetch(k, pad_rows, block_h, n_strips, n_blocks,
                                om_ref, n_ref, u_in, p_in, m_hbm, bh_hbm,
                                bv_hbm, inv_hbm, u_pp, p_pp, u_db, p_db,
                                wl_s, wu_s, m_a, bh_a, bv_a, inv_a, sems):
    """Arena megakernel + cross-step state prefetch: u/prev slabs rotate
    through a 3-deep VMEM buffer ring so each step's input DMA is issued one
    step EARLY (during the previous step's sweeps) and its writeback drains
    during the NEXT step's sweeps — in steady state no DMA wait sits on the
    critical path and the kernel is compute-bound.

    Semaphore slots: in-u 0..2 / in-p 3..5 (by buffer index), out-u 6..8 /
    out-p 9..11 (by issuing step mod 3), arena 12..15. Every signal is
    consumed exactly once (counting semaphores alias across steps otherwise):
    the writeback of step j is waited at step j+2 — immediately before its
    buffer slot is re-targeted by that step's prefetch — and the final step
    drains j = total-2 and its own.

    Safety argument for the prefetch (caller enforces n_strips >= 4 and
    block_h >= pad_rows):
    - Same-block prefetch (strip s+1) reads the SRC ping-pong copy, which
      block b never writes; the two in-flight writebacks target DST.
    - A prefetch issued at a block's first step reads SRC rows up to
      2*block_h + 2*pad_rows; of the previous block's tail writebacks (which
      targeted today's SRC), step t-2 overlaps that range only when
      (n_strips-4)*block_h < pad_rows — and t-2 is waited here before the
      issue — while t-1 requires (n_strips-3)*block_h < pad_rows, excluded
      by n_strips >= 4.
    - Block-START steps (s == 0) get no prefetch: their input overlaps the
      previous block's mid-strip writebacks for any n_strips, so they
      self-issue after the t-2 wait and pay one unhidden slab DMA per block.
    """
    del u_in, p_in  # aliased: u_pp/p_pp ARE the state buffers
    b = pl.program_id(0)
    s = pl.program_id(1)
    t = b * n_strips + s
    total = n_blocks * n_strips
    cur = t % 3
    nxt = (t + 1) % 3
    src = b % 2
    dst = 1 - src
    row0 = s * block_h
    slab_h = block_h + 2 * pad_rows

    def in_u(buf, row):
        return pltpu.make_async_copy(
            u_pp.at[src, pl.ds(row, slab_h), :], u_db.at[buf], sems.at[buf]
        )

    def in_p(buf, row):
        return pltpu.make_async_copy(
            p_pp.at[src, pl.ds(row, slab_h), :], p_db.at[buf], sems.at[3 + buf]
        )

    def out_u(buf, row, slot):
        return pltpu.make_async_copy(
            u_db.at[buf, pl.ds(pad_rows, block_h), :],
            u_pp.at[dst, pl.ds(row + pad_rows, block_h), :], sems.at[6 + slot]
        )

    def out_p(buf, row, slot):
        return pltpu.make_async_copy(
            p_db.at[buf, pl.ds(pad_rows, block_h), :],
            p_pp.at[dst, pl.ds(row + pad_rows, block_h), :], sems.at[9 + slot]
        )

    @pl.when(s == 0)
    def _self_input():  # block starts are never prefetched
        in_u(cur, row0).start()
        in_p(cur, row0).start()

    @pl.when(b == 0)
    def _fill_arena():
        wps = [
            pltpu.make_async_copy(m_hbm.at[pl.ds(row0, slab_h), :], m_a.at[s], sems.at[12]),
            pltpu.make_async_copy(bh_hbm.at[pl.ds(row0, slab_h), :], bh_a.at[s], sems.at[13]),
            pltpu.make_async_copy(bv_hbm.at[pl.ds(row0, slab_h), :], bv_a.at[s], sems.at[14]),
            pltpu.make_async_copy(inv_hbm.at[pl.ds(row0, slab_h), :], inv_a.at[s], sems.at[15]),
        ]
        for cp in wps:
            cp.start()
        for cp in wps:
            cp.wait()

    # Buffer-reuse guard: consume the writeback issued 2 steps ago from the
    # slot the prefetch below re-targets. (The descriptor only carries the
    # transfer size for the semaphore wait; all writebacks are equal-sized.)
    @pl.when(t >= 2)
    def _reuse_wait():
        out_u(nxt, row0, nxt).wait()
        out_p(nxt, row0, nxt).wait()

    @pl.when(s < n_strips - 1)
    def _prefetch():
        in_u(nxt, row0 + block_h).start()
        in_p(nxt, row0 + block_h).start()

    in_u(cur, row0).wait()
    in_p(cur, row0).wait()

    wl_s[:] = pltpu.roll(bh_a[s], 1, 1)
    wu_s[:] = pltpu.roll(bv_a[s], 1, 0)
    u_r = u_db.at[cur]
    p_r = p_db.at[cur]
    base = b * k

    def body(i, _):
        @pl.when(base + i < n_ref[0])
        def _active():
            new_u, new_prev = _sweep_full(
                u_r[:], p_r[:], wl_s[:], bh_a[s], wu_s[:], bv_a[s],
                inv_a[s], m_a[s],
                om_ref[0, base + i], om_ref[1, base + i], om_ref[2, base + i],
            )
            p_r[:] = new_prev
            u_r[:] = new_u

        return 0

    lax.fori_loop(0, k, body, 0, unroll=False)

    out_u(cur, row0, cur).start()
    out_p(cur, row0, cur).start()

    @pl.when(t == total - 1)
    def _drain():
        if total >= 2:  # static: prefetch mode implies total >= n_strips >= 4
            out_u(nxt, row0, (t + 2) % 3).wait()  # j = total-2
            out_p(nxt, row0, (t + 2) % 3).wait()
        out_u(cur, row0, cur).wait()  # own
        out_p(cur, row0, cur).wait()


def _strips_mega_call_uarena(hp, wp2, k, iters, pad_rows, n_strips, block_h,
                             h_img, w_img, beta, thr, use_depth_rule,
                             interpret, vmem_cap):
    slab_h = block_h + 2 * pad_rows
    n_blocks = -(-iters // k)
    kern = functools.partial(
        _strip_mega_kernel_uarena, k, pad_rows, block_h, n_strips,
        h_img, w_img, beta, thr, use_depth_rule,
    )
    call = pl.pallas_call(
        kern,
        grid=(n_blocks, n_strips),
        out_shape=(
            jax.ShapeDtypeStruct((2, hp, wp2), jnp.float32),
            jax.ShapeDtypeStruct((2, hp, wp2), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # omegas
            pl.BlockSpec(memory_space=pltpu.SMEM),  # active count (1,)
            pl.BlockSpec(memory_space=pl.ANY),  # u ping-pong (aliased)
            pl.BlockSpec(memory_space=pl.ANY),  # prev ping-pong (aliased)
            pl.BlockSpec(memory_space=pl.ANY),  # mask u8
            pl.BlockSpec(memory_space=pl.ANY),  # gray u8
            pl.BlockSpec(memory_space=pl.ANY),  # depth-u8
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # u slab
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # prev slab
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # bh (derived)
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # bv (derived)
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # inv (derived)
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # wl (rolled bh)
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # wu (rolled bv)
            pltpu.VMEM((n_strips, slab_h, wp2), jnp.uint8),  # mask arena
            pltpu.VMEM((n_strips, slab_h, wp2), jnp.uint8),  # gray arena
            pltpu.VMEM((n_strips, slab_h, wp2), jnp.uint8),  # d8 arena
            pltpu.SemaphoreType.DMA((7,)),
        ],
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=min(
                _uarena_bytes(wp2, slab_h, n_strips) + 8 * 1024 * 1024,
                vmem_cap,
            ),
        ),
    )
    return lambda om, n, *rest: call(
        om.T, jnp.asarray(n, jnp.int32).reshape(1), *rest
    )


def _strips_mega_call(hp, wp2, k, iters, pad_rows, n_strips, block_h, interpret,
                      arena=False, prefetch=False, static_copy=False,
                      vmem_cap=112 * 1024 * 1024):
    if arena:
        slab_h = block_h + 2 * pad_rows
        n_blocks = -(-iters // k)
        if prefetch:
            kern = functools.partial(
                _strip_mega_kernel_prefetch, k, pad_rows, block_h,
                n_strips, n_blocks,
            )
            state_scratch = [
                pltpu.VMEM((3, slab_h, wp2), jnp.float32),  # u rotation ring
                pltpu.VMEM((3, slab_h, wp2), jnp.float32),  # prev rotation ring
            ]
        else:
            kern = functools.partial(
                _strip_mega_kernel_arena, k, pad_rows, block_h,
                n_strips, static_copy,
            )
            state_scratch = [
                pltpu.VMEM((slab_h, wp2), jnp.float32),  # u slab
                pltpu.VMEM((slab_h, wp2), jnp.float32),  # prev slab
            ]
        call = pl.pallas_call(
            kern,
            grid=(n_blocks, n_strips),
            out_shape=(
                jax.ShapeDtypeStruct((2, hp, wp2), jnp.float32),
                jax.ShapeDtypeStruct((2, hp, wp2), jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # omegas
                pl.BlockSpec(memory_space=pltpu.SMEM),  # active count (1,)
                pl.BlockSpec(memory_space=pl.ANY),  # u ping-pong (aliased)
                pl.BlockSpec(memory_space=pl.ANY),  # prev ping-pong (aliased)
                pl.BlockSpec(memory_space=pl.ANY),  # mask
                pl.BlockSpec(memory_space=pl.ANY),  # bh
                pl.BlockSpec(memory_space=pl.ANY),  # bv
                pl.BlockSpec(memory_space=pl.ANY),  # inv
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=state_scratch + [
                pltpu.VMEM((slab_h, wp2), jnp.float32),  # wl slab (rolled bh)
                pltpu.VMEM((slab_h, wp2), jnp.float32),  # wu slab (rolled bv)
            ] + ([
                pltpu.VMEM((slab_h, wp2), jnp.float32),  # bh static copy
                pltpu.VMEM((slab_h, wp2), jnp.float32),  # bv static copy
                pltpu.VMEM((slab_h, wp2), jnp.float32),  # inv static copy
                pltpu.VMEM((slab_h, wp2), jnp.uint8),  # mask static copy
            ] if (static_copy and not prefetch) else []) + [
                pltpu.VMEM((n_strips, slab_h, wp2), jnp.uint8),  # mask arena
                pltpu.VMEM((n_strips, slab_h, wp2), jnp.float32),  # bh arena
                pltpu.VMEM((n_strips, slab_h, wp2), jnp.float32),  # bv arena
                pltpu.VMEM((n_strips, slab_h, wp2), jnp.float32),  # inv arena
                pltpu.SemaphoreType.DMA((16,)),
            ],
            input_output_aliases={2: 0, 3: 1},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=min(
                    _arena_bytes(wp2, slab_h, n_strips, static_copy)
                    + 8 * 1024 * 1024,
                    vmem_cap,
                ),
            ),
        )
        return lambda om, n, *rest: call(
            om.T, jnp.asarray(n, jnp.int32).reshape(1), *rest
        )
    slab_h = block_h + 2 * pad_rows
    n_blocks = -(-iters // k)
    kern = functools.partial(
        _strip_mega_kernel, k, pad_rows, block_h, n_strips
    )
    call = pl.pallas_call(
        kern,
        grid=(n_blocks, n_strips),
        out_shape=(
            jax.ShapeDtypeStruct((2, hp, wp2), jnp.float32),  # u ping-pong
            jax.ShapeDtypeStruct((2, hp, wp2), jnp.float32),  # prev ping-pong
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # omegas (3, n_blocks*k)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # active count (1,)
            pl.BlockSpec(memory_space=pl.ANY),  # u ping-pong (aliased)
            pl.BlockSpec(memory_space=pl.ANY),  # prev ping-pong (aliased)
            pl.BlockSpec(memory_space=pl.ANY),  # mask
            pl.BlockSpec(memory_space=pl.ANY),  # bh
            pl.BlockSpec(memory_space=pl.ANY),  # bv
            pl.BlockSpec(memory_space=pl.ANY),  # inv
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # u slab
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # prev slab
            pltpu.VMEM((slab_h, wp2), jnp.uint8),  # mask slab
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # bh slab
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # bv slab
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # inv slab
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # wl slab (rolled bh)
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # wu slab (rolled bv)
            pltpu.SemaphoreType.DMA((8,)),
        ],
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    return lambda om, n, *rest: call(
        om.T, jnp.asarray(n, jnp.int32).reshape(1), *rest
    )


def _auto_block_h(h: int, deep_block: bool = False, w: int | None = None) -> int:
    """Strip height with the strip count ROUNDED so the ragged last strip is
    absorbed instead of padded (1080 -> 4x272, 0.7% pad rows). Round-3 K=32
    interleaved A/Bs moved the sweet spot from 128-row to ~256-row strips at
    EVERY level — each block recomputes pad_rows of halo per strip, so
    halving the strip count halves that redundancy (L1 540 rows: 2x272 =
    0.606 vs 4x136 = 0.731 ms; L0 1080: 4x272 beats 8x136 at both k=8 and
    k=12; rb megakernel: 2.53 -> 2.21 / 1.29 -> 1.21; 4K uarena 8x272 =
    4.8-5.9 vs 17x128 = 6.3 — the in-kernel weight re-derivation makes 4K's
    halo doubly expensive). Small-footprint levels go further: ONE strip
    (no halo recompute at all beyond the zero pad) when ~15 level-sized f32
    slabs fit 64 MiB of VMEM — L1 1x544 = 0.539 vs 2x272 = 0.611 ms,
    bit-identical. Taller multi-strip geometries LOSE everywhere measured
    (1080: 2x544 = 1.51; 4K: 360/544-row strips = 9.4/9.5 — VMEM slab
    pressure / fallback-gate trips). ``deep_block`` is kept for call-site
    symmetry; all branches share the 256-row multi-strip target."""
    del deep_block
    if w is not None:
        wp2 = -(-(w + 2) // 128) * 128
        if (h + 48) * wp2 * 4 * 15 <= 64 * 1024 * 1024:
            return -(-h // 8) * 8
    n = max(2, (h + 128) // 256)
    return -(-(-(-h // n)) // 8) * 8


def _plan_strips(h, w, cfg, block_h=None):
    """Strip-kernel geometry + route choice, shared by the fixed-iteration
    and early-exit runners: (k, pad_rows, wp2, block_h, n_strips, hp,
    arena, uarena, static_copy, cap)."""
    deep_block = h <= cfg.pallas_small_level_rows
    if block_h is None:
        block_h = _auto_block_h(h, deep_block, w=w)
    k = max(int(cfg.pallas_iter_block), 1)
    if deep_block:
        # Short levels amortize per-step overhead better with deeper blocks
        # (config docstring has the measurements).
        k = max(k, int(cfg.pallas_iter_block_small))

    # pad_rows = ceil((k+1)/8)*8 keeps every DMA slice offset/shape aligned
    # to the f32 sublane tile; wp2 rounds the padded width to the lane tile.
    pad_rows = -(-(k + 1) // 8) * 8
    wp2 = -(-(w + 2) // 128) * 128

    def geometry(bh_rows):
        n = -(-h // bh_rows)
        return bh_rows, n, n * bh_rows + 2 * pad_rows

    # Weight-arena variant when the invariant planes fit VMEM (~13 bytes/px
    # of level; true through 1080p): mask/bh/bv/inv are DMA'd once per strip
    # instead of once per grid step. When the f32 arena overflows (4K+), the
    # derived-weights u8 arena (~3 bytes/px; weights materialized in-kernel)
    # keeps the level on the megakernel fast path; only if even that
    # overflows does the per-step-DMA fallback run.
    block_h, n_strips, hp = geometry(block_h)
    static_copy = bool(cfg.pallas_arena_static_copy)
    cap = int(cfg.pallas_arena_vmem_cap)
    arena = (
        _arena_bytes(wp2, block_h + 2 * pad_rows, n_strips, static_copy) <= cap
    )
    uarena = (
        not arena
        and _uarena_bytes(wp2, block_h + 2 * pad_rows, n_strips) <= cap
    )
    if uarena and int(cfg.pallas_iter_block_uarena) > k:
        # Deeper iteration block on the derived-weights route: the per-step
        # weight materialization amortizes over k sweeps (config.py carries
        # the 4K A/B). Re-derive the halo geometry and keep the bump only if
        # the arena still fits with the (possibly) taller slabs.
        k2 = int(cfg.pallas_iter_block_uarena)
        pr2 = -(-(k2 + 1) // 8) * 8
        if _uarena_bytes(wp2, block_h + 2 * pr2, n_strips) <= cap:
            k, pad_rows = k2, pr2
            block_h, n_strips, hp = geometry(block_h)
    if not (arena or uarena):
        # The per-step-DMA fallback runs under the default 16 MiB scoped-VMEM
        # budget (the arena kernels request their own limit); clamp block_h
        # so its 8 slabs + ~3 slab-sized Mosaic temporaries fit.
        max_block = (14 * 1024 * 1024) // (11 * 4 * wp2) - 2 * pad_rows
        block_h, n_strips, hp = geometry(
            max(min(block_h, (max_block // 8) * 8), 8)
        )
    return k, pad_rows, wp2, block_h, n_strips, hp, arena, uarena, static_copy, cap


def solve_level_strips(
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    gray: jnp.ndarray,
    level: int,
    max_level: int,
    iters: int,
    cfg: DiffusionConfig = DiffusionConfig(),
    block_h: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Strip-blocked solve: ALL iterations in one megakernel launch."""
    h, w = depth.shape
    (k, pad_rows, wp2, block_h, n_strips, hp,
     arena, uarena, static_copy, cap) = _plan_strips(h, w, cfg, block_h)

    def repad(a, dtype=jnp.float32):
        core = a[1 : h + 1, :]  # (h, w+2) keep the column ring
        return jnp.pad(
            core.astype(dtype),
            ((pad_rows, hp - h - pad_rows), (0, wp2 - (w + 2))),
        )

    u = repad(jnp.pad(depth.astype(jnp.float32), ((1, 1), (1, 1))))
    m = repad(jnp.pad(mask.astype(jnp.uint8), ((1, 1), (1, 1))), jnp.uint8)

    # Ping-pong state: copy 0 = seeded input / zero Chebyshev history; copy 1
    # is fully written by block 0 before any read. Both copies' halo bands
    # are zero here and stay zero (the kernel writes interior rows only).
    u_pp = jnp.stack([u, jnp.zeros_like(u)])
    p_pp = jnp.zeros((2, hp, wp2), jnp.float32)

    n_blocks = -(-iters // k)
    om = np.zeros((n_blocks * k, 3), np.float32)
    om[:iters] = _abc_schedule(iters, cfg)

    if uarena:
        g8 = repad(jnp.pad(gray.astype(jnp.uint8), ((1, 1), (1, 1))), jnp.uint8)
        d8 = repad(
            jnp.pad(
                jnp.clip(depth, 0.0, 255.0).astype(jnp.uint8), ((1, 1), (1, 1))
            ),
            jnp.uint8,
        )
        call = _strips_mega_call_uarena(
            hp, wp2, k, iters, pad_rows, n_strips, block_h,
            h, w, float(cfg.beta),
            0 if level == 0 else int(cfg.depth_edge_threshold),
            level != max_level, interpret, cap,
        )
        u_pp, p_pp = call(jnp.asarray(om), iters, u_pp, p_pp, m, g8, d8)
        return u_pp[n_blocks % 2, pad_rows : pad_rows + h, 1 : w + 1]

    bh, bv, inv = _pack_weights_padded(gray, depth, level, max_level, cfg)
    bh = repad(bh)
    bv = repad(bv)
    inv = repad(inv)

    # State prefetch needs >= 4 strips and block_h >= pad_rows (the in-flight
    # writeback / cross-block overlap analysis in the kernel docstring).
    prefetch = (
        cfg.pallas_state_prefetch
        and arena
        and n_strips >= 4
        and block_h >= pad_rows
    )
    call = _strips_mega_call(
        hp, wp2, k, iters, pad_rows, n_strips, block_h, interpret,
        arena=arena, prefetch=prefetch, static_copy=static_copy, vmem_cap=cap,
    )
    u_pp, p_pp = call(jnp.asarray(om), iters, u_pp, p_pp, m, bh, bv, inv)
    fin = n_blocks % 2
    return u_pp[fin, pad_rows : pad_rows + h, 1 : w + 1]


def solve_level_strips_early_exit(
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    gray: jnp.ndarray,
    level: int,
    max_level: int,
    iters: int,
    cfg: DiffusionConfig = DiffusionConfig(),
    interpret: bool = False,
) -> jnp.ndarray:
    """Residual-tolerance early exit for the reference solver
    (jacobi_chebyshev) on the Pallas path — honoring the tolerance the
    reference accepts but ignores (src/main.cpp:264).

    The strip megakernel's chunk boundary is the natural check cadence: a
    ``lax.while_loop`` re-launches ONE pre-built megakernel per
    ``residual_check_every``-iteration chunk, carrying the (u, prev)
    Chebyshev state in the kernel's padded ping-pong layout between chunks
    (pure DMA copies — bit-preserving), with the omega schedule
    dynamic-sliced from the full per-iteration table so the Wang recurrence
    continues seamlessly across chunks. The chunk's grid is rounded up to an
    EVEN number of iteration blocks (a fully-masked block copies state
    src -> dst without sweeping), so every chunk lands its state back in
    ping-pong copy 0 and the next launch reads where the last one wrote.
    The final chunk's active count rides the kernels' SMEM scalar, so the
    iteration cap is never exceeded and — with an unreachable tolerance —
    the sweep sequence is exactly the fixed-iteration kernel's
    (tests/test_pallas.py pins bitwise equality under interpret).

    All levels route through the strip megakernel here (the resident
    kernel's mid-band advantage is ~0.07 ms/level and it would need its own
    prev-carry plumbing); the weight planes/arena sources are computed once
    outside the loop from the INCOMING depth, matching loadIndexToWeight
    running once per level (src/GPUSolver.cu:293).
    """
    from ..core import solver as _xla

    h, w = depth.shape
    u0 = depth.astype(jnp.float32)
    if iters <= 0:
        return u0
    (k, pad_rows, wp2, block_h, n_strips, hp,
     arena, uarena, static_copy, cap) = _plan_strips(h, w, cfg)

    chunk = max(int(cfg.residual_check_every), 1)
    n_blocks_c = -(-chunk // k)
    if n_blocks_c % 2:
        n_blocks_c += 1  # even block count: state ends in copy 0 every chunk
    chunk_pad = n_blocks_c * k

    wts = edge_weights(gray, depth, level, max_level, cfg)
    res_fn = _xla.residual_metric_fn(cfg)
    tol = jnp.float32(cfg.tolerance) * jnp.float32(255.0)

    def repad(a, dtype=jnp.float32):
        core = a[1 : h + 1, :]  # (h, w+2) keep the column ring
        return jnp.pad(
            core.astype(dtype),
            ((pad_rows, hp - h - pad_rows), (0, wp2 - (w + 2))),
        )

    u = repad(jnp.pad(u0, ((1, 1), (1, 1))))
    m = repad(jnp.pad(mask.astype(jnp.uint8), ((1, 1), (1, 1))), jnp.uint8)

    # Omega schedule over-padded by one chunk so the dynamic slice at any
    # start index i < iters stays in-bounds; entries past an active count
    # are never applied (masked sweeps).
    om_np = np.zeros((iters + chunk_pad, 3), np.float32)
    om_np[:iters] = _abc_schedule(iters, cfg)
    om_all = jnp.asarray(om_np)

    if uarena:
        g8 = repad(jnp.pad(gray.astype(jnp.uint8), ((1, 1), (1, 1))), jnp.uint8)
        d8 = repad(
            jnp.pad(
                jnp.clip(depth, 0.0, 255.0).astype(jnp.uint8), ((1, 1), (1, 1))
            ),
            jnp.uint8,
        )
        call = _strips_mega_call_uarena(
            hp, wp2, k, chunk_pad, pad_rows, n_strips, block_h,
            h, w, float(cfg.beta),
            0 if level == 0 else int(cfg.depth_edge_threshold),
            level != max_level, interpret, cap,
        )
        extras = (m, g8, d8)
    else:
        bh, bv, inv = _pack_wts_padded(wts)
        extras = (m, repad(bh), repad(bv), repad(inv))
        call = _strips_mega_call(
            hp, wp2, k, chunk_pad, pad_rows, n_strips, block_h, interpret,
            arena=arena, prefetch=False, static_copy=static_copy,
            vmem_cap=cap,
        )

    u_pp0 = jnp.stack([u, jnp.zeros_like(u)])
    p_pp0 = jnp.zeros((2, hp, wp2), jnp.float32)

    def u_view(u_pp):
        return u_pp[0, pad_rows : pad_rows + h, 1 : w + 1]

    def cond(state):
        u_pp, p_pp, i, res = state
        return (i < iters) & (res >= tol)

    def body(state):
        u_pp, p_pp, i, _ = state
        n = jnp.minimum(jnp.int32(chunk), jnp.int32(iters) - i)
        om = lax.dynamic_slice(om_all, (i, jnp.int32(0)), (chunk_pad, 3))
        u_pp, p_pp = call(om, n, u_pp, p_pp, *extras)
        return u_pp, p_pp, i + n, res_fn(u_view(u_pp), mask, wts)

    u_pp, p_pp, i, res = lax.while_loop(
        cond, body, (u_pp0, p_pp0, jnp.int32(0), jnp.float32(jnp.inf))
    )
    return u_view(u_pp)


def solve_level_pallas(
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    gray: jnp.ndarray,
    level: int,
    max_level: int,
    iters: int,
    cfg: DiffusionConfig = DiffusionConfig(),
    interpret: bool = False,
) -> jnp.ndarray:
    """Choose resident vs strip kernel by VMEM footprint AND level size.

    The resident kernel wins only in a middle band (K=16 interleaved on
    v5e, round 3): tiny levels are LATENCY-bound and the strip megakernel's
    in-block value chaining skips the resident kernel's per-sweep VMEM
    round-trip (L3 135x240/500it: 0.118 vs 0.292 ms; L4 67x120/1000it:
    0.221 vs 0.327), while at throughput-bound mid sizes the resident
    kernel's lack of halo/pad waste wins (L2 270x480/250it: 0.318 vs
    0.383). Above the VMEM budget only strips fit (and win anyway).

    With ``cfg.early_exit`` every level takes the chunked strip runner
    (solve_level_strips_early_exit) regardless of size."""
    if cfg.early_exit:
        return solve_level_strips_early_exit(
            depth, mask, gray, level, max_level, iters, cfg, interpret
        )
    h, w = depth.shape
    # ~6 f32 planes live in the resident kernel.
    fits = (h + 2) * (w + 2) * 4 * 6 <= cfg.pallas_resident_vmem_budget
    if fits and h * w >= int(cfg.pallas_resident_min_px):
        return solve_level_resident(
            depth, mask, gray, level, max_level, iters, cfg, interpret
        )
    return solve_level_strips(
        depth, mask, gray, level, max_level, iters, cfg, interpret=interpret
    )


# ---------------------------------------------------------------------------
# Red-black Gauss-Seidel kernels (BASELINE config #2 on the fast path)
# ---------------------------------------------------------------------------


def _rb_iter_full(u, wl, bh, wu, bv, inv, mask_u8, red, om_r, om_b):
    """One red-black iteration over a full padded block: red cells take the
    clipped weighted average of the current state over-relaxed by ``om_r``
    (PROJECTED SOR: clip(u + omega*(avg - u), 0, 255); plain Gauss-Seidel
    at omega == 1), then black cells of the half-updated state with
    ``om_b`` — the Pallas twin of core.solver.red_black_iter (same op
    order, same clamp points). The omegas follow core.solver.rb_omegas
    (cyclic Chebyshev)."""
    # Mosaic rejects vector cmpi on i8 ("target does not support this
    # comparison"); widen the mask before the equality.
    free = mask_u8.astype(jnp.int32) == 0

    def half(u, sel, om):
        hh, ww = u.shape
        ul = pltpu.roll(u, 1, 1)
        ur = pltpu.roll(u, ww - 1, 1)
        uu = pltpu.roll(u, 1, 0)
        ud = pltpu.roll(u, hh - 1, 0)
        r = jnp.clip((wl * ul + bh * ur + wu * uu + bv * ud) * inv, 0.0, 255.0)
        return jnp.where(sel & free, jnp.clip(u + om * (r - u), 0.0, 255.0), u)

    u = half(u, red, om_r)
    return half(u, jnp.logical_not(red), om_b)


def _red_mask(shape, row0, parity):
    """Checkerboard (True at red) for a block whose padded-global origin is
    (row0, 0); ``parity`` statically folds the pad offsets so red matches the
    UNPADDED (y+x) even rule of core.solver.red_black_parity."""
    yy = lax.broadcasted_iota(jnp.int32, shape, 0)
    xx = lax.broadcasted_iota(jnp.int32, shape, 1)
    return ((yy + xx + row0 + parity) % 2) == 0


def _resident_rb_kernel(iters, parity, om_ref, m_ref, bh_ref, bv_ref, inv_ref,
                        u_ref, out_ref, wl_scr, wu_scr):
    """All `iters` red-black iterations with every plane VMEM-resident.
    u_ref is aliased to out_ref; omegas ride in SMEM (rb_omegas table)."""
    del u_ref
    wl_scr[:] = pltpu.roll(bh_ref[:], 1, 1)
    wu_scr[:] = pltpu.roll(bv_ref[:], 1, 0)
    red = _red_mask(out_ref.shape, 0, parity)

    def body(i, _):
        out_ref[:] = _rb_iter_full(
            out_ref[:], wl_scr[:], bh_ref[:], wu_scr[:], bv_ref[:],
            inv_ref[:], m_ref[:], red, om_ref[0, i], om_ref[1, i],
        )
        return 0

    lax.fori_loop(0, iters, body, 0, unroll=False)


def _rb_resident_call(depth, mask, bh, bv, inv, om, iters, interpret):
    h, w = depth.shape
    up = jnp.pad(depth.astype(jnp.float32), ((1, 1), (1, 1)))
    mp = jnp.pad(mask.astype(jnp.uint8), ((1, 1), (1, 1)), constant_values=1)
    # (1,1) pad offsets cancel in (y+x) parity -> offset 0.
    kernel = functools.partial(_resident_rb_kernel, iters, 0)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h + 2, w + 2), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # omegas (2, iters)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bh
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # inv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # u (aliased to out)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2), jnp.float32),  # wl
            pltpu.VMEM((h + 2, w + 2), jnp.float32),  # wu
        ],
        input_output_aliases={5: 0},
        interpret=interpret,
    )(jnp.asarray(om).T, mp, bh, bv, inv, up)
    return out[1 : h + 1, 1 : w + 1]


def _strip_rb_kernel(k, pad_rows, block_h, n_strips, parity, in_kernel_halo,
                     om_ref, u_hbm, m_hbm, bh_hbm, bv_hbm, inv_hbm, uo_hbm,
                     u_s, m_s, bh_s, bv_s, inv_s, wl_s, wu_s, sems):
    """Strip-blocked red-black: same slab DMA structure as _strip_kernel but
    one red-black iteration advances the dependency cone TWO rings (black
    reads red-updated neighbors), so the caller sizes pad_rows >= 2k+1. No
    Chebyshev history plane."""
    s = pl.program_id(0)
    row0 = s * block_h
    slab_h = block_h + 2 * pad_rows

    def dma_in(dst, src, slot):
        cp = pltpu.make_async_copy(src.at[pl.ds(row0, slab_h), :], dst, sems.at[slot])
        cp.start()
        return cp

    cps = [
        dma_in(u_s, u_hbm, 0),
        dma_in(m_s, m_hbm, 1),
        dma_in(bh_s, bh_hbm, 2),
        dma_in(bv_s, bv_hbm, 3),
        dma_in(inv_s, inv_hbm, 4),
    ]
    for cp in cps:
        cp.wait()

    wl_s[:] = pltpu.roll(bh_s[:], 1, 1)
    wu_s[:] = pltpu.roll(bv_s[:], 1, 0)
    red = _red_mask(u_s.shape, row0, parity)

    def body(i, _):
        u_s[:] = _rb_iter_full(
            u_s[:], wl_s[:], bh_s[:], wu_s[:], bv_s[:], inv_s[:], m_s[:], red,
            om_ref[0, i], om_ref[1, i],
        )
        return 0

    lax.fori_loop(0, k, body, 0, unroll=False)

    uo = pltpu.make_async_copy(
        u_s.at[pl.ds(pad_rows, block_h), :],
        uo_hbm.at[pl.ds(row0 + pad_rows, block_h), :], sems.at[5],
    )
    uo.start()
    uo.wait()

    if not in_kernel_halo:
        return

    # Boundary strips emit the (provably still-zero) global halo bands so the
    # fresh output buffer is complete — same argument as _strip_kernel.
    @pl.when(s == 0)
    def _write_top():
        tu = pltpu.make_async_copy(
            u_s.at[pl.ds(0, pad_rows), :], uo_hbm.at[pl.ds(0, pad_rows), :],
            sems.at[6],
        )
        tu.start()
        tu.wait()

    @pl.when(s == n_strips - 1)
    def _write_bottom():
        bu = pltpu.make_async_copy(
            u_s.at[pl.ds(pad_rows + block_h, pad_rows), :],
            uo_hbm.at[pl.ds(row0 + pad_rows + block_h, pad_rows), :],
            sems.at[6],
        )
        bu.start()
        bu.wait()


def _rb_strip_mega_kernel(k, iters, pad_rows, block_h, n_strips, parity,
                          om_ref, u_in, m_hbm, bh_hbm, bv_hbm, inv_hbm,
                          u_pp, u_s, wl_s, wu_s, m_a, bh_a, bv_a, inv_a, sems):
    """Red-black megakernel: ALL iterations in one pallas_call, the red-black
    twin of _strip_mega_kernel_arena. Grid (iteration blocks, strips) with
    blocks outer; state ping-pongs between the halves of a (2, hp, wp2)
    buffer by block parity; halo bands are zeroed once by the caller and
    never written (the kernel writes interior rows only), so there is no
    fix_halo pass and no per-chunk launch. The four invariant planes load
    into a persistent VMEM arena during block 0. pad_rows >= 2k+1: one
    red-black iteration advances the dependency cone TWO rings (black reads
    red-updated neighbors). Remainder iterations of the last block are
    masked in-kernel (a masked iteration leaves the state untouched)."""
    del u_in  # aliased: u_pp IS the state buffer
    b = pl.program_id(0)
    s = pl.program_id(1)
    src = b % 2
    dst = 1 - src
    row0 = s * block_h
    slab_h = block_h + 2 * pad_rows

    cp = pltpu.make_async_copy(
        u_pp.at[src, pl.ds(row0, slab_h), :], u_s, sems.at[0]
    )
    cp.start()

    @pl.when(b == 0)
    def _fill_arena():
        wps = [
            pltpu.make_async_copy(m_hbm.at[pl.ds(row0, slab_h), :], m_a.at[s], sems.at[2]),
            pltpu.make_async_copy(bh_hbm.at[pl.ds(row0, slab_h), :], bh_a.at[s], sems.at[3]),
            pltpu.make_async_copy(bv_hbm.at[pl.ds(row0, slab_h), :], bv_a.at[s], sems.at[4]),
            pltpu.make_async_copy(inv_hbm.at[pl.ds(row0, slab_h), :], inv_a.at[s], sems.at[5]),
        ]
        for w in wps:
            w.start()
        for w in wps:
            w.wait()

    cp.wait()

    wl_s[:] = pltpu.roll(bh_a[s], 1, 1)
    wu_s[:] = pltpu.roll(bv_a[s], 1, 0)
    red = _red_mask(u_s.shape, row0, parity)
    base = b * k

    def body(i, _):
        @pl.when(base + i < iters)
        def _active():
            u_s[:] = _rb_iter_full(
                u_s[:], wl_s[:], bh_a[s], wu_s[:], bv_a[s], inv_a[s],
                m_a[s], red, om_ref[0, base + i], om_ref[1, base + i],
            )

        return 0

    lax.fori_loop(0, k, body, 0, unroll=False)

    uo = pltpu.make_async_copy(
        u_s.at[pl.ds(pad_rows, block_h), :],
        u_pp.at[dst, pl.ds(row0 + pad_rows, block_h), :], sems.at[1],
    )
    uo.start()
    uo.wait()


def _rb_strips_mega_call(hp, wp2, k, iters, pad_rows, n_strips, block_h,
                         interpret, vmem_cap=112 * 1024 * 1024):
    slab_h = block_h + 2 * pad_rows
    n_blocks = -(-iters // k)
    # parity: rows shifted by pad_rows (multiple of 8, even), cols by the
    # 1-px ring -> net +1 in (y+x).
    kern = functools.partial(
        _rb_strip_mega_kernel, k, iters, pad_rows, block_h, n_strips, 1
    )
    call = pl.pallas_call(
        kern,
        grid=(n_blocks, n_strips),
        out_shape=jax.ShapeDtypeStruct((2, hp, wp2), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # omegas (2, n_blocks*k)
            pl.BlockSpec(memory_space=pl.ANY),  # u ping-pong (aliased)
            pl.BlockSpec(memory_space=pl.ANY),  # mask
            pl.BlockSpec(memory_space=pl.ANY),  # bh
            pl.BlockSpec(memory_space=pl.ANY),  # bv
            pl.BlockSpec(memory_space=pl.ANY),  # inv
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # u slab
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # wl slab (rolled bh)
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # wu slab (rolled bv)
            pltpu.VMEM((n_strips, slab_h, wp2), jnp.uint8),  # mask arena
            pltpu.VMEM((n_strips, slab_h, wp2), jnp.float32),  # bh arena
            pltpu.VMEM((n_strips, slab_h, wp2), jnp.float32),  # bv arena
            pltpu.VMEM((n_strips, slab_h, wp2), jnp.float32),  # inv arena
            pltpu.SemaphoreType.DMA((6,)),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=min(
                _arena_bytes(wp2, slab_h, n_strips) + 8 * 1024 * 1024,
                vmem_cap,
            ),
        ),
    )
    return lambda om, *rest: call(om.T, *rest)


def _rb_compact_quadrant_weights(bh_q, bv_q):
    """Left/up pair weights per quadrant, derived from the right/down
    quadrant planes by static cross-quadrant rolls.

    With quadrants q00=a[0::2,0::2], q01=a[0::2,1::2], q10=a[1::2,0::2],
    q11=a[1::2,1::2] and bh[y,x] = weight of pair ((y,x),(y,x+1)):
    wl at (2i,2j) is bh[2i,2j-1] = bh01[i,j-1], etc. Wraparound lands on
    zero-padded lanes/halo rows (the callers' zero-weight guard ring)."""
    bh00, bh01, bh10, bh11 = bh_q
    bv00, bv01, bv10, bv11 = bv_q
    wl = (pltpu.roll(bh01, 1, 1), bh00, pltpu.roll(bh11, 1, 1), bh10)
    wu = (pltpu.roll(bv10, 1, 0), pltpu.roll(bv11, 1, 0), bv00, bv01)
    return wl, wu


def _rb_compact_iter(u_q, wl_q, bh_q, wu_q, bv_q, inv_q, free_q,
                     om_r=1.0, om_b=1.0):
    """One red-black Gauss-Seidel iteration on quadrant-COMPACTED planes:
    red cells are quadrants (0,0) and (1,1) of the checkerboard, black are
    (0,1) and (1,0); each color's update computes ONLY its own quarter
    planes (reading the other color's), so a full iteration costs one
    full-plane relaxation instead of the masked formulation's two
    (VERDICT round-2 weak #1: _rb_iter_full evaluates the full weighted
    average twice and discards half each time).

    Same op order and clamp points as core.solver.red_black_iter /
    jacobi_sweep, so the iterate agrees to float-associativity noise
    (the suite's 5e-3 red-black parity band); not bit-identical because
    XLA fuses the 4-term dot differently across the two program shapes."""
    u00, u01, u10, u11 = u_q

    def upd(q, uc, ul, ur, uu, ud, om):
        s = wl_q[q] * ul + bh_q[q] * ur + wu_q[q] * uu + bv_q[q] * ud
        r = jnp.clip(s * inv_q[q], 0.0, 255.0)
        return jnp.where(
            free_q[q], jnp.clip(uc + om * (r - uc), 0.0, 255.0), uc
        )

    def rol(a, ax):  # value at index-1 (left/up neighbor)
        return pltpu.roll(a, 1, ax)

    def ror(a, ax):  # value at index+1 (right/down neighbor)
        return pltpu.roll(a, a.shape[ax] - 1, ax)

    # red: (0,0) reads black (0,1)/(1,0); (1,1) reads (1,0)/(0,1)
    n00 = upd(0, u00, rol(u01, 1), u01, rol(u10, 0), u10, om_r)
    n11 = upd(3, u11, u10, ror(u10, 1), u01, ror(u01, 0), om_r)
    # black: reads the UPDATED red quadrants (Gauss-Seidel half-step)
    n01 = upd(1, u01, n00, ror(n00, 1), rol(n11, 0), n11, om_b)
    n10 = upd(2, u10, rol(n11, 1), n11, n00, ror(n00, 0), om_b)
    return n00, n01, n10, n11


def _rb_compact_mega_kernel(k, iters, pad_rows, block_h, n_strips,
                            om_ref, u_in, m_hbm, bh_hbm, bv_hbm, inv_hbm,
                            u_pp, u_s, wl_s, wu_s, m_a, bh_a, bv_a, inv_a,
                            sems):
    """Quadrant-compacted red-black megakernel: ALL iterations in one
    pallas_call over quarter-resolution planes stacked (4, hqp, wq2).
    Structure mirrors _rb_strip_mega_kernel (block-outer grid, ping-pong
    state halves, persistent weight arena filled at block 0) but each
    iteration does HALF the arithmetic: one quarter-plane update per
    quadrant per color instead of two masked full-plane relaxations.

    Halo: one red-black iteration advances the dependency cone ONE quarter
    ring (red reads black at +/-1, black reads updated red at +/-1 — two
    full-resolution rings = one compact ring), so pad_rows >= k+1 in
    quarter rows, half the masked megakernel's 2k+1 full-row halo.
    Roll wraparound only corrupts the outermost slab rows/lanes, absorbed
    by the halo exactly like _strip_mega_kernel_arena."""
    del u_in  # aliased: u_pp IS the state buffer
    b = pl.program_id(0)
    s = pl.program_id(1)
    src = b % 2
    dst = 1 - src
    row0 = s * block_h
    slab_h = block_h + 2 * pad_rows

    cps = [
        pltpu.make_async_copy(
            u_pp.at[src, q, pl.ds(row0, slab_h), :], u_s.at[q], sems.at[0]
        )
        for q in range(4)
    ]
    for cp in cps:
        cp.start()

    @pl.when(b == 0)
    def _fill_arena():
        wps = []
        for q in range(4):
            for hbm, ar, slot in (
                (m_hbm, m_a, 1), (bh_hbm, bh_a, 2),
                (bv_hbm, bv_a, 3), (inv_hbm, inv_a, 4),
            ):
                wps.append(pltpu.make_async_copy(
                    hbm.at[q, pl.ds(row0, slab_h), :], ar.at[s, q],
                    sems.at[slot],
                ))
        for cp in wps:
            cp.start()
        for cp in wps:
            cp.wait()

    for cp in cps:
        cp.wait()

    wl_q, wu_q = _rb_compact_quadrant_weights(
        tuple(bh_a[s, q] for q in range(4)),
        tuple(bv_a[s, q] for q in range(4)),
    )
    for q in range(4):
        wl_s[q] = wl_q[q]
        wu_s[q] = wu_q[q]
    base = b * k

    def body(i, _):
        @pl.when(base + i < iters)
        def _active():
            # Arena planes are read PER USE inside the loop body (never
            # hoisted to values outside the fori_loop): a hoisted
            # ``bh_a[s, q]`` value materializes a quarter-slab copy that
            # Mosaic keeps live across the whole loop — 12 such slabs made
            # the first implementation ~3.7x slower than the masked kernel
            # (9.0 vs 2.4 ms at 1080p, tools/ab_rb.py) before this form.
            free_q = tuple(
                m_a[s, q].astype(jnp.int32) == 0 for q in range(4)
            )
            n = _rb_compact_iter(
                tuple(u_s[q] for q in range(4)),
                tuple(wl_s[q] for q in range(4)),
                tuple(bh_a[s, q] for q in range(4)),
                tuple(wu_s[q] for q in range(4)),
                tuple(bv_a[s, q] for q in range(4)),
                tuple(inv_a[s, q] for q in range(4)),
                free_q, om_ref[0, base + i], om_ref[1, base + i],
            )
            for q in range(4):
                u_s[q] = n[q]

        return 0

    lax.fori_loop(0, k, body, 0, unroll=False)

    ops = [
        pltpu.make_async_copy(
            u_s.at[q, pl.ds(pad_rows, block_h), :],
            u_pp.at[dst, q, pl.ds(row0 + pad_rows, block_h), :],
            sems.at[5],
        )
        for q in range(4)
    ]
    for cp in ops:
        cp.start()
    for cp in ops:
        cp.wait()


def _rb_compact_bytes(wq2, slab_h, n_strips):
    """VMEM bytes for the compact megakernel: per-strip arena of 4 quadrant
    planes x (mask u8 + bh/bv/inv f32) = 13 bytes per quarter px, plus a
    working set of 4 state + 8 derived-weight scratch slabs and ~14
    slab-sized Mosaic temporaries for the quadrant updates."""
    arena = n_strips * 4 * slab_h * wq2 * 13
    working = 26 * 4 * slab_h * wq2  # (4 + 8 + 14) f32 quadrant slabs
    return arena + working


def _rb_compact_mega_call(hqp, wq2, k, iters, pad_rows, n_strips, block_h,
                          interpret, vmem_cap=112 * 1024 * 1024):
    slab_h = block_h + 2 * pad_rows
    n_blocks = -(-iters // k)
    kern = functools.partial(
        _rb_compact_mega_kernel, k, iters, pad_rows, block_h, n_strips
    )
    call = pl.pallas_call(
        kern,
        grid=(n_blocks, n_strips),
        out_shape=jax.ShapeDtypeStruct((2, 4, hqp, wq2), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # omegas (2, n_blocks*k)
            pl.BlockSpec(memory_space=pl.ANY),  # u ping-pong (aliased)
            pl.BlockSpec(memory_space=pl.ANY),  # mask quadrants u8
            pl.BlockSpec(memory_space=pl.ANY),  # bh quadrants
            pl.BlockSpec(memory_space=pl.ANY),  # bv quadrants
            pl.BlockSpec(memory_space=pl.ANY),  # inv quadrants
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, slab_h, wq2), jnp.float32),  # u quadrants
            pltpu.VMEM((4, slab_h, wq2), jnp.float32),  # wl quadrants
            pltpu.VMEM((4, slab_h, wq2), jnp.float32),  # wu quadrants
            pltpu.VMEM((n_strips, 4, slab_h, wq2), jnp.uint8),  # mask arena
            pltpu.VMEM((n_strips, 4, slab_h, wq2), jnp.float32),  # bh arena
            pltpu.VMEM((n_strips, 4, slab_h, wq2), jnp.float32),  # bv arena
            pltpu.VMEM((n_strips, 4, slab_h, wq2), jnp.float32),  # inv arena
            pltpu.SemaphoreType.DMA((6,)),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=min(
                _rb_compact_bytes(wq2, slab_h, n_strips) + 8 * 1024 * 1024,
                vmem_cap,
            ),
        ),
    )
    return lambda om, *rest: call(om.T, *rest)


def _quad_split(a):
    """(H, W) even-dimensioned plane -> (4, H/2, W/2) checkerboard
    quadrants [a[0::2,0::2], a[0::2,1::2], a[1::2,0::2], a[1::2,1::2]].
    Pure reshape/slice/stack — NO strided scatter/gather (a strided
    ``.at[::2].set`` lowers to lax.scatter when it cannot fuse, which is
    catastrophically slow on TPU: the first merge implementation cost
    ~113 ms/frame at 1080p against the kernel's ~1 ms)."""
    he, we = a.shape
    r = a.reshape(he // 2, 2, we // 2, 2)
    return jnp.stack([r[:, 0, :, 0], r[:, 0, :, 1], r[:, 1, :, 0], r[:, 1, :, 1]])


def _quad_merge(q, h, w):
    """Inverse of _quad_split, cropped to (h, w): reshape/transpose only
    (layout copies, not scatter — see _quad_split)."""
    hq, wq = q.shape[1:]
    m = q.reshape(2, 2, hq, wq).transpose(2, 0, 3, 1).reshape(2 * hq, 2 * wq)
    return m[:h, :w]


def _rb_compact_pallas_iterations(depth, mask, bh1, bv1, inv1, om, iters, cfg,
                                  interpret):
    """`iters` red-black iterations via the quadrant-compacted megakernel:
    split the ring-padded planes into checkerboard quadrants (XLA strided
    slices), run every iteration in one pallas_call, merge back. ``om`` is
    the (iters, 2) rb_omegas table."""
    h, w = depth.shape
    k = max(int(cfg.pallas_iter_block_rb), 1)
    H2, W2 = h + 2, w + 2
    He, We = H2 + (H2 % 2), W2 + (W2 % 2)
    hq, wq = He // 2, We // 2
    pad_rows = -(-(k + 1) // 8) * 8
    wq2 = -(-wq // 128) * 128
    block_h = _auto_block_h(hq)
    n_strips = -(-hq // block_h)
    hqp = n_strips * block_h + 2 * pad_rows

    def prep(a, dtype=jnp.float32):
        # ring-padded (H2, W2) -> even-dim -> quadrants -> (4, hqp, wq2)
        p = jnp.pad(a.astype(dtype), ((0, He - H2), (0, We - W2)))
        q = _quad_split(p)
        return jnp.pad(
            q, ((0, 0), (pad_rows, hqp - hq - pad_rows), (0, wq2 - wq))
        )

    u = prep(jnp.pad(depth.astype(jnp.float32), ((1, 1), (1, 1))))
    m = prep(jnp.pad(mask.astype(jnp.uint8), ((1, 1), (1, 1))), jnp.uint8)
    bh = prep(bh1)
    bv = prep(bv1)
    inv = prep(inv1)

    n_blocks = -(-iters // k)
    u_pp = jnp.stack([u, jnp.zeros_like(u)])
    call = _rb_compact_mega_call(
        hqp, wq2, k, iters, pad_rows, n_strips, block_h, interpret,
        int(cfg.pallas_arena_vmem_cap),
    )
    omp = jnp.pad(om, ((0, n_blocks * k - iters), (0, 0)))
    u_pp = call(omp, u_pp, m, bh, bv, inv)
    q = u_pp[n_blocks % 2, :, pad_rows : pad_rows + hq, :wq]
    return _quad_merge(q, H2, W2)[1 : h + 1, 1 : w + 1]


def _rb_strips_call(hp, wp2, k, pad_rows, n_strips, block_h, interpret,
                    in_kernel_halo=False):
    slab_h = block_h + 2 * pad_rows
    # parity: rows shifted by pad_rows (multiple of 8, even), cols by the
    # 1-px ring -> net +1 in (y+x).
    kern = functools.partial(
        _strip_rb_kernel, k, pad_rows, block_h, n_strips, 1, in_kernel_halo
    )
    call = pl.pallas_call(
        kern,
        grid=(n_strips,),
        out_shape=jax.ShapeDtypeStruct((hp, wp2), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # omegas (2, k)
            pl.BlockSpec(memory_space=pl.ANY),  # u
            pl.BlockSpec(memory_space=pl.ANY),  # mask
            pl.BlockSpec(memory_space=pl.ANY),  # bh
            pl.BlockSpec(memory_space=pl.ANY),  # bv
            pl.BlockSpec(memory_space=pl.ANY),  # inv
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # u slab
            pltpu.VMEM((slab_h, wp2), jnp.uint8),  # mask slab
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # bh slab
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # bv slab
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # inv slab
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # wl slab
            pltpu.VMEM((slab_h, wp2), jnp.float32),  # wu slab
            pltpu.SemaphoreType.DMA((7,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # 7 slabs + the red-mask/half-update temporaries exceed the
            # default 16 MiB scoped budget at block_h=128 (v5e has 128 MiB
            # physical VMEM).
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
    )
    return lambda om, *rest: call(om.T, *rest)


def _rb_pallas_iterations(depth, mask, bh1, bv1, inv1, iters, cfg, interpret,
                          om=None, block_h=None):
    """`iters` red-black iterations on the Pallas path (resident or strips by
    VMEM footprint). Weight planes come 1-px ring-padded (from
    _pack_weights_padded). ``om`` is the (iters, 2) rb_omegas table (built
    from cfg when omitted; callers running chunks of a longer schedule pass
    the chunk's slice). ``block_h`` overrides the strip height (A/B probes).
    Returns the unpadded state."""
    from ..core.solver import rb_omegas

    h, w = depth.shape
    if iters <= 0:
        return depth.astype(jnp.float32)
    if om is None:
        om = jnp.asarray(rb_omegas(iters, cfg))
    # 5 f32 planes live in the resident kernel (no Chebyshev history).
    # Off by default: unlike Jacobi, rb strips won at EVERY measured size
    # (config.py pallas_rb_resident carries the round-3 A/B).
    if (
        cfg.pallas_rb_resident
        and (h + 2) * (w + 2) * 4 * 5 <= cfg.pallas_resident_vmem_budget
    ):
        return _rb_resident_call(
            depth, mask, bh1, bv1, inv1, om, iters, interpret
        )

    if cfg.pallas_rb_compact:
        kq = max(int(cfg.pallas_iter_block_rb), 1)
        hq = (h + 3) // 2  # ceil((h+2)/2)
        wq = (w + 3) // 2
        pr_q = -(-(kq + 1) // 8) * 8
        wq2c = -(-wq // 128) * 128
        bh_q = _auto_block_h(hq)
        ns_q = -(-hq // bh_q)
        if (
            _rb_compact_bytes(wq2c, bh_q + 2 * pr_q, ns_q)
            <= int(cfg.pallas_arena_vmem_cap)
        ):
            return _rb_compact_pallas_iterations(
                depth, mask, bh1, bv1, inv1, om, iters, cfg, interpret
            )

    k = max(int(cfg.pallas_iter_block_rb), 1)
    # Dependencies advance 2 rings per red-black iteration.
    pad_rows = -(-(2 * k + 1) // 8) * 8
    wp2 = -(-(w + 2) // 128) * 128

    def geometry(bh_rows):
        n = -(-h // bh_rows)
        return bh_rows, n, n * bh_rows + 2 * pad_rows

    block_h, n_strips, hp = geometry(block_h or _auto_block_h(h, deep_block=True, w=w))
    cap = int(cfg.pallas_arena_vmem_cap)
    mega = (
        cfg.pallas_rb_megakernel
        and _arena_bytes(wp2, block_h + 2 * pad_rows, n_strips) <= cap
    )
    if not mega:
        # The chunked fallback runs under the default 16 MiB scoped-VMEM
        # budget (the megakernel requests its own limit); clamp block_h so
        # its 7 slabs + Mosaic temporaries fit.
        max_block = (14 * 1024 * 1024) // (10 * 4 * wp2) - 2 * pad_rows
        block_h, n_strips, hp = geometry(
            max(min(block_h, (max_block // 8) * 8), 8)
        )

    def repad(a, dtype=jnp.float32):
        core = a[1 : h + 1, :]
        return jnp.pad(core.astype(dtype), ((pad_rows, hp - h - pad_rows), (0, wp2 - (w + 2))))

    u = repad(jnp.pad(depth.astype(jnp.float32), ((1, 1), (1, 1))))
    m = repad(jnp.pad(mask.astype(jnp.uint8), ((1, 1), (1, 1))), jnp.uint8)
    bh = repad(bh1)
    bv = repad(bv1)
    inv = repad(inv1)

    if mega:
        # Megakernel: all iterations in one launch, weights in a VMEM arena,
        # ping-pong halo bands never dirtied (no fix_halo, no chunking).
        n_blocks = -(-iters // k)
        u_pp = jnp.stack([u, jnp.zeros_like(u)])
        call = _rb_strips_mega_call(
            hp, wp2, k, iters, pad_rows, n_strips, block_h, interpret, cap
        )
        omp = jnp.pad(om, ((0, n_blocks * k - iters), (0, 0)))
        u_pp = call(omp, u_pp, m, bh, bv, inv)
        return u_pp[n_blocks % 2, pad_rows : pad_rows + h, 1 : w + 1]

    def fix_halo(a):
        a = a.at[:pad_rows, :].set(0.0)
        return a.at[hp - pad_rows :, :].set(0.0)

    ikh = bool(cfg.pallas_in_kernel_halo)
    n_full, rem = divmod(iters, k)
    call_k = _rb_strips_call(
        hp, wp2, k, pad_rows, n_strips, block_h, interpret, ikh
    )
    for j in range(n_full):
        u = call_k(om[j * k : (j + 1) * k], u, m, bh, bv, inv)
        if not ikh:
            u = fix_halo(u)
    if rem:
        call_r = _rb_strips_call(
            hp, wp2, rem, pad_rows, n_strips, block_h, interpret, ikh
        )
        u = call_r(om[n_full * k :], u, m, bh, bv, inv)
    return u[pad_rows : pad_rows + h, 1 : w + 1]


def solve_level_red_black_pallas(
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    gray: jnp.ndarray,
    level: int,
    max_level: int,
    iters: int,
    cfg: DiffusionConfig = DiffusionConfig(),
    interpret: bool = False,
) -> jnp.ndarray:
    """Red-black Gauss-Seidel on the Pallas path, with the same optional
    residual-tolerance early exit as core.solver.solve_red_black: full
    ``residual_check_every`` chunks run in the kernels inside a while_loop;
    a truncated final chunk (iters not divisible by the cadence) falls back
    to the XLA iteration with a dynamic trip count, so both paths stop at
    the identical iterate."""
    from ..core import solver as _xla

    wts = edge_weights(gray, depth, level, max_level, cfg)
    bh1, bv1, inv1 = _pack_wts_padded(wts)  # wts also feeds residual_norm
    u0 = depth.astype(jnp.float32)
    if iters <= 0:
        return u0
    om_full = jnp.asarray(_xla.rb_omegas(iters, cfg))

    if not cfg.early_exit:
        return _rb_pallas_iterations(
            depth, mask, bh1, bv1, inv1, iters, cfg, interpret, om=om_full
        )

    h, w = depth.shape
    tol = jnp.float32(cfg.tolerance) * jnp.float32(255.0)
    chunk = max(int(cfg.residual_check_every), 1)
    res_fn = _xla.residual_metric_fn(cfg)

    def cond(state):
        u, i, res = state
        return (i + chunk <= iters) & (res >= tol)

    def body(state):
        u, i, _ = state
        om = lax.dynamic_slice(om_full, (i, 0), (chunk, 2))
        u = _rb_pallas_iterations(
            u, mask, bh1, bv1, inv1, chunk, cfg, interpret, om=om
        )
        return u, i + chunk, res_fn(u, mask, wts)

    u, i, res = lax.while_loop(
        cond, body, (u0, jnp.int32(0), jnp.float32(jnp.inf))
    )
    rem = jnp.maximum(jnp.int32(iters) - i, 0)
    red = _xla.red_black_parity(h, w)

    def xla_tail(u):
        return lax.fori_loop(
            i, jnp.int32(iters),
            lambda j, v: _xla.red_black_iter(
                v, mask, wts, red, om_full[j, 0], om_full[j, 1]
            ),
            u,
        )

    return lax.cond((res >= tol) & (rem > 0), xla_tail, lambda u: u, u)


# ---------------------------------------------------------------------------
# Halo-block kernel: k sweeps on an already-halo-extended local block
# (the multi-chip inner loop — parallel/sharded.py extends each chip's block
# with a k-wide ppermute halo, then runs the k local sweeps here)
# ---------------------------------------------------------------------------


def _halo_block_kernel(k, om_ref, m_ref, bh_ref, bv_ref, inv_ref,
                       u_ref, p_ref, uo_ref, po_ref, wl_scr, wu_scr):
    """k sweeps over a whole extended block resident in VMEM. u/p are
    aliased to uo/po, so the outputs start holding the inputs."""
    del u_ref, p_ref  # aliased into uo_ref/po_ref
    wl_scr[:] = pltpu.roll(bh_ref[:], 1, 1)
    wu_scr[:] = pltpu.roll(bv_ref[:], 1, 0)

    def body(i, _):
        new_u, new_prev = _sweep_full(
            uo_ref[:], po_ref[:], wl_scr[:], bh_ref[:], wu_scr[:],
            bv_ref[:], inv_ref[:], m_ref[:],
            om_ref[0, i], om_ref[1, i], om_ref[2, i],
        )
        po_ref[:] = new_prev
        uo_ref[:] = new_u
        return 0

    lax.fori_loop(0, k, body, 0, unroll=False)


def _halo_block_rb_kernel(k, om_ref, m_ref, bh_ref, bv_ref, inv_ref, red_ref,
                          u_ref, uo_ref, wl_scr, wu_scr):
    """k red-black iterations over a halo-extended block in VMEM. The red
    checkerboard arrives as a plane (u8) because the block's global parity
    origin is only known to the shard_map caller; omegas (2, k) in SMEM."""
    del u_ref  # aliased into uo_ref
    wl_scr[:] = pltpu.roll(bh_ref[:], 1, 1)
    wu_scr[:] = pltpu.roll(bv_ref[:], 1, 0)
    red = red_ref[:].astype(jnp.int32) != 0  # no vector i8 cmp on TPU

    def body(i, _):
        uo_ref[:] = _rb_iter_full(
            uo_ref[:], wl_scr[:], bh_ref[:], wu_scr[:], bv_ref[:],
            inv_ref[:], m_ref[:], red, om_ref[0, i], om_ref[1, i],
        )
        return 0

    lax.fori_loop(0, k, body, 0, unroll=False)


def halo_block_rb_sweeps(u_e, bh_e, bv_e, inv_e, m_e, red_e, om,
                         interpret=False):
    """Run om.shape[0] red-black iterations on a halo-extended block (the
    multi-chip red-black inner loop). ``om`` is the (k, 2) rb_omegas slice
    for these iterations. The caller guarantees halo width >= 2k (each
    iteration's black half-sweep reads red-updated neighbors, so validity
    shrinks two rings per iteration) and crops afterwards."""
    k = om.shape[0]
    shp = u_e.shape
    kern = functools.partial(_halo_block_rb_kernel, k)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(shp, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # omegas (2, k)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bh
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # inv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # red
            pl.BlockSpec(memory_space=pltpu.VMEM),  # u
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(shp, jnp.float32),  # wl
            pltpu.VMEM(shp, jnp.float32),  # wu
        ],
        input_output_aliases={6: 0},
        interpret=interpret,
    )(jnp.asarray(om).T, m_e.astype(jnp.uint8), bh_e, bv_e, inv_e,
      red_e.astype(jnp.uint8), u_e)


def halo_block_sweeps(u_e, p_e, bh_e, bv_e, inv_e, m_e, abc, interpret=False):
    """Run abc.shape[0] Jacobi+Chebyshev sweeps on a halo-extended block.

    All arrays share the extended shape; the caller guarantees halo width >=
    number of sweeps (validity shrinks one ring per sweep) and crops
    afterwards. Returns (u, prev) after the sweeps.
    """
    k = abc.shape[0]
    shp = u_e.shape
    kern = functools.partial(_halo_block_kernel, k)
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(shp, jnp.float32),
            jax.ShapeDtypeStruct(shp, jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # abc (3, k)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bh
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # inv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # u
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prev
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM(shp, jnp.float32),  # wl
            pltpu.VMEM(shp, jnp.float32),  # wu
        ],
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(jnp.asarray(abc).T, m_e.astype(jnp.uint8), bh_e, bv_e, inv_e, u_e, p_e)
