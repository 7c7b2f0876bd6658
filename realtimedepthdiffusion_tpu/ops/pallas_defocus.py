"""Pallas TPU kernel for the defocus/refocus effect (SURVEY.md C16).

The reference's defocus is its slowest kernel: a per-pixel O(k^2) gather box
blur (src/GPUDepthEffect.cu:29-72, k up to ~55 at 1080p). The framework's
XLA formulation (core/effects.py) is exact and O(1)/pixel via a summed-area
table with one-hot accumulation over the ~k/2 static window-half candidates
— but XLA materializes the select chain and the four SAT corner reads per
candidate in HBM (~4 GB of traffic at 1080p, ~5 ms measured). This kernel
runs the same exact algorithm entirely in VMEM:

- grid (3 channels x row strips); each program DMAs one channel's strip plus
  a (max_half+1)-row halo,
- builds the strip's inclusive 2-D prefix sum in VMEM with log-step
  (Hillis-Steele) scans over sublanes then lanes,
- evaluates every candidate half-width with 6 hardware rolls + a masked
  select (all register/VMEM traffic),
- writes back the strip of the blurred channel.

Zero-padding the image by the halo makes the slab-local prefix differences
equal the border-clipped window sums exactly; the per-pixel count is
computed from global coordinates, so the output matches the XLA/oracle
formulation bit-for-bit in f32 (verified in tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DiffusionConfig


def _scan_axis(x, n, axis):
    """Inclusive prefix sum along ``axis`` via log-step shifted adds; roll
    wraparound is masked off (indices < shift add nothing)."""
    iota = lax.broadcasted_iota(jnp.int32, x.shape, axis)
    d = 1
    while d < n:
        x = x + jnp.where(iota >= d, pltpu.roll(x, d, axis), 0)
        d *= 2
    return x


def _defocus_kernel_coldiff(block_h, hr, hc,
                            geom_ref, rgb_hbm, half_hbm, out_hbm,
                            x_s, half_s, ar_s, al_s, u_s, out_s, sems):
    """Column-difference-first marching variant: instead of 4 running corner
    slabs advanced by 8 rolls per candidate, keep only the two COLUMN-rolled
    SAT slabs (right corner / left corner columns), form their difference
    U(y, x) = S2(y, x+hv-1) - S2(y, x-hv-1) once per candidate, and read the
    two row offsets of the box difference
    box = U(y+hv-1, x) - U(y-hv-1, x)
    as dynamic-offset sublane slices of a U scratch slab — ~2 slab rolls +
    1 slab subtract + 2 block reads per candidate vs 8 slab rolls, cutting
    the marching loop's element traffic ~1.7x. Numerics are identical (same
    integer SAT, same corner samples, same select/count/divide epilogue).

    STATUS: interpret-mode exact, but Mosaic (v5e, 2026-08) rejects the
    dynamic SUBLANE-offset vector loads the row reads need ("vector.load"
    at a traced index), so this variant does not compile on hardware; kept
    as the measured-structural-optimum design should Mosaic grow unaligned
    dynamic sublane slices. Not selectable from DiffusionConfig."""
    oy, ox, h, w = geom_ref[0], geom_ref[1], geom_ref[2], geom_ref[3]
    c = pl.program_id(0)
    s = pl.program_id(1)
    row0 = s * block_h
    slab_h = block_h + 2 * hr
    wp = x_s.shape[1]

    cp_x = pltpu.make_async_copy(
        rgb_hbm.at[c, pl.ds(row0, slab_h), :], x_s, sems.at[0]
    )
    cp_h = pltpu.make_async_copy(
        half_hbm.at[pl.ds(row0, block_h), :], half_s, sems.at[1]
    )
    cp_x.start()
    cp_h.start()
    cp_x.wait()
    cp_h.wait()

    sat = _scan_axis(x_s[:].astype(jnp.int32), slab_h, 0)
    s2 = _scan_axis(sat, wp, 1)

    # Running column-rolled SAT slabs: right-corner columns x+hv-1 and
    # left-corner columns x-hv-1 (hv = 1 start: offsets 0 and -2). Wraparound
    # garbage creeps one column per candidate from the lane edges and never
    # reaches the interior (hc >= max_half + 1).
    ar_s[:] = s2
    al_s[:] = pltpu.roll(s2, 2, 1)

    half = half_s[:].astype(jnp.int32)
    out_s[:] = x_s[pl.ds(hr, block_h), :].astype(jnp.int32).astype(jnp.float32)

    hv_hi = jnp.max(half)

    def body(hv, _):
        u_s[:] = ar_s[:] - al_s[:]
        top = u_s[pl.ds(hr + hv - 1, block_h), :]
        bot = u_s[pl.ds(hr - hv - 1, block_h), :]
        out_s[:] = jnp.where(half == hv, (top - bot).astype(jnp.float32), out_s[:])
        ar_s[:] = pltpu.roll(ar_s[:], wp - 1, 1)  # right corner marches +1 col
        al_s[:] = pltpu.roll(al_s[:], 1, 1)       # left corner marches -1 col
        return 0

    lax.fori_loop(1, hv_hi + 1, body, 0, unroll=False)

    gy = lax.broadcasted_iota(jnp.int32, (block_h, wp), 0) + row0 + oy
    gx = lax.broadcasted_iota(jnp.int32, (block_h, wp), 1) - hc + ox
    ch = jnp.minimum(gy + (half - 1), h - 1) - jnp.maximum(gy - half, 0) + 1
    cw = jnp.minimum(gx + (half - 1), w - 1) - jnp.maximum(gx - half, 0) + 1
    cnt = (jnp.maximum(ch, 1) * jnp.maximum(cw, 1)).astype(jnp.float32)
    out_s[:] = jnp.where(half > 0, out_s[:] / cnt, out_s[:])

    cp_o = pltpu.make_async_copy(
        out_s, out_hbm.at[c, pl.ds(row0, block_h), :], sems.at[2]
    )
    cp_o.start()
    cp_o.wait()


def _defocus_kernel_stacked(block_h, hr, hc,
                            geom_ref, rgb_hbm, half_hbm, out_hbm,
                            x_s, half_s, ar_s, al_s, br_s, bl_s, out_s, sems):
    """Channel-stacked variant: one grid step per ROW STRIP carries all 3
    channels as vertically stacked slab sections (section c at rows
    [c*slab_h, (c+1)*slab_h)). The marching rolls advance all three
    channels' corners in one pass, and the per-strip half/count/hv_hi math
    is computed once instead of per channel — 3x fewer grid steps than the
    per-channel kernel.

    Exactness: each section's 2-D prefix sum is built independently (the
    row scan runs per section, so no cross-section carry exists at all);
    marching rolls leak at most hv+1 <= hr rows across section boundaries,
    landing only in the never-read halo rows — the same creep bound as the
    slab edges."""
    oy, ox, h, w = geom_ref[0], geom_ref[1], geom_ref[2], geom_ref[3]
    s = pl.program_id(0)
    row0 = s * block_h
    slab_h = block_h + 2 * hr
    wp = x_s.shape[1]

    cps = [
        pltpu.make_async_copy(
            rgb_hbm.at[c, pl.ds(row0, slab_h), :],
            x_s.at[pl.ds(c * slab_h, slab_h), :], sems.at[c],
        )
        for c in range(3)
    ]
    cp_h = pltpu.make_async_copy(
        half_hbm.at[pl.ds(row0, block_h), :], half_s, sems.at[3]
    )
    for cp in cps:
        cp.start()
    cp_h.start()
    for cp in cps:
        cp.wait()
    cp_h.wait()

    # Per-section row prefix (no cross-section carry), then one lane scan
    # over the whole stack (rows are independent in the lane scan). Built
    # directly into the AR corner slab.
    xi = x_s[:].astype(jnp.int32)
    sat = jnp.concatenate(
        [
            _scan_axis(xi[c * slab_h : (c + 1) * slab_h], slab_h, 0)
            for c in range(3)
        ],
        axis=0,
    )
    s2 = _scan_axis(sat, wp, 1)

    ar_s[:] = s2
    al_s[:] = pltpu.roll(s2, 2, 1)
    br_s[:] = pltpu.roll(s2, 2, 0)
    bl_s[:] = pltpu.roll(br_s[:], 2, 1)

    half = half_s[:].astype(jnp.int32)
    for c in range(3):
        out_s[pl.ds(c * block_h, block_h), :] = (
            x_s[pl.ds(c * slab_h + hr, block_h), :]
            .astype(jnp.int32)
            .astype(jnp.float32)
        )

    hv_hi = jnp.max(half)
    stack_h = 3 * slab_h

    def body(hv, _):
        for c in range(3):
            o = c * slab_h + hr
            box = (
                ar_s[pl.ds(o, block_h), :] - al_s[pl.ds(o, block_h), :]
                - br_s[pl.ds(o, block_h), :] + bl_s[pl.ds(o, block_h), :]
            ).astype(jnp.float32)
            ob = pl.ds(c * block_h, block_h)
            out_s[ob, :] = jnp.where(half == hv, box, out_s[ob, :])
        up, dn = stack_h - 1, 1
        lt, rt = wp - 1, 1
        ar_s[:] = pltpu.roll(pltpu.roll(ar_s[:], up, 0), lt, 1)
        al_s[:] = pltpu.roll(pltpu.roll(al_s[:], up, 0), rt, 1)
        br_s[:] = pltpu.roll(pltpu.roll(br_s[:], dn, 0), lt, 1)
        bl_s[:] = pltpu.roll(pltpu.roll(bl_s[:], dn, 0), rt, 1)
        return 0

    lax.fori_loop(1, hv_hi + 1, body, 0, unroll=False)

    gy = lax.broadcasted_iota(jnp.int32, (block_h, wp), 0) + row0 + oy
    gx = lax.broadcasted_iota(jnp.int32, (block_h, wp), 1) - hc + ox
    ch = jnp.minimum(gy + (half - 1), h - 1) - jnp.maximum(gy - half, 0) + 1
    cw = jnp.minimum(gx + (half - 1), w - 1) - jnp.maximum(gx - half, 0) + 1
    cnt = (jnp.maximum(ch, 1) * jnp.maximum(cw, 1)).astype(jnp.float32)
    for c in range(3):
        ob = pl.ds(c * block_h, block_h)
        out_s[ob, :] = jnp.where(half > 0, out_s[ob, :] / cnt, out_s[ob, :])

    ops = [
        pltpu.make_async_copy(
            out_s.at[pl.ds(c * block_h, block_h), :],
            out_hbm.at[c, pl.ds(row0, block_h), :], sems.at[c],
        )
        for c in range(3)
    ]
    for cp in ops:
        cp.start()
    for cp in ops:
        cp.wait()


def _defocus_kernel(block_h, hr, hc, t_exact, stride,
                    geom_ref, rgb_hbm, half_hbm, out_hbm,
                    x_s, half_s, ar_s, al_s, br_s, bl_s, out_s, sems):
    # geom = [oy, ox, h, w]: the interior block's global origin and the full
    # image size (for border clipping). The single-image path passes
    # [0, 0, h, w]; the sharded block path passes its block's origin.
    oy, ox, h, w = geom_ref[0], geom_ref[1], geom_ref[2], geom_ref[3]
    c = pl.program_id(0)
    s = pl.program_id(1)
    row0 = s * block_h
    slab_h = block_h + 2 * hr
    wp = x_s.shape[1]

    cp_x = pltpu.make_async_copy(
        rgb_hbm.at[c, pl.ds(row0, slab_h), :], x_s, sems.at[0]
    )
    cp_h = pltpu.make_async_copy(
        half_hbm.at[pl.ds(row0, block_h), :], half_s, sems.at[1]
    )
    cp_x.start()
    cp_h.start()
    cp_x.wait()
    cp_h.wait()

    # Inclusive 2-D prefix sum of the (zero-padded) channel slab. int32 is
    # exact: full-image sums stay < 2^31.
    sat = _scan_axis(x_s[:].astype(jnp.int32), slab_h, 0)
    s2 = _scan_axis(sat, wp, 1)

    # Marching corners: for window rows [y-hv, y+hv-1] the four inclusive-
    # prefix corners are S2 at rows {y+hv-1, y-hv-1} x cols {x+hv-1, x-hv-1}.
    # Consecutive candidates move each corner by exactly one row and one
    # column, so four RUNNING buffers advance with cheap STATIC roll-by-1
    # per candidate — no dynamic rotates (which decompose into log-step
    # conditional rolls and dominated the first version), no unrolled chain
    # (which kept ~27 block temporaries live and blew the scoped-VMEM limit).
    #
    # Each corner only ever reads ONE side's row halo — the bottom corners
    # (ar/al) march upward through rows [hr, slab_h) of S2 and never touch
    # the top halo; the top corners (br/bl) march downward through rows
    # [0, hr + block_h) and never touch the bottom halo — so each marched
    # buffer carries block_h + hr rows instead of the full block_h + 2*hr
    # slab, cutting the marching loop's roll traffic by hr/slab_h (~12% at
    # 1080p, ~19% at 4K where the halo is 112 rows). Wrap-around garbage
    # creeps one row/column per candidate from the buffer edges and never
    # reaches the read window: bottom corners read rows [0, block_h) while
    # garbage stays in rows >= block_h + hr - (hv - 1) > block_h - 1 (since
    # hv <= max_half < hr); top corners read rows [hr, hr + block_h) while
    # garbage stays in rows < hv + 1 <= hr. Columns keep both halos (lane
    # alignment leaves nothing to shave; hc >= max_half + 1 as before).
    mh = block_h + hr                    # marched-buffer height
    ar_s[:] = s2[hr:, :]                 # rows y+0,  cols x+0   (hv = 1)
    al_s[:] = pltpu.roll(s2[hr:, :], 2, 1)  # rows y+0, cols x-2
    br_s[:] = pltpu.roll(s2, 2, 0)[:mh, :]  # rows y-2, cols x+0
    bl_s[:] = pltpu.roll(br_s[:], 2, 1)  # rows y-2, cols x-2

    half = half_s[:].astype(jnp.int32)
    # (Mosaic has no direct u8 -> f32 cast; widen through i32.)
    out_s[:] = x_s[pl.ds(hr, block_h), :].astype(jnp.int32).astype(jnp.float32)

    blk_bot = pl.ds(0, block_h)   # the block inside the bottom-corner buffers
    blk_top = pl.ds(hr, block_h)  # the block inside the top-corner buffers
    # Content-adaptive band [hv_lo, hv_hi]: candidates outside this strip's
    # [smallest nonzero, largest] half-widths never win a select — skip
    # them, keeping the output exact (round-4 verdict task #1). The upper
    # bound makes sharp (near-depth) strips nearly free; the LOWER bound is
    # what rescues far-only strips (sky/background at 4K: half in
    # ~[90, 110]), which march one dynamic corner advance (a handful of
    # log-step roll passes) instead of ~90 per-candidate marches. The creep
    # bound is unchanged: cumulative shift at select time is still hv - 1.
    hv_hi = jnp.max(half)
    hv_lo = jnp.minimum(
        jnp.min(jnp.where(half > 0, half, jnp.int32(255))),
        jnp.maximum(hv_hi, 1),
    )

    def select_box(hv):
        # Select the RAW box sum; the boundary-clamped count and the division
        # are hoisted below the loop (they depend only on the pixel's own
        # ``half``, the single candidate whose select ever wins).
        box = (
            ar_s[blk_bot, :] - al_s[blk_bot, :]
            - br_s[blk_top, :] + bl_s[blk_top, :]
        ).astype(jnp.float32)
        out_s[:] = jnp.where(half == hv, box, out_s[:])

    def march(s):
        # Advance the corners s candidates: rows +-s, cols +-s. A STATIC
        # shift of any size is one roll pass, so marching by `stride` costs
        # the same as marching by 1 — that is the whole approx win. The
        # wrap-garbage creep bound depends only on the CUMULATIVE shift
        # (== hv - 1 at select time), identical to the exact kernel's.
        up, dn = mh - s, s
        lt, rt = wp - s, s
        ar_s[:] = pltpu.roll(pltpu.roll(ar_s[:], up, 0), lt, 1)
        al_s[:] = pltpu.roll(pltpu.roll(al_s[:], up, 0), rt, 1)
        br_s[:] = pltpu.roll(pltpu.roll(br_s[:], dn, 0), lt, 1)
        bl_s[:] = pltpu.roll(pltpu.roll(bl_s[:], dn, 0), rt, 1)

    def body(hv, _):
        select_box(hv)
        march(1)
        return 0

    if stride == 1:  # exact: every candidate in [hv_lo, hv_hi]
        @pl.when(hv_lo > 1)
        def _skip_below_band():
            # One dynamic advance to the band start (corners sit at hv = 1).
            # pltpu.roll with a traced shift lowers to log-step conditional
            # rolls — ~log2(max_half) passes, repaid whenever hv_lo > ~8.
            march(hv_lo - 1)

        lax.fori_loop(hv_lo, hv_hi + 1, body, 0, unroll=False)
    else:
        # Approx (snapped half field): exact candidates 1..t_exact, then the
        # progression t_exact + j*stride. Only candidates present in the
        # snapped field can win a select, so skipping the rest is exact
        # w.r.t. the snapped field. The [hv_lo, hv_hi] band applies here
        # too (hv_lo and hv_hi are themselves snapped candidates): the
        # exact phase starts at the band (skipped entirely when hv_lo lies
        # in the coarse range — far-only strips), and the coarse phase
        # starts at the first candidate >= hv_lo.
        @pl.when((hv_lo > 1) & (hv_lo <= t_exact))
        def _skip_below_band_exact():
            march(hv_lo - 1)

        lax.fori_loop(
            jnp.minimum(hv_lo, t_exact + 1),
            jnp.minimum(hv_hi, t_exact) + 1,
            body, 0, unroll=False,
        )

        @pl.when((hv_hi > t_exact) & (hv_lo <= t_exact))
        def _coarse_phase():
            # The exact phase ran through t_exact: corners sit at candidate
            # t_exact + 1; advance to the first coarse candidate (static).
            if stride > 1:
                march(stride - 1)

            def body_q(j, _):
                select_box(t_exact + (j + 1) * stride)
                march(stride)
                return 0

            # hv_hi is itself a snapped candidate: hv_hi = t_exact + J*q.
            lax.fori_loop(0, (hv_hi - t_exact) // stride, body_q, 0,
                          unroll=False)

        @pl.when(hv_lo > t_exact)
        def _coarse_only():
            # Far-only strip: no exact-phase candidates can win. Corners
            # still sit at candidate 1 (the zero-trip loop above marched
            # nothing); one dynamic advance jumps straight to hv_lo, and
            # the progression hv_lo, hv_lo+stride, ..., hv_hi follows
            # (all snapped candidates, so hv_hi - hv_lo is a multiple of
            # the stride).
            march(hv_lo - 1)

            def body_q(j, _):
                select_box(hv_lo + j * stride)
                march(stride)
                return 0

            lax.fori_loop(0, (hv_hi - hv_lo) // stride + 1, body_q, 0,
                          unroll=False)

    # Single epilogue division, bit-identical to dividing per candidate: box
    # sums are < 2^24 (<= 55^2 * 255), so their i32 -> f32 conversion is
    # exact and the divide sees the same operands either way. Count uses the
    # pixel's own half (global image coordinates; clipped to the border).
    gy = lax.broadcasted_iota(jnp.int32, (block_h, wp), 0) + row0 + oy
    gx = lax.broadcasted_iota(jnp.int32, (block_h, wp), 1) - hc + ox
    ch = jnp.minimum(gy + (half - 1), h - 1) - jnp.maximum(gy - half, 0) + 1
    cw = jnp.minimum(gx + (half - 1), w - 1) - jnp.maximum(gx - half, 0) + 1
    cnt = (jnp.maximum(ch, 1) * jnp.maximum(cw, 1)).astype(jnp.float32)
    out_s[:] = jnp.where(half > 0, out_s[:] / cnt, out_s[:])

    cp_o = pltpu.make_async_copy(
        out_s, out_hbm.at[c, pl.ds(row0, block_h), :], sems.at[2]
    )
    cp_o.start()
    cp_o.wait()


def defocus_pallas(
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    cfg: DiffusionConfig = DiffusionConfig(),
    block_h: int = 360,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact depth-proportional box blur (core/effects.defocus semantics) as
    a VMEM-resident Pallas kernel. Returns (H, W, 3) uint8."""
    h, w = depth.shape
    k = cfg.defocus_kernel_size(h, w)
    max_half = k // 2
    half = defocus_half_widths(depth, h, w, cfg)

    # Strip height: sublane-aligned, no taller than the (aligned) image.
    block_h = min(-(-block_h // 8) * 8, -(-h // 8) * 8)
    hr = -(-(max_half + 1) // 8) * 8  # row halo, sublane-aligned
    hc = max(hr, 32)  # column offset of the image inside the padded lanes
    wp = -(-(hc + w + max_half + 1) // 128) * 128
    n_strips = -(-h // block_h)
    hs = n_strips * block_h
    hp = hs + 2 * hr

    chw = jnp.moveaxis(rgb[..., :3], -1, 0).astype(jnp.uint8)
    rgb_p = jnp.pad(chw, ((0, 0), (hr, hp - h - hr), (hc, wp - hc - w)))
    half_p = jnp.pad(half, ((0, hs - h), (hc, wp - hc - w)))

    geom = jnp.array([0, 0, h, w], jnp.int32)
    out = _defocus_call(rgb_p, half_p, geom, block_h, hr, hc, n_strips,
                        interpret, variant=cfg.pallas_defocus_variant,
                        **_quality_kw(cfg, max_half))
    return jnp.moveaxis(out[:, :h, hc : hc + w].astype(jnp.uint8), 0, -1)


def _quality_kw(cfg: DiffusionConfig, max_half: int) -> dict:
    """Static marching-loop parameters for the RESOLVED defocus quality
    ('exact' -> stride 1; 'auto' resolves per aperture regime,
    core/effects.resolved_defocus_quality)."""
    from ..core.effects import resolved_defocus_quality

    if resolved_defocus_quality(cfg, max_half) == "approx":
        return {"t_exact": cfg.pallas_defocus_exact_upto,
                "stride": cfg.pallas_defocus_stride}
    return {"t_exact": 0, "stride": 1}


def _defocus_call(rgb_p, half_p, geom, block_h, hr, hc, n_strips, interpret,
                  variant="corners", t_exact=16, stride=1):
    if variant == "coldiff" and not interpret:
        # Mosaic (v5e, 2026-08) rejects the dynamic sublane-offset vector
        # loads this variant's row reads need; fail with a clear message
        # instead of a compiler traceback.
        raise ValueError(
            "pallas_defocus_variant='coldiff' is interpret-only (Mosaic "
            "rejects its dynamic sublane-offset loads); use 'corners' or "
            "'stacked' on hardware"
        )
    hs, wp = half_p.shape
    slab_h = block_h + 2 * hr
    if variant == "stacked":
        kern = functools.partial(_defocus_kernel_stacked, block_h, hr, hc)
        grid = (n_strips,)
        scratch = [
            pltpu.VMEM((3 * slab_h, wp), jnp.uint8),  # stacked channel slab
            pltpu.VMEM((block_h, wp), jnp.uint8),  # half block (shared)
            pltpu.VMEM((3 * slab_h, wp), jnp.int32),  # corner AR
            pltpu.VMEM((3 * slab_h, wp), jnp.int32),  # corner AL
            pltpu.VMEM((3 * slab_h, wp), jnp.int32),  # corner BR
            pltpu.VMEM((3 * slab_h, wp), jnp.int32),  # corner BL
            pltpu.VMEM((3 * block_h, wp), jnp.float32),  # stacked out
            pltpu.SemaphoreType.DMA((4,)),
        ]
        vmem = (3 * 10 * slab_h + 3 * 4 * block_h) * wp * 4
    elif variant == "coldiff":
        kern = functools.partial(_defocus_kernel_coldiff, block_h, hr, hc)
        grid = (3, n_strips)
        scratch = [
            pltpu.VMEM((slab_h, wp), jnp.uint8),  # channel slab
            pltpu.VMEM((block_h, wp), jnp.uint8),  # half block
            pltpu.VMEM((slab_h, wp), jnp.int32),  # col-rolled SAT (right)
            pltpu.VMEM((slab_h, wp), jnp.int32),  # col-rolled SAT (left)
            pltpu.VMEM((slab_h, wp), jnp.int32),  # U = right - left
            pltpu.VMEM((block_h, wp), jnp.float32),  # out block
            pltpu.SemaphoreType.DMA((3,)),
        ]
        vmem = (10 * slab_h + 4 * block_h) * wp * 4
    elif variant == "corners":
        kern = functools.partial(_defocus_kernel, block_h, hr, hc,
                                 t_exact, stride)
        grid = (3, n_strips)
        mh = block_h + hr  # marched corner buffers carry one row halo only
        scratch = [
            pltpu.VMEM((slab_h, wp), jnp.uint8),  # channel slab
            pltpu.VMEM((block_h, wp), jnp.uint8),  # half block
            pltpu.VMEM((mh, wp), jnp.int32),  # corner AR (block + bottom halo)
            pltpu.VMEM((mh, wp), jnp.int32),  # corner AL (block + bottom halo)
            pltpu.VMEM((mh, wp), jnp.int32),  # corner BR (top halo + block)
            pltpu.VMEM((mh, wp), jnp.int32),  # corner BL (top halo + block)
            pltpu.VMEM((block_h, wp), jnp.float32),  # out block
            pltpu.SemaphoreType.DMA((3,)),
        ]
        vmem = (6 * slab_h + 4 * mh + 4 * block_h) * wp * 4
    else:
        # An unknown name must not silently fall through to the corners
        # kernel — an A/B "measuring" a typo'd variant would measure the
        # default instead.
        raise ValueError(
            f"unknown pallas defocus variant {variant!r}; expected "
            "'corners', 'stacked' or 'coldiff'"
        )
    return pl.pallas_call(
        kern,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((3, hs, wp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # geom (4,) i32
            pl.BlockSpec(memory_space=pl.ANY),  # rgb (3, hp, wp) u8
            pl.BlockSpec(memory_space=pl.ANY),  # half (hs, wp) u8
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # Corner slabs + scan/loop temporaries exceed the default
            # 16 MiB scoped-VMEM budget; v5e has 128 MiB of physical VMEM, so
            # ask for what the kernel actually needs at this block height
            # (~6 i32 slab-sized live values beyond the declared scratch).
            vmem_limit_bytes=min(vmem, 112 * 1024 * 1024),
        ),
    )(geom, rgb_p, half_p)


def defocus_half_widths(depth: jnp.ndarray, full_h: int, full_w: int,
                        cfg: DiffusionConfig = DiffusionConfig()) -> jnp.ndarray:
    """Per-pixel window half-width (uint8) from depth — the pointwise prelude
    of the defocus kernel, exposed so the sharded path can compute it as a
    plain GSPMD-partitioned op before the halo exchange."""
    from ..core.effects import snap_half_widths

    k = cfg.defocus_kernel_size(full_h, full_w)
    ka = (jnp.float32(k) * jnp.maximum(depth.astype(jnp.float32), 0.0) / 255.0).astype(
        jnp.int32
    )
    half = jnp.minimum(ka // 2, k // 2)
    # Quality snap (identity for 'exact'): every defocus path — XLA, the
    # single-image kernel, the sharded block kernel — consumes the same
    # snapped field, so outputs agree bit-for-bit per quality setting.
    return snap_half_widths(half, k // 2, cfg).astype(jnp.uint8)


def defocus_block_pallas(
    chw_e: jnp.ndarray,
    half: jnp.ndarray,
    oy,
    ox,
    full_h: int,
    full_w: int,
    cfg: DiffusionConfig = DiffusionConfig(),
    block_h: int = 360,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact defocus of one spatially-sharded block (the multi-chip serving
    path, parallel/sharded.py): ``chw_e`` is the (3, hb+2*ew, wb+2*ew)
    channel-major uint8 block extended with an ew = max_half+1 wide ring of
    REAL neighbor pixels (zeros at true image borders — identical to the
    single-image kernel's zero padding, so border clipping is exact);
    ``half`` the interior's (hb, wb) half-widths (defocus_half_widths);
    (oy, ox) the interior's global origin (traced scalars) and
    (full_h, full_w) the global image size. Returns the interior's
    (hb, wb, 3) uint8 blur — bit-identical to the corresponding crop of
    defocus_xla on the full image."""
    hb, wb = half.shape
    k = cfg.defocus_kernel_size(full_h, full_w)
    max_half = k // 2
    ew = max_half + 1
    if chw_e.shape[-2:] != (hb + 2 * ew, wb + 2 * ew):
        raise ValueError(
            f"extended block is {chw_e.shape[-2:]}, expected "
            f"{(hb + 2 * ew, wb + 2 * ew)} (interior {(hb, wb)} + {ew}-wide "
            f"halo); blocks thinner than the halo cannot be served here — "
            f"the caller must fall back to the XLA formulation"
        )

    # Strip height: sublane-aligned (DMA row offsets are multiples of it),
    # no taller than the (aligned) block.
    block_h = min(-(-block_h // 8) * 8, -(-hb // 8) * 8)
    hr = -(-ew // 8) * 8
    hc = max(hr, 32)
    wp = -(-(hc + wb + ew) // 128) * 128
    n_strips = -(-hb // block_h)
    hs = n_strips * block_h
    hp = hs + 2 * hr

    # Place the extended block so its interior sits at (hr, hc) — the real
    # halo ring lands inside the kernel's alignment padding.
    rgb_p = jnp.pad(
        chw_e.astype(jnp.uint8),
        ((0, 0), (hr - ew, hp - hb - hr - ew), (hc - ew, wp - wb - hc - ew)),
    )
    half_p = jnp.pad(half.astype(jnp.uint8), ((0, hs - hb), (hc, wp - hc - wb)))
    geom = jnp.stack([
        jnp.asarray(oy, jnp.int32), jnp.asarray(ox, jnp.int32),
        jnp.int32(full_h), jnp.int32(full_w),
    ])
    out = _defocus_call(rgb_p, half_p, geom, block_h, hr, hc, n_strips,
                        interpret, variant=cfg.pallas_defocus_variant,
                        **_quality_kw(cfg, max_half))
    return jnp.moveaxis(out[:, :hb, hc : hc + wb].astype(jnp.uint8), 0, -1)
