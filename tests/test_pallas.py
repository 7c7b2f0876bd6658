"""Pallas kernel tests under the interpreter (SURVEY.md §5: every Pallas
kernel keeps its jnp twin as oracle, tested with interpret=True on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from realtimedepthdiffusion_tpu.config import DiffusionConfig
from realtimedepthdiffusion_tpu.core import multigrid, solver
from realtimedepthdiffusion_tpu.oracle import numpy_ref as oracle
from realtimedepthdiffusion_tpu.ops import pallas_sweep as ps
from tests.conftest import synthetic_pair

CFG = DiffusionConfig()


def _case(rng, h, w):
    gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
    mask = rng.random((h, w)) < 0.06
    val = rng.integers(0, 255, (h, w), dtype=np.uint8)
    depth = oracle.seed_depth(np.full((h, w), 255.0, np.float32), mask, val)
    return gray, mask, depth


@pytest.mark.parametrize("iters", [1, 11, 25])
def test_resident_kernel_matches_xla(rng, iters):
    gray, mask, depth = _case(rng, 49, 67)
    want = np.asarray(
        solver.solve_level(jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 1, 1, iters, CFG)
    )
    got = np.asarray(
        ps.solve_level_resident(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 1, 1, iters, CFG,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-3)
    assert np.array_equal(got[mask], depth[mask])


@pytest.mark.parametrize("iters", [7, 9, 25])
def test_resident_unroll_parity_band(rng, iters):
    """cfg.pallas_resident_unroll chains sweeps through values inside the
    unrolled block (remainder via identity omega rows), which only moves
    bits by cross-sweep FMA contraction — outputs must agree with unroll=1
    to ~1e-4 and scribbles must stay pinned for every factor, divisible or
    not (7/3 and 9/4 exercise the identity-row remainder path)."""
    import dataclasses

    gray, mask, depth = _case(rng, 49, 67)
    base = np.asarray(
        ps.solve_level_resident(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 1, 1, iters, CFG,
            interpret=True,
        )
    )
    for unroll in (3, 4):
        cfg = dataclasses.replace(CFG, pallas_resident_unroll=unroll)
        got = np.asarray(
            ps.solve_level_resident(
                jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 1, 1, iters, cfg,
                interpret=True,
            )
        )
        np.testing.assert_allclose(got, base, atol=1e-4)
        assert np.array_equal(got[mask], depth[mask])


@pytest.mark.parametrize("iters,block_h", [(16, 16), (25, 16), (7, 8)])
def test_strip_kernel_matches_xla(rng, iters, block_h):
    gray, mask, depth = _case(rng, 49, 67)
    want = np.asarray(
        solver.solve_level(jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 0, 1, iters, CFG)
    )
    got = np.asarray(
        ps.solve_level_strips(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 0, 1, iters, CFG,
            block_h=block_h, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-3)
    assert np.array_equal(got[mask], depth[mask])


@pytest.mark.parametrize("in_kernel_halo", [True, False])
def test_rb_strip_halo_variants(rng, in_kernel_halo):
    """The chunked red-black fallback (used when the weight arena exceeds
    VMEM) produces the megakernel's result under both of its halo strategies
    (host-level fix_halo — the measured-faster default — and in-kernel
    boundary-band DMAs)."""
    gray, mask, depth = _case(rng, 49, 67)
    cfg_rb = DiffusionConfig(solver="red_black", pallas_iter_block_rb=4)
    want_rb = np.asarray(
        solver.solve_level(jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 0, 1, 7, cfg_rb)
    )
    cfg_var = DiffusionConfig(
        solver="red_black", pallas_iter_block_rb=4,
        pallas_in_kernel_halo=in_kernel_halo,
        pallas_resident_vmem_budget=0, pallas_rb_megakernel=False,
    )
    got_rb = np.asarray(
        ps.solve_level_red_black_pallas(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 0, 1, 7, cfg_var,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got_rb, want_rb, atol=5e-3)


@pytest.mark.slow
def test_strip_kernel_prefetch_variant(rng, monkeypatch):
    """The 3-deep state-prefetch ring (off by default — measured slower on
    v5e, kept for hardware where the tradeoff flips) matches the arena
    kernel exactly. Slow set: off-default measured-record variants ride
    with the full suite (same policy as 'stacked'). Geometry chosen to satisfy the prefetch gate: k=8 (so
    pad_rows=16 <= block_h=16) and 49 rows / block_h=16 -> 4 strips; the
    test asserts the prefetch kernel actually ran (the round-2 version
    silently resolved prefetch=False and compared the arena kernel to
    itself)."""
    gray, mask, depth = _case(rng, 49, 67)
    cfg = DiffusionConfig(pallas_iter_block_small=8)
    args = (jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 0, 1, 25, cfg)
    want = np.asarray(ps.solve_level_strips(*args, block_h=16, interpret=True))

    calls = []
    real = ps._strip_mega_kernel_prefetch

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(ps, "_strip_mega_kernel_prefetch", spy)
    cfg_pf = DiffusionConfig(pallas_iter_block_small=8, pallas_state_prefetch=True)
    args_pf = (jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 0, 1, 25, cfg_pf)
    got = np.asarray(ps.solve_level_strips(*args_pf, block_h=16, interpret=True))
    assert calls, "prefetch kernel was not taken (gate resolved False)"
    np.testing.assert_array_equal(got, want)
    # The static-copy arena variant (per-step copies instead of per-sweep
    # dynamic-offset arena reads; measured within noise on v5e).
    cfg_sc = DiffusionConfig(pallas_iter_block_small=8, pallas_arena_static_copy=True)
    args_sc = (jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 0, 1, 25, cfg_sc)
    got_sc = np.asarray(ps.solve_level_strips(*args_sc, block_h=16, interpret=True))
    np.testing.assert_array_equal(got_sc, want)


def test_strip_kernel_no_arena_fallback(rng):
    """The per-step-DMA megakernel (the last-resort fallback when even the
    derived-weights arena exceeds VMEM) matches the arena/prefetch kernels."""
    gray, mask, depth = _case(rng, 49, 67)
    want = np.asarray(
        ps.solve_level_strips(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 0, 1, 25, CFG,
            block_h=16, interpret=True,
        )
    )
    cfg_cap = DiffusionConfig(pallas_arena_vmem_cap=0)
    got = np.asarray(
        ps.solve_level_strips(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 0, 1, 25, cfg_cap,
            block_h=16, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_strip_kernel_level_weight_rule(rng):
    """The strip path must honor the level-dependent depth-threshold weight
    rule (computed from the incoming pyrUp'd depth)."""
    gray, mask, _ = _case(rng, 40, 56)
    depth = (rng.random((40, 56), dtype=np.float32) * 255).astype(np.float32)
    want = np.asarray(
        solver.solve_level(jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 1, 3, 9, CFG)
    )
    got = np.asarray(
        ps.solve_level_strips(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 1, 3, 9, CFG,
            block_h=16, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-3)


@pytest.mark.parametrize("iters", [1, 6, 13])
def test_rb_resident_kernel_matches_xla(rng, iters):
    """Red-black Pallas (resident) == core.solver red-black, same iterate."""
    gray, mask, depth = _case(rng, 49, 67)
    cfg = DiffusionConfig(solver="red_black")
    want = np.asarray(
        solver.solve_level(jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 1, 1, iters, cfg)
    )
    got = np.asarray(
        ps.solve_level_red_black_pallas(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 1, 1, iters, cfg,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-3)
    assert np.array_equal(got[mask], depth[mask])


@pytest.mark.parametrize("iters", [4, 9])
def test_rb_strip_kernel_matches_xla(rng, iters):
    """Red-black strip kernel (2-rings-per-iteration halo) == XLA red-black,
    forced onto the strip path via a tiny VMEM budget."""
    gray, mask, depth = _case(rng, 49, 67)
    cfg = DiffusionConfig(solver="red_black", pallas_iter_block_rb=4)
    want = np.asarray(
        solver.solve_level(jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 0, 1, iters, cfg)
    )
    # Route through the public entry but force strips by shrinking the budget.
    cfg_strip = DiffusionConfig(
        solver="red_black", pallas_iter_block_rb=4, pallas_resident_vmem_budget=0
    )
    got = np.asarray(
        ps.solve_level_red_black_pallas(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 0, 1, iters, cfg_strip,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-3)
    assert np.array_equal(got[mask], depth[mask])


def test_rb_pallas_early_exit_matches_xla(rng):
    """Early-exit red-black on the Pallas path stops at the same iterate as
    the XLA while_loop version (chunked residual cadence + truncated tail)."""
    gray, mask, depth = _case(rng, 40, 56)
    cfg = DiffusionConfig(solver="red_black", early_exit=True,
                          residual_check_every=6, tolerance=1e-4)
    iters = 20  # 3 full chunks of 6 + truncated tail of 2
    want = np.asarray(
        solver.solve_level(jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 1, 1, iters, cfg)
    )
    got = np.asarray(
        ps.solve_level_red_black_pallas(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 1, 1, iters, cfg,
            interpret=True,
        )
    )
    # 2e-2: the SOR omegas (rb_rho=0.9999 default -> omega ~1.97) amplify
    # the cross-program FMA band beyond the plain-GS 5e-3.
    np.testing.assert_allclose(got, want, atol=2e-2)


@pytest.mark.parametrize("shape", [(96, 160), (257, 130)])
def test_defocus_pallas_bitexact(rng, shape):
    """The Pallas defocus kernel (VMEM SAT + candidate rolls) must equal the
    XLA/oracle formulation exactly, including border-clipped counts."""
    from realtimedepthdiffusion_tpu.core import effects as fx
    from realtimedepthdiffusion_tpu.ops.pallas_defocus import defocus_pallas

    h, w = shape
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    depth = (rng.random((h, w)) * 255).astype(np.float32)
    want = np.asarray(fx.defocus_xla(jnp.asarray(rgb), jnp.asarray(depth), CFG))
    got = np.asarray(
        defocus_pallas(jnp.asarray(rgb), jnp.asarray(depth), CFG, interpret=True)
    )
    assert np.array_equal(got, want)


def test_defocus_pallas_bitexact_halo_taller_than_block(rng):
    """Tightest regime for the one-sided marched corner buffers: a large
    aperture makes the row halo (hr) TALLER than the strip block, and a
    far-plane row drives hv all the way to max_half — the wrap-garbage
    creep bounds (bottom corners: garbage >= block_h + hr - hv + 1; top
    corners: garbage < hv + 1 <= hr) are exercised at their minimum
    margins. Must still equal the XLA formulation exactly."""
    from realtimedepthdiffusion_tpu.core import effects as fx
    from realtimedepthdiffusion_tpu.ops.pallas_defocus import defocus_pallas

    h, w = 120, 180
    # Pin exact: under the 'auto' default this max_half resolves to approx,
    # which would test the stride march instead of the exact creep bounds.
    cfg = DiffusionConfig(defocus_aperture=0.5,
                          pallas_defocus_quality="exact")  # max_half=54, hr=56
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    depth = (rng.random((h, w)) * 255).astype(np.float32)
    # Far-plane rows inside EACH 48-row strip: hv_hi == max_half everywhere.
    depth[40:44, :] = 255.0
    depth[60:64, :] = 255.0
    depth[100:104, :] = 255.0
    want = np.asarray(fx.defocus_xla(jnp.asarray(rgb), jnp.asarray(depth), cfg))
    got = np.asarray(
        defocus_pallas(jnp.asarray(rgb), jnp.asarray(depth), cfg,
                       block_h=48, interpret=True)
    )
    assert np.array_equal(got, want)


def test_defocus_routes_to_pallas_interpret(rng):
    """backend='pallas_interpret' routes fx.defocus through the kernel."""
    from realtimedepthdiffusion_tpu.core import effects as fx

    rgb = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    depth = (rng.random((64, 96)) * 255).astype(np.float32)
    cfg_p = DiffusionConfig(backend="pallas_interpret")
    got = np.asarray(fx.defocus(jnp.asarray(rgb), jnp.asarray(depth), cfg_p))
    want = np.asarray(fx.defocus_xla(jnp.asarray(rgb), jnp.asarray(depth), CFG))
    assert np.array_equal(got, want)


def test_full_cascade_pallas_interpret_backend():
    """End-to-end cascade with backend='pallas_interpret' matches the XLA
    cascade (the dispatch path the TPU bench takes, minus compilation)."""
    rgb, m0, v0 = synthetic_pair(64, 96, 3)
    g0 = oracle.rgb_to_gray(rgb)
    cfg_x = DiffusionConfig(max_iterations=40, backend="xla")
    cfg_p = DiffusionConfig(max_iterations=40, backend="pallas_interpret")
    gp = multigrid.build_gray_pyramid(jnp.asarray(g0), cfg_x)

    st = multigrid.initial_depth_state(64, 96, cfg_x)
    d_x, _ = multigrid.solve_cascade(gp, jnp.asarray(m0), jnp.asarray(v0), st, cfg_x)
    st = multigrid.initial_depth_state(64, 96, cfg_p)
    d_p, _ = multigrid.solve_cascade(gp, jnp.asarray(m0), jnp.asarray(v0), st, cfg_p)
    rmse = float(jnp.sqrt(jnp.mean(((d_p - d_x) / 255.0) ** 2)))
    assert rmse <= 1e-3, rmse


@pytest.mark.parametrize(
    "variant",
    [
        # Both are off-default measured-record variants (PERF.md); their
        # interpret-mode bit-parity is heavy and rides in the slow set
        # (coldiff is additionally interpret-only — fenced at config
        # construction, so no product path can reach it on hardware).
        pytest.param("coldiff", marks=pytest.mark.slow),
        pytest.param("stacked", marks=pytest.mark.slow),
    ],
)
def test_defocus_variant_kernels_bitexact(rng, variant):
    """The alternative defocus marching schemes — 'stacked' (all 3 channels
    vertically stacked in one slab, one grid step per strip) and 'coldiff'
    (column-difference slabs; interpret-only, Mosaic rejects its dynamic
    sublane loads on hardware) — must equal the XLA formulation exactly."""
    from realtimedepthdiffusion_tpu.core import effects as fx
    from realtimedepthdiffusion_tpu.ops.pallas_defocus import defocus_pallas

    rgb = rng.integers(0, 256, (97, 203, 3), dtype=np.uint8)
    depth = (rng.random((97, 203)) * 255).astype(np.float32)
    want = np.asarray(fx.defocus_xla(jnp.asarray(rgb), jnp.asarray(depth), CFG))
    # coldiff is fenced to the interpret backend at config construction
    # (it cannot compile on hardware); select it the only legal way.
    cfg = DiffusionConfig(
        pallas_defocus_variant=variant,
        backend="pallas_interpret" if variant == "coldiff" else "auto",
    )
    got = np.asarray(
        defocus_pallas(jnp.asarray(rgb), jnp.asarray(depth), cfg, interpret=True)
    )
    assert np.array_equal(got, want)


def test_defocus_unknown_variant_rejected(rng):
    """A typo'd variant name must raise, not silently run the corners
    kernel (an A/B 'measuring' the typo would measure the default) — at
    config construction (every surface) and again at the kernel-call layer
    (defense in depth for direct callers). 'coldiff' on the COMPILED path
    must also fail with a clear message, not a Mosaic traceback."""
    from realtimedepthdiffusion_tpu.ops import pallas_defocus as pd

    with pytest.raises(ValueError, match="unknown pallas_defocus_variant"):
        DiffusionConfig(pallas_defocus_variant="stackd")

    rgb = jnp.asarray(rng.integers(0, 256, (32, 40, 3), dtype=np.uint8))
    depth = jnp.asarray((rng.random((32, 40)) * 255).astype(np.float32))
    cfg = DiffusionConfig(pallas_defocus_variant="corners")
    object.__setattr__(cfg, "pallas_defocus_variant", "stackd")  # bypass
    with pytest.raises(ValueError, match="unknown pallas defocus variant"):
        pd.defocus_pallas(rgb, depth, cfg, interpret=True)

    # coldiff is fenced at construction unless the interpret backend is
    # selected (it cannot compile on TPU hardware) ...
    with pytest.raises(ValueError, match="interpret-only"):
        DiffusionConfig(pallas_defocus_variant="coldiff")
    # ... and the kernel-call layer still refuses a compiled run (defense in
    # depth for direct callers passing interpret=False themselves).
    cfg_cd = DiffusionConfig(
        pallas_defocus_variant="coldiff", backend="pallas_interpret"
    )
    with pytest.raises(ValueError, match="interpret-only"):
        pd.defocus_pallas(rgb, depth, cfg_cd, interpret=False)


@pytest.mark.parametrize("level,max_level", [(1, 3), (0, 3), (3, 3)])
def test_uarena_matches_arena_bitexact(rng, monkeypatch, level, max_level):
    """The derived-weights (u8) arena megakernel — weights materialized
    in-kernel from gray/d8 slabs, the 4K fast path — is BIT-identical to
    the f32 weight-arena megakernel at every level rule (depth threshold 4,
    forced 0 at level 0, no rule at the coarsest level). Depth is
    non-integral to exercise the u8 truncation matching edge_weights."""
    gray, mask, depth = _case(rng, 49, 67)
    depth = depth + rng.random(depth.shape).astype(np.float32) * 0.9
    args = (jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray),
            level, max_level, 17, CFG)
    want = np.asarray(ps.solve_level_strips(*args, block_h=16, interpret=True))

    calls = []
    real = ps._strips_mega_call_uarena

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(ps, "_strips_mega_call_uarena", spy)
    monkeypatch.setattr(ps, "_arena_bytes", lambda *a, **kw: 1 << 60)
    got = np.asarray(ps.solve_level_strips(*args, block_h=16, interpret=True))
    assert calls, "u8 derived-weights arena kernel was not taken"
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
@pytest.mark.parametrize("iters", [1, 9])
def test_rb_compact_matches_masked_and_xla(rng, monkeypatch, iters):
    """The quadrant-compacted red-black megakernel (each color computes only
    its own quarter planes — half the arithmetic and halo of the masked
    formulation) produces the same iterate as the masked megakernel and the
    XLA red-black within the established parity band. Slow set: off-default
    measured-record variant (same policy as 'stacked')."""
    gray, mask, depth = _case(rng, 49, 67)
    want = np.asarray(
        solver.solve_level(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 0, 1,
            iters, DiffusionConfig(solver="red_black"),
        )
    )
    calls = []
    real = ps._rb_compact_pallas_iterations

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(ps, "_rb_compact_pallas_iterations", spy)
    cfg_c = DiffusionConfig(solver="red_black", pallas_iter_block_rb=4,
                            pallas_resident_vmem_budget=0,
                            pallas_rb_compact=True)
    got = np.asarray(
        ps.solve_level_red_black_pallas(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 0, 1,
            iters, cfg_c, interpret=True,
        )
    )
    assert calls, "compact red-black kernel was not taken"
    cfg_m = DiffusionConfig(solver="red_black", pallas_iter_block_rb=4,
                            pallas_resident_vmem_budget=0,
                            pallas_rb_compact=False)
    got_m = np.asarray(
        ps.solve_level_red_black_pallas(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 0, 1,
            iters, cfg_m, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-3)
    np.testing.assert_allclose(got, got_m, atol=5e-3)
    assert np.array_equal(got[mask], depth[mask])


# Degenerate geometries: the dispatch routing (resident / strip / small-level
# megakernel / rb twins) and the kernels' pad/halo math must survive any
# image the reference accepts (src/GPUSolver.cu:287-288 runs at every size) —
# 1-pixel rows/columns, sub-sublane heights, lane-boundary widths.
_GNARLY_SIZES = [
    (1, 1), (1, 7), (7, 1), (2, 2), (3, 129), (129, 3), (5, 128),
    (7, 127), (9, 257), (31, 17), (63, 255), (65, 257), (128, 130),
]


@pytest.mark.slow
@pytest.mark.parametrize("solver_name", ["jacobi_chebyshev", "red_black"])
def test_solver_dispatch_gnarly_geometries(rng, solver_name):
    from realtimedepthdiffusion_tpu.ops import dispatch

    for h, w in _GNARLY_SIZES:
        gray, mask, depth = _case(rng, h, w)
        args = (jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray),
                0, 2, 9)
        want = np.asarray(dispatch.solve_level(
            *args, DiffusionConfig(solver=solver_name, backend="xla")))
        got = np.asarray(dispatch.solve_level(
            *args,
            DiffusionConfig(solver=solver_name, backend="pallas_interpret")))
        np.testing.assert_allclose(got, want, atol=5e-3,
                                   err_msg=f"{solver_name} {h}x{w}")
        assert np.array_equal(got[mask], depth[mask]), (solver_name, h, w)


@pytest.mark.slow
def test_defocus_pallas_gnarly_geometries(rng):
    from realtimedepthdiffusion_tpu.core import effects as fx
    from realtimedepthdiffusion_tpu.ops.pallas_defocus import defocus_pallas

    for h, w in [(1, 1), (1, 9), (9, 1), (2, 2), (3, 129), (129, 3),
                 (7, 127), (31, 17), (65, 257)]:
        rgb = jnp.asarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        depth = jnp.asarray((rng.random((h, w)) * 255).astype(np.float32))
        want = np.asarray(fx.defocus_xla(rgb, depth, CFG))
        got = np.asarray(defocus_pallas(rgb, depth, CFG, interpret=True))
        assert np.array_equal(got, want), (h, w)


@pytest.mark.parametrize("upto,stride", [(16, 4), (8, 3), (1, 2)])
def test_defocus_pallas_approx_bitexact(rng, upto, stride):
    """quality='approx': the kernel's stride march (exact candidates
    1..upto, then upto+stride, upto+2*stride, ...) must equal the XLA
    formulation on the SAME snapped half field bit-for-bit — including a
    strip whose hv_hi <= upto (the coarse phase pl.when is skipped) and a
    far-plane strip driving hv_hi to the largest coarse candidate."""
    from realtimedepthdiffusion_tpu.core import effects as fx
    from realtimedepthdiffusion_tpu.ops.pallas_defocus import defocus_pallas

    h, w = 120, 180
    cfg = DiffusionConfig(
        defocus_aperture=0.5,  # k=108, max_half=54 > upto: stride march runs
        pallas_defocus_quality="approx",
        pallas_defocus_exact_upto=upto,
        pallas_defocus_stride=stride,
    )
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    depth = (rng.random((h, w)) * 255).astype(np.float32)
    # First strip (block_h=48) all-sharp: hv_hi <= upto there.
    depth[:48] = depth[:48] * (upto / 54.0)
    # Far-plane rows in the last strip: hv_hi == the largest candidate.
    depth[100:104, :] = 255.0
    want = np.asarray(fx.defocus_xla(jnp.asarray(rgb), jnp.asarray(depth), cfg))
    got = np.asarray(
        defocus_pallas(jnp.asarray(rgb), jnp.asarray(depth), cfg,
                       block_h=48, interpret=True)
    )
    assert np.array_equal(got, want)


def test_defocus_pallas_approx_small_aperture_degenerates_to_exact(rng):
    """max_half below exact_upto: the snap is the identity and the approx
    kernel must equal the EXACT kernel/XLA output (coarse phase never
    runs)."""
    from realtimedepthdiffusion_tpu.core import effects as fx
    from realtimedepthdiffusion_tpu.ops.pallas_defocus import defocus_pallas

    h, w = 96, 160
    cfg_a = DiffusionConfig(pallas_defocus_quality="approx")  # k small: max_half 2
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    depth = (rng.random((h, w)) * 255).astype(np.float32)
    want = np.asarray(fx.defocus_xla(jnp.asarray(rgb), jnp.asarray(depth), CFG))
    got = np.asarray(
        defocus_pallas(jnp.asarray(rgb), jnp.asarray(depth), cfg_a, interpret=True)
    )
    assert np.array_equal(got, want)


def test_chebyshev_pallas_early_exit_chunked_bitwise(rng):
    """The Pallas chunked early-exit runner (strip megakernel re-launched
    per residual chunk, (u, prev) carried in the ping-pong layout, omegas
    dynamic-sliced from the global table) is BITWISE identical to the
    fixed-iteration strip megakernel when the tolerance can never fire —
    including the truncated final chunk's SMEM active-count masking and the
    even-block parity padding (33 iters, cadence 7)."""
    gray, mask, depth = _case(rng, 40, 56)
    args = (jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 1, 4, 33)
    cfg = DiffusionConfig(backend="pallas_interpret")
    cfg_ee = DiffusionConfig(backend="pallas_interpret", early_exit=True,
                             tolerance=0.0, residual_check_every=7)
    want = np.asarray(ps.solve_level_strips(*args, cfg, interpret=True))
    got = np.asarray(
        ps.solve_level_strips_early_exit(*args, cfg_ee, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_chebyshev_pallas_early_exit_matches_xla(rng):
    """Early-exit jacobi_chebyshev on the Pallas path stops at the same
    iterate as the XLA chunked while_loop (same residual cadence, same
    omega table), and solve_level_pallas routes early_exit configs to the
    chunked strip runner at every level size."""
    gray, mask, depth = _case(rng, 40, 56)
    cfg = DiffusionConfig(early_exit=True, residual_check_every=6,
                          tolerance=1e-3)
    iters = 40
    want = np.asarray(
        solver.solve_level(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray),
            1, 1, iters, cfg,
        )
    )
    got = np.asarray(
        ps.solve_level_pallas(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray),
            1, 1, iters, cfg, interpret=True,
        )
    )
    # 1e-2: the Chebyshev extrapolation (omega -> ~1.9) amplifies the
    # cross-program FMA band slightly beyond the plain 5e-3.
    np.testing.assert_allclose(got, want, atol=1e-2)
    assert np.array_equal(got[mask], depth[mask])
