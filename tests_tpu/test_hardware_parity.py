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
