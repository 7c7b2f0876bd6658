"""Multi-chip path on the 8-device virtual CPU mesh (SURVEY.md §4): halo
exchange correctness, sharded-vs-single-chip parity, batched step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from realtimedepthdiffusion_tpu.config import DiffusionConfig
from realtimedepthdiffusion_tpu.core import multigrid, solver
from realtimedepthdiffusion_tpu.oracle import numpy_ref as oracle
from realtimedepthdiffusion_tpu.parallel import sharded
from realtimedepthdiffusion_tpu.parallel.halo import crop_halo, extend_with_halo
from realtimedepthdiffusion_tpu.parallel.mesh import factor3, make_mesh
from tests.conftest import synthetic_pair

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_factor3():
    assert factor3(8) == (2, 2, 2)
    assert factor3(4) == (1, 2, 2)
    assert factor3(2) == (1, 1, 2)
    assert factor3(1) == (1, 1, 1)
    assert factor3(6) == (1, 2, 3)


def test_make_mesh_falls_back_to_cpu_backend(monkeypatch):
    """When the default platform exposes fewer devices than requested (one
    real TPU chip in a process whose boot hook overrides JAX_PLATFORMS=cpu),
    make_mesh must still build the virtual mesh from the CPU backend instead
    of failing the reshape — the driver's dryrun can share a process with a
    default-platform entry() compile."""
    from realtimedepthdiffusion_tpu.parallel import mesh as mesh_mod

    real_devices = jax.devices

    def fake_devices(backend=None):
        if backend is None:
            return real_devices()[:1]
        return real_devices(backend)

    monkeypatch.setattr(mesh_mod.jax, "devices", fake_devices)
    with pytest.warns(RuntimeWarning, match="falling back"):
        m = mesh_mod.make_mesh(8)
    assert m.devices.size == 8
    with pytest.raises(ValueError, match="only"):
        mesh_mod.make_mesh(8, devices=real_devices()[:1])


def test_halo_exchange_reassembles_global():
    """extend_with_halo must deliver the true global neighborhood: cropping
    an extended identity map equals a plain global pad-and-slice."""
    mesh = make_mesh(8)
    h, w = 32, 64
    x = jnp.arange(h * w, dtype=jnp.float32).reshape(h, w)
    k = 4

    # Invariant 1: the extended block's interior equals the block.
    def local2(xb):
        e = extend_with_halo(xb, k)
        return e[k:-k, k:-k]

    f = jax.shard_map(
        local2, mesh=mesh, in_specs=jax.sharding.PartitionSpec("dy", "dx"),
        out_specs=jax.sharding.PartitionSpec("dy", "dx"),
    )
    np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(x))

    # And a halo-based global shift equals jnp.roll-with-zeros.
    def shift_up(xb):
        e = extend_with_halo(xb, 1)
        return e[2:, 1:-1]  # row y takes value from y+1 (zero at bottom)

    g = jax.shard_map(
        shift_up, mesh=mesh, in_specs=jax.sharding.PartitionSpec("dy", "dx"),
        out_specs=jax.sharding.PartitionSpec("dy", "dx"),
    )
    want = np.zeros((h, w), np.float32)
    want[:-1] = np.asarray(x)[1:]
    np.testing.assert_array_equal(np.asarray(g(x)), want)


@pytest.mark.slow
def test_sharded_level_matches_single_chip(rng):
    mesh = make_mesh(8)
    cfg = DiffusionConfig()
    h, w = 65, 97  # non-divisible by the mesh: exercises padding
    gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
    mask = rng.random((h, w)) < 0.06
    val = rng.integers(0, 255, (h, w), dtype=np.uint8)
    depth = oracle.seed_depth(np.full((h, w), 255.0, np.float32), mask, val)

    got = np.asarray(
        sharded.solve_level_sharded(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 1, 1, 21,
            mesh, cfg, halo=4,
        )
    )
    want = np.asarray(
        solver.solve_level(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 1, 1, 21, cfg
        )
    )
    assert np.sqrt(np.mean(((got - want) / 255.0) ** 2)) < 1e-4
    assert np.array_equal(got[mask], depth[mask])


@pytest.mark.slow
def test_sharded_cascade_parity():
    mesh = make_mesh(8)
    cfg = DiffusionConfig(max_iterations=24)
    rgb, m0, v0 = synthetic_pair(64, 96, 3)
    g0 = oracle.rgb_to_gray(rgb)
    gp = multigrid.build_gray_pyramid(jnp.asarray(g0), cfg)

    st = multigrid.initial_depth_state(64, 96, cfg)
    d_s, _ = sharded.solve_cascade_sharded(
        gp, jnp.asarray(m0), jnp.asarray(v0), st, mesh, cfg, halo=4
    )
    st = multigrid.initial_depth_state(64, 96, cfg)
    d_1, _ = multigrid.solve_cascade(gp, jnp.asarray(m0), jnp.asarray(v0), st, cfg)
    rmse = float(jnp.sqrt(jnp.mean(((d_s - d_1) / 255.0) ** 2)))
    assert rmse <= 1e-3, rmse


@pytest.mark.slow
def test_batched_step_runs_and_pins_scribbles():
    mesh = make_mesh(8)
    cfg = DiffusionConfig(max_iterations=16)
    fn, make_args = sharded.batched_step(mesh, 64, 64, cfg)
    args = make_args(2)
    depth, state, out = fn(*args)
    assert depth.shape == (2, 64, 64)
    assert out.shape == (2, 64, 64, 3) and out.dtype == jnp.uint8
    d = np.asarray(depth)
    assert d[0, 16, 16] == 254.0  # the painted near scribble is pinned
    assert len(state) == cfg.num_levels(64, 64)


@pytest.mark.slow
def test_sharded_red_black_matches_single_chip(rng):
    """Sharded red-black (2k-halo color-masked blocks) == core red-black."""
    mesh = make_mesh(8)
    cfg = DiffusionConfig(solver="red_black")
    h, w = 65, 97
    gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
    mask = rng.random((h, w)) < 0.06
    val = rng.integers(0, 255, (h, w), dtype=np.uint8)
    depth = oracle.seed_depth(np.full((h, w), 255.0, np.float32), mask, val)

    got = np.asarray(
        sharded.solve_level_sharded(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 1, 1, 13,
            mesh, cfg, halo=4,
        )
    )
    want = np.asarray(
        solver.solve_level(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray), 1, 1, 13, cfg
        )
    )
    assert np.sqrt(np.mean(((got - want) / 255.0) ** 2)) < 1e-4
    assert np.array_equal(got[mask], depth[mask])


@pytest.mark.slow
def test_sharded_red_black_early_exit_matches_single_chip(rng):
    """Config #2 multi-chip: pmax'd global residual early exit stops the
    sharded solve at the same iterate as the single-chip while_loop,
    including the truncated final chunk."""
    mesh = make_mesh(8)
    cfg = DiffusionConfig(solver="red_black", early_exit=True,
                          residual_check_every=6, tolerance=1e-4)
    h, w = 64, 96
    gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
    mask = rng.random((h, w)) < 0.06
    val = rng.integers(0, 255, (h, w), dtype=np.uint8)
    depth = oracle.seed_depth(np.full((h, w), 255.0, np.float32), mask, val)
    args = (jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray))

    got = np.asarray(
        sharded.solve_level_sharded(*args, 1, 1, 20, mesh, cfg, halo=4)
    )
    want = np.asarray(solver.solve_level(*args, 1, 1, 20, cfg))
    assert np.sqrt(np.mean(((got - want) / 255.0) ** 2)) < 1e-4


@pytest.mark.slow
def test_sharded_red_black_early_exit_runs_truncated_tail(rng):
    """When the tolerance can never fire, early-exit red-black must complete
    EXACTLY the iteration cap — including the final chunk that
    residual_check_every does not divide (20 = 3x6 + 2 here). The shard_map'd
    while loop only runs full chunks; the GSPMD tail in solve_level_sharded
    owns the remainder. Guarded tightly: the early-exit iterate must match
    the fixed-count sharded solve (same rb_omegas indices, same halo
    blocking), which an 18-vs-20-iteration shortfall visibly breaks."""
    mesh = make_mesh(8)
    cfg_ee = DiffusionConfig(solver="red_black", early_exit=True,
                             residual_check_every=6, tolerance=1e-12)
    cfg_fx = DiffusionConfig(solver="red_black")
    h, w = 64, 96
    gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
    mask = rng.random((h, w)) < 0.06
    val = rng.integers(0, 255, (h, w), dtype=np.uint8)
    depth = oracle.seed_depth(np.full((h, w), 255.0, np.float32), mask, val)
    args = (jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray))

    got = np.asarray(
        sharded.solve_level_sharded(*args, 1, 1, 20, mesh, cfg_ee, halo=4)
    )
    want = np.asarray(
        sharded.solve_level_sharded(*args, 1, 1, 20, mesh, cfg_fx, halo=4)
    )
    # Sanity: 18 iterations are measurably different from 20 on this problem.
    short = np.asarray(
        sharded.solve_level_sharded(*args, 1, 1, 18, mesh, cfg_fx, halo=4)
    )
    gap = np.sqrt(np.mean(((short - want) / 255.0) ** 2))
    assert gap > 1e-6, f"18-vs-20 gap {gap} too small to guard the tail"
    err = np.sqrt(np.mean(((got - want) / 255.0) ** 2))
    assert err < gap / 10, (err, gap)

    # The observability probe must NOT claim the exit fired: the while
    # loop stopped at 18 (the last full chunk) but the tail ran the
    # remaining 2, so the full budget ran and iters_done must say 20.
    # (Pre-fix this returned 18 — a caller using the documented
    # "iters_done < iters <=> exit fired" probe was lied to whenever
    # residual_check_every did not divide the budget.)
    _, done, res = sharded.solve_level_sharded(
        *args, 1, 1, 20, mesh, cfg_ee, halo=4, return_info=True
    )
    assert int(done) == 20, int(done)
    assert float(res) >= cfg_ee.tolerance * 255.0


@pytest.mark.slow
def test_sharded_cascade_red_black_parity():
    """solve_cascade_sharded with solver='red_black' (config #2 end-to-end,
    the round-1 NotImplementedError lifted)."""
    mesh = make_mesh(8)
    cfg = DiffusionConfig(max_iterations=24, solver="red_black",
                          early_exit=True, residual_check_every=8)
    rgb, m0, v0 = synthetic_pair(64, 96, 3)
    g0 = oracle.rgb_to_gray(rgb)
    gp = multigrid.build_gray_pyramid(jnp.asarray(g0), cfg)

    st = multigrid.initial_depth_state(64, 96, cfg)
    d_s, _ = sharded.solve_cascade_sharded(
        gp, jnp.asarray(m0), jnp.asarray(v0), st, mesh, cfg, halo=4
    )
    st = multigrid.initial_depth_state(64, 96, cfg)
    d_1, _ = multigrid.solve_cascade(gp, jnp.asarray(m0), jnp.asarray(v0), st, cfg)
    rmse = float(jnp.sqrt(jnp.mean(((d_s - d_1) / 255.0) ** 2)))
    assert rmse <= 1e-3, rmse


@pytest.mark.slow
def test_sharded_vcycle_parity():
    """Multi-chip V-cycle (config #4): sharded warm cascade + GSPMD-global
    polish matches the single-chip solve_vcycle."""
    mesh = make_mesh(8)
    cfg = DiffusionConfig(max_iterations=24, multigrid="vcycle",
                          vcycle_coarse_iters=40, vcycles=1)
    rgb, m0, v0 = synthetic_pair(64, 96, 3)
    g0 = oracle.rgb_to_gray(rgb)
    gp = multigrid.build_gray_pyramid(jnp.asarray(g0), cfg)

    st = multigrid.initial_depth_state(64, 96, cfg)
    d_s, _ = sharded.solve_vcycle_sharded(
        gp, jnp.asarray(m0), jnp.asarray(v0), st, mesh, cfg, halo=4
    )
    st = multigrid.initial_depth_state(64, 96, cfg)
    d_1, _ = multigrid.solve_vcycle(gp, jnp.asarray(m0), jnp.asarray(v0), st, cfg)
    rmse = float(jnp.sqrt(jnp.mean(((d_s - d_1) / 255.0) ** 2)))
    assert rmse <= 1e-3, rmse


@pytest.mark.slow
def test_batched_step_vcycle_runs():
    """batched_step routes multigrid='vcycle' through solve_vcycle_sharded
    (the round-1 NotImplementedError for config #4 lifted)."""
    mesh = make_mesh(8)
    cfg = DiffusionConfig(max_iterations=16, multigrid="vcycle", vcycles=1,
                          vcycle_coarse_iters=20)
    fn, make_args = sharded.batched_step(mesh, 64, 64, cfg)
    depth, state, out = fn(*make_args(2))
    assert depth.shape == (2, 64, 64)
    d = np.asarray(depth)
    assert d[0, 16, 16] == 254.0  # scribble pinned through the cycles


@pytest.mark.slow
# Slow set: the driver's dryrun_multichip(8) asserts the same Pallas
# solver/defocus routes every round, and the sharded-defocus bit-parity
# and batched-effect tests stay in the fast set.
def test_batched_step_takes_pallas_branch():
    """The batched serving path must run the Pallas halo-block kernels
    in-shard (interpret mode on the CPU mesh) and agree with the XLA-mode
    batched step — the round-1 vmap-over-pallas limitation removed."""
    mesh = make_mesh(8)
    cfg_p = DiffusionConfig(max_iterations=16, backend="pallas_interpret")
    cfg_x = DiffusionConfig(max_iterations=16, backend="xla")
    # The kernel branch must actually be reachable from batched_step:
    assert sharded._use_pallas(cfg_p) == "pallas_interpret"

    fn_p, make_args = sharded.batched_step(mesh, 64, 64, cfg_p)
    fn_x, _ = sharded.batched_step(mesh, 64, 64, cfg_x)
    args = make_args(2)
    d_p, _, out_p = fn_p(*args)
    d_x, _, out_x = fn_x(*args)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=5e-3)
    assert out_p.shape == (2, 64, 64, 3)


def test_batched_step_defocus_effect(monkeypatch):
    """batched_step routes defocus through the shard_map'd Pallas
    marching-corners kernel (sharded_defocus) — the round-1 force-XLA
    limitation removed in round 2 — and the batched Pallas output equals the
    batched XLA formulation exactly."""
    from realtimedepthdiffusion_tpu.core import effects as fx

    mesh = make_mesh(8)
    cfg = DiffusionConfig(max_iterations=12, backend="pallas_interpret")

    calls = []
    real = sharded.sharded_defocus

    def spy(*a, **kw):
        calls.append(a)
        return real(*a, **kw)

    monkeypatch.setattr(sharded, "sharded_defocus", spy)
    fn, make_args = sharded.batched_step(mesh, 64, 64, cfg, effect=fx.EFFECT_DEFOCUS)
    assert calls, "batched_step did not take the sharded Pallas defocus route"
    depth, _, out = fn(*make_args(2))
    assert out.shape == (2, 64, 64, 3) and out.dtype == jnp.uint8
    # Numerical equality with the XLA formulation is asserted by
    # test_batched_step_defocus_pallas_interpret below (same-jit-context
    # expectation — the FMA knife-edge note in PERF.md).


@pytest.mark.slow
def test_sharded_level_pallas_interpret(rng):
    """The multi-chip halo-block path through the Pallas kernel (interpret
    mode on the CPU mesh) matches the jnp in-shard path."""
    mesh = make_mesh(8)
    h, w = 64, 96
    gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
    mask = rng.random((h, w)) < 0.06
    val = rng.integers(0, 255, (h, w), dtype=np.uint8)
    depth = oracle.seed_depth(np.full((h, w), 255.0, np.float32), mask, val)
    args = (jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray))

    cfg_j = DiffusionConfig(backend="xla")
    cfg_p = DiffusionConfig(backend="pallas_interpret")
    got_j = np.asarray(sharded.solve_level_sharded(*args, 1, 1, 13, mesh, cfg_j, halo=4))
    got_p = np.asarray(sharded.solve_level_sharded(*args, 1, 1, 13, mesh, cfg_p, halo=4))
    np.testing.assert_allclose(got_p, got_j, atol=5e-3)
    single = np.asarray(solver.solve_level(*args, 1, 1, 13, cfg_j))
    assert np.sqrt(np.mean(((got_p - single) / 255.0) ** 2)) < 1e-4


def test_sharded_defocus_bitexact(rng):
    """The shard_map'd Pallas defocus (ICI rgb halo exchange + per-block
    marching-corners kernel, interpret mode) is bit-identical to the
    single-image XLA formulation — non-divisible dims exercise the mesh
    padding, and the batch axis the in-shard loop."""
    from realtimedepthdiffusion_tpu.core import effects as fx

    mesh = make_mesh(8)
    b, h, w = 2, 50, 70  # 50 % 2 != 0 is fine; 50/70 not divisible by dy*8
    rgb = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    depth = (rng.random((b, h, w), dtype=np.float32) * 255).astype(np.float32)

    cfg = DiffusionConfig(backend="pallas_interpret")
    apply_fx = sharded.sharded_defocus(mesh, h, w, cfg, mode="pallas_interpret")
    got = np.asarray(apply_fx(jnp.asarray(rgb), jnp.asarray(depth)))
    want = np.stack([
        np.asarray(fx.defocus_xla(jnp.asarray(rgb[i]), jnp.asarray(depth[i]), cfg))
        for i in range(b)
    ])
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_batched_step_defocus_pallas_interpret(rng):
    """batched_step routes the defocus effect through the shard_map'd Pallas
    kernel when the backend asks for Pallas (the round-1 'forces XLA'
    limitation, removed)."""
    from realtimedepthdiffusion_tpu.core import effects as fx

    mesh = make_mesh(8)
    cfg = DiffusionConfig(backend="pallas_interpret")
    fn, make_args = sharded.batched_step(mesh, 48, 64, cfg, effect=fx.EFFECT_DEFOCUS)
    rgb, mask, value, state = make_args(2)
    depth, new_state, out = fn(rgb, mask, value, state)
    cfg_x = DiffusionConfig(backend="xla")
    # The expectation must be computed under jit like the step itself: the
    # window half-width k*d/255 sits on an f32 knife edge for solve outputs
    # like 254.99998 (2*d/255 = 1.9999999 eager vs 2.0 with XLA's FMA
    # contraction), and either rounding is faithful — CUDA contracts too.
    want = np.asarray(
        jax.jit(
            jax.vmap(lambda r, d: fx.defocus_xla(r, jnp.clip(d, 0.0, 255.0), cfg_x))
        )(rgb, depth)
    )
    np.testing.assert_array_equal(np.asarray(out), want)


@pytest.mark.slow
def test_sharded_defocus_thin_block_fallback(rng):
    """Per-chip blocks thinner than the defocus halo (ew = max_half+1) can't
    be served by the halo exchange (the neighbor slices would silently
    truncate); sharded_defocus must fall back to the XLA formulation instead
    of crashing — 32x2048 on a 2x2 spatial mesh gives 16-row blocks vs a
    26-wide halo."""
    from realtimedepthdiffusion_tpu.core import effects as fx

    mesh = make_mesh(8)
    b, h, w = 2, 32, 2048
    rgb = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    depth = (rng.random((b, h, w), dtype=np.float32) * 255).astype(np.float32)
    cfg = DiffusionConfig(backend="pallas_interpret")
    k = cfg.defocus_kernel_size(h, w)
    assert k // 2 + 1 > h // 2, "case must actually be thin"

    apply_fx = sharded.sharded_defocus(mesh, h, w, cfg, mode="pallas_interpret")
    got = np.asarray(apply_fx(jnp.asarray(rgb), jnp.asarray(depth)))
    want = np.stack([
        np.asarray(fx.defocus_xla(jnp.asarray(rgb[i]), jnp.asarray(depth[i]), cfg))
        for i in range(b)
    ])
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_sharded_chebyshev_early_exit_matches_single_chip(rng):
    """The reference-default solver honors the tolerance on the MULTI-CHIP
    path too (round-4 verdict task #2): the pmax/psum'd global residual
    stops the sharded jacobi_chebyshev at the same iterate as the
    single-chip chunked while_loop, (u, prev) carried across chunks with
    the omega schedule dynamic-sliced by global iteration."""
    mesh = make_mesh(8)
    cfg = DiffusionConfig(early_exit=True, residual_check_every=6,
                          tolerance=1e-4)
    h, w = 64, 96
    gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
    mask = rng.random((h, w)) < 0.06
    val = rng.integers(0, 255, (h, w), dtype=np.uint8)
    depth = oracle.seed_depth(np.full((h, w), 255.0, np.float32), mask, val)
    args = (jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray))

    got = np.asarray(
        sharded.solve_level_sharded(*args, 1, 1, 20, mesh, cfg, halo=4)
    )
    want = np.asarray(solver.solve_level(*args, 1, 1, 20, cfg))
    assert np.sqrt(np.mean(((got - want) / 255.0) ** 2)) < 1e-4
    assert np.array_equal(got[mask], depth[mask])


@pytest.mark.slow
def test_sharded_chebyshev_early_exit_runs_truncated_tail(rng):
    """Unreachable tolerance: the sharded early-exit chebyshev completes
    EXACTLY the iteration cap — the while_loop runs full chunks only and
    the GSPMD tail (carrying u AND the Chebyshev prev) owns the remainder
    (20 = 3x6 + 2 here), with the observability probe reporting the full
    budget ran (iters_done == 20, not 18)."""
    mesh = make_mesh(8)
    cfg_ee = DiffusionConfig(early_exit=True, residual_check_every=6,
                             tolerance=1e-12)
    cfg_fx = DiffusionConfig()
    h, w = 64, 96
    gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
    mask = rng.random((h, w)) < 0.06
    val = rng.integers(0, 255, (h, w), dtype=np.uint8)
    depth = oracle.seed_depth(np.full((h, w), 255.0, np.float32), mask, val)
    args = (jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(gray))

    got = np.asarray(
        sharded.solve_level_sharded(*args, 1, 1, 20, mesh, cfg_ee, halo=4)
    )
    want = np.asarray(
        sharded.solve_level_sharded(*args, 1, 1, 20, mesh, cfg_fx, halo=4)
    )
    short = np.asarray(
        sharded.solve_level_sharded(*args, 1, 1, 18, mesh, cfg_fx, halo=4)
    )
    gap = np.sqrt(np.mean(((short - want) / 255.0) ** 2))
    assert gap > 1e-6, f"18-vs-20 gap {gap} too small to guard the tail"
    err = np.sqrt(np.mean(((got - want) / 255.0) ** 2))
    assert err < gap / 10, (err, gap)

    _, done, res = sharded.solve_level_sharded(
        *args, 1, 1, 20, mesh, cfg_ee, halo=4, return_info=True
    )
    assert int(done) == 20, int(done)
    assert float(res) >= cfg_ee.tolerance * 255.0
