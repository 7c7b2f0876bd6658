"""Configuration for the TPU-native depth-diffusion framework.

Every algorithm constant that is hard-coded in the reference implementation is a
first-class, documented field here, defaulted to the reference value (citations
point into /root/reference):

- ``beta`` / ``max_iterations``:      src/main.cpp:152-153
- ``tolerance``:                      src/main.cpp:264 (declared but unused in the
                                      reference; honored here when
                                      ``early_exit=True``)
- ``chebyshev_s/rho/gamma``:          src/GPUSolver.cu:282-285
- ``pyramid_base_size``:              src/main.cpp:95  (the ``/45`` in the level
                                      count formula)
- ``depth_edge_threshold``:           src/GPUSolver.cu:201-202
- ``brush_fraction``:                 src/main.cpp:154 (2% of min dimension)
- ``haze_beta``:                      src/GPUDepthEffect.cu:87
- ``defocus_aperture``:               src/GPUDepthEffect.cu:42 (0.025 * diagonal)
- ``annotation_sentinel``:            src/main.cpp:163 (gray value 32 =
                                      unannotated)
- ``depth_init``:                     src/main.cpp:109,136 (255 = far)
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Tuple


# The canonical early-exit residual metrics (core/solver.residual_metric_fn
# maps them to functionals; the CLI validates against the same tuple).
VALID_RESIDUAL_METRICS = ("rms", "max")


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """All tunables of the depth-diffusion pipeline.

    Defaults reproduce the reference behavior exactly.
    """

    # --- Edge-weight model (src/GPUSolver.cu:264-272, src/main.cpp:152) ---
    beta: float = 0.4

    # --- Iteration schedule (src/main.cpp:153,263) ---
    max_iterations: int = 1000

    # --- Chebyshev semi-iteration (src/GPUSolver.cu:282-285) ---
    chebyshev_s: int = 10
    chebyshev_rho: float = 0.99
    chebyshev_gamma: float = 0.99

    # --- Pyramid geometry (src/main.cpp:95,103) ---
    pyramid_base_size: int = 45
    # Gray-chain convention: "opencv" (default) reproduces the binary's
    # actual numerics — a ceil-size cv::pyrDown chain consumed cropped to the
    # floor-size solver buffers (bug #1's always-taken CPU fallback,
    # src/main.cpp:241-247 + the rows/cols-vs-pitch mismatch at :266-268);
    # "floor" chains at floor sizes (single clean convention, differs near
    # odd-level borders).
    gray_pyramid: str = "opencv"

    # --- Level-dependent edge rule (src/GPUSolver.cu:201-202) ---
    depth_edge_threshold: int = 4  # 0 is forced at level 0 by the solver

    # --- Convergence control (reference declares tol but never uses it,
    #     src/main.cpp:264; we implement it as an opt-in feature honored by
    #     EVERY solver — jacobi_chebyshev, jacobi, and red_black each run a
    #     chunked residual loop when early_exit is on) ---
    tolerance: float = 1e-5
    early_exit: bool = False
    # Residual check cadence when early_exit is on (sweeps between checks).
    residual_check_every: int = 25
    # Early-exit residual metric, threshold tolerance*255 either way:
    #   "rms" — root-mean-square of |relax(u) - u| over non-scribble pixels.
    #           The metric that can actually fire at fine levels: the
    #           max-norm is pinned at tens of gray levels by a handful of
    #           stubborn weak-edge pixels even after the FULL iteration cap
    #           (measured on Flower L0: max 31.9 vs rms 0.11 at the cap —
    #           PERF.md round-3), so a max-norm exit silently degenerates to
    #           fixed-count exactly where the time is spent.
    #   "max" — max-norm (the round-2 semantics), strictly conservative.
    residual_metric: str = "rms"

    # --- Solver variant: "jacobi_chebyshev" (reference), "jacobi",
    #     "red_black" (red-black Gauss-Seidel, BASELINE.json config #2) ---
    solver: str = "jacobi_chebyshev"
    # Cyclic-Chebyshev (Golub-Varga) SOR omegas on the red-black half-sweeps
    # (core.solver.rb_omegas): ~2x the per-iteration convergence of the
    # reference's Chebyshev-Jacobi, which is what lets config #2's residual
    # early exit win wall-clock (PERF.md round-3). False = plain Gauss-Seidel
    # (the round-2 formulation). Reuses chebyshev_s for the warm-up.
    rb_chebyshev: bool = True
    # Spectral-radius estimate for the red-black schedule. The reference's
    # 0.99 (chebyshev_rho) badly UNDERESTIMATES real image grids, which is
    # fatal for Chebyshev acceleration (the polynomial blows up outside its
    # design interval); overestimating only costs a mild transient. 0.9999
    # measured best on the dataset cascade (PERF.md round-3 sweep: beats
    # both 0.99 and per-level cos(pi/N) on quality AND early-exit cost).
    rb_rho: float = 0.9999

    # --- Multigrid scheme: "cascadic" (reference one-way coarse-to-fine) or
    #     "vcycle" (full V-cycle, BASELINE.json config #4) ---
    multigrid: str = "cascadic"
    # Fraction of max_iterations used by the cascadic warm start before the
    # V-cycles (1.0 = full cascade + polishing cycles; lower values shift
    # work from the cascade onto the cycles).
    vcycle_warm_fraction: float = 1.0
    vcycle_pre_smooth: int = 8
    vcycle_post_smooth: int = 8
    vcycle_coarse_iters: int = 200
    vcycles: int = 2

    # --- Annotation / interaction contract (src/main.cpp:41-43,154,163) ---
    annotation_sentinel: int = 32
    depth_init: float = 255.0
    brush_fraction: float = 0.02

    # --- Effects (src/GPUDepthEffect.cu:42,87) ---
    haze_beta: float = 2.0
    defocus_aperture: float = 0.025
    haze_airlight: float = 255.0

    # --- Incremental/live solve: iteration budget for warm-started re-solves
    #     after small edits (0 = always the full schedule, reference parity).
    #     The live loop's first solve always uses the full budget. ---
    incremental_iterations: int = 0
    # Window side (pixels at level 0, halved per level) for the localized
    # incremental re-solve around the dirty rect; levels whose whole extent
    # fits the scaled window take a full warm re-solve instead. Sized so the
    # window solve runs in the VMEM-resident Pallas kernel.
    incremental_window: int = 384
    # Number of FINE pyramid levels that take the windowed re-solve; all
    # coarser levels re-solve fully (they are microseconds in the resident
    # kernel and carry the edit's whole far field).
    incremental_window_levels: int = 2
    # Maximum simultaneous dirty rects kept separate by the live session
    # (live/session.py): up to this many distant strokes each take the
    # windowed incremental path sequentially (one compiled window program,
    # different centers); overflow merges the nearest rects toward the old
    # single-bounding-rect behavior.
    incremental_max_rects: int = 4
    # Global sweeps per windowed level that polish the injected coarse
    # correction along image edges before the deep window solve. The round-4
    # 39-case ledger (tools/incremental_report.py; PERF.md "Incremental live
    # path") measured worst-case RMSE vs a full re-solve of 0.0262 at gs=0
    # vs 0.0256 at gs=2 — a 2% worst-case gain, localized to three pairs —
    # while each global sweep is a full-plane kernel launch on the
    # latency-critical live path. Off by default; raise for maximum
    # far-field fidelity.
    incremental_global_smooth: int = 0

    # --- Backend selection: "auto" picks Pallas on TPU, pure-XLA elsewhere ---
    backend: str = "auto"
    # Cold-start strategy: serve the FIRST solve(s) from per-level staged
    # programs (6 small XLA modules that compile in parallel, wall ~2-3 s at
    # 1080p) while the fused whole-cascade program — numerically identical,
    # tests/test_fast_start.py — compiles on a background thread (30-160 s
    # over this TPU tunnel, weather-dependent; PERF.md "Startup"). Once the
    # fused executable lands, solves switch to it (one dispatch per frame).
    # Off: the first solve blocks on the fused compile (round-3 behavior).
    # The V-cycle scheme has no staged form and always takes the fused path.
    # Default: on, overridable process-wide with RTDD_FAST_START=0 (the test
    # suite pins it off so routing is deterministic and no background
    # compile competes with the single test CPU).
    fast_start: bool = dataclasses.field(
        default_factory=lambda: os.environ.get(
            "RTDD_FAST_START", "1"
        ).lower() not in ("0", "false")
    )
    # Sweeps fused per grid step (iteration block k) for the Jacobi strip
    # megakernel. k=12 shares k=8's pad_rows (ceil(13/8)*8 == 16), so the
    # deeper block costs zero extra halo; with 272-row strips the round-3
    # K=32 A/B reads 1080p/62it at k=12: 1.215 vs k=8: 1.256 ms (the old
    # k=8 pick came from a min-based A/B against 136-row strips).
    pallas_iter_block: int = 12
    # The red-black megakernel advances 2 rings per iteration (pad_rows =
    # ceil((2k+1)/8)*8), so k=12 GROWS its halo 24 -> 32 rows and measured
    # slower (2.30 vs 2.24 ms at 1080p/62it/272-row strips): rb keeps k=8.
    pallas_iter_block_rb: int = 8
    # Shorter strip levels (h <= pallas_small_level_rows) raise the iteration
    # block to pallas_iter_block_small: with fewer rows per strip the
    # per-grid-step overhead dominates, so fewer, deeper blocks win (median
    # K=32 A/B on v5e: 540-row level 0.82 -> 0.62 ms at k=16; at the tall
    # 272-row strip geometry k=16 and k=8 tie, 24/32 lose — PERF.md).
    pallas_iter_block_small: int = 16
    pallas_small_level_rows: int = 768
    # Deeper iteration block for the u8 derived-weights arena route (4K+):
    # the per-grid-step in-kernel weight materialization (~40 VPU ops/px)
    # amortizes over the block's sweeps, and k=12 shares k=8's pad_rows
    # (ceil(13/8)*8 == ceil(9/8)*8 == 16) so the deeper block costs zero
    # extra halo rows. Median K=6 A/B at 4K on v5e: 6.28 (k=8) -> 5.93 ms
    # (k=12); k=16 measured equal to k=12 but needs pad_rows=24
    # (tools/ab_4k.py, PERF.md).
    pallas_iter_block_uarena: int = 12

    # --- Measured Pallas kernel variants (PERF.md carries the A/Bs). Each
    #     default is the measured winner on TPU v5e; the losers stay
    #     implemented + tested for hardware where the tradeoff flips, and are
    #     now reachable here instead of by editing module constants. ---
    # 3-deep cross-step state-prefetch ring in the strip megakernel (measured
    # ~6-24% SLOWER on v5e: the traced ring index makes state access
    # dynamic-offset, costing more than the DMA wait it hides).
    pallas_state_prefetch: bool = False
    # Copy the arena's four invariant slabs into statically-addressed scratch
    # once per grid step instead of per-sweep dynamic (strip-indexed) reads
    # (measured within noise on v5e).
    pallas_arena_static_copy: bool = False
    # Red-black strips: write the global halo bands inside boundary strip
    # programs instead of a host-level re-zeroing pass between chunked
    # launches (measured SLOWER on v5e: conditional in-kernel DMAs serialize
    # the boundary programs while XLA fuses the host-level pass). Only the
    # chunked fallback consults this; the megakernel never dirties its bands.
    pallas_in_kernel_halo: bool = False
    # Red-black megakernel (all iterations in one launch + VMEM weight
    # arena); False forces the chunked per-block launches (the structure the
    # arena-overflow fallback uses), kept selectable for parity testing.
    pallas_rb_megakernel: bool = True
    # Quadrant-compacted red-black megakernel: checkerboard cells packed
    # into 4 quarter-resolution planes so each color's half-sweep computes
    # only its own cells — one full-plane relaxation per iteration instead
    # of the masked formulation's two, and half the halo (1 compact ring
    # per iteration vs 2 full rings). Iterates agree with the masked path
    # to float-associativity noise (the 5e-3 red-black parity band), not
    # bitwise. Falls back to the masked megakernel when its arena exceeds
    # pallas_arena_vmem_cap.
    #
    # Default OFF: measured REJECTED on v5e (tools/ab_rb.py, PERF.md). The
    # in-kernel iterations are the cheapest of any solver form (~11 us/iter
    # at 1080p vs 21 jacobi / 39 masked-rb), but the checkerboard
    # deinterleave/reinterleave of the 5 planes is a stride-2 relayout XLA
    # executes ~60x off the HBM roofline (~8 ms fixed at 1080p) — it can
    # never amortize over a 62-iteration level. Masked full-width IS the
    # TPU-optimal red-black formulation.
    pallas_rb_compact: bool = False
    # VMEM budget for choosing the fully-resident kernel (bytes). v5e
    # measurement: scaling the resident kernel UP loses to the strip
    # megakernel well before physical VMEM runs out (PERF.md lesson #4).
    pallas_resident_vmem_budget: int = 6 * 1024 * 1024
    # The resident kernel only wins in a middle size band: below this pixel
    # count a level is latency-bound and the strip megakernel's in-block
    # value chaining (no per-sweep VMEM round-trip) is 1.5-2.5x faster
    # (K=16 A/Bs: L3 135x240 0.118 vs 0.292 ms, L4 67x120 0.221 vs 0.327;
    # L2 270x480 — 130k px — still prefers resident, 0.318 vs 0.383).
    pallas_resident_min_px: int = 65536
    # Red-black resident kernel: measured SLOWER than the rb strip
    # megakernel at every size (K=16 A/Bs: L2 0.71 vs 0.60, L3 0.47 vs
    # 0.37, L4 0.61 vs 0.34 ms — each rb round pays TWO per-half-sweep VMEM
    # round-trips in the resident form, while the strip kernel value-chains
    # the whole iteration block). Kept selectable for other hardware.
    pallas_rb_resident: bool = False
    # Manual partial-unroll factor for the VMEM-resident kernel's sweep
    # loop (Mosaic's fori_loop supports only unroll=1 or full unroll).
    # Measured (tools/ab_unroll.py, interleaved K=32 on v5e): unroll=4 buys
    # ~7% on the in-context L4..L2 arm (1.027 -> 0.955 ms, spreads overlap)
    # — the coarse levels are dependency-chain-bound, not loop-overhead-
    # bound. Default 1: value-chaining sweeps inside an unrolled block lets
    # Mosaic contract FMAs across sweep boundaries (~6e-6 drift vs the
    # store-per-sweep form), and shifting the DEFAULT path's bits is not
    # worth 0.07 ms/frame.
    pallas_resident_unroll: int = 1
    # Defocus marching scheme: "corners" = 4 running corner slabs, one
    # (channel x strip) grid step each (the round-2 kernel); "stacked" = the
    # 3 channels ride one vertically-stacked slab per strip (shared
    # half/count math, 3x fewer grid steps). "coldiff" (2 slabs + dynamic
    # sublane reads) is interpret-only: Mosaic rejects its dynamic
    # sublane-offset loads (ops/pallas_defocus.py docstring). All variants
    # are bit-identical; the default is the measured winner on v5e (PERF.md).
    pallas_defocus_variant: str = "corners"
    # VMEM ceiling for the strip kernels' persistent weight arena (v5e has
    # 128 MiB physical VMEM). Levels whose f32 weight arena exceeds it fall
    # back to the u8 derived-weights arena (weights materialized in-kernel
    # from gray/d8 slabs), then to per-step DMA.
    pallas_arena_vmem_cap: int = 112 * 1024 * 1024
    # --- Defocus quality/latency tradeoff (the 4K lever). The exact kernel
    #     marches the per-strip [hv_lo, hv_hi] candidate band (max_half 55
    #     at 4K) and is structurally roll-bound (PERF.md); "approx" SNAPS
    #     each pixel's half-width to a subsampled candidate set — every
    #     half up to pallas_defocus_exact_upto stays exact, larger halves
    #     round to the nearest multiple of pallas_defocus_stride above it —
    #     and the marching loop skips the non-candidates with static stride
    #     rolls. The output is EXACTLY the defocus of the snapped half
    #     field, so the error is bounded by half a stride of window growth
    #     on already-large (>= exact_upto) blur windows; near-focus detail
    #     is untouched. All defocus paths (XLA, Pallas, sharded) snap
    #     identically, so cross-path parity is preserved. Error ledger:
    #     tools/defocus_quality_report.py + PERF.md.
    #
    #     "auto" (default, round 5): exact while max_half <=
    #     pallas_defocus_auto_max_half (bit-parity preserved through every
    #     <=1440p-class geometry, incl. all dataset pairs and the 1080p
    #     headline), bounded-error approx above it (4K+: exact measures
    #     13-20 ms on the upscaled pairs vs the 16 ms budget even with the
    #     round-5 banding — PERF.md), announced with a loud one-time
    #     warning (core/effects.resolved_defocus_quality). ---
    pallas_defocus_quality: str = "auto"
    pallas_defocus_exact_upto: int = 16
    pallas_defocus_stride: int = 4
    # 'auto' threshold: largest aperture max_half served by the exact
    # kernel. 40 covers 1600x2844 (diag ~3265, k 81) and below; the 4K
    # regime (max_half 55) resolves to approx.
    pallas_defocus_auto_max_half: int = 40

    def __post_init__(self):
        # Validate at construction so EVERY surface (library, serving, CLI)
        # fails loudly instead of silently ignoring the request — the
        # reference accepts a tolerance it never honors (src/main.cpp:264);
        # this framework refuses to reproduce that bug.
        if self.residual_metric not in VALID_RESIDUAL_METRICS:
            raise ValueError(
                f"unknown residual_metric {self.residual_metric!r}; "
                f"expected one of {VALID_RESIDUAL_METRICS}"
            )
        if self.pallas_defocus_variant not in ("corners", "stacked", "coldiff"):
            raise ValueError(
                f"unknown pallas_defocus_variant "
                f"{self.pallas_defocus_variant!r}; expected 'corners', "
                f"'stacked' or 'coldiff' (interpret-only)"
            )
        if self.pallas_defocus_quality not in ("auto", "exact", "approx"):
            raise ValueError(
                f"unknown pallas_defocus_quality "
                f"{self.pallas_defocus_quality!r}; expected 'auto', 'exact' "
                f"or 'approx'"
            )
        if self.pallas_defocus_quality in ("auto", "approx"):
            # auto can resolve to approx, so its knobs validate too
            if self.pallas_defocus_exact_upto < 1:
                raise ValueError(
                    "pallas_defocus_exact_upto must be >= 1 (half-widths up "
                    f"to it stay exact); got {self.pallas_defocus_exact_upto}"
                )
            if self.pallas_defocus_stride < 2:
                raise ValueError(
                    "pallas_defocus_stride must be >= 2 (1 is the exact "
                    f"kernel); got {self.pallas_defocus_stride}"
                )
        if (
            self.pallas_defocus_variant == "coldiff"
            and self.backend != "pallas_interpret"
        ):
            # Mosaic rejects coldiff's dynamic sublane-offset loads, so the
            # kernel cannot compile on TPU hardware (ops/pallas_defocus.py
            # docstring; measured record in PERF.md). Fencing it to the
            # interpreter at CONSTRUCTION keeps every product surface free
            # of a selectable variant that cannot run where it matters.
            raise ValueError(
                "pallas_defocus_variant='coldiff' is interpret-only (Mosaic "
                "rejects its dynamic sublane loads on TPU); select it with "
                "backend='pallas_interpret'"
            )

    def num_levels(self, rows: int, cols: int) -> int:
        """Pyramid depth: log2(max(min(W,H)/base,1))+1 (src/main.cpp:95).

        Matches C's int truncation of ``log2`` applied to the *integer*
        quotient min(W,H)/45.
        """
        q = max(min(rows, cols) // self.pyramid_base_size, 1)
        return int(math.log2(q)) + 1

    def level_size(self, rows: int, cols: int, level: int) -> Tuple[int, int]:
        """Per-level size with floor division (src/main.cpp:103).

        The reference mixes floor (its own buffers) and ceil (OpenCV) pyramid
        conventions — quirk #7 in SURVEY.md. This framework owns a single
        convention: floor everywhere.
        """
        return rows >> level, cols >> level

    def level_iterations(self, num_levels: int, level: int) -> int:
        """iters = max_iterations / 2^((L-1)-level), truncated
        (src/main.cpp:263): 1000, 500, 250, 125, 62 ... coarse-to-fine."""
        return int(self.max_iterations / (2.0 ** ((num_levels - 1) - level)))

    def brush_radius(self, rows: int, cols: int) -> int:
        """Initial scribble brush side (src/main.cpp:154)."""
        return int(min(rows, cols) * self.brush_fraction)

    def defocus_kernel_size(self, rows: int, cols: int) -> int:
        """Max defocus window: 0.025 * image diagonal (src/GPUDepthEffect.cu:42)."""
        return int(self.defocus_aperture * math.sqrt(rows * rows + cols * cols))


DEFAULT_CONFIG = DiffusionConfig()

# The five discrete scribble depth values selectable with keys '0'..'4'
# (src/main.cpp:41-43): min((key-'0')*64, 254).
SCRIBBLE_DEPTH_VALUES = (0, 64, 128, 192, 254)
