"""Model-family facade + I/O codec tests."""

import numpy as np
import pytest

from realtimedepthdiffusion_tpu.io import depth_to_u8, imread_rgb, imwrite
from realtimedepthdiffusion_tpu.models import (
    ChebyshevCascade,
    JacobiCascade,
    RedBlackCascade,
    VCycle,
)
from tests.conftest import synthetic_pair


@pytest.mark.parametrize(
    "family",
    [
        ChebyshevCascade,
        JacobiCascade,
        RedBlackCascade,
        # VCycle solves twice the levels; its residual property is anchored
        # fast in test_multigrid.py, the family smoke rides slow.
        pytest.param(VCycle, marks=pytest.mark.slow),
    ],
)
def test_model_families_solve(family):
    rgb, mask, value = synthetic_pair(64, 80, 4)
    model = family(max_iterations=60)
    depth = model.solve(rgb, mask, value)
    assert depth.shape == (64, 80) and depth.dtype == np.float32
    assert np.array_equal(depth[mask], value[mask].astype(np.float32))
    art = model.render(rgb, np.clip(depth, 0, 255), "h")
    assert art.shape == rgb.shape and art.dtype == np.uint8


def test_model_warm_start():
    rgb, mask, value = synthetic_pair(64, 80, 5)
    model = ChebyshevCascade(max_iterations=60)
    d1, state = model.solve_with_state(rgb, mask, value)
    d2, _ = model.solve_with_state(rgb, mask, value, state)
    # warm re-solve only refines; scribbles stay pinned
    assert np.array_equal(d2[mask], value[mask].astype(np.float32))


def test_imwrite_imread_roundtrip(tmp_path, rng):
    rgb = rng.integers(0, 256, (31, 47, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    imwrite(p, rgb)
    assert np.array_equal(imread_rgb(p), rgb)


def test_depth_to_u8_rounding():
    d = np.array([-5.0, 0.4, 0.5, 1.5, 2.5, 254.6, 300.0], np.float32)
    # saturating cast with round-half-to-even (cv::saturate_cast semantics)
    assert depth_to_u8(d).tolist() == [0, 0, 0, 2, 2, 255, 255]
