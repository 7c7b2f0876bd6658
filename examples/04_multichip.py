"""The batched multi-chip step on a jax.sharding.Mesh.

`parallel.sharded.batched_step` is the framework's scale-out unit: data
parallelism over a batch of images ('batch' axis) x 2-D spatial sharding
within each image ('dy','dx'), with k-wide `ppermute` halo exchanges over
ICI between k-sweep solver blocks (ARCHITECTURE.md "Multi-chip design").
`rtdd-serve --multichip` drives exactly this step over directory pairs.

Without real multi-chip hardware, run it on a virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/04_multichip.py
"""

# Allow running from a source checkout without `pip install -e .`:
# the script's own dir (examples/) is on sys.path, the repo root is not.
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import jax

# Honor a JAX_PLATFORMS request from the environment explicitly: containers
# whose boot hooks register an accelerator plugin can override the env var
# after import, silently turning the documented 8-device virtual-CPU run
# into a 1-device accelerator run (same workaround as __graft_entry__).
if _os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception as _e:
        # A failed override must be visible: silently proceeding on whatever
        # backend the container picked is the exact surprise this re-apply
        # exists to prevent.
        print(
            f"warning: could not apply JAX_PLATFORMS="
            f"{_os.environ['JAX_PLATFORMS']!r}: {_e}",
            file=_sys.stderr,
        )

from realtimedepthdiffusion_tpu.config import DiffusionConfig
from realtimedepthdiffusion_tpu.core import effects
from realtimedepthdiffusion_tpu.parallel.mesh import make_mesh
from realtimedepthdiffusion_tpu.parallel.sharded import batched_step


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rows", type=int, default=128)
    p.add_argument("--cols", type=int, default=192)
    p.add_argument("--iterations", type=int, default=100)
    args = p.parse_args(argv)

    mesh = make_mesh()  # all visible devices -> ('batch','dy','dx')
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    cfg = DiffusionConfig(max_iterations=args.iterations)
    fn, make_example_args = batched_step(
        mesh, rows=args.rows, cols=args.cols, cfg=cfg, effect=effects.EFFECT_HAZE
    )
    batch_args = make_example_args(mesh.shape["batch"])
    depth, state, art = fn(*batch_args)
    jax.block_until_ready((depth, state, art))
    print(f"depth batch {depth.shape} {depth.dtype}; effect batch {art.shape} {art.dtype}")
    return depth


if __name__ == "__main__":
    main()
