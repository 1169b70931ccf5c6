"""Multi-device sharded fold on a virtual 8-device CPU mesh.

Demonstrates the (time, chan) mesh: ppermute halo exchange for overlap-save
edges, channel-sharded inverse FFT/detect/fold, psum profile reduction.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python examples/multichip_fold.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import __graft_entry__ as g

    g.dryrun_multichip(len(jax.devices()))


if __name__ == "__main__":
    main()
