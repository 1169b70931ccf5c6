"""Device-mesh construction for the sharded pipelines.

The production multi-device dataflows live in :mod:`parallel.pipeline`
(fold mode, the LoadToFoldN equivalent) and :mod:`parallel.search`
(search mode, LoadToFilN/LoadToFITSN) — one sharded implementation each,
mirroring the reference's single share mechanism
(``Kernel/Classes/InputBufferingShare.C``).  This module holds only the
mesh factory they share.

Mesh axes:

- ``time``: pthread-pool analogue — each shard runs the full single-chip
  op chain on a contiguous stripe of raw bytes (``MultiThread.C``);
- ``chan``: the MPITrans channel scatter (``Kernel/Classes/MPITrans.C``) —
  each shard owns a slice of output channels between the big forward FFT
  and the per-subband inversion.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, nchan_shards: int = 1,
              devices=None) -> Mesh:
    """Build a (time, chan) mesh from the available devices."""
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    if n % nchan_shards:
        raise ValueError(f"n_devices={n} not divisible by nchan_shards={nchan_shards}")
    arr = np.array(devices[:n]).reshape(n // nchan_shards, nchan_shards)
    return Mesh(arr, ("time", "chan"))
