"""Multi-chip sharded fold pipeline.

TPU-native replacement for the reference's three scale-out mechanisms
(SURVEY.md §2.5):

- pthread time-block pipeline replication (``MultiThread.C``)  -> the mesh
  "time" axis: each device processes a contiguous run of FFT windows;
- InputBuffering/Seekable overlap handoff (``InputBuffering.C``) -> a
  ``lax.ppermute`` halo exchange of the overlap-save edge samples between
  neighbouring time shards over ICI;
- MPITrans channel scatter (``MPITrans.C``) -> the mesh "chan" axis: each
  device inverse-FFTs, detects and folds its own subset of filterbank
  subbands;
- ``PhaseSeries::combine`` thread reduction (``Fold.C:106-121``) -> a
  ``psum`` of the fold accumulators over the time axis (tiny payload:
  nbin x nchan x npol floats + hits, exactly like the reference).

Halo convention: shard i's last window needs ``nsamp_overlap`` samples from
shard i+1; shards exchange heads circularly, so the *last* time shard's final
window(s) would fold wrapped (wrong) data — they are masked out and the host
advances the superblock stride so those windows are re-processed by the next
superblock (the moral equivalent of InputBuffering's carried tail).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..observation import Observation, Signal
from ..ops import sc
from ..ops.convolution import OverlapSavePlan, frame, frame_sc
from ..ops.filterbank import FilterbankPlan
from ..ops.fold import FoldPlan
from ..ops.detection import detect as _detect
from ..ops.mxfft import fft_sc, ifft_sc, rfft_sc, fftshift_sc, ifftshift_sc


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


@dataclass(frozen=True)
class ShardedFoldPlan:
    """Static geometry for the sharded step."""

    fb: FilterbankPlan  # channelizer geometry (nchan_subband may be 1)
    fold: FoldPlan
    npart_local: int  # windows per time shard
    nchan_in: int
    npol: int
    det_state: Signal

    @property
    def shard_in_samples(self) -> int:
        """Raw input samples per time shard (no halo)."""
        return self.npart_local * self.fb.nsamp_step

    @property
    def halo_samples(self) -> int:
        return self.fb.nsamp_overlap

    def superblock_samples(self, n_time: int) -> int:
        """Input samples to read for one superblock (incl. trailing halo)."""
        return n_time * self.shard_in_samples + self.halo_samples

    def masked_windows(self) -> int:
        """Trailing windows of the last time shard that fold wrapped halo
        data and must be masked (re-processed next superblock)."""
        if self.halo_samples == 0:
            return 0
        return math.ceil(self.halo_samples / self.fb.nsamp_step)

    def superblock_stride(self, n_time: int) -> int:
        """Host advance between superblocks: masked windows are re-read."""
        return n_time * self.shard_in_samples - self.masked_windows() * self.fb.nsamp_step

    @property
    def nchan_out(self) -> int:
        return self.nchan_in * self.fb.nchan_subband

    @property
    def out_per_window(self) -> int:
        return self.fb.nkeep

    def out_per_shard(self) -> int:
        return self.npart_local * self.fb.nkeep


def build_sharded_step(
    mesh: Mesh,
    plan: ShardedFoldPlan,
    response_natural,  # split-complex (re, im) [nchan_out, freq_res] or None
    nbit: int,
    twos_complement: bool = False,
):
    """Build the jitted multi-device fold step.

    Returns step(profiles, hits, raw, phi0, dphi, window_mask) where:
      profiles: f32[nchan_out, npol_det, nbin]  (replicated over time,
                sharded over chan)
      raw: uint8[n_time, shard_bytes] one row per time shard
      phi0/dphi: f32[n_time, nseg_local] segment anchors per shard
      window_mask: f32[n_time, npart_local] 1=fold, 0=skip (wrap masking)
    """
    n_time = mesh.shape["time"]
    n_chan = mesh.shape["chan"]
    fb = plan.fb
    if plan.nchan_out % n_chan:
        raise ValueError(
            f"nchan_out={plan.nchan_out} not divisible by chan shards={n_chan}")
    nchan_local = plan.nchan_out // n_chan
    npol_det = {Signal.INTENSITY: 1, Signal.PP: 1, Signal.QQ: 1,
                Signal.PPQQ: 2, Signal.COHERENCE: 4, Signal.STOKES: 4}[plan.det_state]

    from ..unpack.unpackers import unpack_fixed

    def local_step(profiles, hits, raw, phi0, dphi, wmask):
        # shapes inside shard_map: raw[1, shard_bytes]; profiles[nchan_local,..]
        raw = raw[0]
        phi0, dphi, wmask = phi0[0], dphi[0], wmask[0]

        # ---- unpack (device-side, fused; arithmetic level map) ----
        ndim = 1 if fb.real_input else 2
        x = unpack_fixed(raw, nbit, plan.nchan_in, plan.npol, ndim,
                         twos_complement=twos_complement)
        # x: [nchan_in, npol, shard_in_samples] (split-complex pair if ndim=2)

        # ---- halo exchange over ICI (InputBuffering::Share equivalent) ----
        if plan.halo_samples > 0:
            perm = [(i, (i - 1) % n_time) for i in range(n_time)]

            def exchange(a):
                halo = a[..., : plan.halo_samples]
                from_right = jax.lax.ppermute(halo, "time", perm)
                return jnp.concatenate([a, from_right], axis=-1)

            if fb.real_input:
                x = exchange(x)
            else:
                x = (exchange(x[0]), exchange(x[1]))

        # ---- channelize via the shared ops-layer stages (the sharded and
        # single-chip paths run the SAME filterbank code; the chan slice sits
        # between the forward FFT and the per-subband inversion) ----
        from ..ops.filterbank import (
            forward_spectra_chunked, apply_response_chunked, invert_subbands)

        spec = forward_spectra_chunked(x, fb, plan.npart_local)
        ci = jax.lax.axis_index("chan")
        spec = tuple(
            jax.lax.dynamic_slice_in_dim(a, ci * nchan_local, nchan_local, 0)
            for a in spec)
        resp = None
        if response_natural is not None:
            resp = tuple(
                jax.lax.dynamic_slice_in_dim(r, ci * nchan_local, nchan_local, 0)
                for r in response_natural)
        spec = apply_response_chunked(
            spec, resp, nchan_sub_present=min(fb.nchan_subband, nchan_local))
        y = invert_subbands(spec, fb)

        # ---- detect ----
        d = _detect(y, plan.det_state)

        # ---- fold (window mask suppresses wrapped-halo windows) ----
        wm = jnp.broadcast_to(
            wmask[:, None], (plan.npart_local, fb.nkeep)).reshape(-1)
        nuse = (d.shape[-1] // plan.fold.seg_len) * plan.fold.seg_len
        weights = jnp.broadcast_to(wm[:nuse], (nchan_local, nuse))
        from ..ops.fold import fold_block

        # fold this shard's contribution into fresh accumulators, reduce the
        # *delta* over the time axis (PhaseSeries::combine), then add to the
        # carried accumulators (which are replicated across time shards)
        dprof, dhits = fold_block(
            jnp.zeros_like(profiles), jnp.zeros_like(hits),
            d[..., :nuse], weights, phi0, dphi, plan.fold)
        dprof = jax.lax.psum(dprof, "time")
        dhits = jax.lax.psum(dhits, "time")
        return profiles + dprof, hits + dhits

    smapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P("chan"),  # profiles sharded over chan (replicated over time)
            P("chan"),
            P("time"),  # raw rows
            P("time"),
            P("time"),
            P("time"),
        ),
        out_specs=(P("chan"), P("chan")),
        check_vma=False,
    )

    @jax.jit
    def step(profiles, hits, raw, phi0, dphi, wmask):
        return smapped(profiles, hits, raw, phi0, dphi, wmask)

    return step


def host_superblock_layout(plan: ShardedFoldPlan, n_time: int):
    """Byte ranges per shard for one superblock starting at input sample s0:
    shard i reads samples [s0 + i*shard, s0 + (i+1)*shard) — with the halo
    coming over ICI, hosts read disjoint ranges (the MPIRoot scatter,
    without the root)."""
    shard = plan.shard_in_samples
    return [(i * shard, shard) for i in range(n_time)]
