"""Spectral-kurtosis RFI excision.

Equivalent of the reference ``dsp::SpectralKurtosis`` + SKComputer/SKDetector/
SKMasker (``Signal/General/SpectralKurtosis.C``, ``SKDetector.C``,
``SKMasker.C``; estimator after Nita & Gary 2010): for every channel and
block of M power samples compute::

    S1 = sum p_i,  S2 = sum p_i^2
    SK = (M+1)/(M-1) * (M * S2 / S1^2 - 1)

SK ~ 1 for Gaussian noise; non-Gaussian interference pushes it outside the
Pearson-IV +/- n-sigma thresholds (utils.stats.sk_limits) and the block is
masked (weight 0).  Three detection rounds as in the reference:

- per (chan, block) cells  (``SKDetector::detect``)
- time-scrunched: SK over the whole block span per channel
  (``detect_tscr`` — catches persistent narrow-band RFI)
- freq-scrunched: SK summed across channels per block
  (``detect_fscr`` — catches broadband impulsive RFI)

All device math is elementwise/reduction ops; weights multiply into the
pipeline's existing WeightedTimeSeries-style weight stream.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.stats import sk_limits


@dataclass(frozen=True)
class SKPlan:
    """Static SK geometry + thresholds (host side)."""

    M: int  # samples per SK cell (reference -skm, typically 128)
    std_devs: int = 3
    detect_cell: bool = True
    detect_tscr: bool = True
    detect_fscr: bool = True
    #: restrict excision to output channels [chan_start, chan_end)
    #: (reference --skz_start/--skz_end "channels where signal is
    #: expected"; 0, 0 = the whole band)
    chan_start: int = 0
    chan_end: int = 0

    def thresholds(self, m: int | None = None) -> Tuple[float, float]:
        t = sk_limits(m or self.M, self.std_devs)
        return t.lower, t.upper


def sk_estimate(p: jnp.ndarray, M: int) -> jnp.ndarray:
    """SK per cell. p: float32[..., nblk, M] detected power.

    Returns float32[..., nblk].
    """
    s1 = jnp.sum(p, axis=-1)
    s2 = jnp.sum(p * p, axis=-1)
    Mf = float(M)
    return ((Mf + 1.0) / (Mf - 1.0)) * (Mf * s2 / jnp.maximum(s1 * s1, 1e-30) - 1.0)


@partial(jax.jit,
         static_argnames=("plan", "nblk", "axis_name", "nchan_total"))
def sk_mask(power: jnp.ndarray, plan: SKPlan, nblk: int,
            axis_name: str = None, nchan_total: int = 0,
            chan_offset=None) -> jnp.ndarray:
    """Compute the SK excision mask for one block.

    Args:
      power: float32[nchan, npol, ndat] per-polarization power |x|^2
        (``ndat >= nblk * plan.M``) — the reference computes SK per
        (chan, pol) on the undetected voltages' square-law power
        (``SpectralKurtosis::compute``, ``SpectralKurtosis.C:260-341``),
        then zaps a (chan, block) cell if ANY pol trips.
      axis_name/nchan_total/chan_offset: set when running inside a
        channel-sharded ``shard_map`` (``power`` is the local channel
        slice): the freq-scrunched round pools S1/S2 with a ``psum`` over
        ``axis_name`` so its thresholds use the GLOBAL Nd = nchan_total
        (exactly the single-device detection; the reference's detect_fscr
        pools the whole band), and the --skz_start/--skz_end channel range
        is interpreted in global channel indices via ``chan_offset``.

    Returns weights float32[nchan, nblk]: 1 keep, 0 zap.
    """
    nchan, npol = power.shape[0], power.shape[1]
    M = plan.M
    cells = power[:, :, : nblk * M].reshape(nchan, npol, nblk, M)

    w = jnp.ones((nchan, nblk), jnp.float32)

    if plan.detect_cell:
        lo, hi = plan.thresholds()
        sk = sk_estimate(cells, M)  # [nchan, npol, nblk]
        good = jnp.min(jnp.logical_and(sk > lo, sk < hi).astype(jnp.float32),
                       axis=1)
        w = w * good

    if plan.detect_tscr and nblk > 1:
        # whole-block SK per (chan, pol) (reference detect_tscr): one cell of
        # M*nblk samples; a bad channel zaps all its blocks
        lo_t, hi_t = plan.thresholds(M * nblk)
        sk_t = sk_estimate(cells.reshape(nchan, npol, 1, nblk * M),
                           M * nblk)[:, :, 0]
        good_t = jnp.min(
            jnp.logical_and(sk_t > lo_t, sk_t < hi_t).astype(jnp.float32),
            axis=1)
        w = w * good_t[:, None]

    if plan.detect_fscr and (nchan > 1 or axis_name is not None):
        # sum S1/S2 across channels per (pol, block) (reference detect_fscr,
        # which pools the per-channel sums): Nd = nchan generalized estimator
        s1 = jnp.sum(cells, axis=-1)  # [nchan, npol, nblk]
        s2 = jnp.sum(cells * cells, axis=-1)
        s1f = jnp.sum(s1, axis=0)  # [npol, nblk]
        s2f = jnp.sum(s2, axis=0)
        if axis_name is not None:
            # channel-sharded: pool the whole band over the mesh axis so
            # the generalized estimator uses the global Nd
            s1f = jax.lax.psum(s1f, axis_name)
            s2f = jax.lax.psum(s2f, axis_name)
        Mf = float(M)
        nd = float(nchan_total if axis_name is not None else nchan)
        sk_f = ((Mf * nd + 1.0) / (Mf * nd - 1.0)) * (
            Mf * nd * s2f / jnp.maximum(s1f * s1f, 1e-30) - 1.0)
        one_std = np.sqrt(4.0 / (M * nd))
        lo_g = 1.0 - plan.std_devs * one_std
        hi_g = 1.0 + plan.std_devs * one_std
        good_f = jnp.min(
            jnp.logical_and(sk_f > lo_g, sk_f < hi_g).astype(jnp.float32),
            axis=0)
        w = w * good_f[None, :]

    if plan.chan_start or plan.chan_end:
        # excision limited to the channel range where signal is expected
        # (reference SKDetector channel range, --skz_start/--skz_end);
        # under channel sharding the range is in GLOBAL channel indices
        end = plan.chan_end or (nchan_total if axis_name is not None
                                else nchan)
        ix = jnp.arange(nchan)
        if chan_offset is not None:
            ix = ix + chan_offset
        in_range = jnp.logical_and(ix >= plan.chan_start, ix < end)
        w = jnp.where(in_range[:, None], w, 1.0)

    return w


@partial(jax.jit, static_argnames=("M",))
def expand_mask(w: jnp.ndarray, M: int) -> jnp.ndarray:
    """[nchan, nblk] block weights -> [nchan, nblk*M] per-sample weights."""
    nchan, nblk = w.shape
    return jnp.broadcast_to(w[:, :, None], (nchan, nblk, M)).reshape(nchan, nblk * M)
