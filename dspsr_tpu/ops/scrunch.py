"""Decimation and reshaping ops: T/F/P scrunch, pol select, frequency zoom.

Equivalents of the reference ``Signal/General/TScrunch.C``, ``FScrunch.C``,
``PScrunch.C``, ``PolnSelect.C``, ``FZoom.C`` — simple reductions that XLA
fuses into neighbouring ops.  All operate on detected FPT data
``float32[nchan, npol, ndat]`` (or complex for pol select).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..observation import Observation, Signal


@partial(jax.jit, static_argnames=("factor",))
def tscrunch(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Sum groups of ``factor`` consecutive time samples (reference
    ``TScrunch``; dspsr sums rather than averages)."""
    if factor <= 1:
        return x
    nchan, npol, ndat = x.shape
    n = (ndat // factor) * factor
    return jnp.sum(x[..., :n].reshape(nchan, npol, n // factor, factor), axis=-1)


@partial(jax.jit, static_argnames=("factor",))
def fscrunch(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Sum groups of ``factor`` adjacent channels (reference ``FScrunch``)."""
    if factor <= 1:
        return x
    nchan, npol, ndat = x.shape
    n = (nchan // factor) * factor
    return jnp.sum(x[:n].reshape(n // factor, factor, npol, ndat), axis=1)


@jax.jit
def pscrunch(x: jnp.ndarray) -> jnp.ndarray:
    """Sum polarizations to total intensity (reference ``PScrunch``).

    For PPQQ input this is I = PP+QQ; for Stokes input keep I only.
    """
    return jnp.sum(x, axis=1, keepdims=True)


def pscrunch_state(x: jnp.ndarray, state: Signal) -> jnp.ndarray:
    if state == Signal.STOKES:
        return x[:, 0:1]
    return pscrunch(x)


@partial(jax.jit, static_argnames=("ipol",))
def poln_select(x: jnp.ndarray, ipol: int) -> jnp.ndarray:
    """Keep a single polarization (reference ``PolnSelect``)."""
    return x[:, ipol : ipol + 1]


@partial(jax.jit, static_argnames=("chan_lo", "nkeep"))
def fzoom(x: jnp.ndarray, chan_lo: int, nkeep: int) -> jnp.ndarray:
    """Keep a contiguous range of channels (reference ``FZoom``)."""
    return jax.lax.dynamic_slice_in_dim(x, chan_lo, nkeep, 0)


def update_observation_tscrunch(obs: Observation, factor: int) -> Observation:
    return obs.replace(rate=obs.rate / factor)


def update_observation_fscrunch(obs: Observation, factor: int) -> Observation:
    return obs.replace(nchan=obs.nchan // factor)


def update_observation_fzoom(obs: Observation, chan_lo: int, nkeep: int) -> Observation:
    f_lo = obs.centre_frequency_of(chan_lo)
    f_hi = obs.centre_frequency_of(chan_lo + nkeep - 1)
    return obs.replace(
        nchan=nkeep,
        centre_frequency=0.5 * (f_lo + f_hi),
        bandwidth=obs.chan_bandwidth * nkeep,
    )


def poln_reshape(x, from_state, to_state):
    """Reshape/convert detected polarization products between layouts
    (reference ``dsp::PolnReshape``, ``Signal/General/PolnReshape.C``):
    Coherence (AA,BB,Re,Im) <-> Stokes (I,Q,U,V), or either -> Intensity.

    x: float32[nchan, 4, ndat] (or [nchan, >=2, ndat] for -> Intensity).
    """
    import jax.numpy as jnp

    from ..observation import Signal

    if from_state == to_state:
        return x
    if to_state == Signal.INTENSITY:
        if from_state == Signal.STOKES:
            return x[:, 0:1]
        return x[:, 0:1] + x[:, 1:2]  # AA+BB (Coherence or PPQQ)
    if from_state == Signal.COHERENCE and to_state == Signal.STOKES:
        aa, bb, re, im = x[:, 0], x[:, 1], x[:, 2], x[:, 3]
        return jnp.stack([aa + bb, aa - bb, 2 * re, 2 * im], axis=1)
    if from_state == Signal.STOKES and to_state == Signal.COHERENCE:
        i, q, u, v = x[:, 0], x[:, 1], x[:, 2], x[:, 3]
        return jnp.stack([(i + q) / 2, (i - q) / 2, u / 2, v / 2], axis=1)
    raise ValueError(f"unsupported reshape {from_state} -> {to_state}")
