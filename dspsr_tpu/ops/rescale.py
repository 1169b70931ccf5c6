"""Running mean/scale removal for search-mode output levelling.

Equivalent of the reference ``dsp::Rescale`` (``Signal/General/Rescale.C``):
subtracts a per-(chan,pol) mean and divides by a per-(chan,pol) scale
(1/std), updated from the data itself either every block, on a fixed
interval, or frozen after the first estimate (``digifil -I 0``).

Functional formulation: state (count, sum, sumsq) is carried by the caller;
``rescale_block`` both applies the current scales and returns updated state,
so the whole thing lives inside the per-block jit program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class RescaleState(NamedTuple):
    count: jnp.ndarray  # f64/f32 scalar-per-(chan,pol) sample count
    total: jnp.ndarray  # [nchan, npol] running sum
    sumsq: jnp.ndarray  # [nchan, npol] running sum of squares

    @classmethod
    def zeros(cls, nchan: int, npol: int) -> "RescaleState":
        return cls(
            count=jnp.zeros((nchan, npol), jnp.float32),
            total=jnp.zeros((nchan, npol), jnp.float32),
            sumsq=jnp.zeros((nchan, npol), jnp.float32),
        )


def state_mean_scale(state: RescaleState) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n = jnp.maximum(state.count, 1.0)
    mean = state.total / n
    var = jnp.maximum(state.sumsq / n - mean * mean, 1e-30)
    return mean, jax.lax.rsqrt(var)


@partial(jax.jit, static_argnames=("freeze",))
def rescale_block(
    state: RescaleState, x: jnp.ndarray, freeze: bool = False,
    weights=None,
) -> Tuple[RescaleState, jnp.ndarray]:
    """Apply (x - mean) * inv_std using statistics accumulated *including*
    this block (matching Rescale's per-interval update), and return updated
    state.  With ``freeze`` the state is not updated (digifil constant
    offset/scale mode).

    ``weights`` (optional float32[nchan, ndat], 0/1): bad samples are
    excluded from the statistics and zeroed in the output (the reference
    threads WeightedTimeSeries weights through Rescale)."""
    state = accumulate(state, x, weights) if not freeze else state
    mean, inv = state_mean_scale(state)
    return state, apply_scales(x, mean, inv, weights)


def accumulate(state: RescaleState, x: jnp.ndarray,
               weights=None) -> RescaleState:
    if weights is None:
        return RescaleState(
            count=state.count + x.shape[-1],
            total=state.total + jnp.sum(x, axis=-1),
            sumsq=state.sumsq + jnp.sum(x * x, axis=-1),
        )
    w = weights[:, None, :]
    return RescaleState(
        count=state.count + jnp.sum(w, axis=-1),
        total=state.total + jnp.sum(x * w, axis=-1),
        sumsq=state.sumsq + jnp.sum(x * x * w, axis=-1),
    )


def apply_scales(x: jnp.ndarray, mean: jnp.ndarray, inv: jnp.ndarray,
                 weights=None) -> jnp.ndarray:
    y = (x - mean[:, :, None]) * inv[:, :, None]
    if weights is not None:
        y = y * weights[:, None, :]
    return y


@jax.jit
def bandpass_from_state(state: RescaleState) -> jnp.ndarray:
    """Mean bandpass per chan/pol (the reference BandpassMonitor output)."""
    mean, _ = state_mean_scale(state)
    return mean
