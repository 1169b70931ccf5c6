"""Polarization detection.

Equivalent of the reference ``dsp::Detection`` (``Signal/General/Detection.C``)
with the C kernels ``cross_detect.ic`` / ``stokes_detect.ic``:

- Intensity:  PP + QQ                 (square_law, ``Detection.C:218``)
- PPQQ:       |p|^2, |q|^2 separately
- PP / QQ:    one polarization only
- Coherence:  PP, QQ, Re[p* q], Im[p* q]       (``cross_detect.ic:36-40``)
- Stokes:     I=PP+QQ, Q=PP-QQ, U=2 Re[p* q], V=2 Im[p* q]
              (``stokes_detect.ic:38-43``)

Input is analytic voltages ``complex64[nchan, npol, ndat]``; output is
float32 ``[nchan, npol_out, ndat]``.  (The reference also supports ndim=2/4
interleaved output layouts — ``Detection.C:42-66`` — which are memory-layout
variants of the same numbers; the TPU build keeps the planar [nchan,npol,ndat]
layout and lets XLA choose physical layout.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..observation import Signal


def _pp(x):
    return (x.real * x.real + x.imag * x.imag).astype(jnp.float32)


@jax.jit
def detect_intensity(x: jnp.ndarray) -> jnp.ndarray:
    """[nchan, npol, ndat] complex -> [nchan, 1, ndat] total intensity."""
    return jnp.sum(_pp(x), axis=1, keepdims=True)


@jax.jit
def detect_ppqq(x: jnp.ndarray) -> jnp.ndarray:
    return _pp(x)


@jax.jit
def detect_coherence(x: jnp.ndarray) -> jnp.ndarray:
    """[nchan, 2, ndat] complex -> [nchan, 4, ndat]: PP, QQ, Re p*q, Im p*q."""
    p = x[:, 0]
    q = x[:, 1]
    pq = jnp.conj(p) * q
    return jnp.stack(
        [_pp(p[:, None])[:, 0], _pp(q[:, None])[:, 0],
         pq.real.astype(jnp.float32), pq.imag.astype(jnp.float32)],
        axis=1,
    )


@jax.jit
def detect_stokes(x: jnp.ndarray) -> jnp.ndarray:
    """[nchan, 2, ndat] complex -> [nchan, 4, ndat]: I, Q, U, V."""
    p = x[:, 0]
    q = x[:, 1]
    pp = p.real * p.real + p.imag * p.imag
    qq = q.real * q.real + q.imag * q.imag
    pq = jnp.conj(p) * q
    return jnp.stack(
        [
            (pp + qq).astype(jnp.float32),
            (pp - qq).astype(jnp.float32),
            (2.0 * pq.real).astype(jnp.float32),
            (2.0 * pq.imag).astype(jnp.float32),
        ],
        axis=1,
    )


def detect(x: jnp.ndarray, state: Signal) -> jnp.ndarray:
    """Dispatch on the requested output state (``Detection::set_output_state``,
    ``Detection.C:42-66``)."""
    if state == Signal.INTENSITY:
        return detect_intensity(x)
    if state == Signal.PPQQ:
        return detect_ppqq(x)
    if state == Signal.PP:
        return _pp(x[:, 0:1])
    if state == Signal.QQ:
        return _pp(x[:, 1:2])
    if state == Signal.COHERENCE:
        return detect_coherence(x)
    if state == Signal.STOKES:
        return detect_stokes(x)
    raise ValueError(f"not a detectable state: {state}")
