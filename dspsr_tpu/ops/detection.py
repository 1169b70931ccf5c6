"""Polarization detection (split-complex).

Equivalent of the reference ``dsp::Detection`` (``Signal/General/Detection.C``)
with the C kernels ``cross_detect.ic`` / ``stokes_detect.ic``:

- Intensity:  PP + QQ                 (square_law, ``Detection.C:218``)
- PPQQ:       |p|^2, |q|^2 separately
- PP / QQ:    one polarization only
- Coherence:  PP, QQ, Re[p* q], Im[p* q]       (``cross_detect.ic:36-40``)
- Stokes:     I=PP+QQ, Q=PP-QQ, U=2 Re[p* q], V=2 Im[p* q]
              (``stokes_detect.ic:38-43``)

Input is split-complex analytic voltages ``(re, im)`` each
``float32[nchan, npol, ndat]`` — or a plain real float32 array (undetected
Nyquist data folds as v^2); output is float32 ``[nchan, npol_out, ndat]``.
Pure VPU elementwise math; XLA fuses it into the preceding inverse FFT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..observation import Signal
from . import sc


def _split(x):
    if isinstance(x, tuple):
        return x
    return x, jnp.zeros_like(x)


def detect_intensity(x) -> jnp.ndarray:
    r, i = _split(x)
    return jnp.sum(r * r + i * i, axis=1, keepdims=True)


def detect_ppqq(x) -> jnp.ndarray:
    r, i = _split(x)
    return r * r + i * i


def detect_coherence(x) -> jnp.ndarray:
    """(re,im)[nchan, 2, ndat] -> [nchan, 4, ndat]: PP, QQ, Re p*q, Im p*q."""
    r, i = _split(x)
    pr, pi = r[:, 0], i[:, 0]
    qr, qi = r[:, 1], i[:, 1]
    pp = pr * pr + pi * pi
    qq = qr * qr + qi * qi
    rpq = pr * qr + pi * qi
    ipq = pr * qi - pi * qr
    return jnp.stack([pp, qq, rpq, ipq], axis=1)


def detect_stokes(x) -> jnp.ndarray:
    """(re,im)[nchan, 2, ndat] -> [nchan, 4, ndat]: I, Q, U, V."""
    r, i = _split(x)
    pr, pi = r[:, 0], i[:, 0]
    qr, qi = r[:, 1], i[:, 1]
    pp = pr * pr + pi * pi
    qq = qr * qr + qi * qi
    return jnp.stack(
        [pp + qq, pp - qq,
         2.0 * (pr * qr + pi * qi),
         2.0 * (pr * qi - pi * qr)],
        axis=1,
    )


def detect_nthpower(x) -> jnp.ndarray:
    """Square-law total power to the nth power (n = 2): (PP+QQ)^2
    (reference ``Signal::NthPower``, ``Detection.C:48``; dspsr -d 3)."""
    p = detect_intensity(x)
    return p * p


def detect(x, state: Signal) -> jnp.ndarray:
    """Dispatch on the requested output state (``Detection::set_output_state``,
    ``Detection.C:42-66``)."""
    if state == Signal.INTENSITY:
        return detect_intensity(x)
    if state == Signal.NTHPOWER:
        return detect_nthpower(x)
    if state == Signal.PPQQ:
        return detect_ppqq(x)
    if state == Signal.PP:
        r, i = _split(x)
        return (r * r + i * i)[:, 0:1]
    if state == Signal.QQ:
        r, i = _split(x)
        return (r * r + i * i)[:, 1:2]
    if state == Signal.COHERENCE:
        return detect_coherence(x)
    if state == Signal.STOKES:
        return detect_stokes(x)
    raise ValueError(f"not a detectable state: {state}")
