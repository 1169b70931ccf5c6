"""MXU-native FFT: factorized DFT as batched matrix multiplies.

The TPU's matrix unit does dense matmuls at hundreds of TFLOP/s; its
execution path here exposes no FFT primitive (and no complex dtype).  So the
FFT is built the MXU way: a mixed-radix Cooley-Tukey factorization where
every butterfly stage is a **dense DFT-matrix matmul** over one axis plus an
elementwise twiddle — the classic "four-step" / Bailey formulation used for
FFTs on matrix engines.

For N = N1*N2, with input viewed as A[n2, n1] = x[n1*N2 + n2]::

    B[n2, k1] = sum_n1 A[n2, n1] w_N1^(n1 k1)        (matmul, radix N1)
    C[n2, k1] = B[n2, k1] * w_N^(n2 k1)              (twiddle)
    X[k2*N1 + k1] = sum_n2 C[n2, k1] w_N2^(n2 k2)    (matmul, radix N2)

with w_M = exp(-2 pi i / M); stages recurse while N2 > radix.  Complex data
is split-complex (re, im) and each complex matmul uses the 3-multiply
Karatsuba form.  DFT matrices and twiddles are built host-side in float64.

Cost: sum(radices) complex MACs per sample — more FLOPs than a scalar FFT,
but they run on the MXU at matmul speed, which is the speed-of-light path on
this hardware (equivalent role to the reference's FFTW/CUFFT wrappers,
``FTransform``; see SURVEY.md §2.7).

Real-input transforms use the standard pack-split trick: a real signal of
length 2N is packed into a complex signal of length N, transformed, and the
spectrum untangled with one elementwise pass — halving the transform cost
(reference ``frc1d``).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sc import SC, mul as sc_mul

import os

#: transforms at or below this size use one dense DFT matmul
#: (512 keeps the stage count minimal — the execution backend charges per-op
#: latency, so fewer/bigger matmul stages win even at higher FLOPs)
DENSE_MAX = 512

#: preferred radix (multiple of the 128-wide MXU tile)
RADIX = 512

#: default matmul precision for FFT stages.  HIGHEST = f32-faithful (6-pass
#: bf16x3) — right for correctness work; DEFAULT = bf16 MXU passes — ~6x the
#: matmul rate, error ~1e-3 relative, usually below the quantization noise of
#: 2-8 bit telescope data.  Override with DSPSR_TPU_FFT_PRECISION=default.
_PREC = {"default": jax.lax.Precision.DEFAULT,
         "high": jax.lax.Precision.HIGH,
         "highest": jax.lax.Precision.HIGHEST}
FFT_PRECISION = _PREC[os.environ.get("DSPSR_TPU_FFT_PRECISION", "highest").lower()]


def _factorize(n: int, dense_max: int = DENSE_MAX) -> List[int]:
    """Split n (power of two) into matmul radices, largest-first.

    Prefers RADIX-sized stages (full MXU tiles); the remainder becomes the
    final (possibly smaller) stage.
    """
    if n & (n - 1):
        raise ValueError(f"FFT length {n} must be a power of two")
    if n <= dense_max:
        return [n]
    radices = []
    rem = n
    while rem > dense_max:
        radices.append(RADIX)
        rem //= RADIX
    if rem > 1:
        radices.append(rem)
    return radices


@dataclass(frozen=True)
class _Stage:
    radix: int
    # split-complex DFT matrix [radix, radix] and Karatsuba precombination
    wr: np.ndarray
    wi: np.ndarray
    wsum: np.ndarray  # wr + wi
    # twiddle for the *remaining* transform of length rem = prod(later radices):
    # shape [rem, radix], w_{radix*rem}^{n2 k1}; None for the last stage
    twr: np.ndarray | None
    twi: np.ndarray | None


class FFTPlan:
    """Precomputed matrices for an N-point complex FFT along the last axis.

    forward: w = exp(-2 pi i nk / M); inverse uses conjugated matrices and a
    1/N scale (matching numpy fft/ifft conventions).
    """

    def __init__(self, n: int, forward: bool = True):
        self.n = n
        self.forward = forward
        self.radices = _factorize(n)
        sign = -1.0 if forward else +1.0
        stages: List[_Stage] = []
        rem_total = n
        for i, r in enumerate(self.radices):
            rem = rem_total // r
            k = np.arange(r)
            W = np.exp(sign * 2j * np.pi * np.outer(k, k) / r)
            if rem > 1:
                n2 = np.arange(rem)
                k1 = np.arange(r)
                T = np.exp(sign * 2j * np.pi * np.outer(n2, k1) / (r * rem))
                twr, twi = T.real.astype(np.float32), T.imag.astype(np.float32)
            else:
                twr = twi = None
            wr = W.real.astype(np.float32)
            wi = W.imag.astype(np.float32)
            stages.append(_Stage(r, wr, wi, (W.real + W.imag).astype(np.float32),
                                 twr, twi))
            rem_total = rem
        self.stages = stages

    def device_constants(self):
        """The stage matrices as jnp arrays (hashable captures for jit)."""
        out = []
        for s in self.stages:
            out.append((
                jnp.asarray(s.wr), jnp.asarray(s.wi), jnp.asarray(s.wsum),
                None if s.twr is None else jnp.asarray(s.twr),
                None if s.twi is None else jnp.asarray(s.twi),
            ))
        return out


@functools.lru_cache(maxsize=64)
def get_plan(n: int, forward: bool) -> FFTPlan:
    return FFTPlan(n, forward)


def _cmatmul(ar, ai, wr, wi, wsum, precision):
    """(ar + i ai) @ (wr + i wi) via 3-multiply Karatsuba.

    t1 = ar@wr; t2 = ai@wi; t3 = (ar+ai)@(wr+wi)
    re = t1 - t2; im = t3 - t1 - t2
    """
    dot = functools.partial(jnp.matmul, precision=precision,
                            preferred_element_type=jnp.float32)
    t1 = dot(ar, wr)
    t2 = dot(ai, wi)
    t3 = dot(ar + ai, wsum)
    return t1 - t2, t3 - t1 - t2


def fft_sc(x: SC, n: int, forward: bool = True,
           precision=None) -> SC:
    """Complex FFT along the last axis (length n) of a split-complex tensor.

    Iterative mixed-radix DIT: at each stage the transform axis is reshaped
    to [rem, radix] (A[n2, n1] = x[n1*rem + n2], i.e. the radix axis strides
    by rem), matmul'd with the radix-DFT matrix, twiddled, and recursed on
    the rem axis.  Output is in natural order.
    """
    if precision is None:
        precision = FFT_PRECISION
    plan = get_plan(n, forward)
    consts = plan.device_constants()
    xr, xi = x
    batch = xr.shape[:-1]

    def run(ar, ai, stage_idx, length):
        wr, wi, wsum, twr, twi = consts[stage_idx]
        r = plan.radices[stage_idx]
        rem = length // r
        # view as A[..., n2, n1]: element (n2, n1) = x[n1*rem + n2]
        ar = jnp.moveaxis(ar.reshape(*ar.shape[:-1], r, rem), -2, -1)
        ai = jnp.moveaxis(ai.reshape(*ai.shape[:-1], r, rem), -2, -1)
        # radix transform over n1 (last axis)
        br, bi = _cmatmul(ar, ai, wr, wi, wsum, precision)
        if rem == 1:
            return br.reshape(*br.shape[:-2], r), bi.reshape(*bi.shape[:-2], r)
        # twiddle: [rem, r]
        cr = br * twr - bi * twi
        cimg = br * twi + bi * twr
        # transform the rem axis (currently second-to-last): move it last
        cr = jnp.moveaxis(cr, -2, -1)  # [..., k1(r), n2(rem)]
        cimg = jnp.moveaxis(cimg, -2, -1)
        dr, di = run(cr, cimg, stage_idx + 1, rem)
        # dr: [..., k1, k2]; output index k = k2*r + k1 -> need [..., k2, k1]
        dr = jnp.moveaxis(dr, -1, -2).reshape(*dr.shape[:-2], r * rem)
        di = jnp.moveaxis(di, -1, -2).reshape(*di.shape[:-2], r * rem)
        return dr, di

    yr, yi = run(xr, xi, 0, n)
    if not forward:
        inv = np.float32(1.0 / n)
        yr, yi = yr * inv, yi * inv
    return yr, yi


def ifft_sc(x: SC, n: int, precision=None) -> SC:
    return fft_sc(x, n, forward=False, precision=precision)


def rfft_sc(x: jnp.ndarray, n2: int, precision=None) -> SC:
    """Real-input FFT of length ``n2`` (= 2N real samples) along the last
    axis; returns bins 0..N-1 (the Nyquist bin is dropped, matching how the
    pipeline consumes half-spectra; reference ``frc1d`` semantics).

    Pack even/odd samples as a complex N-signal, FFT, untangle:
      Z = FFT(x_even + i x_odd)
      X[k] = (Z[k] + conj(Z[N-k]))/2 + w^k (Z[k] - conj(Z[N-k]))/(2i)
    """
    if precision is None:
        precision = FFT_PRECISION
    N = n2 // 2
    xe = x[..., 0::2]
    xo = x[..., 1::2]
    zr, zi = fft_sc((xe, xo), N, forward=True, precision=precision)
    # Z[N-k] with Z[0] for k=0: reverse and roll by one (no gather: concat)
    zr_rev = jnp.concatenate([zr[..., :1], zr[..., :0:-1]], axis=-1)
    zi_rev = jnp.concatenate([zi[..., :1], zi[..., :0:-1]], axis=-1)
    # A = (Z + conj(Zrev))/2 ; B = (Z - conj(Zrev))/2  (B still needs /i)
    ar = 0.5 * (zr + zr_rev)
    ai = 0.5 * (zi - zi_rev)
    br = 0.5 * (zr - zr_rev)
    bi = 0.5 * (zi + zi_rev)
    # B/(i) = (bi) - i (br) ... 1/i = -i: (br + i bi) * (-i) = bi - i br
    cr, ci = bi, -br
    k = np.arange(N)
    w = np.exp(-2j * np.pi * k / n2)
    wr = jnp.asarray(w.real.astype(np.float32))
    wi = jnp.asarray(w.imag.astype(np.float32))
    er = cr * wr - ci * wi
    ei = cr * wi + ci * wr
    return ar + er, ai + ei


def fftshift_sc(x: SC, axis: int = -1) -> SC:
    """fftshift via concat of two static halves (no roll/gather)."""
    def sh(a):
        n = a.shape[axis]
        lo = jax.lax.slice_in_dim(a, 0, n // 2, axis=axis)
        hi = jax.lax.slice_in_dim(a, n // 2, n, axis=axis)
        return jnp.concatenate([hi, lo], axis=axis)
    return sh(x[0]), sh(x[1])


# ifftshift == fftshift for even lengths (all our lengths are powers of two)
ifftshift_sc = fftshift_sc
