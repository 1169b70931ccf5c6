"""Overlap-save FFT convolution on device.

TPU-native equivalent of the reference ``dsp::Convolution``
(``Signal/General/Convolution.C:100-461``): each block of voltages is framed
into ``npart`` overlapping windows of ``nsamp_fft`` samples stepped by
``nsamp_step = nsamp_fft - nsamp_overlap``; each window is forward-FFT'd,
multiplied by the (chirp) frequency response, inverse-FFT'd, and the first
``nfilt_pos`` / last ``nfilt_neg`` complex samples of each window are
discarded (cyclic-convolution wrap-around pollution).

Where the reference loops chan x pol x part calling FFTW per window
(``Convolution.C:389-461``), here all windows of all channels and
polarizations are one batched XLA FFT — the layout the TPU wants.

Real (Nyquist) input follows the reference convention
(``Convolution.C:170-189``): the forward FFT of ``nsamp_fft = 2*n_fft`` real
samples yields ``n_fft`` positive-frequency bins which are treated as the
spectrum of an *analytic* signal at half the sampling rate; output is complex
with ``ndat_out = npart*nsamp_step/2``.

FFT normalization: jnp (forward unscaled, inverse 1/N) — a unit-gain
convolution, so output scale == input scale (the reference instead tracks an
``nsamp_fft*n_fft`` factor to divide out later, ``Convolution.C:303-305``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..observation import Observation, Signal
from .response import Response


@dataclass(frozen=True)
class OverlapSavePlan:
    """Static geometry of the overlap-save streaming convolution.

    Mirrors ``Convolution::prepare`` (``Convolution.C:105-221``).
    All counts are in *input* samples unless suffixed ``_c`` (complex samples
    at the analytic rate).
    """

    real_input: bool  # Signal::Nyquist input (float), else Analytic (complex)
    n_fft: int  # complex points per window after forward FFT
    nfilt_pos: int  # complex samples dropped from each window head
    nfilt_neg: int  # complex samples dropped from each window tail

    @property
    def nfilt_tot(self) -> int:
        return self.nfilt_pos + self.nfilt_neg

    @property
    def nsamp_fft(self) -> int:
        """Input samples per forward FFT (``Convolution.C:170-189``)."""
        return 2 * self.n_fft if self.real_input else self.n_fft

    @property
    def nsamp_overlap(self) -> int:
        return 2 * self.nfilt_tot if self.real_input else self.nfilt_tot

    @property
    def nsamp_step(self) -> int:
        return self.nsamp_fft - self.nsamp_overlap

    @property
    def nkeep_c(self) -> int:
        """Complex output samples kept per window."""
        return self.n_fft - self.nfilt_tot

    def npart(self, ndat: int) -> int:
        """Windows that fit in ``ndat`` input samples (``Filterbank.C:402``)."""
        if ndat <= self.nsamp_overlap:
            return 0
        return (ndat - self.nsamp_overlap) // self.nsamp_step

    def block_ndat(self, npart: int) -> int:
        """Input samples consumed by ``npart`` windows (incl. trailing overlap)."""
        return npart * self.nsamp_step + self.nsamp_overlap

    def output_ndat(self, npart: int) -> int:
        """Complex output samples for npart windows."""
        return npart * self.nkeep_c

    def validate(self):
        if self.n_fft < 2:
            raise ValueError("FFT too small")
        if self.nkeep_c <= 0:
            raise ValueError(
                f"n_fft={self.n_fft} <= nfilt_tot={self.nfilt_tot}: "
                "FFT length must exceed the smearing"
            )


def frame(x: jnp.ndarray, nsamp_fft: int, nsamp_step: int, npart: int) -> jnp.ndarray:
    """Frame the trailing time axis into overlapping windows.

    x[..., ndat] -> [..., npart, nsamp_fft] with window p starting at
    p*nsamp_step (the overlap-save tiling; reference ``Convolution.C:389-391``).
    """
    starts = jnp.arange(npart) * nsamp_step
    idx = starts[:, None] + jnp.arange(nsamp_fft)[None, :]
    return x[..., idx]


@partial(jax.jit, static_argnames=("plan", "npart"))
def overlap_save_convolve(
    x: jnp.ndarray,
    response_fft_order: jnp.ndarray,
    plan: OverlapSavePlan,
    npart: int,
) -> jnp.ndarray:
    """Convolve a block with a per-channel frequency response.

    Args:
      x: voltages ``[nchan, npol, ndat]``; float32 when ``plan.real_input``
        else complex64.  ``ndat`` must equal ``plan.block_ndat(npart)``.
      response_fft_order: ``complex64[nchan, n_fft]`` already in FFT bin
        order (see ``Response.fft_order``).
      plan, npart: static geometry.

    Returns:
      complex64 ``[nchan, npol, npart*nkeep_c]`` analytic voltages.
    """
    plan.validate()
    w = frame(x, plan.nsamp_fft, plan.nsamp_step, npart)
    # [nchan, npol, npart, nsamp_fft]
    if plan.real_input:
        spec = jnp.fft.rfft(w, axis=-1)[..., : plan.n_fft]
    else:
        spec = jnp.fft.fft(w, axis=-1)
    spec = spec * response_fft_order[:, None, None, :]
    t = jnp.fft.ifft(spec, axis=-1)
    kept = t[..., plan.nfilt_pos : plan.nfilt_pos + plan.nkeep_c]
    nchan, npol = kept.shape[0], kept.shape[1]
    return kept.reshape(nchan, npol, npart * plan.nkeep_c)


@partial(jax.jit, static_argnames=("plan", "npart"))
def overlap_save_convolve_jones(
    x: jnp.ndarray,
    response_fft_order: jnp.ndarray,
    plan: OverlapSavePlan,
    npart: int,
) -> jnp.ndarray:
    """Matrix (Jones) convolution: full 2x2 polarization response
    (reference ``Convolution.C:425-436`` matrix_convolution path).

    Args:
      x: ``[nchan, 2, ndat]`` voltages (complex; real input is first
        upgraded by the caller — matrix responses imply analytic data).
      response_fft_order: ``complex64[nchan, n_fft, 2, 2]`` Jones per bin.

    Returns ``[nchan, 2, npart*nkeep_c]`` complex64.
    """
    plan.validate()
    w = frame(x, plan.nsamp_fft, plan.nsamp_step, npart)
    if plan.real_input:
        spec = jnp.fft.rfft(w, axis=-1)[..., : plan.n_fft]
    else:
        spec = jnp.fft.fft(w, axis=-1)
    # spec: [nchan, 2, npart, n_fft]; response: [nchan, n_fft, 2, 2]
    out = jnp.einsum("cfij,cjpf->cipf", response_fft_order, spec)
    t = jnp.fft.ifft(out, axis=-1)
    kept = t[..., plan.nfilt_pos : plan.nfilt_pos + plan.nkeep_c]
    nchan = kept.shape[0]
    return kept.reshape(nchan, 2, npart * plan.nkeep_c)


def make_plan(obs: Observation, response: Response, n_fft: int | None = None) -> OverlapSavePlan:
    """Build a plan from observation state + response smear, choosing the FFT
    length if not given (reference ``Convolution::prepare`` +
    ``Response::set_optimal_ndat``)."""
    from .response import choose_nfft

    real_input = obs.state == Signal.NYQUIST
    nfilt_tot = response.impulse_total
    if n_fft is None:
        n_fft = choose_nfft(nfilt_tot)
    plan = OverlapSavePlan(
        real_input=real_input,
        n_fft=n_fft,
        nfilt_pos=response.impulse_pos,
        nfilt_neg=response.impulse_neg,
    )
    plan.validate()
    return plan
