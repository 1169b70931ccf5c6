"""Software filterbank: FFT channelization with optional simultaneous
coherent dedispersion (the "convolving filterbank").

Equivalent of the reference ``dsp::Filterbank``
(``Signal/General/Filterbank.C``): each window of ``nsamp_fft`` input samples
is forward-FFT'd into ``n_fft = nchan_subband * freq_res`` bins; the spectrum
splits into ``nchan_subband`` contiguous chunks of ``freq_res`` bins; each
chunk is (optionally response-multiplied and) inverse-FFT'd into a complex
subband time series at rate ``rate * freq_res / nsamp_fft``, keeping
``nkeep = freq_res - nfilt_tot`` samples per window from offset ``nfilt_pos``
(``Filterbank.C:477-670``).  When ``freq_res == 1`` the spectrum bins *are*
the output samples (critically-sampled filterbank, ``Filterbank.C:625-637``).

Where the reference loops chan x part x pol x subchannel through FFTW
(``Filterbank.C:563-655``), here both FFTs are single batched XLA ops — the
second one is a batch of ``npart*nchan_subband`` small FFTs, exactly the
shape TPU/XLA likes.

Channel ordering: outputs are produced in **natural order** — output channel
index c ascends in the sign direction of the bandwidth, i.e. channel c has
centre frequency ``obs.centre_frequency_of(c)`` — by rolling the spectrum
chunks; the reference instead leaves FFT order and sets swap metadata flags
(``Filterbank.C:357-364``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..observation import Observation, Signal
from .convolution import frame
from .response import Response


@dataclass(frozen=True)
class FilterbankPlan:
    """Static geometry (reference ``Filterbank::make_preparations``,
    ``Filterbank.C:55-263``)."""

    real_input: bool
    nchan_subband: int  # output channels per input channel
    freq_res: int  # complex points per subband per window
    nfilt_pos: int = 0
    nfilt_neg: int = 0

    @property
    def n_fft(self) -> int:
        return self.nchan_subband * self.freq_res

    @property
    def nfilt_tot(self) -> int:
        return self.nfilt_pos + self.nfilt_neg

    @property
    def nsamp_fft(self) -> int:
        return 2 * self.n_fft if self.real_input else self.n_fft

    @property
    def nsamp_overlap(self) -> int:
        """Input samples of window overlap (``Filterbank.C:141-152``)."""
        mult = 2 if self.real_input else 1
        return mult * self.nfilt_tot * self.nchan_subband

    @property
    def nsamp_step(self) -> int:
        return self.nsamp_fft - self.nsamp_overlap

    @property
    def nkeep(self) -> int:
        """Output samples kept per window per subband."""
        return self.freq_res - self.nfilt_tot

    def npart(self, ndat: int) -> int:
        if ndat <= self.nsamp_overlap:
            return 0
        return (ndat - self.nsamp_overlap) // self.nsamp_step

    def block_ndat(self, npart: int) -> int:
        return npart * self.nsamp_step + self.nsamp_overlap

    def output_ndat(self, npart: int) -> int:
        return npart * self.nkeep

    def validate(self):
        if self.freq_res <= self.nfilt_tot:
            raise ValueError(
                f"freq_res={self.freq_res} <= nfilt_tot={self.nfilt_tot}"
            )
        if self.nchan_subband < 1:
            raise ValueError("nchan_subband must be >= 1")


def _natural_roll(spec: jnp.ndarray, plan: FilterbankPlan) -> jnp.ndarray:
    """Reorder forward-FFT bins to natural (band-edge-first) order.

    For real input, rfft bins already ascend from the band edge.  For complex
    dual-sideband input, bin 0 is the band centre, so roll by n_fft/2
    (equivalent of the reference response doswap — applied to the data here
    because the data, not the response, must come out ordered).
    """
    if plan.real_input:
        return spec
    return jnp.roll(spec, plan.n_fft // 2, axis=-1)


@partial(jax.jit, static_argnames=("plan", "npart"))
def filterbank_block(
    x: jnp.ndarray,
    plan: FilterbankPlan,
    npart: int,
    response_natural: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Channelize a block (optionally convolving a response).

    Args:
      x: ``[nchan_in, npol, ndat]`` voltages (float32 if real, complex64
        otherwise), ``ndat == plan.block_ndat(npart)``.
      response_natural: optional ``complex64[nchan_in*nchan_subband, freq_res]``
        per-output-channel response in natural order ("convolve during",
        reference ``FilterbankConfig convolve_when==During``).

    Returns ``complex64[nchan_in*nchan_subband, npol, npart*nkeep]`` in
    natural channel order.
    """
    plan.validate()
    nchan_in, npol = x.shape[0], x.shape[1]
    w = frame(x, plan.nsamp_fft, plan.nsamp_step, npart)
    # [nchan_in, npol, npart, nsamp_fft]
    if plan.real_input:
        spec = jnp.fft.rfft(w, axis=-1)[..., : plan.n_fft]
    else:
        spec = jnp.fft.fft(w, axis=-1)
    spec = _natural_roll(spec, plan)

    # split into subband chunks: [nchan_in, npol, npart, nchan_subband, freq_res]
    spec = spec.reshape(nchan_in, npol, npart, plan.nchan_subband, plan.freq_res)

    if response_natural is not None:
        resp = response_natural.reshape(nchan_in, plan.nchan_subband, plan.freq_res)
        spec = spec * resp[:, None, None, :, :]

    if plan.freq_res == 1:
        sub = spec[..., 0]  # [nchan_in, npol, npart, nchan_subband]
        out = jnp.moveaxis(sub, 3, 1)  # [nchan_in, nchan_subband, npol, npart]
        return out.reshape(nchan_in * plan.nchan_subband, npol, npart)

    # inverse FFT each subband chunk back to the time domain.
    # Chunk bin k is an offset from the subband's *lower edge*; a complex
    # baseband subband has its centre at DC, so ifftshift within the chunk
    # before the inverse FFT (this makes the subband's own spectrum natural,
    # i.e. the output is ordinary complex baseband = dual-sideband).
    chunks = jnp.fft.ifftshift(spec, axes=-1)
    t = jnp.fft.ifft(chunks, axis=-1)
    kept = t[..., plan.nfilt_pos : plan.nfilt_pos + plan.nkeep]
    # [nchan_in, npol, npart, nchan_subband, nkeep] ->
    # [nchan_in, nchan_subband, npol, npart*nkeep]
    kept = jnp.moveaxis(kept, 3, 1).reshape(
        nchan_in, plan.nchan_subband, npol, npart * plan.nkeep
    )
    return kept.reshape(nchan_in * plan.nchan_subband, npol, npart * plan.nkeep)


def update_observation(obs: Observation, plan: FilterbankPlan) -> Observation:
    """Metadata transition applied by the filterbank
    (``Filterbank::prepare_output``, ``Filterbank.C:265-380``)."""
    ratechange = plan.freq_res / plan.nsamp_fft
    return obs.replace(
        nchan=obs.nchan * plan.nchan_subband,
        ndim=2,
        state=Signal.ANALYTIC,
        rate=obs.rate * ratechange,
        # our subbands are proper complex baseband (subband centre at DC after
        # the intra-chunk ifftshift), i.e. dual-sideband; channel centre
        # frequencies follow the standard (not-dc_centred) mapping
        dc_centred=False,
        dual_sideband=plan.freq_res > 1,
    )
