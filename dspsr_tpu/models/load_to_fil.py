"""Search-mode pipeline: load -> unpack -> filterbank -> detect -> scrunch ->
rescale -> requantize -> SIGPROC output.

Equivalent of the reference ``dsp::LoadToFil``
(``Signal/General/LoadToFil.C:135-374``; the ``digifil`` app): converts raw
baseband into a detected, levelled, n-bit filterbank stream.

Pipeline order mirrors the reference: [PolnSelect] -> Filterbank (coherent
chirp optional: ``-D`` dedispersing filterbank) -> Detection -> FScrunch ->
TScrunch -> Rescale -> [PScrunch] -> Digitizer -> OutputFile.

The whole per-block compute chain is one jitted device step returning packed
output bytes; the host loop streams blocks in and bytes out.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..observation import Observation, Signal
from ..io.sources import Source, open_source
from ..io.sigproc import SigProcWriter
from ..unpack.unpackers import UnpackPlan
from ..ops.response import Response, choose_nfft
from ..ops.dedispersion import Dedispersion
from ..ops.filterbank import FilterbankPlan, filterbank_block, update_observation
from ..ops.detection import detect
from ..ops.scrunch import (
    tscrunch, fscrunch, pscrunch_state,
    update_observation_tscrunch, update_observation_fscrunch,
)
from ..ops.rescale import RescaleState, rescale_block


@dataclass
class FilConfig:
    """Subset of digifil's options (``Signal/General/digifil.C``)."""

    nchan: int = 128  # -F
    frequency_resolution: Optional[int] = None  # -x
    dispersion_measure: float = 0.0  # -D (coherent dedispersing filterbank)
    tscrunch_factor: int = 1  # -t
    fscrunch_factor: int = 1  # -f
    npol_out: int = 1  # -d
    nbits: int = 8  # -b output bits
    rescale_seconds: float = 0.0  # -I (0 = every block)
    rescale_constant: bool = False  # -c freeze after first block
    #: channelizer: "fft" (dsp::Filterbank) or "polyphase"
    #: (dsp::PolyPhaseFilterbank; incoherent only)
    channelizer: str = "fft"
    pfb_ntaps: int = 8
    block_parts: int = 4
    #: minimum input samples per device block: raises the window count so
    #: tiny FFTs (e.g. freq_res=1) still amortize dispatch overhead
    #: (the reference sizes blocks from a RAM budget instead,
    #: IOManager::set_block_size, LoadToFold1.C:825-879)
    min_block_samples: int = 1 << 20

    # output digitizer levels: mean at digi_mean, sigma at digi_scale counts
    # (reference SigProcDigitizer uses DIGI_MEAN/DIGI_SIGMA)
    def digi_params(self):
        if self.nbits == 8:
            return 127.5, 32.0  # mean, counts/sigma
        if self.nbits == 4:
            return 7.5, 2.0
        if self.nbits == 2:
            return 1.5, 1.0
        if self.nbits == 1:
            return 0.5, 0.5
        if self.nbits == 32:
            return 0.0, 1.0  # float passthrough
        raise ValueError(f"unsupported output nbits={self.nbits}")

    def detection_state(self) -> Signal:
        return {1: Signal.INTENSITY, 2: Signal.PPQQ, 4: Signal.COHERENCE}[self.npol_out]


@partial(jax.jit, static_argnames=("nbits",))
def digitize(y: jnp.ndarray, nbits: int, mean: float, scale: float) -> jnp.ndarray:
    """Requantize float samples to n-bit offset-binary bytes in TFP order
    (reference ``SigProcDigitizer::pack``).

    y: float32[nchan, npol, ndat] already rescaled to ~N(0,1).
    Returns uint8[packed bytes] (time-major, pol, then channel — SIGPROC
    sample order).
    """
    nchan, npol, ndat = y.shape
    # TFP: [ndat, npol, nchan] (SIGPROC: channel fastest)
    t = jnp.transpose(y, (2, 1, 0))
    if nbits == 32:
        return jax.lax.bitcast_convert_type(
            t.astype(jnp.float32), jnp.uint8).reshape(-1)
    q = jnp.round(t * scale + mean)
    q = jnp.clip(q, 0, (1 << nbits) - 1).astype(jnp.uint32)
    flat = q.reshape(-1)
    if nbits == 8:
        return flat.astype(jnp.uint8)
    per = 8 // nbits
    g = flat.reshape(-1, per)
    # MSB first within each byte
    shifts = jnp.arange(per - 1, -1, -1, dtype=jnp.uint32) * nbits
    return jnp.sum(g << shifts[None, :], axis=1).astype(jnp.uint8)


class FilPipeline:
    """Constructed search-mode pipeline over one Source."""

    def __init__(self, source: Source, config: FilConfig):
        self.source = source
        self.config = config
        self.obs_in = source.obs
        self._construct()

    def _construct(self):
        cfg = self.config
        obs = self.obs_in
        real_input = obs.state == Signal.NYQUIST

        self.unpack_plan = UnpackPlan(obs)
        self.nchan_subband = max(1, cfg.nchan // obs.nchan)
        nchan_out = obs.nchan * self.nchan_subband

        if cfg.dispersion_measure > 0:
            nfp = Dedispersion._half_smearing_samples(
                cfg.dispersion_measure, obs.centre_frequency, obs.bandwidth,
                nchan_out, +1, 0.1)
            nfn = Dedispersion._half_smearing_samples(
                cfg.dispersion_measure, obs.centre_frequency, obs.bandwidth,
                nchan_out, -1, 0.1)
        else:
            nfp = nfn = 0
        nfilt = nfp + nfn

        if cfg.channelizer == "polyphase":
            if cfg.dispersion_measure > 0:
                raise ValueError(
                    "polyphase channelizer is incoherent; use the FFT "
                    "filterbank for coherent dedispersion (-D)")
            from ..ops.polyphase import PolyphasePlan, prototype_lowpass

            self.pfb_plan = PolyphasePlan(
                real_input=real_input, nchan_subband=self.nchan_subband,
                ntaps=cfg.pfb_ntaps)
            self._pfb_h = jnp.asarray(
                prototype_lowpass(self.nchan_subband, cfg.pfb_ntaps))
            self.fb_plan = None
        else:
            self.pfb_plan = None
            if cfg.frequency_resolution:
                freq_res = cfg.frequency_resolution
            elif nfilt == 0:
                freq_res = 1
            else:
                freq_res = choose_nfft(nfilt)
            self.fb_plan = FilterbankPlan(
                real_input=real_input, nchan_subband=self.nchan_subband,
                freq_res=freq_res, nfilt_pos=nfp, nfilt_neg=nfn)
            self.fb_plan.validate()

        if cfg.dispersion_measure > 0:
            from ..ops import sc

            ded = Dedispersion.build(
                cfg.dispersion_measure, obs.centre_frequency, obs.bandwidth,
                nchan_out, freq_res)
            rr, ri = sc.from_numpy(ded.phasors)
            self._response_natural = (jnp.asarray(rr), jnp.asarray(ri))
        else:
            self._response_natural = None

        self.det_state = cfg.detection_state()
        if self.pfb_plan is not None:
            obs_s = obs.replace(
                nchan=obs.nchan * self.nchan_subband, ndim=2,
                state=Signal.ANALYTIC,
                rate=obs.rate / self.pfb_plan.step / (2 if real_input else 1)
                * (2 if real_input else 1) / 1,
            )
            obs_s = obs_s.replace(rate=obs.rate / self.pfb_plan.step)
        else:
            obs_s = update_observation(obs, self.fb_plan)
        obs_d = obs_s.apply_detection(self.det_state)
        obs_d = update_observation_fscrunch(obs_d, cfg.fscrunch_factor)
        obs_d = update_observation_tscrunch(obs_d, cfg.tscrunch_factor)
        if cfg.npol_out > 1:
            pass
        self.obs_out = obs_d.replace(nbit=cfg.nbits)

        geom = self.pfb_plan if self.pfb_plan is not None else self.fb_plan
        step = geom.step if self.pfb_plan is not None else geom.nsamp_step
        want = -(-cfg.min_block_samples // step)
        cap = geom.npart(self.source.total_samples)
        self.npart = min(max(want, cfg.block_parts), cap) if cap > 0 \
            else cfg.block_parts
        self.block_in_samples = geom.block_ndat(self.npart)
        self.stride_in_samples = self.npart * step
        self._rescale_state = RescaleState.zeros(
            self.obs_out.nchan, self.obs_out.npol)
        self._blocks_done = 0

    @partial(jax.jit, static_argnames=("self", "freeze"))
    def _step(self, rescale_state, raw, freeze=False):
        x, w = self.unpack_plan.unpack(raw)
        if self.pfb_plan is not None:
            from ..ops.polyphase import polyphase_filterbank_block

            y = polyphase_filterbank_block(x, self._pfb_h, self.pfb_plan,
                                           self.npart)
        else:
            y = filterbank_block(x, self.fb_plan, self.npart,
                                 self._response_natural)
        d = detect(y, self.det_state)
        d = fscrunch(d, self.config.fscrunch_factor)
        d = tscrunch(d, self.config.tscrunch_factor)
        rescale_state, z = rescale_block(rescale_state, d, freeze=freeze)
        mean, scale = self.config.digi_params()
        packed = digitize(z, self.config.nbits, mean, scale)
        return rescale_state, packed

    def run(self, output_path: str, max_blocks: Optional[int] = None,
            total_seconds: Optional[float] = None,
            format: str = "sigproc") -> Observation:
        """Stream the whole source into a SIGPROC (.fil) or PSRFITS (.sf)
        search-mode file (digifil / digifits respectively)."""
        if format == "sigproc":
            writer = SigProcWriter(output_path, self.obs_out, self.config.nbits)
        elif format == "psrfits":
            from ..io.psrfits import PsrfitsSearchWriter

            writer = PsrfitsSearchWriter(output_path, self.obs_out,
                                         self.config.nbits)
        else:
            raise ValueError(f"unknown search output format {format!r}")
        with writer as out:
            self.run_writer(out, max_blocks=max_blocks,
                            total_seconds=total_seconds)
        return self.obs_out

    def run_writer(self, out, max_blocks: Optional[int] = None,
                   total_seconds: Optional[float] = None) -> None:
        """Stream blocks through the device step into any block writer."""
        src = self.source
        nsamp_total = src.total_samples
        if total_seconds is not None:
            nsamp_total = min(nsamp_total, int(total_seconds * self.obs_in.rate))
        cfg = self.config

        start = 0
        nblocks = 0
        while start + self.block_in_samples <= nsamp_total:
            raw = src.read_samples(start, self.block_in_samples)
            freeze = cfg.rescale_constant and self._blocks_done > 0
            self._rescale_state, packed = self._step(
                self._rescale_state, jnp.asarray(raw), freeze)
            out.write_block(np.asarray(packed))
            start += self.stride_in_samples
            nblocks += 1
            self._blocks_done += 1
            if max_blocks is not None and nblocks >= max_blocks:
                break


def load_to_fil(path: str, output_path: str, config: FilConfig, **run_kw) -> Observation:
    src = open_source(path)
    return FilPipeline(src, config).run(output_path, **run_kw)


def load_to_fits(path: str, output_path: str, config: FilConfig, **run_kw) -> Observation:
    """digifits equivalent (reference ``Signal/General/digifits.C``)."""
    src = open_source(path)
    return FilPipeline(src, config).run(output_path, format="psrfits", **run_kw)
