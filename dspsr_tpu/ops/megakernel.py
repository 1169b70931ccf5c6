"""Fused Pallas megakernel: unpack -> filterbank(+chirp) -> detect -> fold.

The round-1 pipeline expressed each block as one jitted XLA program of ~80
fused op instances; the execution backend charges a large fixed latency per
op instance (see PERF.md), so the block cost was dominated by op count, not
FLOPs.  This module collapses the entire per-block fold pipeline — n-bit
unpack, forward FFT, chirp multiply, per-subband inverse FFT, detection and
phase folding — into a SINGLE ``pallas_call`` whose grid walks (input
channel, overlap-save window).  Everything runs out of VMEM as dense MXU
matmuls; there are **no transposes and no gathers**: every data reorder is
folded into the precomputed DFT/selection matrices, and the fold scatter is
a chunked one-hot contraction.

Round-3 generality (previously single-channel 8-bit weight-free only):

- **Multi-channel input** (``nchan_in > 1``): GUPPI RAW / VDIF-class data
  where each coarse channel gets its own convolving filterbank
  (``io/guppi.py`` OBSNCHAN; reference per-channel loops
  ``Filterbank.C:563``).  The grid gains a channel axis; the chirp constant
  is per-channel and pipelined through a sliced BlockSpec.
- **In-kernel 2-bit Jenet-Anderson dynamic-level unpack** (reference
  ``TwoBitCorrection.h:24-89``, ``ExcisionUnpacker.C``): a cheap XLA
  pre-stage expands packed bytes to int8 codes and counts per-block nlow;
  the JA98 output level *application* happens inside the kernel — the
  per-block lo/hi levels ride in as tiny side arrays and expand to
  per-sample magnitudes via a constant one-hot matmul (``EXPAND``), so the
  voltage reconstruction ``v = sign * (is_low ? lo : hi)`` is fused with
  the FFT with zero float traffic from HBM.
- **Per-window excision weights folded into the fold one-hot**: bad
  ``ndat_per_weight`` blocks zero every window that touches them
  (conservative ``WeightedTimeSeries::convolve_weights`` semantics, matching
  ``models/load_to_fold._stream_weights`` exactly); the weight scales both
  the profile contraction and the per-channel hit counts.  An
  ``external_weights`` mode lets masks computed outside (SK, RFI) reach the
  fused fold the same way.

Mathematical structure (per channel, per window, per polarization):

1. **Forward FFT** of the window, computed as a direct two-stage
   factorization.  Real (Nyquist) input of ``nsamp_fft = 2N`` samples needs
   no even/odd packing or spectrum untangling; complex (analytic) input of
   ``N`` samples uses the same structure with ``mult = 1`` and its
   ``fftshift`` folded into the chirp permutation and the block-diagonal
   inverse-DFT column arrangement.  With the window viewed as ``W[n1, m]``,
   ``n = n1*(mult*R2) + m`` and output bin ``k = k2*R1 + k1`` (N = R1*R2),
   for the real case::

       S[m, k1]  = sum_n1 W[n1, m] * exp(-2i pi n1 k1 / R1)     (2 matmuls)
       C[m, k1]  = S[m, k1] * exp(-2i pi m k1 / 2N)             (twiddle)
       X[k1, k2] = sum_m C[m, k1] * exp(-2i pi m k2 / (2*R2))   (4 matmuls)

   because ``exp(-2i pi (n1*2*R2)(k2*R1)/2N) == 1``: the coarse time x
   coarse frequency phase vanishes, which is what makes the bins land in the
   permuted ``[k1, k2]`` layout with zero data movement.  Bins 0..N-1 of the
   half spectrum match ``ops.mxfft.rfft_sc`` (Nyquist dropped).

2. **Chirp multiply**: this channel's slice of the dedispersion response
   (natural order, reference ``Dedispersion.C:534-545``) pre-permuted
   host-side into the same ``[k1, k2]`` layout — elementwise.

3. **Per-subband inverse FFT** (the convolving filterbank back-transform,
   reference ``Filterbank.C:477-670``).  Subband ``s = k // freq_res`` is a
   function of k2 alone (``s = k2 // q`` with ``q = freq_res / R1``), so the
   radix-q first stage is a block-diagonal [R2, R2] matmul and the radix-R1
   second stage contracts the k1 axis::

       E[k1, s*q + j1]   = sum_q' X[k1, s*q + q'] * Wq_inv[q', j1]
       F[s*q + j1, k2']  = sum_k1 (E * T')[k1, s*q + j1] * WR1_inv[k1, k2']

   yielding time sample ``t = k2'*q + j1`` of subband ``s`` at row
   ``s*q + j1``, column ``k2'`` — again zero data movement.  The reference's
   per-chunk ``ifftshift`` (baseband centring) is skipped: it equals a
   ``(-1)^t`` factor on the voltage, which every detection product cancels.

4. **Detect + fold**: power accumulates over pols in VMEM; the fold computes
   the pulse phase directly in the permuted coordinates (t from row/col) and
   contracts data x one-hot(bin) per j1-chunk (``Fold.C:744-788`` semantics,
   the one-hot matmul formulation of ops.fold), with the overlap-save keep
   window (``nfilt_pos <= t < nfilt_pos + nkeep``) AND the window weight
   applied inside the one-hot.

Accumulators (profiles [npol_out, nsub, nbin], hits [1, nbin]) ride VMEM
scratch across each channel's windows and are added to the carried
per-channel totals when that channel's last window completes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


@dataclass(frozen=True)
class MegaPlan:
    """Static geometry of the fused block step.

    Derived from a FilterbankPlan (real or complex input) with the overlap
    rounded up so every window starts on a whole-row boundary of the
    ``[totrows, row_len]`` input view (pure reshape framing; extra discard
    is always valid overlap-save).
    """

    nsub: int          # output channels per input channel (nchan_subband)
    freq_res: int      # complex samples per subband per window
    R1: int            # first-stage radix (= rows of the spectrum layout)
    nfilt_pos: int     # complex samples dropped per window head (per subband)
    nfilt_neg: int     # rounded-up tail discard
    nbin: int          # fold phase bins
    npol: int          # input polarizations
    npol_out: int = 1  # 1 = Intensity, 2 = PPQQ, 4 = Stokes
    nbit: int = 8      # input bits per sample (2, 4, 8 or 32)
    real_input: bool = True  # Nyquist (real) vs analytic (complex) input
    nchan_in: int = 1  # input channels, each its own convolving filterbank
    #: samples per JA98 correction/excision block; > 0 enables the in-kernel
    #: dynamic-level 2-bit unpack + excision-weight path (nbit must be 2)
    npw: int = 0
    #: detection state ("Detection::set_output_state", Detection.C:42-66):
    #: "auto" maps npol_out 1/2/4 -> Intensity/PPQQ/Stokes; "pp"/"qq" fold
    #: one polarization's power (npol_out=1); "coherence" folds
    #: PP, QQ, Re[p*q], Im[p*q] (npol_out=4, cross_detect.ic:36-40)
    detection: str = "auto"
    #: fold the 10 unique second-order Stokes products S_i*S_j too
    #: (FourthMoment.C, dspsr -4): 4 + 10 = 14 planes per subband
    fourth_moment: bool = False
    #: 8-bit two's-complement codes (BitTable::TwosComplement — a pure
    #: affine map of the signed byte, no wrap correction needed in-kernel)
    twos_complement: bool = False
    #: raw byte layout: "tfp" or "caspsr" (4-sample pol-interleaved blocks,
    #: CASPSRSingleUnpacker.C:119-151); handled in the XLA pre-stage
    interleave: str = "tfp"

    @property
    def n_fft(self) -> int:
        return self.nsub * self.freq_res

    @property
    def R2(self) -> int:
        return self.n_fft // self.R1

    @property
    def q(self) -> int:
        return self.freq_res // self.R1

    @property
    def nfilt_tot(self) -> int:
        return self.nfilt_pos + self.nfilt_neg

    @property
    def nkeep(self) -> int:
        return self.freq_res - self.nfilt_tot

    @property
    def mult(self) -> int:
        """Time samples per complex point (2 for real Nyquist input)."""
        return 2 if self.real_input else 1

    @property
    def ndim(self) -> int:
        return 1 if self.real_input else 2

    @property
    def nsamp_fft(self) -> int:
        return self.mult * self.n_fft

    @property
    def row_len(self) -> int:
        """Samples per row of the [totrows, row_len] input view."""
        return self.mult * self.R2

    @property
    def nsamp_step(self) -> int:
        return self.nsamp_fft - self.mult * self.nsub * self.nfilt_tot

    @property
    def step_rows(self) -> int:
        return self.nsamp_step // self.row_len

    @property
    def nlev(self) -> int:
        """Rows of the per-block level arrays per input row (npw blocks)."""
        return self.row_len // self.npw if self.npw else 0

    @property
    def nplane(self) -> int:
        """Folded planes per subband (npol_out, or 14 with fourth moments:
        the Stokes vector plus its 10 unique second-order products)."""
        return 14 if self.fourth_moment else self.npol_out

    def block_ndat(self, npart: int) -> int:
        """Input time samples per block PER INPUT CHANNEL."""
        return (npart * self.nsamp_step
                + self.mult * self.nsub * self.nfilt_tot)

    def total_rows(self, npart: int) -> int:
        return self.block_ndat(npart) // self.row_len

    def validate(self):
        if not (_pow2(self.n_fft) and _pow2(self.R1) and _pow2(self.freq_res)):
            raise ValueError("sizes must be powers of two")
        if self.freq_res % self.R1:
            raise ValueError("freq_res must be a multiple of R1")
        if self.nsamp_step % self.row_len:
            raise ValueError("step not a multiple of row_len (round nfilt up)")
        if self.step_rows % 8:
            raise ValueError("step_rows must be 8-aligned (round nfilt to 8q)")
        if self.nkeep <= 0:
            raise ValueError("nothing kept per window")
        if self.npol_out not in (1, 2, 4):
            raise ValueError("npol_out must be 1, 2 or 4")
        if self.npol_out > 1 and self.npol != 2:
            raise ValueError("PPQQ/Stokes need npol == 2")
        if self.detection not in ("auto", "pp", "qq", "coherence"):
            raise ValueError(f"unknown detection: {self.detection}")
        if self.detection in ("pp", "qq") and (
                self.npol_out != 1 or self.npol != 2):
            raise ValueError("pp/qq detection needs npol == 2, npol_out == 1")
        if self.detection == "coherence" and self.npol_out != 4:
            raise ValueError("coherence detection needs npol_out == 4")
        if self.fourth_moment and (
                self.npol_out != 4 or self.detection != "auto"):
            raise ValueError("fourth moments need Stokes (npol_out=4, auto)")
        if self.nbit not in (1, 2, 4, 8, 32):
            raise ValueError("nbit must be 1, 2, 4, 8 or 32")
        if self.npw:
            if self.nbit != 2:
                raise ValueError("dynamic-level unpack (npw > 0) needs nbit=2")
            if self.row_len % self.npw:
                raise ValueError("npw must divide row_len")
            if self.twos_complement:
                raise ValueError(
                    "JA98 dynamic levels use offset-binary state codes")
        if self.nchan_in < 1:
            raise ValueError("nchan_in must be >= 1")
        if self.twos_complement and self.nbit not in (2, 4, 8):
            raise ValueError("in-kernel two's complement is 2/4/8-bit")
        if self.interleave not in ("tfp", "caspsr"):
            raise ValueError(f"unknown interleave: {self.interleave}")
        if self.interleave == "caspsr" and (
                self.nbit != 8 or self.nchan_in != 1 or self.ndim != 1):
            raise ValueError("CASPSR layout is 8-bit real single-channel")

    # ---- construction ----

    @staticmethod
    def choose_r1(n_fft: int, freq_res: int) -> Optional[int]:
        """Balanced first-stage radix: R1 ~ sqrt(N), dividing freq_res,
        capped so [R1, 2*R2] and [2*R2, R1] tiles stay VMEM-friendly."""
        if not (_pow2(n_fft) and _pow2(freq_res)):
            return None
        r1 = 1 << (n_fft.bit_length() // 2)
        r1 = min(r1, freq_res, 1024)
        while n_fft // r1 > 4096 and r1 * 2 <= min(freq_res, 1024):
            r1 *= 2
        if n_fft // r1 > 8192 or r1 < 8:
            return None
        return r1

    @classmethod
    def from_filterbank(cls, fb_plan, nbin: int, npol: int,
                        npol_out: int = 1, nbit: int = 8,
                        nchan_in: int = 1,
                        ndat_per_weight: int = 0,
                        detection: str = "auto",
                        fourth_moment: bool = False,
                        twos_complement: bool = False,
                        interleave: str = "tfp") -> Optional["MegaPlan"]:
        """Build from an ops.filterbank.FilterbankPlan; None if ineligible.

        ``ndat_per_weight``: pass the excision block length for 2-bit input
        with DYNAMIC levels (enables the in-kernel JA98 path; must divide
        the row length); pass 0 for the fixed-level (BitTable) 2-bit map,
        which is a pure affine in-kernel unpack like 1/4-bit.
        """
        nsub, freq_res = fb_plan.nchan_subband, fb_plan.freq_res
        r1 = cls.choose_r1(nsub * freq_res, freq_res)
        if r1 is None:
            return None
        q = freq_res // r1
        # round the tail discard up so every window starts on a whole
        # 8-row boundary of the [totrows, row_len] input view (Mosaic DMA
        # slices need sublane-aligned offsets): nfilt_tot multiple of 8q
        nfilt_tot = fb_plan.nfilt_pos + fb_plan.nfilt_neg
        rounded = -(-nfilt_tot // (8 * q)) * (8 * q)
        nfilt_neg = fb_plan.nfilt_neg + (rounded - nfilt_tot)
        npw = ndat_per_weight if nbit == 2 else 0
        plan = cls(nsub=nsub, freq_res=freq_res, R1=r1,
                   nfilt_pos=fb_plan.nfilt_pos, nfilt_neg=nfilt_neg,
                   nbin=nbin, npol=npol, npol_out=npol_out, nbit=nbit,
                   real_input=fb_plan.real_input, nchan_in=nchan_in,
                   npw=npw, detection=detection, fourth_moment=fourth_moment,
                   twos_complement=twos_complement, interleave=interleave)
        if plan.nkeep <= 0:
            return None
        if npw > 0 and plan.row_len % npw:
            return None  # weight blocks must tile the row -> XLA path
        plan.validate()
        return plan


class MegaConstants:
    """Precomputed matrices (host float64 -> requested dtype)."""

    def __init__(self, plan: MegaPlan, response_natural: Optional[np.ndarray],
                 dtype=np.float32, unpack_scale: float = 1.0,
                 unpack_offset: float = 0.0, twobit=None,
                 window: Optional[np.ndarray] = None,
                 jones: Optional[np.ndarray] = None):
        p = plan
        R1, R2, q, nsub = p.R1, p.R2, p.q, p.nsub
        N, M = p.n_fft, p.freq_res
        mult = p.mult
        self.dtype = dtype
        self.unpack_scale = float(unpack_scale)
        self.unpack_offset = float(unpack_offset)

        def c(x):
            return x.astype(dtype)

        # stage-1 DFT over n1 (radix R1)
        k = np.arange(R1)
        W1 = np.exp(-2j * np.pi * np.outer(k, k) / R1)
        self.w1r, self.w1i = c(W1.real), c(W1.imag)

        # twiddle exp(-2i pi m k1 / (mult*N)): [mult*R2, R1]
        # (real input: m runs over the 2N-sample window's coarse column;
        #  complex input: m is n2 and the divisor is N)
        m = np.arange(mult * R2)
        T = np.exp(-2j * np.pi * np.outer(m, k) / (mult * N))
        self.tr, self.ti = c(T.real), c(T.imag)

        # stage-2 DFT exp(-2i pi m k2 / (mult*R2)): [mult*R2, R2]
        k2 = np.arange(R2)
        E = np.exp(-2j * np.pi * np.outer(m, k2) / (mult * R2))
        self.er, self.ei = c(E.real), c(E.imag)

        # per-channel chirp in [k1, k2] layout (flat bin k = k2*R1 + k1).
        # For complex input the data FFT is NOT fftshifted in-kernel; the
        # shift is folded in here: natural-order bin j of a channel lives at
        # that channel's FFT bin (j + N/2) mod N.
        if response_natural is not None:
            flat = np.asarray(response_natural).reshape(
                p.nchan_in, N).astype(np.complex128)
        else:
            flat = np.ones((p.nchan_in, N), np.complex128)
        if not p.real_input:
            flat = np.roll(flat, -(N // 2), axis=1)
        G = np.transpose(flat.reshape(p.nchan_in, R2, R1),
                         (0, 2, 1))  # [nchan, k1, k2]
        self.gr, self.gi = c(np.ascontiguousarray(G.real)), \
            c(np.ascontiguousarray(G.imag))

        # Jones-matrix response (matrix convolution, Convolution.C:425-436):
        # natural-order [nchan_in, N, 2, 2] complex responses (the scalar
        # chirp pre-multiplied in by ops.polncal.jones_product), permuted
        # into the same [k1, k2] spectral layout as the scalar chirp and
        # flattened to 4 planes indexed 2*a + b.  When present, the kernel
        # mixes the two input-pol spectra per output pol INSTEAD of the
        # scalar chirp multiply (whose slot in `gr/gi` becomes unused ones).
        if jones is not None:
            if p.npol != 2:
                raise ValueError("Jones response needs npol == 2")
            jn = np.asarray(jones).astype(np.complex128)
            if jn.shape != (p.nchan_in, N, 2, 2):
                raise ValueError(
                    f"jones shape {jn.shape} != ({p.nchan_in}, {N}, 2, 2)")
            if not p.real_input:
                jn = np.roll(jn, -(N // 2), axis=1)
            # [nchan, N, 2, 2] -> [nchan, 2, 2, R1, R2] -> [nchan, 4, R1, R2]
            J = np.transpose(jn.reshape(p.nchan_in, R2, R1, 2, 2),
                             (0, 3, 4, 2, 1)).reshape(p.nchan_in, 4, R1, R2)
            self.jxr = c(np.ascontiguousarray(J.real))
            self.jxi = c(np.ascontiguousarray(J.imag))
        else:
            self.jxr = self.jxi = None

        # inverse stage 1: block-diagonal radix-q inverse DFT [R2, R2].
        # Complex input: the fftshift permutes which k2 columns belong to
        # which subband (js = (k2 + R2/2) mod R2), folded into the matrix.
        jq = np.arange(q)
        Wq = np.exp(+2j * np.pi * np.outer(jq, jq) / q)
        Mb = np.zeros((R2, R2), np.complex128)
        shift = 0 if p.real_input else R2 // 2
        for k2i in range(R2):
            js = (k2i + shift) % R2
            s, qi = js // q, js % q
            Mb[k2i, s * q:(s + 1) * q] = Wq[qi]
        self.mr, self.mi = c(Mb.real), c(Mb.imag)

        # inverse twiddle exp(+2i pi k1 j1 / M) tiled over subbands [R1, R2],
        # with the 1/M inverse-FFT normalization folded in
        j1 = np.arange(R2) % q
        U = np.exp(+2j * np.pi * np.outer(k, j1) / M) / M
        self.ur, self.ui = c(U.real), c(U.imag)

        # inverse stage 2: radix-R1 inverse DFT [R1, R1] (contract k1)
        W1i = np.exp(+2j * np.pi * np.outer(k, k) / R1)
        self.vr, self.vi = c(W1i.real), c(W1i.imag)

        # fold row-selection matrices: Sel[j1] [nsub, R2] picks rows s*q + j1
        sel = np.zeros((q, nsub, R2), np.float64)
        for j in range(q):
            sel[j, np.arange(nsub), np.arange(nsub) * q + j] = 1.0
        self.sel = c(sel)

        # JA98 dynamic-level machinery (nbit == 2): per-nlow lookup tables
        # for the XLA pre-stage, and the in-kernel block->sample expansion
        # matrix EXPAND[b, t] = 1 iff t // npw == b (a one-hot level
        # broadcast as an MXU matmul; reference TwoBitCorrection level
        # tables TwoBitLookup.C)
        self.twobit = twobit
        if p.npw:
            if twobit is None:
                from ..unpack.twobit import TwoBitCorrection

                self.twobit = TwoBitCorrection(ndat_per_weight=p.npw)
            if self.twobit.ndat_per_weight != p.npw:
                raise ValueError("twobit.ndat_per_weight != plan.npw")
            ex = np.zeros((p.nlev, p.row_len), np.float64)
            for b in range(p.nlev):
                ex[b, b * p.npw:(b + 1) * p.npw] = 1.0
            self.expand = c(ex)
        else:
            self.expand = None

        # apodization window (dsp::Apodization applied before the forward
        # FFT, Convolution.C:379-387): window sample n of the nsamp_fft
        # window sits at plane position [n1, m] with n = n1*row_len + m, so
        # the taper is one [R1, row_len] elementwise constant multiplied
        # into each loaded window plane (real samples, or both components
        # of a complex sample, identically)
        if window is not None:
            w = np.asarray(window, np.float64).reshape(-1)
            if w.size != p.nsamp_fft:
                raise ValueError("window length != nsamp_fft")
            self.apod = c(w.reshape(p.R1, p.row_len))
        else:
            self.apod = None

    def as_jax(self):
        names = ("w1r", "w1i", "tr", "ti", "er", "ei", "gr", "gi",
                 "mr", "mi", "ur", "ui", "vr", "vi", "sel")
        return {n: jnp.asarray(getattr(self, n)) for n in names}


def unpack_affine(nbit: int, twos_complement: bool = False) -> Tuple[float, float]:
    """(scale, offset) such that value = code * scale + offset reproduces
    ``unpack.unpackers._uniform_levels``.

    Offset binary: code is the unsigned byte/field value.  Two's complement:
    code is the SIGNED field value (the kernel wraps sub-byte fields
    ``v >= 2^(n-1)`` down by ``2^n``; 8-bit bytes arrive as int8 already) —
    the ascending level index is ``v + 2^(n-1)``, so the map stays affine
    with the offset shifted by half the code range."""
    from ..unpack.bittable import BitTable, CodeType

    if nbit == 32:
        return 1.0, 0.0
    n = 1 << nbit
    table = BitTable(nbit, CodeType.TWOS_COMPLEMENT if twos_complement
                     else CodeType.OFFSET_BINARY)
    asc = np.sort(table.values.astype(np.float64))
    step = float((asc[-1] - asc[0]) / (n - 1)) if n > 1 else 2.0
    if twos_complement:
        if nbit not in (2, 4, 8):
            raise NotImplementedError(
                "two's-complement codes are 2/4/8-bit")
        return step, float(asc[0]) + (n // 2) * step
    return step, float(asc[0])


# --------------------------------------------------------------------------
# shared host/XLA helpers
# --------------------------------------------------------------------------

def window_weight_spans(plan: MegaPlan, npart: int):
    """[(a, b)] weight-block index span covered by each window — the
    conservative convolve_weights rule shared with
    ``models/load_to_fold._stream_weights`` (any bad block in the window
    zeroes the whole window).  Valid because npw divides nsamp_step and
    nsamp_fft (both are multiples of row_len)."""
    spans = []
    for w in range(npart):
        a = (w * plan.nsamp_step) // plan.npw
        b = (w * plan.nsamp_step + plan.nsamp_fft) // plan.npw
        spans.append((a, b))
    return spans


def permute_response(rr, ri, plan: MegaPlan):
    """Natural-order per-input-channel response ``[nchan_in, n_fft]``
    (split-complex pair, jnp) -> the kernel's permuted ``[nchan_in, R1,
    R2]`` spectral layout — the traced-argument analogue of the host-side
    chirp permutation in ``MegaConstants`` (flat bin ``k = k2*R1 + k1``;
    complex input folds the fftshift in as a ``-N/2`` roll)."""
    p = plan
    N = p.n_fft

    def perm(a):
        a = a.reshape(p.nchan_in, N)
        if not p.real_input:
            a = jnp.roll(a, -(N // 2), axis=1)
        return jnp.transpose(a.reshape(p.nchan_in, p.R2, p.R1), (0, 2, 1))

    return perm(rr), perm(ri)


def _decode_codes_np(raw: np.ndarray, plan: MegaPlan, npart: int) -> np.ndarray:
    """uint8 bytes -> integer codes [nchan, npol, ndim, T] (numpy)."""
    p = plan
    if p.interleave == "caspsr":
        raw = np.ascontiguousarray(
            raw.reshape(-1, p.npol, 4).transpose(0, 2, 1)).reshape(-1)
    if p.nbit == 8:
        if p.twos_complement:
            codes = raw.astype(np.int8).astype(np.int64)
        else:
            codes = raw.astype(np.int64)
    else:
        per = 8 // p.nbit
        mask = (1 << p.nbit) - 1
        shifts = (np.arange(per) * p.nbit)[::-1]  # msb first
        codes = ((raw[:, None].astype(np.int64) >> shifts[None, :]) & mask
                 ).reshape(-1)
    T = p.block_ndat(npart)
    return codes.reshape(T, p.nchan_in, p.npol, p.ndim).transpose(1, 2, 3, 0)


def _twobit_levels_np(codes, plan: MegaPlan, cst: MegaConstants):
    """JA98 per-block levels + channel weights (numpy, float64).

    codes: [nchan, npol, ndim, T] 2-bit codes.  Returns
    (vals [nchan, npol, ndim, T], w_chan [nchan, nweights]).
    """
    p = plan
    tb = cst.twobit
    lo_t, hi_t = tb.level_tables
    w_t = tb.weight_table
    T = codes.shape[-1]
    nweights = T // p.npw
    is_low = (codes == 1) | (codes == 2)
    nlow = is_low.reshape(*codes.shape[:-1], nweights, p.npw).sum(-1)
    lo = lo_t.astype(np.float64)[nlow]   # [nchan, npol, ndim, nweights]
    hi = hi_t.astype(np.float64)[nlow]
    wd = w_t.astype(np.float64)[nlow]
    sign = np.where(codes >= 2, 1.0, -1.0)
    mag = np.where(is_low,
                   np.repeat(lo, p.npw, axis=-1),
                   np.repeat(hi, p.npw, axis=-1))
    vals = sign * mag
    w_chan = wd.reshape(p.nchan_in, p.npol * p.ndim, nweights).min(axis=1)
    return vals, w_chan


# --------------------------------------------------------------------------
# numpy reference (slow, float64) — ground truth for the kernel tests
# --------------------------------------------------------------------------

def mega_reference(raw: np.ndarray, plan: MegaPlan, cst: MegaConstants,
                   phi0: np.ndarray, dphi: np.ndarray, npart: int,
                   ext_weights: Optional[np.ndarray] = None):
    """Straight-line float64 implementation of the fused step.

    raw: uint8[block_ndat * nchan * npol * ndim * nbit/8] interleaved TFP
    bytes (or float32 when plan.nbit == 32).  ext_weights: optional
    [nchan_in, npart] per-window weights.  Returns
    (profiles [nchan_in, npol_out, nsub, nbin], hits [nchan_in, nbin]).
    """
    p = plan
    R1, R2, q, nsub = p.R1, p.R2, p.q, p.nsub
    # unpack + deinterleave to [nchan, npol, ndim, T] float64
    if p.nbit == 32:
        vals = np.asarray(raw, np.float64).reshape(
            -1, p.nchan_in, p.npol, p.ndim).transpose(1, 2, 3, 0)
        wgt = np.ones((p.nchan_in, npart))
    elif p.npw:
        codes = _decode_codes_np(np.asarray(raw), p, npart)
        vals, w_chan = _twobit_levels_np(codes, p, cst)
        wgt = np.ones((p.nchan_in, npart))
        for w, (a, b) in enumerate(window_weight_spans(p, npart)):
            wgt[:, w] = w_chan[:, a:b].min(axis=1)
    else:
        codes = _decode_codes_np(np.asarray(raw), p, npart)
        vals = codes.astype(np.float64)
        if p.twos_complement and p.nbit < 8:
            # sub-byte two's-complement fields wrap to the signed value
            # (8-bit codes are decoded as int8 already)
            n = 1 << p.nbit
            vals = np.where(vals >= n // 2, vals - n, vals)
        vals = vals * cst.unpack_scale + cst.unpack_offset
        wgt = np.ones((p.nchan_in, npart))
    if ext_weights is not None:
        wgt = wgt * np.asarray(ext_weights, np.float64)
    if p.real_input:
        x = vals[:, :, 0, :]  # [nchan, npol, T]
    else:
        x = vals[:, :, 0, :] + 1j * vals[:, :, 1, :]

    W1 = cst.w1r.astype(np.float64) + 1j * cst.w1i.astype(np.float64)
    T_ = cst.tr.astype(np.float64) + 1j * cst.ti.astype(np.float64)
    E = cst.er.astype(np.float64) + 1j * cst.ei.astype(np.float64)
    G = cst.gr.astype(np.float64) + 1j * cst.gi.astype(np.float64)
    Mb = cst.mr.astype(np.float64) + 1j * cst.mi.astype(np.float64)
    U = cst.ur.astype(np.float64) + 1j * cst.ui.astype(np.float64)
    V = cst.vr.astype(np.float64) + 1j * cst.vi.astype(np.float64)

    J = (cst.jxr.astype(np.float64) + 1j * cst.jxi.astype(np.float64)
         if cst.jxr is not None else None)

    profiles = np.zeros((p.nchan_in, p.nplane, nsub, p.nbin))
    hits = np.zeros((p.nchan_in, p.nbin))
    for ci in range(p.nchan_in):
        for w in range(npart):
            Xpols = []
            for pol in range(p.npol):
                win = x[ci, pol,
                        w * p.nsamp_step: w * p.nsamp_step + p.nsamp_fft]
                Wm = win.reshape(R1, -1)  # [n1, m] (m = 2*R2 real, R2 cplx)
                if cst.apod is not None:
                    Wm = Wm * cst.apod.astype(np.float64)
                S = np.einsum("nm,nk->mk", Wm, W1)         # [mult*R2, R1]
                C = S * T_                                  # twiddle
                X = np.einsum("mk,mj->kj", C, E)            # [R1, R2]
                Xpols.append(X)
            if J is not None:
                # matrix convolution: 2x2 mix of the input-pol spectra
                Ypols = [J[ci, 2 * a + 0] * Xpols[0]
                         + J[ci, 2 * a + 1] * Xpols[1] for a in range(2)]
            else:
                Ypols = [X * G[ci] for X in Xpols]          # scalar chirp
            Fpols = []
            for Y in Ypols:
                E1 = Y @ Mb                                 # [R1, R2]
                C2 = E1 * U
                F = np.einsum("kr,kc->rc", C2, V)           # [R2, R1]
                Fpols.append(F)
            # detection in permuted layout
            if p.detection == "pp":
                planes = [np.abs(Fpols[0]) ** 2]
            elif p.detection == "qq":
                planes = [np.abs(Fpols[1]) ** 2]
            elif p.npol_out == 1:
                planes = [sum(np.abs(F) ** 2 for F in Fpols)]
            elif p.npol_out == 2:
                planes = [np.abs(Fpols[0]) ** 2, np.abs(Fpols[1]) ** 2]
            elif p.detection == "coherence":
                # PP, QQ, Re[p* q], Im[p* q] (cross_detect.ic:36-40)
                pp = np.abs(Fpols[0]) ** 2
                qq = np.abs(Fpols[1]) ** 2
                cross = np.conj(Fpols[0]) * Fpols[1]
                planes = [pp, qq, cross.real, cross.imag]
            else:  # Stokes I,Q,U,V with U+iV = 2 p* q (stokes_detect.ic)
                pp = np.abs(Fpols[0]) ** 2
                qq = np.abs(Fpols[1]) ** 2
                cross = np.conj(Fpols[0]) * Fpols[1]
                planes = [pp + qq, pp - qq, 2 * cross.real, 2 * cross.imag]
            if p.fourth_moment:
                # S then the 10 unique S_i*S_j (FourthMoment.C plane order,
                # ops.fourth_moment.PAIRS)
                planes = planes + [planes[i] * planes[j]
                                   for i in range(4) for j in range(i, 4)]
            # fold (window weight folded into the one-hot)
            for j1 in range(q):
                k2p = np.arange(R1)
                t = k2p * q + j1
                # f32 phase arithmetic, mirroring the device kernel exactly
                phi = (np.float32(phi0[w])
                       + np.float32(dphi[w])
                       * (t - p.nfilt_pos).astype(np.float32))
                frac = (phi - np.floor(phi)).astype(np.float32)
                b = np.minimum((frac * np.float32(p.nbin)).astype(np.int64),
                               p.nbin - 1)
                keep = (t >= p.nfilt_pos) & (t < p.nfilt_pos + p.nkeep)
                onehot = np.zeros((R1, p.nbin))
                onehot[np.arange(R1)[keep], b[keep]] = wgt[ci, w]
                for ip, P in enumerate(planes):
                    rows = P[np.arange(nsub) * q + j1, :]  # [nsub, R1]
                    profiles[ci, ip] += rows @ onehot
                hits[ci] += onehot.sum(axis=0)
    return profiles, hits


# --------------------------------------------------------------------------
# the Pallas kernel
# --------------------------------------------------------------------------

def _prepare_input(raw, plan: MegaPlan, npart: int, cst: MegaConstants):
    """XLA pre-stage: raw bytes -> kernel operands.

    Returns (x [nchan, npol, ndim, totrows, row_len] int8/f32,
             lohi [nchan, npol, ndim, 2, totrows, nlev] f32 or None,
             wgt2 [nchan, npart] f32 or None).
    """
    from ..unpack.unpackers import bytes_to_codes, onehot_lookup

    p = plan
    totrows = p.total_rows(npart)
    ndig = p.nchan_in * p.npol * p.ndim
    lohi = None
    wgt2 = None
    # TFP -> FPT as ONE 2-D transpose [T, ndig] -> [ndig, T]: reshaping to
    # [T, nchan, npol, ndim] first materializes an array whose tiny minor
    # dims (2, 2) tile-pad ~128x in HBM (observed 31 GB for a 245 MB
    # block); the 2-D form keeps both layouts dense
    if p.nbit == 32:
        ct = raw.reshape(-1, ndig).T.reshape(
            p.nchan_in, p.npol, p.ndim, -1)
        x = ct.reshape(p.nchan_in, p.npol, p.ndim, totrows, p.row_len)
        return x, lohi, wgt2
    if p.interleave != "tfp":
        from ..unpack.unpackers import reorder_bytes_tfp

        raw = reorder_bytes_tfp(raw, p.interleave, p.npol)
    if p.nbit == 8:
        codes = jax.lax.bitcast_convert_type(raw, jnp.int8)
    else:
        codes = bytes_to_codes(raw, p.nbit).astype(jnp.int8)
    ct = codes.reshape(-1, ndig).T.reshape(
        p.nchan_in, p.npol, p.ndim, -1)  # [nchan, npol, ndim, T]
    x = ct.reshape(p.nchan_in, p.npol, p.ndim, totrows, p.row_len)
    if p.npw:
        # JA98 per-block nlow -> levels + excision weights (the table
        # lookup lives here as one-hot matmuls; the level APPLICATION is
        # in-kernel).  Reference TwoBitCorrection::dig_unpack +
        # ExcisionUnpacker nlow window.
        tb = cst.twobit
        T = p.block_ndat(npart)
        nweights = T // p.npw
        is_low = jnp.logical_or(ct == 1, ct == 2)
        nlow = jnp.sum(
            is_low.reshape(p.nchan_in, p.npol, p.ndim, nweights, p.npw),
            axis=-1).astype(jnp.int32)
        npw1 = p.npw + 1
        lo = onehot_lookup(jnp.asarray(tb.level_tables[0]), nlow, npw1)
        hi = onehot_lookup(jnp.asarray(tb.level_tables[1]), nlow, npw1)
        wd = onehot_lookup(jnp.asarray(tb.weight_table), nlow, npw1)
        lohi = jnp.stack([lo, hi], axis=3).reshape(
            p.nchan_in, p.npol, p.ndim, 2, totrows, p.nlev)
        w_chan = jnp.min(wd.reshape(p.nchan_in, p.npol * p.ndim, nweights),
                         axis=1)
        cols = [jnp.min(w_chan[:, a:b], axis=1)
                for (a, b) in window_weight_spans(p, npart)]
        wgt2 = jnp.stack(cols, axis=1)  # [nchan, npart]
    return x, lohi, wgt2


def build_megastep(plan: MegaPlan, cst: MegaConstants, npart: int,
                   interpret: Optional[bool] = None,
                   external_weights: bool = False,
                   response_as_args: bool = False):
    """Returns a jittable fused fold step.

    Signature: ``fn(profiles, hits, raw, phi0, dphi[, weights][, gr, gi])``
    -> ``(profiles, hits)`` where profiles is
    ``f32[nchan_in, npol_out, nsub, nbin]`` and hits
    ``f32[nchan_in, nbin]`` (both donated carries).

    raw: uint8 flat TFP bytes (2/4/8-bit packed) or float32 of the same
    logical sample count when plan.nbit == 32.  With
    ``external_weights=True`` the step takes an extra
    ``weights f32[nchan_in, npart]`` per-window multiplicative mask (SK/RFI
    masks computed outside the kernel; combined with the 2-bit excision
    weights when both are present).  With ``response_as_args=True`` the
    per-channel chirp pair rides as TRACED step arguments
    ``gr/gi f32[nchan_in, R1, R2]`` instead of closure constants — so a
    channel-sharded ``shard_map`` can hand each shard its own channels'
    response while sharing ONE compiled program (the MPITrans-style
    channel scatter on the fused path).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = plan
    p.validate()
    R1, R2, q, nsub = p.R1, p.R2, p.q, p.nsub
    nbin, npol, npol_out = p.nbin, p.npol, p.npol_out
    nplane = p.nplane
    nchan, ndim = p.nchan_in, p.ndim
    totrows = p.total_rows(npart)
    consts = cst.as_jax()
    scale, offset = cst.unpack_scale, cst.unpack_offset
    has_lohi = bool(p.npw)
    has_apod = cst.apod is not None
    # pp/qq detection folds ONE polarization's power: the other pol's FFT
    # is never computed (half the MXU work, Detection.C PP_State/QQ_State)
    pols = {"pp": (0,), "qq": (1,)}.get(p.detection, tuple(range(npol)))
    if interpret is None:
        # Mosaic compiles for real TPU backends (incl. the tunneled one);
        # interpret only on CPU (tests)
        interpret = jax.default_backend() == "cpu"

    f32 = jnp.float32

    def dot00(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    def kernel(*refs):
        it = iter(refs)
        phi0_ref = next(it)
        dphi_ref = next(it)
        wgt_ref = next(it)
        bounds_ref = next(it)
        x_ref = next(it)
        lohi_ref = next(it) if has_lohi else None
        (w1r, w1i, tr, ti, er, ei, gr, gi,
         mr, mi, ur, ui, vr, vi, sel) = (next(it) for _ in range(15))
        expand = next(it) if has_lohi else None
        apod = next(it) if has_apod else None
        prof_in = next(it)
        hits_in = next(it)
        prof_out = next(it)
        hits_out = next(it)
        win = next(it)
        dma_sem = next(it)
        pacc = next(it)
        xacc = next(it)
        prof_acc = next(it)
        hits_acc = next(it)

        ci = pl.program_id(0)
        w = pl.program_id(1)

        @pl.when(w == 0)
        def _init():
            prof_acc[...] = jnp.zeros_like(prof_acc)
            hits_acc[...] = jnp.zeros_like(hits_acc)

        row0 = w * p.step_rows

        def load_plane(pol, d):
            """DMA one (pol, dim) window plane and apply the unpack map —
            the n-bit -> voltage conversion lives INSIDE the kernel."""
            copy = pltpu.make_async_copy(
                x_ref.at[ci, pol, d, pl.ds(row0, R1), :], win, dma_sem)
            copy.start()
            copy.wait()
            v = win[...].astype(f32)
            if p.nbit == 32:
                return v
            if p.nbit == 8:
                # window arrives as int8 (Mosaic has no u8->f32 cast)
                if not p.twos_complement:
                    # undo the wrap to recover the unsigned byte value
                    # (two's complement IS the signed value: affine map)
                    v = v + jnp.where(v < 0, f32(256), f32(0))
                return v * f32(scale) + f32(offset)
            if not has_lohi:
                # 1/2/4-bit fixed-level (BitTable) unpack: affine on the
                # field code; two's-complement fields wrap to signed first
                if p.twos_complement:
                    half = float(1 << (p.nbit - 1))
                    v = v - jnp.where(v >= f32(half), f32(2 * half), f32(0))
                return v * f32(scale) + f32(offset)
            # nbit == 2: JA98 dynamic levels.  The per-block lo/hi arrays
            # are tiny (T/npw values) and ride whole in VMEM (BlockSpec,
            # pipelined per channel); EXPAND broadcasts this window's rows
            # to per-sample magnitudes on the MXU (TwoBitCorrection level
            # application)
            lo_rows = lohi_ref[0, pol, d, 0, pl.ds(row0, R1), :]
            hi_rows = lohi_ref[0, pol, d, 1, pl.ds(row0, R1), :]
            lo_exp = mm(lo_rows, expand[...])
            hi_exp = mm(hi_rows, expand[...])
            sign = jnp.where(v >= f32(2), f32(1), f32(-1))
            is_low = jnp.logical_or(v == f32(1), v == f32(2))
            return sign * jnp.where(is_low, lo_exp, hi_exp)

        for pol in pols:
            if p.real_input:
                wm = load_plane(pol, 0)
                if has_apod:
                    wm = wm * apod[...]
                # real-input stage 1: real x complex DFT (2 matmuls)
                sr = dot00(wm, w1r[...])
                si = dot00(wm, w1i[...])
            else:
                ar = load_plane(pol, 0)
                ai = load_plane(pol, 1)
                if has_apod:
                    ar = ar * apod[...]
                    ai = ai * apod[...]
                # complex-input stage 1 (4 matmuls)
                sr = dot00(ar, w1r[...]) - dot00(ai, w1i[...])
                si = dot00(ar, w1i[...]) + dot00(ai, w1r[...])
            cr = sr * tr[...] - si * ti[...]
            ci_ = sr * ti[...] + si * tr[...]
            xr = dot00(cr, er[...]) - dot00(ci_, ei[...])
            xi = dot00(cr, ei[...]) + dot00(ci_, er[...])
            yr = xr * gr[0] - xi * gi[0]
            yi = xr * gi[0] + xi * gr[0]
            e1r = mm(yr, mr[...]) - mm(yi, mi[...])
            e1i = mm(yr, mi[...]) + mm(yi, mr[...])
            c2r = e1r * ur[...] - e1i * ui[...]
            c2i = e1r * ui[...] + e1i * ur[...]
            fr = dot00(c2r, vr[...]) - dot00(c2i, vi[...])
            fi = dot00(c2r, vi[...]) + dot00(c2i, vr[...])
            if npol_out == 1:
                pw = fr * fr + fi * fi
                if pol == pols[0]:
                    pacc[...] = pw
                else:
                    pacc[...] = pacc[...] + pw
            else:
                xacc[2 * pol, :, :] = fr
                xacc[2 * pol + 1, :, :] = fi

        if npol_out == 1:
            planes = [pacc[...]]
        elif npol_out == 2:
            planes = [xacc[0] * xacc[0] + xacc[1] * xacc[1],
                      xacc[2] * xacc[2] + xacc[3] * xacc[3]]
        else:
            pp = xacc[0] * xacc[0] + xacc[1] * xacc[1]
            qq = xacc[2] * xacc[2] + xacc[3] * xacc[3]
            re = xacc[0] * xacc[2] + xacc[1] * xacc[3]
            im = xacc[0] * xacc[3] - xacc[1] * xacc[2]
            if p.detection == "coherence":
                # PP, QQ, Re[p* q], Im[p* q] (cross_detect.ic:36-40)
                planes = [pp, qq, re, im]
            else:
                # U + iV = 2 p* q (stokes_detect.ic:38-43)
                planes = [pp + qq, pp - qq, 2 * re, 2 * im]
        if p.fourth_moment:
            # the 10 unique S_i*S_j products (FourthMoment.C; -4):
            # pure VPU elementwise on the already-detected Stokes planes
            planes = planes + [planes[i] * planes[j]
                               for i in range(4) for j in range(i, 4)]

        phi0 = phi0_ref[w, 0]
        dphi = dphi_ref[w, 0]
        wgt = wgt_ref[ci, w]
        # sample-exact sub-integration bounds (TimeDivide/SubFold): only
        # output samples [lo, hi) of the block fold; full blocks pass
        # [0, +inf).  Indices ride in f32 (exact below 2^24; the pipeline
        # asserts out_per_block stays under that when bounds are active).
        lo_b = bounds_ref[0, 0]
        hi_b = bounds_ref[1, 0]
        # this window's first output sample within the block, minus the
        # overlap-save head discard: global index = t - nfilt_pos + w*nkeep
        woff = (w * p.nkeep - p.nfilt_pos).astype(f32)
        bin_ids = jax.lax.broadcasted_iota(jnp.int32, (R1, nbin), 1)
        k2p = jax.lax.broadcasted_iota(jnp.int32, (R1, nbin), 0).astype(f32)
        for j1 in range(q):
            t = k2p * float(q) + float(j1)
            phi = phi0 + dphi * (t - float(p.nfilt_pos))
            frac = phi - jnp.floor(phi)
            b = jnp.floor(frac * float(nbin)).astype(jnp.int32)
            b = jnp.clip(b, 0, nbin - 1)
            keep = jnp.logical_and(t >= float(p.nfilt_pos),
                                   t < float(p.nfilt_pos + p.nkeep))
            gidx = t + woff
            keep = jnp.logical_and(
                keep, jnp.logical_and(gidx >= lo_b, gidx < hi_b))
            # excision/SK weight folded into the one-hot: scales both the
            # profile contraction AND the hit counts (WeightedTimeSeries)
            onehot = jnp.where(jnp.logical_and(b == bin_ids, keep),
                               wgt, f32(0))
            for ip, plane in enumerate(planes):
                rows = mm(sel[j1], plane)
                prof_acc[ip, :, :] = prof_acc[ip, :, :] + mm(rows, onehot)
            hits_acc[0:1, :] = hits_acc[0:1, :] + jnp.sum(
                onehot, axis=0, keepdims=True)

        @pl.when(w == npart - 1)
        def _fin():
            prof_out[0] = prof_in[0] + prof_acc[...]
            hits_out[0] = hits_in[0] + hits_acc[...]

    in_dtype = jnp.int8 if p.nbit != 32 else jnp.float32
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # phi0 [npart, 1]
        pl.BlockSpec(memory_space=pltpu.SMEM),  # dphi [npart, 1]
        pl.BlockSpec(memory_space=pltpu.SMEM),  # wgt [nchan, npart]
        pl.BlockSpec(memory_space=pltpu.SMEM),  # bounds [2, 1] f32
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # x planes
    ]
    if has_lohi:
        # lohi [nchan, npol, ndim, 2, totrows, nlev]: whole per-channel
        # block in VMEM (tiny: T/npw values per digitizer pair)
        in_specs.append(pl.BlockSpec(
            (1, npol, ndim, 2, totrows, p.nlev),
            lambda c, w: (c, 0, 0, 0, 0, 0), memory_space=pltpu.VMEM))
    # constants: the chirp pair is per-channel (pipelined via BlockSpec);
    # the DFT matrices are channel-independent (whole-array VMEM)
    for name in ("w1r", "w1i", "tr", "ti", "er", "ei"):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1, R1, R2), lambda c, w: (c, 0, 0),
                                 memory_space=pltpu.VMEM))  # gr
    in_specs.append(pl.BlockSpec((1, R1, R2), lambda c, w: (c, 0, 0),
                                 memory_space=pltpu.VMEM))  # gi
    for name in ("mr", "mi", "ur", "ui", "vr", "vi", "sel"):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if has_lohi:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # expand
    if has_apod:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # apod
    in_specs.append(pl.BlockSpec((1, nplane, nsub, nbin),
                                 lambda c, w: (c, 0, 0, 0),
                                 memory_space=pltpu.VMEM))  # prof_in
    # hits ride as [nchan, 1, nbin] so the per-channel block's LAST TWO
    # dims (1, nbin) equal the array dims (Mosaic tiling requirement)
    in_specs.append(pl.BlockSpec((1, 1, nbin), lambda c, w: (c, 0, 0),
                                 memory_space=pltpu.VMEM))  # hits_in

    out_specs = [
        pl.BlockSpec((1, nplane, nsub, nbin), lambda c, w: (c, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nbin), lambda c, w: (c, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    scratch_shapes = [
        pltpu.VMEM((R1, p.row_len), in_dtype),    # window plane
        pltpu.SemaphoreType.DMA(()),
        pltpu.VMEM((R2, R1), jnp.float32),        # pacc
        pltpu.VMEM((2 * p.npol if npol_out > 1 else 1, R2, R1),
                   jnp.float32),                  # voltage planes
        pltpu.VMEM((nplane, nsub, nbin), jnp.float32),
        pltpu.VMEM((1, nbin), jnp.float32),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nchan, npart),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    pre_consts = [consts[n] for n in
                  ("w1r", "w1i", "tr", "ti", "er", "ei")]
    resp_consts = [] if response_as_args else [consts["gr"], consts["gi"]]
    post_consts = [consts[n] for n in
                   ("mr", "mi", "ur", "ui", "vr", "vi", "sel")]
    if has_lohi:
        post_consts.append(jnp.asarray(cst.expand))
    if has_apod:
        post_consts.append(jnp.asarray(cst.apod))

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nchan, nplane, nsub, nbin), jnp.float32),
            jax.ShapeDtypeStruct((nchan, 1, nbin), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ) if not interpret else None,
    )

    def _run(profiles, hits, raw, phi0, dphi, ext_wgt, resp, bounds=None):
        x, lohi, wgt2 = _prepare_input(raw, p, npart, cst)
        if wgt2 is None:
            wgt = jnp.ones((nchan, npart), jnp.float32)
        else:
            wgt = wgt2
        if ext_wgt is not None:
            wgt = wgt * ext_wgt.astype(jnp.float32)
        if bounds is None:
            bnd = jnp.array([[0.0], [3e38]], jnp.float32)
        else:
            bnd = bounds.astype(jnp.float32).reshape(2, 1)
        args = [phi0.reshape(npart, 1), dphi.reshape(npart, 1), wgt, bnd, x]
        if has_lohi:
            args.append(lohi)
        args += pre_consts
        args += list(resp) if response_as_args else resp_consts
        args += post_consts
        args += [profiles, hits.reshape(nchan, 1, nbin)]
        out = call(*args)
        return out[0], out[1].reshape(nchan, nbin)

    def _f32(raw):
        if raw.dtype == jnp.uint8 and p.nbit == 32:
            return jax.lax.bitcast_convert_type(
                raw.reshape(-1, 4), jnp.float32).reshape(-1)
        return raw

    # every wrapper takes an optional trailing ``bounds`` (f32[2] sample
    # span [lo, hi) within the block's output domain, TimeDivide): calls
    # without it compile the unbounded program unchanged; a pipeline with
    # sub-integrations enabled always passes bounds so ONE bounded program
    # serves both full and boundary blocks.
    if external_weights:
        @partial(jax.jit, donate_argnums=(0, 1))
        def step(profiles, hits, raw, phi0, dphi, weights, bounds=None):
            """profiles [nchan, npol_out, nsub, nbin], hits [nchan, nbin],
            raw flat TFP bytes, phi0/dphi [npart], weights [nchan, npart]."""
            return _run(profiles, hits, _f32(raw), phi0, dphi, weights,
                        None, bounds)
    elif response_as_args:
        @partial(jax.jit, donate_argnums=(0, 1))
        def step(profiles, hits, raw, phi0, dphi, gr, gi, bounds=None):
            """profiles [nchan, npol_out, nsub, nbin], hits [nchan, nbin],
            raw flat TFP bytes, phi0/dphi [npart], gr/gi the per-channel
            chirp pair [nchan, R1, R2] (channel-shardable)."""
            return _run(profiles, hits, _f32(raw), phi0, dphi, None,
                        (gr, gi), bounds)
    else:
        @partial(jax.jit, donate_argnums=(0, 1))
        def step(profiles, hits, raw, phi0, dphi, bounds=None):
            """profiles [nchan, npol_out, nsub, nbin], hits [nchan, nbin],
            raw flat TFP bytes, phi0/dphi [npart]."""
            return _run(profiles, hits, _f32(raw), phi0, dphi, None, None,
                        bounds)

    return step


# --------------------------------------------------------------------------
# search-mode variant: fused unpack -> filterbank(+chirp) -> detect
# --------------------------------------------------------------------------

def build_megafil(plan: MegaPlan, cst: MegaConstants, npart: int,
                  interpret: Optional[bool] = None,
                  return_weights: bool = False,
                  output: str = "detected",
                  passband: bool = False,
                  response_as_args: bool = False,
                  jones_as_args: bool = False):
    """Fused front end: unpack -> forward FFT -> response -> subband
    inversion [-> detect], one ``pallas_call`` per block, plus the (cheap,
    XLA) de-permutation back to time order.  Serves digifil's hot path AND
    the hybrid fold steps (models.load_to_fold): anything the fully-fused
    fold kernel can't express (in-stream SK, cyclic folding, Jones matrix
    convolution, multi-pulsar folds, passband taps, nsub == 1 pure
    convolution) runs this front end and finishes in XLA.

    ``output="detected"`` (default) returns
    ``float32[nchan_in*nsub, nplane, npart*nkeep]`` of detected,
    time-ordered filterbank samples for any detection state of the plan
    (Intensity / PPQQ / PP / QQ / Coherence / Stokes; coherence planes 0/1
    are the per-pol powers SpectralKurtosis needs).

    ``output="voltage"`` skips detection and returns the undetected complex
    baseband as a split-complex pair ``(re, im)``, each
    ``float32[nchan_in*nsub, npol, npart*nkeep]`` — exactly what
    ``ops.filterbank.invert_subbands`` / ``ops.convolution`` produce, so
    every downstream XLA op (detect, lag products, fourth moments, SK)
    composes unchanged.

    ``passband=True`` adds an integrated pre-response bandpass
    ``float32[nchan_in*nsub, npol, freq_res]`` (sum of |spectrum|^2 over
    this block's windows, natural bin order — the reference Response
    passband integration during Convolution).

    When the constants carry a Jones response (``cst.jxr``), the per-pol
    scalar chirp multiply is replaced by the 2x2 matrix mix of the two
    input-pol spectra (matrix convolution, ``Convolution.C:425-436``).

    With ``return_weights=True`` the per-window 2-bit excision weights
    ``wgt f32[nchan_in, npart]`` are appended (all ones when the plan has
    no JA98 path).  Return value order: ``data[, wgt][, pb]`` (a bare array
    or SC pair when nothing else is requested).

    With ``response_as_args=True`` the per-channel response pair rides as
    TRACED step arguments ``step(raw, gr, gi)`` instead of closure
    constants — so a per-block response (e.g. the chirp times a
    time-adaptive RFI zap mask, reference RFIFilter x ResponseProduct) can
    reach the fused front end without recompilation.

    With ``jones_as_args=True`` the four Jones response planes ride as
    TRACED step arguments ``jxr/jxi f32[nchan_in, 4, R1, R2]`` (appended
    after the scalar response args when both are traced) — so a
    channel-sharded ``shard_map`` can hand each shard its channel group's
    Jones planes while sharing ONE compiled program.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = plan
    p.validate()
    if p.fourth_moment:
        raise ValueError("megafil: apply fourth moments after the front end")
    if output not in ("detected", "voltage"):
        raise ValueError(f"unknown output mode: {output}")
    voltage = output == "voltage"
    R1, R2, q, nsub = p.R1, p.R2, p.q, p.nsub
    npol, nchan, ndim = p.npol, p.nchan_in, p.ndim
    npol_out, nplane = p.npol_out, p.nplane
    totrows = p.total_rows(npart)
    consts = cst.as_jax()
    scale, offset = cst.unpack_scale, cst.unpack_offset
    has_lohi = bool(p.npw)
    has_apod = cst.apod is not None
    has_jones = cst.jxr is not None or jones_as_args
    # output pols folded into the detected planes; with Jones or voltage
    # output (or a passband tap) every INPUT pol's spectrum is computed
    pols = {"pp": (0,), "qq": (1,)}.get(p.detection, tuple(range(npol)))
    out_pols = tuple(range(npol)) if voltage else pols
    nplane_out = 2 * npol if voltage else nplane
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    f32 = jnp.float32

    def dot00(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        lohi_ref = next(it) if has_lohi else None
        (w1r, w1i, tr, ti, er, ei, gr, gi) = (next(it) for _ in range(8))
        jxr = next(it) if has_jones else None
        jxi = next(it) if has_jones else None
        (mr, mi, ur, ui, vr, vi, sel) = (next(it) for _ in range(7))
        expand = next(it) if has_lohi else None
        apod = next(it) if has_apod else None
        out_ref = next(it)
        pb_ref = next(it) if passband else None
        win = next(it)
        dma_sem = next(it)
        xacc = next(it) if (not voltage and npol_out > 1) else None
        xspec = next(it) if has_jones else None

        ci = pl.program_id(0)
        w = pl.program_id(1)

        if passband:
            @pl.when(w == 0)
            def _pb_init():
                pb_ref[...] = jnp.zeros_like(pb_ref)

        def load_plane(pol, d):
            copy = pltpu.make_async_copy(
                x_ref.at[ci, pol, d, pl.ds(w * p.step_rows, R1), :],
                win, dma_sem)
            copy.start()
            copy.wait()
            v = win[...].astype(f32)
            if p.nbit == 32:
                return v
            if p.nbit == 8:
                if not p.twos_complement:
                    # window arrives as int8; undo the wrap to recover the
                    # unsigned byte (two's complement IS the signed value)
                    v = v + jnp.where(v < 0, f32(256), f32(0))
                return v * f32(scale) + f32(offset)
            if not has_lohi:
                # 1/2/4-bit fixed-level (BitTable) unpack: affine on the
                # field code; two's-complement fields wrap to signed first
                if p.twos_complement:
                    half = float(1 << (p.nbit - 1))
                    v = v - jnp.where(v >= f32(half), f32(2 * half), f32(0))
                return v * f32(scale) + f32(offset)
            lo_rows = lohi_ref[0, pol, d, 0, pl.ds(w * p.step_rows, R1), :]
            hi_rows = lohi_ref[0, pol, d, 1, pl.ds(w * p.step_rows, R1), :]
            lo_exp = mm(lo_rows, expand[...])
            hi_exp = mm(hi_rows, expand[...])
            sign = jnp.where(v >= f32(2), f32(1), f32(-1))
            is_low = jnp.logical_or(v == f32(1), v == f32(2))
            return sign * jnp.where(is_low, lo_exp, hi_exp)

        def forward(pol):
            """One pol's window -> [R1, R2] spectrum (pre-response)."""
            if p.real_input:
                wm = load_plane(pol, 0)
                if has_apod:
                    wm = wm * apod[...]
                sr = dot00(wm, w1r[...])
                si = dot00(wm, w1i[...])
            else:
                ar = load_plane(pol, 0)
                ai = load_plane(pol, 1)
                if has_apod:
                    ar = ar * apod[...]
                    ai = ai * apod[...]
                sr = dot00(ar, w1r[...]) - dot00(ai, w1i[...])
                si = dot00(ar, w1i[...]) + dot00(ai, w1r[...])
            cr = sr * tr[...] - si * ti[...]
            ci_ = sr * ti[...] + si * tr[...]
            xr = dot00(cr, er[...]) - dot00(ci_, ei[...])
            xi = dot00(cr, ei[...]) + dot00(ci_, er[...])
            if passband:
                pb_ref[0, pol] = pb_ref[0, pol] + (xr * xr + xi * xi)
            return xr, xi

        def inverse(yr, yi):
            """Post-response spectrum -> [R2, R1] subband time planes."""
            e1r = mm(yr, mr[...]) - mm(yi, mi[...])
            e1i = mm(yr, mi[...]) + mm(yi, mr[...])
            c2r = e1r * ur[...] - e1i * ui[...]
            c2i = e1r * ui[...] + e1i * ur[...]
            fr = dot00(c2r, vr[...]) - dot00(c2i, vi[...])
            fi = dot00(c2r, vi[...]) + dot00(c2i, vr[...])
            return fr, fi

        def emit(pol, first, fr, fi):
            if voltage:
                out_ref[0, 0, 2 * pol] = fr
                out_ref[0, 0, 2 * pol + 1] = fi
            elif npol_out == 1:
                pw = fr * fr + fi * fi
                if first:
                    out_ref[0, 0, 0, :, :] = pw
                else:
                    out_ref[0, 0, 0, :, :] = out_ref[0, 0, 0, :, :] + pw
            else:
                xacc[2 * pol, :, :] = fr
                xacc[2 * pol + 1, :, :] = fi

        if has_jones:
            for pol in range(npol):
                xr, xi = forward(pol)
                xspec[2 * pol, :, :] = xr
                xspec[2 * pol + 1, :, :] = xi
            for i, pol in enumerate(out_pols):
                # Y_p = J[p,0] X_0 + J[p,1] X_1 (complex 2x2 mix)
                yr = (jxr[0, 2 * pol] * xspec[0] - jxi[0, 2 * pol] * xspec[1]
                      + jxr[0, 2 * pol + 1] * xspec[2]
                      - jxi[0, 2 * pol + 1] * xspec[3])
                yi = (jxr[0, 2 * pol] * xspec[1] + jxi[0, 2 * pol] * xspec[0]
                      + jxr[0, 2 * pol + 1] * xspec[3]
                      + jxi[0, 2 * pol + 1] * xspec[2])
                # the scalar response slot multiplies AFTER the matrix mix
                # (reference ResponseProduct: e.g. the RFIFilter zap mask
                # times the Jones response, Convolution.C:425-436).  With
                # no scalar response the constants are 1+0j (free).
                zr = yr * gr[0] - yi * gi[0]
                zi = yr * gi[0] + yi * gr[0]
                emit(pol, i == 0, *inverse(zr, zi))
        else:
            fwd_pols = tuple(range(npol)) if passband else out_pols
            i = 0
            for pol in fwd_pols:
                xr, xi = forward(pol)
                if pol not in out_pols:
                    continue
                yr = xr * gr[0] - xi * gi[0]
                yi = xr * gi[0] + xi * gr[0]
                emit(pol, i == 0, *inverse(yr, yi))
                i += 1

        if not voltage and npol_out == 2:
            out_ref[0, 0, 0] = xacc[0] * xacc[0] + xacc[1] * xacc[1]
            out_ref[0, 0, 1] = xacc[2] * xacc[2] + xacc[3] * xacc[3]
        elif not voltage and npol_out == 4:
            pp = xacc[0] * xacc[0] + xacc[1] * xacc[1]
            qq = xacc[2] * xacc[2] + xacc[3] * xacc[3]
            re = xacc[0] * xacc[2] + xacc[1] * xacc[3]
            im = xacc[0] * xacc[3] - xacc[1] * xacc[2]
            if p.detection == "coherence":
                out_ref[0, 0, 0], out_ref[0, 0, 1] = pp, qq
                out_ref[0, 0, 2], out_ref[0, 0, 3] = re, im
            else:
                out_ref[0, 0, 0], out_ref[0, 0, 1] = pp + qq, pp - qq
                out_ref[0, 0, 2], out_ref[0, 0, 3] = 2 * re, 2 * im

    in_dtype = jnp.int8 if p.nbit != 32 else jnp.float32
    in_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]  # x
    if has_lohi:
        in_specs.append(pl.BlockSpec(
            (1, npol, ndim, 2, totrows, p.nlev),
            lambda c, w: (c, 0, 0, 0, 0, 0), memory_space=pltpu.VMEM))
    for name in ("w1r", "w1i", "tr", "ti", "er", "ei"):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1, R1, R2), lambda c, w: (c, 0, 0),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1, R1, R2), lambda c, w: (c, 0, 0),
                                 memory_space=pltpu.VMEM))
    if has_jones:
        for _ in range(2):  # jxr, jxi [nchan, 4, R1, R2] per-channel slices
            in_specs.append(pl.BlockSpec(
                (1, 4, R1, R2), lambda c, w: (c, 0, 0, 0),
                memory_space=pltpu.VMEM))
    for name in ("mr", "mi", "ur", "ui", "vr", "vi", "sel"):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if has_lohi:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if has_apod:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # apod

    scratch_shapes = [
        pltpu.VMEM((R1, p.row_len), in_dtype),
        pltpu.SemaphoreType.DMA(()),
    ]
    if not voltage and npol_out > 1:
        scratch_shapes.append(pltpu.VMEM((2 * npol, R2, R1), jnp.float32))
    if has_jones:
        scratch_shapes.append(pltpu.VMEM((2 * npol, R1, R2), jnp.float32))

    out_specs = [pl.BlockSpec((1, 1, nplane_out, R2, R1),
                              lambda c, w: (c, w, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((nchan, npart, nplane_out, R2, R1),
                                       jnp.float32)]
    if passband:
        # revisited per channel across windows (accumulated in VMEM)
        out_specs.append(pl.BlockSpec((1, npol, R1, R2),
                                      lambda c, w: (c, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((nchan, npol, R1, R2),
                                               jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nchan, npart),
        in_specs=in_specs,
        out_specs=out_specs if passband else out_specs[0],
        scratch_shapes=scratch_shapes,
    )

    const_pre = [consts[n] for n in ("w1r", "w1i", "tr", "ti", "er", "ei")]
    const_resp = [] if response_as_args else [consts["gr"], consts["gi"]]
    const_jones = []
    if has_jones and not jones_as_args:
        const_jones = [jnp.asarray(cst.jxr), jnp.asarray(cst.jxi)]
    const_post = [consts[n] for n in
                  ("mr", "mi", "ur", "ui", "vr", "vi", "sel")]
    if has_lohi:
        const_post.append(jnp.asarray(cst.expand))
    if has_apod:
        const_post.append(jnp.asarray(cst.apod))

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes if passband else out_shapes[0],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ) if not interpret else None,
    )

    N = p.n_fft

    def _depermute_data(P):
        # de-permute: row s*q + j1, col k2' -> time t = k2'*q + j1
        P = P.reshape(nchan, npart, nplane_out, nsub, q, R1)
        P = jnp.transpose(P, (0, 3, 2, 1, 5, 4))
        P = P.reshape(nchan * nsub, nplane_out, npart, p.freq_res)
        if voltage and (nsub > 1 or not p.real_input):
            # restore the per-chunk ifftshift the kernel skips (baseband
            # centring == a (-1)^t factor on the voltage; it cancels in
            # every detection product but NOT in raw voltage or odd-lag
            # cyclic products).  nsub == 1 real input follows the
            # ops.convolution convention, which applies no output shift.
            sign = jnp.where(jnp.arange(p.freq_res) % 2 == 0, 1.0, -1.0
                             ).astype(jnp.float32)
            P = P * sign
        P = P[:, :, :, p.nfilt_pos : p.nfilt_pos + p.nkeep]
        P = P.reshape(nchan * nsub, nplane_out, npart * p.nkeep)
        if not voltage:
            return P
        # split interleaved (fr, fi) planes into an SC pair
        P = P.reshape(nchan * nsub, npol, 2, npart * p.nkeep)
        return P[:, :, 0], P[:, :, 1]

    def _depermute_pb(pb):
        # kernel spectral layout bin k = k2*R1 + k1 -> natural order
        flat = jnp.transpose(pb, (0, 1, 3, 2)).reshape(nchan, npol, N)
        if not p.real_input:
            # undo the fftshift folded into the response permutation
            flat = jnp.roll(flat, N // 2, axis=-1)
        flat = flat.reshape(nchan, npol, nsub, p.freq_res)
        return jnp.transpose(flat, (0, 2, 1, 3)).reshape(
            nchan * nsub, npol, p.freq_res)

    def _run(raw, resp, jones=None):
        """raw uint8/f32 flat TFP bytes -> data[, wgt][, pb]."""
        if raw.dtype == jnp.uint8 and p.nbit == 32:
            raw = jax.lax.bitcast_convert_type(
                raw.reshape(-1, 4), jnp.float32).reshape(-1)
        x, lohi, wgt2 = _prepare_input(raw, p, npart, cst)
        args = [x]
        if has_lohi:
            args.append(lohi)
        args += const_pre
        args += list(resp) if response_as_args else const_resp
        args += list(jones) if jones_as_args else const_jones
        args += const_post
        res = call(*args)
        if passband:
            P, pb = res
        else:
            P, pb = res, None
        data = _depermute_data(P)
        if not return_weights and not passband:
            return data
        out = [data]
        if return_weights:
            if wgt2 is None:
                wgt2 = jnp.ones((nchan, npart), jnp.float32)
            out.append(wgt2)
        if passband:
            out.append(_depermute_pb(pb))
        return tuple(out)

    if response_as_args and jones_as_args:
        @jax.jit
        def step(raw, gr, gi, jxr, jxi):
            return _run(raw, (gr, gi), (jxr, jxi))
    elif jones_as_args:
        @jax.jit
        def step(raw, jxr, jxi):
            """jxr/jxi f32[nchan_in, 4, R1, R2]: per-channel Jones planes
            in the kernel's permuted layout (MegaConstants jones)."""
            return _run(raw, None, (jxr, jxi))
    elif response_as_args:
        @jax.jit
        def step(raw, gr, gi):
            """gr/gi f32[nchan_in, R1, R2]: the per-channel response in the
            kernel's permuted spectral layout (permute_response)."""
            return _run(raw, (gr, gi))
    else:
        @jax.jit
        def step(raw):
            return _run(raw, None)

    return step
