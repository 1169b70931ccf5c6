"""Fused Pallas megakernel: unpack -> filterbank(+chirp) -> detect -> fold.

The round-1 pipeline expressed each block as one jitted XLA program of ~80
fused op instances; the execution backend charges a large fixed latency per
op instance (see PERF.md), so the block cost was dominated by op count, not
FLOPs.  This module collapses the entire flagship per-block pipeline —
8-bit unpack, real-input forward FFT, chirp multiply, per-subband inverse
FFT, square-law detection and phase folding — into a SINGLE ``pallas_call``
whose grid walks the overlap-save windows.  Everything runs out of VMEM as
dense MXU matmuls; there are **no transposes and no gathers**: every data
reorder is folded into the precomputed DFT/selection matrices, and the fold
scatter is a chunked one-hot contraction.

Mathematical structure (per window, per polarization):

1. **Forward FFT** of the window, computed as a direct two-stage
   factorization.  Real (Nyquist) input of ``nsamp_fft = 2N`` samples needs
   no even/odd packing or spectrum untangling; complex (analytic) input of
   ``N`` samples uses the same structure with ``mult = 1`` and its
   ``fftshift`` folded into the chirp permutation and the block-diagonal
   inverse-DFT column arrangement (so GUPPI/VDIF-class baseband takes the
   same fast path).  With the window viewed as ``W[n1, m]``,
   ``n = n1*(mult*R2) + m`` and output bin ``k = k2*R1 + k1`` (N = R1*R2),
   for the real case::

       S[m, k1]  = sum_n1 W[n1, m] * exp(-2i pi n1 k1 / R1)     (2 matmuls)
       C[m, k1]  = S[m, k1] * exp(-2i pi m k1 / 2N)             (twiddle)
       X[k1, k2] = sum_m C[m, k1] * exp(-2i pi m k2 / (2*R2))   (4 matmuls)

   because ``exp(-2i pi (n1*2*R2)(k2*R1)/2N) == 1``: the coarse time x
   coarse frequency phase vanishes, which is what makes the bins land in the
   permuted ``[k1, k2]`` layout with zero data movement.  Bins 0..N-1 of the
   half spectrum match ``ops.mxfft.rfft_sc`` (Nyquist dropped).

2. **Chirp multiply**: the dedispersion response (natural order, reference
   ``Dedispersion.C:534-545``) pre-permuted host-side into the same
   ``[k1, k2]`` layout — elementwise.

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
   window (``nfilt_pos <= t < nfilt_pos + nkeep``) applied as a mask inside
   the one-hot.

Accumulators (profiles [nchan_out, npol_out, nbin], hits [nbin]) ride VMEM
scratch across the grid and are added to the carried totals once, in the
final grid step.
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

    nsub: int          # output channels (nchan_subband; input nchan == 1)
    freq_res: int      # complex samples per subband per window
    R1: int            # first-stage radix (= rows of the spectrum layout)
    nfilt_pos: int     # complex samples dropped per window head (per subband)
    nfilt_neg: int     # rounded-up tail discard
    nbin: int          # fold phase bins
    npol: int          # input polarizations
    npol_out: int = 1  # 1 = Intensity, 2 = PPQQ, 4 = Stokes
    nbit: int = 8      # input bits per sample (8 or 32)
    real_input: bool = True  # Nyquist (real) vs analytic (complex) input

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

    def block_ndat(self, npart: int) -> int:
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
                        npol_out: int = 1, nbit: int = 8) -> Optional["MegaPlan"]:
        """Build from an ops.filterbank.FilterbankPlan; None if ineligible."""
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
        plan = cls(nsub=nsub, freq_res=freq_res, R1=r1,
                   nfilt_pos=fb_plan.nfilt_pos, nfilt_neg=nfilt_neg,
                   nbin=nbin, npol=npol, npol_out=npol_out, nbit=nbit,
                   real_input=fb_plan.real_input)
        if plan.nkeep <= 0:
            return None
        plan.validate()
        return plan


class MegaConstants:
    """Precomputed matrices (host float64 -> requested dtype)."""

    def __init__(self, plan: MegaPlan, response_natural: Optional[np.ndarray],
                 dtype=np.float32, unpack_scale: float = 1.0,
                 unpack_offset: float = 0.0):
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

        # chirp in [k1, k2] layout (flat bin k = k2*R1 + k1).  For complex
        # input the data FFT is NOT fftshifted in-kernel; the shift is folded
        # in here: natural-order bin j lives at FFT bin (j + N/2) mod N.
        if response_natural is not None:
            flat = np.asarray(response_natural).reshape(N).astype(np.complex128)
        else:
            flat = np.ones(N, np.complex128)
        if not p.real_input:
            flat = np.roll(flat, -(N // 2))
        G = flat.reshape(R2, R1).T  # [k1, k2]
        self.gr, self.gi = c(G.real.copy()), c(G.imag.copy())

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

    def as_jax(self):
        names = ("w1r", "w1i", "tr", "ti", "er", "ei", "gr", "gi",
                 "mr", "mi", "ur", "ui", "vr", "vi", "sel")
        return {n: jnp.asarray(getattr(self, n)) for n in names}


def unpack_affine(nbit: int, twos_complement: bool = False) -> Tuple[float, float]:
    """(scale, offset) such that value = code * scale + offset reproduces
    ``unpack.unpackers._uniform_levels`` for offset-binary codes."""
    from ..unpack.bittable import BitTable, CodeType

    if nbit == 32:
        return 1.0, 0.0
    if twos_complement:
        raise NotImplementedError("megakernel fast path: offset-binary only")
    n = 1 << nbit
    table = BitTable(nbit, CodeType.OFFSET_BINARY)
    asc = np.sort(table.values.astype(np.float64))
    step = float((asc[-1] - asc[0]) / (n - 1)) if n > 1 else 2.0
    return step, float(asc[0])


# --------------------------------------------------------------------------
# numpy reference (slow, float64) — ground truth for the kernel tests
# --------------------------------------------------------------------------

def mega_reference(raw: np.ndarray, plan: MegaPlan, cst: MegaConstants,
                   phi0: np.ndarray, dphi: np.ndarray, npart: int):
    """Straight-line float64 implementation of the fused step.

    raw: uint8[block_ndat * npol] interleaved TFP bytes (or float32 when
    plan.nbit == 32).  Returns (profiles [nsub, npol_out, nbin], hits [nbin]).
    """
    p = plan
    R1, R2, q, nsub = p.R1, p.R2, p.q, p.nsub
    # unpack + deinterleave
    x = raw.astype(np.float64) * cst.unpack_scale + cst.unpack_offset
    if p.real_input:
        x = x.reshape(-1, p.npol).T  # [npol, ndat]
    else:
        t = x.reshape(-1, p.npol, 2)  # (t, pol, dim)
        x = (t[:, :, 0] + 1j * t[:, :, 1]).T  # [npol, ndat] complex
    W1 = cst.w1r.astype(np.float64) + 1j * cst.w1i.astype(np.float64)
    T = cst.tr.astype(np.float64) + 1j * cst.ti.astype(np.float64)
    E = cst.er.astype(np.float64) + 1j * cst.ei.astype(np.float64)
    G = cst.gr.astype(np.float64) + 1j * cst.gi.astype(np.float64)
    Mb = cst.mr.astype(np.float64) + 1j * cst.mi.astype(np.float64)
    U = cst.ur.astype(np.float64) + 1j * cst.ui.astype(np.float64)
    V = cst.vr.astype(np.float64) + 1j * cst.vi.astype(np.float64)

    profiles = np.zeros((nsub, p.npol_out, p.nbin))
    hits = np.zeros(p.nbin)
    for w in range(npart):
        Fpols = []
        for pol in range(p.npol):
            win = x[pol, w * p.nsamp_step: w * p.nsamp_step + p.nsamp_fft]
            Wm = win.reshape(R1, -1)  # [n1, m] (m = 2*R2 real, R2 complex)
            S = np.einsum("nm,nk->mk", Wm, W1)         # [mult*R2, R1]
            C = S * T                                   # twiddle
            X = np.einsum("mk,mj->kj", C, E)            # [R1, R2]
            Y = X * G                                   # chirp
            E1 = Y @ Mb                                 # [R1, R2]
            C2 = E1 * U
            F = np.einsum("kr,kc->rc", C2, V)           # [R2, R1]
            Fpols.append(F)
        # detection in permuted layout
        if p.npol_out == 1:
            planes = [sum(np.abs(F) ** 2 for F in Fpols)]
        elif p.npol_out == 2:
            planes = [np.abs(Fpols[0]) ** 2, np.abs(Fpols[1]) ** 2]
        else:  # Stokes I,Q,U,V with U+iV = 2 p* q (stokes_detect.ic:38-43)
            pp = np.abs(Fpols[0]) ** 2
            qq = np.abs(Fpols[1]) ** 2
            cross = np.conj(Fpols[0]) * Fpols[1]
            planes = [pp + qq, pp - qq, 2 * cross.real, 2 * cross.imag]
        # fold
        for j1 in range(q):
            k2p = np.arange(R1)
            t = k2p * q + j1
            # f32 phase arithmetic, mirroring the device kernel exactly
            phi = (np.float32(phi0[w])
                   + np.float32(dphi[w]) * (t - p.nfilt_pos).astype(np.float32))
            frac = (phi - np.floor(phi)).astype(np.float32)
            b = np.minimum((frac * np.float32(p.nbin)).astype(np.int64),
                           p.nbin - 1)
            keep = (t >= p.nfilt_pos) & (t < p.nfilt_pos + p.nkeep)
            onehot = np.zeros((R1, p.nbin))
            onehot[np.arange(R1)[keep], b[keep]] = 1.0
            for ip, P in enumerate(planes):
                rows = P[np.arange(nsub) * q + j1, :]  # [nsub, R1]
                profiles[:, ip, :] += rows @ onehot
            hits += onehot.sum(axis=0)
    return profiles, hits


# --------------------------------------------------------------------------
# the Pallas kernel
# --------------------------------------------------------------------------

def build_megastep(plan: MegaPlan, cst: MegaConstants, npart: int,
                   interpret: Optional[bool] = None):
    """Returns a jittable fn(profiles, hits, raw, phi0, dphi) -> (profiles,
    hits) where profiles is [npol_out, nsub, nbin] f32 and hits [1, nbin].

    raw: uint8[block_ndat * npol] (TFP interleaved) or float32 of the same
    logical shape when plan.nbit == 32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = plan
    p.validate()
    R1, R2, q, nsub = p.R1, p.R2, p.q, p.nsub
    nbin, npol, npol_out = p.nbin, p.npol, p.npol_out
    totrows = p.total_rows(npart)
    consts = cst.as_jax()
    scale, offset = cst.unpack_scale, cst.unpack_offset
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

    def kernel(phi0_ref, dphi_ref, x_ref,
               w1r, w1i, tr, ti, er, ei, gr, gi, mr, mi, ur, ui, vr, vi, sel,
               prof_in, hits_in, prof_out, hits_out,
               win, dma_sem, pacc, xacc, prof_acc, hits_acc):
        w = pl.program_id(0)

        @pl.when(w == 0)
        def _init():
            prof_acc[...] = jnp.zeros_like(prof_acc)
            hits_acc[...] = jnp.zeros_like(hits_acc)

        def unpack_win(v):
            v = v.astype(f32)
            if p.nbit == 8:
                # window arrives as int8 (Mosaic has no u8->f32 cast);
                # undo the two's-complement wrap to recover the byte value
                v = v + jnp.where(v < 0, f32(256), f32(0))
                v = v * f32(scale) + f32(offset)
            return v

        row0 = w * p.step_rows
        for pol in range(npol):
            if p.real_input:
                copy = pltpu.make_async_copy(
                    x_ref.at[pol, 0, pl.ds(row0, R1), :], win, dma_sem)
                copy.start()
                copy.wait()
                wm = unpack_win(win[...])
                # real-input stage 1: real x complex DFT (2 matmuls)
                sr = dot00(wm, w1r[...])
                si = dot00(wm, w1i[...])
            else:
                copy = pltpu.make_async_copy(
                    x_ref.at[pol, 0, pl.ds(row0, R1), :], win, dma_sem)
                copy.start()
                copy.wait()
                ar = unpack_win(win[...])
                copy = pltpu.make_async_copy(
                    x_ref.at[pol, 1, pl.ds(row0, R1), :], win, dma_sem)
                copy.start()
                copy.wait()
                ai = unpack_win(win[...])
                # complex-input stage 1 (4 matmuls)
                sr = dot00(ar, w1r[...]) - dot00(ai, w1i[...])
                si = dot00(ar, w1i[...]) + dot00(ai, w1r[...])
            cr = sr * tr[...] - si * ti[...]
            ci = sr * ti[...] + si * tr[...]
            xr = dot00(cr, er[...]) - dot00(ci, ei[...])
            xi = dot00(cr, ei[...]) + dot00(ci, er[...])
            yr = xr * gr[...] - xi * gi[...]
            yi = xr * gi[...] + xi * gr[...]
            e1r = mm(yr, mr[...]) - mm(yi, mi[...])
            e1i = mm(yr, mi[...]) + mm(yi, mr[...])
            c2r = e1r * ur[...] - e1i * ui[...]
            c2i = e1r * ui[...] + e1i * ur[...]
            fr = dot00(c2r, vr[...]) - dot00(c2i, vi[...])
            fi = dot00(c2r, vi[...]) + dot00(c2i, vr[...])
            if npol_out == 1:
                pw = fr * fr + fi * fi
                if pol == 0:
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
            # U + iV = 2 p* q (stokes_detect.ic:38-43)
            pp = xacc[0] * xacc[0] + xacc[1] * xacc[1]
            qq = xacc[2] * xacc[2] + xacc[3] * xacc[3]
            re = xacc[0] * xacc[2] + xacc[1] * xacc[3]
            im = xacc[0] * xacc[3] - xacc[1] * xacc[2]
            planes = [pp + qq, pp - qq, 2 * re, 2 * im]

        phi0 = phi0_ref[w, 0]
        dphi = dphi_ref[w, 0]
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
            onehot = jnp.where(jnp.logical_and(b == bin_ids, keep),
                               f32(1), f32(0))
            for ip, plane in enumerate(planes):
                rows = mm(sel[j1], plane)
                prof_acc[ip, :, :] = prof_acc[ip, :, :] + mm(rows, onehot)
            hits_acc[0:1, :] = hits_acc[0:1, :] + jnp.sum(
                onehot, axis=0, keepdims=True)

        @pl.when(w == npart - 1)
        def _fin():
            prof_out[...] = prof_in[...] + prof_acc[...]
            hits_out[...] = hits_in[...] + hits_acc[...]

    in_dtype = jnp.int8 if p.nbit == 8 else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(npart,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # phi0 [npart, 1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dphi [npart, 1]
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # x rows
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(15)],
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prof_in
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hits_in
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((R1, p.row_len), in_dtype),    # window plane
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((R2, R1), jnp.float32),        # pacc
            pltpu.VMEM((2 * p.npol if npol_out > 1 else 1, R2, R1),
                       jnp.float32),                  # voltage planes
            pltpu.VMEM((npol_out, nsub, nbin), jnp.float32),
            pltpu.VMEM((1, nbin), jnp.float32),
        ],
    )

    const_order = ("w1r", "w1i", "tr", "ti", "er", "ei", "gr", "gi",
                   "mr", "mi", "ur", "ui", "vr", "vi", "sel")
    const_vals = [consts[n] for n in const_order]

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((npol_out, nsub, nbin), jnp.float32),
            jax.ShapeDtypeStruct((1, nbin), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ) if not interpret else None,
    )

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(profiles, hits, raw, phi0, dphi):
        """profiles [npol_out, nsub, nbin], hits [1, nbin], raw uint8/f32
        flat TFP bytes, phi0/dphi [npart]."""
        if raw.dtype == jnp.uint8:
            raw = jax.lax.bitcast_convert_type(raw, jnp.int8)
        if p.real_input:
            x = raw.reshape(-1, npol).T.reshape(npol, 1, totrows, p.row_len)
        else:
            # TFP (t, pol, dim) -> [npol, dim, rows, R2]
            x = jnp.transpose(raw.reshape(-1, npol, 2), (1, 2, 0))
            x = x.reshape(npol, 2, totrows, R2)
        out = call(phi0.reshape(npart, 1), dphi.reshape(npart, 1), x,
                   *const_vals, profiles, hits)
        return out[0], out[1]

    return step


# --------------------------------------------------------------------------
# search-mode variant: fused unpack -> filterbank(+chirp) -> detect
# --------------------------------------------------------------------------

def build_megafil(plan: MegaPlan, cst: MegaConstants, npart: int,
                  interpret: Optional[bool] = None):
    """Fused search-mode front end (digifil's hot path): one ``pallas_call``
    per block computing detected intensity per window in the kernel's
    permuted layout, plus the (cheap, XLA) de-permutation back to time
    order.

    Returns a jittable ``fn(raw) -> float32[nsub, 1, npart*nkeep]`` of
    detected, time-ordered filterbank samples (``plan.npol_out`` must be 1;
    polarized search products stay on the XLA path).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = plan
    p.validate()
    if p.npol_out != 1:
        raise ValueError("megafil: intensity detection only")
    R1, R2, q, nsub = p.R1, p.R2, p.q, p.nsub
    npol = p.npol
    totrows = p.total_rows(npart)
    consts = cst.as_jax()
    scale, offset = cst.unpack_scale, cst.unpack_offset
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

    def kernel(x_ref,
               w1r, w1i, tr, ti, er, ei, gr, gi, mr, mi, ur, ui, vr, vi, sel,
               out_ref, win, dma_sem):
        w = pl.program_id(0)

        def unpack_win(v):
            v = v.astype(f32)
            if p.nbit == 8:
                v = v + jnp.where(v < 0, f32(256), f32(0))
                v = v * f32(scale) + f32(offset)
            return v

        row0 = w * p.step_rows
        for pol in range(npol):
            if p.real_input:
                copy = pltpu.make_async_copy(
                    x_ref.at[pol, 0, pl.ds(row0, R1), :], win, dma_sem)
                copy.start()
                copy.wait()
                wm = unpack_win(win[...])
                sr = dot00(wm, w1r[...])
                si = dot00(wm, w1i[...])
            else:
                copy = pltpu.make_async_copy(
                    x_ref.at[pol, 0, pl.ds(row0, R1), :], win, dma_sem)
                copy.start()
                copy.wait()
                ar = unpack_win(win[...])
                copy = pltpu.make_async_copy(
                    x_ref.at[pol, 1, pl.ds(row0, R1), :], win, dma_sem)
                copy.start()
                copy.wait()
                ai = unpack_win(win[...])
                sr = dot00(ar, w1r[...]) - dot00(ai, w1i[...])
                si = dot00(ar, w1i[...]) + dot00(ai, w1r[...])
            cr = sr * tr[...] - si * ti[...]
            ci = sr * ti[...] + si * tr[...]
            xr = dot00(cr, er[...]) - dot00(ci, ei[...])
            xi = dot00(cr, ei[...]) + dot00(ci, er[...])
            yr = xr * gr[...] - xi * gi[...]
            yi = xr * gi[...] + xi * gr[...]
            e1r = mm(yr, mr[...]) - mm(yi, mi[...])
            e1i = mm(yr, mi[...]) + mm(yi, mr[...])
            c2r = e1r * ur[...] - e1i * ui[...]
            c2i = e1r * ui[...] + e1i * ur[...]
            fr = dot00(c2r, vr[...]) - dot00(c2i, vi[...])
            fi = dot00(c2r, vi[...]) + dot00(c2i, vr[...])
            pw = fr * fr + fi * fi
            if pol == 0:
                out_ref[0, :, :] = pw
            else:
                out_ref[0, :, :] = out_ref[0, :, :] + pw

    in_dtype = jnp.int8 if p.nbit == 8 else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(npart,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # x rows
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(15)],
        ],
        out_specs=pl.BlockSpec((1, R2, R1), lambda w: (w, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R1, p.row_len), in_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    const_order = ("w1r", "w1i", "tr", "ti", "er", "ei", "gr", "gi",
                   "mr", "mi", "ur", "ui", "vr", "vi", "sel")
    const_vals = [consts[n] for n in const_order]

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npart, R2, R1), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ) if not interpret else None,
    )

    @jax.jit
    def step(raw):
        """raw uint8/f32 flat TFP bytes -> [nsub, 1, npart*nkeep]."""
        if raw.dtype == jnp.uint8:
            raw = jax.lax.bitcast_convert_type(raw, jnp.int8)
        if p.real_input:
            x = raw.reshape(-1, npol).T.reshape(npol, 1, totrows, p.row_len)
        else:
            x = jnp.transpose(raw.reshape(-1, npol, 2), (1, 2, 0))
            x = x.reshape(npol, 2, totrows, R2)
        P = call(x, *const_vals)  # [npart, R2, R1]
        # de-permute: row s*q + j1, col k2' -> time t = k2'*q + j1
        P = P.reshape(npart, nsub, q, R1)
        P = jnp.transpose(P, (1, 0, 3, 2))  # [nsub, npart, R1(k2'), q(j1)]
        P = P.reshape(nsub, npart, p.freq_res)
        P = P[:, :, p.nfilt_pos : p.nfilt_pos + p.nkeep]
        return P.reshape(nsub, 1, npart * p.nkeep)

    return step
