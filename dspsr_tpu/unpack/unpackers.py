"""Device-side n-bit unpacking kernels.

Equivalent of the reference Unpacker hierarchy
(``Kernel/Classes/dsp/Unpacker.h``, ``BitUnpacker.C``, ``EightBitUnpacker.C``,
``FloatUnpacker.C``, ``TwoBitCorrection.C``): convert packed telescope bytes
into float32 voltages on device.  Where the reference unpacks on the CPU with
per-byte lookup tables (or ``GenericEightBitUnpackerCUDA.cu`` on GPU), here
the byte stream is shipped to the TPU raw (minimum PCIe/ICI bytes — e.g. 4x
fewer than shipping float32 for 8-bit data) and expanded with vectorized
shifts + table gathers inside the same jit program as the DSP chain, so XLA
fuses unpacking into the pipeline's first stage.

Layout: input is the raw byte stream of one block in **TFP order** (the DADA
convention: time-major, then chan, pol, dim — ``ASCIIObservation.C``); output
is FPT ``[nchan, npol, ndat]`` float32 (real) or complex64 (ndim=2), matching
the reference's ``TimeSeries::OrderFPT`` (``TimeSeries.h:29-37``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..observation import Observation, Signal
from .bittable import BitTable, CodeType
from .twobit import TwoBitCorrection


@partial(jax.jit, static_argnames=("nbit", "msb_first"))
def bytes_to_codes(raw: jnp.ndarray, nbit: int, msb_first: bool = True) -> jnp.ndarray:
    """Expand packed bytes into per-sample integer codes.

    raw: uint8[nbytes] -> int32[nbytes * 8/nbit].
    msb_first: extract the most significant field first (reference
    ``BitTable::extract`` order MostToLeast, ``BitTable.C:152-163``).
    """
    if nbit == 8:
        return raw.astype(jnp.int32)
    per = 8 // nbit
    mask = (1 << nbit) - 1
    shifts = np.arange(per) * nbit
    if msb_first:
        shifts = shifts[::-1]
    shifts = jnp.asarray(shifts.copy(), dtype=jnp.int32)
    codes = (raw[:, None].astype(jnp.int32) >> shifts[None, :]) & mask
    return codes.reshape(-1)


@partial(jax.jit, static_argnames=("nchan", "npol", "ndim"))
def tfp_to_fpt(samples: jnp.ndarray, nchan: int, npol: int, ndim: int):
    """Reorder flat TFP samples to FPT [nchan, npol, ndat] (complex if ndim=2).

    samples: float32[ndat*nchan*npol*ndim] in (t, chan, pol, dim) order.
    """
    ndat = samples.shape[0] // (nchan * npol * ndim)
    x = samples.reshape(ndat, nchan, npol, ndim)
    x = jnp.transpose(x, (1, 2, 0, 3))  # [nchan, npol, ndat, ndim]
    if ndim == 2:
        return jax.lax.complex(x[..., 0], x[..., 1])
    return x[..., 0]


@partial(jax.jit, static_argnames=("nbit", "nchan", "npol", "ndim", "msb_first"))
def unpack_fixed(
    raw: jnp.ndarray,
    table: jnp.ndarray,
    nbit: int,
    nchan: int,
    npol: int,
    ndim: int,
    msb_first: bool = True,
):
    """Fixed-level table unpack (reference ``BitUnpacker::unpack``).

    raw: uint8[nbytes]; table: float32[2^nbit] level lookup.
    Returns FPT float32/complex64.
    """
    codes = bytes_to_codes(raw, nbit, msb_first)
    vals = table[codes]
    return tfp_to_fpt(vals, nchan, npol, ndim)


@partial(jax.jit, static_argnames=("nchan", "npol", "ndim"))
def unpack_float32(raw: jnp.ndarray, nchan: int = 1, npol: int = 1, ndim: int = 1):
    """FloatUnpacker equivalent (re-ingest of dumped float TimeSeries)."""
    vals = jax.lax.bitcast_convert_type(raw.reshape(-1, 4), jnp.float32).reshape(-1)
    return tfp_to_fpt(vals, nchan, npol, ndim)


@partial(
    jax.jit,
    static_argnames=("nchan", "npol", "ndim", "ndat_per_weight", "msb_first"),
)
def unpack_twobit_dynamic(
    raw: jnp.ndarray,
    lo_table: jnp.ndarray,
    hi_table: jnp.ndarray,
    weight_table: jnp.ndarray,
    nchan: int,
    npol: int,
    ndim: int,
    ndat_per_weight: int,
    msb_first: bool = True,
):
    """Jenet-Anderson dynamic-level 2-bit unpack with excision weights.

    Equivalent of ``TwoBitCorrection::dig_unpack`` + ``ExcisionUnpacker``
    (``Kernel/Classes/TwoBitCorrection.C``, ``excision_unpack.h``): per
    digitizer stream (chan,pol,dim) and per block of ``ndat_per_weight``
    samples, count the low-voltage states, gather the JA98 output levels for
    that count, and flag blocks with anomalous counts.

    Codes (offset binary, 2-bit): 0,3 = outer (hi) negative/positive;
    1,2 = inner (lo) negative/positive (reference ``TwoBitTable``).

    Returns (x_fpt, weights[nchan, nweights]) where weights apply to
    ``ndat_per_weight``-sample stretches of *every* pol of that channel
    (reference WeightedTimeSeries semantics).
    """
    codes = bytes_to_codes(raw, 2, msb_first)
    ndig = nchan * npol * ndim
    ndat = codes.shape[0] // ndig
    # (t, dig) -> (dig, t): dig index = ((chan*npol)+pol)*ndim+dim
    c = codes.reshape(ndat, ndig).T  # [ndig, ndat]

    sign = jnp.where(c >= 2, 1.0, -1.0).astype(jnp.float32)
    is_low = jnp.logical_or(c == 1, c == 2)

    nweights = ndat // ndat_per_weight
    cb = is_low[:, : nweights * ndat_per_weight].reshape(ndig, nweights, ndat_per_weight)
    nlow = jnp.sum(cb, axis=-1).astype(jnp.int32)  # [ndig, nweights]

    lo = lo_table[nlow]  # [ndig, nweights]
    hi = hi_table[nlow]
    w_dig = weight_table[nlow]

    mag_lo = jnp.repeat(lo, ndat_per_weight, axis=1)
    mag_hi = jnp.repeat(hi, ndat_per_weight, axis=1)
    islow_f = is_low[:, : nweights * ndat_per_weight]
    vals = sign[:, : nweights * ndat_per_weight] * jnp.where(islow_f, mag_lo, mag_hi)

    # [ndig, T] -> FPT
    x = vals.reshape(nchan, npol, ndim, nweights * ndat_per_weight)
    if ndim == 2:
        xc = jax.lax.complex(x[:, :, 0, :], x[:, :, 1, :])
    else:
        xc = x[:, :, 0, :]

    # combine weights across the digitizers of each channel: a block is bad
    # if any of its digitizers is bad (reference combines via per-chan/pol
    # weights; min == logical AND here)
    w = jnp.min(w_dig.reshape(nchan, npol * ndim, nweights), axis=1)
    return xc, w


@partial(jax.jit, static_argnames=("nbit", "hist_size"))
def digitizer_histogram(raw: jnp.ndarray, nbit: int, hist_size: int = 0) -> jnp.ndarray:
    """Histogram of sample codes (reference ``HistUnpacker``)."""
    codes = bytes_to_codes(raw, nbit)
    n = hist_size or (1 << nbit)
    onehot = (codes[:, None] == jnp.arange(n)[None, :]).astype(jnp.int32)
    return jnp.sum(onehot, axis=0)


@dataclass
class UnpackPlan:
    """Host-side description of how to unpack a stream; builds the tables."""

    obs: Observation
    twos_complement: bool = False
    dynamic_twobit: bool = True
    ndat_per_weight: int = 512
    cutoff_sigma: float = 3.0

    def __post_init__(self):
        nbit = self.obs.nbit
        if nbit in (1, 2, 4, 8):
            self.table = BitTable(
                nbit,
                CodeType.TWOS_COMPLEMENT if self.twos_complement else CodeType.OFFSET_BINARY,
            )
        elif nbit == 32:
            self.table = None
        else:
            raise ValueError(f"unsupported NBIT={nbit}")
        if nbit == 2 and self.dynamic_twobit:
            self.twobit = TwoBitCorrection(self.ndat_per_weight, self.cutoff_sigma)
        else:
            self.twobit = None

    def bytes_per_sample(self) -> float:
        return self.obs.nbytes_per_sample

    def unpack(self, raw: jnp.ndarray):
        """Returns (x_fpt, weights or None)."""
        o = self.obs
        if o.nbit == 32:
            return unpack_float32(raw, o.nchan, o.npol, o.ndim), None
        if self.twobit is not None:
            return unpack_twobit_dynamic(
                raw,
                jnp.asarray(self.twobit.level_tables[0]),
                jnp.asarray(self.twobit.level_tables[1]),
                jnp.asarray(self.twobit.weight_table),
                o.nchan,
                o.npol,
                o.ndim,
                self.ndat_per_weight,
            )
        x = unpack_fixed(
            raw, jnp.asarray(self.table.values), o.nbit, o.nchan, o.npol, o.ndim
        )
        return x, None
