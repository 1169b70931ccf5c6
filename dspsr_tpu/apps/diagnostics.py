"""Diagnostic CLIs: dmsmear, digihdr, digistat.

Equivalents of the reference diagnostic applications
(``Signal/General/dmsmear.C``, ``Kernel/Applications/digihdr.C``,
``Signal/General/digistat.C``).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def dmsmear(argv=None) -> int:
    """Print dispersion smearing and FFT sizing for a DM/band
    (reference ``dmsmear -d DM -f MHz -b MHz -n nchan``)."""
    p = argparse.ArgumentParser(prog="dmsmear-tpu")
    p.add_argument("-d", "--dm", type=float, required=True)
    p.add_argument("-f", "--freq", type=float, default=1400.0, help="MHz")
    p.add_argument("-b", "--bw", type=float, default=400.0, help="MHz")
    p.add_argument("-n", "--nchan", type=int, default=1)
    args = p.parse_args(argv)

    from ..ops.dedispersion import (
        smearing_time, delay_time, Dedispersion)
    from ..ops.response import choose_nfft

    cf, bw, nchan, dm = args.freq, args.bw, args.nchan, args.dm
    total = smearing_time(dm, cf, bw)
    ch_bw = abs(bw) / nchan
    lowest = cf - (abs(bw) - ch_bw) / 2.0
    worst = smearing_time(dm, lowest, ch_bw)
    nfp = Dedispersion._half_smearing_samples(dm, cf, bw, nchan, +1, 0.1)
    nfn = Dedispersion._half_smearing_samples(dm, cf, bw, nchan, -1, 0.1)
    nfft = choose_nfft(nfp + nfn)
    print(f"DM = {dm} pc cm^-3")
    print(f"Band: {cf} MHz, BW {bw} MHz, {nchan} channel(s)")
    print(f"Total dispersion delay across band: {total*1e3:.6f} ms")
    print(f"Smearing in worst channel: {worst*1e3:.6f} ms")
    print(f"Overlap samples (impulse_pos/neg): {nfp} / {nfn}")
    print(f"Suggested FFT length per channel: {nfft} "
          f"(efficiency {(nfft-nfp-nfn)/nfft*100:.1f}%)")
    return 0


def digihdr(argv=None) -> int:
    """Dump the parsed header/Observation of a data file
    (reference ``digihdr``)."""
    p = argparse.ArgumentParser(prog="digihdr-tpu")
    p.add_argument("file")
    args = p.parse_args(argv)

    from ..io.sources import open_source

    src = open_source(args.file)
    o = src.obs
    rows = [
        ("FORMAT", type(src).__name__),
        ("SOURCE", o.source),
        ("TELESCOPE", o.telescope),
        ("INSTRUMENT", o.instrument),
        ("MODE", o.mode),
        ("FREQ (MHz)", o.centre_frequency),
        ("BW (MHz)", o.bandwidth),
        ("NCHAN", o.nchan),
        ("NPOL", o.npol),
        ("NDIM", o.ndim),
        ("NBIT", o.nbit),
        ("STATE", o.state.value),
        ("RATE (Hz)", o.rate),
        ("TSAMP (us)", 1e6 / o.rate if o.rate else 0),
        ("START MJD", str(o.start_time)),
        ("NDAT", src.total_samples),
        ("LENGTH (s)", src.total_samples / o.rate if o.rate else 0),
    ]
    for k, v in rows:
        print(f"{k:12s} {v}")
    return 0


def digistat(argv=None) -> int:
    """Sample statistics and digitizer histogram of a stretch of data
    (reference ``digistat``)."""
    p = argparse.ArgumentParser(prog="digistat-tpu")
    p.add_argument("file")
    p.add_argument("-n", "--nsamp", type=int, default=1 << 20)
    p.add_argument("-S", "--skip", type=int, default=0, help="samples to skip")
    args = p.parse_args(argv)

    from ..utils.platform import configure_from_env
    configure_from_env()
    from ..io.sources import open_source
    from ..unpack.unpackers import UnpackPlan, digitizer_histogram
    import jax.numpy as jnp

    src = open_source(args.file)
    o = src.obs
    n = min(args.nsamp, src.total_samples - args.skip)
    raw = src.read_samples(args.skip, n)
    plan = UnpackPlan(o)
    x, w = plan.unpack(jnp.asarray(raw))
    if isinstance(x, tuple):
        data = np.stack([np.asarray(x[0]), np.asarray(x[1])], axis=-1)
    else:
        data = np.asarray(x)[..., None]
    print(f"{n} samples from {args.file}")
    for c in range(o.nchan):
        for pol in range(o.npol):
            d = data[c, pol].ravel()
            print(f"chan {c} pol {pol}: mean {d.mean():+.4f} "
                  f"rms {d.std():.4f} min {d.min():+.3f} max {d.max():+.3f}")
    if o.nbit <= 8:
        hist = np.asarray(digitizer_histogram(jnp.asarray(raw), o.nbit))
        print(f"digitizer histogram ({1 << o.nbit} states):")
        total = hist.sum()
        for i, h in enumerate(hist):
            bar = "#" * int(60 * h / max(hist.max(), 1))
            print(f"  {i:3d} {h:10d} {100*h/total:5.2f}% {bar}")
    if w is not None:
        w = np.asarray(w)
        print(f"excision: {100*(1-w.mean()):.3f}% of weights zapped")
    return 0


def digihist(argv=None) -> int:
    """Digitizer state histogram per channel/pol (reference ``digihist``;
    2-bit histograms used for the TwoBitStats archive extension)."""
    p = argparse.ArgumentParser(prog="digihist-tpu")
    p.add_argument("file")
    p.add_argument("-n", "--nsamp", type=int, default=1 << 20)
    args = p.parse_args(argv)

    from ..utils.platform import configure_from_env
    configure_from_env()
    import jax.numpy as jnp
    from ..io.sources import open_source
    from ..unpack.unpackers import bytes_to_codes

    src = open_source(args.file)
    o = src.obs
    n = min(args.nsamp, src.total_samples)
    raw = src.read_samples(0, n)
    codes = np.asarray(bytes_to_codes(jnp.asarray(raw), o.nbit))
    ndig = o.nchan * o.npol * o.ndim
    codes = codes.reshape(-1, ndig)
    nstates = 1 << o.nbit
    for d in range(ndig):
        hist = np.bincount(codes[:, d], minlength=nstates)
        chan = d // (o.npol * o.ndim)
        pol = (d // o.ndim) % o.npol
        dim = d % o.ndim
        print(f"digitizer chan={chan} pol={pol} dim={dim}: "
              + " ".join(str(int(h)) for h in hist))
    return 0


def digitxt(argv=None) -> int:
    """Dump unpacked samples as text (reference ``digitxt``)."""
    p = argparse.ArgumentParser(prog="digitxt-tpu")
    p.add_argument("file")
    p.add_argument("-n", "--nsamp", type=int, default=32)
    p.add_argument("-S", "--skip", type=int, default=0)
    args = p.parse_args(argv)

    from ..utils.platform import configure_from_env
    configure_from_env()
    import jax.numpy as jnp
    from ..io.sources import open_source
    from ..unpack.unpackers import UnpackPlan

    src = open_source(args.file)
    o = src.obs
    raw = src.read_samples(args.skip, args.nsamp)
    x, _ = UnpackPlan(o).unpack(jnp.asarray(raw))
    if isinstance(x, tuple):
        re, im = np.asarray(x[0]), np.asarray(x[1])
        for t in range(re.shape[-1]):
            vals = " ".join(
                f"{re[c, pl, t]:+.4f}{im[c, pl, t]:+.4f}j"
                for c in range(o.nchan) for pl in range(o.npol))
            print(f"{args.skip + t:10d} {vals}")
    else:
        d = np.asarray(x)
        for t in range(d.shape[-1]):
            vals = " ".join(f"{d[c, pl, t]:+.4f}"
                            for c in range(o.nchan) for pl in range(o.npol))
            print(f"{args.skip + t:10d} {vals}")
    return 0


def passband(argv=None) -> int:
    """Bandpass estimate of undetected data (reference ``passband``;
    Signal/General/Bandpass.C role).  Prints nchan x npol mean power."""
    p = argparse.ArgumentParser(prog="passband-tpu")
    p.add_argument("file")
    p.add_argument("-F", "--nchan", type=int, default=256)
    p.add_argument("-n", "--nsamp", type=int, default=1 << 20)
    args = p.parse_args(argv)

    from ..utils.platform import configure_from_env
    configure_from_env()
    import jax.numpy as jnp
    from ..io.sources import open_source
    from ..unpack.unpackers import UnpackPlan
    from ..ops.filterbank import FilterbankPlan, filterbank_block
    from ..ops.detection import detect_ppqq

    src = open_source(args.file)
    o = src.obs
    real = o.state.value == "Nyquist"
    plan = FilterbankPlan(real_input=real,
                          nchan_subband=max(args.nchan // o.nchan, 1),
                          freq_res=1)
    n = min(args.nsamp, src.total_samples)
    npart = plan.npart(n)
    raw = src.read_samples(0, plan.block_ndat(npart))
    x, _ = UnpackPlan(o).unpack(jnp.asarray(raw))
    y = filterbank_block(x, plan, npart)
    bp = np.asarray(detect_ppqq(y)).mean(axis=-1)  # [nchan, npol]
    nchan_out = bp.shape[0]
    for c in range(nchan_out):
        f = o.centre_frequency - 0.5 * o.bandwidth + (c + 0.5) * o.bandwidth / nchan_out
        print(f"{f:12.4f} " + " ".join(f"{v:.6e}" for v in bp[c]))
    return 0


def main(argv=None) -> int:
    """Dispatcher: python -m dspsr_tpu.apps.diagnostics <tool> [args]."""
    tools = {"dmsmear": dmsmear, "digihdr": digihdr, "digistat": digistat,
             "digihist": digihist, "digitxt": digitxt, "passband": passband}
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in tools:
        print(f"usage: diagnostics {{{','.join(tools)}}} [options]",
              file=sys.stderr)
        return 2
    return tools[argv[0]](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
