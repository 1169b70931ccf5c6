"""digifil-tpu: search-mode filterbank CLI.

Equivalent of the reference ``digifil`` (``Signal/General/digifil.C``):
baseband -> detected n-bit SIGPROC filterbank.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="digifil-tpu",
        description="Convert baseband to a SIGPROC filterbank file "
        "(TPU-native digifil equivalent)",
    )
    p.add_argument("files", nargs="+")
    p.add_argument("-o", "--output", required=True, help="output .fil file")
    p.add_argument("-F", "--nchan", type=int, default=128,
                   help="filterbank channels")
    p.add_argument("-x", "--freq-res", type=int, default=None)
    p.add_argument("-D", "--dm", type=float, default=0.0,
                   help="coherently dedisperse while channelizing")
    p.add_argument("-t", "--tscrunch", type=int, default=1,
                   help="time decimation factor")
    p.add_argument("-f", "--fscrunch", type=int, default=1,
                   help="frequency decimation factor")
    p.add_argument("-d", "--npol", type=int, default=1, choices=[1, 2, 4])
    p.add_argument("-b", "--nbits", type=int, default=8,
                   choices=[1, 2, 4, 8, 32], help="output bits per sample")
    p.add_argument("-c", "--constant-levels", action="store_true",
                   help="freeze offset/scale after first block (digifil -c)")
    p.add_argument("-T", "--total", type=float, default=None)
    p.add_argument("--block-parts", type=int, default=4)
    p.add_argument("-q", "--quiet", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..utils.platform import configure_from_env
    configure_from_env()
    from ..models.load_to_fil import FilConfig, FilPipeline
    from ..io.sources import open_source, MultiFile

    cfg = FilConfig(
        nchan=args.nchan,
        frequency_resolution=args.freq_res,
        dispersion_measure=args.dm,
        tscrunch_factor=args.tscrunch,
        fscrunch_factor=args.fscrunch,
        npol_out=args.npol,
        nbits=args.nbits,
        rescale_constant=args.constant_levels,
        block_parts=args.block_parts,
    )
    src = (open_source(args.files[0]) if len(args.files) == 1
           else MultiFile(args.files))
    pipe = FilPipeline(src, cfg)
    if not args.quiet:
        o = pipe.obs_out
        print(f"digifil-tpu: -> {args.output} nchan {o.nchan} npol {o.npol} "
              f"nbit {o.nbit} tsamp {1e6/o.rate:.3f} us", file=sys.stderr)
    pipe.run(args.output, total_seconds=args.total)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
