"""Benchmark matrix: fold/search pipeline throughput on one chip.

The headline reproduces the reference's benchmark configuration
(``Benchmark/fold.csh`` + ``Benchmark/fold_header.dada``: 8-bit dual-pol
real-sampled 400 MHz CASPSR baseband of J0437-4715, coherent dedispersion +
fold) as the TPU convolving-filterbank pipeline running the fused Pallas
megakernel (ops.megakernel) — one device program per block.

Beyond the headline, a CONFIGURATION MATRIX measures every execution path
(the reference benchmarks a sweep, ``Benchmark/bench.csh``,
``Signal/General/filterbank_speed.C:189-221``):

- ``mega_real_8bit``      the flagship fused kernel (headline)
- ``mega_analytic_8bit``  complex (VDIF/GUPPI-class) baseband, fused
- ``mega_guppi_2bit``     32-channel 2-bit GUPPI-like data: in-kernel JA98
                          dynamic-level unpack + excision weights, fused
- ``mega_bf16``           the fused kernel with bf16 stage constants
- ``xla_general``         the general XLA op chain on the flagship
                          geometry (forced; the measured fallback floor)
- ``xla_sk_weights``      XLA chain + spectral kurtosis RFI excision
                          (forced; the SK fallback floor)
- ``hybrid_sk``           in-stream SK on the FUSED path (voltage front
                          end + XLA SK/fold tail in one program)
- ``hybrid_rfi``          spectral RFI filter on the fused path (chirp x
                          previous-block zap mask as a traced response)
- ``hybrid_cyclic``       cyclic spectroscopy through the VOLTAGE hybrid
                          front end (lag-product fold tail)
- ``hybrid_conv32``       nsub == 1 coherent dedispersion of a 32-channel
                          band on the fused path (no filterbank)
- ``megafil_search``      the fused search-mode front end (digifil)

Output protocol (round-5 hardening; round 4's driver run timed out with
ZERO output because the old script printed one line only at the very end):
the headline JSON line is printed and flushed IMMEDIATELY after the
headline measurement, then after EVERY matrix entry an updated,
self-contained line (same schema, matrix grown by one) is printed.  Each
line parses on its own, so a wall-clock kill at any point still leaves
the best-so-far result as the last complete line — matching the
reference's per-trial printing (``Benchmark/bench.csh``).  A wall-clock
budget (DSPSR_TPU_BENCH_BUDGET_S, default 1200 s) gates each matrix
entry: entries are measured in priority order and the rest are recorded
as {"skipped": "budget"}.

Schema: {"metric", "value", "unit", "vs_baseline", ..., "matrix":
{tag: {...}}} where value is the MEDIAN over DSPSR_TPU_BENCH_REPS
repetitions of Msamples/s/chip of raw input consumed, and vs_baseline is
the real-time ratio (throughput / 800 Msamp/s, the CASPSR sampling rate)
— the reference's own figure of merit (wall time vs real time,
``fold.csh:33-36``).  Every matrix entry carries per-rep times
(run-to-run spread through the shared tunnel is real; see PERF.md).

Env knobs: DSPSR_TPU_BENCH_REPS (5; matrix entries always use 3),
DSPSR_TPU_BENCH_NBLOCKS (6; matrix entries always use 2),
DSPSR_TPU_BENCH_BLOCK (1<<25), DSPSR_TPU_BENCH_FEED (device|h2d),
DSPSR_TPU_BENCH_MATRIX (1; 0 = headline only),
DSPSR_TPU_BENCH_BUDGET_S (1200).
"""

import dataclasses
import json
import os
import statistics
import sys
import time

import numpy as np


def _make_obs(nchan=1, npol=2, ndim=1, nbit=8, rate=800e6, bw=-400.0):
    from dspsr_tpu.observation import Observation, Signal
    from dspsr_tpu.timing.mjd import MJD

    return Observation(
        nchan=nchan, npol=npol, ndim=ndim, nbit=nbit,
        centre_frequency=1382.0, bandwidth=bw, rate=rate,
        start_time=MJD.from_utc("2010-04-13-02:05:45"),
        state=(Signal.NYQUIST if ndim == 1 else Signal.ANALYTIC),
        source="J0437-4715", telescope="PKS", instrument="DUMMY",
    ).replace(ndat=1 << 40)


def bench_fold(obs, cfg, reps, nblocks, feed="device", env=None):
    """Build a FoldPipeline and measure raw-input Msamples/s/chip.

    ``env``: temporary os.environ overrides during pipeline construction
    (e.g. DSPSR_TPU_NO_MEGA, DSPSR_TPU_MEGA_DTYPE).
    """
    import jax
    import jax.numpy as jnp
    from dspsr_tpu.io.sources import DummySource, device_noise_bytes
    from dspsr_tpu.models.load_to_fold import FoldPipeline
    from dspsr_tpu.ops.fold import compute_anchors

    saved = {}
    env = env or {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    try:
        src = DummySource(obs)
        pipe = FoldPipeline(src, cfg)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    stride = pipe.stride_in_samples
    tsamp_out = 1.0 / pipe.obs_out.rate
    nuse = -(-pipe.out_per_block // pipe.fold_plan.seg_len) \
        * pipe.fold_plan.seg_len
    raw_np = src.read_samples(0, pipe.block_in_samples)
    nbytes = raw_np.size

    if pipe.mega_mode == "full":
        mp = pipe.mega_plan
        profiles = jnp.zeros((obs.nchan, mp.npol_out, mp.nsub, pipe.nbin),
                             jnp.float32)
        hits = jnp.zeros((obs.nchan, pipe.nbin), jnp.float32)
        base_step = pipe._megastep
    else:
        profiles = jnp.zeros((pipe.obs_out.nchan, pipe.obs_out.npol,
                              pipe.nbin), jnp.float32)
        hits = jnp.zeros((pipe.obs_out.nchan, pipe.nbin), jnp.float32)
        base_step = (pipe._megastep if pipe.mega_mode == "hybrid"
                     else pipe._step)

    # Two feed modes (the reference benchmarks read fake data from RAM via
    # DummyFile — loading is outside the measured DSP cost):
    #  - "device" (default): the DummyFile byte stream is generated on
    #    device inside the same jit program — measures the chip's pipeline
    #    rate.
    #  - "h2d": bytes ship through this environment's host->device path
    #    each block (a shared debug tunnel at ~0.1-1 GB/s, NOT a production
    #    data path; see PERF.md).
    # the fused RFI filter threads a (gr, gi) response state through the
    # step (chirp x previous-block zap mask); carried block to block here
    rfi_state = list(pipe._rfi_resp) if getattr(pipe, "_rfi_resp", None) \
        else None

    @jax.jit
    def devgen_step(profiles, hits, start_byte, phi0, dphi, *resp):
        raw = device_noise_bytes(start_byte, nbytes)
        return base_step(profiles, hits, raw, phi0, dphi, *resp)

    def anchors(iblock):
        t0 = pipe.output_start_time(iblock * stride)
        return compute_anchors(pipe.predictor, t0, tsamp_out, nuse,
                               pipe.fold_plan.seg_len)

    def run_block(profiles, hits, b):
        phi0, dphi = anchors(b)
        extra = tuple(rfi_state) if rfi_state is not None else ()
        if feed == "device":
            res = devgen_step(profiles, hits, jnp.uint32(b * nbytes),
                              jnp.asarray(phi0), jnp.asarray(dphi), *extra)
        else:
            res = base_step(profiles, hits, jnp.asarray(raw_np),
                            jnp.asarray(phi0), jnp.asarray(dphi), *extra)
        if rfi_state is not None:
            rfi_state[:] = res[-2:]
            res = res[:-2]
        return res[0], res[1]

    t_c0 = time.perf_counter()
    profiles, hits = run_block(profiles, hits, 0)
    np.asarray(hits[:1, :1])  # hard sync
    compile_s = time.perf_counter() - t_c0

    per_rep = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for b in range(nblocks):
            profiles, hits = run_block(profiles, hits, b)
        np.asarray(hits[:1, :1])
        dt = time.perf_counter() - t0
        per_rep.append(round(nblocks * stride / dt / 1e6, 2))

    out = {
        "msps": statistics.median(per_rep),
        "per_rep_msps": per_rep,
        "compile_s": round(compile_s, 1),
        "engine": {"full": "megakernel", "hybrid": "hybrid"}.get(
            pipe.mega_mode, "xla"),
        "block_samples": stride,
        "block_bytes": int(nbytes),
        "nchan_out": pipe.obs_out.nchan,
        "nbin": pipe.nbin,
    }
    # side measurement for the headline: the tunnel-fed rate (2 blocks)
    if feed == "device" and rfi_state is None:
        phi0, dphi = anchors(0)
        p2 = jnp.zeros_like(profiles)
        h2 = jnp.zeros_like(hits)
        p2, h2 = base_step(p2, h2, jnp.asarray(raw_np),
                           jnp.asarray(phi0), jnp.asarray(dphi))
        np.asarray(h2[:1, :1])
        t0 = time.perf_counter()
        for b in range(2):
            phi0, dphi = anchors(b)
            p2, h2 = base_step(p2, h2, jnp.asarray(raw_np),
                               jnp.asarray(phi0), jnp.asarray(dphi))
        np.asarray(h2[:1, :1])
        out["h2d_fed_msps"] = round(
            2 * stride / (time.perf_counter() - t0) / 1e6, 2)
    return out


def bench_megafil(obs, cfg, reps, nblocks):
    """Search-mode fused front end (digifil hot path) throughput."""
    import jax
    import jax.numpy as jnp
    from dspsr_tpu.io.sources import DummySource, device_noise_bytes
    from dspsr_tpu.models.load_to_fil import FilPipeline

    src = DummySource(obs)
    pipe = FilPipeline(src, cfg)
    if pipe._megafil is None:
        return {"error": "megafil did not engage"}
    stride = pipe.stride_in_samples
    raw_np = src.read_samples(0, pipe.block_in_samples)
    nbytes = raw_np.size

    @jax.jit
    def devgen(start_byte):
        raw = device_noise_bytes(start_byte, nbytes)
        d = pipe._megafil(raw)
        # reduce on device so only a tiny result crosses the tunnel
        return jnp.sum(d[:, :, -1])

    t0 = time.perf_counter()
    np.asarray(devgen(jnp.uint32(0)))
    compile_s = time.perf_counter() - t0
    per_rep = []
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = 0.0
        for b in range(nblocks):
            acc = acc + devgen(jnp.uint32(b * nbytes))
        np.asarray(acc)
        per_rep.append(round(nblocks * stride / (time.perf_counter() - t0) / 1e6, 2))
    return {
        "msps": statistics.median(per_rep),
        "per_rep_msps": per_rep,
        "compile_s": round(compile_s, 1),
        "engine": "megafil",
        "block_samples": stride,
        "nchan_out": pipe.obs_out.nchan,
    }


def sweep():
    """Filterbank-kernel microbenchmark sweep (the reference's second
    benchmark harness: ``Signal/General/filterbank_speed.C:189-221`` +
    ``Benchmark/filterbank_bench.csh`` sweep nchan x nfft and report
    time/transform + MFLOPS).

    Times the fused megafil FRONT END (unpack -> forward matmul-FFT ->
    response -> per-subband inversion, voltage output — the same stages
    the reference's ``Filterbank::operate`` covers) per overlap-save
    window, on complex single-pol input, and prints one JSON line per
    grid point AS IT GOES:
      {"nchan": C, "nfft": N, "us_per_transform": T, "mflops": F, ...}
    MFLOPS uses the reference's formula
    ``5*nfft*nchan*(2*log2(nfft)+log2(nchan))/time_us``
    (``filterbank_speed.C:207-214``) so the numbers compare directly.

    Grid: nchan in {4..1024}, nfft in {1k..256k}, nchan*nfft <= 2^22
    (bounds the per-point compile cost).  DSPSR_TPU_SWEEP_BUDGET_S
    (default 2400) stops the sweep cleanly.
    """
    import math

    import jax
    import jax.numpy as jnp
    from dspsr_tpu.utils.platform import enable_compilation_cache
    from dspsr_tpu.io.sources import device_noise_bytes
    from dspsr_tpu.ops.filterbank import FilterbankPlan
    from dspsr_tpu.ops.megakernel import MegaConstants, MegaPlan, \
        build_megafil

    enable_compilation_cache()
    budget = float(os.environ.get("DSPSR_TPU_SWEEP_BUDGET_S", 2400))
    t0_all = time.monotonic()
    reps = int(os.environ.get("DSPSR_TPU_SWEEP_REPS", 3))

    for nchan in (4, 16, 64, 256, 1024):
        for nfft in (1 << 10, 1 << 12, 1 << 14, 1 << 16, 1 << 18):
            if nchan * nfft > (1 << 22):
                continue
            if time.monotonic() - t0_all > budget:
                print(json.dumps({"nchan": nchan, "nfft": nfft,
                                  "skipped": "budget"}))
                sys.stdout.flush()
                continue
            try:
                fb = FilterbankPlan(real_input=False, nchan_subband=nchan,
                                    freq_res=nfft, nfilt_pos=0, nfilt_neg=0)
                mp = MegaPlan.from_filterbank(
                    fb, nbin=2, npol=1, npol_out=1, nbit=8, nchan_in=1)
                if mp is None or (mp.row_len < 128
                                  and jax.default_backend() != "cpu"):
                    print(json.dumps({"nchan": nchan, "nfft": nfft,
                                      "skipped": "geometry"}))
                    sys.stdout.flush()
                    continue
                cst = MegaConstants(mp, None, unpack_scale=1 / 64.0,
                                    unpack_offset=-2.0)
                # enough windows per dispatch to amortize the ~35 ms
                # per-program cost, bounded in HBM
                npart = max(2, min(64, (1 << 24) // (nchan * nfft)))
                front = build_megafil(mp, cst, npart, output="voltage")
                nbytes = mp.block_ndat(npart) * mp.ndim

                @jax.jit
                def run_block(seed):
                    raw = device_noise_bytes(seed, nbytes)
                    re, im = front(raw)
                    return jnp.sum(re[:, :, -1]) + jnp.sum(im[:, :, -1])

                t0 = time.monotonic()
                np.asarray(run_block(jnp.uint32(0)))
                compile_s = time.monotonic() - t0
                per = []
                for r in range(reps):
                    t0 = time.monotonic()
                    acc = 0.0
                    for b in range(4):
                        acc = acc + run_block(jnp.uint32(r * 4 + b + 1))
                    np.asarray(acc)
                    per.append((time.monotonic() - t0) / (4 * npart) * 1e6)
                t_us = statistics.median(per)
                mflops = (5.0 * nfft * nchan
                          * (2 * math.log2(nfft) + math.log2(nchan)) / t_us)
                print(json.dumps({
                    "nchan": nchan, "nfft": nfft,
                    "us_per_transform": round(t_us, 2),
                    "mflops": round(mflops, 0),
                    "npart": npart, "compile_s": round(compile_s, 1),
                    "per_rep_us": [round(x, 2) for x in per]}))
            except Exception as e:
                print(json.dumps({"nchan": nchan, "nfft": nfft,
                                  "error": f"{type(e).__name__}: {e}"}))
            sys.stdout.flush()


def main():
    t_start = time.monotonic()
    from dspsr_tpu.utils.platform import enable_compilation_cache
    cache_dir = enable_compilation_cache()

    from dspsr_tpu.models.load_to_fold import FoldConfig
    from dspsr_tpu.models.load_to_fil import FilConfig

    rate = 800e6
    # the execution backend charges a near-flat cost per program execution
    # (PERF.md): throughput scales with block size until memory limits
    min_block = int(os.environ.get("DSPSR_TPU_BENCH_BLOCK", 1 << 25))
    reps = int(os.environ.get("DSPSR_TPU_BENCH_REPS", 5))
    nblocks = int(os.environ.get("DSPSR_TPU_BENCH_NBLOCKS", 6))
    feed = os.environ.get("DSPSR_TPU_BENCH_FEED", "device")
    do_matrix = os.environ.get("DSPSR_TPU_BENCH_MATRIX", "1") != "0"
    budget_s = float(os.environ.get("DSPSR_TPU_BENCH_BUDGET_S", 1200))
    # cold compiles for a NEW geometry can take minutes; only start an
    # entry when at least this much budget remains (warm-cache entries
    # finish in well under this)
    entry_margin_s = float(os.environ.get("DSPSR_TPU_BENCH_MARGIN_S", 150))

    flagship = FoldConfig(
        polyco_path="/root/reference/Benchmark/polyco.dat",
        dispersion_measure=2.64,
        nchan=64,
        nbin=1024,
        block_parts=8,
        npol_out=1,
        min_block_samples=min_block,
    )
    obs_real = _make_obs()

    # ---- headline: flagship megakernel ----
    head = bench_fold(obs_real, flagship, reps, nblocks, feed=feed)

    matrix = {"mega_real_8bit": head}
    msps = head["msps"]
    out = {
        "metric": "fold_pipeline_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps * 1e6 / rate, 4),
        "spread_min": min(head["per_rep_msps"]),
        "spread_max": max(head["per_rep_msps"]),
        "reps": reps,
        "block_samples": head["block_samples"],
        "feed": feed,
        "engine": head["engine"],
        "compile_s": head["compile_s"],
        "compile_cache": bool(cache_dir),
        "matrix": matrix,
    }
    if "h2d_fed_msps" in head:
        out["h2d_fed_msps"] = head["h2d_fed_msps"]

    def emit():
        out["elapsed_s"] = round(time.monotonic() - t_start, 1)
        print(json.dumps(out))
        sys.stdout.flush()

    # the headline ships NOW: a wall-clock kill later in the matrix still
    # leaves this (or a later, more complete) line as the parseable result
    emit()

    if do_matrix:
        mreps, mblocks = 3, 2

        # complex (analytic) baseband, same band: 400 Msamp/s complex
        obs_cplx = _make_obs(ndim=2, rate=400e6)

        # GUPPI-like: 32 coarse channels, 2-bit complex dual-pol, in-kernel
        # JA98 unpack + excision weights (per-chan 64 subbands -> 2048 out).
        # freq_res 2048 -> per-chan n_fft 131072, R1 512, row_len 256;
        # npw=256 divides it (the JA98 fused-path requirement); 16 windows
        # per block amortize the ~35 ms dispatch (PERF.md cost model)
        obs_g = _make_obs(nchan=32, ndim=2, nbit=2, rate=12.5e6, bw=-400.0)
        cfg_g = dataclasses.replace(
            flagship, nchan=2048, dispersion_measure=71.0,
            frequency_resolution=2048, ndat_per_weight=256, block_parts=16,
            min_block_samples=0, nbin=1024)

        # 32 coarse channels, 8-bit complex dual-pol, convolved per channel
        # at its own chirp with NO further channelization (dspsr without -F
        # on a channelized instrument band).  n_fft 512k keeps the overlap
        # under ~15% of the window (DM 71 smears ~57k samples/channel) and
        # 4 windows/block amortize the per-dispatch cost (PERF.md)
        obs_c32 = _make_obs(nchan=32, ndim=2, rate=12.5e6, bw=-400.0)
        cfg_c32 = dataclasses.replace(
            flagship, nchan=32, dispersion_measure=71.0,
            frequency_resolution=1 << 19, block_parts=4,
            min_block_samples=0)

        # fused search-mode front end (digifil)
        fil_cfg = FilConfig(nchan=64, dispersion_measure=2.64, nbits=8,
                            min_block_samples=min_block, block_parts=8)

        # priority order: the measured fallback floor first (the number
        # every ineligible config pays), then the round-4 hybrid paths,
        # then variants with expensive cold compiles last
        entries = [
            # the general XLA op chain — the fallback every ineligible
            # config runs.  Smaller blocks: the XLA chain materializes
            # framed f32 windows + spectra, so flagship-size blocks
            # exceed HBM (the megakernel never materializes them)
            ("xla_general", lambda: bench_fold(
                obs_real,
                dataclasses.replace(
                    flagship, min_block_samples=min(min_block, 1 << 23)),
                mreps, mblocks, feed, env={"DSPSR_TPU_NO_MEGA": "1"})),
            # in-stream SK on the FUSED path (voltage front end + XLA
            # SK/fold tail in one program); full-size blocks fit: the
            # hybrid never materializes framed windows
            ("hybrid_sk", lambda: bench_fold(
                obs_real,
                dataclasses.replace(flagship, sk_enable=True, sk_m=1024),
                mreps, mblocks, feed)),
            # spectral RFI filter ON the fused path (round 4): the zap
            # mask from each block's passband tap multiplies the chirp and
            # rides into the next block as a traced response argument
            # (reference RFIFilter x ResponseProduct)
            ("hybrid_rfi", lambda: bench_fold(
                obs_real, dataclasses.replace(flagship, rfi_filter=True),
                mreps, mblocks, feed)),
            ("mega_analytic_8bit", lambda: bench_fold(
                obs_cplx,
                dataclasses.replace(flagship,
                                    min_block_samples=min_block // 2),
                mreps, mblocks, feed)),
            # bf16 stage constants (VERDICT r2 #9: measure on the chip)
            ("mega_bf16", lambda: bench_fold(
                obs_real, flagship, mreps, mblocks, feed,
                env={"DSPSR_TPU_MEGA_DTYPE": "bf16"})),
            ("megafil_search", lambda: bench_megafil(
                obs_real, fil_cfg, mreps, mblocks)),
            # cyclic spectroscopy (CyclicFold) through the VOLTAGE hybrid
            # front end: undetected split-complex baseband + lag-product
            # fold tail; half-size blocks (voltage planes double HBM)
            ("hybrid_cyclic", lambda: bench_fold(
                obs_real,
                dataclasses.replace(flagship, cyclic_nchan=64,
                                    min_block_samples=min_block // 2),
                mreps, mblocks, feed)),
            ("hybrid_conv32", lambda: bench_fold(
                obs_c32, cfg_c32, mreps, mblocks, feed)),
            ("mega_guppi_2bit", lambda: bench_fold(
                obs_g, cfg_g, mreps, mblocks, feed)),
            # XLA chain + spectral kurtosis excision (weights threading);
            # historically the slowest compile (~100 s cold) — last
            ("xla_sk_weights", lambda: bench_fold(
                obs_real,
                dataclasses.replace(flagship, sk_enable=True, sk_m=1024,
                                    min_block_samples=min_block // 4),
                mreps, mblocks, feed, env={"DSPSR_TPU_NO_MEGA": "1"})),
        ]

        for tag, thunk in entries:
            left = budget_s - (time.monotonic() - t_start)
            if left < entry_margin_s:
                matrix[tag] = {"skipped": "budget"}
                continue
            try:
                matrix[tag] = thunk()
            except Exception as e:  # record, don't abort the bench
                matrix[tag] = {"error": f"{type(e).__name__}: {e}"}
            # re-emit the full line after every entry: the last complete
            # line is always the best-so-far snapshot
            emit()
        # final line includes any {"skipped": "budget"} markers
        emit()


if __name__ == "__main__":
    if "sweep" in sys.argv[1:]:
        sweep()
    else:
        main()
