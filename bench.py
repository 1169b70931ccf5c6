"""Benchmark: flagship fold pipeline throughput on one chip.

Reproduces the reference's headline benchmark configuration
(``Benchmark/fold.csh`` + ``Benchmark/fold_header.dada``: 8-bit dual-pol
real-sampled 400 MHz CASPSR baseband of J0437-4715, coherent dedispersion +
fold) as the TPU convolving-filterbank pipeline: device-side 8-bit unpack ->
64-channel convolving filterbank (chirp inside the big FFT) -> square-law
detection -> 1024-bin fold.  The pipeline engages the fused Pallas
megakernel (ops.megakernel) — one device program per block.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value
is the MEDIAN over DSPSR_TPU_BENCH_REPS repetitions of Msamples/s/chip of
raw input consumed, and vs_baseline is the real-time ratio (throughput /
800 Msamp/s, the CASPSR sampling rate) — the reference's own figure of merit
(wall time vs real time, ``fold.csh:33-36``).  The spread (min/max across
repetitions) rides along for run-to-run stability tracking.
"""

import json
import os
import statistics
import sys
import time

import numpy as np


def main():
    from dspsr_tpu.utils.platform import enable_compilation_cache
    cache_dir = enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from dspsr_tpu.observation import Observation, Signal
    from dspsr_tpu.timing.mjd import MJD
    from dspsr_tpu.io.sources import DummySource
    from dspsr_tpu.models.load_to_fold import FoldConfig, FoldPipeline
    from dspsr_tpu.ops.fold import compute_anchors

    rate = 800e6
    obs = Observation(
        nchan=1, npol=2, ndim=1, nbit=8,
        centre_frequency=1382.0, bandwidth=-400.0, rate=rate,
        start_time=MJD.from_utc("2010-04-13-02:05:45"),
        state=Signal.NYQUIST, source="J0437-4715",
        telescope="PKS", instrument="DUMMY",
    )
    obs = obs.replace(ndat=1 << 40)
    src = DummySource(obs)
    # the execution backend charges a near-flat cost per program execution
    # (PERF.md): throughput scales with block size until memory limits
    min_block = int(os.environ.get("DSPSR_TPU_BENCH_BLOCK", 1 << 25))
    cfg = FoldConfig(
        polyco_path="/root/reference/Benchmark/polyco.dat",
        dispersion_measure=2.64,
        nchan=64,
        nbin=1024,
        block_parts=8,
        npol_out=1,
        min_block_samples=min_block,
    )
    pipe = FoldPipeline(src, cfg)

    block = pipe.block_in_samples
    stride = pipe.stride_in_samples
    tsamp_out = 1.0 / pipe.obs_out.rate
    nuse = (pipe.out_per_block // pipe.fold_plan.seg_len) * pipe.fold_plan.seg_len

    # pre-generate host bytes once (we benchmark the device pipeline +
    # host->device transfer, not synthetic byte generation)
    raw_np = src.read_samples(0, block)

    def fresh_acc():
        if pipe.mega_plan is not None:
            return (jnp.zeros((obs.nchan, pipe.mega_plan.npol_out,
                               pipe.mega_plan.nsub, pipe.nbin), jnp.float32),
                    jnp.zeros((obs.nchan, pipe.nbin), jnp.float32))
        return (jnp.zeros((pipe.obs_out.nchan, pipe.obs_out.npol, pipe.nbin),
                          jnp.float32),
                jnp.zeros((pipe.obs_out.nchan, pipe.nbin), jnp.float32))

    base_step = pipe._megastep if pipe.mega_plan is not None else pipe._step

    # Two feed modes (the reference benchmarks read fake data from RAM via
    # DummyFile — loading is outside the measured DSP cost):
    #  - "device" (default): the DummyFile byte stream is generated on device
    #    inside the same jit program — measures the chip's pipeline rate.
    #  - "h2d": bytes are shipped through this environment's host->device
    #    path each block (a shared debug tunnel at ~0.1 GB/s, NOT a
    #    production data path; see PERF.md).  Reported alongside either way.
    from dspsr_tpu.io.sources import device_noise_bytes

    nbytes = raw_np.size

    @jax.jit
    def devgen_step(profiles, hits, start_byte, phi0, dphi):
        raw = device_noise_bytes(start_byte, nbytes)
        return base_step(profiles, hits, raw, phi0, dphi)

    def anchors(iblock):
        t0 = pipe.output_start_time(iblock * stride)
        return compute_anchors(pipe.predictor, t0, tsamp_out, nuse,
                               pipe.fold_plan.seg_len)

    feed = os.environ.get("DSPSR_TPU_BENCH_FEED", "device")

    def run_block(profiles, hits, b):
        phi0, dphi = anchors(b)
        if feed == "device":
            return devgen_step(profiles, hits, jnp.uint32(b * nbytes),
                               jnp.asarray(phi0), jnp.asarray(dphi))
        return base_step(profiles, hits, jnp.asarray(raw_np),
                         jnp.asarray(phi0), jnp.asarray(dphi))

    # warmup / compile
    profiles, hits = fresh_acc()
    t_c0 = time.perf_counter()
    profiles, hits = run_block(profiles, hits, 0)
    np.asarray(hits[:1, :1])  # hard sync
    compile_s = time.perf_counter() - t_c0

    reps = int(os.environ.get("DSPSR_TPU_BENCH_REPS", 5))
    nblocks = int(os.environ.get("DSPSR_TPU_BENCH_NBLOCKS", 6))
    results = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for b in range(nblocks):
            profiles, hits = run_block(profiles, hits, b)
        np.asarray(hits[:1, :1])
        dt = time.perf_counter() - t0
        results.append(nblocks * stride / dt / 1e6)

    # side measurement: the tunnel-fed rate (1 rep, 2 blocks)
    h2d_msps = None
    if feed == "device":
        profiles2, hits2 = fresh_acc()
        phi0, dphi = anchors(0)
        profiles2, hits2 = base_step(profiles2, hits2, jnp.asarray(raw_np),
                                     jnp.asarray(phi0), jnp.asarray(dphi))
        np.asarray(hits2[:1, :1])
        t0 = time.perf_counter()
        for b in range(2):
            phi0, dphi = anchors(b)
            profiles2, hits2 = base_step(
                profiles2, hits2, jnp.asarray(raw_np),
                jnp.asarray(phi0), jnp.asarray(dphi))
        np.asarray(hits2[:1, :1])
        h2d_msps = 2 * stride / (time.perf_counter() - t0) / 1e6

    msps = statistics.median(results)
    realtime_ratio = msps * 1e6 / rate

    out = {
        "metric": "fold_pipeline_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(realtime_ratio, 4),
        "spread_min": round(min(results), 2),
        "spread_max": round(max(results), 2),
        "reps": reps,
        "block_samples": stride,
        "feed": feed,
        "engine": "megakernel" if pipe.mega_plan is not None else "xla",
        "compile_s": round(compile_s, 1),
        "compile_cache": bool(cache_dir),
    }
    if h2d_msps is not None:
        out["h2d_fed_msps"] = round(h2d_msps, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
