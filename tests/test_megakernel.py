"""Megakernel (fused Pallas step) correctness.

Layers of validation:

1. ``mega_reference`` (float64 numpy, shares no code with the op path beyond
   constants) vs the XLA op chain (unpack_fixed + filterbank_block + detect +
   fold_block) — proves the transpose-free factorization computes the same
   filterbank fold for every detection state.
2. The Pallas kernel (interpret mode on CPU) vs ``mega_reference``.
3. ``FoldPipeline`` with the megakernel engaged vs a per-block
   ``mega_reference`` accumulation — proves the pipeline wiring (anchors,
   layouts, subint conversion).
4. Physics: an injected periodic pulse lands in the predicted phase bin in
   both the mega and the general XLA paths.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dspsr_tpu.observation import Observation, Signal
from dspsr_tpu.ops.filterbank import FilterbankPlan, filterbank_block
from dspsr_tpu.ops.detection import detect
from dspsr_tpu.ops.fold import FoldPlan, fold_block, compute_anchors
from dspsr_tpu.unpack.unpackers import unpack_fixed
from dspsr_tpu.ops.megakernel import (
    MegaPlan, MegaConstants, mega_reference, unpack_affine, build_megastep)

NSUB, FREQ_RES, NPOL, NBIN, NPART = 4, 64, 2, 32, 3


@pytest.fixture(scope="module")
def small_setup():
    rng = np.random.default_rng(0)
    fb0 = FilterbankPlan(real_input=True, nchan_subband=NSUB,
                         freq_res=FREQ_RES, nfilt_pos=5, nfilt_neg=6)
    plan = MegaPlan.from_filterbank(fb0, nbin=NBIN, npol=NPOL, npol_out=1)
    fb = FilterbankPlan(real_input=True, nchan_subband=NSUB,
                        freq_res=FREQ_RES, nfilt_pos=plan.nfilt_pos,
                        nfilt_neg=plan.nfilt_neg)
    ndat = fb.block_ndat(NPART)
    raw = rng.integers(0, 256, size=ndat * NPOL, dtype=np.uint8)
    resp = np.exp(1j * rng.uniform(-3, 3, (NSUB, FREQ_RES)))
    phi0 = rng.uniform(0, 1, NPART)
    dphi = np.full(NPART, 0.013)
    return plan, fb, raw, resp, phi0, dphi


def _xla_detected(fb, raw, resp):
    x = unpack_fixed(jnp.asarray(raw), 8, 1, NPOL, 1)
    rr = jnp.asarray(np.ascontiguousarray(resp.real), jnp.float32)
    ri = jnp.asarray(np.ascontiguousarray(resp.imag), jnp.float32)
    return filterbank_block(x, fb, NPART, (rr, ri))


@pytest.mark.parametrize("npol_out,state", [
    (1, Signal.INTENSITY), (2, Signal.PPQQ), (4, Signal.STOKES)])
def test_reference_matches_xla_ops(small_setup, npol_out, state):
    plan0, fb, raw, resp, phi0, dphi = small_setup
    plan = MegaPlan(nsub=NSUB, freq_res=FREQ_RES, R1=plan0.R1,
                    nfilt_pos=plan0.nfilt_pos, nfilt_neg=plan0.nfilt_neg,
                    nbin=NBIN, npol=NPOL, npol_out=npol_out)
    scale, offset = unpack_affine(8)
    cst = MegaConstants(plan, resp, dtype=np.float64,
                        unpack_scale=scale, unpack_offset=offset)
    pr, hr = mega_reference(raw, plan, cst, phi0, dphi, NPART)

    y = _xla_detected(fb, raw, resp)
    d = np.asarray(detect(y, state))
    fold_plan = FoldPlan(nbin=NBIN, seg_len=plan.nkeep)
    pf, ht = fold_block(
        jnp.zeros((NSUB, npol_out, NBIN), jnp.float32),
        jnp.zeros((NSUB, NBIN), jnp.float32),
        jnp.asarray(d),
        jnp.ones((NSUB, NPART * plan.nkeep), jnp.float32),
        jnp.asarray(phi0, jnp.float32), jnp.asarray(dphi, jnp.float32),
        fold_plan)
    pf, ht = np.asarray(pf), np.asarray(ht)
    # reference layout: [nchan_in=1, npol_out, nsub, nbin]
    assert np.abs(pr[0].transpose(1, 0, 2) - pf).max() / np.abs(pf).max() < 2e-5
    assert np.abs(hr[0] - ht[0]).max() == 0


@pytest.mark.parametrize("npol_out", [1, 2, 4])
def test_pallas_matches_reference(small_setup, npol_out):
    plan0, fb, raw, resp, phi0, dphi = small_setup
    plan = MegaPlan(nsub=NSUB, freq_res=FREQ_RES, R1=plan0.R1,
                    nfilt_pos=plan0.nfilt_pos, nfilt_neg=plan0.nfilt_neg,
                    nbin=NBIN, npol=NPOL, npol_out=npol_out)
    scale, offset = unpack_affine(8)
    cst64 = MegaConstants(plan, resp, dtype=np.float64,
                          unpack_scale=scale, unpack_offset=offset)
    pr, hr = mega_reference(raw, plan, cst64, phi0, dphi, NPART)
    cst = MegaConstants(plan, resp, dtype=np.float32,
                        unpack_scale=scale, unpack_offset=offset)
    step = build_megastep(plan, cst, NPART, interpret=True)
    pk, hk = step(jnp.zeros((1, npol_out, NSUB, NBIN), jnp.float32),
                  jnp.zeros((1, NBIN), jnp.float32),
                  jnp.asarray(raw), jnp.asarray(phi0, jnp.float32),
                  jnp.asarray(dphi, jnp.float32))
    pk, hk = np.asarray(pk), np.asarray(hk)
    assert np.abs(pr - pk).max() / np.abs(pr).max() < 2e-5
    assert np.abs(hr - hk).max() == 0


# ---- pipeline wiring ----

RATE = 2e6


def _write_raw(tmp_path, ndat, seed=3, pulse_period=None):
    """8-bit dual-pol real Nyquist bytes, optionally with an injected pulse."""
    rng = np.random.default_rng(seed)
    noise = rng.normal(0, 10, (ndat, 2))
    if pulse_period is not None:
        t = np.arange(ndat) / RATE
        mask = (t % pulse_period) < 0.05 * pulse_period
        noise[mask] *= 4.0
    q = np.clip(np.round(noise + 127.5), 0, 255).astype(np.uint8)
    p = str(tmp_path / "mega.raw")
    with open(p, "wb") as f:
        f.write(q.reshape(-1).tobytes())
    return p


def _obs():
    from dspsr_tpu.timing.mjd import MJD

    return Observation(
        nchan=1, npol=2, ndim=1, nbit=8, centre_frequency=1400.0,
        bandwidth=-2.0, rate=RATE,
        start_time=MJD.from_utc("2010-04-13-02:05:45"),
        state=Signal.NYQUIST, source="FAKE", telescope="PKS",
        instrument="RAW")


def _config(**kw):
    from dspsr_tpu.models.load_to_fold import FoldConfig

    base = dict(folding_period=0.005, dispersion_measure=5.0, nchan=4,
                nbin=32, block_parts=2, min_block_samples=0,
                digitizer_stats=False)
    base.update(kw)
    return FoldConfig(**base)


def test_pipeline_mega_engages_and_matches_reference(tmp_path):
    from dspsr_tpu.io.sources import RawFileSource
    from dspsr_tpu.models.load_to_fold import FoldPipeline
    from dspsr_tpu.ops.fold import compute_anchors

    path = _write_raw(tmp_path, 1 << 15)
    src = RawFileSource(path, _obs())
    pipe = FoldPipeline(src, _config())
    assert pipe.mega_plan is not None, "megakernel should engage"
    res = pipe.run()

    # replicate: per-block mega_reference accumulation with the same anchors
    plan = pipe.mega_plan
    scale, offset = unpack_affine(8)
    cst = MegaConstants(plan, pipe.kernel.phasors, dtype=np.float64,
                        unpack_scale=scale, unpack_offset=offset)
    tsamp_out = 1.0 / pipe.obs_out.rate
    nuse = pipe.npart * plan.nkeep
    prof = np.zeros((1, 1, plan.nsub, plan.nbin))
    hits = np.zeros((1, plan.nbin))
    start = 0
    while start + pipe.block_in_samples <= src.total_samples:
        raw = src.read_samples(start, pipe.block_in_samples)
        t0 = pipe.output_start_time(start)
        phi0, dphi = compute_anchors(pipe.predictor, t0, tsamp_out,
                                     nuse, plan.nkeep)
        p, h = mega_reference(raw, plan, cst,
                              phi0.astype(np.float64),
                              dphi.astype(np.float64), pipe.npart)
        prof += p
        hits += h
        start += pipe.stride_in_samples

    got = res.profiles[0]  # [nchan, npol, nbin]
    assert got.shape == (plan.nsub, 1, plan.nbin)
    want = prof[0].transpose(1, 0, 2)  # [nsub, npol_out, nbin]
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-4
    assert np.abs(res.hits[0][0] - hits[0]).max() == 0
    assert np.allclose(res.hits[0], res.hits[0][0:1])  # channel-uniform


def test_pipeline_mega_vs_general_pulse_recovery(tmp_path, monkeypatch):
    """Both engines recover an injected pulse at the same phase."""
    from dspsr_tpu.io.sources import RawFileSource
    from dspsr_tpu.models.load_to_fold import FoldPipeline

    period = 0.005
    path = _write_raw(tmp_path, 1 << 15, pulse_period=period)

    res = {}
    for tag, nomega in (("mega", False), ("general", True)):
        if nomega:
            monkeypatch.setenv("DSPSR_TPU_NO_MEGA", "1")
        else:
            monkeypatch.delenv("DSPSR_TPU_NO_MEGA", raising=False)
        src = RawFileSource(path, _obs())
        pipe = FoldPipeline(src, _config(folding_period=period))
        assert (pipe.mega_plan is not None) == (not nomega)
        res[tag] = pipe.run()

    for tag in res:
        prof = res[tag].normalized()[0, :, 0, :]  # [nchan, nbin]
        mean = prof.mean(axis=1, keepdims=True)
        snr = (prof.max(axis=1) - mean[:, 0]) / prof.std(axis=1)
        assert (snr > 1.5).all(), f"{tag}: pulse not recovered"
    a = res["mega"].normalized()[0, :, 0, :]
    b = res["general"].normalized()[0, :, 0, :]
    # geometry differs slightly (rounded overlap) -> compare peak positions
    assert (np.argmax(a, axis=1) == np.argmax(b, axis=1)).all()


def test_pipeline_mega_subints(tmp_path):
    from dspsr_tpu.io.sources import RawFileSource
    from dspsr_tpu.models.load_to_fold import FoldPipeline

    path = _write_raw(tmp_path, 1 << 15)
    src = RawFileSource(path, _obs())
    pipe = FoldPipeline(src, _config(subint_seconds=0.004))
    assert pipe.mega_plan is not None
    res = pipe.run()
    assert res.profiles.shape[0] >= 2
    # every subint in standard layout with uniform hits
    assert res.profiles.shape[1:] == (4, 1, 32)
    total = res.hits.sum()
    assert total > 0


def test_bf16_constants_close_to_f32(small_setup):
    """DSPSR_TPU_MEGA_DTYPE=bf16 halves constant VMEM and doubles MXU rate;
    the error must stay at the bf16 level (~1e-2), far below 8-bit
    quantization noise."""
    import jax.numpy as jnp2

    plan, fb, raw, resp, phi0, dphi = small_setup
    scale, offset = unpack_affine(8)
    outs = {}
    for dt in (np.float32, jnp2.bfloat16):
        cst = MegaConstants(plan, resp, dtype=dt,
                            unpack_scale=scale, unpack_offset=offset)
        step = build_megastep(plan, cst, NPART, interpret=True)
        p, h = step(jnp.zeros((1, 1, NSUB, NBIN), jnp.float32),
                    jnp.zeros((1, NBIN), jnp.float32),
                    jnp.asarray(raw), jnp.asarray(phi0, jnp.float32),
                    jnp.asarray(dphi, jnp.float32))
        outs[np.dtype(dt).name if dt is np.float32 else "bf16"] = np.asarray(p)
    a, b = outs["float32"], outs["bf16"]
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 0.05, rel
    # and the bf16 fold still conserves flux to ~1%
    assert abs(b.sum() / a.sum() - 1) < 0.01


# ---- complex (analytic) input path ----

@pytest.fixture(scope="module")
def complex_setup():
    rng = np.random.default_rng(5)
    fb0 = FilterbankPlan(real_input=False, nchan_subband=NSUB,
                         freq_res=FREQ_RES, nfilt_pos=5, nfilt_neg=6)
    plan = MegaPlan.from_filterbank(fb0, nbin=NBIN, npol=NPOL, npol_out=1)
    assert plan is not None and not plan.real_input
    fb = FilterbankPlan(real_input=False, nchan_subband=NSUB,
                        freq_res=FREQ_RES, nfilt_pos=plan.nfilt_pos,
                        nfilt_neg=plan.nfilt_neg)
    ndat = fb.block_ndat(NPART)
    raw = rng.integers(0, 256, size=ndat * NPOL * 2, dtype=np.uint8)
    resp = np.exp(1j * rng.uniform(-3, 3, (NSUB, FREQ_RES)))
    phi0 = rng.uniform(0, 1, NPART)
    dphi = np.full(NPART, 0.017)
    return plan, fb, raw, resp, phi0, dphi


@pytest.mark.parametrize("npol_out,state", [
    (1, Signal.INTENSITY), (4, Signal.STOKES)])
def test_complex_reference_matches_xla_ops(complex_setup, npol_out, state):
    import dataclasses as dc

    plan0, fb, raw, resp, phi0, dphi = complex_setup
    plan = dc.replace(plan0, npol_out=npol_out)
    scale, offset = unpack_affine(8)
    cst = MegaConstants(plan, resp, dtype=np.float64,
                        unpack_scale=scale, unpack_offset=offset)
    pr, hr = mega_reference(raw, plan, cst, phi0, dphi, NPART)

    x = unpack_fixed(jnp.asarray(raw), 8, 1, NPOL, 2)
    rr = jnp.asarray(np.ascontiguousarray(resp.real), jnp.float32)
    ri = jnp.asarray(np.ascontiguousarray(resp.imag), jnp.float32)
    y = filterbank_block(x, fb, NPART, (rr, ri))
    d = np.asarray(detect(y, state))
    fold_plan = FoldPlan(nbin=NBIN, seg_len=plan.nkeep)
    pf, ht = fold_block(
        jnp.zeros((NSUB, npol_out, NBIN), jnp.float32),
        jnp.zeros((NSUB, NBIN), jnp.float32),
        jnp.asarray(d),
        jnp.ones((NSUB, NPART * plan.nkeep), jnp.float32),
        jnp.asarray(phi0, jnp.float32), jnp.asarray(dphi, jnp.float32),
        fold_plan)
    pf = np.asarray(pf)
    assert np.abs(pr[0].transpose(1, 0, 2) - pf).max() / np.abs(pf).max() < 2e-5
    assert np.abs(hr[0] - np.asarray(ht)[0]).max() == 0


def test_complex_pallas_matches_reference(complex_setup):
    plan, fb, raw, resp, phi0, dphi = complex_setup
    scale, offset = unpack_affine(8)
    cst64 = MegaConstants(plan, resp, dtype=np.float64,
                          unpack_scale=scale, unpack_offset=offset)
    pr, hr = mega_reference(raw, plan, cst64, phi0, dphi, NPART)
    cst = MegaConstants(plan, resp, dtype=np.float32,
                        unpack_scale=scale, unpack_offset=offset)
    step = build_megastep(plan, cst, NPART, interpret=True)
    pk, hk = step(jnp.zeros((1, 1, NSUB, NBIN), jnp.float32),
                  jnp.zeros((1, NBIN), jnp.float32),
                  jnp.asarray(raw), jnp.asarray(phi0, jnp.float32),
                  jnp.asarray(dphi, jnp.float32))
    pk, hk = np.asarray(pk), np.asarray(hk)
    assert np.abs(pr - pk).max() / np.abs(pr).max() < 2e-5
    assert np.abs(hr - hk).max() == 0


def test_pipeline_complex_mega_vs_general(tmp_path, monkeypatch):
    """Complex (analytic) 8-bit input engages the megakernel and recovers
    the same pulse as the general path (GUPPI/VDIF-class data)."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_pipeline import synth_pulsar_dada, PERIOD, DM
    from dspsr_tpu.io.sources import open_source
    from dspsr_tpu.models.load_to_fold import FoldConfig, FoldPipeline

    path = synth_pulsar_dada(str(tmp_path / "cm.dada"), nsec=0.15)
    cfg = FoldConfig(folding_period=PERIOD, dispersion_measure=DM,
                     nchan=4, nbin=32, block_parts=2, min_block_samples=8192)
    res = {}
    for tag, off in (("mega", False), ("general", True)):
        if off:
            monkeypatch.setenv("DSPSR_TPU_NO_MEGA", "1")
        else:
            monkeypatch.delenv("DSPSR_TPU_NO_MEGA", raising=False)
        pipe = FoldPipeline(open_source(path), cfg)
        assert (pipe.mega_plan is not None) == (not off)
        if pipe.mega_plan is not None:
            assert not pipe.mega_plan.real_input
        res[tag] = pipe.run()
    a = res["mega"].dedispersed()[0, :, 0, :]
    b = res["general"].dedispersed()[0, :, 0, :]
    assert (np.argmax(a, axis=1) == np.argmax(b, axis=1)).all()


# ---- round-3 generality: multichannel input ----

NCHAN_IN = 2


@pytest.fixture(scope="module")
def multichan_setup():
    rng = np.random.default_rng(9)
    fb0 = FilterbankPlan(real_input=False, nchan_subband=NSUB,
                         freq_res=FREQ_RES, nfilt_pos=5, nfilt_neg=6)
    plan = MegaPlan.from_filterbank(fb0, nbin=NBIN, npol=NPOL, npol_out=1,
                                    nchan_in=NCHAN_IN)
    assert plan is not None and plan.nchan_in == NCHAN_IN
    fb = FilterbankPlan(real_input=False, nchan_subband=NSUB,
                        freq_res=FREQ_RES, nfilt_pos=plan.nfilt_pos,
                        nfilt_neg=plan.nfilt_neg)
    ndat = fb.block_ndat(NPART)
    raw = rng.integers(0, 256, size=ndat * NCHAN_IN * NPOL * 2,
                       dtype=np.uint8)
    resp = np.exp(1j * rng.uniform(-3, 3, (NCHAN_IN * NSUB, FREQ_RES)))
    phi0 = rng.uniform(0, 1, NPART)
    dphi = np.full(NPART, 0.011)
    return plan, fb, raw, resp, phi0, dphi


@pytest.mark.parametrize("npol_out,state", [
    (1, Signal.INTENSITY), (4, Signal.STOKES)])
def test_multichan_reference_matches_xla_ops(multichan_setup, npol_out, state):
    """nchan_in > 1 (GUPPI RAW / VDIF class): each input channel runs its
    own convolving filterbank with its own chirp slice."""
    import dataclasses as dc

    plan0, fb, raw, resp, phi0, dphi = multichan_setup
    plan = dc.replace(plan0, npol_out=npol_out)
    scale, offset = unpack_affine(8)
    cst = MegaConstants(plan, resp, dtype=np.float64,
                        unpack_scale=scale, unpack_offset=offset)
    pr, hr = mega_reference(raw, plan, cst, phi0, dphi, NPART)

    x = unpack_fixed(jnp.asarray(raw), 8, NCHAN_IN, NPOL, 2)
    rr = jnp.asarray(np.ascontiguousarray(resp.real), jnp.float32)
    ri = jnp.asarray(np.ascontiguousarray(resp.imag), jnp.float32)
    y = filterbank_block(x, fb, NPART, (rr, ri))
    d = np.asarray(detect(y, state))
    nchan_out = NCHAN_IN * NSUB
    fold_plan = FoldPlan(nbin=NBIN, seg_len=plan.nkeep)
    pf, ht = fold_block(
        jnp.zeros((nchan_out, npol_out, NBIN), jnp.float32),
        jnp.zeros((nchan_out, NBIN), jnp.float32),
        jnp.asarray(d),
        jnp.ones((nchan_out, NPART * plan.nkeep), jnp.float32),
        jnp.asarray(phi0, jnp.float32), jnp.asarray(dphi, jnp.float32),
        fold_plan)
    pf, ht = np.asarray(pf), np.asarray(ht)
    want = pr.transpose(0, 2, 1, 3).reshape(nchan_out, npol_out, NBIN)
    assert np.abs(want - pf).max() / np.abs(pf).max() < 2e-5
    assert np.abs(np.repeat(hr, NSUB, axis=0) - ht).max() == 0


def test_multichan_pallas_matches_reference(multichan_setup):
    plan, fb, raw, resp, phi0, dphi = multichan_setup
    scale, offset = unpack_affine(8)
    cst64 = MegaConstants(plan, resp, dtype=np.float64,
                          unpack_scale=scale, unpack_offset=offset)
    pr, hr = mega_reference(raw, plan, cst64, phi0, dphi, NPART)
    cst = MegaConstants(plan, resp, dtype=np.float32,
                        unpack_scale=scale, unpack_offset=offset)
    step = build_megastep(plan, cst, NPART, interpret=True)
    pk, hk = step(jnp.zeros((NCHAN_IN, 1, NSUB, NBIN), jnp.float32),
                  jnp.zeros((NCHAN_IN, NBIN), jnp.float32),
                  jnp.asarray(raw), jnp.asarray(phi0, jnp.float32),
                  jnp.asarray(dphi, jnp.float32))
    pk, hk = np.asarray(pk), np.asarray(hk)
    assert np.abs(pr - pk).max() / np.abs(pr).max() < 2e-5
    assert np.abs(hr - hk).max() == 0


def test_pipeline_multichan_mega_vs_general(tmp_path, monkeypatch):
    """A multi-channel complex 8-bit stream (GUPPI/VDIF shape) engages the
    megakernel and matches the general XLA chain."""
    import dataclasses
    from dspsr_tpu.io.sources import RawFileSource
    from dspsr_tpu.models.load_to_fold import FoldPipeline
    from dspsr_tpu.timing.mjd import MJD

    rng = np.random.default_rng(11)
    obs = Observation(
        nchan=2, npol=2, ndim=2, nbit=8, centre_frequency=1400.0,
        bandwidth=-4.0, rate=RATE, start_time=MJD.from_utc(
            "2010-04-13-02:05:45"),
        state=Signal.ANALYTIC, source="FAKE", telescope="PKS",
        instrument="RAW")
    period = 0.005
    ndat = 1 << 15
    # injected pulse: amplitude-modulated noise so both engines must
    # recover the same phase peak (geometry differs by rounded overlap, so
    # pure-noise profiles would not be comparable)
    t = np.arange(ndat) / RATE
    amp = np.where((t % period) < 0.05 * period, 80.0, 10.0)
    v = rng.normal(0, 1, (ndat, 2, 2, 2)) * amp[:, None, None, None]
    q = np.clip(np.round(v + 127.5), 0, 255).astype(np.uint8)
    path = str(tmp_path / "mc.raw")
    with open(path, "wb") as f:
        f.write(q.reshape(-1).tobytes())
    cfg = _config(nchan=8, folding_period=period)  # 4 subbands per chan
    res = {}
    for tag, off in (("mega", False), ("general", True)):
        if off:
            monkeypatch.setenv("DSPSR_TPU_NO_MEGA", "1")
        else:
            monkeypatch.delenv("DSPSR_TPU_NO_MEGA", raising=False)
        pipe = FoldPipeline(RawFileSource(path, obs), cfg)
        assert (pipe.mega_plan is not None) == (not off)
        if pipe.mega_plan is not None:
            assert pipe.mega_plan.nchan_in == 2
        res[tag] = pipe.run()
    a, b = res["mega"], res["general"]
    assert a.profiles.shape == b.profiles.shape
    pa = a.dedispersed()[0, :, 0, :]
    pb = b.dedispersed()[0, :, 0, :]
    for p in (pa, pb):
        snr = (p.max(axis=1) - p.mean(axis=1)) / (p.std(axis=1) + 1e-30)
        assert (snr > 1.5).all()
    # the engines integrate slightly different data spans (rounded
    # overlap), so allow one bin of circular peak jitter; exact numerical
    # parity on identical geometry is proven by the block-level tests
    nbin = pa.shape[1]
    d = (np.argmax(pa, axis=1) - np.argmax(pb, axis=1)) % nbin
    d = np.minimum(d, nbin - d)
    assert (d <= 1).all(), d


# ---- round-3 generality: 2-bit JA98 in-kernel unpack + excision ----


def _twobit_bytes(rng, nbytes, rfi=None):
    codes = rng.choice(4, size=nbytes * 4,
                       p=[0.1615, 0.3385, 0.3385, 0.1615]).astype(np.uint8)
    if rfi is not None:
        codes[rfi[0]:rfi[1]] = 3  # saturated stretch -> excised
    c = codes.reshape(-1, 4)
    return ((c[:, 0] << 6) | (c[:, 1] << 4) | (c[:, 2] << 2) | c[:, 3]
            ).astype(np.uint8)


@pytest.fixture(scope="module")
def twobit_setup():
    from dspsr_tpu.unpack.twobit import TwoBitCorrection

    rng = np.random.default_rng(21)
    fb0 = FilterbankPlan(real_input=False, nchan_subband=NSUB,
                         freq_res=FREQ_RES, nfilt_pos=5, nfilt_neg=6)
    npw = 16  # must divide row_len (= R2 = 16 at this geometry)
    plan = MegaPlan.from_filterbank(fb0, nbin=NBIN, npol=NPOL, npol_out=1,
                                    nbit=2, ndat_per_weight=npw)
    assert plan is not None and plan.npw == npw
    ndat = plan.block_ndat(NPART)
    raw = _twobit_bytes(rng, ndat * NPOL * 2 // 4,
                        rfi=(ndat // 3, ndat // 3 + 5 * npw))
    resp = np.exp(1j * rng.uniform(-3, 3, (NSUB, FREQ_RES)))
    phi0 = rng.uniform(0, 1, NPART)
    dphi = np.full(NPART, 0.019)
    tb = TwoBitCorrection(ndat_per_weight=npw)
    return plan, raw, resp, phi0, dphi, tb


def test_twobit_reference_matches_xla_chain(twobit_setup):
    """The f64 reference's in-kernel JA98 levels + per-window excision
    weights equal the XLA chain (unpack_twobit_dynamic + conservative
    window weights + weighted fold)."""
    from dspsr_tpu.unpack.unpackers import unpack_twobit_dynamic

    plan, raw, resp, phi0, dphi, tb = twobit_setup
    cst = MegaConstants(plan, resp, dtype=np.float64, twobit=tb)
    pr, hr = mega_reference(raw, plan, cst, phi0, dphi, NPART)

    fb = FilterbankPlan(real_input=False, nchan_subband=NSUB,
                        freq_res=FREQ_RES, nfilt_pos=plan.nfilt_pos,
                        nfilt_neg=plan.nfilt_neg)
    x, w = unpack_twobit_dynamic(
        jnp.asarray(raw), jnp.asarray(tb.level_tables[0]),
        jnp.asarray(tb.level_tables[1]), jnp.asarray(tb.weight_table),
        1, NPOL, 2, plan.npw)
    rr = jnp.asarray(np.ascontiguousarray(resp.real), jnp.float32)
    ri = jnp.asarray(np.ascontiguousarray(resp.imag), jnp.float32)
    y = filterbank_block(x, fb, NPART, (rr, ri))
    d = np.asarray(detect(y, Signal.INTENSITY))
    # conservative per-window weights (the _stream_weights rule)
    from dspsr_tpu.ops.megakernel import window_weight_spans

    w = np.asarray(w)  # [1, nweights]
    wwin = np.array([w[0, a:b].min()
                     for a, b in window_weight_spans(plan, NPART)])
    weights = np.repeat(wwin, plan.nkeep)[None, :].repeat(NSUB, axis=0)
    fold_plan = FoldPlan(nbin=NBIN, seg_len=plan.nkeep)
    pf, ht = fold_block(
        jnp.zeros((NSUB, 1, NBIN), jnp.float32),
        jnp.zeros((NSUB, NBIN), jnp.float32),
        jnp.asarray(d), jnp.asarray(weights, jnp.float32),
        jnp.asarray(phi0, jnp.float32), jnp.asarray(dphi, jnp.float32),
        fold_plan)
    pf, ht = np.asarray(pf), np.asarray(ht)
    assert np.abs(pr[0].transpose(1, 0, 2) - pf).max() / \
        (np.abs(pf).max() + 1e-30) < 2e-5
    assert np.abs(np.repeat(hr, NSUB, axis=0) - ht).max() == 0
    # the saturated stretch actually excised something
    assert wwin.min() == 0.0 and wwin.max() == 1.0


def test_twobit_pallas_matches_reference(twobit_setup):
    plan, raw, resp, phi0, dphi, tb = twobit_setup
    cst64 = MegaConstants(plan, resp, dtype=np.float64, twobit=tb)
    pr, hr = mega_reference(raw, plan, cst64, phi0, dphi, NPART)
    cst = MegaConstants(plan, resp, dtype=np.float32, twobit=tb)
    step = build_megastep(plan, cst, NPART, interpret=True)
    pk, hk = step(jnp.zeros((1, 1, NSUB, NBIN), jnp.float32),
                  jnp.zeros((1, NBIN), jnp.float32),
                  jnp.asarray(raw), jnp.asarray(phi0, jnp.float32),
                  jnp.asarray(dphi, jnp.float32))
    pk, hk = np.asarray(pk), np.asarray(hk)
    assert np.abs(pr - pk).max() / np.abs(pr).max() < 2e-5
    assert np.abs(hr - hk).max() == 0


def test_pipeline_twobit_mega_vs_general(tmp_path, monkeypatch):
    """End-to-end: a 2-bit analytic stream with a saturated RFI stretch
    engages the fused JA98 path and matches the general XLA chain —
    profiles, per-channel hits AND excision behaviour."""
    import dataclasses
    from dspsr_tpu.io.sources import RawFileSource
    from dspsr_tpu.models.load_to_fold import FoldPipeline
    from dspsr_tpu.timing.mjd import MJD

    rng = np.random.default_rng(31)
    obs = Observation(
        nchan=1, npol=2, ndim=2, nbit=2, centre_frequency=1400.0,
        bandwidth=-1.0, rate=RATE, start_time=MJD.from_utc(
            "2010-04-13-02:05:45"),
        state=Signal.ANALYTIC, source="FAKE", telescope="PKS",
        instrument="RAW")
    nsamp = 1 << 16
    raw = _twobit_bytes(rng, nsamp, rfi=(40000, 40000 + 4096))
    path = str(tmp_path / "tb.raw")
    with open(path, "wb") as f:
        f.write(raw.tobytes())
    # DM=0: zero overlap -> no nfilt rounding -> the mega and general
    # engines integrate EXACTLY the same data, so parity is numerical.
    # n_fft 4096, R1 64, R2 64, row_len 64; npw=64 divides it -> fused
    # JA98 path eligible
    cfg = _config(ndat_per_weight=64, min_block_samples=8192,
                  frequency_resolution=1024, dispersion_measure=0.0)
    res = {}
    for tag, off in (("mega", False), ("general", True)):
        if off:
            monkeypatch.setenv("DSPSR_TPU_NO_MEGA", "1")
        else:
            monkeypatch.delenv("DSPSR_TPU_NO_MEGA", raising=False)
        pipe = FoldPipeline(RawFileSource(path, obs), cfg)
        assert (pipe.mega_plan is not None) == (not off), tag
        if pipe.mega_plan is not None:
            assert pipe.mega_plan.npw == 64
        res[tag] = pipe.run()
    a, b = res["mega"], res["general"]
    assert a.profiles.shape == b.profiles.shape
    # excision visible: some phase bins lost hits in both engines, and the
    # per-channel hit TOTALS (sum of window weights x nkeep) match exactly
    # — the in-kernel JA98 weights equal the XLA-chain weights
    assert a.hits.min() < a.hits.max()
    np.testing.assert_allclose(a.hits.sum(axis=(0, 2)),
                               b.hits.sum(axis=(0, 2)), rtol=0, atol=0)
    # profiles agree up to f32 bin-boundary jitter (different phase-anchor
    # segmenting moves O(few) samples between adjacent bins)
    pa = a.normalized()
    pb = b.normalized()
    scale = np.abs(pb).max()
    assert np.abs(pa - pb).max() / scale < 0.05
    corr = [np.corrcoef(pa[0, c, 0], pb[0, c, 0])[0, 1]
            for c in range(pa.shape[1])]
    assert min(corr) > 0.98, corr


# ---- round-3 generality: external per-window weight operand ----


def test_external_weights_reach_fused_fold(small_setup):
    """SK/RFI masks computed outside the kernel zero their windows in both
    profiles and hits (verdict r2 item 1c)."""
    plan0, fb, raw, resp, phi0, dphi = small_setup
    plan = MegaPlan(nsub=NSUB, freq_res=FREQ_RES, R1=plan0.R1,
                    nfilt_pos=plan0.nfilt_pos, nfilt_neg=plan0.nfilt_neg,
                    nbin=NBIN, npol=NPOL, npol_out=1)
    scale, offset = unpack_affine(8)
    wext = np.array([[1.0, 0.0, 1.0]])  # kill window 1
    cst64 = MegaConstants(plan, resp, dtype=np.float64,
                          unpack_scale=scale, unpack_offset=offset)
    pr, hr = mega_reference(raw, plan, cst64, phi0, dphi, NPART,
                            ext_weights=wext)
    pr_all, hr_all = mega_reference(raw, plan, cst64, phi0, dphi, NPART)
    assert hr.sum() < hr_all.sum()

    cst = MegaConstants(plan, resp, dtype=np.float32,
                        unpack_scale=scale, unpack_offset=offset)
    step = build_megastep(plan, cst, NPART, interpret=True,
                          external_weights=True)
    pk, hk = step(jnp.zeros((1, 1, NSUB, NBIN), jnp.float32),
                  jnp.zeros((1, NBIN), jnp.float32),
                  jnp.asarray(raw), jnp.asarray(phi0, jnp.float32),
                  jnp.asarray(dphi, jnp.float32),
                  jnp.asarray(wext, jnp.float32))
    pk, hk = np.asarray(pk), np.asarray(hk)
    assert np.abs(pr - pk).max() / np.abs(pr).max() < 2e-5
    assert np.abs(hr - hk).max() == 0


# ---- round-3 follow-up: detection states, fourth moments, apodization ----


@pytest.mark.parametrize("det_tag,state,npol_out,fourth,window", [
    ("pp", Signal.PP, 1, False, None),
    ("qq", Signal.QQ, 1, False, None),
    ("coherence", Signal.COHERENCE, 4, False, None),
    ("auto", Signal.STOKES, 4, True, None),       # -4 fourth moments
    ("auto", Signal.INTENSITY, 1, False, "hanning"),
    ("coherence", Signal.COHERENCE, 4, False, "tukey"),
])
def test_detection_fourthmoment_apodization(small_setup, det_tag, state,
                                            npol_out, fourth, window):
    """Every detection state (Detection.C:42-66), fourth moments
    (FourthMoment.C) and pre-FFT apodization (Apodization.C) on the fused
    path: mega_reference vs the XLA op chain, then the Pallas kernel vs
    mega_reference."""
    from dspsr_tpu.ops.apodization import WindowType, build_window
    from dspsr_tpu.ops.fourth_moment import fourth_moment

    plan0, fb, raw, resp, phi0, dphi = small_setup
    plan = MegaPlan(nsub=NSUB, freq_res=FREQ_RES, R1=plan0.R1,
                    nfilt_pos=plan0.nfilt_pos, nfilt_neg=plan0.nfilt_neg,
                    nbin=NBIN, npol=NPOL, npol_out=npol_out,
                    detection=det_tag, fourth_moment=fourth)
    win = (build_window(WindowType(window), plan.nsamp_fft)
           if window else None)
    scale, offset = unpack_affine(8)
    cst64 = MegaConstants(plan, resp, dtype=np.float64,
                          unpack_scale=scale, unpack_offset=offset,
                          window=win)
    pr, hr = mega_reference(raw, plan, cst64, phi0, dphi, NPART)

    # XLA op chain with the same (rounded) geometry
    x = unpack_fixed(jnp.asarray(raw), 8, 1, NPOL, 1)
    rr = jnp.asarray(np.ascontiguousarray(resp.real), jnp.float32)
    ri = jnp.asarray(np.ascontiguousarray(resp.imag), jnp.float32)
    from dspsr_tpu.ops.filterbank import filterbank_block

    y = filterbank_block(x, fb, NPART, (rr, ri),
                         apodization=(jnp.asarray(win) if window else None))
    d = detect(y, state)
    if fourth:
        d = fourth_moment(d)
    fold_plan = FoldPlan(nbin=NBIN, seg_len=plan.nkeep)
    pf, ht = fold_block(
        jnp.zeros((NSUB, plan.nplane, NBIN), jnp.float32),
        jnp.zeros((NSUB, NBIN), jnp.float32),
        jnp.asarray(d),
        jnp.ones((NSUB, NPART * plan.nkeep), jnp.float32),
        jnp.asarray(phi0, jnp.float32), jnp.asarray(dphi, jnp.float32),
        fold_plan)
    pf = np.asarray(pf)
    assert np.abs(pr[0].transpose(1, 0, 2) - pf).max() / \
        np.abs(pf).max() < 5e-5

    # Pallas kernel vs reference
    cst = MegaConstants(plan, resp, dtype=np.float32,
                        unpack_scale=scale, unpack_offset=offset, window=win)
    step = build_megastep(plan, cst, NPART, interpret=True)
    pk, hk = step(jnp.zeros((1, plan.nplane, NSUB, NBIN), jnp.float32),
                  jnp.zeros((1, NBIN), jnp.float32),
                  jnp.asarray(raw), jnp.asarray(phi0, jnp.float32),
                  jnp.asarray(dphi, jnp.float32))
    pk, hk = np.asarray(pk), np.asarray(hk)
    assert np.abs(pr - pk).max() / np.abs(pr).max() < 5e-5
    assert np.abs(hr - hk).max() == 0


@pytest.mark.parametrize("kw,shape_tail", [
    (dict(detection="coherence", npol_out=4), (4, 32)),
    (dict(fourth_moment=True, npol_out=4), (14, 32)),
    (dict(fft_window="hanning"), (1, 32)),
])
def test_pipeline_mega_engages_new_configs(tmp_path, monkeypatch, kw,
                                           shape_tail):
    """Coherence/fourth-moment/apodized configs now ride the fused path and
    recover the injected pulse at the same phase as the XLA chain."""
    from dspsr_tpu.io.sources import RawFileSource
    from dspsr_tpu.models.load_to_fold import FoldPipeline

    period = 0.005
    path = _write_raw(tmp_path, 1 << 15, pulse_period=period)
    res = {}
    for tag, nomega in (("mega", False), ("general", True)):
        if nomega:
            monkeypatch.setenv("DSPSR_TPU_NO_MEGA", "1")
        else:
            monkeypatch.delenv("DSPSR_TPU_NO_MEGA", raising=False)
        src = RawFileSource(path, _obs())
        pipe = FoldPipeline(src, _config(folding_period=period, **kw))
        assert (pipe.mega_plan is not None) == (not nomega), kw
        res[tag] = pipe.run()

    for tag in ("mega", "general"):
        assert res[tag].profiles.shape[2:] == shape_tail, tag
    # plane 0 (PP / I) recovers the pulse at the same phase in both engines
    a = res["mega"].normalized()[0, :, 0, :]
    b = res["general"].normalized()[0, :, 0, :]
    assert (np.argmax(a, axis=1) == np.argmax(b, axis=1)).all()
    if kw.get("detection") == "coherence":
        assert res["mega"].obs.state == Signal.COHERENCE
        stokes = res["mega"].to_stokes()
        assert stokes.profiles.shape == res["mega"].profiles.shape


# --------------------------------------------------------------------------
# fused front end modes (voltage / passband / Jones / nsub == 1)
# --------------------------------------------------------------------------

def _front_setup(real_input, nsub, freq_res, nchan=1, seed=7):
    from dspsr_tpu.ops.megakernel import MegaConstants, unpack_affine
    rng = np.random.default_rng(seed)
    fb0 = FilterbankPlan(real_input=real_input, nchan_subband=nsub,
                         freq_res=freq_res, nfilt_pos=5, nfilt_neg=6)
    from dspsr_tpu.ops.megakernel import MegaPlan as MP
    plan = MP.from_filterbank(fb0, nbin=NBIN, npol=NPOL, npol_out=1,
                              nchan_in=nchan)
    assert plan is not None
    ndim = 1 if real_input else 2
    ndat = plan.block_ndat(NPART)
    raw = rng.integers(0, 256, size=ndat * nchan * NPOL * ndim,
                       dtype=np.uint8)
    scale, offset = unpack_affine(8)
    return plan, raw, rng, scale, offset


@pytest.mark.parametrize("real_input", [True, False])
def test_megafil_voltage_matches_filterbank(real_input):
    """Voltage-output front end == invert_subbands' complex baseband
    (incl. the restored per-chunk ifftshift the detection path skips)."""
    from dspsr_tpu.ops.megakernel import MegaConstants, build_megafil

    plan, raw, rng, scale, offset = _front_setup(real_input, NSUB, FREQ_RES)
    resp = np.exp(1j * rng.uniform(-3, 3, (NSUB, FREQ_RES)))
    cst = MegaConstants(plan, resp, dtype=np.float64,
                        unpack_scale=scale, unpack_offset=offset)
    vr, vi = build_megafil(plan, cst, NPART, output="voltage")(
        jnp.asarray(raw))

    fb = FilterbankPlan(real_input=real_input, nchan_subband=NSUB,
                        freq_res=FREQ_RES, nfilt_pos=plan.nfilt_pos,
                        nfilt_neg=plan.nfilt_neg)
    x = unpack_fixed(jnp.asarray(raw), 8, 1, NPOL, 1 if real_input else 2)
    rr = jnp.asarray(np.ascontiguousarray(resp.real), jnp.float32)
    ri = jnp.asarray(np.ascontiguousarray(resp.imag), jnp.float32)
    y = filterbank_block(x, fb, NPART, (rr, ri))
    den = np.abs(np.asarray(y[0])).max()
    assert np.abs(np.asarray(vr) - np.asarray(y[0])).max() / den < 2e-5
    assert np.abs(np.asarray(vi) - np.asarray(y[1])).max() / den < 2e-5


def test_megafil_passband_matches_spectra():
    """The in-kernel passband accumulator == the XLA chain's integrated
    pre-response bandpass (reference Response passband integration)."""
    from dspsr_tpu.ops.filterbank import forward_spectra_chunked
    from dspsr_tpu.ops.megakernel import MegaConstants, build_megafil

    plan, raw, rng, scale, offset = _front_setup(True, NSUB, FREQ_RES)
    resp = np.exp(1j * rng.uniform(-3, 3, (NSUB, FREQ_RES)))
    cst = MegaConstants(plan, resp, dtype=np.float64,
                        unpack_scale=scale, unpack_offset=offset)
    P, pb = build_megafil(plan, cst, NPART, passband=True)(jnp.asarray(raw))

    fb = FilterbankPlan(real_input=True, nchan_subband=NSUB,
                        freq_res=FREQ_RES, nfilt_pos=plan.nfilt_pos,
                        nfilt_neg=plan.nfilt_neg)
    x = unpack_fixed(jnp.asarray(raw), 8, 1, NPOL, 1)
    spec = forward_spectra_chunked(x, fb, NPART)
    pb_ref = np.asarray(jnp.sum(spec[0] ** 2 + spec[1] ** 2, axis=2))
    assert np.abs(np.asarray(pb) - pb_ref).max() / np.abs(pb_ref).max() < 2e-5


@pytest.mark.parametrize("real_input", [True, False])
def test_megafil_conv_nsub1_matches_overlap_save(real_input):
    """nsub == 1 front end == ops.convolution.overlap_save_convolve — the
    pure coherent-dedispersion pipeline (no filterbank) on the fused path."""
    from dspsr_tpu.ops.convolution import OverlapSavePlan, overlap_save_convolve
    from dspsr_tpu.ops.response import Response
    from dspsr_tpu.ops.megakernel import MegaConstants, build_megafil
    import dspsr_tpu.ops.sc as sc

    nchan, N = 2, 256
    plan, raw, rng, scale, offset = _front_setup(real_input, 1, N,
                                                 nchan=nchan)
    conv = OverlapSavePlan(real_input, N, plan.nfilt_pos, plan.nfilt_neg)
    resp_nat = np.exp(1j * rng.uniform(-3, 3, (nchan, N)))
    cst = MegaConstants(plan, resp_nat, dtype=np.float64,
                        unpack_scale=scale, unpack_offset=offset)
    vr, vi = build_megafil(plan, cst, NPART, output="voltage")(
        jnp.asarray(raw))

    x = unpack_fixed(jnp.asarray(raw), 8, nchan, NPOL,
                     1 if real_input else 2)
    rf = Response(phasors=resp_nat, impulse_pos=plan.nfilt_pos,
                  impulse_neg=plan.nfilt_neg
                  ).fft_order(complex_input=not real_input)
    rfr, rfi = sc.from_numpy(rf)
    y = overlap_save_convolve(x, (jnp.asarray(rfr), jnp.asarray(rfi)),
                              conv, NPART)
    den = np.abs(np.asarray(y[0])).max()
    assert np.abs(np.asarray(vr) - np.asarray(y[0])).max() / den < 2e-5
    assert np.abs(np.asarray(vi) - np.asarray(y[1])).max() / den < 2e-5


@pytest.mark.parametrize("real_input", [True, False])
def test_megafil_jones_matches_matrix_convolution(real_input):
    """In-kernel 2x2 Jones mix == overlap_save_convolve_jones (matrix
    convolution, Convolution.C:425-436) at nsub == 1."""
    from dspsr_tpu.ops.convolution import (
        OverlapSavePlan, overlap_save_convolve_jones)
    from dspsr_tpu.ops.response import Response
    from dspsr_tpu.ops.polncal import jones_fft_order
    from dspsr_tpu.ops.megakernel import MegaConstants, build_megafil

    nchan, N = 2, 256
    plan, raw, rng, scale, offset = _front_setup(real_input, 1, N,
                                                 nchan=nchan)
    conv = OverlapSavePlan(real_input, N, plan.nfilt_pos, plan.nfilt_neg)
    jones_nat = (rng.normal(size=(nchan, N, 2, 2))
                 + 1j * rng.normal(size=(nchan, N, 2, 2))) * 0.5
    cst = MegaConstants(plan, None, dtype=np.float64, unpack_scale=scale,
                        unpack_offset=offset, jones=jones_nat)
    vr, vi = build_megafil(plan, cst, NPART, output="voltage")(
        jnp.asarray(raw))

    x = unpack_fixed(jnp.asarray(raw), 8, nchan, NPOL,
                     1 if real_input else 2)
    resp = Response(phasors=jones_nat.astype(np.complex64),
                    impulse_pos=plan.nfilt_pos, impulse_neg=plan.nfilt_neg)
    jf = jones_fft_order(resp, complex_input=not real_input)
    y = overlap_save_convolve_jones(x, jf, conv, NPART)
    den = np.abs(np.asarray(y[0])).max()
    assert np.abs(np.asarray(vr) - np.asarray(y[0])).max() / den < 1e-4
    assert np.abs(np.asarray(vi) - np.asarray(y[1])).max() / den < 1e-4


def test_megafil_jones_reference_fold():
    """mega_reference with a Jones response folds the same profile as the
    Jones voltage front end + XLA detect + fold (filterbank geometry)."""
    import dataclasses
    from dspsr_tpu.ops.detection import detect as _detect
    from dspsr_tpu.observation import Signal as Sig
    from dspsr_tpu.ops.megakernel import (
        MegaConstants, build_megafil, mega_reference)

    plan, raw, rng, scale, offset = _front_setup(True, NSUB, FREQ_RES)
    jones_nat = (rng.normal(size=(1, NSUB * FREQ_RES, 2, 2))
                 + 1j * rng.normal(size=(1, NSUB * FREQ_RES, 2, 2))) * 0.5
    cst = MegaConstants(plan, None, dtype=np.float64, unpack_scale=scale,
                        unpack_offset=offset, jones=jones_nat)
    vr, vi = build_megafil(plan, cst, NPART, output="voltage")(
        jnp.asarray(raw))
    phi0 = rng.uniform(0, 1, NPART)
    dphi = np.full(NPART, 0.013)
    pr, hr = mega_reference(raw, dataclasses.replace(plan, npol_out=1),
                            cst, phi0, dphi, NPART)
    dj = _detect((vr, vi), Sig.INTENSITY)
    fp = FoldPlan(nbin=NBIN, seg_len=plan.nkeep)
    pf, ht = fold_block(
        jnp.zeros((NSUB, 1, NBIN), jnp.float32),
        jnp.zeros((NSUB, NBIN), jnp.float32), jnp.asarray(dj),
        jnp.ones((NSUB, NPART * plan.nkeep), jnp.float32),
        jnp.asarray(phi0, jnp.float32), jnp.asarray(dphi, jnp.float32), fp)
    pf = np.asarray(pf)
    assert np.abs(pr[0].transpose(1, 0, 2) - pf).max() / np.abs(pf).max() \
        < 2e-5


# ---- round-4 generality: fixed-level sub-byte + two's-complement codes ----


@pytest.mark.parametrize("nbit,twos", [
    (1, False), (2, False), (2, True), (4, True)])
def test_subbyte_fixed_reference_matches_xla_chain(nbit, twos):
    """Fixed-level (BitTable) 1/2-bit and two's-complement 2/4-bit codes:
    the f64 reference's affine in-kernel unpack equals the XLA chain's
    ``unpack_fixed`` through the filterbank fold."""
    rng = np.random.default_rng(40 + nbit + twos)
    fb0 = FilterbankPlan(real_input=True, nchan_subband=NSUB,
                         freq_res=FREQ_RES, nfilt_pos=5, nfilt_neg=6)
    plan = MegaPlan.from_filterbank(fb0, nbin=NBIN, npol=NPOL, npol_out=1,
                                    nbit=nbit, twos_complement=twos)
    assert plan is not None and plan.npw == 0
    fb = FilterbankPlan(real_input=True, nchan_subband=NSUB,
                        freq_res=FREQ_RES, nfilt_pos=plan.nfilt_pos,
                        nfilt_neg=plan.nfilt_neg)
    ndat = fb.block_ndat(NPART)
    raw = rng.integers(0, 256, size=ndat * NPOL * nbit // 8,
                       dtype=np.uint8)
    resp = np.exp(1j * rng.uniform(-3, 3, (NSUB, FREQ_RES)))
    phi0 = rng.uniform(0, 1, NPART)
    dphi = np.full(NPART, 0.013)
    scale, offset = unpack_affine(nbit, twos)
    cst = MegaConstants(plan, resp, dtype=np.float64,
                        unpack_scale=scale, unpack_offset=offset)
    pr, hr = mega_reference(raw, plan, cst, phi0, dphi, NPART)

    x = unpack_fixed(jnp.asarray(raw), nbit, 1, NPOL, 1,
                     twos_complement=twos)
    rr = jnp.asarray(np.ascontiguousarray(resp.real), jnp.float32)
    ri = jnp.asarray(np.ascontiguousarray(resp.imag), jnp.float32)
    y = filterbank_block(x, fb, NPART, (rr, ri))
    d = np.asarray(detect(y, Signal.INTENSITY))
    fold_plan = FoldPlan(nbin=NBIN, seg_len=plan.nkeep)
    pf, ht = fold_block(
        jnp.zeros((NSUB, 1, NBIN), jnp.float32),
        jnp.zeros((NSUB, NBIN), jnp.float32),
        jnp.asarray(d),
        jnp.ones((NSUB, NPART * plan.nkeep), jnp.float32),
        jnp.asarray(phi0, jnp.float32), jnp.asarray(dphi, jnp.float32),
        fold_plan)
    pf, ht = np.asarray(pf), np.asarray(ht)
    assert np.abs(pr[0].transpose(1, 0, 2) - pf).max() / \
        np.abs(pf).max() < 2e-5
    assert np.abs(hr[0] - ht[0]).max() == 0

    # and the Pallas kernel (interpret) matches the reference
    cst32 = MegaConstants(plan, resp, dtype=np.float32,
                          unpack_scale=scale, unpack_offset=offset)
    step = build_megastep(plan, cst32, NPART, interpret=True)
    pk, hk = step(jnp.zeros((1, 1, NSUB, NBIN), jnp.float32),
                  jnp.zeros((1, NBIN), jnp.float32),
                  jnp.asarray(raw), jnp.asarray(phi0, jnp.float32),
                  jnp.asarray(dphi, jnp.float32))
    pk, hk = np.asarray(pk), np.asarray(hk)
    assert np.abs(pr - pk).max() / np.abs(pr).max() < 2e-5
    assert np.abs(hr - hk).max() == 0


def test_pipeline_fixed_twobit_mega_vs_general(tmp_path, monkeypatch):
    """A fixed-level (dynamic_twobit=False) 2-bit stream engages the fused
    path (plan.npw == 0, no excision weights) and matches the general XLA
    chain numerically (DM=0: identical geometry)."""
    from dspsr_tpu.io.sources import RawFileSource
    from dspsr_tpu.models.load_to_fold import FoldPipeline
    from dspsr_tpu.timing.mjd import MJD

    rng = np.random.default_rng(51)
    obs = Observation(
        nchan=1, npol=2, ndim=2, nbit=2, centre_frequency=1400.0,
        bandwidth=-1.0, rate=RATE, start_time=MJD.from_utc(
            "2010-04-13-02:05:45"),
        state=Signal.ANALYTIC, source="FAKE", telescope="PKS",
        instrument="RAW")
    nsamp = 1 << 16
    raw = rng.integers(0, 256, size=nsamp, dtype=np.uint8)
    path = str(tmp_path / "tbf.raw")
    with open(path, "wb") as f:
        f.write(raw.tobytes())
    cfg = _config(dynamic_twobit=False, min_block_samples=8192,
                  frequency_resolution=1024, dispersion_measure=0.0)
    res = {}
    for tag, off in (("mega", False), ("general", True)):
        if off:
            monkeypatch.setenv("DSPSR_TPU_NO_MEGA", "1")
        else:
            monkeypatch.delenv("DSPSR_TPU_NO_MEGA", raising=False)
        pipe = FoldPipeline(RawFileSource(path, obs), cfg)
        assert (pipe.mega_plan is not None) == (not off), tag
        if pipe.mega_plan is not None:
            assert pipe.mega_plan.npw == 0
            assert pipe.unpack_plan.twobit is None
        res[tag] = pipe.run()
    a, b = res["mega"], res["general"]
    # per-channel hit totals match exactly; per-bin counts may differ by
    # O(1) f32 bin-boundary jitter (different phase-anchor segmenting)
    np.testing.assert_allclose(a.hits.sum(axis=(0, 2)),
                               b.hits.sum(axis=(0, 2)), rtol=0, atol=0)
    pa, pb = a.normalized(), b.normalized()
    assert np.abs(pa - pb).max() / np.abs(pb).max() < 0.05
    corr = [np.corrcoef(pa[0, c, 0], pb[0, c, 0])[0, 1]
            for c in range(pa.shape[1])]
    assert min(corr) > 0.98, corr


def test_twos_complement_dynamic_twobit_falls_back(vela_polyco, tmp_path):
    """A 2-bit two's-complement stream with JA98 dynamic correction
    enabled (the default) must fall back to the XLA chain: the fused
    JA98 path indexes its one-hot level table by offset-binary state
    codes (ADVICE r4 crash: MegaPlan.validate raised mid-construction
    instead of falling back)."""
    from dspsr_tpu.io.sources import DummySource
    from dspsr_tpu.models.load_to_fold import FoldPipeline, FoldConfig
    from dspsr_tpu.observation import Observation, Signal
    from dspsr_tpu.timing.mjd import MJD

    obs = Observation(
        nchan=1, npol=2, ndim=1, nbit=2, centre_frequency=1382.0,
        bandwidth=-400.0, rate=800e6,
        start_time=MJD.from_utc("2010-04-13-02:05:45"),
        state=Signal.NYQUIST, source="J0437-4715", telescope="PKS",
        instrument="DUMMY").replace(ndat=1 << 24)
    base = dict(polyco_path="/root/reference/Benchmark/polyco.dat",
                dispersion_measure=2.64, nchan=64, nbin=64,
                frequency_resolution=65536)
    pipe = FoldPipeline(DummySource(obs),
                        FoldConfig(twos_complement=True, **base))
    assert pipe.mega_mode is None  # XLA chain, no crash
    pipe2 = FoldPipeline(DummySource(obs),
                         FoldConfig(twos_complement=False, **base))
    assert pipe2.mega_mode is not None  # offset-binary stays fused
