"""Hybrid fused-step parity: the megafil voltage front end + the general
XLA tail must reproduce the pure XLA chain for every config it newly
covers (in-stream SK, cyclic folding, multi-pulsar folds, passband taps,
dump taps, nsub == 1 pure convolution, Jones calibration, float32 input).

Framing note: the mega plan rounds the overlap discard up to whole
8q-sample rows; at matched framing (nfilt already aligned — dm=36.5,
freq_res=128, nchan=4 below) the two engines fold IDENTICAL sample sets
and parity is exact (~1e-7).  Where rounding bites (nsub == 1 always
rounds to 8*R2), the engines legitimately fold slightly different sample
sets and each window carries different cyclic-wrap leakage, so those
configs compare normalized profiles + pulse position (kernel-level
exactness at matched framing is proven in test_megakernel).
"""

import os

import numpy as np
import pytest

from dspsr_tpu.observation import Observation, Signal
from dspsr_tpu.timing.mjd import MJD

RATE = 2e6


def _write(tmp_path, name, arr):
    p = str(tmp_path / name)
    with open(p, "wb") as f:
        f.write(np.ascontiguousarray(arr).tobytes())
    return p


@pytest.fixture(scope="module")
def hybrid_data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hybrid")
    rng = np.random.default_rng(5)
    ndat = 1 << 16
    t = np.arange(ndat) / RATE
    noise = rng.normal(0, 10, (ndat, 2))
    noise[(t % 0.005) < 0.00025] *= 4.0
    raw = np.clip(np.round(noise + 127.5), 0, 255).astype(np.uint8)
    p1 = _write(tmp, "hyb.raw", raw)

    noise2 = rng.normal(0, 10, (ndat, 2, 2, 2))  # [t, chan, pol, dim]
    noise2[(t % 0.005) < 0.00025] *= 4.0
    raw2 = np.clip(np.round(noise2 + 127.5), 0, 255).astype(np.uint8)
    p2 = _write(tmp, "hyb2.raw", raw2)
    return p1, p2


def _obs(**kw):
    base = dict(nchan=1, npol=2, ndim=1, nbit=8, centre_frequency=1400.0,
                bandwidth=-2.0, rate=RATE,
                start_time=MJD.from_utc("2010-04-13-02:05:45"),
                state=Signal.NYQUIST, source="FAKE", telescope="PKS",
                instrument="RAW")
    base.update(kw)
    return Observation(**base)


def _run(path, cfgkw, obskw=None, nomega=False, monkeypatch=None):
    from dspsr_tpu.io.sources import RawFileSource
    from dspsr_tpu.models.load_to_fold import FoldConfig, FoldPipeline

    if nomega:
        monkeypatch.setenv("DSPSR_TPU_NO_MEGA", "1")
    elif monkeypatch is not None:
        monkeypatch.delenv("DSPSR_TPU_NO_MEGA", raising=False)
    # dm=36.5 / freq_res=128 / nchan=4: the mega overlap rounding is a
    # no-op, so both engines share the exact window framing
    base = dict(folding_period=0.005, dispersion_measure=36.5, nchan=4,
                frequency_resolution=128, nbin=32, block_parts=2,
                min_block_samples=0, digitizer_stats=False)
    base.update(cfgkw)
    src = RawFileSource(path, _obs(**(obskw or {})))
    pipe = FoldPipeline(src, FoldConfig(**base))
    return pipe, pipe.run()


def _max_err(a, b):
    if isinstance(a, (tuple, list)):
        return max(_max_err(x, y) for x, y in zip(a, b))
    a, b = np.asarray(a), np.asarray(b)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-30))


@pytest.mark.parametrize("tag,cfgkw", [
    ("sk", dict(sk_enable=True, sk_m=512)),
    ("cyclic", dict(cyclic_nchan=4, cyclic_mover=1)),
    ("multi_pulsar", dict(additional_pulsars=(0.003,))),
    ("passband", dict(passband=True)),
])
def test_hybrid_exact_parity(hybrid_data, monkeypatch, tag, cfgkw):
    """Matched-framing configs: hybrid == XLA chain to float noise."""
    p1, _ = hybrid_data
    pipe_h, res_h = _run(p1, cfgkw, monkeypatch=monkeypatch)
    assert pipe_h.mega_mode == "hybrid", tag
    pipe_x, res_x = _run(p1, cfgkw, nomega=True, monkeypatch=monkeypatch)
    assert pipe_x.mega_mode is None
    assert _max_err(res_h.profiles, res_x.profiles) < 1e-4, tag
    assert _max_err(res_h.hits, res_x.hits) < 1e-4, tag
    if tag == "passband":
        assert res_h.passband is not None
        assert _max_err(res_h.passband, res_x.passband) < 1e-4


def test_hybrid_dump_tap(hybrid_data, tmp_path, monkeypatch):
    """--dump through the hybrid path writes the same detected stream."""
    p1, _ = hybrid_data
    d_h = str(tmp_path / "h.dump")
    d_x = str(tmp_path / "x.dump")
    pipe_h, _ = _run(p1, dict(dump_path=d_h), monkeypatch=monkeypatch)
    assert pipe_h.mega_mode == "hybrid"
    _run(p1, dict(dump_path=d_x), nomega=True, monkeypatch=monkeypatch)
    a = np.fromfile(d_h, np.float32, offset=4096)
    b = np.fromfile(d_x, np.float32, offset=4096)
    assert a.size == b.size and a.size > 0
    assert np.abs(a - b).max() / (np.abs(b).max() + 1e-30) < 1e-4


def test_hybrid_conv_nsub1(hybrid_data, monkeypatch):
    """nsub == 1 (already-channelized input, pure coherent dedispersion
    per channel) rides the fused front end; rounding makes the framings
    differ, so compare normalized profiles + pulse position."""
    _, p2 = hybrid_data
    obskw = dict(nchan=2, ndim=2, state=Signal.ANALYTIC, rate=RATE / 2)
    cfgkw = dict(nchan=2, frequency_resolution=1024, dispersion_measure=5.0)
    pipe_h, res_h = _run(p2, cfgkw, obskw, monkeypatch=monkeypatch)
    assert pipe_h.mega_mode == "hybrid"
    assert pipe_h.conv_plan is not None and pipe_h.fb_plan is None
    pipe_x, res_x = _run(p2, cfgkw, obskw, nomega=True,
                         monkeypatch=monkeypatch)
    n_h, n_x = res_h.normalized(), res_x.normalized()
    assert _max_err(n_h, n_x) < 2e-2
    ph = np.argmax(n_h[0].sum(axis=(0, 1)))
    px = np.argmax(n_x[0].sum(axis=(0, 1)))
    assert ph == px


def test_hybrid_float32_input(tmp_path, monkeypatch):
    """nbit == 32 float input engages the fused path (full mode: the
    megastep kernel handles float windows natively)."""
    from dspsr_tpu.io.sources import RawFileSource
    from dspsr_tpu.models.load_to_fold import FoldConfig, FoldPipeline

    rng = np.random.default_rng(9)
    ndat = 1 << 14
    t = np.arange(ndat) / RATE
    x = rng.normal(0, 1, (ndat, 2)).astype(np.float32)
    x[(t % 0.005) < 0.00025] *= 4.0
    path = _write(tmp_path, "f32.raw", x)
    obs = _obs(nbit=32)

    cfg = FoldConfig(folding_period=0.005, dispersion_measure=36.5, nchan=4,
                     frequency_resolution=128, nbin=32, block_parts=2,
                     min_block_samples=0, digitizer_stats=False)
    monkeypatch.delenv("DSPSR_TPU_NO_MEGA", raising=False)
    pipe = FoldPipeline(RawFileSource(path, obs), cfg)
    assert pipe.mega_mode == "full"
    res = pipe.run()
    monkeypatch.setenv("DSPSR_TPU_NO_MEGA", "1")
    pipe_x = FoldPipeline(RawFileSource(path, obs), cfg)
    res_x = pipe_x.run()
    assert _max_err(res.profiles, res_x.profiles) < 1e-4
    assert _max_err(res.hits, res_x.hits) < 1e-4


def test_hybrid_jones_engages(tmp_path, monkeypatch):
    """A calibration_path config rides the hybrid path (in-kernel Jones
    2x2 mix) and still removes the instrumental leakage."""
    from dspsr_tpu.io.sources import RawFileSource
    from dspsr_tpu.models.load_to_fold import FoldConfig, FoldPipeline

    rng = np.random.default_rng(11)
    nsamp = 1 << 14
    obs = _obs(nchan=1, ndim=2, state=Signal.ANALYTIC, rate=RATE / 2)
    clean = rng.normal(0, 1.0, (2, nsamp)) + 1j * rng.normal(0, 1.0, (2, nsamp))
    # instrumental mixing, constant across the band
    J = np.array([[1.0, 0.35 + 0.1j], [-0.2j, 0.9]], np.complex128)
    corrupted = np.einsum("ab,bt->at", J, clean)
    tfp = np.empty((nsamp, 2, 2), np.float32)
    tfp[:, :, 0] = corrupted.real.T
    tfp[:, :, 1] = corrupted.imag.T
    path = _write(tmp_path, "leaky.raw", tfp)
    f_lo = obs.centre_frequency - abs(obs.bandwidth)
    f_hi = obs.centre_frequency + abs(obs.bandwidth)
    freqs = np.linspace(f_lo, f_hi, 16)
    np.savez(tmp_path / "cal.npz", freq=freqs,
             jones=np.broadcast_to(J, (16, 2, 2)))

    monkeypatch.delenv("DSPSR_TPU_NO_MEGA", raising=False)
    obs32 = obs.replace(nbit=32)
    cfg = FoldConfig(folding_period=1e-3, nbin=16, nchan=1, npol_out=4,
                     calibration_path=str(tmp_path / "cal.npz"),
                     frequency_resolution=512, min_block_samples=0,
                     digitizer_stats=False)
    pipe = FoldPipeline(RawFileSource(path, obs32), cfg)
    assert pipe.mega_mode == "hybrid"
    assert pipe._jones_natural is not None
    res = pipe.run()
    prof = np.asarray(res.profiles)[0, 0]  # [4 Stokes, nbin]
    leak = np.sqrt(prof[1] ** 2 + prof[2] ** 2 + prof[3] ** 2).mean()
    assert leak / prof[0].mean() < 0.05

    # and it matches the XLA matrix-convolution chain
    monkeypatch.setenv("DSPSR_TPU_NO_MEGA", "1")
    pipe_x = FoldPipeline(RawFileSource(path, obs32), cfg)
    assert pipe_x.mega_mode is None
    res_x = pipe_x.run()
    assert _max_err(res.normalized(), res_x.normalized()) < 2e-2


def test_full_mode_still_engages(hybrid_data, monkeypatch):
    """The flagship-style config keeps the fully-fused fold kernel."""
    p1, _ = hybrid_data
    monkeypatch.delenv("DSPSR_TPU_NO_MEGA", raising=False)
    pipe, res = _run(p1, dict())
    assert pipe.mega_mode == "full"
    assert np.isfinite(np.asarray(res.profiles)).all()


def test_pdmp_stats_extras(hybrid_data, monkeypatch):
    """-Y pdmp extras: running moments of the detected stream accumulate
    to the same values on the hybrid and XLA engines and match numpy."""
    p1, _ = hybrid_data
    pipe_h, res_h = _run(p1, dict(pdmp_stats=True), monkeypatch=monkeypatch)
    assert pipe_h.mega_mode == "hybrid"
    pipe_x, res_x = _run(p1, dict(pdmp_stats=True), nomega=True,
                         monkeypatch=monkeypatch)
    assert res_h.pdmp_stats is not None and res_x.pdmp_stats is not None
    assert res_h.pdmp_nsamp == res_x.pdmp_nsamp > 0
    assert _max_err(res_h.pdmp_stats, res_x.pdmp_stats) < 1e-4
    # S1/nsamp is the mean detected power: positive and finite
    mean = res_h.pdmp_stats[..., 0] / res_h.pdmp_nsamp
    assert np.isfinite(mean).all() and (mean > 0).all()


def test_nthpower_detection(hybrid_data, monkeypatch):
    """-d 3: (PP+QQ)^2 folds on the hybrid path and equals the squared
    intensity of the same stream (reference Signal::NthPower,
    Detection.C:48)."""
    import jax.numpy as jnp
    from dspsr_tpu.ops.detection import detect
    from dspsr_tpu.observation import Signal as Sig

    rng = np.random.default_rng(2)
    x = (jnp.asarray(rng.normal(size=(3, 2, 64)).astype(np.float32)),
         jnp.asarray(rng.normal(size=(3, 2, 64)).astype(np.float32)))
    nth = np.asarray(detect(x, Sig.NTHPOWER))
    i = np.asarray(detect(x, Sig.INTENSITY))
    assert np.allclose(nth, i * i, rtol=1e-6)

    p1, _ = hybrid_data
    pipe_h, res_h = _run(p1, dict(npol_out=3), monkeypatch=monkeypatch)
    assert pipe_h.mega_mode == "hybrid"
    assert res_h.obs.state == Signal.NTHPOWER
    pipe_x, res_x = _run(p1, dict(npol_out=3), nomega=True,
                         monkeypatch=monkeypatch)
    assert _max_err(res_h.profiles, res_x.profiles) < 1e-4
