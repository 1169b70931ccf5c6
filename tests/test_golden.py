"""Golden-model test: the device pipeline vs an independent float64 numpy
reference implementation of the whole chain.

The numpy model below re-implements unpack -> frame -> rfft/fft -> chirp
multiply -> per-subband inverse FFT -> detection -> fold directly from the
conventions documented in the op docstrings (and ultimately from the
reference's C++), sharing no code with the device path except the chirp
construction (host numpy in both).  Agreement to float32 tolerances over a
random block validates every ordering/offset/normalization decision at once.
"""

import numpy as np
import pytest

from dspsr_tpu.observation import Observation, Signal
from dspsr_tpu.timing.mjd import MJD
from dspsr_tpu.timing.polyco import FixedPeriodPredictor
from dspsr_tpu.io.dada import format_ascii_header
from dspsr_tpu.models.load_to_fold import FoldConfig, FoldPipeline
from dspsr_tpu.io.sources import RawFileSource, observation_from_keyvals
from dspsr_tpu.unpack.bittable import BitTable


RATE = 2e6
CF, BW = 1400.0, 2.0
PERIOD = 0.004


def make_obs_and_file(tmp_path, ndat, seed=11):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 256, ndat * 2 * 2).astype(np.uint8)  # 2 pol complex
    p = str(tmp_path / "g.raw")
    with open(p, "wb") as f:
        f.write(q.tobytes())
    obs = observation_from_keyvals([
        f"FREQ={CF}", f"BW={BW}", "NCHAN=1", "NPOL=2", "NDIM=2", "NBIT=8",
        f"TSAMP={1e6 / RATE}", "UTC_START=2010-04-13-02:05:45",
        "SOURCE=GOLD"])
    return p, q


def golden_fold(q, dm, nchan, freq_res, nfp, nfn, npart, nbin, seg_len,
                predictor, start_time, ref_phase=0.0):
    """Independent float64 reference of the convolving-filterbank fold."""
    from dspsr_tpu.ops.dedispersion import Dedispersion

    # unpack: offset-binary uniform levels
    table = BitTable(8).values.astype(np.float64)
    vals = table[q]
    tfp = vals.reshape(-1, 1, 2, 2)  # [t, chan, pol, dim]
    x = (tfp[:, 0, :, 0] + 1j * tfp[:, 0, :, 1]).T  # [pol, t]

    nsamp_fft = nchan * freq_res
    step = nsamp_fft - (nfp + nfn) * nchan
    ded = Dedispersion.build(dm, CF, BW, nchan, freq_res)
    # frame + FFT + natural order (complex input: fftshift)
    nkeep = freq_res - nfp - nfn
    out = np.zeros((nchan, 2, npart * nkeep), np.complex128)
    for p in range(npart):
        for pol in range(2):
            w = x[pol, p * step : p * step + nsamp_fft]
            spec = np.fft.fftshift(np.fft.fft(w))
            chunks = spec.reshape(nchan, freq_res) * ded.phasors.astype(np.complex128)
            sub = np.fft.ifft(np.fft.ifftshift(chunks, axes=1), axis=1)
            out[:, pol, p * nkeep : (p + 1) * nkeep] = sub[:, nfp : nfp + nkeep]

    det = np.abs(out[:, 0]) ** 2 + np.abs(out[:, 1]) ** 2  # intensity [nchan, T]
    T = det.shape[1]
    rate_out = RATE / nchan

    profiles = np.zeros((nchan, nbin))
    hits = np.zeros((nchan, nbin))
    # EVERY output sample folds (the pipeline zero-weight-pads the trailing
    # partial segment instead of dropping it; reference folds whole blocks)
    nseg = -(-T // seg_len)
    for s in range(nseg):
        t0 = start_time + nfp / rate_out + (s * seg_len) / rate_out
        phi0 = np.float32((predictor.fracturns(t0) - ref_phase) % 1.0)
        dphi = np.float32(1.0 / rate_out * predictor.frequency(t0))
        for k in range(seg_len):
            t = s * seg_len + k
            if t >= T:
                break
            phi = np.float32(phi0) + np.float32(dphi) * np.float32(k)
            frac = phi - np.floor(phi)
            ibin = min(int(frac * nbin), nbin - 1)
            hits[:, ibin] += 1
            profiles[:, ibin] += det[:, t]
    return profiles, hits


@pytest.mark.parametrize("nchan,freq_res", [(4, 64), (1, 256)])
def test_pipeline_matches_golden_model(tmp_path, nchan, freq_res):
    dm = 0.02 if nchan > 1 else 0.005
    ndat = 1 << 15
    p, q = make_obs_and_file(tmp_path, ndat)
    obs = observation_from_keyvals([
        f"FREQ={CF}", f"BW={BW}", "NCHAN=1", "NPOL=2", "NDIM=2", "NBIT=8",
        f"TSAMP={1e6 / RATE}", "UTC_START=2010-04-13-02:05:45",
        "SOURCE=GOLD"])
    src = RawFileSource(p, obs)

    nbin, seg = 32, 512
    cfg = FoldConfig(
        folding_period=PERIOD, dispersion_measure=dm, nchan=nchan,
        frequency_resolution=freq_res, nbin=nbin, seg_len=seg,
        block_parts=2, min_block_samples=1)
    pipe = FoldPipeline(src, cfg)
    plan = pipe.fb_plan if pipe.fb_plan is not None else pipe.conv_plan
    res = pipe.run(max_blocks=1)

    # geometry for the golden model mirrors the pipeline's plan
    if pipe.fb_plan is not None:
        nfp, nfn = plan.nfilt_pos, plan.nfilt_neg
        fr = plan.freq_res
    else:
        nfp, nfn = plan.nfilt_pos, plan.nfilt_neg
        fr = plan.n_fft
    npart = pipe.npart
    gp, gh = golden_fold(
        q[: plan.block_ndat(npart) * 4], dm, nchan, fr, nfp, nfn,
        npart, nbin, pipe.fold_plan.seg_len,
        pipe.predictor, obs.start_time)

    np.testing.assert_allclose(res.hits[0], gh, atol=1.5)
    scale = np.abs(gp).max()
    np.testing.assert_allclose(res.profiles[0, :, 0], gp,
                               rtol=5e-3, atol=5e-3 * scale)
