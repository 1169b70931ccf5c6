"""Search-mode (digifil equivalent) tests: scrunch/rescale ops, digitizer,
SIGPROC round trip, end-to-end filterbank file creation."""

import numpy as np
import jax.numpy as jnp
import pytest

from dspsr_tpu.observation import Observation, Signal
from dspsr_tpu.ops.scrunch import (
    tscrunch, fscrunch, pscrunch, poln_select, fzoom,
    update_observation_fzoom,
)
from dspsr_tpu.ops.rescale import RescaleState, rescale_block, state_mean_scale
from dspsr_tpu.models.load_to_fil import FilConfig, FilPipeline, digitize, load_to_fil
from dspsr_tpu.io.sigproc import (
    read_sigproc_header, observation_from_sigproc, SigProcWriter,
)
from dspsr_tpu.io.sources import open_source
from test_pipeline import synth_pulsar_dada, PERIOD, RATE, CF, BW, DM, PULSE_PHASE


class TestScrunch:
    def test_tscrunch_sums(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 1, 16)).astype(np.float32))
        y = np.asarray(tscrunch(x, 4))
        assert y.shape == (2, 1, 4)
        np.testing.assert_allclose(
            y, np.asarray(x).reshape(2, 1, 4, 4).sum(-1), rtol=1e-6)

    def test_fscrunch_sums(self, rng):
        x = jnp.asarray(rng.standard_normal((8, 2, 4)).astype(np.float32))
        y = np.asarray(fscrunch(x, 2))
        assert y.shape == (4, 2, 4)
        np.testing.assert_allclose(
            y, np.asarray(x).reshape(4, 2, 2, 4).sum(1), rtol=1e-6)

    def test_pscrunch(self, rng):
        x = jnp.asarray(rng.standard_normal((3, 2, 5)).astype(np.float32))
        y = np.asarray(pscrunch(x))
        np.testing.assert_allclose(y[:, 0], np.asarray(x).sum(1), rtol=1e-6)

    def test_fzoom_metadata(self):
        obs = Observation(nchan=8, centre_frequency=1400.0, bandwidth=80.0)
        out = update_observation_fzoom(obs, 2, 4)
        assert out.nchan == 4
        assert out.bandwidth == 40.0
        # channels 2..5 of 8: centres 1385,1395,1405,1415 -> cf 1400... no:
        # lower edge 1360, width 10, c2=1385, c5=1415 -> centre 1400
        assert out.centre_frequency == 1400.0


class TestRescale:
    def test_normalizes(self, rng):
        x = (rng.standard_normal((2, 2, 4096)) * 5 + 11).astype(np.float32)
        st = RescaleState.zeros(2, 2)
        st, y = rescale_block(st, jnp.asarray(x))
        y = np.asarray(y)
        assert abs(y.mean()) < 0.05
        assert abs(y.std() - 1) < 0.05

    def test_freeze(self, rng):
        x1 = rng.standard_normal((1, 1, 1024)).astype(np.float32)
        st = RescaleState.zeros(1, 1)
        st, _ = rescale_block(st, jnp.asarray(x1))
        m0, s0 = state_mean_scale(st)
        st2, _ = rescale_block(st, jnp.asarray(x1 * 100), freeze=True)
        m1, s1 = state_mean_scale(st2)
        np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))


class TestDigitizer:
    def test_8bit_roundtrip(self, rng):
        y = rng.standard_normal((4, 1, 256)).astype(np.float32)
        packed = np.asarray(digitize(jnp.asarray(y), 8, 127.5, 32.0))
        assert packed.dtype == np.uint8
        # unpack: TFP order, chan fastest
        vals = (packed.astype(np.float64) - 127.5) / 32.0
        vals = vals.reshape(256, 1, 4).transpose(2, 1, 0)
        np.testing.assert_allclose(vals, y, atol=0.5 / 32.0 + 1e-6)

    def test_2bit_packing(self):
        y = jnp.asarray(np.array([[[-5.0, -0.1, 0.1, 5.0]]], np.float32))
        packed = np.asarray(digitize(y, 2, 1.5, 1.0))
        # values -> codes 0,1,2,3 -> MSB first byte 0b00011011
        assert packed.tolist() == [0b00011011]

    def test_float32_passthrough(self, rng):
        y = rng.standard_normal((2, 1, 8)).astype(np.float32)
        packed = np.asarray(digitize(jnp.asarray(y), 32, 0.0, 1.0))
        vals = packed.view(np.float32).reshape(8, 1, 2).transpose(2, 1, 0)
        np.testing.assert_array_equal(vals, y)


class TestSigProc:
    def test_header_roundtrip(self, tmp_path):
        obs = Observation(
            nchan=32, npol=1, ndim=1, nbit=8,
            centre_frequency=1400.0, bandwidth=-64.0, rate=1e4,
            state=Signal.INTENSITY, source="TESTPSR", telescope="PKS",
        )
        p = str(tmp_path / "t.fil")
        w = SigProcWriter(p, obs, 8)
        w.write_block(np.arange(64, dtype=np.uint8))
        w.close()
        items, hdr_size = read_sigproc_header(p)
        assert items["nchans"] == 32
        assert items["nbits"] == 8
        assert items["source_name"] == "TESTPSR"
        assert items["foff"] == pytest.approx(-2.0)
        back = observation_from_sigproc(p)
        assert back.nchan == 32
        assert abs(back.centre_frequency - 1400.0) < 1e-9
        assert abs(back.bandwidth - (-64.0)) < 1e-9
        assert abs(back.rate - 1e4) < 1e-6


class TestLoadToFil:
    @pytest.fixture(scope="class")
    def psr_file(self, tmp_path_factory):
        p = tmp_path_factory.mktemp("fil") / "psr.dada"
        return synth_pulsar_dada(str(p), nsec=0.2)

    def test_end_to_end(self, psr_file, tmp_path):
        out = str(tmp_path / "out.fil")
        cfg = FilConfig(nchan=32, dispersion_measure=0.0, tscrunch_factor=4,
                        nbits=8, block_parts=4)
        obs_out = load_to_fil(psr_file, out, cfg)
        assert obs_out.nchan == 32
        items, hdr = read_sigproc_header(out)
        assert items["nchans"] == 32
        import os
        payload = os.path.getsize(out) - hdr
        nsamp = payload // 32
        assert nsamp > 0
        # pulse visible in the time series: fold the output file by the period
        data = np.fromfile(out, np.uint8, offset=hdr).reshape(nsamp, 32)
        ts = data.astype(np.float64).sum(1)
        tsamp = items["tsamp"]
        phases = ((np.arange(nsamp) * tsamp / PERIOD) % 1.0)
        on = ts[np.abs(phases - PULSE_PHASE) < 0.05].mean()
        off = ts[np.abs(phases - (PULSE_PHASE + 0.5) % 1.0) < 0.2].mean()
        assert on > off + 3 * ts.std() / np.sqrt(len(ts)), (on, off)

    def test_coherent_dedispersing_filterbank(self, psr_file, tmp_path):
        """digifil -D: chirp inside the channelizer sharpens the pulse."""
        out_c = str(tmp_path / "coh.fil")
        out_i = str(tmp_path / "inc.fil")
        cfg_c = FilConfig(nchan=16, dispersion_measure=DM, tscrunch_factor=1,
                          nbits=32, block_parts=2)
        cfg_i = FilConfig(nchan=16, dispersion_measure=0.0, tscrunch_factor=1,
                          nbits=32, block_parts=2,
                          frequency_resolution=cfg_c.frequency_resolution)
        load_to_fil(psr_file, out_c, cfg_c)
        load_to_fil(psr_file, out_i, cfg_i)

        def profile(path):
            items, hdr = read_sigproc_header(path)
            d = np.fromfile(path, np.float32, offset=hdr)
            nch = items["nchans"]
            d = d.reshape(-1, nch)
            # incoherently align channels before summing (both files equally)
            from dspsr_tpu.ops.dedispersion import delay_time
            obs = observation_from_sigproc(path)
            ts = np.zeros(d.shape[0])
            tsamp = items["tsamp"]
            for c in range(nch):
                dly = delay_time(DM, obs.centre_frequency_of(c), obs.centre_frequency)
                shift = int(round(dly / tsamp))
                ts += np.roll(d[:, c], -shift)
            ph = (np.arange(len(ts)) * tsamp / PERIOD) % 1.0
            prof = np.zeros(64)
            for b in range(64):
                m = (ph >= b / 64) & (ph < (b + 1) / 64)
                prof[b] = ts[m].mean()
            return prof

        pc = profile(out_c)
        pi = profile(out_i)
        contrast_c = (pc.max() - np.median(pc)) / pc.std()
        contrast_i = (pi.max() - np.median(pi)) / pi.std()
        assert contrast_c > contrast_i, (contrast_c, contrast_i)


class TestPolyphaseChannelizer:
    def test_pfb_fil(self, tmp_path):
        src = synth_pulsar_dada(str(tmp_path / "pfb.dada"), nsec=0.05, dm=0.0)
        out = str(tmp_path / "pfb.fil")
        cfg = FilConfig(nchan=16, channelizer="polyphase", pfb_ntaps=8,
                        nbits=8, tscrunch_factor=4)
        obs = load_to_fil(src, out, cfg)
        assert obs.nchan == 16
        items, hdr = read_sigproc_header(out)
        assert items["nchans"] == 16
        import os
        assert os.path.getsize(out) > hdr

    def test_pfb_rejects_coherent(self, tmp_path):
        src = synth_pulsar_dada(str(tmp_path / "pfb2.dada"), nsec=0.01)
        with pytest.raises(ValueError):
            load_to_fil(src, "/tmp/x.fil",
                        FilConfig(nchan=8, channelizer="polyphase",
                                  dispersion_measure=1.0))
