"""Native host I/O runtime tests (prefetch reader + SHM ring)."""

import os
import threading
import time

import numpy as np
import pytest

from dspsr_tpu.io.hostio import (
    load_hostio, PrefetchSource, RingWriter, RingReader,
)
from dspsr_tpu.io.sources import open_source
from dspsr_tpu.observation import Observation, Signal
from dspsr_tpu.timing.mjd import MJD
from test_pipeline import synth_pulsar_dada, RATE


@pytest.fixture(scope="module")
def lib():
    return load_hostio()


class TestPrefetch:
    def test_matches_direct_reads(self, lib, tmp_path):
        p = synth_pulsar_dada(str(tmp_path / "pf.dada"), nsec=0.05)
        direct = open_source(p)
        block, stride = 40000, 32000  # overlapping blocks
        pf = PrefetchSource(open_source(p), block, stride)
        start = 0
        n = 0
        while start + block <= direct.total_samples:
            a = pf.read_samples(start, block)
            b = direct.read_samples(start, block)
            np.testing.assert_array_equal(a, b)
            start += stride
            n += 1
        assert n >= 3
        pf.close()

    def test_fallback_random_access(self, lib, tmp_path):
        p = synth_pulsar_dada(str(tmp_path / "pf2.dada"), nsec=0.02)
        direct = open_source(p)
        pf = PrefetchSource(open_source(p), 8192, 8192)
        np.testing.assert_array_equal(
            pf.read_samples(5000, 100), direct.read_samples(5000, 100))
        pf.close()

    def test_eof_zero_padding(self, lib, tmp_path):
        p = synth_pulsar_dada(str(tmp_path / "pf3.dada"), nsec=0.01)
        src = open_source(p)
        total = src.total_samples
        pf = PrefetchSource(open_source(p), total + 100, total + 100)
        a = pf.read_samples(0, total + 100)
        b = src.read_samples(0, total + 100)
        np.testing.assert_array_equal(a, b)
        pf.close()


class TestRing:
    def test_header_and_data_roundtrip(self, lib):
        name = f"/dspsr_tpu_test_{os.getpid()}"
        obs = Observation(nchan=2, npol=2, ndim=2, nbit=8,
                          centre_frequency=1400.0, bandwidth=16.0, rate=16e6,
                          state=Signal.ANALYTIC, source="RINGTEST",
                          start_time=MJD(55000, 0.0))
        nbuf_bytes = 8192
        w = RingWriter(name, obs, nbuf_bytes, nbufs=4)
        try:
            r = RingReader(name)
            assert r.obs.source == "RINGTEST"
            assert r.obs.nchan == 2
            assert abs(r.obs.rate - 16e6) < 1

            rng = np.random.default_rng(0)
            bufs = [rng.integers(0, 256, nbuf_bytes).astype(np.uint8)
                    for _ in range(6)]

            def writer():
                for b in bufs:
                    while not w.push(b):
                        time.sleep(0.0005)
                w.set_eod()

            t = threading.Thread(target=writer)
            t.start()
            nsamp = nbuf_bytes // r.bytes_per_sample_exact()
            got = [r.read_samples(i * nsamp, nsamp) for i in range(6)]
            t.join()
            for a, b in zip(got, bufs):
                np.testing.assert_array_equal(a, b)
            with pytest.raises(EOFError):
                r.read_samples(6 * nsamp, nsamp)
            r.close()
        finally:
            w.close(unlink=True)

    def test_backpressure(self, lib):
        name = f"/dspsr_tpu_bp_{os.getpid()}"
        obs = Observation(nchan=1, npol=1, ndim=1, nbit=8, rate=1e6,
                          centre_frequency=1400.0, bandwidth=1.0,
                          state=Signal.NYQUIST, start_time=MJD(55000, 0.0))
        w = RingWriter(name, obs, 64, nbufs=2)
        try:
            b = np.zeros(64, np.uint8)
            assert w.push(b) and w.push(b)
            assert not w.push(b)  # full: non-blocking refusal
        finally:
            w.close(unlink=True)


class TestLivePipeline:
    def test_fold_from_ring(self, lib, tmp_path):
        """End-to-end live mode: writer feeds ring, fold pipeline consumes."""
        from dspsr_tpu.models.load_to_fold import FoldConfig, FoldPipeline
        from test_pipeline import synth_pulsar_dada, PERIOD, DM, PULSE_PHASE

        p = synth_pulsar_dada(str(tmp_path / "live.dada"), nsec=0.1)
        file_src = open_source(p)
        name = f"/dspsr_tpu_live_{os.getpid()}"

        nsamp_buf = 65536
        buf_bytes = nsamp_buf * file_src.bytes_per_sample_exact()
        w = RingWriter(name, file_src.obs, buf_bytes, nbufs=8)
        try:
            r = RingReader(name)

            def feeder():
                start = 0
                while start + nsamp_buf <= file_src.total_samples:
                    buf = file_src.read_samples(start, nsamp_buf)
                    while not w.push(buf):
                        time.sleep(0.0005)
                    start += nsamp_buf
                w.set_eod()

            t = threading.Thread(target=feeder)
            t.start()

            cfg = FoldConfig(folding_period=PERIOD, dispersion_measure=0.0,
                             coherent=False, nbin=64,
                             min_block_samples=nsamp_buf, block_parts=1)
            pipe = FoldPipeline(r, cfg)
            # force block == ring buffer granularity
            assert pipe.block_in_samples % nsamp_buf == 0 or \
                pipe.block_in_samples == nsamp_buf

            # run until the ring drains
            try:
                res = pipe.run(max_blocks=100)
            except EOFError:
                res = pipe._finish()
            t.join()
            assert res.hits.sum() > 0
            r.close()
        finally:
            w.close(unlink=True)

    def test_live_coherent_dedispersion_matches_offline(self, lib, tmp_path):
        """DM > 0 live: the ring reader carries the overlap-save tail
        host-side (Seekable.C:197-222 recycling), so the coherent pipeline
        runs on a live stream and matches the offline fold of the same
        bytes."""
        from dspsr_tpu.models.load_to_fold import FoldConfig, FoldPipeline
        from test_pipeline import synth_pulsar_dada, PERIOD, DM

        p = synth_pulsar_dada(str(tmp_path / "livedm.dada"), nsec=0.15)
        file_src = open_source(p)
        name = f"/dspsr_tpu_livedm_{os.getpid()}"

        nsamp_buf = 16384
        buf_bytes = nsamp_buf * file_src.bytes_per_sample_exact()
        w = RingWriter(name, file_src.obs, buf_bytes, nbufs=8)
        cfg = FoldConfig(folding_period=PERIOD, dispersion_measure=DM,
                         nchan=4, nbin=32, min_block_samples=8192,
                         block_parts=2)
        try:
            r = RingReader(name)

            def feeder():
                start = 0
                while start + nsamp_buf <= file_src.total_samples:
                    buf = file_src.read_samples(start, nsamp_buf)
                    while not w.push(buf):
                        time.sleep(0.0005)
                    start += nsamp_buf
                w.set_eod()

            t = threading.Thread(target=feeder)
            t.start()

            pipe = FoldPipeline(r, cfg)
            assert pipe.nsamp_overlap > 0, "must exercise overlapping reads"
            try:
                res_live = pipe.run(max_blocks=50)
            except EOFError:
                res_live = pipe._finish()
            t.join()
            r.close()
        finally:
            w.close(unlink=True)

        nchan = res_live.obs.nchan
        nuse = (pipe.out_per_block // pipe.fold_plan.seg_len) \
            * pipe.fold_plan.seg_len
        nblocks_live = int(round(res_live.hits.sum() / (nchan * nuse)))
        assert nblocks_live >= 2

        off = FoldPipeline(open_source(p), cfg)
        res_off = off.run(max_blocks=nblocks_live)
        np.testing.assert_allclose(res_live.profiles, res_off.profiles,
                                   rtol=1e-6, atol=1e-3)
        np.testing.assert_allclose(res_live.hits, res_off.hits, atol=1e-3)
