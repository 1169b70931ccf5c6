"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Core property (SURVEY.md §4): N-shard execution == 1-shard execution of the
same superblock (the reference validates multi-thread runs by comparing
1-thread vs N-thread archives).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dspsr_tpu.observation import Signal
from dspsr_tpu.ops.filterbank import FilterbankPlan
from dspsr_tpu.ops.fold import FoldPlan
from dspsr_tpu.ops.dedispersion import Dedispersion
from dspsr_tpu.unpack.bittable import BitTable
from dspsr_tpu.parallel.sharded import (
    ShardedFoldPlan,
    build_sharded_step,
    make_mesh,
)


def make_plan(nchan_subband=4, freq_res=64, nfp=4, nfn=4, npart_local=2,
              nbin=32, npol=2, real_input=False):
    fb = FilterbankPlan(real_input=real_input, nchan_subband=nchan_subband,
                        freq_res=freq_res, nfilt_pos=nfp, nfilt_neg=nfn)
    out_per_shard = npart_local * fb.nkeep
    seg = out_per_shard
    while seg > 1 and out_per_shard % seg:
        seg //= 2
    return ShardedFoldPlan(
        fb=fb, fold=FoldPlan(nbin=nbin, seg_len=seg),
        npart_local=npart_local, nchan_in=1, npol=npol,
        det_state=Signal.INTENSITY)


def run_sharded(n_time, n_chan, plan_nt, raw_all, table, resp, nbin, nchan_out,
                dphi_val):
    """Run one superblock on an (n_time, n_chan) mesh.

    plan_nt has npart_local windows per shard; raw_all covers
    n_time*shard_in + halo input samples."""
    plan = plan_nt
    mesh = make_mesh(n_time * n_chan, n_chan)
    step = build_sharded_step(mesh, plan, resp, 8)

    bps = plan.nchan_in * plan.npol * (1 if plan.fb.real_input else 2)
    shard_b = plan.shard_in_samples * bps
    rows = np.stack([
        raw_all[i * shard_b : (i + 1) * shard_b] for i in range(n_time)])

    # anchors: continuous linear phase across the whole superblock
    out_per_shard = plan.out_per_shard()
    seg = plan.fold.seg_len
    nseg = out_per_shard // seg
    phi0 = np.zeros((n_time, nseg), np.float32)
    dphi = np.full((n_time, nseg), dphi_val, np.float32)
    for i in range(n_time):
        for s in range(nseg):
            phi0[i, s] = ((i * out_per_shard + s * seg) * dphi_val) % 1.0

    wmask = np.ones((n_time, plan.npart_local), np.float32)
    wmask[-1, plan.npart_local - plan.masked_windows():] = 0.0

    npol_det = 1
    prof = jnp.zeros((nchan_out, npol_det, nbin), jnp.float32)
    hits = jnp.zeros((nchan_out, nbin), jnp.float32)
    prof, hits = step(prof, hits, jnp.asarray(rows), jnp.asarray(phi0),
                      jnp.asarray(dphi), jnp.asarray(wmask))
    return np.asarray(prof), np.asarray(hits)


@pytest.fixture(scope="module")
def raw_superblock(rng_mod=np.random.default_rng(99)):
    # enough bytes for the largest configuration below
    return rng_mod.integers(0, 256, 4 * 1024 * 1024).astype(np.uint8)


class TestShardEquivalence:
    def test_8_shards_equal_1_shard(self, raw_superblock):
        """(8 time shards x P windows) == (1 shard x 8P windows) with the
        same masking."""
        table = BitTable(8).values
        nbin = 32
        p8 = make_plan(npart_local=2)
        p1 = make_plan(npart_local=16)
        resp = None
        nchan_out = p8.nchan_out
        dphi = 13 / 4096  # exactly representable: bin edges deterministic

        n_in_8 = p8.superblock_samples(8)
        n_in_1 = p1.superblock_samples(1)
        assert n_in_8 == n_in_1  # same total coverage
        bps = 4  # 1 chan * 2 pol * complex * 8 bit
        raw = raw_superblock[: n_in_8 * bps]

        prof8, hits8 = run_sharded(8, 1, p8, raw, table, resp, nbin, nchan_out, dphi)
        prof1, hits1 = run_sharded(1, 1, p1, raw, table, resp, nbin, nchan_out, dphi)

        # identical windows, identical masking of the last window
        assert p8.masked_windows() == p1.masked_windows()
        np.testing.assert_allclose(hits8, hits1, rtol=1e-6)
        np.testing.assert_allclose(prof8, prof1, rtol=2e-4, atol=2e-4)

    def test_chan_sharding_equal(self, raw_superblock):
        """(4 time x 2 chan) == (8 time x 1 chan) == (1 x 1)."""
        table = BitTable(8).values
        nbin = 32
        dphi = 9 / 4096
        p4 = make_plan(npart_local=4)   # 4 time shards
        p8 = make_plan(npart_local=2)   # 8 time shards
        raw = raw_superblock[: p4.superblock_samples(4) * 4]
        assert p4.superblock_samples(4) == p8.superblock_samples(8)

        prof_a, hits_a = run_sharded(4, 2, p4, raw, table, None, nbin, 4, dphi)
        prof_b, hits_b = run_sharded(8, 1, p8, raw, table, None, nbin, 4, dphi)
        np.testing.assert_allclose(hits_a, hits_b, rtol=1e-6)
        np.testing.assert_allclose(prof_a, prof_b, rtol=2e-4, atol=2e-4)

    def test_with_chirp_response(self, raw_superblock):
        """Convolving filterbank under sharding matches single shard."""
        table = BitTable(8).values
        nbin = 16
        dphi = 17 / 4096
        ded = Dedispersion.build(0.02, 1400.0, 4.0, 4, 64, zap_dc=False)
        nfp = max(ded.impulse_pos, 1)
        nfn = max(ded.impulse_neg, 1)
        p2 = make_plan(nfp=nfp, nfn=nfn, npart_local=4, nbin=nbin)
        p1 = make_plan(nfp=nfp, nfn=nfn, npart_local=8, nbin=nbin)
        from scutil import sc_of
        resp = sc_of(ded.phasors)
        raw = raw_superblock[: p2.superblock_samples(2) * 4]
        assert p2.superblock_samples(2) == p1.superblock_samples(1)
        prof2, hits2 = run_sharded(2, 1, p2, raw, table, resp, nbin, 4, dphi)
        prof1, hits1 = run_sharded(1, 1, p1, raw, table, resp, nbin, 4, dphi)
        np.testing.assert_allclose(hits2, hits1, rtol=1e-6)
        np.testing.assert_allclose(prof2, prof1, rtol=2e-4, atol=2e-4)


class TestMesh:
    def test_make_mesh_shapes(self):
        m = make_mesh(8, 2)
        assert m.shape == {"time": 4, "chan": 2}
        with pytest.raises(ValueError):
            make_mesh(8, 3)
