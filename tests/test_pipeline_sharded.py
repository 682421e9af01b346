"""Multi-device mode as a PRODUCT feature: `cfg.parallel` drives
LivoPipeline/run_log over a mesh (the reference's map lives in its
production loop, src/laser_mapping.cpp:776 + include/ivox3d/ivox3d.h:37-105;
here the sharded arena does too).

Covers: map-sharded pipeline trajectory agreement vs single-device,
points-sharded pipeline agreement, checkpoint/resume of a sharded arena,
shard-count mismatch rejection, and ownership-correct reanchor (a loop
correction moves voxels ACROSS shard owners; no point may be dropped).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastlivo_tpu import parallel
from fastlivo_tpu.io import logio, synthetic
from fastlivo_tpu.maps import voxel_map as vm
from fastlivo_tpu.models import pipeline as pl_mod
from fastlivo_tpu.run import run_log
from fastlivo_tpu.utils import checkpoint as ckpt
from fastlivo_tpu.utils.config import FastLivoConfig
from fastlivo_tpu.utils.metrics import ate_rmse


def make_cfg(n_devices=1, map_sharded=False):
    cfg = FastLivoConfig()
    cfg.vio.img_enable = False
    cfg.lio.max_points = 4096
    cfg.lio.init_time = 0.2
    cfg.imu.imu_int_frame = 64
    cfg.map.capacity = (1 << 13) if map_sharded else (1 << 16)  # per-device
    cfg.parallel.n_devices = n_devices
    cfg.parallel.map_sharded = map_sharded
    return cfg


def traj_of(pipe):
    t = np.asarray([x[0] for x in pipe.trajectory])
    p = np.stack([x[1] for x in pipe.trajectory])
    return t, p


def ate_vs_gt(seq, t, p):
    gt_t = np.asarray(seq.gt_stamps)
    gt_p = np.asarray(seq.gt_pos)
    gi = np.stack([np.interp(t, gt_t, gt_p[:, k]) for k in range(3)], -1)
    return ate_rmse(p, gi)


@pytest.fixture(scope="module")
def seq():
    return synthetic.generate(duration=2.5, pts_per_scan=4000, seed=7)


@pytest.fixture(scope="module")
def log_path(seq, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("shlog") / "seq.flvo")
    logio.write_sequence(path, seq)
    return path


@pytest.fixture(scope="module")
def single_run(seq, log_path):
    pipe = run_log(log_path, make_cfg(), progress=False)
    return traj_of(pipe)


def test_map_sharded_pipeline_matches_single(seq, log_path, single_run, tmp_path):
    """run_log with parallel.n_devices=8 + map_sharded — the VERDICT r2
    'done' criterion: trajectory within the sharded-agreement tolerance of
    the single-device run (f32 collective-reduction-order divergence only),
    with a mid-run checkpoint that test_sharded_checkpoint_resume reuses."""
    cfg = make_cfg(n_devices=8, map_sharded=True)
    ck = str(tmp_path / "sh.ckpt.npz")
    pipe = run_log(
        log_path, cfg, progress=False,
        checkpoint_every=8, checkpoint_path=ck,
    )
    assert pipe.mesh is not None and pipe.n_map_shards == 8
    t1, p1 = single_run
    t2, p2 = traj_of(pipe)
    assert len(t2) == len(t1)
    # Same physics; divergence is f32 reduction order + per-shard LRU.
    np.testing.assert_allclose(p2, p1, atol=2e-2)
    assert ate_vs_gt(seq, t2, p2) < 0.06

    # Resume from the mid-run checkpoint: the restored sharded arena must
    # continue to the same trajectory as the straight-through run.
    pipe_r = run_log(log_path, cfg, progress=False, resume_from=ck)
    t3, p3 = traj_of(pipe_r)
    n_res = len(t3)
    assert n_res >= 4
    np.testing.assert_allclose(p3, p2[len(t2) - n_res :], atol=1e-4)

    # A different shard count must refuse the blob (each shard is an
    # independent hash table; re-partitioning silently loses points).
    pipe_bad = pl_mod.LivoPipeline(make_cfg(n_devices=4, map_sharded=True))
    with pytest.raises(ValueError, match="shard"):
        ckpt.load_pipeline(ck, pipe_bad)


def test_points_sharded_pipeline_matches_single(seq, log_path, single_run):
    cfg = make_cfg(n_devices=8, map_sharded=False)
    pipe = run_log(log_path, cfg, progress=False)
    assert pipe.mesh is not None and pipe.n_map_shards == 1
    t1, p1 = single_run
    t2, p2 = traj_of(pipe)
    assert len(t2) == len(t1)
    # Replicated map, identical downsample: only the innovation psum's
    # f32 summation order differs from the single-device reduction.
    np.testing.assert_allclose(p2, p1, atol=5e-3)


def test_sharded_reanchor_no_ownership_drops(rng):
    """A loop correction moves points across voxel (and therefore shard
    owner) boundaries. vm.reanchor with axis_name must re-insert every
    point on its NEW owner — zero drops — and preserve the per-shard
    ownership invariant."""
    map_cfg = vm.VoxelMapConfig(
        resolution=0.4, capacity=1 << 10, max_points=8, probe_depth=8
    )
    step_cfg = pl_mod.StepConfig(
        map_cfg=map_cfg, ds_capacity=512, imu_window=8, map_sharded=True
    )
    mesh = parallel.make_mesh(4)
    n_sh = 4

    pts = rng.uniform(-6, 6, (512, 3)).astype(np.float32)
    # one point per voxel so slab-cap effects can't mask a drop
    vox = np.unique(np.floor(pts / map_cfg.resolution).astype(np.int32), axis=0)
    pts = (vox + 0.5).astype(np.float32) * map_cfg.resolution
    pts = np.pad(pts, ((0, 512 - len(pts)), (0, 0)))
    mask = np.arange(512) < len(vox)

    m = parallel.make_sharded_map(map_cfg, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    insert = jax.jit(
        jax.shard_map(
            lambda m, p, k: vm.sharded_insert(m, p, k, map_cfg, "points"),
            mesh=mesh,
            in_specs=(
                jax.tree.map(lambda x: P() if x.ndim == 0 else P("points"), m),
                P(),
                P(),
            ),
            out_specs=jax.tree.map(lambda x: P() if x.ndim == 0 else P("points"), m),
            check_vma=False,
        )
    )
    m = insert(m, jnp.asarray(pts), jnp.asarray(mask))
    n_before = int(vm.num_points(m))
    assert n_before == len(vox)

    # Rigid correction: a large translation (+ small rotation) that moves
    # every voxel — most change owner under the hash partition.
    th = 0.05
    r = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    t = np.array([10.3, -7.7, 3.9], np.float32)
    owners_old = vm.owner_of(jnp.asarray(vox), n_sh)
    vox_new = np.floor((pts[mask] @ r.T + t) / map_cfg.resolution).astype(np.int32)
    owners_new = vm.owner_of(jnp.asarray(vox_new), n_sh)
    assert int(jnp.sum(owners_old != owners_new)) > len(vox) // 4

    re = parallel.make_sharded_reanchor(mesh, step_cfg, chunk=2048)
    m2 = re(
        m,
        jnp.zeros((1024,), jnp.int32),
        jnp.asarray(r)[None],
        jnp.asarray(t)[None],
    )
    assert int(vm.num_points(m2)) == n_before  # zero ownership drops

    # The stored point multiset is exactly the corrected one.
    stored = np.asarray(m2.points).reshape(-1, 3)
    cnt_ok = (
        np.arange(map_cfg.max_points)[None, :]
        < np.asarray(m2.counts).reshape(-1)[:, None]
    ) & np.asarray(m2.occupied).reshape(-1)[:, None]
    stored = stored[cnt_ok.reshape(-1)]
    want = pts[mask] @ r.T + t
    got = stored[np.lexsort(stored.T)]
    want = want[np.lexsort(want.T)]
    np.testing.assert_allclose(got, want, atol=1e-5)

    # Ownership invariant: every occupied slot's key belongs to its shard.
    keys = np.asarray(m2.keys).reshape(n_sh, -1, 3)
    occ = np.asarray(m2.occupied).reshape(n_sh, -1)
    for s in range(n_sh):
        own = np.asarray(vm.owner_of(jnp.asarray(keys[s][occ[s]]), n_sh))
        assert (own == s).all()
