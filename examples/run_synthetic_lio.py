"""End-to-end drive: multi-scan LIO odometry through the public package API.

A sensor moves through a synthetic room on a circular arc with yaw; each step
gets an IMU window + a fresh LiDAR scan. We run the full loop:
propagate -> lio_update -> map insert, and report trajectory error.
"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

import fastlivo_tpu  # public package
from fastlivo_tpu import NavState
from fastlivo_tpu.maps import voxel_map as vm
from fastlivo_tpu.models import lio, imu as imu_mod
from fastlivo_tpu.ops import voxelize

rng = np.random.default_rng(3)

def sample_room(n):
    pts = []
    per = n // 5
    for face in range(5):
        u = rng.uniform(-8, 8, size=(per, 2))
        if face == 0:
            p = np.stack([u[:,0], u[:,1], np.full(per, -1.5)], 1)
        else:
            axis, val = [(0,-8),(0,8),(1,-8),(1,8)][face-1]
            p = np.zeros((per,3)); p[:,axis]=val; p[:,1-axis]=u[:,0]; p[:,2]=u[:,1]+4
        pts.append(p)
    return np.concatenate(pts).astype(np.float32)

MAP_CFG = vm.VoxelMapConfig(resolution=0.5, capacity=1<<16, max_points=32, nearby_type=18)
LIO_CFG = lio.LioConfig()
jinsert = jax.jit(vm.insert, static_argnames='cfg')
jupdate = jax.jit(lio.lio_update, static_argnames=('map_cfg','cfg'))
jprop = jax.jit(imu_mod.propagate)
jdown = jax.jit(voxelize.voxel_downsample, static_argnames=('leaf','out_size'))

# ground-truth trajectory: circle r=2, yaw rate, 10 Hz scans, 1 m/s
T = 30
dt_scan = 0.1
wz = 0.25
poses = []
for k in range(T+1):
    t = k*dt_scan
    yaw = wz*t
    pos = np.array([2*np.sin(0.5*t), 2*(1-np.cos(0.5*t)), 0.1*np.sin(t)])
    poses.append((Rotation.from_euler('z', yaw).as_matrix().astype(np.float32), pos.astype(np.float32)))

state = NavState.identity()._replace(cov=jnp.eye(18)*1e-4)
m = vm.make_map(MAP_CFG)
rot_il = jnp.eye(3, dtype=jnp.float32); t_il = jnp.zeros(3, jnp.float32)

# bootstrap map from first scan at true pose 0 (identity)
scan_w = sample_room(6000)
m = jinsert(m, jnp.asarray(scan_w), jnp.ones(len(scan_w), bool), MAP_CFG)

errs = []
M = 12
for k in range(1, T+1):
    R_true, p_true = poses[k]
    R_prev, p_prev = poses[k-1]
    # IMU window: consistent with the const-twist motion between poses (approx):
    # gyro = body yaw rate, acc = world accel rotated to body + gravity
    stamps = np.linspace(0, dt_scan, M).astype(np.float32)
    # finite-difference accel of the trajectory
    def posf(t):
        return np.array([2*np.sin(0.5*t), 2*(1-np.cos(0.5*t)), 0.1*np.sin(t)])
    t0 = (k-1)*dt_scan
    acc_w = np.stack([(posf(t0+s+1e-3)-2*posf(t0+s)+posf(t0+s-1e-3))/1e-6 for s in stamps])
    gyr = np.tile([0,0,wz], (M,1)).astype(np.float32)
    Rts = [Rotation.from_euler('z', wz*(t0+s)).as_matrix() for s in stamps]
    acc_b = np.stack([Rts[i].T @ (acc_w[i] + [0,0,9.81]) for i in range(M)]).astype(np.float32)
    win = imu_mod.ImuWindow(jnp.asarray(stamps), jnp.asarray(gyr), jnp.asarray(acc_b), jnp.ones(M, bool))
    state, pose_traj = jprop(state, win, jnp.float32(dt_scan), jnp.float32(1.0))

    # scan from true pose k (no distortion in this drive)
    sw = sample_room(4000)
    sb = ((sw - p_true) @ R_true).astype(np.float32)
    sb_ds, sb_mask = jdown(jnp.asarray(sb), jnp.ones(len(sb), bool), 0.15, 4096)

    state, info, (nbr, nv) = jupdate(state, m, sb_ds, sb_mask, rot_il, t_il, MAP_CFG, LIO_CFG)

    # map insert: world points gated
    _, p_w = lio.transform_to_world(sb_ds, state.rot, state.pos, rot_il, t_il)
    add = lio.map_insert_gate(p_w, sb_mask, nbr, nv, 0.3)
    m = jinsert(m, p_w, add, MAP_CFG)

    e = np.linalg.norm(np.asarray(state.pos) - p_true)
    errs.append(e)
    if k % 10 == 0 or k == 1:
        print(f"scan {k:2d}: pos_err={e*100:6.2f} cm  n_eff={int(info.n_effective):5d} iters={int(info.iterations)} map_pts={int(vm.num_points(m))}")

print(f"ATE (mean pos err): {np.mean(errs)*100:.2f} cm, max {np.max(errs)*100:.2f} cm over {T} scans")
assert np.mean(errs) < 0.05, "trajectory diverged"
print("DRIVE OK")
