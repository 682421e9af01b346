"""IMU propagation vs an independent NumPy integrator; undistortion sanity."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from fastlivo_tpu.models import imu as imu_mod
from fastlivo_tpu.state import NavState, GRAVITY_MS2

jprop = jax.jit(imu_mod.propagate)
jundist = jax.jit(imu_mod.undistort)


def numpy_propagate(rot, pos, vel, bg, ba, grav, stamps, gyr, acc, t_end, scale):
    """Independent midpoint integrator mirroring the reference semantics."""
    for i in range(len(stamps) - 1):
        dt = stamps[i + 1] - stamps[i]
        w = 0.5 * (gyr[i] + gyr[i + 1]) - bg
        a = 0.5 * (acc[i] + acc[i + 1]) * scale - ba
        rot = rot @ Rotation.from_rotvec(w * dt).as_matrix()
        aw = rot @ a + grav
        pos = pos + vel * dt + 0.5 * aw * dt * dt
        vel = vel + aw * dt
    dt = t_end - stamps[-1]
    rot = rot @ Rotation.from_rotvec(w * dt).as_matrix()
    pos = pos + vel * dt + 0.5 * aw * dt * dt
    vel = vel + aw * dt
    return rot, pos, vel


def make_window(rng, m=16, n_valid=16):
    stamps = np.concatenate([[0], np.sort(rng.uniform(0.001, 0.1, n_valid - 1))])
    stamps = np.pad(stamps, (0, m - n_valid), constant_values=stamps[-1])
    gyr = rng.normal(size=(m, 3)) * 0.5
    acc = rng.normal(size=(m, 3)) * 0.5 + np.array([0, 0, GRAVITY_MS2])
    mask = np.arange(m) < n_valid
    gyr[~mask] = 0
    acc[~mask] = 0
    return imu_mod.ImuWindow(
        stamps=jnp.asarray(stamps, jnp.float32),
        gyr=jnp.asarray(gyr, jnp.float32),
        acc=jnp.asarray(acc, jnp.float32),
        mask=jnp.asarray(mask),
    )


def test_propagation_matches_numpy(rng):
    st = NavState.identity()._replace(
        vel=jnp.asarray([0.5, -0.2, 0.1]),
        bg=jnp.asarray([0.01, -0.02, 0.005]),
        ba=jnp.asarray([0.05, 0.02, -0.01]),
    )
    win = make_window(rng)
    t_end = float(win.stamps[-1]) + 0.005

    new_state, poses = jprop(st, win, jnp.float32(t_end), jnp.float32(1.0))

    ref_rot, ref_pos, ref_vel = numpy_propagate(
        np.eye(3),
        np.zeros(3),
        np.asarray(st.vel, np.float64),
        np.asarray(st.bg, np.float64),
        np.asarray(st.ba, np.float64),
        np.asarray(st.grav, np.float64),
        np.asarray(win.stamps, np.float64),
        np.asarray(win.gyr, np.float64),
        np.asarray(win.acc, np.float64),
        t_end,
        1.0,
    )
    np.testing.assert_allclose(np.asarray(new_state.rot), ref_rot, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state.pos), ref_pos, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state.vel), ref_vel, atol=1e-4)


def test_covariance_grows(rng):
    st = NavState.identity()
    win = make_window(rng)
    new_state, _ = jprop(st, win, jnp.float32(0.105), jnp.float32(1.0))
    assert float(jnp.trace(new_state.cov)) > float(jnp.trace(st.cov))
    # still symmetric PSD
    c = np.asarray(new_state.cov)
    np.testing.assert_allclose(c, c.T, atol=1e-5)
    assert np.linalg.eigvalsh(c).min() > -1e-6


def test_masked_samples_are_noops(rng):
    st = NavState.identity()._replace(vel=jnp.asarray([1.0, 0.0, 0.0]))
    win_full = make_window(rng, m=16, n_valid=10)
    # Same data but extra garbage in the padding: result must not change.
    bad_gyr = np.asarray(win_full.gyr).copy()
    bad_gyr[10:] = 99.0
    win_bad = win_full._replace(gyr=jnp.asarray(bad_gyr))
    t_end = jnp.float32(float(win_full.stamps[9]) + 0.003)
    s1, _ = jprop(st, win_full, t_end, jnp.float32(1.0))
    s2, _ = jprop(st, win_bad, t_end, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(s1.pos), np.asarray(s2.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.rot), np.asarray(s2.rot), atol=1e-6)


def test_undistort_static_is_identity(rng):
    """With zero motion, undistortion must return the points unchanged."""
    st = NavState.identity()
    m = 8
    win = imu_mod.ImuWindow(
        stamps=jnp.asarray(np.linspace(0, 0.1, m), jnp.float32),
        gyr=jnp.zeros((m, 3), jnp.float32),
        acc=jnp.tile(jnp.asarray([0, 0, GRAVITY_MS2], jnp.float32), (m, 1)),
        mask=jnp.ones(m, bool),
    )
    new_state, poses = jprop(st, win, jnp.float32(0.1), jnp.float32(1.0))
    pts = jnp.asarray(rng.uniform(-5, 5, size=(100, 3)), jnp.float32)
    t_offs = jnp.asarray(rng.uniform(0, 0.1, size=100), jnp.float32)
    rot_il = jnp.eye(3, dtype=jnp.float32)
    t_il = jnp.zeros(3, jnp.float32)
    out = jundist(pts, t_offs, jnp.ones(100, bool), poses, new_state, rot_il, t_il)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-4)


def test_undistort_pure_rotation(rng):
    """Constant yaw rate: a point sampled at time t, expressed in the frame at
    t, must map to the scan-end frame exactly."""
    st = NavState.identity()
    m = 11
    wz = 1.0  # rad/s
    stamps = np.linspace(0, 0.1, m)
    win = imu_mod.ImuWindow(
        stamps=jnp.asarray(stamps, jnp.float32),
        gyr=jnp.tile(jnp.asarray([0, 0, wz], jnp.float32), (m, 1)),
        acc=jnp.tile(jnp.asarray([0, 0, GRAVITY_MS2], jnp.float32), (m, 1)),
        mask=jnp.ones(m, bool),
    )
    new_state, poses = jprop(st, win, jnp.float32(0.1), jnp.float32(1.0))

    p_world = np.array([2.0, 1.0, 0.5])
    t_offs = rng.uniform(0, 0.1, size=20)
    # body-frame observation of the static world point at each sample time
    obs = np.stack(
        [Rotation.from_rotvec([0, 0, wz * t]).as_matrix().T @ p_world for t in t_offs]
    ).astype(np.float32)

    out = jundist(
        jnp.asarray(obs),
        jnp.asarray(t_offs, jnp.float32),
        jnp.ones(20, bool),
        poses,
        new_state,
        jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32),
    )
    expected = Rotation.from_rotvec([0, 0, wz * 0.1]).as_matrix().T @ p_world
    np.testing.assert_allclose(
        np.asarray(out), np.tile(expected, (20, 1)), atol=2e-3
    )
