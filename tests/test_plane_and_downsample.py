"""Plane fit vs NumPy lstsq; voxel downsample vs dict-based reference."""

import numpy as np
import jax.numpy as jnp

import jax
from fastlivo_tpu.ops import plane, voxelize

jplane = jax.jit(plane.esti_plane, static_argnames="threshold")
jdown = jax.jit(voxelize.voxel_downsample, static_argnames=("leaf", "out_size"))


def test_plane_fit_exact(rng):
    # Points on known planes (with tiny noise) -> correct normals, valid.
    n_batch = 32
    normals = rng.normal(size=(n_batch, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    d = rng.uniform(-2, 2, size=(n_batch,))

    pts = []
    for i in range(n_batch):
        basis = np.linalg.svd(normals[i][None])[2][1:]  # 2 in-plane vectors
        coeff = rng.uniform(-1, 1, size=(5, 2))
        p = coeff @ basis - d[i] * normals[i]
        p += rng.normal(size=(5, 3)) * 1e-4
        pts.append(p)
    pts = np.stack(pts).astype(np.float32)

    n_est, d_est, valid = jplane(
        jnp.asarray(pts), jnp.ones((n_batch, 5), bool), 0.1
    )
    assert bool(jnp.all(valid))
    n_est = np.asarray(n_est)
    d_est = np.asarray(d_est)
    sign = np.sign((n_est * normals).sum(-1))
    np.testing.assert_allclose(n_est * sign[:, None], normals, atol=1e-3)
    np.testing.assert_allclose(d_est * sign, d, atol=1e-3)


def test_plane_fit_rejects_nonplanar(rng):
    pts = rng.uniform(-1, 1, size=(16, 5, 3)).astype(np.float32)
    _, _, valid = jplane(jnp.asarray(pts), jnp.ones((16, 5), bool), 0.01)
    assert int(jnp.sum(valid)) < 4  # random points almost never form planes


def test_plane_fit_requires_all_neighbors(rng):
    pts = np.zeros((1, 5, 3), np.float32)
    pts[0, :, 0] = np.arange(5)
    pts[0, :, 1] = np.arange(5) % 2
    nv = np.ones((1, 5), bool)
    nv[0, 4] = False
    _, _, valid = jplane(jnp.asarray(pts), jnp.asarray(nv), 0.1)
    assert not bool(valid[0])


def ref_downsample(pts, leaf):
    cells = {}
    for p in pts:
        key = tuple(np.floor(p / leaf).astype(int))
        cells.setdefault(key, []).append(p)
    return {k: np.mean(v, axis=0) for k, v in cells.items()}


def test_voxel_downsample_centroids(rng):
    pts = rng.uniform(-3, 3, size=(500, 3)).astype(np.float32)
    out, mask = jdown(
        jnp.asarray(pts), jnp.ones(500, bool), 0.5, 1024
    )
    got = np.asarray(out)[np.asarray(mask)]
    ref = ref_downsample(pts, 0.5)
    assert got.shape[0] == len(ref)
    ref_sorted = np.array(sorted(ref.values(), key=lambda p: (p[0], p[1], p[2])))
    got_sorted = got[np.lexsort((got[:, 2], got[:, 1], got[:, 0]))]
    np.testing.assert_allclose(got_sorted, ref_sorted, atol=1e-5)


def test_voxel_downsample_mask(rng):
    pts = rng.uniform(-3, 3, size=(100, 3)).astype(np.float32)
    mask = np.zeros(100, bool)
    out, omask = jdown(jnp.asarray(pts), jnp.asarray(mask), 0.5, 128)
    assert int(jnp.sum(omask)) == 0


def test_eigh3_smallest_matches_numpy(rng):
    from fastlivo_tpu.ops import linalg

    a = rng.normal(size=(64, 3, 3)).astype(np.float32)
    cov = np.einsum("nij,nkj->nik", a, a)  # SPD
    lam, v = jax.jit(linalg.eigh3_smallest)(jnp.asarray(cov))
    lam = np.asarray(lam)
    v = np.asarray(v)
    w_ref, v_ref = np.linalg.eigh(cov.astype(np.float64))
    np.testing.assert_allclose(lam, w_ref[:, 0], rtol=1e-3, atol=1e-3)
    # eigenvector up to sign
    dots = np.abs(np.sum(v * v_ref[:, :, 0], axis=-1))
    assert (dots > 0.995).mean() > 0.95, dots.min()
