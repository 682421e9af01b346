"""SuperPoint+LightGlue JAX forwards + the rotation-invariant classical
matcher.

No pretrained weights exist in this environment (the reference ships
.MISSING_LARGE_BLOBS placeholders), so the learned pipeline is tested on
STRUCTURAL invariants that must hold for any weights — identical inputs
must self-match through the whole extract->attend->assign stack — plus
npz round-trip loading. Viewpoint-change robustness (which needs trained
weights in the learned path) is covered by OrientedPatchMatcher, which
must pass an in-plane-rotation case where the plain PatchMatcher fails.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.ndimage import rotate as nd_rotate

from fastlivo_tpu.backend import superpoint_lightglue as spl
from fastlivo_tpu.backend import visual_verify as vv


@pytest.fixture(scope="module")
def textured_img(rng=None):
    from scipy.ndimage import gaussian_filter

    r = np.random.default_rng(7)
    # smooth multi-scale blob texture (stable gradients/orientations)
    img = gaussian_filter(r.uniform(0, 1, (256, 320)), 3.0)
    img += 0.5 * gaussian_filter(r.uniform(0, 1, (256, 320)), 8.0)
    img = (img - img.min()) / (img.max() - img.min())
    return img.astype(np.float32)


def test_superpoint_shapes_and_softmax(textured_img):
    w = spl.init_superpoint(0)
    scores, desc = jax.jit(spl.superpoint_forward)(w, jnp.asarray(textured_img))
    assert scores.shape == textured_img.shape
    assert desc.shape == (textured_img.shape[0] // 8, textured_img.shape[1] // 8, 256)
    # descriptor normalization
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(desc), axis=-1), 1.0, atol=1e-4
    )
    # score map is a (sub)probability: each 8x8 cell sums to <= 1
    s = np.asarray(scores).reshape(32, 8, 40, 8).sum(axis=(1, 3))
    assert (s <= 1.0 + 1e-4).all()


def test_extract_keypoints_deterministic_and_bordered(textured_img):
    w = spl.init_superpoint(0)
    k1, d1, v1 = spl.extract_keypoints(w, jnp.asarray(textured_img), 256)
    k2, d2, v2 = spl.extract_keypoints(w, jnp.asarray(textured_img), 256)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    kp = np.asarray(k1)[np.asarray(v1)]
    assert len(kp) > 32
    assert (kp[:, 0] >= 8).all() and (kp[:, 0] < textured_img.shape[1] - 8).all()
    assert (kp[:, 1] >= 8).all() and (kp[:, 1] < textured_img.shape[0] - 8).all()


def test_lightglue_assignment_identity_on_distinct_descriptors():
    """With distinct descriptors the matchability/dual-softmax assignment
    head must recover the identity assignment (n_layers=0 isolates the
    head; deep RANDOM attention stacks rank-collapse tokens, which trained
    weights avoid — that behavior needs real weights to test)."""
    n, d = 64, 256
    rng = np.random.default_rng(5)
    desc = np.linalg.qr(rng.normal(size=(d, n)))[0].T.astype(np.float32)
    # Scale so sim_ii = sqrt(d): a saturated softmax like trained
    # similarities produce (at unit scale the softmax is near-flat and the
    # matchability prior m_j would dominate the argmax).
    desc = desc * np.sqrt(d)
    kpts = rng.uniform(10, 200, (n, 2)).astype(np.float32)
    lg = spl.init_lightglue(1, n_layers=0)
    # Identity final projection: orthonormal descriptors then give an
    # exactly diagonal similarity, isolating the assignment-head mechanics
    # (a random projection would scramble orthogonality).
    lg["final_proj.w"] = jnp.eye(d)
    lg["final_proj.b"] = jnp.zeros((d,))
    valid = jnp.ones(n, bool)
    p, m0, m1 = spl.lightglue_forward(
        lg, jnp.asarray(kpts), jnp.asarray(desc), valid,
        jnp.asarray(kpts), jnp.asarray(desc), valid,
        jnp.asarray([320.0, 256.0]), n_layers=0,
    )
    p = np.asarray(p)
    assert (p.argmax(axis=1) == np.arange(n)).all()
    assert (p.argmax(axis=0) == np.arange(n)).all()


def test_full_pipeline_self_match_consistency(textured_img):
    """extract -> attend -> assign on (img, img): whatever matches survive
    must be exact self-correspondences, and the pipeline is deterministic."""
    matcher = spl.SuperPointLightGlueMatcher(
        spl.init_superpoint(0), spl.init_lightglue(1), max_keypoints=256,
        match_thresh=0.001, n_layers=2,
    )
    res1 = matcher.match(textured_img, textured_img)
    res2 = matcher.match(textured_img, textured_img)
    assert res1.n_keypoints > 32
    np.testing.assert_array_equal(res1.pts1, res2.pts1)
    if len(res1.pts1):
        np.testing.assert_allclose(res1.pts1, res1.pts2, atol=1e-3)


def test_lightglue_assignment_is_valid_distribution(textured_img):
    sp, lg = spl.init_superpoint(0), spl.init_lightglue(2)
    k0, d0, v0 = spl.extract_keypoints(sp, jnp.asarray(textured_img), 128)
    img2 = np.roll(textured_img, 5, axis=1)
    k1, d1, v1 = spl.extract_keypoints(sp, jnp.asarray(img2), 128)
    size = jnp.asarray([textured_img.shape[1], textured_img.shape[0]], jnp.float32)
    p, m0, m1 = spl.lightglue_forward(lg, k0, d0, v0, k1, d1, v1, size, n_layers=2)
    p = np.asarray(p)
    assert p.shape == (128, 128)
    assert (p >= 0).all() and (p <= 1.0 + 1e-5).all()
    assert np.isfinite(np.asarray(m0)).all()


def test_npz_roundtrip(tmp_path):
    lg = spl.init_lightglue(3, n_layers=2)
    path = str(tmp_path / "lg.npz")
    np.savez(path, **{k: np.asarray(v) for k, v in lg.items()})
    loaded = spl.load_npz(path)
    assert set(loaded.keys()) == set(lg.keys())
    for k in lg:
        np.testing.assert_array_equal(np.asarray(loaded[k]), np.asarray(lg[k]))


def test_superpointlightglue_wrapper(tmp_path, textured_img):
    sp, lg = spl.init_superpoint(0), spl.init_lightglue(1, n_layers=0)
    sp_path = str(tmp_path / "sp.npz")
    lg_path = str(tmp_path / "lg.npz")
    np.savez(sp_path, **{k: np.asarray(v) for k, v in sp.items()})
    np.savez(lg_path, **{k: np.asarray(v) for k, v in lg.items()})
    m = vv.SuperPointLightGlue(
        weights_path=(sp_path, lg_path), max_keypoints=128,
        match_thresh=0.001, n_layers=0,
    )
    res = m.match(textured_img, textured_img)
    assert res.n_keypoints > 16
    if len(res.pts1):
        np.testing.assert_allclose(res.pts1, res.pts2, atol=1e-3)


# --------------------------------------------------------------------------
# Viewpoint change: plain PatchMatcher fails, OrientedPatchMatcher passes
# --------------------------------------------------------------------------


def _rotated_pair(textured_img, deg):
    img1 = textured_img * 255.0
    img2 = nd_rotate(img1, deg, reshape=False, order=1, mode="nearest")
    return img1, img2


def test_oriented_matcher_survives_inplane_rotation(textured_img):
    img1, img2 = _rotated_pair(textured_img, 30.0)

    plain_ok, plain_res = vv.verify_loop(img1, img2, vv.PatchMatcher())
    orient_ok, orient_res = vv.verify_loop(img1, img2, vv.OrientedPatchMatcher())

    # The un-normalized patch correlator must fail this viewpoint change...
    assert not plain_ok, f"plain ratio {plain_res.match_ratio}"
    # ...the orientation-normalized one must pass the reference's 0.2 gate.
    assert orient_ok, f"oriented ratio {orient_res.match_ratio}"

    # And the surviving correspondences must be geometrically consistent
    # with a 30 deg in-plane rotation about the image center.
    c = np.array([[img1.shape[1] / 2, img1.shape[0] / 2]])
    th = np.deg2rad(30.0)
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    # scipy.ndimage.rotate rotates the CONTENT by +deg: a feature at p in
    # img1 appears at c + R(-th) (p - c)... determine empirically via both
    # directions and take the better one (convention-free check).
    pred_a = (orient_res.pts1 - c) @ rot.T + c
    pred_b = (orient_res.pts1 - c) @ rot + c
    err = np.minimum(
        np.linalg.norm(pred_a - orient_res.pts2, axis=1),
        np.linalg.norm(pred_b - orient_res.pts2, axis=1),
    )
    assert np.median(err) < 3.0, f"median geom err {np.median(err):.1f} px"


def test_oriented_matcher_passes_gate_cases(textured_img):
    """OrientedPatchMatcher must also pass the identity gate."""
    img = textured_img * 255.0
    ok, res = vv.verify_loop(img, img, vv.OrientedPatchMatcher())
    assert ok and res.match_ratio > 0.5
    np.testing.assert_allclose(res.pts1, res.pts2, atol=0.6)


# --------------------------------------------------------------------------
# Trained in-repo weights (committed by examples/train_matcher.py)
# --------------------------------------------------------------------------


def _render_view(rot_wc, pos):
    from fastlivo_tpu.io import render
    from fastlivo_tpu.ops.camera import Pinhole

    cam = Pinhole(width=320, height=256, fx=200.0, fy=200.0, cx=160.0, cy=128.0)
    rcw = np.asarray(rot_wc, np.float32).T
    pcw = -rcw @ np.asarray(pos, np.float32)
    f = jax.jit(render.render_room, static_argnames="cam")(
        cam, jnp.asarray(rcw), jnp.asarray(pcw)
    )
    return np.asarray(f)


@pytest.mark.skipif(
    vv.default_weights_paths() is None,
    reason="no trained matcher weights committed",
)
def test_trained_matcher_beats_classical():
    """The committed weights must earn their place: on render-domain pairs
    under combined viewpoint (in-plane roll + translation) AND
    illumination (gamma + gain + offset) change — the regime patch
    correlation dies in — the learned matcher's match ratio must beat
    OrientedPatchMatcher's on every pair (train-time eval showed 3-4x;
    gate at a strict win)."""
    from scipy.spatial.transform import Rotation

    m = vv.default_matcher()
    classical = vv.OrientedPatchMatcher()
    base = Rotation.from_euler("x", -90, degrees=True).as_matrix()
    rng = np.random.default_rng(5)
    wins = []
    for k in range(3):
        yaw = rng.uniform(0, 2 * np.pi)
        r1 = base @ Rotation.from_euler("z", yaw).as_matrix()
        o1 = np.array([rng.uniform(-2, 2), rng.uniform(-2, 2), 1.5])
        img1 = _render_view(r1, o1)
        r2 = r1 @ Rotation.from_rotvec([0.05, 0.03, 0.8]).as_matrix()
        o2 = o1 + np.array([0.7, 0.4, -0.3])
        img2 = _render_view(r2, o2)
        img2 = 255.0 * np.clip(img2 / 255.0, 0, 1) ** 1.6 * 0.8 + 20.0
        rl = m.match(img1, img2)
        rc = classical.match(img1, img2)
        wins.append((rl.match_ratio, rc.match_ratio))
        assert rl.match_ratio > rc.match_ratio, wins
    # and decisively on aggregate
    mean_l = np.mean([a for a, _ in wins])
    mean_c = np.mean([b for _, b in wins])
    assert mean_l > 1.5 * mean_c, wins


@pytest.mark.skipif(
    vv.default_weights_paths() is None,
    reason="no trained matcher weights committed",
)
def test_trained_matcher_verifies_loops():
    """The TRAINED SuperPoint+LightGlue artifact must run the reference's
    loop gate end-to-end (laser_mapping.cpp:1314-1322): pass a true loop
    pair (same place, shifted/rotated view) and reject a mismatched pair.
    Also checks default_matcher() actually selects the learned path when
    weights are committed."""
    from scipy.spatial.transform import Rotation

    m = vv.default_matcher()
    assert isinstance(m, vv.SuperPointLightGlue)

    base = Rotation.from_euler("x", -90, degrees=True).as_matrix()
    img1 = _render_view(base, [0.0, 0.0, 0.0])
    img2 = _render_view(
        base @ Rotation.from_rotvec([0.0, 0.04, 0.06]).as_matrix(),
        [0.25, 0.15, 0.05],
    )
    ok, res = vv.verify_loop(img1, img2, m)
    assert ok, f"true loop rejected: ratio {res.match_ratio:.3f}"

    far = base @ Rotation.from_euler("y", 150, degrees=True).as_matrix()
    img3 = _render_view(far, [5.0, 4.0, 0.5])
    ok3, res3 = vv.verify_loop(img1, img3, m)
    assert not ok3, f"mismatched pair accepted: ratio {res3.match_ratio:.3f}"
