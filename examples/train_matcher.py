"""Train tiny in-repo SuperPoint + LightGlue weights on synthetic renders.

The reference ships a working ONNX runner but NO weight blobs
(reference: include/LightGlue/LightGlueDecoupleOnnxRunner.cpp:93-263;
config/weight/*.onnx are .MISSING_LARGE_BLOBS placeholders), and this
environment has no network access — so the learned loop-verification path
is made REAL by training the repo's own JAX forwards from scratch on the
synthetic textured room (io/render), whose analytic geometry gives exact
dense correspondences (the room is convex and viewed from inside: no
occlusion).

Recipe:
- SuperPoint (full architecture, backend/superpoint_lightglue._CONVS):
  * detector head: 65-way cell classification against Shi-Tomasi
    pseudo-labels of the CLEAN render (the classical detector supplies
    where; the learning buys invariant descriptors);
  * descriptor head: symmetric InfoNCE over the 1/8-resolution descriptor
    grids of a render pair, positives from the exact geometric
    correspondence, under per-image brightness gain/bias/gamma
    augmentation.
- LightGlue (reduced n_layers, default 3 — the npz records its depth):
  frozen SuperPoint supplies keypoints+descriptors; loss is the NLL of the
  dual-softmax assignment at ground-truth pairs (mutual reprojection
  < 3 px) plus matchability BCE.

Artifacts: fastlivo_tpu/weights/superpoint_synth.npz +
lightglue_synth.npz (float16 storage; load_npz promotes to f32). These are
DOMAIN weights — trained to beat the classical OrientedPatchMatcher on
this framework's render domain under viewpoint+illumination change
(tests/test_superpoint_lightglue.py gates exactly that), not a
general-purpose matcher.

Run (TPU, ~10 min):  python examples/train_matcher.py
Quick smoke:         python examples/train_matcher.py --steps-sp 20 \
                         --steps-lg 20 --pairs 16 --no-save
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CAM_W, CAM_H = 320, 256
HC, WC = CAM_H // 8, CAM_W // 8
G = HC * WC  # descriptor-grid cells per image


def make_cam():
    from fastlivo_tpu.ops.camera import Pinhole

    return Pinhole(width=CAM_W, height=CAM_H, fx=200.0, fy=200.0,
                   cx=160.0, cy=128.0)


def pose_matrices(o, yaw, pitch, roll):
    """World->camera (rcw, pcw) for a camera at `o` looking along
    (yaw, pitch) with in-plane roll."""
    d = np.array(
        [np.cos(pitch) * np.cos(yaw), np.cos(pitch) * np.sin(yaw),
         np.sin(pitch)]
    )
    up0 = np.array([0.0, 0.0, 1.0])
    right = np.cross(d, up0)
    right = right / (np.linalg.norm(right) + 1e-9)
    down = np.cross(d, right)  # image +y
    c, s = np.cos(roll), np.sin(roll)
    x_cam = c * right + s * down
    y_cam = -s * right + c * down
    r_wc = np.stack([x_cam, y_cam, d], axis=1)  # columns = camera axes
    rcw = r_wc.T.astype(np.float32)
    pcw = (-rcw @ o).astype(np.float32)
    return rcw, pcw


def sample_pose(rng):
    o = np.array([rng.uniform(-4, 4), rng.uniform(-4, 4), rng.uniform(0.5, 4.0)])
    return (
        o,
        rng.uniform(0, 2 * np.pi),
        rng.uniform(-0.45, 0.25),
        rng.uniform(-0.9, 0.9),
    )


def perturb_pose(rng, o, yaw, pitch, roll):
    o1 = o + rng.uniform(-1.2, 1.2, 3)
    o1[2] = np.clip(o1[2], 0.5, 4.0)
    return (
        o1,
        yaw + rng.normal(0, 0.22),
        np.clip(pitch + rng.normal(0, 0.12), -0.5, 0.3),
        roll + rng.uniform(-0.7, 0.7),
    )


def build_dataset(n_pairs, seed, st_thresh=25.0, min_overlap=0.35):
    """Pre-render pairs + supervision on the accelerator; return host arrays.

    Returns dict of np arrays:
      img0/img1 (N, H, W) clean renders in [0, 255]
      det0/det1 (N, G) int32 detector cell labels (0..63 position, 64 none)
      corr01/corr10 (N, G) int32 target cell in the other image (-1 invalid)
      uv1_of0 (N, G, 2) f32 exact reprojection of cell centers (for LG GT)
      rcw0/pcw0/rcw1/pcw1 pose arrays
    """
    import jax
    import jax.numpy as jnp

    from fastlivo_tpu.io import render
    from fastlivo_tpu.ops import image as img_ops

    cam = make_cam()
    rng = np.random.default_rng(seed)
    rrender = jax.jit(render.render_room_hits, static_argnames="cam")
    st_dense = jax.jit(img_ops.shi_tomasi_dense)

    def det_labels(img):
        """Per-8x8-cell Shi-Tomasi argmax position (0..63) or dustbin 64."""
        st = np.asarray(st_dense(jnp.asarray(img)))
        st = st.reshape(HC, 8, WC, 8).transpose(0, 2, 1, 3).reshape(HC, WC, 64)
        pos = st.argmax(axis=-1)
        lab = np.where(st.max(axis=-1) > st_thresh, pos, 64)
        return lab.reshape(-1).astype(np.int32)

    # Cell centers (pixel coords of the descriptor grid).
    cy, cx = np.meshgrid(np.arange(HC) * 8 + 4, np.arange(WC) * 8 + 4,
                         indexing="ij")
    centers = np.stack([cx, cy], -1).reshape(-1, 2)  # (G, 2) xy

    def corr_targets(hits, valid, rcw_o, pcw_o):
        """For each cell center of THIS image: target cell index in the
        OTHER image (or -1), and the exact reprojected uv."""
        hp = hits[centers[:, 1], centers[:, 0]]  # (G, 3) world
        ok = valid[centers[:, 1], centers[:, 0]]
        p_c = hp @ rcw_o.T + pcw_o
        z_ok = p_c[:, 2] > 0.05
        uv = np.stack(
            [
                200.0 * p_c[:, 0] / np.maximum(p_c[:, 2], 1e-6) + 160.0,
                200.0 * p_c[:, 1] / np.maximum(p_c[:, 2], 1e-6) + 128.0,
            ],
            -1,
        )
        inf = (
            (uv[:, 0] >= 4) & (uv[:, 0] < CAM_W - 4)
            & (uv[:, 1] >= 4) & (uv[:, 1] < CAM_H - 4)
        )
        cell = (
            np.clip(uv[:, 1] // 8, 0, HC - 1) * WC
            + np.clip(uv[:, 0] // 8, 0, WC - 1)
        ).astype(np.int32)
        tgt = np.where(ok & z_ok & inf, cell, -1).astype(np.int32)
        return tgt, uv.astype(np.float32), (ok & z_ok & inf)

    data = {k: [] for k in (
        "img0", "img1", "det0", "det1", "corr01", "corr10", "uv1_of0",
        "rcw0", "pcw0", "rcw1", "pcw1",
    )}
    tries = 0
    while len(data["img0"]) < n_pairs:
        tries += 1
        p0 = sample_pose(rng)
        p1 = perturb_pose(rng, *p0)
        rcw0, pcw0 = pose_matrices(*p0)
        rcw1, pcw1 = pose_matrices(*p1)
        i0, h0, v0 = rrender(cam, jnp.asarray(rcw0), jnp.asarray(pcw0))
        i1, h1, v1 = rrender(cam, jnp.asarray(rcw1), jnp.asarray(pcw1))
        i0, h0, v0 = np.asarray(i0), np.asarray(h0), np.asarray(v0)
        i1, h1, v1 = np.asarray(i1), np.asarray(h1), np.asarray(v1)
        c01, uv1, m01 = corr_targets(h0, v0, rcw1, pcw1)
        c10, _, m10 = corr_targets(h1, v1, rcw0, pcw0)
        if m01.mean() < min_overlap or m10.mean() < min_overlap:
            continue
        data["img0"].append(i0)
        data["img1"].append(i1)
        data["det0"].append(det_labels(i0))
        data["det1"].append(det_labels(i1))
        data["corr01"].append(c01)
        data["corr10"].append(c10)
        data["uv1_of0"].append(uv1)
        data["rcw0"].append(rcw0)
        data["pcw0"].append(pcw0)
        data["rcw1"].append(rcw1)
        data["pcw1"].append(pcw1)
    return {k: np.stack(v) for k, v in data.items()}


def augment(rng, imgs):
    """Per-image brightness gain/bias/gamma on [0,255] renders -> [0,1]."""
    b = imgs.shape[0]
    g = rng.uniform(0.6, 1.5, (b, 1, 1)).astype(np.float32)
    off = rng.uniform(-0.12, 0.12, (b, 1, 1)).astype(np.float32)
    gamma = rng.uniform(0.7, 1.4, (b, 1, 1)).astype(np.float32)
    x = np.clip(imgs / 255.0, 0.0, 1.0) ** gamma
    return np.clip(g * x + off, 0.0, 1.0).astype(np.float32)


def train_superpoint(ds, steps, batch, seed, lr=3e-4, log_every=100):
    import jax
    import jax.numpy as jnp
    import optax

    from fastlivo_tpu.backend import superpoint_lightglue as spl

    w = spl.init_superpoint(seed)
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(optax.cosine_decay_schedule(lr, steps)),
    )
    opt_state = opt.init(w)
    rng = np.random.default_rng(seed + 1)
    n = ds["img0"].shape[0]
    tau = 0.1

    def loss_fn(w, img0, img1, det0, det1, c01, c10):
        logits0, d0 = jax.vmap(lambda im: spl.superpoint_logits(w, im))(img0)
        logits1, d1 = jax.vmap(lambda im: spl.superpoint_logits(w, im))(img1)

        def det_ce(logits, lab):
            lp = jax.nn.log_softmax(logits.reshape(-1, G, 65), axis=-1)
            return -jnp.mean(
                jnp.take_along_axis(lp, lab[:, :, None], axis=-1)
            )

        l_det = det_ce(logits0, det0) + det_ce(logits1, det1)

        def nce(da, db, tgt):
            # da/db: (B, G, 256); tgt: (B, G) target cell in db or -1.
            sim = jnp.einsum("bgc,bhc->bgh", da, db) / tau
            lp = jax.nn.log_softmax(sim, axis=-1)
            ok = tgt >= 0
            pick = jnp.take_along_axis(
                lp, jnp.maximum(tgt, 0)[:, :, None], axis=-1
            )[:, :, 0]
            return -jnp.sum(jnp.where(ok, pick, 0.0)) / jnp.maximum(
                jnp.sum(ok), 1
            )

        l_desc = nce(d0.reshape(-1, G, 256), d1.reshape(-1, G, 256), c01) + nce(
            d1.reshape(-1, G, 256), d0.reshape(-1, G, 256), c10
        )
        return l_det + l_desc, (l_det, l_desc)

    @jax.jit
    def step(w, opt_state, img0, img1, det0, det1, c01, c10):
        (l, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            w, img0, img1, det0, det1, c01, c10
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(w, updates), opt_state, l, aux

    for it in range(steps):
        idx = rng.integers(0, n, batch)
        img0 = augment(rng, ds["img0"][idx])
        img1 = augment(rng, ds["img1"][idx])
        w, opt_state, l, (ld, lde) = step(
            w, opt_state, jnp.asarray(img0), jnp.asarray(img1),
            jnp.asarray(ds["det0"][idx]), jnp.asarray(ds["det1"][idx]),
            jnp.asarray(ds["corr01"][idx]), jnp.asarray(ds["corr10"][idx]),
        )
        if it % log_every == 0 or it == steps - 1:
            print(f"[sp {it:5d}] loss={float(l):.4f} det={float(ld):.4f} "
                  f"desc={float(lde):.4f}", flush=True)
    return w


def build_lg_dataset(ds, sp_w, max_kp=256, gt_px=3.0):
    """Frozen-SuperPoint keypoints/descriptors + GT assignment per pair."""
    import jax
    import jax.numpy as jnp

    from fastlivo_tpu.backend import superpoint_lightglue as spl

    extract = jax.jit(
        lambda im: spl.extract_keypoints(sp_w, im, max_kp)
    )
    n = ds["img0"].shape[0]
    out = {k: [] for k in ("k0", "d0", "v0", "k1", "d1", "v1", "gt")}
    for i in range(n):
        i0 = np.clip(ds["img0"][i] / 255.0, 0, 1).astype(np.float32)
        i1 = np.clip(ds["img1"][i] / 255.0, 0, 1).astype(np.float32)
        k0, d0, v0 = (np.asarray(a) for a in extract(jnp.asarray(i0)))
        k1, d1, v1 = (np.asarray(a) for a in extract(jnp.asarray(i1)))
        # GT: project k0 through the exact geometry (uv1_of0 is on the cell
        # grid; recompute per keypoint from the nearest hit-cell is noisy,
        # so use the dense uv map bilinearly).
        uv1 = ds["uv1_of0"][i].reshape(HC, WC, 2)
        gx = np.clip(k0[:, 0] / 8.0 - 0.5, 0, WC - 1.001)
        gy = np.clip(k0[:, 1] / 8.0 - 0.5, 0, HC - 1.001)
        x0, y0 = gx.astype(int), gy.astype(int)
        fx, fy = (gx - x0)[:, None], (gy - y0)[:, None]
        proj = (
            uv1[y0, x0] * (1 - fx) * (1 - fy)
            + uv1[y0, np.minimum(x0 + 1, WC - 1)] * fx * (1 - fy)
            + uv1[np.minimum(y0 + 1, HC - 1), x0] * (1 - fx) * fy
            + uv1[np.minimum(y0 + 1, HC - 1), np.minimum(x0 + 1, WC - 1)]
            * fx * fy
        )
        d2 = np.sum((proj[:, None, :] - k1[None, :, :]) ** 2, axis=-1)
        j = d2.argmin(axis=1)
        ok = (
            (d2[np.arange(len(k0)), j] < gt_px**2)
            & v0 & v1[j]
            & (proj[:, 0] > 0) & (proj[:, 0] < CAM_W)
            & (proj[:, 1] > 0) & (proj[:, 1] < CAM_H)
        )
        gt = np.where(ok, j, -1).astype(np.int32)
        for k, v in zip(
            ("k0", "d0", "v0", "k1", "d1", "v1", "gt"),
            (k0, d0, v0, k1, d1, v1, gt),
        ):
            out[k].append(v)
    return {k: np.stack(v) for k, v in out.items()}


def train_lightglue(lg_ds, steps, batch, seed, n_layers=3, lr=4e-4,
                    log_every=100):
    import jax
    import jax.numpy as jnp
    import optax

    from fastlivo_tpu.backend import superpoint_lightglue as spl

    w = spl.init_lightglue(seed, n_layers=n_layers)
    # n_layers is metadata, not a parameter.
    meta = {"n_layers": w.pop("n_layers")}
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(optax.cosine_decay_schedule(lr, steps)),
    )
    opt_state = opt.init(w)
    rng = np.random.default_rng(seed + 2)
    n = lg_ds["k0"].shape[0]
    size_wh = jnp.asarray([CAM_W, CAM_H], jnp.float32)

    def pair_loss(w, k0, d0, v0, k1, d1, v1, gt):
        p, m0, m1 = spl.lightglue_forward(
            w, k0, d0, v0, k1, d1, v1, size_wh, n_layers=n_layers
        )
        matched = gt >= 0
        pick = jnp.take_along_axis(
            p, jnp.maximum(gt, 0)[:, None], axis=1
        )[:, 0]
        nll = -jnp.sum(
            jnp.where(matched, jnp.log(pick + 1e-9), 0.0)
        ) / jnp.maximum(jnp.sum(matched), 1)
        # Matchability BCE: matched0 = has a GT partner; matched1 = is some
        # keypoint's GT partner.
        t0 = matched.astype(jnp.float32)
        is_tgt = jnp.zeros(k1.shape[0], jnp.float32).at[
            jnp.maximum(gt, 0)
        ].max(t0)
        bce = lambda m, t, v: -jnp.sum(
            jnp.where(
                v,
                t * jnp.log(m + 1e-9) + (1 - t) * jnp.log(1 - m + 1e-9),
                0.0,
            )
        ) / jnp.maximum(jnp.sum(v), 1)
        return nll + 0.5 * (bce(m0, t0, v0) + bce(m1, is_tgt, v1))

    def loss_fn(w, b):
        losses = jax.vmap(
            lambda k0, d0, v0, k1, d1, v1, gt: pair_loss(
                w, k0, d0, v0, k1, d1, v1, gt
            )
        )(b["k0"], b["d0"], b["v0"], b["k1"], b["d1"], b["v1"], b["gt"])
        return jnp.mean(losses)

    @jax.jit
    def step(w, opt_state, b):
        l, grads = jax.value_and_grad(loss_fn)(w, b)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(w, updates), opt_state, l

    for it in range(steps):
        idx = rng.integers(0, n, batch)
        b = {k: jnp.asarray(v[idx]) for k, v in lg_ds.items()}
        w, opt_state, l = step(w, opt_state, b)
        if it % log_every == 0 or it == steps - 1:
            print(f"[lg {it:5d}] loss={float(l):.4f}", flush=True)
    w.update(meta)
    return w


def adversarial_pair(seed=123, roll_delta=0.9, gamma=1.6):
    """A held-out wide-baseline pair: large in-plane roll + translation +
    strong brightness curve — the regime where patch correlation dies."""
    import jax
    import jax.numpy as jnp

    from fastlivo_tpu.io import render

    cam = make_cam()
    rng = np.random.default_rng(seed)
    o0 = np.array([0.5, -0.8, 2.0])
    p0 = (o0, 0.6, -0.1, 0.15)
    p1 = (o0 + np.array([0.9, 0.5, -0.4]), 0.6 + 0.18, -0.05,
          0.15 + roll_delta)
    rr = jax.jit(render.render_room, static_argnames="cam")
    i0 = np.asarray(rr(cam, *map(jnp.asarray, pose_matrices(*p0))))
    i1 = np.asarray(rr(cam, *map(jnp.asarray, pose_matrices(*p1))))
    # brightness curve on the second frame
    i1 = 255.0 * np.clip(i1 / 255.0, 0, 1) ** gamma * 0.8 + 20.0
    return i0, i1


def evaluate(sp_w, lg_w, n_pairs=6):
    """Learned vs classical match ratio on adversarial held-out pairs."""
    from fastlivo_tpu.backend import superpoint_lightglue as spl
    from fastlivo_tpu.backend.visual_verify import OrientedPatchMatcher

    learned = spl.SuperPointLightGlueMatcher(sp_w, lg_w, max_keypoints=256)
    classical = OrientedPatchMatcher()
    rows = []
    for k in range(n_pairs):
        i0, i1 = adversarial_pair(seed=1000 + k)
        rl = learned.match(i0, i1)
        rc = classical.match(i0, i1)
        rows.append((rl.match_ratio, len(rl.pts1), rc.match_ratio,
                     len(rc.pts1)))
        print(
            f"[eval {k}] learned ratio={rl.match_ratio:.3f} "
            f"({len(rl.pts1)} matches)  classical ratio="
            f"{rc.match_ratio:.3f} ({len(rc.pts1)})", flush=True,
        )
    return rows


def save_f16(path, w):
    out = {}
    for k, v in w.items():
        a = np.asarray(v)
        out[k] = a.astype(np.float16) if np.issubdtype(a.dtype, np.floating) else a
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB)")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pairs", type=int, default=384)
    ap.add_argument("--steps-sp", type=int, default=3000)
    ap.add_argument("--steps-lg", type=int, default=2500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lg-layers", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-save", action="store_true")
    ap.add_argument(
        "--out", default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fastlivo_tpu", "weights",
        ),
    )
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    t0 = time.time()
    print(f"rendering {args.pairs} training pairs ...", flush=True)
    ds = build_dataset(args.pairs, args.seed)
    dust = float((ds["det0"] == 64).mean())
    corr = float((ds["corr01"] >= 0).mean())
    print(f"dataset in {time.time() - t0:.0f}s "
          f"(detector dustbin frac {dust:.2f}, corr frac {corr:.2f}); "
          f"training SuperPoint ...", flush=True)
    sp_w = train_superpoint(ds, args.steps_sp, args.batch, args.seed)
    print("building LightGlue dataset ...", flush=True)
    lg_ds = build_lg_dataset(ds, sp_w)
    frac = float((lg_ds["gt"] >= 0).mean())
    print(f"GT match fraction: {frac:.2f}")
    lg_w = train_lightglue(
        lg_ds, args.steps_lg, max(args.batch // 2, 1), args.seed,
        n_layers=args.lg_layers,
    )
    rows = evaluate(sp_w, lg_w)
    if not args.no_save:
        os.makedirs(args.out, exist_ok=True)
        save_f16(os.path.join(args.out, "superpoint_synth.npz"), sp_w)
        save_f16(os.path.join(args.out, "lightglue_synth.npz"), lg_w)
    print(f"done in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
