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


def build_dataset(n_pairs, seed, st_thresh=25.0, min_overlap=0.35,
                  chunk=32):
    """Render pairs + supervision ON DEVICE and keep them there.

    FETCH-FREE by design: on this environment's tunneled PJRT client the
    FIRST host fetch permanently degrades every subsequent dispatch from
    ~0.1-2 ms to ~250-850 ms (CLAUDE.md) — the original per-pair host loop
    fetched 6 arrays per pair and made training take hours. Here rendering
    is vmapped in chunks, supervision is computed on device, pairs failing
    the overlap gate are compacted to the END (device argsort), and the
    training sampler draws indices below a DEVICE-side n_valid — nothing
    is fetched until after the last training step.

    Returns (ds, n_valid): dict of device arrays
      img0/img1 (M, H, W) clean renders in [0, 255]
      det0/det1 (M, G) int32 detector cell labels (0..63 position, 64 none)
      corr01/corr10 (M, G) int32 target cell in the other image (-1 invalid)
      uv1_of0 (M, G, 2) f32 exact reprojection of cell centers (for LG GT)
    with the first n_valid rows overlap-valid (M = 2 * n_pairs oversample).
    """
    import jax
    import jax.numpy as jnp

    from fastlivo_tpu.io import render
    from fastlivo_tpu.ops import image as img_ops

    cam = make_cam()
    rng = np.random.default_rng(seed)

    m = 2 * n_pairs
    m = ((m + chunk - 1) // chunk) * chunk
    poses = []
    for _ in range(m):
        p0 = sample_pose(rng)
        p1 = perturb_pose(rng, *p0)
        poses.append(pose_matrices(*p0) + pose_matrices(*p1))
    rcw0 = np.stack([p[0] for p in poses])
    pcw0 = np.stack([p[1] for p in poses])
    rcw1 = np.stack([p[2] for p in poses])
    pcw1 = np.stack([p[3] for p in poses])

    # Cell centers (pixel coords of the descriptor grid).
    cy, cx = np.meshgrid(np.arange(HC) * 8 + 4, np.arange(WC) * 8 + 4,
                         indexing="ij")
    centers = np.stack([cx, cy], -1).reshape(-1, 2)  # (G, 2) xy
    cen_x = jnp.asarray(centers[:, 0])
    cen_y = jnp.asarray(centers[:, 1])

    def det_labels(img):
        """Per-8x8-cell Shi-Tomasi argmax position (0..63) or dustbin 64."""
        st = img_ops.shi_tomasi_dense(img)
        st = st.reshape(HC, 8, WC, 8).transpose(0, 2, 1, 3).reshape(
            HC, WC, 64
        )
        pos = st.argmax(axis=-1)
        lab = jnp.where(st.max(axis=-1) > st_thresh, pos, 64)
        return lab.reshape(-1).astype(jnp.int32)

    def corr_targets(hits, valid, rcw_o, pcw_o):
        """For each cell center of THIS image: target cell index in the
        OTHER image (or -1), and the exact reprojected uv."""
        hp = hits[cen_y, cen_x]  # (G, 3) world
        ok = valid[cen_y, cen_x]
        p_c = hp @ rcw_o.T + pcw_o
        z_ok = p_c[:, 2] > 0.05
        z = jnp.maximum(p_c[:, 2], 1e-6)
        uv = jnp.stack(
            [200.0 * p_c[:, 0] / z + 160.0, 200.0 * p_c[:, 1] / z + 128.0],
            -1,
        )
        inf = (
            (uv[:, 0] >= 4) & (uv[:, 0] < CAM_W - 4)
            & (uv[:, 1] >= 4) & (uv[:, 1] < CAM_H - 4)
        )
        cell = (
            jnp.clip(uv[:, 1] // 8, 0, HC - 1) * WC
            + jnp.clip(uv[:, 0] // 8, 0, WC - 1)
        ).astype(jnp.int32)
        good = ok & z_ok & inf
        tgt = jnp.where(good, cell, -1).astype(jnp.int32)
        return tgt, uv.astype(jnp.float32), good

    def one_pair(r0, p0, r1, p1):
        i0, h0, v0 = render.render_room_hits(cam, r0, p0)
        i1, h1, v1 = render.render_room_hits(cam, r1, p1)
        c01, uv1, m01 = corr_targets(h0, v0, r1, p1)
        c10, _, m10 = corr_targets(h1, v1, r0, p0)
        ok = (jnp.mean(m01.astype(jnp.float32)) >= min_overlap) & (
            jnp.mean(m10.astype(jnp.float32)) >= min_overlap
        )
        return i0, i1, det_labels(i0), det_labels(i1), c01, c10, uv1, ok

    pair_batch = jax.jit(jax.vmap(one_pair))
    parts = []
    for s in range(0, m, chunk):
        sl = slice(s, s + chunk)
        parts.append(pair_batch(
            jnp.asarray(rcw0[sl]), jnp.asarray(pcw0[sl]),
            jnp.asarray(rcw1[sl]), jnp.asarray(pcw1[sl]),
        ))
    cat = [jnp.concatenate([p[i] for p in parts]) for i in range(8)]
    img0, img1, det0, det1, c01, c10, uv1, ok = cat

    # Valid pairs first (stable argsort of the fail flag); training draws
    # indices < n_valid.
    order = jnp.argsort((~ok).astype(jnp.int32), stable=True)
    ds = {
        "img0": img0[order], "img1": img1[order],
        "det0": det0[order], "det1": det1[order],
        "corr01": c01[order], "corr10": c10[order],
        "uv1_of0": uv1[order],
    }
    n_valid = jnp.sum(ok.astype(jnp.int32))
    return ds, n_valid


def train_superpoint(ds, n_valid, steps, batch, seed, lr=3e-4,
                     chunk_steps=100):
    """SuperPoint training as chained device dispatches: lax.scan over
    `chunk_steps` optimizer steps per dispatch, batches gathered on device
    below n_valid, jax.random brightness augmentation — no host fetch
    anywhere (loss curves are returned as device arrays and fetched by the
    CALLER after everything else is done)."""
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

    def augment_j(key, imgs):
        b = imgs.shape[0]
        kg, ko, kgam = jax.random.split(key, 3)
        g = jax.random.uniform(kg, (b, 1, 1), minval=0.6, maxval=1.5)
        off = jax.random.uniform(ko, (b, 1, 1), minval=-0.12, maxval=0.12)
        gamma = jax.random.uniform(kgam, (b, 1, 1), minval=0.7, maxval=1.4)
        x = jnp.clip(imgs / 255.0, 0.0, 1.0) ** gamma
        return jnp.clip(g * x + off, 0.0, 1.0)

    # ds/n_valid MUST be jit ARGUMENTS, not closure captures: closed-over
    # concrete arrays are embedded as constants in the serialized HLO, and
    # this environment's remote-compile tunnel rejects the ~500 MB module
    # with HTTP 413. As arguments they stay device buffers by handle.
    @jax.jit
    def train_chunk(w, opt_state, key, ds, n_valid):
        def one_step(carry, _):
            w, opt_state, key = carry
            key, ki, k0, k1 = jax.random.split(key, 4)
            idx = jax.random.randint(
                ki, (batch,), 0, jnp.maximum(n_valid, 1)
            )
            img0 = augment_j(k0, ds["img0"][idx])
            img1 = augment_j(k1, ds["img1"][idx])
            (l, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                w, img0, img1,
                ds["det0"][idx], ds["det1"][idx],
                ds["corr01"][idx], ds["corr10"][idx],
            )
            updates, opt_state = opt.update(grads, opt_state)
            return (optax.apply_updates(w, updates), opt_state, key), l

        (w, opt_state, key), ls = jax.lax.scan(
            one_step, (w, opt_state, key), None, length=chunk_steps
        )
        return w, opt_state, key, ls

    key = jax.random.PRNGKey(seed + 1)
    losses = []
    chunk_steps = min(chunk_steps, max(steps, 1))
    n_chunks = max(steps // chunk_steps, 1)
    for c in range(n_chunks):
        w, opt_state, key, ls = train_chunk(w, opt_state, key, ds, n_valid)
        losses.append(ls)
        print(f"[sp] chunk {c + 1}/{n_chunks} dispatched", flush=True)
    return w, jnp.concatenate(losses)


def build_lg_dataset(ds, sp_w, max_kp=256, gt_px=3.0, chunk=32):
    """Frozen-SuperPoint keypoints/descriptors + GT assignment per pair,
    entirely on device (vmapped extraction in chunks, no host fetch)."""
    import jax
    import jax.numpy as jnp

    from fastlivo_tpu.backend import superpoint_lightglue as spl

    def one(i0_raw, i1_raw, uv1_flat):
        i0 = jnp.clip(i0_raw / 255.0, 0.0, 1.0)
        i1 = jnp.clip(i1_raw / 255.0, 0.0, 1.0)
        k0, d0, v0 = spl.extract_keypoints(sp_w, i0, max_kp)
        k1, d1, v1 = spl.extract_keypoints(sp_w, i1, max_kp)
        # GT: project k0 through the exact geometry (uv1_of0 is on the cell
        # grid; sample it bilinearly at each keypoint).
        uv1 = uv1_flat.reshape(HC, WC, 2)
        gx = jnp.clip(k0[:, 0] / 8.0 - 0.5, 0, WC - 1.001)
        gy = jnp.clip(k0[:, 1] / 8.0 - 0.5, 0, HC - 1.001)
        x0 = gx.astype(jnp.int32)
        y0 = gy.astype(jnp.int32)
        fx, fy = (gx - x0)[:, None], (gy - y0)[:, None]
        x1 = jnp.minimum(x0 + 1, WC - 1)
        y1 = jnp.minimum(y0 + 1, HC - 1)
        proj = (
            uv1[y0, x0] * (1 - fx) * (1 - fy)
            + uv1[y0, x1] * fx * (1 - fy)
            + uv1[y1, x0] * (1 - fx) * fy
            + uv1[y1, x1] * fx * fy
        )
        d2 = jnp.sum((proj[:, None, :] - k1[None, :, :]) ** 2, axis=-1)
        j = jnp.argmin(d2, axis=1)
        ok = (
            (jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0] < gt_px**2)
            & v0 & v1[j]
            & (proj[:, 0] > 0) & (proj[:, 0] < CAM_W)
            & (proj[:, 1] > 0) & (proj[:, 1] < CAM_H)
        )
        gt = jnp.where(ok, j, -1).astype(jnp.int32)
        return k0, d0, v0, k1, d1, v1, gt

    batched = jax.jit(jax.vmap(one))
    m = ds["img0"].shape[0]
    parts = []
    for s in range(0, m, chunk):
        sl = slice(s, s + chunk)
        parts.append(
            batched(ds["img0"][sl], ds["img1"][sl], ds["uv1_of0"][sl])
        )
    cat = [jnp.concatenate([p[i] for p in parts]) for i in range(7)]
    return dict(zip(("k0", "d0", "v0", "k1", "d1", "v1", "gt"), cat))


def train_lightglue(lg_ds, n_valid, steps, batch, seed, n_layers=3,
                    lr=4e-4, chunk_steps=100):
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

    # Dataset as jit ARGUMENT (not closure constant) — see train_superpoint.
    @jax.jit
    def train_chunk(w, opt_state, key, lg_ds, n_valid):
        def one_step(carry, _):
            w, opt_state, key = carry
            key, ki = jax.random.split(key)
            idx = jax.random.randint(
                ki, (batch,), 0, jnp.maximum(n_valid, 1)
            )
            b = {k: v[idx] for k, v in lg_ds.items()}
            l, grads = jax.value_and_grad(loss_fn)(w, b)
            updates, opt_state = opt.update(grads, opt_state)
            return (optax.apply_updates(w, updates), opt_state, key), l

        (w, opt_state, key), ls = jax.lax.scan(
            one_step, (w, opt_state, key), None, length=chunk_steps
        )
        return w, opt_state, key, ls

    key = jax.random.PRNGKey(seed + 2)
    losses = []
    chunk_steps = min(chunk_steps, max(steps, 1))
    n_chunks = max(steps // chunk_steps, 1)
    for c in range(n_chunks):
        w, opt_state, key, ls = train_chunk(w, opt_state, key, lg_ds, n_valid)
        losses.append(ls)
        print(f"[lg] chunk {c + 1}/{n_chunks} dispatched", flush=True)
    w.update(meta)
    return w, jnp.concatenate(losses)


def adversarial_pair(seed=123, roll_delta=0.9, gamma=1.6):
    """A held-out wide-baseline pair: large in-plane roll + translation +
    strong brightness curve — the regime where patch correlation dies."""
    import jax
    import jax.numpy as jnp

    from fastlivo_tpu.io import render

    cam = make_cam()
    rng = np.random.default_rng(seed)
    o0 = np.array([0.5, -0.8, 2.0]) + rng.uniform(-1.0, 1.0, 3)
    o0[2] = np.clip(o0[2], 0.8, 3.5)
    yaw0 = rng.uniform(0, 2 * np.pi)
    p0 = (o0, yaw0, rng.uniform(-0.2, 0.0), rng.uniform(-0.3, 0.3))
    p1 = (o0 + np.array([0.9, 0.5, -0.4]) * rng.uniform(0.6, 1.2),
          yaw0 + 0.18, p0[2] + 0.05, p0[3] + roll_delta)
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
    # PHASE ORDER MATTERS: everything up to the first fetch runs at
    # fetch-free dispatch speed; diagnostics that need host values are
    # collected as device scalars and printed at the very END.
    print(f"rendering {args.pairs} training pairs (device) ...", flush=True)
    ds, n_valid = build_dataset(args.pairs, args.seed)
    print(f"render dispatched in {time.time() - t0:.0f}s; "
          f"training SuperPoint ...", flush=True)
    sp_w, sp_losses = train_superpoint(
        ds, n_valid, args.steps_sp, args.batch, args.seed
    )
    print("building LightGlue dataset (device) ...", flush=True)
    lg_ds = build_lg_dataset(ds, sp_w)
    lg_w, lg_losses = train_lightglue(
        lg_ds, n_valid, args.steps_lg, max(args.batch // 2, 1), args.seed,
        n_layers=args.lg_layers,
    )
    # ---- first host fetches (degrades later dispatches; eval tolerates it)
    import jax

    jax.block_until_ready(lg_losses)
    print(f"all training dispatched in {time.time() - t0:.0f}s; "
          "fetching diagnostics ...", flush=True)
    dust = float((np.asarray(ds["det0"]) == 64).mean())
    gtfrac = float((np.asarray(lg_ds["gt"]) >= 0).mean())
    sp_l = np.asarray(sp_losses)
    lg_l = np.asarray(lg_losses)
    print(
        f"n_valid={int(np.asarray(n_valid))}/{ds['img0'].shape[0]} "
        f"dustbin={dust:.2f} gt_frac={gtfrac:.2f}\n"
        f"sp loss {sp_l[:5].mean():.4f} -> {sp_l[-50:].mean():.4f}  "
        f"lg loss {lg_l[:5].mean():.4f} -> {lg_l[-50:].mean():.4f}",
        flush=True,
    )
    rows = evaluate(sp_w, lg_w)
    if not args.no_save:
        os.makedirs(args.out, exist_ok=True)
        save_f16(os.path.join(args.out, "superpoint_synth.npz"), sp_w)
        save_f16(os.path.join(args.out, "lightglue_synth.npz"), lg_w)
    print(f"done in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
