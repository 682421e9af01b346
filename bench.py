"""Benchmark: registered points/sec through the fused per-scan LIO step.

Runs the flagship device program (IMU propagate -> undistort -> voxel
downsample -> iterated surfel ESKF with in-graph re-match -> map insert)
in steady state on the default platform (real TPU under the driver) and
prints ONE JSON line.

Baseline: the reference's committed timing log
(/root/reference/Log/fast_livo_time_log.csv — ~0.013-0.028 s per scan on
x86, BASELINE.md) with its avia config processing roughly 10k downsampled
points per scan => ~5e5 registered points/sec. vs_baseline is our
points/sec over that 5e5.

Measurement method (round-3 correction): on this environment's tunneled
PJRT client, block_until_ready returns BEFORE execution completes
(verified with a 515 GFLOP/step matmul chain "finishing" at 18 us/step),
so EVERY wall-clock chain timing — including rounds 1-2's committed
numbers — measured enqueue throughput, not device time. The headline
numbers here come from jax.profiler DEVICE-OP durations over a traced
window of each program; the wall-clock slope is still reported as
`enqueue_per_scan_ms` (it is the real bound on host-side dispatch).

Ceiling (replaces round 2's analytic roofline, which the kernel already
beat — a model the kernel exceeds certifies nothing): the surfel update's
per-match memory traffic is exactly one `surfel_candidate` stencil probe
+ the winner's moment gathers. `arena_gather_pass` runs THOSE SAME
gathers (same arena, same query points, same index distribution) with
only a cheap sum reduction; ceiling_frac = achieved nnz/s over that
measured ceiling, both from profiler device times.
"""

import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_POINTS_PER_SEC = 5.0e5


def _slope_windows(run_chain, k1, k2, n_windows):
    """Median/spread of per-step time via two-depth chains.

    run_chain(k) must dispatch k chained steps and block until ready.
    Returns (median_s, spread_s, samples): spread is max-min over windows.
    """
    samples = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        run_chain(k1)
        t1 = time.perf_counter()
        run_chain(k2)
        t2 = time.perf_counter()
        samples.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    med = float(np.median(samples))
    spread = float(np.max(samples) - np.min(samples))
    return med, spread, samples


def _trace_device_totals(trace_dir):
    """Per-jitted-program device-time totals from a jax.profiler trace.

    Returns ({program: total_us}, {program: captured_calls}). Division by
    the CAPTURED call count makes the per-call number robust to the
    profiler sampling only part of the window.
    """
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    with gzip.open(files[-1]) as fh:
        tr = json.load(fh)
    pids = {
        e["pid"]: e["args"]["name"]
        for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dur, cnt = {}, {}
    for e in tr["traceEvents"]:
        if e.get("ph") != "X":
            continue
        pname = pids.get(e["pid"], "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e["name"]
        if name.startswith("jit_"):
            base = name.split("(")[0]
            dur[base] = dur.get(base, 0) + e.get("dur", 0)
            cnt[base] = cnt.get(base, 0) + 1
    return dur, cnt


def main(smoke: bool = False):
    import jax
    import jax.numpy as jnp

    from fastlivo_tpu.maps import voxel_map as vm
    from fastlivo_tpu.models import pipeline as pl_mod
    from fastlivo_tpu.models.imu import ImuWindow
    from fastlivo_tpu.state import NavState

    # Flagship configuration: the surfel measurement model (per-voxel
    # running moments, zero kNN in the iterated update) at the full
    # 65k-point budget. Round-1 note: the "262k cliff" and the 16k
    # downsizing were artifacts of benchmarking without buffer donation
    # (an undonated arena costs ~300 ms/step in XLA copies); with donation
    # the 65k step is ~0.15 ms on v5e.
    from fastlivo_tpu.models import lio as lio_mod

    n_raw = 8192 if smoke else 81920
    imu_m = 32
    # r5 profiling (examples/profile_16k.py): the step cost scales with
    # the STATIC unique-table rows and the arena capacity (claim/scatter
    # row traffic + gather reach), not the stencil width. The scene
    # occupies ~5-8k distinct voxels, so a 2^18 arena + unique cap 8192
    # cut the step 65.1 -> 43.9 ms on the profiling harness with n_eff
    # EXACTLY preserved (cap 6144 saves another 1.4 ms but truncates this
    # scene's unique table: n_eff 45594 -> 44186 — rejected). Large-area
    # outdoor deployments size capacity up (configs/*.yaml keep 2^19+);
    # that headroom's cost is the measured 2^19 -> 2^18 delta (~7 ms).
    cfg = pl_mod.StepConfig(
        map_cfg=vm.VoxelMapConfig(
            resolution=0.5, capacity=1 << (14 if smoke else 18),
            max_points=32, nearby_type=18,
            # smoke: force the unique-voxel dedup path at the small budget
            lookup_unique_cap=1024 if smoke else 8192,
        ),
        lio_cfg=lio_mod.LioConfig(measurement_model="surfel"),
        ds_capacity=4096 if smoke else 65536,
        imu_window=imu_m,
    )
    k_lio = (2, 6) if smoke else (10, 30)
    k_livo = (1, 3) if smoke else (6, 18)
    n_windows = 2 if smoke else 5
    i3 = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)

    rng = np.random.default_rng(0)

    def room_scan(pose_pos, n):
        """Points on the faces of a 16 m box observed from pose_pos."""
        per = n // 5
        pts = []
        for face in range(5):
            u = rng.uniform(-8, 8, size=(per, 2))
            if face == 0:
                p = np.stack([u[:, 0], u[:, 1], np.full(per, -1.5)], 1)
            else:
                axis, val = [(0, -8), (0, 8), (1, -8), (1, 8)][face - 1]
                p = np.zeros((per, 3))
                p[:, axis] = val
                p[:, 1 - axis] = u[:, 0]
                p[:, 2] = u[:, 1] + 4
            pts.append(p)
        w = np.concatenate(pts)
        pad = n - len(w)
        if pad:
            w = np.concatenate([w, w[:pad]])
        return (w - pose_pos).astype(np.float32)

    # Periodic circular trajectory (period = the scan-pool size): the pool
    # cycles seamlessly — with a linear trajectory the wrap would be a
    # 0.8 m teleport that trips the health gate and pollutes the timing.
    n_pool = 40
    _r_traj = 1.0

    def pose_at(k):
        th = 2 * np.pi * k / n_pool
        return np.array([_r_traj * np.cos(th), _r_traj * np.sin(th), 0.0])

    def make_scan(k):
        return pl_mod.ScanInput(
            pts=jnp.asarray(room_scan(pose_at(k), n_raw)),
            t_offs=jnp.asarray(
                np.sort(rng.uniform(0, 0.1, n_raw)).astype(np.float32)
            ),
            mask=jnp.ones(n_raw, bool),
            imu=ImuWindow(
                stamps=jnp.asarray(np.linspace(0, 0.1, imu_m), jnp.float32),
                gyr=jnp.asarray(np.tile([0.0, 0.0, 0.05], (imu_m, 1)), jnp.float32),
                acc=jnp.asarray(
                    np.tile([0.2, 0.1, 9.81], (imu_m, 1)), jnp.float32
                ),
                mask=jnp.ones(imu_m, bool),
            ),
            t_end=jnp.float32(0.1),
            acc_scale=jnp.float32(1.0),
        )

    state = NavState.identity()._replace(cov=jnp.eye(18) * 1e-4)
    m = vm.make_map(cfg.map_cfg)
    scan0 = make_scan(0)
    m = jax.jit(
        pl_mod.bootstrap_map, static_argnames=("cfg", "axis_name"),
        donate_argnames=("lidar_map",),
    )(m, scan0, state, i3, z3, cfg)

    step = jax.jit(
        pl_mod.lio_scan_step,
        static_argnames=("cfg", "axis_name"),
        donate_argnames=("lidar_map",),
    )

    # Device-resident scan pool, cycled (each step still does full work;
    # the map keeps evolving, and the periodic trajectory makes the wrap
    # seamless).
    scans = [make_scan(k) for k in range(n_pool)]
    scan_idx = [0]  # mutable cursor

    def next_scan():
        s = scans[scan_idx[0] % n_pool]
        scan_idx[0] += 1
        return s

    # Warm up: compile + populate the map to steady state.
    info = None
    for _ in range(5):
        state, m, info, (wc, wmask), _ = step(state, m, next_scan(), i3, z3, cfg)
    jax.block_until_ready(state)

    def lio_chain(k):
        nonlocal state, m, info, wc, wmask
        for _ in range(k):
            state, m, info, (wc, wmask), _ = step(
                state, m, next_scan(), i3, z3, cfg
            )
        jax.block_until_ready(state)

    per_scan, per_scan_spread, per_scan_samples = _slope_windows(
        lio_chain, *k_lio, n_windows
    )

    # Registered points/sec: downsampled point budget pushed through the
    # full lookup/plane/Jacobian/solve chain per scan.
    # FETCH NOTHING HERE: on the tunneled TPU a host fetch (np.asarray/int
    # of any device value) permanently degrades subsequent dispatches of
    # the measured programs from ~0.1 ms to ~94 ms (measured; the round-2
    # '250 ms fresh-buffer' e2e floor is the same client pathology). All
    # host reads happen after the LAST timed section.
    pts_per_sec = cfg.ds_capacity / per_scan

    # --- Measured arena-gather ceiling (replaces the analytic roofline).
    # The surfel update's per-iteration memory traffic on the SAME arena
    # with the SAME query points (wc is p_w exactly as the kernel computes
    # it, padded lanes included), reduced to a scalar. jnp.abs sums keep
    # XLA from folding the gathers away.
    # R gather passes per dispatch: a single pass is ~10-20 us of device
    # time, smaller than the tunnel's per-dispatch overhead (~50 us), so a
    # one-pass-per-call microbench measures dispatch, not memory. The
    # in-graph fori_loop amortizes dispatch 8x; the +i*1e-6 query nudge
    # (sub-micron, same voxels, same cache pattern) stops XLA from CSE-ing
    # the iterations into one.
    R_GATHER = 8

    def arena_gather_pass(mm, queries, acc):
        def body(i, acc):
            q = queries + i.astype(queries.dtype) * 1e-6
            d2, slot, has = vm.surfel_candidate(
                mm, q, cfg.map_cfg, cfg.lio_cfg.surfel_min_points
            )
            return (
                acc
                + jnp.sum(jnp.where(jnp.isfinite(d2), d2, 0.0))
                + jnp.sum(mm.surf_s2[slot])
                + jnp.sum(mm.surf_s1[slot])
                + jnp.sum(mm.surf_n[slot])
                + jnp.sum(mm.keys[slot].astype(jnp.float32))
                + jnp.sum(has)
            )

        acc = jax.lax.fori_loop(0, R_GATHER, body, acc)
        # The arena is threaded through (donated) exactly like the real
        # step: an undonated read-only arena arg costs a per-call XLA copy
        # (~20 ms measured) that would corrupt the ceiling. It is read
        # inside the loop as an ARG, not a carry (a carried arena would
        # double-buffer ~430 MB per iteration).
        return acc, mm

    gather = jax.jit(arena_gather_pass, donate_argnums=(0,))
    queries = wc
    acc, m = gather(m, queries, jnp.float32(0.0))
    jax.block_until_ready(acc)

    def gather_chain(k):
        nonlocal acc, m
        for _ in range(k):
            acc, m = gather(m, queries, acc)
        jax.block_until_ready(acc)


    # --- Interleaved LIVO under motion (the reference's Run() alternation,
    # laser_mapping.cpp:86-126): one scan-end update + one image-bounded
    # photometric update per cycle, frames RENDERED ALONG THE MOVING
    # TRAJECTORY (pose and image differ every step) so the iterated EKF
    # does real convergence work — round 2's zero-motion loop (same pose,
    # same frame every step) converged instantly and understated the cost.
    try:
        from fastlivo_tpu.io import render
        from fastlivo_tpu.maps import visual_map as vmap_mod
        from fastlivo_tpu.models import vio as vio_mod
        from fastlivo_tpu.ops.camera import Pinhole

        cam = Pinhole(width=640, height=512, fx=400.0, fy=400.0,
                      cx=320.0, cy=256.0)
        vm_cfg = vmap_mod.VisualMapConfig(capacity=4096, max_obs=4)
        vio_cfg = vio_mod.VioConfig()
        vmap = vmap_mod.make_visual_map(vm_cfg)
        rot_ci = jnp.asarray(
            [[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]], jnp.float32
        )
        t_ci = jnp.zeros(3, jnp.float32)

        rrender = jax.jit(render.render_room, static_argnames="cam")

        def frame_at(j):
            # World->camera at the body pose of pool index j + half an
            # interval (the image lands mid-way between scan ends, like a
            # 10 Hz hard-synced rig with a phase offset). pose_at is
            # periodic with period n_pool, so the absolute scan counter and
            # the pool index render the same pose.
            p = pose_at(j + 0.5)
            pcw = t_ci - rot_ci @ jnp.asarray(p, jnp.float32)
            return rrender(cam, rot_ci, pcw, half=8.0, floor_z=-1.5)

        frames = [frame_at(j) for j in range(n_pool)]
        jax.block_until_ready(frames[-1])

        vstep = jax.jit(
            vio_mod.vio_update, static_argnames=("cam", "vm_cfg", "cfg"),
            donate_argnames=("vmap",),
        )

        state_l, m_l = state, m

        def livo_pair():
            # One scan-end update + one image-bounded update, frame and
            # scan phase-aligned on the periodic trajectory.
            nonlocal state_l, m_l, vmap
            idx = scan_idx[0]
            state_l, m_l, _inf, (cl, ms), _ = step(
                state_l, m_l, next_scan(), i3, z3, cfg
            )
            f = frames[idx % n_pool]
            state_l, vmap, vi = vstep(
                state_l, vmap, f, cl, ms, cam, rot_ci, t_ci, vm_cfg, vio_cfg
            )
            return vi

        # Warm up: compile the VIO program + populate the visual map and
        # its stored patch pyramids along the moving trajectory.
        for _ in range(4):
            vinfo = livo_pair()
        jax.block_until_ready(state_l)

        def livo_chain(k):
            for _ in range(k):
                livo_pair()
            jax.block_until_ready(state_l)

        has_livo = True
    except Exception:
        has_livo = False
        state_l, m_l = state, m  # the main chain still owns the arena

    # --- Matched-operating-point config (VERDICT r3 item 2): the
    # reference's committed log runs ~10k downsampled points/scan at 10 Hz
    # (Log/fast_livo_time_log.csv, ~0.013-0.028 s/scan). A 16k budget on
    # the same scan geometry downsamples to that regime, making
    # per_scan_ms_16k apples-to-apples with the reference's per-scan time.
    n_raw_16 = 4096 if smoke else 20480
    # Map sized to the 16k operating point (profiled r5,
    # examples/profile_16k.py): the update cost scales with the STATIC
    # unique-voxel table and the donated slab bytes, not the stencil
    # width — cap 6144 (scene occupies ~5k unique voxels; n_eff is
    # unchanged vs cap 8192, so no constraints are lost), capacity 2^17
    # (10x headroom), 16-point slabs. 22.9 -> 16.1 ms/scan measured.
    cfg16 = pl_mod.StepConfig(
        map_cfg=vm.VoxelMapConfig(
            resolution=0.5, capacity=1 << (14 if smoke else 17),
            max_points=16, nearby_type=18,
            lookup_unique_cap=1024 if smoke else 6144,
        ),
        lio_cfg=lio_mod.LioConfig(measurement_model="surfel"),
        ds_capacity=2048 if smoke else 16384,
        imu_window=imu_m,
    )

    # Prebuilt device-resident pool (eager slicing inside the timed loop
    # would cost ~0.5-1 s per dispatched op on the tunneled client).
    scans16 = [
        s._replace(
            pts=s.pts[:n_raw_16],
            t_offs=s.t_offs[:n_raw_16],
            mask=s.mask[:n_raw_16],
        )
        for s in scans
    ]
    jax.block_until_ready(scans16[-1].pts)

    def make_scan16(k):
        return scans16[k % n_pool]

    # Distinct __name__ => distinct jit_* program name in the trace.
    def lio_scan_step_16k(state, lidar_map, scan, rot_il, t_il, cfg,
                          axis_name=None):
        return pl_mod.lio_scan_step(
            state, lidar_map, scan, rot_il, t_il, cfg, axis_name=axis_name
        )

    step16 = jax.jit(
        lio_scan_step_16k,
        static_argnames=("cfg", "axis_name"),
        donate_argnames=("lidar_map",),
    )
    state16 = NavState.identity()._replace(cov=jnp.eye(18) * 1e-4)
    m16 = vm.make_map(cfg16.map_cfg)
    m16 = jax.jit(
        pl_mod.bootstrap_map, static_argnames=("cfg", "axis_name"),
        donate_argnames=("lidar_map",),
    )(m16, make_scan16(0), state16, i3, z3, cfg16)
    idx16 = [1]

    def lio16_once():
        nonlocal state16, m16
        k = idx16[0]
        idx16[0] += 1
        state16, m16, info16, _, _ = step16(
            state16, m16, make_scan16(k), i3, z3, cfg16
        )
        return info16

    for _ in range(5):
        info16 = lio16_once()
    jax.block_until_ready(state16)

    # ---- DEVICE-TIME measurement (the headline): everything above ran in
    # enqueue mode — on this PJRT client block_until_ready returns BEFORE
    # execution completes (verified: a 515 GFLOP/step matmul chain
    # "finishes" at 18 us/step), so the wall-clock slopes measure ENQUEUE
    # throughput only. The profiler's per-op device durations are the
    # ground truth; one trace window covers a chain of every measured
    # program, and the terminal fetch inside the window forces full
    # materialization (it also degrades the client, which is why it is
    # the LAST thing the bench does).
    trace_dir = tempfile.mkdtemp(prefix="bench_trace_")
    k_dev = 6 if smoke else 20
    with jax.profiler.trace(trace_dir):
        # The arena ownership moved down the donation chain (lio slopes ->
        # gather -> livo warmup); continue from the current owner.
        for _ in range(k_dev):
            state_l, m_l, info, _, _ = step(
                state_l, m_l, next_scan(), i3, z3, cfg
            )
        for _ in range(2 if smoke else 3):
            acc, m_l = gather(m_l, queries, acc)
        if has_livo:
            for _ in range(4 if smoke else 12):
                vinfo = livo_pair()
        for _ in range(k_dev):
            info16 = lio16_once()
        # Host fetches LAST (they poison subsequent dispatches for the
        # rest of the process — CLAUDE.md).
        if has_livo:
            _ = np.asarray(vinfo.n_selected)
        _ = np.asarray(acc)
        n_eff = int(info.n_effective)
        iters = max(int(info.iterations), 1)
        n_eff16 = int(info16.n_effective)
    dur, cnt = _trace_device_totals(trace_dir)

    def dev_ms(name, div=1.0):
        if name not in dur or cnt[name] == 0:
            return None
        return dur[name] / cnt[name] / 1e3 / div

    per_scan_dev = dev_ms("jit_lio_scan_step")
    per_scan16_dev = dev_ms("jit_lio_scan_step_16k")
    t_gather_dev = dev_ms("jit_arena_gather_pass", div=R_GATHER)
    vio_dev = dev_ms("jit_vio_update")

    per_scan_s = per_scan_dev / 1e3 if per_scan_dev else per_scan
    pts_per_sec = cfg.ds_capacity / per_scan_s
    # Effective-constraint throughput (VERDICT r4 weak #7): the headline
    # divides the scan BUDGET (masked + gated-out lanes included) by device
    # time; this divides only the lanes that contributed a residual row.
    eff_pts_per_sec = n_eff / per_scan_s
    # IESKF innovation nnz/s (BASELINE.json north-star): each effective
    # point contributes a 1x6 block row to H (6 nnz), assembled every
    # filter iteration.
    nnz_per_sec = n_eff * 6 * iters / per_scan_s
    out = {
        "metric": "registered_points_per_sec",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_sec / BASELINE_POINTS_PER_SEC, 3),
        "timing_source": "jax.profiler device-op durations"
        if per_scan_dev else "wall-clock slope (profiler trace empty)",
        "per_scan_ms": round(per_scan_s * 1e3, 3),
        "enqueue_per_scan_ms": round(per_scan * 1e3, 3),
        "enqueue_per_scan_ms_spread": round(per_scan_spread * 1e3, 3),
        "ieskf_innovation_nnz_per_sec": round(nnz_per_sec, 1),
        "effective_points_per_sec": round(eff_pts_per_sec, 1),
        "n_effective_last": n_eff,
        "iterations_last": iters,
        "measurement_model": "surfel",
        "scan_budget": cfg.ds_capacity,
        "platform": jax.devices()[0].platform,
    }
    if t_gather_dev is not None:
        # If the update were pure arena lookups it would sustain
        # n_eff*6 / t_gather nnz/s per iteration; the achieved rate over
        # that is <= 1 by construction (the step runs the same lookups
        # each re-match round PLUS eigh/innovation/solve/insert).
        measured_ceiling_nnz = n_eff * 6 / (t_gather_dev / 1e3)
        out["ceiling_frac"] = round(nnz_per_sec / measured_ceiling_nnz, 3)
        out["ceiling_nnz_per_sec_measured"] = round(measured_ceiling_nnz, 1)
        out["ceiling_gather_ms"] = round(t_gather_dev, 3)
        out["arena_gather_queries_per_sec"] = round(
            queries.shape[0] / (t_gather_dev / 1e3), 1
        )
    if per_scan16_dev is not None:
        # Matched operating point: the reference's own load (~10k effective
        # points/scan). Two bars (BASELINE.md "Matched-operating-point
        # comparison bars"): 20.6 ms is the reference's early-log WARM-UP
        # case (Log/fast_livo_time_log.csv row 3, small map); 42.2 ms is
        # its full-log mean / converged running average — what it actually
        # sustains, since its per-scan cost grows with map size
        # (28 -> 45 ms at 1.81M map points) while this arena step is flat.
        out["per_scan_ms_16k"] = round(per_scan16_dev, 3)
        out["points_per_sec_16k"] = round(
            cfg16.ds_capacity / (per_scan16_dev / 1e3), 1
        )
        out["effective_points_per_sec_16k"] = round(
            n_eff16 / (per_scan16_dev / 1e3), 1
        )
        out["n_effective_16k"] = n_eff16
        out["scan_budget_16k"] = cfg16.ds_capacity
        out["vs_reference_scan_time_16k"] = round(
            20.6 / per_scan16_dev, 3
        )
        out["vs_reference_steady_state_16k"] = round(
            42.2 / per_scan16_dev, 3
        )
    if has_livo and vio_dev is not None and per_scan_dev is not None:
        out["vio_step_ms"] = round(vio_dev, 3)
        out["livo_step_ms"] = round(per_scan_dev + vio_dev, 3)
        out["vio_motion"] = True
        out["vio_n_selected"] = int(np.asarray(vinfo.n_selected))
    print(json.dumps(out))


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
