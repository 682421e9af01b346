"""Back-end manager: keyframing, loop detection, pose-graph correction.

Capability parity with the reference's loop thread + GTSAM wiring
(reference: src/laser_mapping.cpp — keyframe factor creation
:1118-1221, the loop-closure worker thread accumulating `sub_frame_num`
frames into a key cloud and searching STD :1223-1349). The corrected
trajectory never touches the live filter — loop results only affect the
pose graph and its exported trajectory, exactly like the reference
(loop_tum.txt vs tum.txt).

Runs synchronously by default; pass `background=True` to run STD detection
on a worker thread (the reference's std::thread + condition-variable queue
becomes a ThreadPoolExecutor with polled futures).
"""

from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from fastlivo_tpu.backend.pose_graph import PoseGraph
from fastlivo_tpu.backend.std_loop import StdConfig, StdLoopDetector
from fastlivo_tpu.utils.config import FastLivoConfig


@dataclass
class LoopEvent:
    kf_from: int
    kf_to: int
    score: float
    rot: np.ndarray
    trans: np.ndarray


class LoopBackend:
    def __init__(
        self,
        cfg: FastLivoConfig,
        background: bool = False,
    ):
        self.std_cfg = StdConfig.from_params(cfg.loop)
        self.detector = StdLoopDetector(self.std_cfg)
        self.graph = PoseGraph()
        self.sub_frame_num = cfg.loop.sub_frame_num
        self.trans_thresh = cfg.keyframe.trans_thresh_m
        self.rot_thresh = cfg.keyframe.rot_thresh_rad
        self.ds_size = cfg.loop.ds_size

        self._cloud_buf: List[np.ndarray] = []
        self._std_frame_kf: List[int] = []  # STD frame index -> keyframe idx
        self._last_kf: int = 0
        self.loops: List[LoopEvent] = []
        self._executor = ThreadPoolExecutor(max_workers=1) if background else None
        self._pending: List[Tuple[Future, int, Optional[np.ndarray]]] = []

        # Optional visual verification of loop candidates (the reference's
        # SuperPoint+LightGlue match-ratio gate, laser_mapping.cpp:1290-1343).
        self.visual_verify_en = cfg.loop.visual_verify_en
        self.match_ratio_thresh = cfg.loop.match_ratio_thresh
        self.pose_check_max_rot = cfg.loop.pose_check_max_rot
        self._frame_imgs: List[Optional[np.ndarray]] = []  # per STD frame
        self._last_img: Optional[np.ndarray] = None
        self._matcher = None
        self.rejected_loops: List[Tuple[int, int, float]] = []
        # Camera model + camera-from-body rotation for the essential-matrix
        # pose cross-check (composed as in LidarSelector::init:
        # R_cb = Rcl @ R_il^T).
        self._cam = None
        self._rot_ci = np.eye(3)
        try:
            from fastlivo_tpu.ops.camera import Pinhole

            c = cfg.camera
            self._cam = Pinhole(
                width=c.width, height=c.height,
                fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
            )
            rcl = np.asarray(c.rcl, np.float64).reshape(3, 3)
            r_il = np.asarray(
                cfg.extrinsics.extrinsic_r, np.float64
            ).reshape(3, 3)
            self._rot_ci = rcl @ r_il.T
        except Exception:
            pass

    # ------------------------------------------------------------------

    def on_scan(
        self, rot: np.ndarray, pos: np.ndarray, world_cloud: np.ndarray,
        stamp: float = 0.0, img: Optional[np.ndarray] = None,
    ):
        """Feed every LIO posterior pose + registered world cloud (and,
        when available, the most recent camera frame for visual loop
        verification)."""
        kf = self.graph.maybe_add_keyframe(
            rot, pos, self.trans_thresh, self.rot_thresh, stamp=stamp
        )
        if kf is not None:
            self._last_kf = kf
        if img is not None:
            self._last_img = img
        self._cloud_buf.append(self._downsample(world_cloud))
        if len(self._cloud_buf) >= self.sub_frame_num:
            key_cloud = np.concatenate(self._cloud_buf)
            self._cloud_buf = []
            kf_idx = self._last_kf
            # Capture the camera frame NOW, at key-cloud time — in
            # background mode the detection future completes several scans
            # later and `self._last_img` would then be a time-shifted frame
            # (the reference stores per-keyframe images,
            # laser_mapping.cpp:1223-1349).
            key_img = self._last_img
            if self._executor is None:
                self._handle_result(self._detect(key_cloud), kf_idx, key_img)
            else:
                self._pending.append(
                    (self._executor.submit(self._detect, key_cloud),
                     kf_idx, key_img)
                )
        self._poll()

    def _detect(self, key_cloud: np.ndarray):
        return self.detector.detect(key_cloud)

    def _poll(self):
        done = [p for p in self._pending if p[0].done()]
        self._pending = [p for p in self._pending if not p[0].done()]
        for fut, kf_idx, key_img in done:
            self._handle_result(fut.result(), kf_idx, key_img)

    def _handle_result(self, result, kf_idx: int, key_img=None):
        self._std_frame_kf.append(kf_idx)
        self._frame_imgs.append(key_img)
        if result is None:
            return
        fid, score, rot, t = result

        # Visual gate (match ratio >= threshold, reference
        # laser_mapping.cpp:1314-1322) when both frames carry images.
        if self.visual_verify_en:
            img_cur = self._frame_imgs[-1]
            img_old = self._frame_imgs[fid] if fid < len(self._frame_imgs) else None
            if img_cur is not None and img_old is not None:
                from fastlivo_tpu.backend.visual_verify import verify_loop

                if self._matcher is None:
                    # Learned matcher when trained weights are committed,
                    # else the rotation-robust classical fallback.
                    from fastlivo_tpu.backend.visual_verify import default_matcher

                    self._matcher = default_matcher()
                ok, res = verify_loop(
                    img_cur, img_old, self._matcher, self.match_ratio_thresh
                )
                if not ok:
                    self.rejected_loops.append((fid, kf_idx, res.match_ratio))
                    return
                match_res = res
            else:
                match_res = None
        else:
            match_res = None
        kf_from = self._std_frame_kf[fid]
        # The STD transform maps current-frame coords to the matched frame's
        # coords (both world-ish but drift-apart): a relative pose between
        # the two keyframes' world anchors. Convert to a between-factor:
        # pose_to (current) should equal T_loop applied to pose_from space.
        r_i, t_i = self.graph.rots[kf_from], self.graph.trans[kf_from]
        r_j, t_j = self.graph.rots[kf_idx], self.graph.trans[kf_idx]
        # Corrected current pose in from-frame's (consistent) world:
        r_j_corr = rot @ r_j
        t_j_corr = rot @ t_j + t
        rel_r = r_i.T @ r_j_corr
        rel_t = r_i.T @ (t_j_corr - t_i)

        # Cross-check the STD/ICP pose against the image-derived relative
        # rotation (the reference feeds recoverPose into the loop factor,
        # laser_mapping.cpp:1326-1343; here the metric STD pose is kept and
        # the match-derived rotation REJECTS inconsistent candidates —
        # recoverPose is scale-free, so its translation can't replace
        # STD's). Both rotations map current-camera to matched-camera
        # coords: rel_r maps current-body -> from-body
        # (x_bi = r_i^T r_j_corr x_bj), so in camera frames it is
        # R_cb rel_r R_cb^T.
        if (
            match_res is not None
            and self.pose_check_max_rot > 0
            and self._cam is not None
        ):
            from fastlivo_tpu.backend.visual_verify import essential_pose

            ep = essential_pose(match_res, self._cam)
            if ep is not None:
                r_vis, _t_unit, n_inl = ep
                if n_inl >= 12:
                    r_std_cam = self._rot_ci @ rel_r @ self._rot_ci.T
                    dr = r_vis.T @ r_std_cam
                    ang = float(
                        np.arccos(
                            np.clip((np.trace(dr) - 1.0) / 2.0, -1.0, 1.0)
                        )
                    )
                    if ang > self.pose_check_max_rot:
                        self.rejected_loops.append((fid, kf_idx, -ang))
                        return
        # Loop transforms are decimeter-accurate (corner-resolution bound);
        # weight them like ~0.3 m sigma so they correct real drift without
        # overpowering a consistent odometry chain.
        self.graph.add_loop(kf_from, kf_idx, rel_r, rel_t, weight=score * 3.0)
        self.loops.append(LoopEvent(kf_from, kf_idx, score, rot, t))

    # ------------------------------------------------------------------

    def finish(self):
        """Drain pending background detections."""
        if self._executor is not None:
            for fut, kf_idx, key_img in self._pending:
                self._handle_result(fut.result(), kf_idx, key_img)
            self._pending = []
            self._executor.shutdown(wait=True)

    def corrected_trajectory(self) -> Tuple[np.ndarray, np.ndarray]:
        """Optimize and return (rots (K,3,3), trans (K,3)) — the
        loop-corrected keyframe trajectory (the reference's loop_tum.txt)."""
        return self.graph.optimize()

    def _downsample(self, cloud: np.ndarray) -> np.ndarray:
        if len(cloud) == 0:
            return cloud
        from fastlivo_tpu import native

        return cloud[native.voxel_mask(cloud, self.ds_size)]
