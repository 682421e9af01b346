"""3D trajectory plot from TUM files (parity with the reference's
Log/plot.py). Usage:

    python examples/plot_trajectory.py Log/tum.txt [Log/loop_tum.txt ...] \
        [--gt gt_tum.txt] [--out traj.png]
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tum", nargs="+")
    ap.add_argument("--gt", default=None)
    ap.add_argument("--out", default="trajectory.png")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sys.path.insert(0, ".")
    from fastlivo_tpu.io import export
    from fastlivo_tpu.utils.metrics import ate_rmse

    fig = plt.figure(figsize=(9, 7))
    ax = fig.add_subplot(111, projection="3d")
    gt_pos = None
    if args.gt:
        _, gt_pos, _ = export.read_tum(args.gt)
        ax.plot(gt_pos[:, 0], gt_pos[:, 1], gt_pos[:, 2], "k--", label="ground truth")
    for path in args.tum:
        stamps, pos, _ = export.read_tum(path)
        label = path
        if gt_pos is not None and len(gt_pos) == len(pos):
            label += f" (ATE {ate_rmse(pos, gt_pos) * 100:.1f} cm)"
        ax.plot(pos[:, 0], pos[:, 1], pos[:, 2], label=label)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_zlabel("z [m]")
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
