"""End-to-end wall-clock per scan on the DEFAULT platform (real TPU under
the driver), host included: synthetic FLVO log -> full CLI pipeline
(sync -> window build -> fused device step), with and without scan
batching. This is the number that matters for real-time margin on a
remote/tunneled TPU (device compute is ~0.15 ms; the host round trip
is ~300 ms per synchronizing dispatch).

Usage: python examples/bench_e2e_tpu.py [duration_s] [batch]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    batches = [int(sys.argv[2])] if len(sys.argv) > 2 else [1, 8]

    from fastlivo_tpu.io import logio, synthetic
    from fastlivo_tpu.run import run_log
    from fastlivo_tpu.utils.config import FastLivoConfig

    seq = synthetic.generate(
        duration=duration, imu_rate=200.0, scan_rate=10.0,
        pts_per_scan=20000, seed=0,
    )
    tmp = tempfile.mkdtemp()
    log_path = os.path.join(tmp, "seq.flvo")
    logio.write_sequence(log_path, seq)

    for batch in batches:
        cfg = FastLivoConfig()
        cfg.vio.img_enable = False
        cfg.lio.max_points = 16384
        cfg.lio.scan_batch = batch
        cfg.map.capacity = 1 << 19
        cfg.imu.imu_int_frame = 32
        cfg.imu.init_count = 5
        cfg.lio.init_time = 0.3

        t0 = time.perf_counter()
        pipe = run_log(log_path, cfg, out_dir=None, progress=False)
        wall = time.perf_counter() - t0
        n = max(len(pipe.trajectory), 1)
        print(
            f"scan_batch={batch}: {n} poses, {wall:.2f}s total, "
            f"{wall / n * 1e3:.1f} ms/scan incl host "
            f"(first-compile included)",
            flush=True,
        )
        # steady-state estimate: re-run on the warmed cache
        t0 = time.perf_counter()
        pipe = run_log(log_path, cfg, out_dir=None, progress=False)
        wall = time.perf_counter() - t0
        n = max(len(pipe.trajectory), 1)
        print(
            f"scan_batch={batch}: steady-state {wall / n * 1e3:.1f} ms/scan "
            f"incl host ({n} poses)",
            flush=True,
        )


if __name__ == "__main__":
    main()
