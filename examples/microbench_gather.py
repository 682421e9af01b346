"""Microbenchmark: TPU gather cost per row for candidate arena layouts.

Device-op timings via jax.profiler (wall-clock on this client measures
enqueue only). Informs the bucketized packed-meta arena design: is ONE
(N, 128)-word row gather per probe cheaper than pd=8 separate row
gathers across 3 arrays?

    timeout 600 python examples/microbench_gather.py
"""

import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    C = 524288
    N = 114688  # 7 * 16384 stencil queries
    PD = 8
    rng = np.random.default_rng(0)

    tbl_flat = jnp.asarray(rng.integers(0, 1000, C, dtype=np.int32))
    tbl3 = jnp.asarray(rng.integers(0, 1000, (C, 3), dtype=np.int32))
    tbl8 = jnp.asarray(rng.integers(0, 1000, (C, 8), dtype=np.int32))
    tbl_pred = tbl_flat > 500
    B = C // PD
    tbl_bucket64 = jnp.asarray(
        rng.integers(0, 1000, (B, 64), dtype=np.int32)
    )  # 8 slots x 8 words
    tbl_bucket128 = jnp.asarray(
        rng.integers(0, 1000, (B, 128), dtype=np.int32)
    )  # 8 slots x 16 words
    tblf4 = jnp.asarray(rng.standard_normal((C, 4)).astype(np.float32))

    h0 = jnp.asarray(rng.integers(0, C - PD, N, dtype=np.int32))
    idx_w = h0[:, None] + jnp.arange(PD, dtype=jnp.int32)[None, :]  # (N, PD)
    idx_flat = idx_w.reshape(-1)  # (N*PD,)
    bidx = jnp.asarray(rng.integers(0, B, N, dtype=np.int32))

    R = 16

    def mk(fn, name):
        def run(tbl, idx, acc):
            def body(i, acc):
                return acc + fn(tbl, (idx + i) % jnp.asarray(4, idx.dtype) + idx)

            return jax.lax.fori_loop(0, R, body, acc)

        run.__name__ = name
        return jax.jit(run)

    cases = {
        "flat_s32_rows(N*8)": (tbl_flat, idx_flat,
                               lambda t, i: jnp.sum(t[i])),
        "rows3_s32(N*8)": (tbl3, idx_flat,
                           lambda t, i: jnp.sum(t[i])),
        "rows8_s32(N*8)": (tbl8, idx_flat,
                           lambda t, i: jnp.sum(t[i])),
        "pred(N*8)": (tbl_pred, idx_flat,
                      lambda t, i: jnp.sum(t[i].astype(jnp.int32))),
        "windowed_flat(N,8)": (tbl_flat, idx_w,
                               lambda t, i: jnp.sum(t[i])),
        "bucket64_s32(N)": (tbl_bucket64, bidx,
                            lambda t, i: jnp.sum(t[i])),
        "bucket128_s32(N)": (tbl_bucket128, bidx,
                             lambda t, i: jnp.sum(t[i])),
        "rowsf4(N)": (tblf4, h0, lambda t, i: jnp.sum(t[i])),
        "flat_s32(N)": (tbl_flat, h0, lambda t, i: jnp.sum(t[i])),
    }

    fns = {}
    accs = {}
    for name, (tbl, idx, fn) in cases.items():
        f = mk(fn, "mb_" + name.split("(")[0])
        a = f(tbl, idx, jnp.float32(0) if tbl.dtype == jnp.float32 else jnp.int32(0))
        jax.block_until_ready(a)
        fns[name] = (f, tbl, idx)
        accs[name] = a

    trace_dir = tempfile.mkdtemp(prefix="gather_mb_")
    with jax.profiler.trace(trace_dir):
        for name, (f, tbl, idx) in fns.items():
            accs[name] = f(tbl, idx, accs[name])
        for name in fns:
            _ = np.asarray(accs[name])

    import collections
    import glob
    import gzip
    import json

    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    tr = json.load(gzip.open(files[-1]))
    pids = {
        e["pid"]: e["args"]["name"]
        for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dur = collections.Counter()
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or "TPU" not in pids.get(e["pid"], ""):
            continue
        if e["name"].startswith("jit_mb_"):
            dur[e["name"].split("(")[0]] += e.get("dur", 0)
    for name, d in sorted(dur.items()):
        print(f"{d/R:10.1f} us/pass  {name}")
    # fallback: total device time
    tot = sum(
        e.get("dur", 0)
        for e in tr["traceEvents"]
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], "")
        and not e["name"].startswith("jit_")
    )
    print(f"total leaf device us: {tot}")


if __name__ == "__main__":
    main()
