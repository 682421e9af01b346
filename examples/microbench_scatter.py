"""Microbenchmark: TPU scatter/gather costs for arena update patterns.

    timeout 600 python examples/microbench_scatter.py
"""

import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    C = 524288
    S = 32
    B = C // 8
    U = 16384
    N = 65536
    rng = np.random.default_rng(0)

    slots = jnp.asarray(
        np.sort(rng.choice(C, U, replace=False)).astype(np.int32)
    )
    rows8 = jnp.asarray(rng.integers(0, 100, (U, 8), dtype=np.int32))
    rows3f = jnp.asarray(rng.standard_normal((U, 3)).astype(np.float32))
    rows9f = jnp.asarray(rng.standard_normal((U, 9)).astype(np.float32))
    b_idx = slots // 8
    off = (slots % 8) * 8
    pts = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    fs = jnp.asarray(
        np.sort(rng.choice(C * S, N, replace=False)).astype(np.int32)
    )
    slot_n = fs // S
    dest_n = fs % S

    meta = jnp.asarray(rng.integers(0, 100, (B, 64), dtype=np.int32))
    tbl8 = jnp.asarray(rng.integers(0, 100, (C, 8), dtype=np.int32))
    tbl3 = jnp.asarray(rng.standard_normal((C, 3)).astype(np.float32))
    tbl9 = jnp.asarray(rng.standard_normal((C, 3, 3)).astype(np.float32))
    ptsC = jnp.asarray(rng.standard_normal((C, S, 3)).astype(np.float32))
    ptsF = jnp.asarray(rng.standard_normal((C * S, 3)).astype(np.float32))
    ptsW = jnp.asarray(rng.standard_normal((C, S * 3)).astype(np.float32))

    R = 8
    ar8 = jnp.arange(8, dtype=jnp.int32)

    def loop(fn):
        def run(tbl, acc):
            def body(i, carry):
                tbl, acc = carry
                tbl = fn(tbl, i)
                return tbl, acc + 1

            return jax.lax.fori_loop(0, R, body, (tbl, acc))

        return run

    cases = {}

    def add(name, tbl, fn):
        f = loop(fn)
        f.__name__ = "mb_" + name
        cases[name] = (jax.jit(f, donate_argnums=(0,)), tbl)

    add("scat2d_meta_U8", meta,
        lambda t, i: t.at[b_idx[:, None], off[:, None] + ar8[None, :]].set(
            rows8 + i))
    add("scat_rows8_C8", tbl8, lambda t, i: t.at[slots].set(rows8 + i))
    add("scat_rows3_C3", tbl3, lambda t, i: t.at[slots].set(rows3f + i))
    add("scat_rows9_C33", tbl9,
        lambda t, i: t.at[slots].set(rows9f.reshape(U, 3, 3) + i))
    add("scat_pts_2coord", ptsC, lambda t, i: t.at[slot_n, dest_n].set(pts + i))
    add("scat_pts_flat", ptsF, lambda t, i: t.at[fs].set(pts + i))
    add("scat_pts_wide3", ptsW,
        lambda t, i: t.at[slot_n[:, None],
                          dest_n[:, None] * 3 + jnp.arange(3)[None, :]].set(
            pts + i))
    ptsC2 = jnp.asarray(rng.standard_normal((C, S, 3)).astype(np.float32))
    ptsW2 = jnp.asarray(rng.standard_normal((C, S * 3)).astype(np.float32))
    add("gath_slab_C_S3", ptsC2,
        lambda t, i: t + 0 * jnp.sum(t[slots % C]) )
    add("gath_slab_wide", ptsW2,
        lambda t, i: t + 0 * jnp.sum(t[slots % C]) )

    import time

    accs = {}
    for name, (f, tbl) in cases.items():
        t0 = time.perf_counter()
        tbl2, acc = f(tbl, jnp.int32(0))
        jax.block_until_ready(acc)
        print(f"warm {name}: {time.perf_counter()-t0:.1f}s", flush=True)
        cases[name] = (f, tbl2)
        accs[name] = acc

    trace_dir = tempfile.mkdtemp(prefix="scat_mb_")
    with jax.profiler.trace(trace_dir):
        for name, (f, tbl) in cases.items():
            tbl2, accs[name] = f(tbl, accs[name])
            cases[name] = (f, tbl2)
        for name in cases:
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


if __name__ == "__main__":
    main()
