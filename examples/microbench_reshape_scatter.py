"""Does scatter-into-reshaped-view of the bucket table stay cheap?

Pattern: meta (B, 64) --reshape--> (C, 8) --row scatter--> reshape back.
Plus: gather from the reshaped view, and the wide-points scatter variants.

    timeout 580 python examples/microbench_reshape_scatter.py
"""

import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    C = 524288
    B = C // 8
    U = 16384
    rng = np.random.default_rng(0)
    slots = jnp.asarray(np.sort(rng.choice(C, U, replace=False)).astype(np.int32))
    rows8 = jnp.asarray(rng.integers(0, 100, (U, 8), dtype=np.int32))
    rows4f = jnp.asarray(rng.standard_normal((U, 4)).astype(np.float32))
    meta = jnp.asarray(rng.integers(0, 100, (B, 64), dtype=np.int32))
    meanf = jnp.asarray(rng.standard_normal((B, 32)).astype(np.float32))
    bidx = jnp.asarray(rng.integers(0, B, 114688, dtype=np.int32))

    R = 8

    def loop(fn):
        def run(tbl, acc):
            def body(i, carry):
                tbl, acc = carry
                tbl, a = fn(tbl, i)
                return tbl, acc + a

            return jax.lax.fori_loop(0, R, body, (tbl, acc))

        return run

    cases = {}

    def add(name, tbl, fn):
        f = loop(fn)
        f.__name__ = "mb_" + name
        cases[name] = (jax.jit(f, donate_argnums=(0,)), tbl)

    # reshape sandwich scatter + the bucket gather in the SAME program
    # (the real insert does both against the same buffer).
    def sandwich(t, i):
        g = jnp.sum(t[bidx])  # bucket-row gather (probe analog)
        t2 = t.reshape(C, 8).at[slots].set(rows8 + i).reshape(B, 64)
        return t2, g

    add("sandwich_meta", meta, sandwich)

    def sandwich_mean(t, i):
        g = jnp.sum(t[bidx])
        t2 = t.reshape(C, 4).at[slots].set(rows4f + i).reshape(B, 32)
        return t2, g

    add("sandwich_mean", meanf, sandwich_mean)

    # gather slot rows from the reshaped view (insert reads old n/s1)
    def slotgather(t, i):
        g = jnp.sum(t.reshape(C, 8)[slots + i % 2])
        return t, g

    add("slotgather_meta", meta + 0, slotgather)

    accs = {}
    for name, (f, tbl) in cases.items():
        t0 = time.perf_counter()
        tbl2, acc = f(tbl, jnp.int32(0) if tbl.dtype == jnp.int32 else jnp.float32(0))
        jax.block_until_ready(acc)
        print(f"warm {name}: {time.perf_counter()-t0:.1f}s", flush=True)
        cases[name] = (f, tbl2)
        accs[name] = acc

    trace_dir = tempfile.mkdtemp(prefix="rs_mb_")
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
