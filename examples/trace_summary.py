"""Summarize a jax.profiler trace: top device ops by total time.

The TPU counterpart of reading the reference's Log/*.csv stage rows
(SURVEY.md section 5): capture a trace (run.py --profile DIR, or
jax.profiler.start_trace), then

    python examples/trace_summary.py DIR [-n TOP] [--steps K]

prints per-op device time (divided by --steps so numbers read per-step)
with source attribution where the XLA metadata carries it. This is how
the round-2 VIO optimizations were found (while-of-DUS window loops,
layout-change copies, scatter fusions); see ARCHITECTURE.md.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def summarize(trace_dir: str, top: int = 25, steps: int = 1):
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        sys.exit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(files[-1]) as fh:
        tr = json.load(fh)
    pids = {
        e["pid"]: e["args"]["name"]
        for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dur = collections.Counter()
    cnt = collections.Counter()
    args = {}
    for e in tr["traceEvents"]:
        if e.get("ph") != "X":
            continue
        pname = pids.get(e["pid"], "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        dur[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
        if e.get("args"):
            args.setdefault(e["name"], e["args"])
    total = sum(v for k, v in dur.items() if not k.startswith("jit_"))
    print(f"device ops total: {total / steps:.0f} us/step  ({files[-1]})")
    print(f"{'us/step':>10} {'calls':>7}  op  [source]")
    for name, d in dur.most_common(top):
        src = ""
        a = args.get(name, {})
        meta = a.get("long_name", "") or a.get("tf_op", "")
        m = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', str(meta))
        if m:
            src = f"  [{os.path.basename(m.group(1))}:{m.group(2)}]"
        print(f"{d / steps:10.1f} {cnt[name] / steps:7.1f}  {name[:70]}{src}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("trace_dir")
    p.add_argument("-n", "--top", type=int, default=25)
    p.add_argument("--steps", type=int, default=1, help="divide times by K steps")
    a = p.parse_args(argv)
    summarize(a.trace_dir, a.top, a.steps)


if __name__ == "__main__":
    main()
