"""Parse a jax.profiler trace (trace.json.gz) into per-source and per-op
cost tables.

Usage:
  python tools/parse_profile.py /tmp/profile_dir [--by op|source] [--top 30]

Pair with:
  with jax.profiler.trace("/tmp/profile_dir"):
      ... a few steps + a host readback ...
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def load_trace(profile_dir: str) -> dict:
    cands = sorted(
        glob.glob(os.path.join(profile_dir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not cands:
        raise FileNotFoundError(f"no trace.json.gz under {profile_dir}")
    with gzip.open(cands[-1]) as f:
        return json.load(f)


def device_ops(data: dict) -> list[dict]:
    events = data["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tids = {
        (e["pid"], e["tid"]): e["args"].get("name")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    dev_pids = {p for p, n in pids.items() if n and ("TPU" in n or "GPU" in n)}
    return [
        e
        for e in events
        if e.get("pid") in dev_pids
        and e.get("ph") == "X"
        and tids.get((e["pid"], e["tid"])) == "XLA Ops"
        and e.get("args")
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--by", choices=["op", "source"], default="source")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    ops = device_ops(load_trace(args.profile_dir))
    dur = collections.Counter()
    flops = collections.Counter()
    sample = {}
    for e in ops:
        if e["name"].startswith("while."):
            continue  # container op; children are separately reported
        if args.by == "source":
            key = e["args"].get("source", "unknown")
        else:
            key = e["args"].get("deduplicated_name") or e["name"]
        dur[key] += e["dur"]
        try:
            flops[key] += int(e["args"].get("model_flops", 0) or 0)
        except (TypeError, ValueError):
            pass
        sample.setdefault(key, e["args"].get("long_name", "")[:120])

    total = sum(dur.values())
    print(f"{'us':>10} {'%':>5} {'TFLOP/s':>8}  key")
    for k, v in dur.most_common(args.top):
        tf = flops[k] / (v * 1e-6) / 1e12 if v else 0.0
        print(f"{v:10.0f} {100*v/total:5.1f} {tf:8.1f}  {k}")
        if args.by == "op":
            print(f"{'':25} {sample[k]}")


if __name__ == "__main__":
    main()
