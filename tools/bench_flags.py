"""XLA flag sweep on the headline train step (VERDICT r2 #1a).

Each configuration runs in a SUBPROCESS (XLA_FLAGS is parsed once per
process) and times the bench train step. Unknown flags make XLA abort at
startup; those configs are reported as errors rather than killing the sweep.

Usage: python tools/bench_flags.py [n_steps=30] [--sets name1,name2]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAG_SETS: dict[str, str] = {
    "baseline": "",
    # Mosaic/XLA scoped-VMEM budget: larger budgets let the fusion
    # cost model keep bigger producer-consumer fusions on-chip.
    "vmem_32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    # Async/overlapped DMA scheduling
    "latency_hiding": (
        "--xla_tpu_enable_latency_hiding_scheduler=true"
    ),
    # Loop-invariant code motion inflation budget (affects big fused loops)
    "licm_inflate": "--xla_tpu_licm_size_inflation_ratio=2.0",
    # Allow more aggressive multi-output fusions
    "sink_fusion": "--xla_tpu_enable_multi_output_fusion=true",
}

CHILD = r"""
import json, sys, time
import numpy as np
sys.path.insert(0, {repo!r})
from image_classification_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()
import jax
from image_classification_tpu.core.config import Config
import bench
cfg = Config(
    model_name="convnext_base", num_classes=44, native_size=(60, 80),
    image_size=(260, 260), batch_size=32, gradient_accumulation_steps=1,
    use_deep_supervision=True, use_ema=True, compute_dtype="bfloat16",
).validate()
ips = bench.bench_train(jax, cfg, n_steps={n_steps})
print("RESULT " + json.dumps({{"images_per_sec": round(ips, 2)}}))
"""


def run_one(name: str, flags: str, n_steps: int) -> dict:
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    proc = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO, n_steps=n_steps)],
        env=env, capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            out = json.loads(line[len("RESULT "):])
            return {"name": name, "flags": flags, **out}
    return {
        "name": name, "flags": flags, "error": True,
        "tail": (proc.stderr or proc.stdout).strip().splitlines()[-3:],
    }


def main() -> None:
    n_steps = 30
    only = None
    for a in sys.argv[1:]:
        if a.startswith("n_steps="):
            n_steps = int(a.split("=")[1])
        elif a.startswith("--sets"):
            only = a.split("=", 1)[1].split(",") if "=" in a else None
    results = []
    for name, flags in FLAG_SETS.items():
        if only and name not in only:
            continue
        print(f"--- {name}: {flags or '(none)'}", flush=True)
        r = run_one(name, flags, n_steps)
        print(json.dumps(r), flush=True)
        results.append(r)
    base = next((r for r in results if r["name"] == "baseline" and "images_per_sec" in r), None)
    print("\n=== summary ===")
    for r in results:
        if "images_per_sec" in r:
            rel = (r["images_per_sec"] / base["images_per_sec"] - 1) * 100 if base else 0.0
            print(f"{r['name']:16s} {r['images_per_sec']:8.1f} img/s  {rel:+.1f}%")
        else:
            print(f"{r['name']:16s} ERROR {r.get('tail')}")


if __name__ == "__main__":
    main()
