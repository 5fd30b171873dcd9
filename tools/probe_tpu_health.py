"""TPU platform triage: is the axon backend healthy enough to train?

Runs the three-stage probe recorded in docs/ROADMAP.md (round-5 platform
constraints), each stage in a fresh time-boxed SUBPROCESS so a hung remote
RPC cannot wedge the probe itself:

1. connect  — ``jax.devices()`` (tunnel + client handshake)
2. matmul   — jit of a chained 256x256 matmul+tanh (compile service, MXU)
3. conv     — jit of a bare ``lax.conv_general_dilated`` (the class of
              program that hung on 2026-08-22: compile RPC sent, zero
              bytes ever received)

Prints ONE JSON line, e.g.
``{"connect": 2.1, "matmul": 1.8, "conv": "HUNG(>90s)", "healthy": false}``.
``healthy`` is true only if all three stages return. If ``conv`` hangs,
nothing in this repo can compile (every model is conv-based) — do not
start training runs; work CPU surfaces and re-probe later.

Usage: python tools/probe_tpu_health.py [timeout=90]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

_STAGES = {
    "connect": "import jax; jax.devices()",
    "matmul": (
        "import jax, jax.numpy as jnp\n"
        "x = jnp.ones((256, 256))\n"
        "def f(x):\n"
        "    for _ in range(10): x = jnp.tanh(x @ x)\n"
        "    return x\n"
        "float(jnp.sum(jax.jit(f)(x)))"
    ),
    "conv": (
        "import jax, jax.numpy as jnp\n"
        "x = jnp.zeros((2, 32, 32, 3)); k = jnp.zeros((3, 3, 3, 16))\n"
        "f = lambda x, k: jax.lax.conv_general_dilated(\n"
        "    x, k, (1, 1), 'SAME',\n"
        "    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))\n"
        "float(jnp.sum(jax.jit(f)(x, k)))"
    ),
}


def probe(timeout: float = 90.0) -> dict:
    out: dict = {}
    healthy = True
    for name, code in _STAGES.items():
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=timeout,
            )
            if r.returncode == 0:
                out[name] = round(time.time() - t0, 1)
            else:
                out[name] = f"ERROR: {r.stderr.strip().splitlines()[-1][:120]}"
                healthy = False
        except subprocess.TimeoutExpired:
            out[name] = f"HUNG(>{timeout:.0f}s)"
            healthy = False
        if not healthy:
            break  # later stages depend on earlier ones
    out["healthy"] = healthy
    return out


if __name__ == "__main__":
    timeout = 90.0
    for a in sys.argv[1:]:
        if a.startswith("timeout="):
            timeout = float(a.split("=", 1)[1])
    print(json.dumps(probe(timeout)))
