"""Measure the Mosaic dynamic-row gather RATE (ns/row) on this release.

The 2026-08-20 re-run of scripts/probe_mosaic_gather.py flipped
``vmem_dynamic_row_loop`` to SUPPORTED for the first time — a Pallas
fori_loop can now read ``table_ref[idx_ref[i], :]`` with a dynamic sublane
index from a VMEM-resident table. Supported is not fast: the fused sparse
kernel question (PERF.md "Sparse-tail wall") hinges on whether this loop
beats the measured 28 ns/edge XLA gather/segment-sum tail, where each edge
moves a [B]-wide row. This probe times:

- ``gather``: out[i & (T-1), :] = table[src[i], :] — pure dynamic-read rate
- ``gather_accum``: out[dst[i], :] += table[src[i], :] — the SpMV inner op
  (dynamic read + dynamic read-modify-write)

Each config runs in a subprocess under a timeout (degraded-phase Mosaic
compiles hang). Inside the kernel the index sweep repeats R times; two R
values give a slope that cancels the per-call tunnel/launch overhead:
ns_per_row = (t(R2) - t(R1)) / ((R2 - R1) * W) — per-call overhead and the
one-time compile drop out entirely.

Usage: python scripts/bench_pallas_row_gather.py [--timeout 600]
Prints one JSON line per config and a summary with the XLA-tail verdict.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

KERNEL_TMPL = r"""
import time, json
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, B, W, MODE = {n}, {b}, {w}, "{mode}"
TILE = 512  # output rows (power of two for & masking)

def make(R):
    def kernel(table_ref, src_ref, dst_ref, out_ref):
        # zero-fill before accumulating: the Pallas output buffer starts
        # uninitialized, so accum mode would otherwise read garbage (and
        # time denormal-dependent arithmetic) — ADVICE r3
        out_ref[...] = jnp.zeros_like(out_ref)

        def rep(r, _):
            def body(i, _):
                row = table_ref[src_ref[i], :]
                if MODE == "gather":
                    out_ref[i & (TILE - 1), :] = row
                else:
                    d = dst_ref[i]
                    out_ref[d, :] = out_ref[d, :] + row
                return 0
            jax.lax.fori_loop(0, W, body, 0)
            return 0
        jax.lax.fori_loop(0, R, rep, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((TILE, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((W,), memory_space=pltpu.SMEM),
                  pl.BlockSpec((W,), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

table = jnp.ones((N, B), jnp.float32)
src = ((jnp.arange(W, dtype=jnp.int32) * 7919) % N).astype(jnp.int32)
dst = ((jnp.arange(W, dtype=jnp.int32) * 104729) % TILE).astype(jnp.int32)

def timed(R, reps=5):
    f = jax.jit(make(R))
    f(table, src, dst).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        f(table, src, dst).block_until_ready()
    return (time.perf_counter() - t0) / reps

R1, R2 = 4, 16
t1, t2 = timed(R1), timed(R2)
ns = (t2 - t1) / ((R2 - R1) * W) * 1e9
print(json.dumps({{"t_R4_s": round(t1, 4), "t_R16_s": round(t2, 4),
                   "ns_per_row": round(ns, 2)}}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=600)
    args = ap.parse_args()

    configs = [
        dict(n=4096, b=128, w=8192, mode="gather"),
        dict(n=4096, b=512, w=8192, mode="gather"),
        dict(n=4096, b=512, w=8192, mode="gather_accum"),
        dict(n=16384, b=512, w=8192, mode="gather"),
    ]
    out = []
    for cfg in configs:
        code = KERNEL_TMPL.format(**cfg)
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=args.timeout)
            if r.returncode == 0 and r.stdout.strip():
                meas = json.loads(r.stdout.strip().splitlines()[-1])
                row = {**cfg, **meas}
            else:
                tail = (r.stderr or r.stdout).strip().splitlines()
                row = {**cfg, "error": tail[-1][:200] if tail else "?"}
        except subprocess.TimeoutExpired:
            row = {**cfg, "error": "TIMEOUT (compile hang)"}
        out.append(row)
        print(json.dumps(row), flush=True)

    rates = [r["ns_per_row"] for r in out if "ns_per_row" in r]
    verdict = {
        "xla_tail_ns_per_edge": 28.0,
        "best_pallas_ns_per_row": min(rates) if rates else None,
        "fused_kernel_beats_xla_tail": bool(rates) and min(rates) < 28.0,
    }
    print(json.dumps(verdict))
    return 0


if __name__ == "__main__":
    sys.exit(main())
