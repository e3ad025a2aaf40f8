"""Probe: does this Mosaic release support the gathers a fused sparse
kernel needs? (PERF.md item: re-run per Mosaic release.)

Round-1 finding: TPU Pallas supports lane-axis take_along_axis and the
hardware PRNG, but NOT big-table axis-0 (sublane-axis) gathers — which
rules out a fused sparse push/walk kernel and leaves the 28 ns/edge sparse
tail as the top wall. Each probe compiles+runs one minimal kernel in a
SUBPROCESS under a timeout (remote Mosaic compiles can hang for 30+ min in
degraded phases — a hang is reported as timeout, not a verdict).

Usage: python scripts/probe_mosaic_gather.py [--timeout 300]
Prints one JSON line per probe and a summary verdict.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

PROBES = {
    # axis-0 gather from a VMEM-resident table: the core op a fused sparse
    # SpMV needs (per-edge source-row reads)
    "vmem_axis0_gather": r"""
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kernel(table_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

table = jnp.arange(4096 * 256, dtype=jnp.float32).reshape(4096, 256)
idx = (jnp.arange(512, dtype=jnp.int32) * 7919) % 4096
out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((512, 256), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(table, idx)
import numpy as np
ref = np.asarray(table)[np.asarray(idx)]
assert np.allclose(np.asarray(out), ref), "WRONG RESULT"
print("OK")
""",
    # dynamic row reads in a fori_loop (scalarized axis-0 access)
    "vmem_dynamic_row_loop": r"""
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kernel(table_ref, idx_ref, out_ref):
    def body(i, _):
        out_ref[i, :] = table_ref[idx_ref[i], :]
        return 0
    jax.lax.fori_loop(0, 512, body, 0)

table = jnp.arange(4096 * 256, dtype=jnp.float32).reshape(4096, 256)
idx = (jnp.arange(512, dtype=jnp.int32) * 7919) % 4096
out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((512, 256), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec((512,), memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(table, idx)
import numpy as np
ref = np.asarray(table)[np.asarray(idx)]
assert np.allclose(np.asarray(out), ref), "WRONG RESULT"
print("OK")
""",
    # per-row DMA from an HBM-resident table driven by prefetched indices:
    # the descriptor-level alternative if vector gathers are unsupported
    "hbm_indexed_row_dma": r"""
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, B, W = 4096, 256, 128

def kernel(idx_ref, table_ref, out_ref):
    def body(scratch, sem):
        def step(i, _):
            dma = pltpu.make_async_copy(
                table_ref.at[idx_ref[i]], scratch, sem)
            dma.start(); dma.wait()
            out_ref[i, :] = scratch[:]
            return 0
        jax.lax.fori_loop(0, W, step, 0)
    pl.run_scoped(body, scratch=pltpu.VMEM((B,), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()))

table = jnp.arange(N * B, dtype=jnp.float32).reshape(N, B)
idx = (jnp.arange(W, dtype=jnp.int32) * 7919) % N
grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1,
    grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)
out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((W, B), jnp.float32),
    grid_spec=grid_spec,
    compiler_params=pltpu.CompilerParams(has_side_effects=True),
)(idx, table)
import numpy as np
ref = np.asarray(table)[np.asarray(idx)]
assert np.allclose(np.asarray(out), ref), "WRONG RESULT"
print("OK")
""",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=300)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpreter semantics check only")
    args = ap.parse_args()

    results = {}
    for name, code in PROBES.items():
        if args.interpret:
            # force the CPU backend and patch pallas_call to interpreter
            # mode before the probe code imports it
            code = (
                "import jax, functools\n"
                "jax.config.update('jax_platforms', 'cpu')\n"
                "from jax.experimental import pallas as _pl\n"
                "_pl.pallas_call = functools.partial(_pl.pallas_call,\n"
                "                                    interpret=True)\n"
                + code
            )
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=args.timeout,
            )
            if r.returncode == 0 and "OK" in r.stdout:
                verdict = "SUPPORTED"
            else:
                tail = (r.stderr or r.stdout).strip().splitlines()
                verdict = "FAILED: " + (tail[-1][:200] if tail else "?")
        except subprocess.TimeoutExpired:
            verdict = "TIMEOUT (compile hang — no verdict)"
        results[name] = verdict
        print(json.dumps({"probe": name, "verdict": verdict}), flush=True)

    fused_possible = results.get("vmem_axis0_gather", "").startswith(
        "SUPPORTED"
    ) or results.get("vmem_dynamic_row_loop", "").startswith("SUPPORTED")
    print(json.dumps({"fused_sparse_kernel_possible": fused_possible}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
