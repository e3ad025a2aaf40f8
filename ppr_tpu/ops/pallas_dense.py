"""Pallas TPU kernel: fused dense PPR propagation for small/medium graphs.

For graphs whose row-normalized transition operator fits in VMEM (n_pad up to
~1024 in f32 — comfortably covering the reference's GOT benchmark graph at
n_pad = 128), one kernel runs *all* propagation iterations with the operator
and the batch state resident on-chip: per iteration one [TB, N] x [N, N] MXU
matmul plus VPU elementwise updates, with zero HBM traffic between
iterations. This replaces ``iters`` separate XLA dispatches of
``push_out``-based sweeps (each of which round-trips p and r through HBM).

Semantics: identical to the synchronous propagation of
Power_Method.java:55-100 —

    p += alpha * r
    r  = (1-alpha) * [ (r - r_dangling) @ W + sum(r_dangling) * e_src ]

with dangling mass returned to the *source* (Power_Method.java:74-80). The
``dangling_to_source=False`` variant drops dangling mass instead, matching
the Neo4j library engine (Neo4j_Method.java:73-77) where the teleport vector
is added every iteration: ``x = (1-d) e_s + d * x @ W``.

Falls back to the XLA path automatically when the operator exceeds the VMEM
budget (see :func:`supports`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..graph.csr import Graph

_ROW_TILE = 8
_VMEM_OPERATOR_LIMIT = 1024  # n_pad above this exceeds the VMEM budget in f32


_CANARY_CODE = """
import sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
if jax.default_backend() == "cpu":
    sys.exit(3)  # indeterminate: child got a different backend than parent
def k(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0
x = jnp.ones((8, 128), jnp.float32)
y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
jax.block_until_ready(y)
"""

_enabled_cache: bool | None = None


def _mosaic_canary(timeout_s: float = 45.0, ttl_s: float = 3600.0) -> bool:
    """Probe whether Mosaic programs compile on this backend right now.

    This environment's remote compile service goes through phases where
    Mosaic compiles stall for many minutes; a stalled compile would hang the
    whole engine, so the probe runs a tiny kernel in a *subprocess* under a
    timeout. The verdict is cached on disk for ``ttl_s`` (tunnel health is
    phase-like, hours-scale)."""
    import os
    import subprocess
    import sys
    import time

    cache = os.path.expanduser("~/.cache/ppr_tpu_mosaic_ok")
    try:
        with open(cache) as f:
            ts, verdict = f.read().split()
        if time.time() - float(ts) < ttl_s:
            return verdict == "1"
    except Exception:
        pass
    # the child must see the same platform plugins as the parent — this
    # container registers the axon backend via a sitecustomize reachable
    # only with /root/.axon_site on PYTHONPATH
    env = dict(os.environ)
    axon_site = "/root/.axon_site"
    if os.path.isdir(axon_site) and axon_site not in env.get("PYTHONPATH", ""):
        env["PYTHONPATH"] = (
            axon_site + os.pathsep + env["PYTHONPATH"]
            if env.get("PYTHONPATH") else axon_site
        )
    indeterminate = False
    try:
        r = subprocess.run(
            [sys.executable, "-c", _CANARY_CODE],
            timeout=timeout_s, capture_output=True, env=env,
        )
        ok = r.returncode == 0
        indeterminate = r.returncode == 3  # child saw a different backend
    except subprocess.TimeoutExpired:
        ok = False  # a stalled Mosaic compile is exactly what we gate on
    except Exception:
        ok, indeterminate = False, True  # spawn failure: don't cache
    if not indeterminate:
        try:
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            with open(cache, "w") as f:
                f.write(f"{time.time()} {int(ok)}")
        except Exception:
            pass
    return ok and not indeterminate


def enabled() -> bool:
    """Whether Mosaic (Pallas) kernels are used on this backend.

    * ``PPR_TPU_PALLAS=1`` / ``=0`` forces on/off.
    * otherwise (TPU backends): decided by a one-shot subprocess canary
      compile under a timeout, cached on disk for an hour — the remote
      compile service has phases where Mosaic programs stall for minutes,
      and a stalled compile would hang the engine. When healthy, the fused
      dense kernel measures 16x over the XLA loop on the GOT operator
      (0.04 ms vs 0.65 ms per 100-iteration batch).
    * CPU backend: off (kernels stay correctness-tested in interpreter
      mode, tests/test_pallas_dense.py)."""
    import os

    global _enabled_cache
    env = os.environ.get("PPR_TPU_PALLAS")
    if env is not None:
        return env == "1"
    import jax

    if jax.default_backend() == "cpu":
        return False
    if _enabled_cache is None:
        _enabled_cache = _mosaic_canary()
    return _enabled_cache


def supports(g: Graph) -> bool:
    # cheap graph-eligibility checks first: the canary behind enabled()
    # costs a (once-hourly) subprocess probe and briefly shares the single
    # tunneled chip with the parent — only ever pay it when a graph could
    # actually use the kernel
    return (g.has_dense and g.n_pad <= _VMEM_OPERATOR_LIMIT and enabled())


def _ppr_kernel(iters: int, alpha: float, dangling_to_source: bool):
    inv_keep = 1.0 - alpha

    def kernel(w_ref, onehot_ref, dang_ref, p_ref):
        onehot = onehot_ref[:]                      # [TB, N] source one-hots
        dang = dang_ref[:]                          # [1, N] dangling mask

        def body(_, state):
            p, r = state
            p = p + alpha * r
            r_dang = r * dang
            dang_mass = jnp.sum(r_dang, axis=-1, keepdims=True)
            pushed = jnp.dot(
                r - r_dang, w_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            if dangling_to_source:
                r = inv_keep * (pushed + dang_mass * onehot)
            else:
                r = inv_keep * pushed
            return p, r

        p0 = jnp.zeros_like(onehot)
        p, _ = jax.lax.fori_loop(0, iters, body, (p0, onehot))
        p_ref[:] = p

    return kernel


def _pagerank_kernel(iters: int, damping: float):
    def kernel(w_ref, onehot_ref, p_ref):
        base = (1.0 - damping) * onehot_ref[:]

        def body(_, x):
            return base + damping * jnp.dot(
                x, w_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        p_ref[:] = jax.lax.fori_loop(0, iters, body, base)

    return kernel


@partial(jax.jit, static_argnames=("alpha", "iters", "dangling_to_source",
                                   "interpret"))
def dense_power_iterations(
    g: Graph,
    src_onehot: jax.Array,      # f32[B, n_pad]
    alpha: float,
    iters: int,
    *,
    dangling_to_source: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Fused on-chip propagation; returns the reserve p (f32[B, n_pad])."""
    b, n = src_onehot.shape
    b_pad = ((b + _ROW_TILE - 1) // _ROW_TILE) * _ROW_TILE
    if b_pad != b:
        src_onehot = jnp.pad(src_onehot, ((0, b_pad - b), (0, 0)))
    dang = (
        ((g.out_deg == 0) & (g.node_mask > 0)).astype(jnp.float32)[None, :]
    )

    out = pl.pallas_call(
        _ppr_kernel(iters, alpha, dangling_to_source),
        out_shape=jax.ShapeDtypeStruct((b_pad, n), jnp.float32),
        grid=(b_pad // _ROW_TILE,),
        in_specs=[
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_TILE, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(g.dense_out, src_onehot, dang)
    return out[:b]


@partial(jax.jit, static_argnames=("damping", "iters", "interpret"))
def dense_pagerank_iterations(
    g: Graph,
    src_onehot: jax.Array,      # f32[B, n_pad]
    damping: float,
    iters: int,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Fused Neo4j-style personalized PageRank (un-normalized)."""
    b, n = src_onehot.shape
    b_pad = ((b + _ROW_TILE - 1) // _ROW_TILE) * _ROW_TILE
    if b_pad != b:
        src_onehot = jnp.pad(src_onehot, ((0, b_pad - b), (0, 0)))

    out = pl.pallas_call(
        _pagerank_kernel(iters, damping),
        out_shape=jax.ShapeDtypeStruct((b_pad, n), jnp.float32),
        grid=(b_pad // _ROW_TILE,),
        in_specs=[
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_TILE, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(g.dense_out, src_onehot)
    return out[:b]
