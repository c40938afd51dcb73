"""Sequential-scan vs associative-scan Riccati at long horizons.

The horizon axis is the reference's main scaling dimension
(run_random_linear.jl:112 sweeps N to 101); the associative-scan backward
pass (ops/parallel_riccati.py, PAPERS.md "The Parallelization of Riccati
Recursion") trades O(N) depth for O(log N) depth at ~2x the FLOPs. This
driver measures both at N = 101/301/1001 (B = 128, n = 12, m = 6) and
reports the crossover, informing the parallel_riccati dispatch default.

Run on TPU: ``python -m altro_tpu.bench.parallel_riccati_bench``.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def _instance(rng, N, n, m, dtype):
    """Marginally-stable batched LQR expansion stacks (lu/luu/lux carry N
    entries; the backward pass slices [:-1] internally)."""
    from altro_tpu.models.random_linear import gen_random_linear
    prob = gen_random_linear(rng, n, m, N, dtype=dtype)
    A = prob.dynamics.A
    B = prob.dynamics.B
    lxx = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (N, n, n))
    luu = jnp.broadcast_to(0.1 * jnp.eye(m, dtype=dtype), (N, m, m))
    lux = jnp.zeros((N, m, n), dtype)
    lx = jnp.asarray(rng.standard_normal((N, n)), dtype)
    lu = jnp.asarray(rng.standard_normal((N, m)), dtype)
    return A, B, lx, lu, lxx, luu, lux


def run(Ns=(101, 301, 1001), B=128, n=12, m=6, samples=5):
    from altro_tpu.ops.parallel_riccati import parallel_backward_pass
    from altro_tpu.solver.altro import _backward_pass_scan, backward_pass

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    rows = []
    for N in Ns:
        stacks = _instance(rng, N, n, m, dtype)
        batched = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape) *
            (1.0 + 1e-3 * jnp.arange(B, dtype=dtype).reshape(
                (B,) + (1,) * a.ndim)), stacks)

        REPEATS = 10

        def time_fn(fn, label):
            A_b, B_b, lx_b, lu_b, lxx_b, luu_b, lux_b = batched

            # Chain REPEATS calls with a data dependency (each call's lx
            # feeds on the previous gains) inside one jit, so no executor
            # trick can elide or overlap the repeated work; reg must be a
            # SCALAR inside each vmapped instance (a closed-over [B] array
            # silently batches every scan carry and blows up the remote
            # TPU compile).
            def one(lx):
                K, d, dV1, dV2 = jax.vmap(
                    lambda A, Bm, lx1, lu, lxx, luu, lux: fn(
                        A, Bm, lx1, lu, lxx, luu, lux,
                        jnp.zeros((), dtype)))(
                    A_b, B_b, lx, lu_b, lxx_b, luu_b, lux_b)
                # scalar data dependency on the full backward output
                return lx + 1e-6 * jnp.mean(d)

            def chain(lx):
                def body(lx, _):
                    return one(lx), ()
                lx, _ = jax.lax.scan(body, lx, None, length=REPEATS)
                return lx

            jchain = jax.jit(chain)
            out = jax.block_until_ready(jchain(lx_b))  # compile
            times = []
            for _ in range(samples):
                t0 = time.perf_counter()
                out = jchain(lx_b)
                jax.block_until_ready(out)
                times.append((time.perf_counter() - t0) / REPEATS * 1e3)
            med = float(np.median(times))
            print(f"  N={N} {label}: {med:.3f} ms (B={B})", flush=True)
            return med

        # three variants: the production dispatch (Pallas lane-packed kernel
        # on TPU when supported), the raw XLA scan, and the associative scan
        t_prod = time_fn(backward_pass, "production(Pallas)")
        t_seq = time_fn(_backward_pass_scan, "xla-scan")
        t_par = time_fn(parallel_backward_pass, "assoc-scan")
        rows.append(dict(N=N, B=B, production_ms=t_prod, xla_scan_ms=t_seq,
                         assoc_ms=t_par,
                         assoc_vs_scan=round(t_seq / t_par, 2),
                         assoc_vs_production=round(t_prod / t_par, 2)))
    return rows


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="results_tpu")
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args()
    rows = run(B=args.batch)
    os.makedirs(args.out, exist_ok=True)
    res = dict(rows=rows, device=str(jax.devices()[0]), dtype="float32",
               dims="n=12 m=6")
    with open(os.path.join(args.out, "parallel_riccati.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
