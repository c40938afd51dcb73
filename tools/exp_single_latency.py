"""Round-4 probe: single-instance warm MPC latency on CPU vs scan unroll.

VERDICT r3 item 6: one committed config with a warm single solve <= 2x the
reference's 0.583 ms at N=31 (figures/horizon_comp.tikz mean line), or a
measured dispatch-floor analysis. The hypothesis: XLA:CPU executes the
rolled horizon scans as a per-knot dispatch chain, and unrolling them
(ALTRO_TPU_UNROLL, read at trace time) recovers most of the gap — the knot
ADMM's native UNROLL=16 bought 3x on the same host.

Measures per-warm-MPC-step wall (shifts + solve, the run_MPC hot line) on
the random-linear config at several horizons x unroll factors.

Run: env -u PYTHONPATH JAX_PLATFORMS=cpu ALTRO_TPU_UNROLL=<u> \
        python tools/exp_single_latency.py
(one unroll factor per process: the knob is read at trace time and the
jitted step caches per process).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def measure(N_mpc: int, T: int = 60, dtype=jnp.float64, seed: int = 0):
    import altro_tpu as at
    from altro_tpu.models import random_linear as rl
    from altro_tpu.mpc import make_mpc_step

    rng = np.random.default_rng(seed)
    n, m = 12, 6
    N_track = N_mpc + T + 2
    prob = rl.gen_random_linear(rng, n, m, N_track, dtype=dtype)
    X_track, U_track = rl.gen_trajectory(rng, prob, N_track)
    prob_mpc = rl.gen_tracking_mpc(prob, X_track, U_track, N_mpc)
    opts = at.SolverOptions(
        cost_tolerance=1e-4, gradient_tolerance=1e-4,
        constraint_tolerance=1e-4, penalty_initial=1e3,
        penalty_scaling=100.0, reset_duals=False,
        iterations_linesearch=2, early_exact_tol=1e-3)

    step, init_carry = make_mpc_step(prob_mpc, opts, X_track, U_track,
                                     shared_k=True)
    jstep = jax.jit(step)
    carry = jax.block_until_ready(jax.jit(init_carry)())
    noise = jnp.asarray(rng.standard_normal((T, n)), dtype)

    t0 = time.perf_counter()
    c, out = jstep(carry, noise[0], jnp.asarray(0, jnp.int32))
    jax.block_until_ready(out.status)
    compile_s = time.perf_counter() - t0

    walls, iters, viols = [], [], []
    for t in range(T):
        t0 = time.perf_counter()
        carry, out = jstep(carry, noise[t], jnp.asarray(t, jnp.int32))
        jax.block_until_ready(out.status)
        walls.append((time.perf_counter() - t0) * 1e3)
        iters.append(int(out.iters))
        viols.append(float(out.viol))
    return dict(N=N_mpc, step_ms_mean=round(float(np.mean(walls)), 4),
                step_ms_p50=round(float(np.percentile(walls, 50)), 4),
                step_ms_min=round(float(np.min(walls)), 4),
                mean_iters=round(float(np.mean(iters)), 3),
                max_viol=float(np.max(viols)),
                compile_s=round(compile_s, 2))


def main():
    unroll = int(os.environ.get("ALTRO_TPU_UNROLL", "1"))
    rows = []
    for N in (11, 31, 51, 101):
        r = measure(N)
        r["unroll"] = unroll
        print(json.dumps(r), flush=True)
        rows.append(r)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results_cpu",
        f"single_latency_u{unroll}.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
