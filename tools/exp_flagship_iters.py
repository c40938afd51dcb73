"""Experiment: flagship per-step iteration distribution + tuning sweep.

The vmapped solve runs the lax.while_loop until ALL 1024 lanes converge, so
per-step wall cost is fixed_overhead + max_iters_over_lanes * per_iter.
Measure the per-step max/p99/mean iteration counts and whether AL-schedule
tunings cut the batchwide max (mean 2.11 today).

Run on TPU: env PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_flagship_iters.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import altro_tpu as at
from altro_tpu.models import random_linear as rl
from altro_tpu.mpc import make_mpc_step

CONFIGS = {
    "default_1e3_s100_reset": dict(),
    "init1e4_s100_reset": dict(penalty_initial=1e4),
    "carry_rho_init1e3": dict(reset_penalties=False),
    "grad_tol_3e-4": dict(gradient_tolerance=3e-4),
}


def run(name, okw):
    B, T = 1024, 30
    N_mpc, n, m = 30, 12, 6
    dtype = jnp.float32
    rng = np.random.default_rng(1)
    N_track = N_mpc + T + 2
    prob = rl.gen_random_linear(rng, n, m, N_track, dtype=dtype)
    X_track, U_track = rl.gen_trajectory(rng, prob, N_track)
    prob_mpc = rl.gen_tracking_mpc(prob, X_track, U_track, N_mpc)
    base = dict(cost_tolerance=1e-4, gradient_tolerance=1e-4,
                constraint_tolerance=1e-4, penalty_initial=1e3,
                penalty_scaling=100.0, reset_duals=False,
                iterations_linesearch=4)
    base.update(okw)
    opts = at.SolverOptions(**base)
    noise = jnp.asarray(rng.standard_normal((T, B, n)), dtype)

    step, init_carry = make_mpc_step(prob_mpc, opts, X_track, U_track)
    vstep = jax.jit(jax.vmap(step, in_axes=(0, 0)))
    carry0 = jax.block_until_ready(
        jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
    carry, out = vstep(carry0, noise[0])
    jax.block_until_ready(carry)

    carry = carry0
    iters, viols, sts = [], [], []
    t0 = time.perf_counter()
    for t in range(T):
        carry, out = vstep(carry, noise[t])
        iters.append(out.iters)
        viols.append(out.viol)
        sts.append(out.status)
    jax.block_until_ready(carry)
    dt = time.perf_counter() - t0

    it = np.asarray(jnp.stack(iters))          # [T, B]
    mx = it.max(axis=1)
    print(f"{name:24s} ms/step={dt/T*1e3:6.2f} solves/s={B*T/dt:8.0f} "
          f"mean={it.mean():.2f} p99={np.percentile(it, 99):.0f} "
          f"max/step={mx.mean():.2f} (worst {mx.max()}) "
          f"success={float(jnp.mean(jnp.stack(sts))):.4f} "
          f"viol={float(jnp.max(jnp.stack(viols))):.2e}", flush=True)
    # histogram of per-lane iters
    vals, cnts = np.unique(it, return_counts=True)
    print(f"    iters hist: {dict(zip(vals.tolist(), cnts.tolist()))}",
          flush=True)


if __name__ == "__main__":
    import sys
    which = sys.argv[1:] or list(CONFIGS)
    for name in which:
        run(name, CONFIGS[name])
