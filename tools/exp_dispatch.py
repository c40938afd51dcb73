"""Experiment: is the flagship bench dispatch-bound through the axon tunnel?

(a) time the 30-step pipelined loop with and without the final fence
(b) fuse K MPC steps into one dispatched program (Python-unrolled inside
    jit — NOT lax.scan, which blows up the remote compile) and measure
    steps/s vs K.

Run on TPU: python tools/exp_dispatch.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import altro_tpu as at
from altro_tpu.models import random_linear as rl
from altro_tpu.mpc import make_mpc_step


def main():
    B, T = 1024, 30
    N_mpc, n, m = 30, 12, 6
    dtype = jnp.float32
    rng = np.random.default_rng(1)
    N_track = N_mpc + T + 2
    prob = rl.gen_random_linear(rng, n, m, N_track, dtype=dtype)
    X_track, U_track = rl.gen_trajectory(rng, prob, N_track)
    prob_mpc = rl.gen_tracking_mpc(prob, X_track, U_track, N_mpc)
    opts = at.SolverOptions(cost_tolerance=1e-4, gradient_tolerance=1e-4,
                            constraint_tolerance=1e-4, penalty_initial=1e3,
                            penalty_scaling=100.0, reset_duals=False,
                            iterations_linesearch=4)
    noise = jnp.asarray(rng.standard_normal((T, B, n)), dtype)

    step, init_carry = make_mpc_step(prob_mpc, opts, X_track, U_track)
    vstep = jax.jit(jax.vmap(step, in_axes=(0, 0)))
    carry0 = jax.block_until_ready(
        jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))

    carry, out = vstep(carry0, noise[0])
    jax.block_until_ready(carry)

    # (a) enqueue-only vs fenced
    for fence in (False, True):
        carry = carry0
        t0 = time.perf_counter()
        for t in range(T):
            carry, out = vstep(carry, noise[t])
        if fence:
            jax.block_until_ready(carry)
        dt = time.perf_counter() - t0
        print(f"K=1 fence={fence}: {dt*1e3:8.1f} ms total, "
              f"{dt/T*1e3:6.2f} ms/step, {B*T/dt:9.0f} solves/s", flush=True)

    # (b) K steps per dispatch (Python-unrolled in one jit)
    for K in (2, 3, 5):
        def multi(carry, noise_k):
            outs = []
            for i in range(K):
                carry, out = step(carry, noise_k[i])
                outs.append((out.status, out.viol, out.iters))
            return carry, outs

        vmulti = jax.jit(jax.vmap(multi, in_axes=(0, 1)))
        nT = (T // K) * K
        noise_k = noise[:nT].reshape(T // K, K, B, n)
        t0 = time.perf_counter()
        carry, outs = vmulti(carry0, noise_k[0])
        jax.block_until_ready(carry)
        comp = time.perf_counter() - t0

        carry = carry0
        t0 = time.perf_counter()
        for t in range(T // K):
            carry, outs = vmulti(carry, noise_k[t])
        jax.block_until_ready(carry)
        dt = time.perf_counter() - t0
        ok = float(jnp.mean(outs[-1][0]))
        print(f"K={K}: {dt*1e3:8.1f} ms total, {dt/nT*1e3:6.2f} ms/step, "
              f"{B*nT/dt:9.0f} solves/s (compile {comp:.0f}s, "
              f"last-status {ok:.3f})", flush=True)


if __name__ == "__main__":
    main()
