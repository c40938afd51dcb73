"""Repro: NaN max_viol in the batched rocket SOC MPC (CPU f32, small B).

Runs the rocket_batched MPC-step loop at B=64, T=10 and reports per-step
NaN counts in viol/status/U to localize the regression (suspect:
2e6491f residual-reuse round-end update).

Run: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/exp_rocket_nan.py
"""
import numpy as np
import jax
import jax.numpy as jnp

import altro_tpu as at
from altro_tpu.models import rocket
from altro_tpu.mpc import gen_tracking_mpc, make_mpc_step

B, T, N_mpc = 64, 10, 21
dtype = jnp.float32
N = 301
prob = rocket.rocket_problem(N=N, tf=(N - 1) * 0.05, dtype=dtype)
cold_opts = at.SolverOptions(
    cost_tolerance=1e-5, gradient_tolerance=1e-6,
    constraint_tolerance=1e-4, penalty_initial=1e-2,
    penalty_scaling=500.0, iterations_outer=40, iterations_inner=100)
print("cold solve...", flush=True)
cold = jax.jit(at.solve)(prob, cold_opts, U0=rocket.hover_controls(prob))
jax.block_until_ready(cold.X)
print(f"cold: status={int(cold.stats.status)} "
      f"viol={float(cold.stats.viol):.2e}", flush=True)

prob_mpc = gen_tracking_mpc(prob, cold.X, cold.U, N_mpc, dt=0.05)
opts = at.SolverOptions(
    cost_tolerance=1e-4, gradient_tolerance=1e-6,
    constraint_tolerance=1e-4, penalty_initial=1e3,
    penalty_scaling=10.0, reset_duals=False, iterations_outer=10)

rng = np.random.default_rng(1)
noise = jnp.asarray(rng.standard_normal((T, 1024, 6))[:, :B], dtype)
step, init_carry = make_mpc_step(
    prob_mpc, opts, cold.X, cold.U, noise_model=rocket.rocket_noise_model())
vstep = jax.jit(jax.vmap(step, in_axes=(0, 0)))
carry = jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B))
for t in range(T):
    carry, out = vstep(carry, noise[t])
    v = np.asarray(out.viol)
    s = np.asarray(out.status)
    it = np.asarray(out.iters)
    nn = int(np.isnan(v).sum())
    print(f"t={t}: nan_viol={nn} fail={int((s == 0).sum())} "
          f"max_viol={np.nanmax(v):.2e} max_iters={it.max()}", flush=True)
    if nn:
        idx = int(np.argmax(np.isnan(v)))
        print(f"   first nan lane {idx}: iters={it[idx]} status={s[idx]}",
              flush=True)
