"""Per-segment attribution of the batched ROCKET SOC MPC iteration.

Same methodology as bench/attribution.py (chained jit programs, B=1024,
f32) applied to the rocket conic config (N_mpc=21, n=6, m=3, cones:
NONPOS max-thrust + SOC thrust-angle + SOC glideslope + bounds):

  - AL expansion (cone-specialized curvature, XLA)
  - Riccati backward (Pallas via custom_vmap)
  - ladder rollouts (Pallas)
  - ladder AL cost evals (SOC projections per rung, XLA)
  - one full iLQR iteration; full MPC step

Run on TPU: env PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_conic_attr.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import altro_tpu as at
from altro_tpu.mpc import gen_tracking_mpc, make_mpc_step
from altro_tpu.models import rocket
from altro_tpu.solver import altro as S

REPEATS = 100
B, T, N_mpc = 1024, 5, 21


def chain(fn, label, samples=5):
    def body(eps, _):
        return 1e-12 * fn(eps), ()

    jc = jax.jit(lambda e: jax.lax.scan(body, e, None, length=REPEATS)[0])
    e0 = jnp.zeros((), jnp.float32)
    jax.block_until_ready(jc(e0))
    times = []
    for _ in range(samples):
        t0 = time.perf_counter()
        jax.block_until_ready(jc(e0))
        times.append((time.perf_counter() - t0) / REPEATS * 1e3)
    med = float(np.median(times))
    print(f"  {label:40s} {med:8.3f} ms", flush=True)
    return med


def main():
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

    pm = gen_tracking_mpc(prob, cold.X, cold.U, N_mpc, dt=0.05)
    opts = at.SolverOptions(
        cost_tolerance=1e-4, gradient_tolerance=1e-6,
        constraint_tolerance=1e-4, penalty_initial=1e3,
        penalty_scaling=10.0, reset_duals=False, iterations_outer=10)

    rng = np.random.default_rng(1)
    noise = jnp.asarray(rng.standard_normal((T, B, 6)), dtype)
    step, init_carry = make_mpc_step(
        pm, opts, cold.X, cold.U,
        noise_model=rocket.rocket_noise_model(), shared_k=True)
    vstep_k = jax.jit(jax.vmap(step, in_axes=(0, 0, None)))
    carry = jax.block_until_ready(
        jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
    for t in range(T - 1):
        carry, out = vstep_k(carry, noise[t], jnp.asarray(t, jnp.int32))
    jax.block_until_ready(carry)
    x0s, _Xs, Us, duals = carry
    Xs = jax.jit(jax.vmap(pm.dynamics.rollout))(x0s, Us)
    reg = jnp.zeros((B,), dtype)
    n, m = pm.n, pm.m

    with jax.default_matmul_precision("highest"):
        # full step (pipelined)
        _kc = jnp.asarray(0, jnp.int32)
        vs2 = lambda c, nz: vstep_k(c, nz, _kc)
        c2, _ = vs2(carry, noise[0])
        jax.block_until_ready(jax.tree_util.tree_leaves(c2)[0])
        noise2 = jnp.asarray(rng.standard_normal((REPEATS, B, 6)), dtype)
        cl = carry
        t0 = time.perf_counter()
        for t in range(REPEATS):
            cl, _ = vs2(cl, noise2[t])
        jax.block_until_ready(jax.tree_util.tree_leaves(cl)[0])
        print(f"  {'full MPC step':40s} "
              f"{(time.perf_counter() - t0) / REPEATS * 1e3:8.3f} ms",
              flush=True)

        alphas_t = tuple(0.5 ** i for i in range(4))

        def one_iter(eps):
            def single(X, U, d, rg):
                A, Bd, _ = pm.dynamics.linearize(X, U)
                lx, lu, lxx, luu, lux = S.al_expansion(pm, d, X, U)
                K, dff, dV1, dV2 = S.backward_pass(
                    A, Bd, lx + eps * 0, lu, lxx, luu, lux, rg)
                dyn = pm.dynamics
                Xts, Uts = S._ls_rollouts_fn(alphas_t)(
                    dyn.A, dyn.B, dyn.d, X, U, K, dff)
                Jts, _ = jax.vmap(
                    lambda Xt, Ut: S.total_al_cost_res(pm, d, Xt, Ut))(
                    Xts, Uts)
                return jnp.mean(Jts)
            return jnp.mean(jax.vmap(single)(Xs + eps, Us, duals, reg))

        chain(one_iter, "one iLQR iteration")

        def expand_only(eps):
            out = jax.vmap(lambda X, U, d: S.al_expansion(pm, d, X, U))(
                Xs + eps, Us, duals)
            return jnp.mean(out[0])

        chain(expand_only, "AL expansion (cone curvature, XLA)")

        exp = jax.jit(lambda: jax.vmap(
            lambda X, U, d: S.al_expansion(pm, d, X, U))(Xs, Us, duals))()
        lx, lu, lxx, luu, lux = exp
        A_b = jnp.broadcast_to(pm.dynamics.A, (B,) + pm.dynamics.A.shape)
        B_b = jnp.broadcast_to(pm.dynamics.B, (B,) + pm.dynamics.B.shape)

        def bwd(eps):
            K, dff, dV1, dV2 = jax.vmap(S.backward_pass)(
                A_b, B_b, lx + eps, lu, lxx, luu, lux, reg)
            return jnp.mean(dff)

        chain(bwd, "backward pass (Pallas)")

        K, dff, _, _ = jax.jit(lambda: jax.vmap(S.backward_pass)(
            A_b, B_b, lx, lu, lxx, luu, lux, reg))()

        def ladder(eps):
            dyn = pm.dynamics
            Xts, Uts = jax.vmap(
                lambda X, U, Kk, dk: S._ls_rollouts_fn(alphas_t)(
                    dyn.A, dyn.B, dyn.d, X, U, Kk, dk))(
                Xs + eps, Us, K, dff)
            return jnp.mean(Uts)

        chain(ladder, "ladder rollouts (Pallas)")

        Xts, Uts = jax.jit(lambda: jax.vmap(
            lambda X, U, Kk, dk: S._ls_rollouts_fn(alphas_t)(
                pm.dynamics.A, pm.dynamics.B, pm.dynamics.d, X, U, Kk, dk))(
            Xs, Us, K, dff))()

        def lad_costs(eps):
            def single(d, Xt, Ut):
                Jts, _ = jax.vmap(
                    lambda X, U: S.total_al_cost_res(pm, d, X, U))(Xt, Ut)
                return Jts
            return jnp.mean(jax.vmap(single)(duals, Xts + eps, Uts))

        chain(lad_costs, "ladder AL cost evals (SOC proj, XLA)")

        def init_ro(eps):
            def single(x0, U):
                Xb0 = jnp.zeros((N_mpc, n), x0.dtype).at[0].set(x0)
                Xts1, _ = S._ls_rollouts_fn((1.0,))(
                    pm.dynamics.A, pm.dynamics.B, pm.dynamics.d, Xb0, U,
                    jnp.zeros((N_mpc - 1, m, n), x0.dtype),
                    jnp.zeros((N_mpc - 1, m), x0.dtype))
                return Xts1[0]
            return jnp.mean(jax.vmap(single)(x0s + eps, Us))

        chain(init_ro, "init rollout (ladder L=1)")


if __name__ == "__main__":
    main()
