"""Round-4 probe: where does the CONIC (rocket SOC) iteration spend time?

VERDICT r3 item 2 asks to lane-pack the SOC AL expansion into the Pallas
path, OR commit a measurement showing the expansion is <20% of the conic
iteration. This probe measures, at the shipped rocket bench config
(B=1024, N=21, n=6, m=3, 3 SOC blocks):

  - the in-context per-iteration cost + per-step overhead (forced-iteration
    slope fit on the real warm step, bench methodology), and
  - isolated chained-scan times for the iteration's pieces: SOC AL
    expansion (XLA), backward (Pallas via custom_vmap), ladder rollouts
    (Pallas), ladder AL-cost evals incl. SOC projections (XLA).

Run on TPU: python tools/exp_conic_attrib.py
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

REPEATS = 100


def _chain_time(fn_scalar, label, samples=5):
    def body(eps, _):
        return 1e-12 * fn_scalar(eps), ()

    jc = jax.jit(lambda e: jax.lax.scan(body, e, None, length=REPEATS)[0])
    e0 = jnp.zeros((), jnp.float32)
    jax.block_until_ready(jc(e0))
    times = []
    for _ in range(samples):
        t0 = time.perf_counter()
        out = jc(e0)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / REPEATS * 1e3)
    med = float(np.median(times))
    print(f"  {label:42s} {med:8.3f} ms", flush=True)
    return med


def _pipeline_time(fn, carry0, noises, ks, label, samples=3):
    carry, out = fn(carry0, noises[0], ks[0])
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    T = noises.shape[0]
    walls = []
    for _ in range(samples):
        carry = carry0
        t0 = time.perf_counter()
        for t in range(T):
            carry, out = fn(carry, noises[t], ks[t])
        jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
        walls.append((time.perf_counter() - t0) / T * 1e3)
    med = float(np.median(walls))
    print(f"  {label:42s} {med:8.3f} ms/step", flush=True)
    return med


def main(B=1024):
    import altro_tpu as at
    from altro_tpu.bench.batched_conic import rocket_setup
    from altro_tpu.mpc import make_mpc_step
    from altro_tpu.solver import altro as S

    dtype = jnp.float32
    su = rocket_setup(dtype)
    pm, opts = su["prob_mpc"], su["opts"]
    n, m, N = pm.n, pm.m, pm.N

    rng = np.random.default_rng(1)
    T = 8
    noise = jnp.asarray(rng.standard_normal((T, B, 6)), dtype)
    ks = [jnp.asarray(t, jnp.int32) for t in range(T)]

    step, init_carry = make_mpc_step(pm, opts, su["X_track"], su["U_track"],
                                     noise_model=su["noise_model"],
                                     shared_k=True)
    vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, None)))
    carry = jax.block_until_ready(
        jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
    for t in range(3):
        carry, out = vstep(carry, noise[t], ks[t])
    jax.block_until_ready(carry)
    x0s, _Xs, Us, duals = carry
    Xs = jax.jit(jax.vmap(pm.dynamics.rollout))(x0s, Us)
    reg = jnp.zeros((B,), dtype)
    res = {"batch": B}

    with jax.default_matmul_precision("highest"):
        # ---- in-context slope fit on the real warm step ----
        for iters in (1, 2, 4):
            o = opts.replace(cost_tolerance=0.0, gradient_tolerance=0.0,
                             early_exact_tol=0.0, iterations_inner=iters,
                             iterations_outer=1)
            st, _ic = make_mpc_step(pm, o, su["X_track"], su["U_track"],
                                    noise_model=su["noise_model"],
                                    shared_k=True)
            j = jax.jit(jax.vmap(st, in_axes=(0, 0, None)))
            res[f"step_ms_inner{iters}"] = _pipeline_time(
                j, carry, noise, ks, f"step @ {iters} forced iters")
        xs = np.array([1, 2, 4], np.float64)
        ys = np.array([res[f"step_ms_inner{i}"] for i in (1, 2, 4)])
        slope, intercept = np.polyfit(xs, ys, 1)
        res["per_iteration_ms"] = round(float(slope), 4)
        res["per_step_overhead_ms"] = round(float(intercept), 4)
        print(f"  in-context: {slope:.3f} ms/iter + {intercept:.3f} ms/step",
              flush=True)

        # ---- isolated segments (chained scans) ----
        alphas_t = tuple(opts.ls_decrease ** i
                         for i in range(opts.iterations_linesearch)) + (0.0,)

        def expand_scalar(eps):
            out = jax.vmap(lambda X, U, d: S.al_expansion(pm, d, X, U))(
                Xs + eps, Us, duals)
            return jnp.mean(out[0])

        res["al_expansion_only"] = _chain_time(
            expand_scalar, "SOC AL expansion (XLA, factored)")

        def eb(eps):
            def single(X, U, d, rg):
                lams = tuple(dd.lam for dd in d)
                rhos = tuple(dd.rho for dd in d)
                K, dff, dV1, dV2 = S.expand_backward(
                    pm.cost, pm.dynamics.A, pm.dynamics.B, pm.constraints,
                    X, U, lams, rhos, rg)
                return jnp.mean(dff)
            return jnp.mean(jax.vmap(single)(Xs + eps, Us, duals, reg))

        res["expansion_plus_backward"] = _chain_time(
            eb, "expansion + backward (solver boundary)")

        def ladder_scalar(eps):
            dyn = pm.dynamics
            K0 = jnp.zeros((B, N - 1, m, n), dtype)
            d0 = jnp.zeros((B, N - 1, m), dtype)
            Xts, Uts = jax.vmap(
                lambda X, U, Kk, dk: S._ls_rollouts_fn(alphas_t)(
                    dyn.A, dyn.B, dyn.d, X, U, Kk, dk))(
                Xs + eps, Us, K0, d0)
            return jnp.mean(Uts)

        res["ladder_rollouts_only"] = _chain_time(
            ladder_scalar, "ladder rollouts (Pallas)")

        def costs_scalar(eps):
            def single(d, X, U):
                Jts, _resid = jax.vmap(
                    lambda a: S.total_al_cost_res(pm, d,
                                                  X + a * 0.0, U))(
                    jnp.asarray(alphas_t, dtype))
                return jnp.mean(Jts)
            return jnp.mean(jax.vmap(single)(duals, Xs + eps, Us))

        res["ladder_al_costs_only"] = _chain_time(
            costs_scalar, "ladder AL cost evals incl SOC proj (XLA)")

    res["expansion_frac_of_iteration"] = round(
        res["al_expansion_only"] / max(res["per_iteration_ms"], 1e-9), 3)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=1))
    with open("results_tpu/conic_attribution.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
