"""Round-4 probe: WHY is the fused expansion+backward kernel 12x slower
in-context? (VERDICT r3 item 4 — resolve or delete ops/riccati_fused.py.)

Known: isolated chained-scan segment 1.36 ms vs 1.79 ms for the XLA
expansion + Pallas backward chain at B=1024 (riccati_fused wins), but the
full MPC step with ALTRO_TPU_FUSED=1 runs ~65 ms/step vs 5.3 (12x loss).
Suspects (CLAUDE.md): while-carry layout pinning, per-iteration
pair/stack/moveaxis prep, kernel scheduling.

This probe bisects the context: the fused boundary vs the production
boundary (XLA expansion + Pallas backward), each measured

  A. isolated (chained jit, the round-2 measurement reproduced),
  B. inside a minimal 2-trip ``lax.while_loop`` whose carry is (X, U, it)
     and whose body calls the boundary then perturbs X with the output
     (data-dependent, nothing else — no line search, no cost evals),
  C. inside the REAL warm MPC step at 1 forced iteration
     (ALTRO_TPU_FUSED env toggles the solver's boundary).

If B blows up for fused only -> while+pallas interaction (layout pinning
of the carry across the pallas_call). If only C -> interaction with the
rest of the step program (rollout kernel outputs feeding SMEM streams).

Run on TPU: python tools/exp_fused_context.py
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

REPEATS = 50


def _time_fn(fn, args, label, samples=5):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        ts.append((time.perf_counter() - t0) * 1e3)
    med = float(np.median(ts))
    print(f"  {label:52s} {med:9.3f} ms", flush=True)
    return med


def main(B=1024):
    import altro_tpu as at
    from altro_tpu.models import random_linear as rl
    from altro_tpu.solver import altro as S

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    n, m, N = 12, 6, 30
    prob = rl.gen_random_linear(rng, n, m, 64, dtype=dtype)
    X_track, U_track = rl.gen_trajectory(rng, prob, 64)
    pm = rl.gen_tracking_mpc(prob, X_track, U_track, N)

    x0s = jnp.asarray(pm.x0)[None] + 0.01 * jnp.asarray(
        rng.standard_normal((B, n)), dtype)
    Us = jnp.asarray(0.1 * rng.standard_normal((B, N - 1, m)), dtype)
    Xs = jax.jit(jax.vmap(pm.dynamics.rollout))(x0s, Us)
    duals = jax.jit(jax.vmap(lambda _: pm.init_duals(1e3)))(jnp.arange(B))
    lams = tuple(d.lam for d in duals)
    rhos = tuple(d.rho for d in duals)
    reg = jnp.zeros((B,), dtype)
    res = {"batch": B}

    with jax.default_matmul_precision("highest"):
        def fused_once(X, U):
            return jax.vmap(
                lambda Xi, Ui, li, ri, rg: S.expand_backward(
                    pm.cost, pm.dynamics.A, pm.dynamics.B, pm.constraints,
                    Xi, Ui, li, ri, rg),
                in_axes=(0, 0, 0, 0, 0))(X, U, lams, rhos, reg)

        def prod_once(X, U):
            def one(Xi, Ui, li, ri):
                ds = tuple(at.constraints.DualState(lam=l, rho=r)
                           for l, r in zip(li, ri))
                return S._al_expansion_cd(pm.cost, pm.constraints, ds, Xi,
                                          Ui)
            lx, lu, lxx, luu, lux = jax.vmap(one)(X, U, lams, rhos)
            A = jnp.broadcast_to(pm.dynamics.A, (B,) + pm.dynamics.A.shape)
            Bm = jnp.broadcast_to(pm.dynamics.B, (B,) + pm.dynamics.B.shape)
            return jax.vmap(S.backward_pass)(A, Bm, lx, lu, lxx, luu, lux,
                                             reg)

        for name, once in (("fused", fused_once), ("production", prod_once)):
            # A. isolated chained
            def chained(X, U, once=once):
                def body(c, _):
                    K, dff, dV1, dV2 = once(X + 1e-12 * c, U)
                    return jnp.mean(dff), ()
                return jax.lax.scan(body, jnp.zeros((), dtype), None,
                                    length=REPEATS)[0]

            jc = jax.jit(chained)
            t = _time_fn(jc, (Xs, Us), f"{name}: isolated chained x{REPEATS}")
            res[f"{name}_isolated_ms"] = round(t / REPEATS, 4)

            # B. minimal while_loop (2 trips)
            def whiled(X, U, once=once):
                def cond(c):
                    return c[2] < 2

                def body(c):
                    Xc, Uc, it = c
                    K, dff, dV1, dV2 = once(Xc, Uc)
                    Xn = Xc + 1e-9 * jnp.einsum("bkmn,bkm->bkn", K, dff)[
                        :, :1].sum(1, keepdims=True)
                    Un = Uc + 1e-9 * dff
                    return (Xn, Un, it + 1)

                return jax.lax.while_loop(cond, body, (X, U, 0))

            jw = jax.jit(whiled)
            t = _time_fn(jw, (Xs, Us), f"{name}: 2-trip while_loop")
            res[f"{name}_while2_ms"] = round(t / 2, 4)

    # C. the real step at 1 forced iteration, env-toggled
    from altro_tpu.mpc import make_mpc_step
    for envval, name in (("0", "production"), ("1", "fused")):
        os.environ["ALTRO_TPU_FUSED"] = envval
        opts = at.SolverOptions(
            cost_tolerance=0.0, gradient_tolerance=0.0,
            constraint_tolerance=1e-4, penalty_initial=1e3,
            penalty_scaling=100.0, reset_duals=False,
            iterations_linesearch=2, early_exact_tol=0.0,
            iterations_inner=1, iterations_outer=1)
        step, init_carry = make_mpc_step(pm, opts, X_track, U_track,
                                         shared_k=True)
        vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, None)))
        carry = jax.block_until_ready(
            jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
        nz = jnp.asarray(rng.standard_normal((8, B, n)), dtype)
        ks = [jnp.asarray(t_, jnp.int32) for t_ in range(8)]
        carry, out = vstep(carry, nz[0], ks[0])
        jax.block_until_ready(carry)
        walls = []
        for _p in range(3):
            c2 = carry
            t0 = time.perf_counter()
            for t_ in range(8):
                c2, _o = vstep(c2, nz[t_], ks[t_])
            jax.block_until_ready(c2)
            walls.append((time.perf_counter() - t0) / 8 * 1e3)
        med = float(np.median(walls))
        print(f"  real step @1 iter [{name}]                    "
              f"{med:9.3f} ms/step", flush=True)
        res[f"{name}_realstep_ms"] = round(med, 4)
    os.environ.pop("ALTRO_TPU_FUSED", None)

    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=1))
    with open("results_tpu/fused_context.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
