"""Round-5 A/B: the fused ladder+AL-merit line search on hardware.

Runs the flagship (random-linear N=30), rocket, and grasp warm MPC steps
at B=1024 with ALTRO_TPU_LSFUSED=0 (classical: rollout kernel + XLA
per-rung AL-cost evaluation) vs =1 (merit computed in-kernel + single
post-selection residual pass), same carries, pipelined, median of 3.

Run on TPU: python tools/exp_r5_lsfused_ab.py
Writes results_tpu/lsfused_ab.json. Exit code 1 if the fused path fails
to compile or loses on every family (the batch runner then pins
ALTRO_TPU_LSFUSED=0 for the rest of the session).
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


def flagship_setup():
    import altro_tpu as at
    from altro_tpu.models import random_linear as rl
    from altro_tpu.mpc import gen_tracking_mpc

    T, N_mpc, n, m = 24, 30, 12, 6
    rng = np.random.default_rng(1)
    prob = rl.gen_random_linear(rng, n, m, N_mpc + T + 2, dtype=jnp.float32)
    X_track, U_track = rl.gen_trajectory(rng, prob, N_mpc + T + 2)
    prob_mpc = gen_tracking_mpc(prob, X_track, U_track, N_mpc)
    opts = at.SolverOptions(
        cost_tolerance=1e-4, gradient_tolerance=1e-4,
        constraint_tolerance=1e-4, penalty_initial=1e3,
        penalty_scaling=100.0, reset_duals=False,
        iterations_linesearch=2, early_exact_tol=1e-3)
    return dict(prob_mpc=prob_mpc, opts=opts, X_track=X_track,
                U_track=U_track, constraints_fn=None, noise_model=None,
                noise_dim=n), T


def run_family(name, su, T, B=1024):
    from altro_tpu.mpc import make_mpc_step

    kw = {}
    if su.get("noise_model") is not None:
        kw["noise_model"] = su["noise_model"]
    if su.get("constraints_fn") is not None:
        kw["constraints_fn"] = su["constraints_fn"]
    step, init_carry = make_mpc_step(
        su["prob_mpc"], su["opts"], su["X_track"], su["U_track"],
        shared_k=True, **kw)
    rng = np.random.default_rng(1)
    noise = jnp.asarray(rng.standard_normal((T, B, su["noise_dim"])),
                        jnp.float32)
    ks = [jnp.asarray(t, jnp.int32) for t in range(T)]
    carry0 = jax.block_until_ready(
        jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
    rows = {}
    for envval, label in (("0", "classical"), ("1", "lsfused")):
        os.environ["ALTRO_TPU_LSFUSED"] = envval
        vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, None)))
        t0 = time.perf_counter()
        c, out = vstep(carry0, noise[0], ks[0])
        jax.block_until_ready(c)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            c = carry0
            t0 = time.perf_counter()
            for t in range(T):
                c, out = vstep(c, noise[t], ks[t])
            jax.block_until_ready(c)
            walls.append((time.perf_counter() - t0) / T * 1e3)
        rows[label] = dict(
            step_ms=round(float(np.median(walls)), 3),
            compile_s=round(compile_s, 1),
            success=float(jnp.mean(out.status.astype(jnp.float32))),
            max_viol=float(jnp.max(out.viol)),
            mean_iters=float(jnp.mean(out.iters.astype(jnp.float32))))
        print(f"  {name}/{label}: {rows[label]}", flush=True)
    os.environ.pop("ALTRO_TPU_LSFUSED", None)
    rows["speedup"] = round(
        rows["classical"]["step_ms"] / rows["lsfused"]["step_ms"], 3)
    return rows


def main():
    from altro_tpu.bench.batched_conic import grasp_setup, rocket_setup

    res = {}
    ok_any = False
    fs, T_f = flagship_setup()
    for name, su, T in (("flagship", fs, T_f),
                        ("rocket", rocket_setup(jnp.float32), 10),
                        ("grasp", grasp_setup(jnp.float32), 8)):
        try:
            res[name] = run_family(name, su, T)
            ok_any = ok_any or (res[name]["lsfused"]["success"] == 1.0)
        except Exception as e:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            res[name] = dict(error=str(e)[:500])
    res["device"] = str(jax.devices()[0])
    os.makedirs("results_tpu", exist_ok=True)
    with open("results_tpu/lsfused_ab.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)
    if not ok_any:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
