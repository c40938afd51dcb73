"""Round-5 probe: attribute the compacted conic step's per-step overhead.

results_tpu/conic_attribution.json (r4) measured 3.23 ms/step of
non-iteration cost on the rocket compacted step vs the flagship's 1.35 ms
dispatch floor, with no component breakdown. This probe times the step's
phases as separate jitted programs on the SAME warm carry (the
exp_step_overhead.py methodology — chained-jit segment timings are robust
to host load):

  plain_step        the uncompacted vmapped step (reference point)
  full_step         the shipped compacted step (cap/block/levels)
  partial_only      vmap(partial) @ it_cap + extract, NO compaction
  wrapper_only      propagate + retarget + shifts + xws, solve skipped
  cap0              wrapper + solve_partial(it_cap=0) + extract (solver
                    entry/exit + finalize, zero loop bodies)
  gather_scatter    argsort + gather + scatter on saved states (the
                    compaction data movement, no resumes)
  catchall_done     vmap(resume) on fully-CONVERGED states (one while-cond
                    evaluation across the batch — the "free" catch-all)
  resume_block      vmap(resume) on the real straggler block states
  extract_only      vmap(extract) on converged states

  compaction_total = full_step - partial_only
  solver_entry     = cap0 - wrapper_only

Run on TPU: python tools/exp_r5_conic_overhead.py [--family rocket]
Writes results_tpu/conic_overhead_r5.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

REPEATS = 30


def pipeline_time(fn, args_t, label, samples=3):
    """fn(t) -> output pytree; pipelined REPEATS dispatches, median of
    ``samples`` passes, ms per call."""
    out = fn(0)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    walls = []
    for _ in range(samples):
        t0 = time.perf_counter()
        for t in range(REPEATS):
            out = fn(t)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        walls.append((time.perf_counter() - t0) / REPEATS * 1e3)
    med = float(np.median(walls))
    print(f"  {label:34s} {med:8.3f} ms", flush=True)
    return med


def main(family="rocket", B=1024):
    from altro_tpu.bench.batched_conic import grasp_setup, rocket_setup
    from altro_tpu.mpc import (make_mpc_step, make_mpc_step_compacted,
                               make_mpc_step_device_compacted)

    dtype = jnp.float32
    setup = dict(rocket=rocket_setup, grasp=grasp_setup)[family]
    su = setup(dtype)
    kw = {}
    if su["noise_model"] is not None:
        kw["noise_model"] = su["noise_model"]
    if su["constraints_fn"] is not None:
        kw["constraints_fn"] = su["constraints_fn"]
    cap, block, levels = dict(rocket=(16, 256, ((16, 128),)),
                              grasp=(8, 256, ((8, 128),)))[family]

    step, init_carry = make_mpc_step(
        su["prob_mpc"], su["opts"], su["X_track"], su["U_track"],
        shared_k=True, **kw)
    step_batch, _ = make_mpc_step_device_compacted(
        su["prob_mpc"], su["opts"], su["X_track"], su["U_track"],
        it_cap=cap, block=block, levels=levels, **kw)
    partial, resume, extract, _ = make_mpc_step_compacted(
        su["prob_mpc"], su["opts"], su["X_track"], su["U_track"],
        it_cap=cap, **kw)

    rng = np.random.default_rng(1)
    nd = su["noise_dim"]
    noise = jnp.asarray(rng.standard_normal((REPEATS + 4, B, nd)), dtype)
    vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, None)))
    carry = jax.block_until_ready(
        jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
    K0 = jnp.asarray(3, jnp.int32)
    for t in range(3):  # warm the chain to a realistic MPC state
        carry, _ = vstep(carry, noise[REPEATS + t], jnp.asarray(t, jnp.int32))
    carry = jax.block_until_ready(carry)

    res = dict(family=family, batch=B, it_cap=cap, block=block,
               levels=list(map(list, levels)))

    # ---- phase programs ----
    jfull = jax.jit(step_batch)
    jplain = vstep
    jpartial = jax.jit(jax.vmap(partial, in_axes=(0, 0, None)))
    jextract = jax.jit(jax.vmap(extract, in_axes=(0, 0, None)))
    jresume_full = jax.jit(jax.vmap(resume, in_axes=(0, None)))

    # saved states for the isolated phases
    states_cap, x0n = jax.block_until_ready(
        jpartial(carry, noise[0], K0))
    done = np.asarray(states_cap[10])
    carry_done, _ = jax.block_until_ready(jfull(carry, noise[0], K0))
    states_done = jax.block_until_ready(
        jresume_full(states_cap, K0))  # fully converged states
    take = jnp.argsort(jnp.asarray(done.astype(np.int32)), stable=True)[:block]
    states_blk = jax.tree_util.tree_map(lambda a: a[take], states_cap)
    res["stragglers_at_cap"] = int((~done).sum())

    def gather_scatter(states):
        d = states[10]
        tk = jnp.argsort(d.astype(jnp.int32), stable=True)[:block]
        sub = jax.tree_util.tree_map(lambda a: a[tk], states)
        return jax.tree_util.tree_map(
            lambda a, b: a.at[tk].set(b), states, sub)

    jgs = jax.jit(gather_scatter)
    jresume_blk = jax.jit(jax.vmap(resume, in_axes=(0, None)))

    res["plain_step"] = pipeline_time(
        lambda t: jplain(carry, noise[t], K0), None, "plain vmapped step")
    res["full_step"] = pipeline_time(
        lambda t: jfull(carry, noise[t], K0), None, "compacted step (shipped)")
    res["partial_only"] = pipeline_time(
        lambda t: jextract(jpartial(carry, noise[t], K0)[0],
                           x0n, K0), None, "partial@cap + extract")
    res["gather_scatter"] = pipeline_time(
        lambda t: jgs(states_cap), None, "argsort+gather+scatter only")
    res["catchall_done"] = pipeline_time(
        lambda t: jresume_full(states_done, K0), None,
        "catch-all resume on converged batch")
    res["resume_block"] = pipeline_time(
        lambda t: jresume_blk(states_blk, K0), None,
        f"straggler block resume ({block})")
    res["extract_only"] = pipeline_time(
        lambda t: jextract(states_done, x0n, K0), None, "extract only")

    # wrapper / solver-entry probes
    from altro_tpu import costs as C
    from altro_tpu.mpc import _xws_corrector, shift_fill, track_window
    from altro_tpu.solver import altro as S

    prob_mpc = su["prob_mpc"]
    dyn = prob_mpc.dynamics
    xws = _xws_corrector(dyn)
    nm = su["noise_model"] or (lambda xp, nz:
                               xp + nz * jnp.max(jnp.abs(xp)) / 100.0)
    cfn = su["constraints_fn"]

    with jax.default_matmul_precision("highest"):
        def wrapper_step(carry1, noise_i):
            x0, X, U, duals = carry1
            x0_new = nm(dyn.step(x0, U[0], 0), noise_i)
            Xw, Uw = track_window(su["X_track"], su["U_track"], K0 + 1,
                                  prob_mpc.N)
            cost_new = C.retarget_tracking(prob_mpc.cost, Xw, Uw)
            U_ws = shift_fill(U)
            duals_ws = tuple(d.shift() for d in duals)
            X_ws = X if xws is None else xws(X, U_ws, x0_new)
            X_ws = X_ws + 0.0 * jnp.sum(cost_new.q[0])
            if cfn is not None:
                X_ws = X_ws + 0.0 * jnp.sum(cfn(K0 + 1)[0].b[0])
            return (x0_new, X_ws, U_ws, duals_ws), x0_new

        jwrap = jax.jit(jax.vmap(wrapper_step))
        res["wrapper_only"] = pipeline_time(
            lambda t: jwrap(carry, noise[t]), None, "wrapper only (no solve)")

        partial0, _, extract0, _ = make_mpc_step_compacted(
            su["prob_mpc"], su["opts"], su["X_track"], su["U_track"],
            it_cap=0, **kw)
        jcap0 = jax.jit(jax.vmap(
            lambda c, nz: extract0(*partial0(c, nz, K0), K0),
            in_axes=(0, 0)))
        res["cap0"] = pipeline_time(
            lambda t: jcap0(carry, noise[t]), None,
            "wrapper + solve@cap0 + extract")

    res["compaction_total"] = round(res["full_step"] - res["partial_only"], 4)
    res["solver_entry"] = round(res["cap0"] - res["wrapper_only"], 4)
    res["device"] = str(jax.devices()[0])
    os.makedirs("results_tpu", exist_ok=True)
    with open("results_tpu/conic_overhead_r5.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="rocket",
                   choices=["rocket", "grasp"])
    p.add_argument("--batch", type=int, default=1024)
    a = p.parse_args()
    main(a.family, a.batch)
