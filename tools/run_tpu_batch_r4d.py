"""Fourth round-4 TPU batch: the fused-SOC expansion kernel on hardware.

SUPERSEDED (round 5): stage 1's dU check was a sanity bound only — it
could not catch a fused-kernel bug that moves solutions to different
feasible points. The standing gate is now bench/fused_check.py, which
scores fused and unfused solutions of identical instances under the f64
TRUE cost per lane (all 1024 lanes, rocket AND grasp) and fails on
regression. Kept for round-4 provenance.

1. validate: one rocket warm step at B=1024 with the fused SOC kernel vs
   ALTRO_TPU_FUSED=0 — controls must agree to f32 kernel-arithmetic level
   and the step must get FASTER (results_tpu/fused_soc_check.json). Runs
   FIRST so a Mosaic-compile problem surfaces before the big stages.
2. batched_conic rocket+grasp rows with the fused default.
3. agreement_conic re-gate (phase2 in its scrubbed-CPU subprocess).

Run on TPU: python tools/run_tpu_batch_r4d.py
"""
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def run_soc_check():
    import jax
    import jax.numpy as jnp

    from altro_tpu.bench.batched_conic import rocket_setup
    from altro_tpu.mpc import make_mpc_step

    B, T = 1024, 6
    dtype = jnp.float32
    su = rocket_setup(dtype)
    rng = np.random.default_rng(1)
    noise = jnp.asarray(rng.standard_normal((T, B, 6)), dtype)
    ks = [jnp.asarray(t, jnp.int32) for t in range(T)]
    res = {}
    outs = {}
    for envval, label in (("auto", "fused"), ("0", "unfused")):
        os.environ["ALTRO_TPU_FUSED"] = envval
        step, init_carry = make_mpc_step(
            su["prob_mpc"], su["opts"], su["X_track"], su["U_track"],
            noise_model=su["noise_model"], shared_k=True)
        vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, None)))
        carry = jax.block_until_ready(
            jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
        t0 = time.perf_counter()
        c, out = vstep(carry, noise[0], ks[0])
        jax.block_until_ready(c)
        compile_s = time.perf_counter() - t0
        walls = []
        for _p in range(3):
            c = carry
            t0 = time.perf_counter()
            for t in range(T):
                c, out = vstep(c, noise[t], ks[t])
            jax.block_until_ready(c)
            walls.append((time.perf_counter() - t0) / T * 1e3)
        outs[label] = (np.asarray(out.U), np.asarray(out.status),
                       np.asarray(out.viol))
        res[label] = dict(step_ms=round(float(np.median(walls)), 3),
                          compile_s=round(compile_s, 1),
                          success=float(outs[label][1].mean()),
                          max_viol=float(outs[label][2].max()))
        print(f"{label}: {res[label]}", flush=True)
    os.environ.pop("ALTRO_TPU_FUSED", None)
    dU = float(np.max(np.abs(outs["fused"][0] - outs["unfused"][0])))
    res["max_dU_fused_vs_unfused"] = dU
    print(f"max dU fused vs unfused after {T} warm steps: {dU:.3e}",
          flush=True)
    with open(os.path.join(REPO, "results_tpu", "fused_soc_check.json"),
              "w") as f:
        json.dump(res, f, indent=1)
    # f32 kernel-arithmetic reordering can flip line-search decisions on
    # knife-edge lanes over a 6-step warm chain, so dU is a sanity bound,
    # not bitwise; the REAL quality gate is stage 3's agreement_conic.
    assert res["fused"]["success"] == 1.0
    assert res["fused"]["max_viol"] <= 2e-4


def run_batched_conic():
    from altro_tpu.bench import batched_conic
    argv = sys.argv
    sys.argv = ["batched_conic"]
    try:
        batched_conic.main()
    finally:
        sys.argv = argv


def run_agreement():
    from altro_tpu.bench import agreement_conic
    argv = sys.argv
    sys.argv = ["agreement_conic"]
    try:
        agreement_conic.main()
    finally:
        sys.argv = argv


for name, fn in (("soc_check", run_soc_check),
                 ("batched_conic", run_batched_conic),
                 ("agreement_conic", run_agreement)):
    print(f"==== {name}", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print(f"==== {name} FAILED (continuing)", flush=True)
print("==== batch done", flush=True)
