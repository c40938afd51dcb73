"""Round-4 conic throughput sweep: line-search ladder width x step chaining.

results_tpu/conic_attribution.json (tools/exp_conic_attrib.py) showed the
rocket SOC iteration is dominated by the LADDER — rollouts 0.289 ms +
AL-cost evals 0.437 ms of the 0.968 ms iteration at the UNTUNED default
L=10 ladder — plus 3.24 ms/step of dispatch overhead with no chaining.
Both levers are already proven on the flagship (bench.py: L=2 +
BENCH_CHAIN=4 -> 561k). This sweep applies them to the compacted conic
benches:

  - L in {11, 5, 3, 2} rungs (iterations_linesearch + the implicit 0 rung)
  - CHAIN in {1, 2} compacted batch-steps per dispatched program

at the shipped compaction schedules (rocket cap16/b256+L16x128, grasp
cap8/b256+L8x128), B=1024, T=8/CHAIN-aligned. Prints solves/s + iteration
stats per config; the winning config must then re-pass the
bench/agreement_conic.py quality gate before shipping.

Run on TPU: python tools/exp_conic_tune_r4.py [rocket|grasp]
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


def run_family(family: str, B: int = 1024, T: int = 8):
    from altro_tpu.bench.batched_conic import grasp_setup, rocket_setup
    from altro_tpu.mpc import make_mpc_step_device_compacted

    dtype = jnp.float32
    if family == "rocket":
        su = rocket_setup(dtype)
        cap, blk, levels = 16, 256, ((16, 128),)
        noise_dim = 6
    else:
        su = grasp_setup(dtype)
        cap, blk, levels = 8, 256, ((8, 128),)
        noise_dim = 6
    track = (su["X_track"], su["U_track"])

    rng = np.random.default_rng(1)
    noise = jnp.asarray(rng.standard_normal((T, B, noise_dim)), dtype)

    rows = []
    for L in (11, 5, 3, 2):
        opts = su["opts"].replace(iterations_linesearch=L)
        from altro_tpu.mpc import default_noise_model
        step_batch, init_carry = make_mpc_step_device_compacted(
            su["prob_mpc"], opts, su["X_track"], su["U_track"],
            noise_model=su["noise_model"] or default_noise_model,
            constraints_fn=su["constraints_fn"],
            it_cap=cap, block=blk, levels=levels)
        jstep = jax.jit(step_batch)
        carry0 = jax.block_until_ready(
            jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
        ks = [jnp.asarray(t, jnp.int32) for t in range(T)]
        t0 = time.perf_counter()
        c, out = jstep(carry0, noise[0], ks[0])
        jax.block_until_ready(c)
        compile_s = time.perf_counter() - t0

        for CHAIN in (1, 2):
            if CHAIN == 1:
                jrun = jstep
                noise_c = noise[:, None]
                k0s = ks
            else:
                def chain_fn(carry, nz, k0):
                    st, vi, itr = [], [], []
                    for i in range(CHAIN):
                        carry, out = step_batch(carry, nz[i], k0 + i)
                        st.append(out.status)
                        vi.append(out.viol)
                        itr.append(out.iters)
                    return carry, out.replace(
                        iters=jnp.stack(itr), status=jnp.stack(st),
                        viol=jnp.stack(vi))

                jrun = jax.jit(chain_fn)
                noise_c = noise.reshape(T // CHAIN, CHAIN, B, noise_dim)
                k0s = [jnp.asarray(c0 * CHAIN, jnp.int32)
                       for c0 in range(T // CHAIN)]
                c, _ = jrun(carry0, noise_c[0], k0s[0])
                jax.block_until_ready(c)

            walls = []
            for _p in range(3):
                carry = carry0
                stats = []
                t0 = time.perf_counter()
                for t in range(T // CHAIN):
                    carry, out = jrun(carry, noise[t] if CHAIN == 1
                                      else noise_c[t], k0s[t])
                    stats.append((out.status, out.viol, out.iters))
                jax.block_until_ready(carry)
                walls.append(time.perf_counter() - t0)
            dt = float(np.median(walls))
            st = np.concatenate([np.asarray(s[0]).reshape(-1) for s in stats])
            vi = np.concatenate([np.asarray(s[1]).reshape(-1) for s in stats])
            it = np.concatenate([np.asarray(s[2]).reshape(-1) for s in stats])
            row = dict(family=family, L=L, chain=CHAIN,
                       solves_per_s=round(B * T / dt, 1),
                       success=float(st.mean()), max_viol=float(vi.max()),
                       mean_iters=round(float(it.mean()), 2),
                       compile_s=round(compile_s, 1),
                       wall_s=round(dt, 3))
            print(json.dumps(row), flush=True)
            rows.append(row)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results_tpu",
        f"conic_tune_r4_{family}.json")
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    return rows


if __name__ == "__main__":
    fam = sys.argv[1] if len(sys.argv) > 1 else "rocket"
    run_family(fam)
