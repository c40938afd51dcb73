"""Experiment: where does the backward-pass boundary time go?

batched_riccati (ops/riccati.py) moves the batch axis minor-most
(moveaxis), stacks (k, k+1) expansion rows (pair), broadcasts the shared
A/B per lane, runs the pallas_call, and moveaxis-es K/d back. Time each
piece at flagship shapes (B=1024, n=12, m=6, N=30, f32) to see whether the
kernel or the XLA-side layout transforms dominate the 0.69 ms isolated /
1.27 ms in-context per-iteration cost.

Run on TPU: env PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_layout.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from altro_tpu.ops import riccati as R
from altro_tpu.solver import altro as S

B, N, n, m = 1024, 30, 12, 6
N1 = N - 1
REPEATS = 200


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
    print(f"  {label:44s} {med:8.3f} ms", flush=True)
    return med


def main():
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    A1 = jnp.asarray(rng.standard_normal((N1, n, n)) * 0.3, f32)
    B1 = jnp.asarray(rng.standard_normal((N1, n, m)) * 0.3, f32)
    lx = jnp.asarray(rng.standard_normal((B, N, n)), f32)
    lu = jnp.asarray(rng.standard_normal((B, N, m)), f32)
    lxxd = jnp.asarray(np.abs(rng.standard_normal((n,))) + 1.0, f32)
    luud = jnp.asarray(np.abs(rng.standard_normal((m,))) + 1.0, f32)
    lxx = jnp.broadcast_to(jnp.diag(lxxd), (B, N, n, n))
    luu = (jnp.broadcast_to(jnp.diag(luud), (B, N, m, m))
           + jnp.asarray(rng.standard_normal((B, N, m, m)) * 0.01, f32))
    lux = jnp.asarray(rng.standard_normal((B, N, m, n)) * 0.01, f32)
    reg = jnp.zeros((B,), f32)
    A_b = jnp.broadcast_to(A1, (B,) + A1.shape)
    B_b = jnp.broadcast_to(B1, (B,) + B1.shape)

    with jax.default_matmul_precision("highest"):
        # v0: the production boundary (attribution's backward_only)
        def v0(eps):
            K, d, dV1, dV2 = jax.vmap(S.backward_pass)(
                A_b, B_b, lx + eps, lu, lxx, luu, lux, reg)
            return jnp.mean(d)

        chain(v0, "v0 full boundary (bcast+moveaxis+pair+kernel)")

        # layout transforms alone (what batched_riccati does XLA-side)
        def lm(x):
            return jnp.moveaxis(x, 0, -1)

        def pair(x):
            return jnp.stack([x[:-1], x[1:]], axis=1)

        def v_layout(eps):
            outs = (lm(A_b), lm(B_b), pair(lm(lx + eps)), pair(lm(lxx)),
                    lm(lu)[:N1], lm(luu)[:N1], lm(lux)[:N1])
            return sum(jnp.mean(o) for o in outs)

        chain(v_layout, "v_layout transforms alone (inputs)")

        # pre-layouted inputs -> pallas_call alone (+ output moveaxis)
        A_l = lm(A_b)
        B_l = lm(B_b)
        lx_p = pair(lm(lx))
        lxx_p = pair(lm(lxx))
        lu_l = lm(lu)[:N1]
        luu_l = lm(luu)[:N1]
        lux_l = lm(lux)[:N1]
        reg2 = reg[None, :]

        idx4 = lambda b, k: (N1 - 1 - k, 0, 0, b)      # noqa: E731
        idx5 = lambda b, k: (N1 - 1 - k, 0, 0, 0, b)   # noqa: E731
        idx3 = lambda b, k: (N1 - 1 - k, 0, b)         # noqa: E731
        blk = min(R.LANE_BLOCK, B)
        nb = B // blk
        kernel = functools.partial(R._kernel, n, m, N1)

        def raw_call(lx_in):
            K, d, dV = pl.pallas_call(
                kernel,
                grid=(nb, N1),
                in_specs=[
                    pl.BlockSpec((1, n, n, blk), idx4,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, n, m, blk), idx4,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 2, n, blk), idx4,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, m, blk), idx3,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 2, n, n, blk), idx5,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, m, m, blk), idx4,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, m, n, blk), idx4,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, blk), lambda b, k: (0, b),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((1, m, n, blk), idx4,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, m, blk), idx3,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, blk), lambda b, k: (0, b),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((N1, m, n, B), f32),
                    jax.ShapeDtypeStruct((N1, m, B), f32),
                    jax.ShapeDtypeStruct((2, B), f32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((n, blk), f32),
                    pltpu.VMEM((n, n, blk), f32),
                    pltpu.VMEM((2, blk), f32),
                ],
            )(A_l, B_l, lx_in, lu_l, lxx_p, luu_l, lux_l, reg2)
            return K, d, dV

        def v_kernel(eps):
            K, d, dV = raw_call(lx_p + eps)
            return jnp.mean(d)

        chain(v_kernel, "v_kernel pallas_call alone (pre-layouted)")

        def v_kernel_out(eps):
            K, d, dV = raw_call(lx_p + eps)
            return jnp.mean(jnp.moveaxis(K, -1, 0)) + jnp.mean(
                jnp.moveaxis(d, -1, 0))

        chain(v_kernel_out, "v_kernel + output moveaxis")

        # how much of v_layout is the broadcast A/B materialization?
        def v_layout_ab(eps):
            return jnp.mean(lm(A_b) + eps) + jnp.mean(lm(B_b))

        chain(v_layout_ab, "  layout: bcast A/B moveaxis only")

        def v_layout_lxx(eps):
            return jnp.mean(pair(lm(lxx + eps)))

        chain(v_layout_lxx, "  layout: lxx pair+moveaxis only")


if __name__ == "__main__":
    main()
