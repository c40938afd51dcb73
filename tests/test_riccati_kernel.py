"""Parity test: Pallas batched Riccati kernel vs the reference scan backward
pass (interpret mode on CPU; the compiled path is exercised on TPU by
bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.ops.riccati import batched_riccati
from altro_tpu.solver.altro import backward_pass


def _random_inputs(key, Bt, N, n, m, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    A = jax.random.normal(ks[0], (Bt, N - 1, n, n), dtype) * 0.3 \
        + jnp.eye(n, dtype=dtype) * 0.8
    B = jax.random.normal(ks[1], (Bt, N - 1, n, m), dtype) * 0.4

    def spd(k, d, scale):
        M = jax.random.normal(k, (Bt, N, d, d), dtype) * scale
        return jnp.einsum("bkij,bklj->bkil", M, M) + jnp.eye(d, dtype=dtype)

    lxx = spd(ks[2], n, 0.3)
    luu = spd(ks[3], m, 0.3)
    lux = jax.random.normal(ks[4], (Bt, N, m, n), dtype) * 0.1
    lx = jax.random.normal(ks[5], (Bt, N, n), dtype)
    lu = jax.random.normal(ks[6], (Bt, N, m), dtype)
    # zero control rows at the terminal knot (solver convention)
    lu = lu.at[:, -1].set(0.0)
    luu = luu.at[:, -1].set(0.0)
    lux = lux.at[:, -1].set(0.0)
    reg = jnp.zeros((Bt,), dtype)
    return A, B, lx, lu, lxx, luu, lux, reg


@pytest.mark.parametrize("dims", [(4, 12, 3, 2), (2, 8, 5, 3)])
def test_kernel_matches_scan_backward_pass(dims):
    Bt, N, n, m = dims
    inputs = _random_inputs(jax.random.PRNGKey(0), Bt, N, n, m,
                            dtype=jnp.float32)
    K_k, d_k, dV1_k, dV2_k = batched_riccati(*inputs, interpret=True)

    K_r, d_r, dV1_r, dV2_r = jax.vmap(backward_pass)(*inputs)
    np.testing.assert_allclose(K_k, K_r, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(d_k, d_r, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(dV1_k, dV1_r, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(dV2_k, dV2_r, atol=1e-3, rtol=1e-3)
