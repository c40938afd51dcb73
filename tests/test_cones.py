"""Cone projection unit tests: closed-form cases + autodiff cross-checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu import cones
from altro_tpu.cones import Cone


def test_soc_projection_cases():
    # inside the cone -> identity
    z = jnp.array([1.0, 0.5, 3.0])
    np.testing.assert_allclose(cones.project_soc(z), z, atol=1e-12)

    # inside the polar (negative) cone -> zero
    z = jnp.array([1.0, 0.5, -3.0])
    np.testing.assert_allclose(cones.project_soc(z), jnp.zeros(3), atol=1e-12)

    # boundary case: projection lands on the cone boundary
    z = jnp.array([3.0, 4.0, 1.0])  # ||v|| = 5 > |s|
    p = cones.project_soc(z)
    v, s = p[:2], p[2]
    np.testing.assert_allclose(jnp.linalg.norm(v), s, rtol=1e-12)
    # projection is the closest point: check against cvx-style known formula
    scale = (5.0 + 1.0) / (2 * 5.0)
    np.testing.assert_allclose(p, jnp.array([3.0 * scale, 4.0 * scale, 5.0 * scale]),
                               rtol=1e-12)


def test_soc_projection_idempotent_and_batched():
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (64, 5))
    p = cones.project_soc(z)
    pp = cones.project_soc(p)
    np.testing.assert_allclose(p, pp, atol=1e-10)
    # membership
    v = p[:, :-1]
    assert bool(jnp.all(jnp.linalg.norm(v, axis=-1) <= p[:, -1] + 1e-9))


def test_soc_jacobian_matches_autodiff():
    key = jax.random.PRNGKey(1)
    zs = jax.random.normal(key, (32, 4)) * 2.0
    J_closed = cones.project_soc_jacobian(zs)
    J_ad = jax.vmap(jax.jacfwd(cones.project_soc))(zs)
    np.testing.assert_allclose(J_closed, J_ad, atol=1e-8)


@pytest.mark.parametrize("cone", [Cone.ZERO, Cone.NONPOS, Cone.SOC])
def test_moreau_decomposition(cone):
    key = jax.random.PRNGKey(2)
    z = jax.random.normal(key, (16, 6))
    pk = cones.project(cone, z)
    pp = cones.project_polar(cone, z)
    np.testing.assert_allclose(pk + pp, z, atol=1e-10)
    # orthogonality of the parts
    np.testing.assert_allclose(jnp.sum(pk * pp, axis=-1), jnp.zeros(16), atol=1e-9)


@pytest.mark.parametrize("cone", [Cone.NONPOS, Cone.SOC])
def test_polar_jacobian_matches_autodiff(cone):
    key = jax.random.PRNGKey(3)
    zs = jax.random.normal(key, (32, 4)) * 1.5
    J_closed = cones.project_polar_jacobian(cone, zs)
    J_ad = jax.vmap(jax.jacfwd(lambda z: cones.project_polar(cone, z)))(zs)
    np.testing.assert_allclose(J_closed, J_ad, atol=1e-8)


def test_violation_semantics():
    # feasible points have zero violation
    assert float(jnp.max(jnp.abs(cones.violation(Cone.NONPOS, jnp.array([-1.0, -2.0]))))) == 0.0
    assert float(jnp.max(jnp.abs(cones.violation(Cone.SOC, jnp.array([1.0, 0.0, 2.0]))))) == 0.0
    # infeasible equality: violation is the residual itself
    c = jnp.array([0.3, -0.2])
    np.testing.assert_allclose(cones.violation(Cone.ZERO, c), c, atol=1e-12)
