"""Woofer leg kinematics: FK, analytic IK, Jacobians, force->torque.

Parity with Woofer/QuadrupedDynamics.jl:19-96 (parallel-linkage FK with
gamma/theta parameterization, ``LegJacobian`` via autodiff, ``Force2Torque``
= J^T f per leg). The analytic IK is an addition: our single-rigid-body
simulator needs joint states from foot positions (the reference reads them
from MuJoCo).

Everything vectorizes over legs and batches; angles alpha = (abduction,
alpha2, alpha3) per leg, 12-vectors are leg-major.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import woofer as _w

UPPER = _w.geometry.upper_link_length
LOWER = _w.geometry.lower_link_length
HIP_LAYOUT = jnp.asarray(_w.geometry.hip_layout)
ABDUCTION = jnp.asarray(_w.geometry.abduction_layout)


def _rotx(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack([
        jnp.stack([o, z, z], -1),
        jnp.stack([z, c, -s], -1),
        jnp.stack([z, s, c], -1),
    ], -2)


def forward_kinematics(alpha, leg: int):
    """Body-frame foot position of one leg (QuadrupedDynamics.jl:19-49)."""
    gamma = 0.5 * (alpha[2] - alpha[1]) + 0.5 * jnp.pi
    theta = -0.5 * (alpha[1] + alpha[2])
    d = UPPER * jnp.sin(gamma)
    h1 = UPPER * jnp.cos(gamma)
    h2 = jnp.sqrt(LOWER**2 - d**2)
    L = h1 + h2
    unrotated = jnp.stack([L * jnp.sin(theta), ABDUCTION[leg],
                           -L * jnp.cos(theta)])
    return _rotx(alpha[0]) @ unrotated + HIP_LAYOUT[leg]


def forward_kinematics_all(alpha12):
    """All four feet; alpha12 is the 12-vector of joint angles."""
    return jnp.concatenate([forward_kinematics(alpha12[3 * i:3 * i + 3], i)
                            for i in range(4)])


def leg_jacobian(alpha, leg: int):
    """d foot / d alpha, 3x3 (QuadrupedDynamics.jl:51-53, via jacfwd)."""
    return jax.jacfwd(lambda a: forward_kinematics(a, leg))(alpha)


def force_to_torque(f12, alpha12):
    """tau = J^T f per leg (QuadrupedDynamics.jl:55-60)."""
    taus = []
    for i in range(4):
        J = leg_jacobian(alpha12[3 * i:3 * i + 3], i)
        taus.append(J.T @ f12[3 * i:3 * i + 3])
    return jnp.concatenate(taus)


def inverse_kinematics(foot_pos, leg: int):
    """Joint angles from a body-frame foot position (analytic).

    Inverts forward_kinematics: with hip-relative target r,
      L^2 = ||r||^2 - ab^2,  cos(gamma) = (L^2 + l_u^2 - l_l^2) / (2 L l_u),
      theta from the leg-plane components, alpha1 from the y-z rotation.
    """
    r = foot_pos - HIP_LAYOUT[leg]
    ab = ABDUCTION[leg]
    L2 = jnp.maximum(jnp.sum(r * r) - ab * ab, 1e-10)
    L = jnp.sqrt(L2)
    cg = jnp.clip((L2 + UPPER**2 - LOWER**2) / (2.0 * L * UPPER), -1.0, 1.0)
    gamma = jnp.arccos(cg)

    # alpha1 rotates (0, ab, -L cos th) onto (r_y, r_z) in the y-z plane;
    # the leg-plane z component is -L cos(theta) <= 0.
    rho = jnp.sqrt(jnp.maximum(r[1]**2 + r[2]**2 - ab * ab, 1e-10))
    # theta: r_x = L sin(theta); leg-plane vertical = -rho = -L cos(theta)
    theta = jnp.arctan2(r[0], rho)
    alpha1 = jnp.arctan2(r[2], r[1]) - jnp.arctan2(-rho, ab)
    # wrap to [-pi, pi]
    alpha1 = jnp.arctan2(jnp.sin(alpha1), jnp.cos(alpha1))

    alpha2 = -theta - (gamma - 0.5 * jnp.pi)
    alpha3 = -theta + (gamma - 0.5 * jnp.pi)
    return jnp.stack([alpha1, alpha2, alpha3])


def inverse_kinematics_all(feet12):
    return jnp.concatenate([inverse_kinematics(feet12[3 * i:3 * i + 3], i)
                            for i in range(4)])
