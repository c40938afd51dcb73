"""Single-rigid-body dynamics for the quadruped MPC.

Parity with Woofer/MPCControl/linearized_dynamics.jl:1-96:

- state x = [p(3), mrp(3), v(3), omega_body(3)], control u = 4 world-frame
  contact forces (12)
- nonlinear continuous dynamics: MRP attitude kinematics, force sum over
  feet in contact, body-frame torque sum, J^-1 (-omega x J omega + tau)
- A/B Jacobians via jax.jacfwd (reference: ForwardDiff), affine residual
  d = f(xbar, ubar) - A xbar - B ubar, Euler discretization
  A_d = I + A_c dt (altro_solver.jl:35-37)

Also the RK4 plant integrator that replaces MuJoCo in the closed loop
(SURVEY.md section 2.7: contact-accurate sim is not required for the
published numbers — the controller's own nonlinear SRB serves as the plant).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..grasp import _skew_batch  # batched skew helper
from ...dynamics import LTVDynamics
from .config import woofer as _w

SPRUNG_MASS = _w.inertial.sprung_mass
J_BODY = jnp.asarray(_w.inertial.body_inertia)
J_INV = jnp.asarray(__import__("numpy").linalg.inv(_w.inertial.body_inertia))
GRAVITY = 9.81


def skew(a):
    return jnp.array([[0.0, -a[2], a[1]],
                      [a[2], 0.0, -a[0]],
                      [-a[1], a[0], 0.0]], a.dtype)


def mrp_rotation(phi):
    """Body->world rotation matrix of an MRP (Rotations.jl MRP convention)."""
    n2 = jnp.sum(phi * phi)
    S = skew(phi)
    denom = (1.0 + n2) ** 2
    return jnp.eye(3, dtype=phi.dtype) \
        + (4.0 * (1.0 - n2) / denom) * S + (8.0 / denom) * (S @ S)


def mrp_kinematics(phi, omega):
    """phidot = 0.25 ((1 - phi'phi) I + 2 skew(phi) + 2 phi phi') omega."""
    n2 = jnp.sum(phi * phi)
    M = (1.0 - n2) * jnp.eye(3, dtype=phi.dtype) + 2.0 * skew(phi) \
        + 2.0 * jnp.outer(phi, phi)
    return 0.25 * M @ omega


def mrp_from_quat(q):
    """Quaternion (w,x,y,z) -> MRP (mujoco_test.jl:72-85 extraction path)."""
    w = q[0]
    sign = jnp.where(w < 0, -1.0, 1.0)  # take the shorter rotation
    q = q * sign
    return q[1:] / (1.0 + q[0])


def continuous_dynamics(x, u, foot_locs, contacts,
                        mass_scale=1.0, inertia_scale=1.0):
    """Nonlinear SRB xdot (linearized_dynamics.jl:1-36).

    foot_locs: [4, 3] world-frame foot positions; contacts: [4] {0,1}.
    ``mass_scale``/``inertia_scale`` perturb the true plant away from the
    controller's nominal model (the model-mismatch role MuJoCo's contact
    physics plays in mujoco_test.jl:20-89); the MPC always linearizes the
    nominal (scale = 1) model.
    """
    p = x[0:3]
    phi = x[3:6]
    v = x[6:9]
    omega = x[9:12]
    rot = mrp_rotation(phi)

    pd = v
    phid = mrp_kinematics(phi, omega)

    F = u.reshape(4, 3) * contacts[:, None]
    force_sum = jnp.array([0.0, 0.0, -GRAVITY], x.dtype) \
        + jnp.sum(F, axis=0) / (SPRUNG_MASS * mass_scale)

    r_b = jnp.einsum("ji,kj->ki", rot, foot_locs - p)   # rot' * (r - p)
    F_b = jnp.einsum("ji,kj->ki", rot, F)               # rot' * F
    torque_sum = jnp.sum(jnp.einsum("kij,kj->ki", _skew_batch(r_b), F_b), axis=0)

    omegad = (J_INV / inertia_scale) @ (
        -skew(omega) @ ((J_BODY * inertia_scale) @ omega) + torque_sum)
    return jnp.concatenate([pd, phid, force_sum, omegad])


def linearize_horizon(x_ref, u_ref, foot_locs, contacts, dt) -> LTVDynamics:
    """Per-knot (A, B, d) stacks, Euler-discretized
    (update_dynamics_matrices!, altro_solver.jl:5-42).

    x_ref: [N, 12], u_ref: [N, 12], foot_locs: [N, 4, 3], contacts: [N, 4].
    Returns an N-knot LTVDynamics (stacks of length N-1).
    """
    def one(x, u, r, c):
        A_c = jax.jacfwd(lambda xx: continuous_dynamics(xx, u, r, c))(x)
        B_c = jax.jacfwd(lambda uu: continuous_dynamics(x, uu, r, c))(u)
        d_c = continuous_dynamics(x, u, r, c) - A_c @ x - B_c @ u
        n = x.shape[0]
        return (jnp.eye(n, dtype=x.dtype) + A_c * dt, B_c * dt, d_c * dt)

    A, B, d = jax.vmap(one)(x_ref[:-1], u_ref[:-1], foot_locs[:-1],
                            contacts[:-1])
    return LTVDynamics(A=A, B=B, d=d)


def rk4_plant(x, u, foot_locs, contacts, dt,
              mass_scale=1.0, inertia_scale=1.0):
    """RK4 integration of the nonlinear SRB — the MuJoCo stand-in plant.
    ``mass_scale``/``inertia_scale`` != 1 give the true plant different
    parameters from the controller's nominal model (model-mismatch
    validation, the role of MuJoCo's independent physics in
    mujoco_test.jl:20-89)."""
    f = lambda xx: continuous_dynamics(xx, u, foot_locs, contacts,
                                       mass_scale, inertia_scale)
    k1 = f(x)
    k2 = f(x + 0.5 * dt * k1)
    k3 = f(x + 0.5 * dt * k2)
    k4 = f(x + dt * k3)
    return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
