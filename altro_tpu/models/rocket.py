"""Rocket soft-landing benchmark (benchmark 2, SOC-constrained).

Parity with benchmarks/rocket_landing/rocket_landing_problem.jl:17-190 and
the driver config at run_simple_rocket.jl:31-102:

- linear rocket model with planet rotation, exact ZOH discretization
  (``RD.Exponential``)
- three SOC families: max thrust ||u|| <= m|g|k, thrust angle
  ||[ux,uy]|| <= tan(theta) uz, glideslope ||[x,y]|| <= tan(theta_gs) z
  active from knot ``glide_recover_k``
- hover warm start U0 = -m g
- pos/vel-split MPC process noise (simple_rocket.jl:59-82)
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constraints import (goal_constraint, norm_constraint, norm_constraint2,
                           quad_norm_constraint)
from ..costs import lqr_objective
from ..dynamics import lti_dynamics, zoh_discretize
from ..problem import Problem


def skew(w):
    w = jnp.asarray(w)
    return jnp.array([
        [0.0, -w[2], w[1]],
        [w[2], 0.0, -w[0]],
        [-w[1], w[0], 0.0],
    ], w.dtype)


def rocket_dynamics(mass, gravity, dt, omega_planet=(0.0, 0.0, 0.0),
                    dtype=jnp.float64):
    """Continuous A = [[0, I], [-skew(w)^2, -2 skew(w)]], B = [[0],[I/m]],
    d = [0; g], discretized by matrix exponential (ZOH)
    (rocket_landing_problem.jl:17-40)."""
    w = jnp.asarray(omega_planet, dtype)
    g = jnp.asarray(gravity, dtype)
    S = skew(w)
    Z3, I3 = jnp.zeros((3, 3), dtype), jnp.eye(3, dtype=dtype)
    A = jnp.block([[Z3, I3], [-S @ S, -2.0 * S]])
    B = jnp.concatenate([Z3, I3 / mass], axis=0)
    d = jnp.concatenate([jnp.zeros(3, dtype), g])
    return zoh_discretize(A, B, dt, d)


def rocket_problem(N: int = 301, tf: float = 15.0, *,
                   x0=(4.0, 2.0, 20.0, -3.0, 2.0, -5.0),
                   Qk: float = 1e-2, Qfk: float = 1e4, Rk: float = 1.0,
                   gravity=(0.0, 0.0, -9.81), mass: float = 10.0,
                   omega_planet=(0.0, 0.0, 0.0), per_weight_max: float = 2.0,
                   theta_thrust_max: float = 5.0, theta_glideslope: float = 45.0,
                   glide_recover_k: int = 8, include_goal: bool = True,
                   include_thrust_angle: bool = True,
                   include_glideslope: bool = True,
                   conic: bool = True,
                   dtype=jnp.float64) -> Problem:
    """n=6, m=3 soft-landing problem (rocket_landing_problem.jl:44-190;
    driver values run_simple_rocket.jl:31-63: N=301, dt=0.05, theta=5 deg,
    glide=45 deg, Qfk=1e4, Rk=1)."""
    n, m = 6, 3
    dt = tf / (N - 1)
    x0 = jnp.asarray(x0, dtype)
    xf = jnp.zeros(n, dtype)
    g = jnp.asarray(gravity, dtype)

    Ad, Bd, dd = rocket_dynamics(mass, g, dt, omega_planet, dtype)
    dyn = lti_dynamics(Ad, Bd, N, dd)

    Q = jnp.eye(n, dtype=dtype) * Qk
    R = jnp.eye(m, dtype=dtype) * Rk
    Qf = jnp.eye(n, dtype=dtype) * Qfk
    cost = lqr_objective(Q, R, Qf, xf, N, dt=dt)

    cons = []
    if include_goal:
        cons.append(goal_constraint(N, n, m, xf, dtype=dtype))

    # ``conic`` switches SOC constraints to their nonconvex quadratic
    # counterparts (the reference's ``contype`` Inequality comparison,
    # rocket_landing_problem.jl:61; run_simple_rocket.jl:72-102).
    u_bnd = mass * abs(float(g[2])) * per_weight_max
    if conic:
        cons.append(norm_constraint(N, n, m, u_bnd, on="control", dtype=dtype))
    else:
        cons.append(quad_norm_constraint(N, n, m, jnp.eye(3, dtype=dtype),
                                         offset=u_bnd, on="control",
                                         dtype=dtype))

    if include_thrust_angle:
        alpha = jnp.tan(jnp.deg2rad(jnp.asarray(theta_thrust_max, dtype)))
        A_ang = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 0]], dtype)
        c_ang = jnp.array([0.0, 0.0, 1.0], dtype) * alpha
        if conic:
            cons.append(norm_constraint2(N, n, m, A_ang, c_ang, on="control",
                                         dtype=dtype))
        else:
            cons.append(quad_norm_constraint(N, n, m, A_ang, c=c_ang,
                                             on="control", dtype=dtype))

    if include_glideslope:
        alpha_g = jnp.tan(jnp.deg2rad(jnp.asarray(theta_glideslope, dtype)))
        A_gs = jnp.zeros((6, 6), dtype).at[0, 0].set(1.0).at[1, 1].set(1.0)
        c_gs = jnp.zeros(6, dtype).at[2].set(alpha_g)
        # active from knot glide_recover_k (1-indexed in the reference) to N-1
        if conic:
            cons.append(norm_constraint2(N, n, m, A_gs, c_gs, on="state",
                                         start=glide_recover_k - 1,
                                         dtype=dtype))
        else:
            cons.append(quad_norm_constraint(N, n, m, A_gs, c=c_gs,
                                             on="state",
                                             start=glide_recover_k - 1,
                                             dtype=dtype))

    return Problem(dynamics=dyn, cost=cost, constraints=tuple(cons), x0=x0)


def hover_controls(prob: Problem, mass: float = 10.0,
                   gravity=(0.0, 0.0, -9.81)):
    """Hover warm start U0 = -m g (rocket_landing_problem.jl:181-183)."""
    g = jnp.asarray(gravity, prob.x0.dtype)
    return jnp.tile(-mass * g, (prob.N - 1, 1))


def rocket_noise_model(wp: float = 1e-3, wv: float = 1e-2):
    """Split position/velocity noise: pos scaled by ||pos||*wp, vel by
    ||vel||*wv (simple_rocket.jl:59-71)."""
    def model(x_prop, noise_i):
        pos_mag = jnp.linalg.norm(x_prop[:3])
        vel_mag = jnp.linalg.norm(x_prop[3:])
        noise = jnp.concatenate([noise_i[:3] * pos_mag * wp,
                                 noise_i[3:] * vel_mag * wv])
        return x_prop + noise

    return model
