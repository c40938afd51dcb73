"""Swing-leg controller: cubic spline foot trajectories + Cartesian PD.

Parity with Woofer/MPCControl/swing_leg.jl:1-103 and
Structs/SwingLegParams.jl (kp = omega^2, kd = 2 zeta omega).
"""
from __future__ import annotations

import jax.numpy as jnp

from .config import woofer as _w

FOOT_RADIUS = _w.geometry.foot_radius


def _cubic_coeffs_pv(t0, tf, p0, pf, v0, vf):
    """Cubic with position/velocity endpoint constraints (utils-style
    [t^3 t^2 t 1] coefficient solve)."""
    A = jnp.array([
        [t0**3, t0**2, t0, 1.0],
        [tf**3, tf**2, tf, 1.0],
        [3 * t0**2, 2 * t0, 1.0, 0.0],
        [3 * tf**2, 2 * tf, 1.0, 0.0],
    ])
    return jnp.linalg.solve(A, jnp.stack([p0, pf, v0, vf]))


def _cubic_coeffs_z(t0, tf, z0, zf, z_mid, vf):
    """Z spline with mid-swing height constraint (swing_leg.jl:36-48)."""
    tm = 0.5 * (tf + t0)
    A = jnp.array([
        [t0**3, t0**2, t0, 1.0],
        [tf**3, tf**2, tf, 1.0],
        [tm**3, tm**2, tm, 1.0],
        [3 * tf**2, 2 * tf, 1.0, 0.0],
    ])
    return jnp.linalg.solve(A, jnp.stack([z0, zf, z_mid, vf]))


def foot_trajectory_coeffs(x_est, rot, foot_loc_cur_b, foot_vel_b,
                           next_foot_loc, t0, tf, step_height,
                           prev_z_coeffs=None, regen_z: bool = True):
    """[12] spline coefficients (x, y, z cubics) for one swing foot
    (foot_trajectory, swing_leg.jl:1-62). World-frame interpolation from the
    current foot state to the planned placement."""
    foot_loc_cur_n = x_est[0:3] + rot @ foot_loc_cur_b
    foot_vel_n = x_est[6:9] + rot @ foot_vel_b

    # a replan in the last instants of swing would make t0 ~= tf and the
    # Vandermonde-style endpoint system singular (NaN coefficients poison
    # the whole branchless state machine); clamp to a 10 ms minimum spline
    # duration instead — the foot simply lands a hair later
    tf = jnp.maximum(tf, t0 + 0.01)

    cx = _cubic_coeffs_pv(t0, tf, foot_loc_cur_n[0], next_foot_loc[0],
                          foot_vel_n[0], 0.0)
    cy = _cubic_coeffs_pv(t0, tf, foot_loc_cur_n[1], next_foot_loc[1],
                          foot_vel_n[1], 0.0)
    if regen_z or prev_z_coeffs is None:
        cz = _cubic_coeffs_z(t0, tf, foot_loc_cur_n[2],
                             jnp.asarray(FOOT_RADIUS, x_est.dtype),
                             jnp.asarray(step_height, x_est.dtype), 0.0)
    else:
        cz = prev_z_coeffs
    return jnp.concatenate([cx, cy, cz])


def swing_foot_target(coeffs, t):
    """Desired world position and velocity at time t (swing_leg.jl:79-92)."""
    t_p = jnp.stack([t**3, t**2, t, jnp.ones_like(t)])
    t_v = jnp.stack([3 * t**2, 2 * t, jnp.ones_like(t), jnp.zeros_like(t)])
    c = coeffs.reshape(3, 4)
    return c @ t_p, c @ t_v


def swing_pd_force(x_est, rot, coeffs, foot_loc_cur_b, foot_vel_cur_b, t,
                   omega: float = 100.0, zeta: float = 1.0):
    """Cartesian PD force (body frame) around the spline
    (swing_torques, swing_leg.jl:64-103 minus the J^T mapping — the torque
    mapping lives in kinematics.force_to_torque)."""
    kp = omega * omega
    kd = 2.0 * zeta * omega
    r_des_n, v_des_n = swing_foot_target(coeffs, t)
    r_des_b = rot.T @ (r_des_n - x_est[0:3])
    v_des_b = rot.T @ (v_des_n - x_est[6:9])
    return kp * (r_des_b - foot_loc_cur_b) + kd * (v_des_b - foot_vel_cur_b)
