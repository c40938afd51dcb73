"""Footstep planner: Raibert-style body-velocity heuristic + horizon
contact/foot-location history for the MPC.

Parity with Woofer/MPCControl/footsteps.jl:1-84. Note the reference's yaw
term (`beta*RotZ(...)*cur_foot_loc`) is a standalone discarded expression
(footsteps.jl:24) — dead code — so the effective heuristic is
nominal + alpha * t_next * v; reproduced as such.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import woofer as _w
from .gait import Gait
from . import kinematics
from .srb import mrp_rotation

FOOT_RADIUS = _w.geometry.foot_radius

# Computed eagerly at import: a lazy cache would capture a tracer if first
# touched inside a jit trace and leak it into later traces.
NOM_FOOT_LOC = kinematics.forward_kinematics_all(jnp.zeros(12)).reshape(4, 3)


def nominal_foot_locations():
    """Body-frame foot locations at zero joint angles
    (ControllerParams.jl:97-105, foot_dx = foot_dy = 0)."""
    return NOM_FOOT_LOC


def footstep_location(x_est, rot, cur_phase, leg, gait: Gait, x_des):
    """Next world-frame placement for `leg` (footsteps.jl:1-27)."""
    v_n = x_est[6:9]
    p = x_est[0:3]
    next_phase = gait.next_phase(cur_phase)
    t_next = gait.phase_times[next_phase]

    nom_n = p + rot @ nominal_foot_locations()[leg]
    next_loc = nom_n + gait.alpha * t_next * v_n
    return jnp.concatenate([next_loc[:2],
                            jnp.asarray([FOOT_RADIUS], x_est.dtype)])


def foot_history(t, x_ref, feet_w, planner_foot_loc, gait: Gait,
                 x_des, N: int, dt_mpc):
    """Horizon contact schedule + world foot locations for the MPC
    (foot_history!, footsteps.jl:29-84).

    x_ref: [N, 12] reference states; feet_w: [4, 3] current WORLD-frame feet.
    Returns (contacts [N, 4], foot_locs [N, 4, 3], planner_foot_loc [4, 3]).

    Deviation from the reference: footsteps.jl:43-44 reconstructs the current
    world feet from body-frame feet using x_ref[1] (= x_des, the upright
    desired pose), which injects a moment-arm error of first order in the
    body's pose error — under MuJoCo's compliant stance legs that error is
    filtered, but against a rigid pinned-feet SRB plant it destabilizes the
    trot's roll mode after any lateral disturbance. Here the true world feet
    are passed straight through (the controller knows them exactly);
    future-knot placements still come from the x_ref pose as in the
    reference."""
    prev_locs = feet_w

    prev_phase = gait.phase_at(t)
    contacts0 = gait.contact_phases[prev_phase]

    def step(carry, i):
        prev_locs, planner_loc, prev_phase = carry
        t_i = t + i.astype(x_ref.dtype) * dt_mpc
        next_phase = gait.phase_at(t_i)
        contacts_i = gait.contact_phases[next_phase]
        x_i = x_ref[jnp.minimum(i, N - 1)]
        rot = mrp_rotation(x_i[3:6])

        prev_c = gait.contact_phases[prev_phase]
        planned = jax.vmap(
            lambda leg: footstep_location(x_i, rot, next_phase, leg, gait,
                                          x_des))(jnp.arange(4))
        # plan before release: stance -> swing
        to_plan = (prev_c == 1) & (contacts_i == 0)
        planner_loc = jnp.where(to_plan[:, None], planned, planner_loc)
        # touch down: swing -> stance picks up the planned location
        touch = (prev_c == 0) & (contacts_i == 1)
        prev_locs = jnp.where(touch[:, None], planner_loc, prev_locs)
        return (prev_locs, planner_loc, next_phase), (contacts_i, prev_locs)

    (_, planner_out, _), (contacts, locs) = jax.lax.scan(
        step, (prev_locs, planner_foot_loc, prev_phase),
        jnp.arange(1, N))
    contacts = jnp.concatenate([contacts0[None], contacts], axis=0)
    locs = jnp.concatenate([prev_locs[None], locs], axis=0)
    return contacts, locs, planner_out
