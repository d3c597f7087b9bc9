"""sixDoFRigidBodyMotion — rigid body dynamics for FSI/floating-body
motion.

Rebuild of reference: src/sixDoFRigidBodyMotion/ (sixDoFRigidBodyMotion
state: centreOfRotation, orientation Q, velocity v, angular momentum
pi in body frame; Newmark/Crank-Nicolson integration; restraints
linearSpring/linearDamper/sphericalAngularDamper; constraints omitted
here). The motion state is a jnp pytree and `update` is pure/jittable,
so it composes with a jitted flow step for moving-body solvers.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class RigidBodyState(NamedTuple):
    x: Any        # [3] centre of mass
    q: Any        # [4] orientation quaternion (w, x, y, z), body->global
    v: Any        # [3] linear velocity (global)
    L: Any        # [3] angular momentum (GLOBAL frame; torque-free
    #               conservation is then structural — the body-frame
    #               Euler gyroscopic term lives in omega_b = I^-1 R^T L)


class RigidBodyConfig(NamedTuple):
    mass: float
    I_body: Tuple[float, float, float]     # principal inertia (body)
    g: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # linearSpring restraint: anchor (global), refAttachmentPt (body),
    # stiffness, damping, restLength
    springs: Tuple = ()
    lin_damping: float = 0.0               # linearDamper coefficient
    ang_damping: float = 0.0               # sphericalAngularDamper


def quat_rotate(q, v):
    """Rotate v (body) into global by quaternion q."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    R = jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return R @ v


def quat_mul(a, b):
    aw, av = a[0], a[1:]
    bw, bv = b[0], b[1:]
    return jnp.concatenate([
        jnp.array([aw * bw - av @ bv]),
        aw * bv + bw * av + jnp.cross(av, bv)])


def _forces(cfg: RigidBodyConfig, st: RigidBodyState,
            f_ext, tau_ext):
    F = jnp.asarray(cfg.g) * cfg.mass + f_ext
    tau_g = jnp.zeros(3, f_ext.dtype)
    for anchor, attach_b, k, c, l0 in cfg.springs:
        attach_g = st.x + quat_rotate(st.q, jnp.asarray(attach_b))
        d = attach_g - jnp.asarray(anchor)
        mag = jnp.linalg.norm(d)
        nhat = d / jnp.maximum(mag, 1e-30)
        # attachment-point velocity
        I = jnp.asarray(cfg.I_body)
        omega_b = quat_rotate(_conj(st.q), st.L) / I
        vel_att = st.v + quat_rotate(st.q, jnp.cross(
            omega_b, jnp.asarray(attach_b)))
        fs = -k * (mag - l0) * nhat - c * (vel_att @ nhat) * nhat
        F = F + fs
        tau_g = tau_g + jnp.cross(attach_g - st.x, fs)
    F = F - cfg.lin_damping * st.v
    tau = tau_ext + tau_g
    return F, tau


def update(cfg: RigidBodyConfig, st: RigidBodyState, dt,
           f_ext=None, tau_ext=None) -> RigidBodyState:
    """One symplectic (leapfrog-style) step (reference:
    sixDoFRigidBodyMotion::update with the symplectic solver).
    f_ext/tau_ext: external (flow) force/torque in the global frame."""
    dtype = st.x.dtype
    f_ext = jnp.zeros(3, dtype) if f_ext is None else f_ext
    tau_ext = jnp.zeros(3, dtype) if tau_ext is None else tau_ext
    I = jnp.asarray(cfg.I_body, dtype)

    def omega_body(q, L):
        return quat_rotate(_conj(q), L) / I

    F, tau = _forces(cfg, st, f_ext, tau_ext)
    # half kick (L is global; damper torque = -c*omega in global)
    v_half = st.v + 0.5 * dt * F / cfg.mass
    om_g = quat_rotate(st.q, omega_body(st.q, st.L))
    L_half = st.L + 0.5 * dt * (tau - cfg.ang_damping * om_g)
    # drift
    x_new = st.x + dt * v_half
    omega_b = omega_body(st.q, L_half)
    dq = 0.5 * quat_mul(st.q, jnp.concatenate(
        [jnp.zeros(1, dtype), omega_b]))
    q_new = st.q + dt * dq
    q_new = q_new / jnp.maximum(jnp.linalg.norm(q_new), 1e-30)
    # re-evaluate forces at the new configuration, second half kick
    st_mid = RigidBodyState(x=x_new, q=q_new, v=v_half, L=L_half)
    F2, tau2 = _forces(cfg, st_mid, f_ext, tau_ext)
    v_new = v_half + 0.5 * dt * F2 / cfg.mass
    om_g2 = quat_rotate(q_new, omega_body(q_new, L_half))
    L_new = L_half + 0.5 * dt * (tau2 - cfg.ang_damping * om_g2)
    return RigidBodyState(x=x_new, q=q_new, v=v_new, L=L_new)


def _conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def initial_state(x=(0.0, 0.0, 0.0), dtype=jnp.float32) -> RigidBodyState:
    return RigidBodyState(
        x=jnp.asarray(x, dtype),
        q=jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype),
        v=jnp.zeros(3, dtype),
        L=jnp.zeros(3, dtype))
