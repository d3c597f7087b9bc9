"""sixDoFRigidBodyMotion tests (reference: src/sixDoFRigidBodyMotion/
with the symplectic motion solver)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.models import sixdof


def test_spring_mass_period():
    """Linear spring: oscillation at omega = sqrt(k/m) with the
    symplectic integrator conserving amplitude."""
    k, m = 100.0, 2.5
    cfg = sixdof.RigidBodyConfig(
        mass=m, I_body=(1.0, 1.0, 1.0),
        springs=(((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), k, 0.0, 0.0),))
    st = sixdof.initial_state(x=(0.1, 0.0, 0.0))
    T = 2 * np.pi * np.sqrt(m / k)
    dt = T / 400
    step = jax.jit(lambda s: sixdof.update(cfg, s, dt))
    xs = []
    for _ in range(800):   # two periods
        st = step(st)
        xs.append(float(st.x[0]))
    xs = np.asarray(xs)
    # back near the start after 2T, amplitude conserved
    assert abs(xs[-1] - 0.1) < 0.004
    assert abs(np.abs(xs).max() - 0.1) < 0.004
    # zero crossing near T/4
    first_cross = np.argmax(np.sign(xs) < 0)
    assert abs(first_cross * dt - T / 4) < 0.06 * T


def test_free_rotation_conserves_momentum():
    """Torque-free asymmetric top: |L| (body) and the GLOBAL angular
    momentum vector are conserved."""
    cfg = sixdof.RigidBodyConfig(mass=1.0, I_body=(1.0, 2.0, 3.0))
    st = sixdof.initial_state()._replace(
        L=jnp.asarray([0.3, 0.5, 0.2], jnp.float32))
    L0 = np.asarray(st.L)   # L is stored in the global frame
    step = jax.jit(lambda s: sixdof.update(cfg, s, 1e-3))
    for _ in range(2000):
        st = step(st)
    assert np.linalg.norm(np.asarray(st.L) - L0) < 1e-5
    # the body actually tumbles: orientation moved
    assert abs(float(st.q[0]) - 1.0) > 1e-3
    assert abs(float(jnp.linalg.norm(st.q)) - 1.0) < 1e-5


def test_gravity_drop_with_damper():
    """Gravity + linearDamper reaches the terminal velocity m g / c."""
    cfg = sixdof.RigidBodyConfig(mass=2.0, I_body=(1.0, 1.0, 1.0),
                                 g=(0.0, -10.0, 0.0), lin_damping=4.0)
    st = sixdof.initial_state()
    step = jax.jit(lambda s: sixdof.update(cfg, s, 0.01))
    for _ in range(3000):
        st = step(st)
    vt = 2.0 * 10.0 / 4.0
    assert abs(-float(st.v[1]) - vt) < 0.02 * vt
