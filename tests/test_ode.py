"""ODE library tests (reference: src/ODE/ + test/ODE/Test-ODE.C, which
integrates a Bessel-type system with RKF45)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu import ode


def test_rk45_exponential_accuracy():
    """y' = -y, y(0)=1 over [0,2]: adaptive DP45 hits rtol."""
    f = lambda t, y: -y
    r = ode.integrate(f, jnp.array([1.0]), 0.0, 2.0, rtol=1e-7,
                      atol=1e-12)
    assert abs(float(r.y[0]) - np.exp(-2.0)) < 1e-6
    assert float(r.t) >= 2.0 - 1e-9
    assert int(r.n_steps) > 3


def test_rk45_oscillator():
    """Harmonic oscillator energy conservation over 10 periods."""
    f = lambda t, y: jnp.array([y[1], -y[0]])
    T = 2 * np.pi * 10
    r = ode.integrate(f, jnp.array([1.0, 0.0]), 0.0, T, rtol=1e-8,
                      atol=1e-12)
    assert abs(float(r.y[0]) - 1.0) < 1e-4
    assert abs(float(r.y[1])) < 1e-4


def test_rosenbrock_stiff_robertson():
    """Robertson chemical kinetics (stiffness ratio ~1e10): the
    Rosenbrock solver integrates to t=100 in far fewer steps than any
    explicit method could, conserving total mass."""
    def f(t, y):
        return jnp.array([
            -0.04 * y[0] + 1e4 * y[1] * y[2],
            0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
            3e7 * y[1] ** 2,
        ])

    r = ode.integrate(f, jnp.array([1.0, 0.0, 0.0], jnp.float64
                                   if jax.config.jax_enable_x64
                                   else jnp.float32),
                      0.0, 100.0, solver="rodas23", rtol=1e-5,
                      atol=1e-10)
    y = np.asarray(r.y)
    assert np.isfinite(y).all()
    assert abs(y.sum() - 1.0) < 1e-4          # mass conserved
    # known solution at t=100: y1~0.617, y3~0.383, y2~6e-6
    assert abs(y[0] - 0.617) < 0.02
    assert abs(y[2] - 0.383) < 0.02
    assert y[1] < 1e-4
    assert int(r.n_steps) < 2000              # stiff-stable step sizes


def test_vmap_batch_integration():
    """A batch of decay systems integrates under vmap — the chemistry
    per-cell pattern."""
    ks = jnp.linspace(0.5, 2.0, 16)

    def solve_one(k):
        f = lambda t, y: -k * y
        return ode.integrate(f, jnp.array([1.0]), 0.0, 1.0,
                             rtol=1e-6, atol=1e-10).y[0]

    ys = jax.vmap(solve_one)(ks)
    assert np.allclose(np.asarray(ys), np.exp(-np.asarray(ks)),
                       atol=1e-4)


def test_sibs_stiff_robertson():
    """SIBS (semi-implicit Bulirsch-Stoer, reference src/ODE/ODESolvers/
    SIBS/) on Robertson kinetics: stiff-stable, mass-conserving, and
    the extrapolation ladder takes FEWER accepted steps than the
    Rosenbrock 3(2) at the same tolerance (higher order per step)."""
    def f(t, y):
        return jnp.array([
            -0.04 * y[0] + 1e4 * y[1] * y[2],
            0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
            3e7 * y[1] ** 2,
        ])

    y0 = jnp.array([1.0, 0.0, 0.0], jnp.float64
                   if jax.config.jax_enable_x64 else jnp.float32)
    r = ode.integrate(f, y0, 0.0, 100.0, solver="SIBS", rtol=1e-5,
                      atol=1e-10)
    y = np.asarray(r.y)
    assert np.isfinite(y).all()
    assert abs(y.sum() - 1.0) < 1e-4
    assert abs(y[0] - 0.617) < 0.02
    assert abs(y[2] - 0.383) < 0.02
    assert y[1] < 1e-4
    rb = ode.integrate(f, y0, 0.0, 100.0, solver="rodas23", rtol=1e-5,
                       atol=1e-10)
    assert int(r.n_steps) < int(rb.n_steps)


def test_sibs_order_beats_rosenbrock_accuracy():
    """Non-stiff smooth problem at a fixed step budget: the
    extrapolated SIBS answer is closer to exp(-t) than one-step
    Rosenbrock at the same h (order check)."""
    from foamtpu.ode import rosenbrock23_step, sibs_step

    f = lambda t, y: -y
    y0 = jnp.array([1.0])
    h = 0.5
    y_s, _ = sibs_step(f, 0.0, y0, h)
    y_r, _ = rosenbrock23_step(f, 0.0, y0, h)
    exact = np.exp(-h)
    assert abs(float(y_s[0]) - exact) < abs(float(y_r[0]) - exact) / 10
