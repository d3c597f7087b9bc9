"""fvOptions source injection (reference: src/fvOptions/, NEW in 2.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet, dimVelocity
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.models import fvoptions
from foamtpu.solvers import piso, pimple

PERIODIC_CHANNEL = """
convertToMeters 1;
vertices
(
    (0 0 0) (2 0 0) (2 1 0) (0 1 0)
    (0 0 0.1) (2 0 0.1) (2 1 0.1) (0 1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (16 10 1) simpleGrading (1 1 1) );
boundary
(
    inlet  { type cyclic; neighbourPatch outlet; faces ((0 4 7 3)); }
    outlet { type cyclic; neighbourPatch inlet;  faces ((2 6 5 1)); }
    walls  { type wall; faces ((3 7 6 2) (1 5 4 0)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def _channel():
    mesh = to_device(blockmesh.generate(parse_string(PERIODIC_CHANNEL)))
    ubcs, pbcs = [], []
    for p in mesh.patches:
        if p.type == "empty":
            ubcs.append(pf.PatchField(kind="empty", vfrac=0.0))
            pbcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif p.type == "wall":
            ubcs.append(pf.fixed_value(jnp.zeros(3)))
            pbcs.append(pf.zero_gradient())
        else:
            ubcs.append(pf.zero_gradient())
            pbcs.append(pf.zero_gradient())
    U = vol_vector(mesh, jnp.asarray([0.5, 0.0, 0.0]), name="U",
                   dims=dimVelocity, bcs=tuple(ubcs))
    p = vol_scalar(mesh, 0.0, name="p", dims=DimensionSet.of(0, 2, -2),
                   bcs=tuple(pbcs))
    return mesh, U, p


def test_mean_velocity_force_holds_ubar():
    """channelFoam configuration: periodic channel driven by
    meanVelocityForce must hold the bulk velocity at Ubar despite wall
    friction (reference: sources/derived/meanVelocityForce)."""
    mesh, U, p = _channel()
    d = parse_string("""
momentumSource
{
    type            meanVelocityForce;
    active          true;
    meanVelocityForceCoeffs
    {
        selectionMode   all;
        fieldNames      (U);
        Ubar            (1 0 0);
    }
}
""")
    fvopt = fvoptions.from_dict(mesh, d, nu=0.01)
    assert fvopt and fvopt.options[0].kind == "meanVelocityForce"
    cfg = piso.PisoConfig(nu=0.01, n_correctors=2, fv_options=fvopt)
    state = piso.initial_state(mesh, U, p, project=False)
    state["fvopt"] = fvopt.init_state(mesh)
    step = jax.jit(lambda s, d_: piso.piso_step(mesh, s, d_, cfg))
    dt = jnp.asarray(0.05, mesh.v.dtype)
    for _ in range(60):
        state, diag = step(state, dt)
    Ux = np.asarray(state["U"].data)[:, 0]
    v = np.asarray(mesh.v)
    ubar = float((Ux * v).sum() / v.sum())
    # bulk velocity held at the target despite wall friction
    assert abs(ubar - 1.0) < 0.02
    # a parabolic-ish profile developed: centerline > mean
    assert Ux.max() > 1.1 * ubar
    assert float(diag["continuity"]) < 1e-4
    # the stored pressure-gradient forcing is positive (drives the flow)
    assert float(state["fvopt"]["gradP_momentumSource"]) > 0.0


def test_porosity_source_slows_flow():
    """explicitPorositySource (Darcy-Forchheimer) in a box zone slows
    the flow inside the zone relative to the same run without it."""
    mesh, U, p = _channel()
    d = parse_string("""
porosity
{
    type            explicitPorositySource;
    active          true;
    explicitPorositySourceCoeffs
    {
        selectionMode   box;
        box             ((0.75 0 0) (1.25 1 1));
        type            DarcyForchheimer;
        d               (5e4 5e4 5e4);
        f               (0 0 0);
    }
}
momentumSource
{
    type            meanVelocityForce;
    active          true;
    meanVelocityForceCoeffs
    {
        selectionMode   all;
        fieldNames      (U);
        Ubar            (1 0 0);
    }
}
""")
    fvopt = fvoptions.from_dict(mesh, d, nu=0.01)
    assert len(fvopt.options) == 2
    cfg = piso.PisoConfig(nu=0.01, n_correctors=2, fv_options=fvopt)
    state = piso.initial_state(mesh, U, p, project=False)
    state["fvopt"] = fvopt.init_state(mesh)
    step = jax.jit(lambda s, d_: piso.piso_step(mesh, s, d_, cfg))
    dt = jnp.asarray(0.02, mesh.v.dtype)
    for _ in range(40):
        state, diag = step(state, dt)
    Ux = np.asarray(state["U"].data)[:, 0]
    c = np.asarray(mesh.c)
    inside = (c[:, 0] > 0.75) & (c[:, 0] < 1.25)
    # porous block resists: centreline velocity inside < outside
    mid = np.abs(c[:, 1] - 0.5) < 0.15
    assert Ux[inside & mid].mean() < 0.9 * Ux[~inside & mid].mean()
    assert np.isfinite(Ux).all()


def test_semi_implicit_source_scalar():
    """semiImplicitSource adds V*Su to the source and -V*Sp to the
    diagonal of a matching field's equation."""
    mesh, U, p = _channel()
    d = parse_string("""
heatSource
{
    type            semiImplicitSource;
    active          true;
    semiImplicitSourceCoeffs
    {
        selectionMode   all;
        volumeMode      specific;
        injectionRateSuSp { T (5.0 -0.5); }
    }
}
""")
    fvopt = fvoptions.from_dict(mesh, d)
    from foamtpu.core.dimensions import dimless
    from foamtpu.ops import fvm

    T = vol_scalar(mesh, 1.0, name="T", dims=dimless,
                   bcs=pf.default_bcs(mesh, 0))
    eqn = fvm.ddt(mesh, T, T.data, 1.0)
    eqn2 = fvopt.add_to(mesh, eqn, "T", T, U=U)
    dsrc = np.asarray(eqn2.source - eqn.source)
    ddiag = np.asarray(eqn2.diag - eqn.diag)
    v = np.asarray(mesh.v)
    np.testing.assert_allclose(dsrc, 5.0 * v, rtol=1e-6)
    np.testing.assert_allclose(ddiag, 0.5 * v, rtol=1e-6)
    # a non-matching field is untouched
    eqn3 = fvopt.add_to(mesh, eqn, "k", T, U=U)
    np.testing.assert_array_equal(np.asarray(eqn3.source),
                                  np.asarray(eqn.source))


def test_coded_source_python_snippet():
    """codedSource: a Python codeAddSup snippet provides a spatially
    varying volumetric source (the dynamicCode/#codeStream analogue for
    equation sources — reference: fvOptions codedSource)."""
    import jax.numpy as jnp
    import numpy as np

    from foamtpu.core.dictionary import parse_string
    from foamtpu.models import fvoptions

    mesh, _, _ = _channel()
    c0 = float(np.asarray(mesh.c)[:, 0].mean())
    d = parse_string('''
heater
{
    type            scalarCodedSource;
    selectionMode   all;
    fields          (T);
    codeAddSup      #{
source = np.where(C[:, 0] > %g, 5.0, 0.0)
    #};
}
''' % c0)
    opts = fvoptions.from_dict(mesh, d, nu=1e-5)
    assert bool(opts)
    from foamtpu.core.fields import vol_scalar
    from foamtpu.ops import fvm

    T = vol_scalar(mesh, 0.0, name="T")
    eqn = fvm.ddt(mesh, T, T.data, 1.0 / 0.1)
    eqn2 = opts.add_to(mesh, eqn, "T", T)
    ds = np.asarray(eqn2.source - eqn.source)
    c = np.asarray(mesh.c)
    v = np.asarray(mesh.v)
    assert np.allclose(ds[c[:, 0] > c0], 5.0 * v[c[:, 0] > c0])
    assert np.allclose(ds[c[:, 0] <= c0], 0.0)


def test_anisotropic_porosity_rotation():
    """DarcyForchheimer with a coordinateSystem rotated 45 degrees: the
    resistance force on a uniform x-velocity picks up the analytic
    off-axis component -R diag(d) R^T U (reference: porosityModel with
    axesRotation)."""
    import numpy as np
    import jax.numpy as jnp

    from foamtpu.core.dictionary import parse_string
    from foamtpu.core.fields import vol_vector
    from foamtpu.mesh import blockmesh, to_device
    from foamtpu.models import fvoptions
    from foamtpu.ops import fvm

    BM = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 1) (1 0 1) (1 1 1) (0 1 1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (4 4 4) simpleGrading (1 1 1) );
boundary
(
    walls { type wall; faces ((2 6 5 1) (0 4 7 3) (1 5 4 0)
                              (3 7 6 2) (0 3 2 1) (4 5 6 7)); }
);
"""
    mesh = to_device(blockmesh.generate(parse_string(BM)))
    spec = parse_string("""
porosity
{
    type explicitPorositySource;
    active true;
    explicitPorositySourceCoeffs
    {
        selectionMode all;
        DarcyForchheimerCoeffs
        {
            d (100 1 1);
            f (0 0 0);
            coordinateSystem
            {
                coordinateRotation
                {
                    e1 (0.7071067811865476 0.7071067811865476 0);
                    e3 (0 0 1);
                }
            }
        }
    }
}
""")
    opts = fvoptions.from_dict(mesh, spec, nu=1.0)
    U = vol_vector(mesh, (1.0, 0.0, 0.0), name="U")
    eqn = fvm.ddt(mesh, U, U.data, jnp.asarray(1.0, mesh.v.dtype))
    eqn2 = opts.add_to(mesh, eqn, "U", U, U=U)
    # analytic C = R diag(100,1,1) R^T with nu=1, f=0:
    # C = [[50.5, 49.5, 0], [49.5, 50.5, 0], [0, 0, 1]]
    # iso = tr/3 = 34; source = -(C - iso I) U * V
    v = np.asarray(mesh.v)[0]
    d_diag = float((np.asarray(eqn2.diag) - np.asarray(eqn.diag))[0])
    assert abs(d_diag - 34.0 * v) < 1e-6 * v
    ds = np.asarray(eqn2.source - eqn.source)[0] / v
    # -(C - iso I) @ (1,0,0) = -(50.5-34, 49.5, 0) = (-16.5, -49.5, 0)
    assert abs(ds[0] + 16.5) < 1e-4
    assert abs(ds[1] + 49.5) < 1e-4
    assert abs(ds[2]) < 1e-6


def test_fixed_temperature_constraint():
    """fixedTemperatureConstraint holds the zone at Tset through the
    rhoPimple energy solve (reference: fvOptions/constraints/
    fixedTemperatureConstraint)."""
    from foamtpu.core.dictionary import FoamDict
    from foamtpu.models.thermo import PerfectGas
    from foamtpu.solvers import rhopimple as rp

    mesh, U, p = _channel()
    th = PerfectGas(R=287.0, Cv=717.5, mu=1.8e-5)
    spec = FoamDict([("type", "fixedTemperatureConstraint"),
                     ("selectionMode", "box"),
                     ("box", np.asarray([[0.8, -1.0, -1.0],
                                         [1.2, 2.0, 2.0]])),
                     ("temperature", 400.0),
                     ("fieldNames", ["T"])])
    import foamtpu.models.fvoptions as fvo

    c = np.asarray(mesh.c)
    zone = np.nonzero((c[:, 0] > 0.8) & (c[:, 0] < 1.2))[0]
    opts = fvo.from_dict(mesh, FoamDict([("heater", spec)]))
    from foamtpu.core.fields import vol_scalar

    T = vol_scalar(mesh, 300.0, name="T",
                   dims=DimensionSet.of(0, 0, 0, 1),
                   bcs=T_bcs(mesh))
    p_abs = vol_scalar(mesh, 1e5, name="p",
                       dims=DimensionSet.of(1, -1, -2),
                       bcs=tuple(pf.zero_gradient()
                                 if p_.type != "empty" else
                                 pf.PatchField(kind="empty", vfrac=0.0)
                                 for p_ in mesh.patches))
    cfg = rp.RhoPimpleConfig(thermo=th, steady=False,
                             n_correctors=2, fv_options=opts,
                             p_ref_value=1e5)
    state = rp.initial_state(mesh, U, p_abs, T, th)
    state["fvopt"] = opts.init_state(mesh)
    step = rp.make_step(mesh, cfg)
    dt = jnp.asarray(1e-3, mesh.v.dtype)
    for _ in range(5):
        state, diag = step(state, dt)
    Td = np.asarray(state["T"].data)
    assert np.allclose(Td[zone], 400.0, atol=0.5)
    # heat diffuses/advects out of the zone: neighbours warmed above
    # the 300 K background
    assert Td[np.setdiff1d(np.arange(mesh.n_cells), zone)].max() > 301.0


def T_bcs(mesh):
    out = []
    for p_ in mesh.patches:
        if p_.type == "empty":
            out.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            out.append(pf.zero_gradient())
    return tuple(out)


def test_radial_actuation_disk_total_thrust():
    """radialActuationDiskSource distributes the same total thrust as
    the uniform disk, weighted by the radial profile."""
    from foamtpu.core.dictionary import FoamDict
    import foamtpu.models.fvoptions as fvo
    from foamtpu.ops.matrix import zero_matrix

    mesh, U, p = _channel()
    c = np.asarray(mesh.c)
    zone = np.nonzero((c[:, 0] > 0.8) & (c[:, 0] < 1.2))[0]
    common = [("selectionMode", "box"),
              ("box", np.asarray([[0.8, -1.0, -1.0],
                                  [1.2, 2.0, 2.0]])),
              ("diskDir", [(1.0, 0.0, 0.0)]), ("Cp", 0.386),
              ("Ct", 0.58), ("diskArea", 0.04), ("upstreamU", 1.0)]
    uni = fvo.from_dict(mesh, FoamDict([
        ("d1", FoamDict([("type", "actuationDiskSource")] + common))]))
    rad = fvo.from_dict(mesh, FoamDict([
        ("d2", FoamDict([("type", "radialActuationDiskSource"),
                         ("coeffs", [(0.1, 0.5, 0.01)])] + common))]))
    m0 = zero_matrix(mesh, 3, dims=DimensionSet.of(0, 4, -2))
    e_uni = uni.add_to(mesh, m0, "U", U, U=U)
    e_rad = rad.add_to(mesh, m0, "U", U, U=U)
    f_uni = np.asarray(e_uni.source)[:, 0]
    f_rad = np.asarray(e_rad.source)[:, 0]
    np.testing.assert_allclose(f_uni.sum(), f_rad.sum(), rtol=1e-5)
    # the radial profile is NOT uniform inside the zone
    nz = f_rad[zone]
    assert nz.std() > 1e-3 * np.abs(nz).mean()
