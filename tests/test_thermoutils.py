"""Thermophysical utilities (reference: applications/utilities/
thermophysical/): adiabaticFlameT against the textbook CH4-air value,
chemkinToFoam conversion round-trip."""

import os

from foamtpu.apps import thermoutils as tu
from foamtpu.core.dictionary import parse_string

# GRI-Mech 3.0 NASA-7 coefficients
THERMO = """
CH4
{
    specie { nMoles 1; molWeight 16.043; }
    thermodynamics
    {
        Tlow 200; Thigh 3500; Tcommon 1000;
        highCpCoeffs ( 7.48514950E-02 1.33909467E-02 -5.73285809E-06 1.22292535E-09 -1.01815230E-13 -9.46834459E+03 1.84373180E+01 );
        lowCpCoeffs ( 5.14987613E+00 -1.36709788E-02 4.91800599E-05 -4.84743026E-08 1.66693956E-11 -1.02466476E+04 -4.64130376E+00 );
    }
}
O2
{
    specie { nMoles 1; molWeight 31.9988; }
    thermodynamics
    {
        Tlow 200; Thigh 3500; Tcommon 1000;
        highCpCoeffs ( 3.28253784E+00 1.48308754E-03 -7.57966669E-07 2.09470555E-10 -2.16717794E-14 -1.08845772E+03 5.45323129E+00 );
        lowCpCoeffs ( 3.78245636E+00 -2.99673416E-03 9.84730201E-06 -9.68129509E-09 3.24372837E-12 -1.06394356E+03 3.65767573E+00 );
    }
}
N2
{
    specie { nMoles 1; molWeight 28.0134; }
    thermodynamics
    {
        Tlow 200; Thigh 3500; Tcommon 1000;
        highCpCoeffs ( 2.92664000E+00 1.48797680E-03 -5.68476000E-07 1.00970380E-10 -6.75335100E-15 -9.22797700E+02 5.98052800E+00 );
        lowCpCoeffs ( 3.29867700E+00 1.40824040E-03 -3.96322200E-06 5.64151500E-09 -2.44485400E-12 -1.02089990E+03 3.95037200E+00 );
    }
}
CO2
{
    specie { nMoles 1; molWeight 44.0095; }
    thermodynamics
    {
        Tlow 200; Thigh 3500; Tcommon 1000;
        highCpCoeffs ( 3.85746029E+00 4.41437026E-03 -2.21481404E-06 5.23490188E-10 -4.72084164E-14 -4.87591660E+04 2.27163806E+00 );
        lowCpCoeffs ( 2.35677352E+00 8.98459677E-03 -7.12356269E-06 2.45919022E-09 -1.43699548E-13 -4.83719697E+04 9.90105222E+00 );
    }
}
H2O
{
    specie { nMoles 1; molWeight 18.0153; }
    thermodynamics
    {
        Tlow 200; Thigh 3500; Tcommon 1000;
        highCpCoeffs ( 3.03399249E+00 2.17691804E-03 -1.64072518E-07 -9.70419870E-11 1.68200992E-14 -3.00042971E+04 4.96677010E+00 );
        lowCpCoeffs ( 4.19864056E+00 -2.03643410E-03 6.52040211E-06 -5.48797062E-09 1.77197817E-12 -3.02937267E+04 -8.49032208E-01 );
    }
}
"""


def test_ch4_air_adiabatic_flame_temperature():
    """Stoichiometric CH4/air, complete combustion, no dissociation:
    the janaf Tad is ~2325 K (standard textbook value for frozen
    products)."""
    thermo = parse_string(THERMO)
    reac = {"CH4": 1.0, "O2": 2.0, "N2": 7.52}
    prod = {"CO2": 1.0, "H2O": 2.0, "N2": 7.52}
    T = tu.adiabatic_flame_T(thermo, reac, prod, T0=298.15)
    assert 2250.0 < T < 2420.0, T
    # hotter with pure O2
    T_o2 = tu.adiabatic_flame_T(thermo, {"CH4": 1, "O2": 2},
                                {"CO2": 1, "H2O": 2}, T0=298.15)
    assert T_o2 > T + 1000.0


CHEMKIN_MECH = """
! methane one-step
ELEMENTS
C H O N
END
SPECIES
CH4 O2 CO2 H2O N2
END
REACTIONS
CH4+2O2=>CO2+2H2O   5.2E16  0.0   14906.0
END
"""

CHEMKIN_THERMO_HEADER = (
    "THERMO\n   300.000  1000.000  5000.000\n")


def _nasa_line(vals, n):
    return "".join(f"{v:15.8E}" for v in vals) + " " * (75 - 15 * len(
        vals)) + f"    {n}\n"


def test_chemkin_to_foam_roundtrip(tmp_path):
    """A one-step CHEMKIN mechanism converts into foamChemistry files
    that the chemistry model loads (A/beta/Ta mapped, E cal/mol ->
    Ta)."""
    chem = os.path.join(str(tmp_path), "chem.inp")
    th = os.path.join(str(tmp_path), "therm.dat")
    with open(chem, "w") as f:
        f.write(CHEMKIN_MECH)
    # minimal fixed-column thermo: CH4 only (others default)
    hi = [7.48514950E-02, 1.33909467E-02, -5.73285809E-06,
          1.22292535E-09, -1.01815230E-13, -9.46834459E+03,
          1.84373180E+01]
    lo = [5.14987613E+00, -1.36709788E-02, 4.91800599E-05,
          -4.84743026E-08, 1.66693956E-11, -1.02466476E+04,
          -4.64130376E+00]
    with open(th, "w") as f:
        f.write(CHEMKIN_THERMO_HEADER)
        # fixed columns: name 0-17, elements 24-43, phase 44,
        # Tlow 45-54, Thigh 55-64, Tcommon 65-72, card id at 79
        f.write(f"{'CH4':<18}{'':6}{'C 1H 4':<20}G"
                f"{200.0:>10.3f}{3500.0:>10.3f}{1000.0:>8.2f}"
                f"{'':6}1\n")
        f.write(_nasa_line(hi[:5], 2))
        f.write(_nasa_line(hi[5:7] + lo[:3], 3))
        f.write(_nasa_line(lo[3:7], 4))
        f.write("END\n")
    rout = os.path.join(str(tmp_path), "reactions")
    tout = os.path.join(str(tmp_path), "thermo")
    n = tu.chemkin_to_foam(chem, th, rout, tout)
    assert n == 1
    from foamtpu.core.dictionary import parse_file
    from foamtpu.models import chemistry

    rd = parse_file(rout)
    td = parse_file(tout)
    model, W = chemistry.from_foam_files(rd, td)
    assert len(rd["species"]) == 5
    r0 = rd["reactions"]["r0"]
    assert abs(float(r0["A"]) - 5.2e16) < 1e10
    # E = 14906 cal/mol -> Ta = E*4184/8314.47 K
    assert abs(float(r0["Ta"]) - 14906 * 4184.0 / 8314.47) < 1.0
    # CH4 thermo carried over
    assert "CH4" in td
    assert abs(float(td["CH4"]["specie"]["molWeight"]) - 16.043) < 0.01


def test_cli_adiabatic_flame(tmp_path, capsys):
    case = str(tmp_path)
    os.makedirs(os.path.join(case, "constant"), exist_ok=True)
    with open(os.path.join(case, "constant",
                           "thermo.compressibleGas"), "w") as f:
        f.write("FoamFile { version 2.0; format ascii; class "
                "dictionary; object thermo; }\n" + THERMO)
    with open(os.path.join(case, "flameT"), "w") as f:
        f.write("""
T0 298.15;
reactants { CH4 1; O2 2; N2 7.52; }
products { CO2 1; H2O 2; N2 7.52; }
""")
    from foamtpu.apps.cli import main

    assert main(["adiabaticFlameT", "flameT", "-case", case]) == 0
    outp = capsys.readouterr().out
    assert "Adiabatic flame temperature" in outp


def test_alternative_equations_of_state():
    """incompressiblePerfectGas / rhoConst / icoPolynomial /
    adiabaticPerfectFluid dispatch from thermoType and satisfy their
    state laws (reference: specie/equationOfState/)."""
    import numpy as np

    from foamtpu.core.dictionary import parse_string
    from foamtpu.models import thermo as th

    base_mix = """
mixture
{
    specie { nMoles 1; molWeight 28.96; }
    equationOfState { pRef 90000; rho 850; rho0 998; p0 1e5;
                      B 3.0e8; gamma 7.15;
                      rhoCoeffs<8> (1000 -0.05 0 0 0 0 0 0); }
    thermodynamics { Cp 1004.5; Hf 0; }
    transport { mu 1.8e-05; Pr 0.7; }
}
"""
    ipg = th.from_dict(parse_string(
        "thermoType hePsiThermo<pureMixture<const<hConst<"
        "incompressiblePerfectGas<specie>>,sensibleEnthalpy>>>;"
        + base_mix))
    assert isinstance(ipg, th.IncompressiblePerfectGas)
    # rho independent of p, = pRef/(R T)
    r1 = float(ipg.rho(1e5, 300.0))
    r2 = float(ipg.rho(5e4, 300.0))
    assert abs(r1 - r2) < 1e-12
    assert abs(r1 - 90000.0 / (ipg.R * 300.0)) < 1e-6
    assert float(np.asarray(ipg.psi(300.0))) == 0.0

    rc = th.from_dict(parse_string(
        "thermoType heRhoThermo<pureMixture<const<hConst<"
        "rhoConst<specie>>,sensibleEnthalpy>>>;" + base_mix))
    assert isinstance(rc, th.RhoConst)
    assert float(rc.rho(2e5, 350.0)) == 850.0

    ico = th.from_dict(parse_string(
        "thermoType heRhoThermo<pureMixture<const<hConst<"
        "icoPolynomial<specie>>,sensibleEnthalpy>>>;" + base_mix))
    assert isinstance(ico, th.IcoPolynomial)
    assert abs(float(ico.rho(1e5, 300.0))
               - (1000.0 - 0.05 * 300.0)) < 1e-9

    apf = th.from_dict(parse_string(
        "thermoType hePsiThermo<pureMixture<const<eConst<"
        "adiabaticPerfectFluid<specie>>,sensibleInternalEnergy>>>;"
        + base_mix))
    assert isinstance(apf, th.AdiabaticPerfectFluid)
    # Tait law: rho(p0) = rho0; monotone in p
    assert abs(float(apf.rho(1e5, 300.0)) - 998.0) < 1e-6
    assert float(apf.rho(5e7, 300.0)) > 998.0
    # psi ~= finite-difference d rho/dp near p0
    dp = 1e4
    fd = (float(apf.rho(1e5 + dp, 300.0))
          - float(apf.rho(1e5 - dp, 300.0))) / (2 * dp)
    psi = float(np.asarray(apf.psi(300.0)))
    assert abs(psi - fd) < 0.1 * abs(fd)


def test_rho_const_runs_in_rhopimple():
    """rhoConst through the compressible PIMPLE loop: density stays
    exactly rho0, the flow stays finite."""
    import jax.numpy as jnp
    import numpy as np

    from foamtpu.apps.cases import CAVITY_BLOCKMESH
    from foamtpu.bc import patchfields as pf
    from foamtpu.core.dictionary import parse_string
    from foamtpu.core.dimensions import DimensionSet, dimVelocity
    from foamtpu.core.fields import vol_scalar, vol_vector
    from foamtpu.mesh import blockmesh, to_device
    from foamtpu.models import thermo as th_mod
    from foamtpu.solvers import rhopimple as rp

    mesh = to_device(blockmesh.generate(
        parse_string(CAVITY_BLOCKMESH.replace("{n}", "10"))))
    th = th_mod.RhoConst(R=287.0, Cv=717.5, mu=1e-3, rho0=900.0)
    bw, bzg = [], []
    for p_ in mesh.patches:
        if p_.type == "empty":
            bw.append(pf.PatchField(kind="empty", vfrac=0.0))
            bzg.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            v = (jnp.asarray([1.0, 0.0, 0.0])
                 if p_.name == "movingWall" else jnp.zeros(3))
            bw.append(pf.fixed_value(v))
            bzg.append(pf.zero_gradient())
    U = vol_vector(mesh, jnp.zeros(3), name="U", dims=dimVelocity,
                   bcs=tuple(bw))
    p = vol_scalar(mesh, 1e5, name="p",
                   dims=DimensionSet.of(1, -1, -2), bcs=tuple(bzg))
    T = vol_scalar(mesh, 300.0, name="T",
                   dims=DimensionSet.of(0, 0, 0, 1), bcs=tuple(bzg))
    cfg = rp.RhoPimpleConfig(thermo=th, steady=False, n_correctors=2,
                             p_ref_value=1e5)
    state = rp.initial_state(mesh, U, p, T, th)
    step = rp.make_step(mesh, cfg)
    dt = jnp.asarray(1e-4, mesh.v.dtype)
    for _ in range(5):
        state, diag = step(state, dt)
    rho = np.asarray(th.rho(state["p"].data, state["T"].data))
    np.testing.assert_allclose(rho, 900.0, rtol=0, atol=0)
    assert np.isfinite(np.asarray(state["U"].data)).all()
