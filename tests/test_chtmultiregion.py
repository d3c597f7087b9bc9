"""Conjugate heat transfer tests (reference:
applications/solvers/heatTransfer/chtMultiRegionFoam/)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet
from foamtpu.core.fields import vol_scalar
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import chtmultiregion as cht

T_DIM = DimensionSet.of(0, 0, 0, 1)


def _slab(x0, x1, n, iface_name, iface_at_right, outer_name):
    lo = f"({x0} 0 0) ({x0} 1 0) ({x0} 0 0.1) ({x0} 1 0.1)"
    faces_left = "((0 4 7 3))"
    faces_right = "((2 6 5 1))"
    left_name = outer_name if iface_at_right else iface_name
    right_name = iface_name if iface_at_right else outer_name
    d = parse_string(f"""
convertToMeters 1;
vertices
(
    ({x0} 0 0) ({x1} 0 0) ({x1} 1 0) ({x0} 1 0)
    ({x0} 0 0.1) ({x1} 0 0.1) ({x1} 1 0.1) ({x0} 1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) ({n} 4 1) simpleGrading (1 1 1) );
boundary
(
    {left_name}  {{ type wall; faces {faces_left}; }}
    {right_name} {{ type wall; faces {faces_right}; }}
    sides {{ type wall; faces ((1 5 4 0) (3 7 6 2)); }}
    frontAndBack {{ type empty; faces ((0 3 2 1) (4 5 6 7)); }}
);
""")
    return to_device(blockmesh.generate(d))


def test_two_slab_interface_temperature():
    """Two conducting slabs (k=10 | k=1) with fixed outer temperatures:
    the coupled-baffle iteration converges to the analytic interface
    temperature T_i = 390.9 K and piecewise-linear profiles."""
    k_a, k_b = 10.0, 1.0
    mesh_a = _slab(0.0, 0.5, 20, "iface", True, "hot")
    mesh_b = _slab(0.5, 1.0, 20, "iface", False, "cold")

    def field(mesh, fixed, fixed_T):
        bcs = []
        for p in mesh.patches:
            if p.type == "empty":
                bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
            elif p.name == fixed:
                bcs.append(pf.fixed_value(fixed_T))
            elif p.name == "iface":
                bcs.append(pf.mixed(300.0, 0.0, 0.5))
            else:
                bcs.append(pf.zero_gradient())
        return vol_scalar(mesh, 350.0, name="T", dims=T_DIM,
                          bcs=tuple(bcs))

    Ta = field(mesh_a, "hot", 400.0)
    Tb = field(mesh_b, "cold", 300.0)
    from foamtpu.bc.patchfields import normalize_bcs

    iface = cht.match_interface(mesh_a, "iface", mesh_b, "iface",
                                "A", "B")
    cfg_a = cht.SolidConfig(rho=1000.0, cp=500.0, kappa=k_a, steady=True)
    cfg_b = cht.SolidConfig(rho=1000.0, cp=500.0, kappa=k_b, steady=True)
    ka = jnp.full(mesh_a.n_cells, k_a, mesh_a.v.dtype)
    kb = jnp.full(mesh_b.n_cells, k_b, mesh_b.v.dtype)

    step_a = jax.jit(lambda T: cht.solid_step(mesh_a, T, T.data, 1.0,
                                              cfg_a)[0])
    step_b = jax.jit(lambda T: cht.solid_step(mesh_b, T, T.data, 1.0,
                                              cfg_b)[0])
    for _ in range(60):
        Ta, Tb = cht.update_coupled_bcs(mesh_a, Ta, ka, mesh_b, Tb, kb,
                                        iface)
        Ta = step_a(Ta)
        Tb = step_b(Tb)

    Ti_exact = (400.0 * k_a / 0.5 + 300.0 * k_b / 0.5) / (
        k_a / 0.5 + k_b / 0.5)     # 390.909
    xa = np.asarray(mesh_a.c)[:, 0]
    xb = np.asarray(mesh_b.c)[:, 0]
    Ta_d = np.asarray(Ta.data)
    Tb_d = np.asarray(Tb.data)
    # linear profiles hitting the exact interface temperature
    exact_a = 400.0 + (Ti_exact - 400.0) * xa / 0.5
    exact_b = Ti_exact + (300.0 - Ti_exact) * (xb - 0.5) / 0.5
    assert np.abs(Ta_d - exact_a).max() < 0.5, \
        np.abs(Ta_d - exact_a).max()
    assert np.abs(Tb_d - exact_b).max() < 0.5
    # flux continuity across the interface
    qa = k_a * (Ta_d[xa.argsort()][-1] - Ti_exact) / (
        0.5 / 20 / 2)  # near-wall gradient sanity only
    assert np.isfinite(qa)


def test_cht_app_two_regions(tmp_path):
    """chtMultiRegionSimpleFoam end-to-end through the case layout:
    constant/regionProperties, per-region polyMesh/fields/dicts,
    `<A>_to_<B>` interface patches."""
    import os

    from foamtpu.core.dictionary import parse_string as ps
    from foamtpu.io import polymesh as mesh_io
    from foamtpu.mesh import blockmesh

    case = str(tmp_path / "cht")
    hdr = 'FoamFile { version 2.0; format ascii; class %s; object %s; }\n'

    def w(rel, cls, body):
        path = os.path.join(case, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(hdr % (cls, os.path.basename(rel)) + body)

    def slab_dict(x0, x1, left, right):
        return ps(f"""
convertToMeters 1;
vertices
(
    ({x0} 0 0) ({x1} 0 0) ({x1} 1 0) ({x0} 1 0)
    ({x0} 0 0.1) ({x1} 0 0.1) ({x1} 1 0.1) ({x0} 1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (16 4 1) simpleGrading (1 1 1) );
boundary
(
    {left}  {{ type wall; faces ((0 4 7 3)); }}
    {right} {{ type wall; faces ((2 6 5 1)); }}
    sides {{ type wall; faces ((1 5 4 0) (3 7 6 2)); }}
    frontAndBack {{ type empty; faces ((0 3 2 1) (4 5 6 7)); }}
);
""")

    os.makedirs(case, exist_ok=True)
    mesh_io.write(blockmesh.generate(
        slab_dict(0.0, 0.5, "hot", "heater_to_sink")),
        os.path.join(case, "constant", "heater", "polyMesh"))
    mesh_io.write(blockmesh.generate(
        slab_dict(0.5, 1.0, "sink_to_heater", "cold")),
        os.path.join(case, "constant", "sink", "polyMesh"))

    w("system/controlDict", "dictionary", """
application chtMultiRegionSimpleFoam;
startFrom startTime; startTime 0; stopAt endTime; endTime 200; deltaT 1;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    schemes = """
ddtSchemes { default steadyState; } gradSchemes { default Gauss linear; }
divSchemes { default none; } laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes { default linear; } snGradSchemes { default corrected; }
"""
    w("system/fvSchemes", "dictionary", schemes)
    w("system/fvSolution", "dictionary", "solvers { }\n")
    for r in ("heater", "sink"):
        w(f"system/{r}/fvSchemes", "dictionary", schemes)
        w(f"system/{r}/fvSolution", "dictionary", """
solvers { T { solver PCG; preconditioner DIC; tolerance 1e-9; relTol 0.01; } }
""")
    w("constant/regionProperties", "dictionary", """
regions
(
    solid (heater sink)
);
""")
    w("constant/heater/thermophysicalProperties", "dictionary",
      "rho 1000;\nCp 500;\nkappa 10;\n")
    w("constant/sink/thermophysicalProperties", "dictionary",
      "rho 1000;\nCp 500;\nkappa 1;\n")
    w("0/heater/T", "volScalarField", """
dimensions [0 0 0 1 0 0 0];
internalField uniform 350;
boundaryField
{
    hot { type fixedValue; value uniform 400; }
    heater_to_sink { type compressible::turbulentTemperatureCoupledBaffleMixed;
                     value uniform 350; Tnbr T; kappa solidThermo; }
    sides { type zeroGradient; }
    frontAndBack { type empty; }
}
""")
    w("0/sink/T", "volScalarField", """
dimensions [0 0 0 1 0 0 0];
internalField uniform 350;
boundaryField
{
    cold { type fixedValue; value uniform 300; }
    sink_to_heater { type compressible::turbulentTemperatureCoupledBaffleMixed;
                     value uniform 350; Tnbr T; kappa solidThermo; }
    sides { type zeroGradient; }
    frontAndBack { type empty; }
}
""")
    from foamtpu.core.case import run_case

    c = run_case(case, max_steps=60)
    regions = c.final_state
    Th = np.asarray(regions["heater"]["T"].data)
    Ts = np.asarray(regions["sink"]["T"].data)
    Ti = (400.0 * 10 + 300.0 * 1) / 11.0     # 390.909
    xh = np.asarray(regions["heater"]["mesh"].c)[:, 0]
    xs = np.asarray(regions["sink"]["mesh"].c)[:, 0]
    assert np.abs(Th - (400 + (Ti - 400) * xh / 0.5)).max() < 1.0
    assert np.abs(Ts - (Ti + (300 - Ti) * (xs - 0.5) / 0.5)).max() < 1.0
    # fields written
    import glob

    assert glob.glob(os.path.join(case, "*", "heater", "T"))
