"""randomProcesses / boxTurb tests (reference: src/randomProcesses/ +
utilities/preProcessing/boxTurb)."""

import os

import numpy as np

from foamtpu.models import randomprocesses as rp


def test_boxturb_divergence_free_and_energy():
    u = rp.box_turb((32, 32, 32), (1.0, 1.0, 1.0), Ea=2.0, k0=8 * np.pi,
                    seed=3)
    assert u.shape == (32, 32, 32, 3)
    assert np.isfinite(u).all()
    # exact TKE calibration
    tke = 0.5 * np.mean(np.sum(u * u, axis=-1))
    assert abs(tke - 3.0) < 1e-6          # (3/2) Ea
    # spectrally divergence-free
    assert rp.div_rms(u, (1.0, 1.0, 1.0)) < 1e-10
    # isotropy: component energies within 30% of each other
    e = np.mean(u ** 2, axis=(0, 1, 2))
    assert e.max() / e.min() < 1.6


def test_boxturb_cli(tmp_path):
    """boxTurb utility on a 16^3 case writes a readable 0/U with the
    target energy (the boxTurb16 tutorial pipeline)."""
    case = str(tmp_path / "bt")
    os.makedirs(case + "/constant/polyMesh", exist_ok=True)
    os.makedirs(case + "/system", exist_ok=True)
    os.makedirs(case + "/0", exist_ok=True)
    hdr = 'FoamFile { version 2.0; format ascii; class %s; object %s; }\n'
    with open(case + "/constant/polyMesh/blockMeshDict", "w") as f:
        f.write(hdr % ("dictionary", "blockMeshDict") + """
convertToMeters 1;
vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
           (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
blocks ( hex (0 1 2 3 4 5 6 7) (16 16 16) simpleGrading (1 1 1) );
boundary ( walls { type wall;
  faces ((0 4 7 3) (2 6 5 1) (1 5 4 0) (3 7 6 2) (0 3 2 1) (4 5 6 7)); } );
""")
    with open(case + "/system/controlDict", "w") as f:
        f.write(hdr % ("dictionary", "controlDict") + """
application icoFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 1; deltaT 0.001;
writeControl timeStep; writeInterval 100; writeFormat ascii;
""")
    with open(case + "/system/fvSchemes", "w") as f:
        f.write(hdr % ("dictionary", "fvSchemes") + """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; }
laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes { default linear; }
snGradSchemes { default corrected; }
""")
    with open(case + "/system/fvSolution", "w") as f:
        f.write(hdr % ("dictionary", "fvSolution") + "solvers { }\n")
    with open(case + "/constant/boxTurbDict", "w") as f:
        f.write(hdr % ("dictionary", "boxTurbDict") + """
Ea 2; k0 25; seed 1;
""")
    with open(case + "/0/U", "w") as f:
        f.write(hdr % ("volVectorField", "U") + """
dimensions [0 1 -1 0 0 0 0];
internalField uniform (0 0 0);
boundaryField { walls { type cyclic-ish; } }
""".replace("cyclic-ish", "zeroGradient"))
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", case]) == 0
    assert main(["boxTurb", "-case", case]) == 0
    from foamtpu.core.case import Case

    c = Case(case)
    U = np.asarray(c.read_field("U").data)
    tke = 0.5 * np.mean(np.sum(U * U, axis=1))
    assert abs(tke - 3.0) / 3.0 < 1e-3
    assert np.isfinite(U).all() and np.abs(U).max() > 0.1


def test_dnsfoam_forced_box(tmp_path):
    """dnsFoam: boxTurb initial field + UO forcing on a periodic-ish
    box stays finite and retains turbulent kinetic energy."""
    import os

    import numpy as np

    from foamtpu.apps.cli import main
    from foamtpu.core.case import Case, run_case

    case = str(tmp_path / "dns")
    hdr = 'FoamFile { version 2.0; format ascii; class %s; object %s; }\n'
    for d in ("constant/polyMesh", "system", "0"):
        os.makedirs(os.path.join(case, d), exist_ok=True)

    def w(rel, cls, body):
        with open(os.path.join(case, rel), "w") as f:
            f.write(hdr % (cls, os.path.basename(rel)) + body)

    w("constant/polyMesh/blockMeshDict", "dictionary", """
convertToMeters 1;
vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0) (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
blocks ( hex (0 1 2 3 4 5 6 7) (16 16 16) simpleGrading (1 1 1) );
boundary ( walls { type wall;
  faces ((0 4 7 3) (2 6 5 1) (1 5 4 0) (3 7 6 2) (0 3 2 1) (4 5 6 7)); } );
""")
    w("system/controlDict", "dictionary", """
application dnsFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 1; deltaT 0.005;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    w("system/fvSchemes", "dictionary", """
ddtSchemes { default Euler; } gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss linear; }
laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes { default linear; } snGradSchemes { default corrected; }
""")
    w("system/fvSolution", "dictionary", """
solvers
{
    p { solver PCG; preconditioner DIC; tolerance 1e-6; relTol 0.05; }
    U { solver smoothSolver; smoother GaussSeidel; tolerance 1e-6; relTol 0; nSweeps 2; }
}
PISO { nCorrectors 2; }
""")
    w("constant/transportProperties", "dictionary",
      "transportModel Newtonian;\nnu nu [0 2 -1 0 0 0 0] 0.0025;\n")
    w("constant/boxTurbDict", "dictionary", "Ea 0.5; k0 12; seed 2;\n")
    w("0/U", "volVectorField", """
dimensions [0 1 -1 0 0 0 0];
internalField uniform (0 0 0);
boundaryField { walls { type slip; } }
""")
    w("0/p", "volScalarField", """
dimensions [0 2 -2 0 0 0 0];
internalField uniform 0;
boundaryField { walls { type zeroGradient; } }
""")
    assert main(["blockMesh", "-case", case]) == 0
    assert main(["boxTurb", "-case", case]) == 0
    c = run_case(case, max_steps=20)
    U = np.asarray(c.final_state["U"].data)
    assert np.isfinite(U).all()
    tke = 0.5 * np.mean(np.sum(U * U, axis=1))
    assert 0.05 < tke < 5.0   # alive, neither dead nor blown up
