"""dynamicCode analogue tests: codedFixedValue BC with a Python
snippet (reference: src/OpenFOAM/db/dynamicLibrary/codedBase/ +
codedFixedValue; C++ snippets become Python here)."""

import numpy as np

from foamtpu.core.dictionary import parse_string


def test_verbatim_block_tokenized():
    d = parse_string("""
x 1;
code #{
    value = 3 * Cf[:, 1]
#};
y 2;
""")
    assert d["x"] == 1 and d["y"] == 2
    assert "value = 3 * Cf[:, 1]" in str(d["code"])


def test_coded_fixed_value_bc(tmp_path):
    """A codedFixedValue U inlet computing a parabolic profile from the
    face centres is evaluated at read time."""
    import os

    from foamtpu.apps.cli import main
    from foamtpu.core.case import Case

    case = str(tmp_path / "coded")
    hdr = 'FoamFile { version 2.0; format ascii; class %s; object %s; }\n'
    for d in ("constant/polyMesh", "system", "0"):
        os.makedirs(os.path.join(case, d), exist_ok=True)

    def w(rel, cls, body):
        with open(os.path.join(case, rel), "w") as f:
            f.write(hdr % (cls, os.path.basename(rel)) + body)

    w("constant/polyMesh/blockMeshDict", "dictionary", """
convertToMeters 1;
vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
           (0 0 0.1) (1 0 0.1) (1 1 0.1) (0 1 0.1) );
blocks ( hex (0 1 2 3 4 5 6 7) (10 10 1) simpleGrading (1 1 1) );
boundary ( inlet { type patch; faces ((0 4 7 3)); }
           outlet { type patch; faces ((2 6 5 1)); }
           walls { type wall; faces ((1 5 4 0) (3 7 6 2)); }
           frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); } );
""")
    w("system/controlDict", "dictionary", """
application icoFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 1; deltaT 0.01;
writeControl timeStep; writeInterval 100; writeFormat ascii;
""")
    w("system/fvSchemes", "dictionary", """
ddtSchemes { default Euler; } gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss linear; }
laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes { default linear; } snGradSchemes { default corrected; }
""")
    w("system/fvSolution", "dictionary", "solvers { }\n")
    w("0/U", "volVectorField", """
dimensions [0 1 -1 0 0 0 0];
internalField uniform (0 0 0);
boundaryField
{
    inlet
    {
        type            codedFixedValue;
        value           uniform (0 0 0);
        name            parabolicInlet;
        code            #{
import numpy as np
y = Cf[:, 1]
value = np.stack([4.0 * y * (1.0 - y), 0 * y, 0 * y], axis=1)
        #};
    }
    outlet { type zeroGradient; }
    walls { type fixedValue; value uniform (0 0 0); }
    frontAndBack { type empty; }
}
""")
    assert main(["blockMesh", "-case", case]) == 0
    c = Case(case)
    U = c.read_field("U")
    mesh = c.mesh
    inlet = next(p for p in mesh.patches if p.name == "inlet")
    bc = U.bcs[list(mesh.patches).index(inlet)]
    vals = np.asarray(bc.ref_value)
    y = np.asarray(mesh.cf)[inlet.slice][:, 1]
    assert np.allclose(vals[:, 0], 4 * y * (1 - y), atol=1e-6)
    assert np.allclose(vals[:, 1:], 0.0, atol=1e-12)
