import numpy as np
import pytest

from foamtpu.core.dictionary import (
    FoamDict,
    Word,
    dimensioned_scalar,
    parse_string,
    write_string,
)
from foamtpu.core.dimensions import DimensionSet


CONTROL_DICT = """
/*--------------------------------*- C++ -*----------------------------------*\\
| comment block                                                               |
\\*---------------------------------------------------------------------------*/
FoamFile
{
    version     2.0;
    format      ascii;
    class       dictionary;
    object      controlDict;
}
// * * * * * * * * * * //

application     icoFoam;

startFrom       startTime;
startTime       0;
stopAt          endTime;
endTime         0.5;
deltaT          0.005;
writeControl    timeStep;
writeInterval   20;
purgeWrite      0;
writeFormat     ascii;
writePrecision  6;
writeCompression off;
timeFormat      general;
timePrecision   6;
runTimeModifiable true;
"""


def test_controldict():
    d = parse_string(CONTROL_DICT)
    assert d["application"] == "icoFoam"
    assert d["endTime"] == 0.5
    assert d["deltaT"] == 0.005
    assert d["writeInterval"] == 20
    assert d["FoamFile"]["class"] == "dictionary"


def test_fvschemes_keys():
    d = parse_string(
        """
ddtSchemes { default Euler; }
gradSchemes { default "Gauss linear"; grad(p) Gauss linear; }
divSchemes { default none; div(phi,U) Gauss linearUpwind grad(U); }
laplacianSchemes { default Gauss linear corrected; }
"""
    )
    assert d["ddtSchemes"]["default"] == "Euler"
    assert d["divSchemes"]["div(phi,U)"] == [
        Word("Gauss"),
        Word("linearUpwind"),
        Word("grad(U)"),
    ]
    assert d["laplacianSchemes"]["default"] == [
        Word("Gauss"),
        Word("linear"),
        Word("corrected"),
    ]


def test_dimensioned_and_vectors():
    d = parse_string(
        """
nu              nu [0 2 -1 0 0 0 0] 0.01;
g               (0 -9.81 0);
value           uniform (1 2 3);
"""
    )
    dims, v = dimensioned_scalar(d["nu"][1:])
    assert v == 0.01
    assert dims == DimensionSet.of(0, 2, -1)
    np.testing.assert_allclose(d["g"], [0, -9.81, 0])
    assert d["value"][0] == "uniform"
    np.testing.assert_allclose(d["value"][1], [1, 2, 3])


def test_nested_and_lists():
    d = parse_string(
        """
solvers
{
    p
    {
        solver          PCG;
        preconditioner  DIC;
        tolerance       1e-06;
        relTol          0;
    }
    U { solver smoothSolver; smoother symGaussSeidel; tolerance 1e-05; relTol 0; }
}
PISO { nCorrectors 2; nNonOrthogonalCorrectors 0; }
"""
    )
    p = d["solvers"]["p"]
    assert p["solver"] == "PCG"
    assert p["tolerance"] == 1e-06
    assert d["PISO"]["nCorrectors"] == 2


def test_sized_list_and_nonuniform():
    d = parse_string(
        """
internalField   nonuniform List<scalar>
4
(
1.0 2.0 3.5 4.25
)
;
faces 2 ((0 1 2 3) (4 5 6 7));
"""
    )
    field = d["internalField"]
    assert field[0] == "nonuniform"
    assert field[1] == "List<scalar>"
    np.testing.assert_allclose(field[2], [1.0, 2.0, 3.5, 4.25])
    f = d["faces"]
    assert isinstance(f, np.ndarray) and f.shape == (2, 4)


def test_macros_and_regex_keys():
    d = parse_string(
        """
x 10;
y $x;
sub { z $x; }
boundaryField
{
    "(left|right)" { type fixedValue; value uniform 0; }
    top { type zeroGradient; }
}
"""
    )
    assert d["y"] == 10
    assert d["sub"]["z"] == 10
    bf = d["boundaryField"]
    assert bf.match("left")["type"] == "fixedValue"
    assert bf.match("top")["type"] == "zeroGradient"
    with pytest.raises(KeyError):
        bf.match("bottom")


def test_comments_and_inline():
    d = parse_string(
        """
a 1; // trailing comment
/* block
   comment */ b 2;
"""
    )
    assert d["a"] == 1 and d["b"] == 2


def test_roundtrip():
    d = FoamDict()
    d[Word("solver")] = Word("PCG")
    d[Word("tolerance")] = 1e-6
    sub = FoamDict()
    sub[Word("n")] = 3
    d[Word("inner")] = sub
    text = write_string(d, foamfile={"class": "dictionary", "object": "test"})
    d2 = parse_string(text)
    assert d2["solver"] == "PCG"
    assert d2["tolerance"] == 1e-6
    assert d2["inner"]["n"] == 3
    assert d2["FoamFile"]["object"] == "test"


def test_calc_and_codestream_values():
    """#calc arithmetic + value-position #codeStream (reference:
    functionEntries::calcEntry / codeStream)."""
    from foamtpu.core.dictionary import parse_string

    d = parse_string("""
r 0.5;
circumference #calc "2*pi*0.5";
area #calc "pi*pow(0.5, 2)";
n #codeStream { code #{ os << 6*7; #}; };
angle #calc "degToRad(180)";
""")
    import math

    assert abs(d["circumference"] - math.pi) < 1e-12
    assert abs(d["area"] - math.pi * 0.25) < 1e-12
    assert d["n"] == 42
    assert abs(d["angle"] - math.pi) < 1e-12
