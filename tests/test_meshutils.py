"""Round-3 utility batch: topoSet, createPatch, extrudeMesh,
refineMesh, changeDictionary, gmshToFoam (reference:
applications/utilities/mesh/{manipulation,conversion,generation}/ +
preProcessing/changeDictionary/)."""

import os

import numpy as np
import pytest

from foamtpu.apps import meshutils
from foamtpu.apps.cli import main
from foamtpu.core.dictionary import parse_string
from foamtpu.io import polymesh as mesh_io
from foamtpu.mesh import blockmesh
from foamtpu.mesh.check import check

HDR = 'FoamFile { version 2.0; format ascii; class %s; object %s; }\n'

BOX = """
convertToMeters 1;
vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
           (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
blocks ( hex (0 1 2 3 4 5 6 7) (8 8 8) simpleGrading (1 1 1) );
boundary (
  inlet  { type patch; faces ((0 4 7 3)); }
  outlet { type patch; faces ((2 6 5 1)); }
  walls  { type wall; faces ((1 5 4 0) (3 7 6 2) (0 3 2 1) (4 5 6 7)); }
);
"""


def _case(tmp_path):
    case = str(tmp_path / "c")
    os.makedirs(case + "/system", exist_ok=True)
    pm = blockmesh.generate(parse_string(BOX))
    mesh_io.write(pm, os.path.join(case, "constant", "polyMesh"))
    return case


def test_toposet_box_cylinder_and_faceset(tmp_path):
    case = _case(tmp_path)
    with open(case + "/system/topoSetDict", "w") as f:
        f.write(HDR % ("dictionary", "topoSetDict") + """
actions
(
    { name lower; type cellSet; action new; source boxToCell;
      sourceInfo { box (0 0 0) (1 0.5 1); } }
    { name lower; type cellSet; action subtract; source boxToCell;
      sourceInfo { box (0 0 0) (0.5 0.5 1); } }
    { name inletFaces; type faceSet; action new; source patchToFace;
      sourceInfo { name inlet; } }
);
""")
    names = meshutils.topo_set(case)
    assert names == ["lower", "lower", "inletFaces"]
    cells = meshutils.read_set(case, "lower")
    pm = mesh_io.read(os.path.join(case, "constant", "polyMesh"))
    c = pm.c[cells]
    assert (c[:, 1] < 0.5).all() and (c[:, 0] > 0.5).all()
    assert cells.shape[0] == 4 * 4 * 8  # x>0.5, y<0.5, all z
    faces = meshutils.read_set(case, "inletFaces")
    assert faces.shape[0] == 64


def test_createpatch_from_faceset(tmp_path):
    case = _case(tmp_path)
    with open(case + "/system/topoSetDict", "w") as f:
        f.write(HDR % ("dictionary", "topoSetDict") + """
actions
(
    { name lowWall; type faceSet; action new; source boxToFace;
      sourceInfo { box (-0.1 -0.1 -0.1) (1.1 0.001 1.1); } }
);
""")
    meshutils.topo_set(case)
    with open(case + "/system/createPatchDict", "w") as f:
        f.write(HDR % ("dictionary", "createPatchDict") + """
patches
(
    { name lowerWall; patchInfo { type wall; }
      constructFrom set; set lowWall; }
);
""")
    out = meshutils.create_patch(case)
    names = [p.name for p in out.patches]
    assert "lowerWall" in names
    lw = out.patch("lowerWall")
    assert lw.size == 64
    check(out, verbose=False)
    # bottom faces all at y=0
    assert np.allclose(out.cf[lw.slice][:, 1], 0.0, atol=1e-12)


def test_extrude_mesh_linear_normal(tmp_path):
    case = _case(tmp_path)
    with open(case + "/system/extrudeMeshDict", "w") as f:
        f.write(HDR % ("dictionary", "extrudeMeshDict") + """
constructFrom patch;
sourcePatch outlet;
extrudeModel linearNormal;
nLayers 4;
linearNormalCoeffs { thickness 0.2; }
""")
    out = meshutils.extrude_mesh(case)
    assert out.n_cells == 64 * 4
    check(out, verbose=False)
    assert abs(out.v.sum() - 1.0 * 1.0 * 0.2) < 1e-9
    names = [p.name for p in out.patches]
    assert names == ["bottom", "top", "sides"]


def test_refine_mesh_cellset(tmp_path):
    case = _case(tmp_path)
    with open(case + "/system/topoSetDict", "w") as f:
        f.write(HDR % ("dictionary", "topoSetDict") + """
actions
(
    { name fine; type cellSet; action new; source sphereToCell;
      sourceInfo { centre (0.5 0.5 0.5); radius 0.3; } }
);
""")
    meshutils.topo_set(case)
    n_set = meshutils.read_set(case, "fine").shape[0]
    out = meshutils.refine_mesh(case, "fine")
    assert out.n_cells == 512 - n_set + 8 * n_set
    check(out, verbose=False)
    assert abs(out.v.sum() - 1.0) < 1e-9


def test_change_dictionary(tmp_path):
    case = _case(tmp_path)
    os.makedirs(case + "/0", exist_ok=True)
    with open(case + "/0/U", "w") as f:
        f.write(HDR % ("volVectorField", "U") + """
dimensions [0 1 -1 0 0 0 0];
internalField uniform (0 0 0);
boundaryField
{
    inlet  { type fixedValue; value uniform (1 0 0); }
    outlet { type zeroGradient; }
    walls  { type fixedValue; value uniform (0 0 0); }
}
""")
    with open(case + "/system/changeDictionaryDict", "w") as f:
        f.write(HDR % ("dictionary", "changeDictionaryDict") + """
dictionaryReplacement
{
    U
    {
        boundaryField
        {
            inlet { type fixedValue; value uniform (2 0 0); }
            walls { type slip; }
        }
    }
}
""")
    changed = meshutils.change_dictionary(case)
    assert changed
    from foamtpu.core.dictionary import parse_file

    u = parse_file(case + "/0/U")
    bf = u["boundaryField"]
    assert str(bf["inlet"]["type"]) == "fixedValue"
    assert np.allclose(np.asarray(bf["inlet"]["value"][-1]).ravel()[:3],
                       [2, 0, 0])
    assert str(bf["walls"]["type"]) == "slip"
    assert str(bf["outlet"]["type"]) == "zeroGradient"


GMSH_TET_BOX = None  # generated below


def _gmsh_box(path):
    """Hand-built MSH2 file: unit cube split into 6 tets."""
    pts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
           (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
    # 6-tet decomposition of the cube (Kuhn)
    tets = [(0, 1, 2, 6), (0, 2, 3, 6), (0, 3, 7, 6),
            (0, 7, 4, 6), (0, 4, 5, 6), (0, 5, 1, 6)]
    # boundary triangles: each cube face split into 2 consistent with
    # the tets; just emit all boundary tris of the tets
    import itertools

    cnt = {}
    for t in tets:
        for tri in itertools.combinations(t, 3):
            k = tuple(sorted(tri))
            cnt[k] = cnt.get(k, 0) + 1
    btris = [k for k, v in cnt.items() if v == 1]
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        f.write("$PhysicalNames\n1\n2 1 \"walls\"\n$EndPhysicalNames\n")
        f.write(f"$Nodes\n{len(pts)}\n")
        for i, p in enumerate(pts):
            f.write(f"{i+1} {p[0]} {p[1]} {p[2]}\n")
        f.write("$EndNodes\n$Elements\n")
        f.write(f"{len(tets)+len(btris)}\n")
        eid = 1
        for tri in btris:
            f.write(f"{eid} 2 2 1 1 " +
                    " ".join(str(i + 1) for i in tri) + "\n")
            eid += 1
        for t in tets:
            f.write(f"{eid} 4 2 0 1 " +
                    " ".join(str(i + 1) for i in t) + "\n")
            eid += 1
        f.write("$EndElements\n")


def test_gmsh_to_foam_tet_cube(tmp_path):
    case = str(tmp_path / "g")
    os.makedirs(case + "/system", exist_ok=True)
    msh = str(tmp_path / "box.msh")
    _gmsh_box(msh)
    assert main(["gmshToFoam", msh, "-case", case]) == 0
    pm = mesh_io.read(case + "/constant/polyMesh")
    assert pm.n_cells == 6
    check(pm, verbose=False)
    assert abs(pm.v.sum() - 1.0) < 1e-12
    assert pm.patches[0].name == "walls"
    assert pm.patches[0].size == 12


def test_tet_mesh_icofoam_runs(tmp_path):
    """End-to-end: an unstructured TET mesh (gmshToFoam) runs icoFoam —
    the genuinely-unstructured fodder the COO-fallback path needs."""
    case = str(tmp_path / "g")
    os.makedirs(case + "/system", exist_ok=True)
    os.makedirs(case + "/0", exist_ok=True)
    msh = str(tmp_path / "box.msh")
    _gmsh_box(msh)
    assert main(["gmshToFoam", msh, "-case", case]) == 0
    with open(case + "/system/controlDict", "w") as f:
        f.write(HDR % ("dictionary", "controlDict") + """
application icoFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 1; deltaT 0.01;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    with open(case + "/system/fvSchemes", "w") as f:
        f.write(HDR % ("dictionary", "fvSchemes") + """
ddtSchemes { default Euler; } gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; } snGradSchemes { default orthogonal; }
""")
    with open(case + "/system/fvSolution", "w") as f:
        f.write(HDR % ("dictionary", "fvSolution") + """
solvers {
  p { solver PCG; preconditioner diagonal; tolerance 1e-7; relTol 0; }
  U { solver PBiCGStab; tolerance 1e-7; relTol 0; maxIter 200; }
}
PISO { nCorrectors 2; }
""")
    with open(case + "/0/U", "w") as f:
        f.write(HDR % ("volVectorField", "U") + """
dimensions [0 1 -1 0 0 0 0];
internalField uniform (0 0 0);
boundaryField { walls { type fixedValue; value uniform (0 0 0); } }
""")
    with open(case + "/0/p", "w") as f:
        f.write(HDR % ("volScalarField", "p") + """
dimensions [0 2 -2 0 0 0 0];
internalField uniform 0;
boundaryField { walls { type zeroGradient; } }
""")
    with open(case + "/constant/transportProperties", "w") as f:
        f.write(HDR % ("dictionary", "transportProperties")
                + "nu nu [0 2 -1 0 0 0 0] 0.01;\n")
    from foamtpu.core.case import run_case

    c = run_case(case, max_steps=3)
    U = np.asarray(c.final_state["U"].data)
    assert np.isfinite(U).all()


def test_region_split_two_blocks(tmp_path):
    """Two disconnected blocks -> 2 regions with cellSets written
    (reference: meshTools/regionSplit + splitMeshRegions)."""
    case = str(tmp_path / "r")
    os.makedirs(case + "/system", exist_ok=True)
    pm = blockmesh.generate(parse_string("""
convertToMeters 1;
vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
           (0 0 1) (1 0 1) (1 1 1) (0 1 1)
           (2 0 0) (3 0 0) (3 1 0) (2 1 0)
           (2 0 1) (3 0 1) (3 1 1) (2 1 1) );
blocks ( hex (0 1 2 3 4 5 6 7) (4 4 4) simpleGrading (1 1 1)
         hex (8 9 10 11 12 13 14 15) (3 3 3) simpleGrading (1 1 1) );
boundary ( walls { type wall; faces (
  (0 4 7 3) (2 6 5 1) (1 5 4 0) (3 7 6 2) (0 3 2 1) (4 5 6 7)
  (8 12 15 11) (10 14 13 9) (9 13 12 8) (11 15 14 10) (8 11 10 9)
  (12 13 14 15) ); } );
"""))
    mesh_io.write(pm, os.path.join(case, "constant", "polyMesh"))
    from foamtpu.apps import meshutils as mu

    labels = mu.region_split(pm)
    assert labels.max() == 1
    assert (labels == 0).sum() == 64 and (labels == 1).sum() == 27
    assert main(["splitMeshRegions", "-case", case]) == 0
    r0 = mu.read_set(case, "region0")
    r1 = mu.read_set(case, "region1")
    assert len(r0) == 64 and len(r1) == 27
