"""cellZones: blockMesh tagging, polyMesh IO round-trip, device masks,
fvOptions/MRF cellZone selection, topoSet cellZoneSet (reference:
src/OpenFOAM/meshes/polyMesh/zones/cellZone/)."""

import os

import numpy as np
import pytest

from foamtpu.core.dictionary import parse_string
from foamtpu.io import polymesh as mesh_io
from foamtpu.mesh import blockmesh, to_device

TWO_BLOCK = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 0.1) (1 0 0.1) (1 1 0.1) (0 1 0.1)
    (2 0 0) (2 1 0) (2 0 0.1) (2 1 0.1)
);
blocks
(
    hex (0 1 2 3 4 5 6 7) (4 4 1) simpleGrading (1 1 1)
    hex (1 8 9 2 5 10 11 6) rotor (4 4 1) simpleGrading (1 1 1)
);
boundary
(
    walls { type wall; faces ((0 4 7 3) (8 9 11 10) (0 1 5 4) (1 8 10 5)
                              (3 7 6 2) (2 6 11 9)); }
    frontAndBack { type empty; faces ((0 3 2 1) (1 2 9 8)
                                      (4 5 6 7) (5 10 11 6)); }
);
"""


def test_blockmesh_tags_cell_zone():
    pm = blockmesh.generate(parse_string(TWO_BLOCK))
    assert "rotor" in pm.cell_zones
    ids = pm.cell_zones["rotor"]
    assert ids.shape[0] == 16
    # the rotor block is x in [1,2]
    assert (pm.c[ids][:, 0] > 1.0).all()
    other = np.setdiff1d(np.arange(pm.n_cells), ids)
    assert (pm.c[other][:, 0] < 1.0).all()


def test_polymesh_io_roundtrip_cellzones(tmp_path):
    pm = blockmesh.generate(parse_string(TWO_BLOCK))
    d = str(tmp_path / "polyMesh")
    mesh_io.write(pm, d)
    assert os.path.exists(os.path.join(d, "cellZones"))
    pm2 = mesh_io.read(d)
    np.testing.assert_array_equal(np.sort(pm2.cell_zones["rotor"]),
                                  np.sort(pm.cell_zones["rotor"]))


def test_device_mesh_masks_and_selection():
    pm = blockmesh.generate(parse_string(TWO_BLOCK))
    mesh = to_device(pm)
    assert "rotor" in mesh.cell_zone_masks
    m = np.asarray(mesh.cell_zone_masks["rotor"])
    assert m.sum() == 16

    # fvOptions selectionMode cellZone resolves the same mask
    from foamtpu.models import fvoptions

    d = parse_string("""
src { type semiImplicitSource; active true;
      semiImplicitSourceCoeffs { selectionMode cellZone; cellZone rotor;
      injectionRateSuSp { T (1 0); } } }
""")
    opts = fvoptions.from_dict(mesh, d, nu=1e-5)
    np.testing.assert_allclose(np.asarray(opts.options[0].mask), m)

    # unknown zone -> clear error
    bad = parse_string("""
src { type semiImplicitSource; active true;
      semiImplicitSourceCoeffs { selectionMode cellZone; cellZone nope;
      injectionRateSuSp { T (1 0); } } }
""")
    with pytest.raises(KeyError):
        fvoptions.from_dict(mesh, bad, nu=1e-5)


def test_mrf_zone_by_name():
    """2.2.x MRFZones entries are named after mesh cellZones."""
    pm = blockmesh.generate(parse_string(TWO_BLOCK))
    mesh = to_device(pm)
    from foamtpu.core.dictionary import FoamDict
    from foamtpu.models import mrf

    d = parse_string("""
rotor
{
    origin (1.5 0.5 0.05);
    axis (0 0 1);
    omega 10;
}
""")
    z = mrf.from_dict(mesh, d)
    assert z and z.zones[0].cell_mask.sum() == 16


def test_toposet_cellzoneset(tmp_path):
    case = str(tmp_path / "c")
    os.makedirs(os.path.join(case, "system"))
    pm = blockmesh.generate(parse_string(TWO_BLOCK))
    mesh_io.write(pm, os.path.join(case, "constant", "polyMesh"))
    with open(os.path.join(case, "system", "topoSetDict"), "w") as f:
        f.write("""
FoamFile { version 2.0; format ascii; class dictionary; object topoSetDict; }
actions
(
    { name left; type cellSet; action new; source boxToCell;
      sourceInfo { box ((-1 -1 -1) (0.5 2 2)); } }
    { name leftZone; type cellZoneSet; action new; source setToCellZone;
      sourceInfo { set left; } }
);
""")
    from foamtpu.apps.meshutils import topo_set

    names = topo_set(case)
    assert "leftZone" in names
    pm2 = mesh_io.read(os.path.join(case, "constant", "polyMesh"))
    assert "leftZone" in pm2.cell_zones
    ids = pm2.cell_zones["leftZone"]
    assert ids.shape[0] == 8          # x < 0.5 half of the left block
    assert (pm2.c[ids][:, 0] < 0.5).all()
    # blockMesh's own rotor zone survives the rewrite
    assert "rotor" in pm2.cell_zones
