"""polyTopoChange layerAdditionRemoval (reference:
src/dynamicMesh/polyTopoChange/polyTopoChanger/layerAdditionRemoval +
src/engine/engineMesh layered motion): host-side re-extrusion between
jitted chunks, exact conservative slab remap (mesh/topo.py)."""

import os
import shutil

import numpy as np
import pytest

from foamtpu.core.dictionary import parse_string
from foamtpu.mesh import blockmesh
from foamtpu.mesh import topo as topo_mod

BOX = """
convertToMeters 1;
vertices
(
    (0 0 0) (0.05 0 0) (0.05 0.1 0) (0 0.1 0)
    (0 0 0.005) (0.05 0 0.005) (0.05 0.1 0.005) (0 0.1 0.005)
);
blocks ( hex (0 1 2 3 4 5 6 7) (6 10 1) simpleGrading (1 1 1) );
boundary
(
    piston { type wall; faces ((1 5 4 0)); }
    head   { type wall; faces ((3 7 6 2)); }
    liner  { type wall; faces ((0 4 7 3) (2 6 5 1)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def _mesh():
    return blockmesh.generate(parse_string(BOX))


def test_analyze_layers():
    pm = _mesh()
    topo = topo_mod.analyze(pm, axis=1)
    assert topo.n_slabs == 10
    assert topo.n_base == 6
    np.testing.assert_allclose(topo.planes,
                               np.linspace(0.0, 0.1, 11), atol=1e-12)
    # bijection checked inside analyze; spot check patch classification
    names = [n for n, _ in topo.patch_defs]
    assert names == ["piston", "head", "liner", "frontAndBack"]
    assert (topo.bottom_patch == names.index("piston")).all()
    assert (topo.top_patch == names.index("head")).all()


def test_rebuild_identity():
    """build() over the original planes reproduces the mesh geometry
    (up to cell/face renumbering): same total volume, same per-patch
    areas, valid addressing."""
    pm = _mesh()
    topo = topo_mod.analyze(pm, axis=1)
    pm2 = topo_mod.build(topo, topo.planes)
    assert pm2.n_cells == pm.n_cells
    assert np.isclose(pm2.v.sum(), pm.v.sum(), rtol=1e-12)
    for p in pm.patches:
        p2 = pm2.patch(p.name)
        assert p2.size == p.size
        a1 = np.linalg.norm(pm.sf[p.slice], axis=1).sum()
        a2 = np.linalg.norm(pm2.sf[p2.slice], axis=1).sum()
        assert np.isclose(a1, a2, rtol=1e-12), p.name
    # owner-ordered upper-triangular addressing
    nif = pm2.n_internal_faces
    assert (pm2.owner[:nif] <= pm2.neighbour[:nif]).all()
    assert (np.diff(pm2.owner[:nif]) >= 0).all()
    assert (pm2.v > 0).all()


def test_layer_ar_decisions():
    planes = np.asarray([0.0, 0.01, 0.02, 0.03])
    # squeeze below 0.5*h0 -> merge
    p2, ch = topo_mod.layer_ar(planes, 0.006, h0=0.01, side=0)
    assert ch and p2.shape[0] == 3 and p2[0] == 0.006
    np.testing.assert_allclose(p2, [0.006, 0.02, 0.03])
    # stretch above 1.5*h0 -> split
    p3, ch = topo_mod.layer_ar(planes, -0.006, h0=0.01, side=0)
    assert ch and p3.shape[0] == 5
    np.testing.assert_allclose(p3, [-0.006, 0.004, 0.01, 0.02, 0.03])
    # in-band -> move only
    p4, ch = topo_mod.layer_ar(planes, 0.002, h0=0.01, side=0)
    assert not ch
    np.testing.assert_allclose(p4, [0.002, 0.01, 0.02, 0.03])
    # mirrored side
    p5, ch = topo_mod.layer_ar(planes, 0.036, h0=0.01, side=-1)
    assert ch and p5.shape[0] == 5
    np.testing.assert_allclose(p5, [0.0, 0.01, 0.02, 0.026, 0.036])


def test_remap_conservation():
    """Slab remap conserves the column integral exactly for both the
    merge and the split."""
    rng = np.random.default_rng(3)
    old = np.asarray([0.0, 0.013, 0.02, 0.03, 0.04])
    new = np.asarray([0.0, 0.02, 0.03, 0.04])        # merge bottom two
    W = topo_mod.slab_overlap_matrix(old, new)
    nB = 7
    f = rng.random((old.shape[0] - 1) * nB)
    g = topo_mod.remap_cells(W, nB, f)
    h_old = np.repeat(np.diff(old), nB)
    h_new = np.repeat(np.diff(new), nB)
    np.testing.assert_allclose((g * h_new).sum(), (f * h_old).sum(),
                               rtol=1e-14)
    # split: every new value within the old bounds per column
    new2 = np.asarray([0.0, 0.005, 0.013, 0.02, 0.03, 0.04])
    W2 = topo_mod.slab_overlap_matrix(old, new2)
    g2 = topo_mod.remap_cells(W2, nB, f)
    h2 = np.repeat(np.diff(new2), nB)
    np.testing.assert_allclose((g2 * h2).sum(), (f * h_old).sum(),
                               rtol=1e-14)
    # vector remap too
    v = rng.random(((old.shape[0] - 1) * nB, 3))
    gv = topo_mod.remap_cells(W, nB, v)
    np.testing.assert_allclose((gv * h_new[:, None]).sum(0),
                               (v * h_old[:, None]).sum(0), rtol=1e-13)


def test_engine_layer_ar_run(tmp_path):
    """coldEngineFoam with pistonLayers: nCells CHANGES during the
    compression and total mass is conserved across topology events
    (the VERDICT r3 polyTopoChange acceptance case)."""
    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tutorials", "combustion",
        "coldEngineFoam", "layeredCylinder")
    dst = str(tmp_path / "layeredCylinder")
    shutil.copytree(src, dst)
    from foamtpu.apps.cli import main as cli_main

    assert cli_main(["blockMesh", "-case", dst]) == 0
    from foamtpu.core.case import run_case

    case = run_case(dst)
    fs = case.final_state
    assert fs["n_events"] >= 2, "no topology events fired"
    assert fs["n_cells"] != 6 * 10, "cell count never changed"
    st, diag = fs["state"], fs["diag"]
    # mass conservation across remaps + ALE steps
    m0 = 1e5 / (287.0 * 300.0) * (0.05 * 0.1 * 0.005)
    m1 = float(diag["mass"])
    assert abs(m1 - m0) / m0 < 5e-3, (m0, m1)
    # compression must have raised mean p and T monotonically vs start
    assert float(diag["p_mean"]) > 1.2e5
    assert float(diag["T_mean"]) > 310.0
    assert np.isfinite(np.asarray(st["U"].data)).all()
