"""attachDetach topology modifier (mesh/topo.py build(detach_planes=)
+ solvers/apps._pimple_attach_detach; reference:
src/dynamicMesh/attachDetach/ under topoChangerFvMesh — VERDICT r4
missing #3 / next #7, polyTopoChange stage 2).

Oracles: (1) the detached build has identical cells and a coincident
wall pair; (2) the attachDuct tutorial runs through detach->attach
events: flow develops, stops while the gate is detached (zero flux
through the gate plane), then re-establishes after re-attachment;
fields carry across events by identity (conservative)."""

import os
import shutil

import numpy as np
import pytest

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_build_detached_topology():
    from foamtpu.core.dictionary import parse_string
    from foamtpu.mesh import blockmesh
    from foamtpu.mesh import topo as topo_mod

    pm0 = blockmesh.generate(parse_string("""
vertices (
    (0 0 0) (2 0 0) (2 0.5 0) (0 0.5 0)
    (0 0 0.1) (2 0 0.1) (2 0.5 0.1) (0 0.5 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (8 4 1) simpleGrading (1 1 1) );
boundary (
    inlet { type patch; faces ((0 4 7 3)); }
    outlet { type patch; faces ((2 6 5 1)); }
    walls { type wall; faces ((3 7 6 2) (1 5 4 0)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""))
    topo = topo_mod.analyze(pm0, 0)
    s = 4
    pm_a = topo_mod.build(topo, topo.planes)
    pm_d = topo_mod.build(topo, topo.planes, detach_planes=(s,))
    # identical cells
    assert pm_a.n_cells == pm_d.n_cells == pm0.n_cells
    np.testing.assert_allclose(np.sort(pm_a.v), np.sort(pm_d.v))
    np.testing.assert_allclose(pm_a.v.sum(), pm_d.v.sum())
    # the detached build: nB fewer internal faces, +2 wall patches
    nB = topo.n_base
    assert pm_d.neighbour.shape[0] == pm_a.neighbour.shape[0] - nB
    names = {p.name: p for p in pm_d.patches}
    m, sl = names[f"attach{s}Master"], names[f"attach{s}Slave"]
    assert m.type == sl.type == "wall" and m.size == sl.size == nB
    # coincident faces, opposite outward normals
    cm = pm_d.cf[m.slice]
    cs = pm_d.cf[sl.slice]
    order_m = np.lexsort(cm.T)
    order_s = np.lexsort(cs.T)
    np.testing.assert_allclose(cm[order_m], cs[order_s], atol=1e-12)
    np.testing.assert_allclose(pm_d.sf[m.slice][order_m],
                               -pm_d.sf[sl.slice][order_s], atol=1e-12)
    # per-cell closure still exact
    acc = np.zeros((pm_d.n_cells, 3))
    np.add.at(acc, pm_d.owner, pm_d.sf)
    np.add.at(acc, pm_d.neighbour,
              -pm_d.sf[:pm_d.neighbour.shape[0]])
    assert np.abs(acc).max() < 1e-13


def _gate_flux(pm, phi, x_gate=1.0):
    """Net flux through internal faces on the gate plane."""
    nIf = pm.neighbour.shape[0]
    on = (np.abs(pm.cf[:nIf, 0] - x_gate) < 1e-9) \
        & (np.abs(pm.sf[:nIf, 0]) > 1e-12)
    return on, float(np.sum(np.asarray(phi)[:nIf][on]))


def test_attachduct_tutorial(tmp_path_factory):
    from foamtpu.apps.cli import main as cli_main
    from foamtpu.core.case import Case, run_case

    src = os.path.join(REPO, "tutorials", "incompressible",
                       "pimpleDyMFoam", "attachDuct")
    d = tmp_path_factory.mktemp("attach")
    dst = os.path.join(d, "attachDuct")
    shutil.copytree(src, dst)
    assert cli_main(["blockMesh", "-case", dst]) == 0

    # phase 1: attached, flow develops (9 steps -> t=0.045, the
    # detach event fires AT step 10)
    case = run_case(dst, max_steps=9)
    st = case.final_state
    pm = case.poly_mesh
    on, q1 = _gate_flux(pm, st["phi"])
    assert on.sum() == 10            # 10 base faces on the gate plane
    assert q1 > 1e-4, f"no through-flow while attached: {q1}"
    u1 = np.asarray(st["U"].data)
    assert np.isfinite(u1).all()

    # phase 2: run into the detached window (25 steps -> t=0.125;
    # detach fired at step 10)
    case = run_case(dst, max_steps=25)
    st = case.final_state
    pm = case.poly_mesh
    names = {p.name: p for p in pm.patches}
    assert any(n.startswith("attach") for n in names), \
        f"gate did not detach: {sorted(names)}"
    gate = next(p for n, p in names.items() if n.endswith("Master"))
    phi = np.asarray(st["phi"])
    # wall pair: identically zero flux through the gate
    assert np.abs(phi[gate.slice]).max() < 1e-12
    # flow decays toward rest against the closed gate
    u2 = np.asarray(st["U"].data)
    assert np.isfinite(u2).all()
    assert np.abs(u2[:, 0]).mean() < 0.5 * np.abs(u1[:, 0]).mean() + 1e-9

    # phase 3: full run through re-attachment (50 steps to t=0.25)
    case = run_case(dst, max_steps=50)
    st = case.final_state
    pm = case.poly_mesh
    assert not any(p.name.startswith("attach") for p in pm.patches), \
        "gate did not re-attach"
    on, q3 = _gate_flux(pm, st["phi"])
    assert q3 > 1e-4, f"flow did not re-establish after attach: {q3}"
    u3 = np.asarray(st["U"].data)
    assert np.isfinite(u3).all()
    # pressure-driven duct: forward bulk flow
    assert u3[:, 0].mean() > 0.03
