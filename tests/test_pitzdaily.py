"""pitzDaily (backward-facing step, kEpsilon, simpleFoam) from
unmodified case files — the reference's second headline config
(SURVEY.md §6). Oracles: mesh validity, stable convergence trend,
recirculation behind the step."""

import os
import shutil

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PITZ = os.path.join(REPO, "tutorials", "incompressible", "simpleFoam",
                    "pitzDaily")


@pytest.fixture(scope="module")
def case_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pitz")
    dst = os.path.join(d, "pitzDaily")
    shutil.copytree(PITZ, dst)
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", dst]) == 0
    return dst


def test_pitz_mesh(case_dir):
    from foamtpu.io import polymesh as mesh_io
    from foamtpu.mesh.check import check

    m = mesh_io.read(os.path.join(case_dir, "constant", "polyMesh"))
    stats = check(m)
    assert m.n_cells == (16 * 26 + 56 * 26 * 2 + 16 * 26 * 2)
    names = [p.name for p in m.patches]
    assert names[:4] == ["inlet", "outlet", "upperWall", "lowerWall"]
    assert stats["maxNonOrtho"] < 35.0


def test_pitz_simplefoam_longrun(case_dir):
    """1000 SIMPLE iterations with the unmodified tutorial config:
    stable (no blowup — r1's divergence came from the wall-distance
    accumulator bug and sign-preserving relax), bounded turbulence,
    steady jet, recirculation with a physical reattachment length
    (~6-7 step heights)."""
    from foamtpu.core.case import Case
    from foamtpu.core.dictionary import dimensioned_scalar
    from foamtpu.solvers import piso, simple
    from foamtpu.solvers.apps import _load_turbulence, _relaxation

    case = Case(case_dir)
    mesh = case.mesh
    _, nu = dimensioned_scalar(case.transport_properties()["nu"])
    U0 = case.read_field("U")
    p0 = case.read_field("p")
    model, tstate = _load_turbulence(case, nu)
    relax = _relaxation(case)
    cfg = simple.SimpleConfig(
        nu=nu, div_scheme=case.div_scheme("div(phi,U)"),
        corrected=case.laplacian_corrected(),
        grad_scheme=case.grad_scheme("grad(p)"),
        alpha_u=relax.get("U", 0.7), alpha_p=relax.get("p", 0.3),
        p_controls=case.solver_controls("p"),
        u_controls=case.solver_controls("U"),
        turb=model, turb_relax=relax.get("k", 0.7))
    chunk = simple.make_chunk(mesh, cfg, 50)
    state = piso.initial_state(mesh, U0, p0, turb_state=tstate)
    c = np.asarray(mesh.c)
    behind = (c[:, 0] > 0.0) & (c[:, 0] < 0.06) & (c[:, 1] < -0.005)
    min_ux_seen = 1e9
    ux_res = []
    for _ in range(20):  # 1000 iterations, sampled every 50
        state, diag = chunk(state)
        u = np.asarray(state["U"].data)
        assert np.isfinite(u).all(), "diverged mid-run"
        min_ux_seen = min(min_ux_seen, float(u[behind, 0].min()))
        ux_res.append(float(np.max(np.asarray(diag["Ux"].initial_residual))))

    u = np.asarray(state["U"].data)
    k = np.asarray(state["turb"]["k"].data)
    nut = np.asarray(state["turb"]["nut"].data)
    assert np.isfinite(u).all() and np.isfinite(k).all()
    assert (k > 0).all() and (nut >= 0).all()
    # steady jet: no amplification of the 10 m/s inlet
    assert np.abs(u).max() < 15.0
    # physical turbulence magnitude
    assert k.max() < 15.0
    # recirculation behind the step
    assert min_ux_seen < -0.05
    # momentum residual decays over the run (converging trend; reaches
    # ~2.6e-4 by 3600 iterations — the 1000-iter checkpoint is mid-decay)
    assert ux_res[-1] < max(ux_res[:3]) / 2
    assert ux_res[-1] < 8e-3
    # reattachment: last reversed-flow x along the bottom wall at
    # ~6-7 step heights (step h ~ 0.0254): x_r in [0.10, 0.23]
    wall = (c[:, 1] < -0.02) & (c[:, 0] > 0)
    xs = c[wall, 0]
    neg = xs[u[wall, 0] < 0]
    x_r = float(neg.max()) if neg.size else 0.0
    assert 0.10 < x_r < 0.23, f"reattachment x={x_r}"
    # turbulence developed in the shear layer
    assert nut.max() > 20 * 1e-5
