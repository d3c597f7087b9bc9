"""Sampling/post function objects (reference: src/sampling/,
src/postProcessing/functionObjects/{utilities,field}/)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.apps.cases import make_cavity
from foamtpu.core.dictionary import parse_string
from foamtpu.solvers import piso


class _FakeCase:
    def __init__(self, mesh, tmpdir):
        self.mesh = mesh
        self.dir = str(tmpdir)

    def transport_properties(self):
        from foamtpu.core.dictionary import parse_string

        return parse_string("nu nu [0 2 -1 0 0 0 0] 0.01;")


def _run_cavity(n=16, steps=5):
    mesh, state, cfg = make_cavity(n)
    step = jax.jit(lambda s, d: piso.piso_step(mesh, s, d, cfg))
    dt = jnp.asarray(0.005, mesh.v.dtype)
    for _ in range(steps):
        state, _ = step(state, dt)
    return mesh, state


def test_yplus_and_wall_shear(tmp_path):
    from foamtpu.functionobjects.sampling import WallShearStress, YPlus

    mesh, state = _run_cavity()
    case = _FakeCase(mesh, tmp_path)
    spec = parse_string("type yPlus;")
    yp = YPlus("yp", spec, case)
    yp.execute("0.025", state)
    lines = open(yp.path).read().strip().splitlines()
    # header + one line per wall patch (movingWall + fixedWalls)
    assert len(lines) == 3
    vals = [float(x) for x in lines[1].split()[2:]]
    assert all(np.isfinite(vals)) and vals[1] >= vals[0] >= 0.0

    ws = WallShearStress("ws", parse_string("type wallShearStress;"), case)
    ws.execute("0.025", state)
    wl = open(ws.path).read().strip().splitlines()
    assert len(wl) == 3
    # the moving lid drives a real shear
    mx = max(float(l.split()[3]) for l in wl[1:])
    assert mx > 1e-6


def test_sampled_line_set(tmp_path):
    from foamtpu.functionobjects.sampling import SampledSets

    mesh, state = _run_cavity()
    case = _FakeCase(mesh, tmp_path)
    spec = parse_string("""
type sets;
fields (U p);
sets
{
    centreline { type uniform; start (0.05 0.0 0.005);
                 end (0.05 0.1 0.005); nPoints 20; }
}
""")
    so = SampledSets("lines", spec, case)
    so.execute("0.025", state)
    out = os.path.join(case.dir, "postProcessing", "lines", "0.025",
                       "centreline_U_p.xy")
    arr = np.loadtxt(out)
    assert arr.shape == (20, 5)  # dist + U(3) + p
    # the vertical centreline through the cavity: Ux near the lid (last
    # point) is larger than at the bottom
    assert arr[-1, 1] > arr[0, 1]


def test_streamlines(tmp_path):
    from foamtpu.functionobjects.sampling import StreamLine

    mesh, state = _run_cavity(steps=10)
    case = _FakeCase(mesh, tmp_path)
    spec = parse_string("""
type streamLine;
lifeTime 50;
seedSampleSet { type uniform; start (0.02 0.09 0.005);
                end (0.08 0.09 0.005); nPoints 3; }
""")
    so = StreamLine("sl", spec, case)
    so.execute("0.025", state)
    arr = np.loadtxt(os.path.join(case.dir, "postProcessing", "sl",
                                  "0.025", "tracks.xy"))
    assert arr.shape[1] == 4
    # tracks actually moved: multiple points per seed, finite coords
    assert arr.shape[0] > 6
    assert np.isfinite(arr).all()
    # near-lid seeds get advected in +x by the moving wall
    t0 = arr[arr[:, 0] == 0]
    assert t0[-1, 1] > t0[0, 1]
