"""Checkpoint/resume correctness (VERDICT r1 weak #9): a run restarted
from `latestTime` must continue the straight-through trajectory
(reference: Time::setTime + startFrom latestTime semantics)."""

import os
import shutil

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _prep(tmp, name, write_interval, end_time, fmt="binary"):
    src = os.path.join(REPO, "tutorials", "incompressible", "icoFoam",
                       "cavity")
    case = os.path.join(tmp, name)
    shutil.copytree(src, case)
    cd = os.path.join(case, "system", "controlDict")
    txt = open(cd).read()
    import re

    txt = re.sub(r"endTime\s+[\d.eE+-]+;", f"endTime {end_time};", txt)
    txt = re.sub(r"writeInterval\s+\d+;",
                 f"writeInterval {write_interval};", txt)
    txt = re.sub(r"writeFormat\s+\w+;", f"writeFormat {fmt};", txt)
    if "writeFormat" not in txt:
        txt += f"\nwriteFormat {fmt};\n"
    open(cd, "w").write(txt)
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", case]) == 0
    return case


def test_restart_matches_straight_through(tmp_path):
    from foamtpu.core.case import Case, run_case

    tmp = str(tmp_path)
    # straight-through: 20 steps
    c_ref = _prep(tmp, "ref", write_interval=20, end_time=0.1)
    run_case(c_ref, max_steps=20)
    ref = Case(c_ref)
    t_end = ref.latest_time_name()
    U_ref = np.asarray(ref.read_field("U", time=t_end).data)
    p_ref = np.asarray(ref.read_field("p", time=t_end).data)

    # split: 10 steps, then restart from latestTime for 10 more
    c2 = _prep(tmp, "split", write_interval=10, end_time=0.1)
    run_case(c2, max_steps=10)
    # flip to latestTime restart
    cd = os.path.join(c2, "system", "controlDict")
    txt = open(cd).read().replace("startFrom       startTime",
                                  "startFrom       latestTime")
    assert "latestTime" in txt
    open(cd, "w").write(txt)
    run_case(c2, max_steps=10)
    res = Case(c2)
    assert res.latest_time_name() == t_end
    U2 = np.asarray(res.read_field("U", time=t_end).data)
    p2 = np.asarray(res.read_field("p", time=t_end).data)

    # the restart re-reads U (binary: exact) but re-derives phi and
    # old-time levels, so continuation agrees to solver tolerance
    scale = np.abs(U_ref).max()
    assert np.abs(U2 - U_ref).max() < 5e-3 * scale, (
        np.abs(U2 - U_ref).max(), scale)
    assert np.abs(p2 - p_ref).max() < 5e-2 * max(np.abs(p_ref).max(),
                                                 1e-10)
