"""Run control aux subsystems: runTimeModifiable, purgeWrite,
DebugSwitches (reference: src/OpenFOAM/db/Time/ + etc/controlDict)."""

import os
import shutil

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cavity(tmp_path, extra_control=""):
    src = os.path.join(REPO, "tutorials", "incompressible", "icoFoam",
                       "cavity")
    dst = os.path.join(tmp_path, "cavity")
    shutil.copytree(src, dst)
    cd = os.path.join(dst, "system", "controlDict")
    with open(cd) as f:
        txt = f.read()
    with open(cd, "w") as f:
        f.write(txt + "\n" + extra_control + "\n")
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", dst]) == 0
    return dst


def test_run_time_modifiable_stop_at_write_now(tmp_path, monkeypatch):
    """Editing controlDict mid-run (stopAt writeNow) is picked up
    between jitted chunks and stops the run early (reference:
    Time::run + regIOobject::readIfModified)."""
    dst = _cavity(str(tmp_path), "runTimeModifiable yes;")
    from foamtpu.core.case import Case
    from foamtpu.solvers import apps as solver_apps

    # patch _log_step to edit controlDict after the 3rd step
    orig = solver_apps._log_step
    count = {"n": 0}

    def spy(case, t, diag, cumulative, extra_fields=()):
        count["n"] += 1
        if count["n"] == 3:
            cd = os.path.join(dst, "system", "controlDict")
            with open(cd) as f:
                txt = f.read()
            with open(cd, "w") as f:
                f.write(txt.replace("stopAt          endTime;",
                                    "stopAt          writeNow;"))
            os.utime(cd)
        return orig(case, t, diag, cumulative, extra_fields)

    monkeypatch.setattr(solver_apps, "_log_step", spy)
    from foamtpu.core.case import run_case

    case = run_case(dst, max_steps=50)
    assert case.time.stop_now
    assert count["n"] == 3          # stopped right after the edit
    assert case.time.index == 3


def test_purge_write_ring_buffer(tmp_path):
    """purgeWrite 2: only the last two written time directories
    survive (reference: Time::purgeWrite ring buffer)."""
    dst = _cavity(str(tmp_path),
                  "purgeWrite 2;")
    # write every step
    cd = os.path.join(dst, "system", "controlDict")
    with open(cd) as f:
        txt = f.read()
    txt = txt.replace("writeInterval   20;", "writeInterval   1;")
    txt = txt.replace("writeInterval 20;", "writeInterval 1;")
    with open(cd, "w") as f:
        f.write(txt)
    from foamtpu.core.case import run_case

    case = run_case(dst, max_steps=6)
    tdirs = sorted(d for d in os.listdir(dst)
                   if d not in ("0", "constant", "system")
                   and os.path.isdir(os.path.join(dst, d)))
    assert len(tdirs) == 2, tdirs
    # they are the two LATEST times
    assert case.time.name in tdirs


def test_debug_switches_gate(tmp_path, capsys):
    from foamtpu.core.dictionary import parse_string
    from foamtpu.utils import logging as log

    log.load_debug_switches(parse_string(
        "DebugSwitches { lduMatrix 1; fvMesh 0; }"))
    assert log.debug("lduMatrix")
    assert not log.debug("fvMesh")
    assert not log.debug("unknown")
    log.load_debug_switches()  # reset to env only
    assert not log.debug("lduMatrix")
