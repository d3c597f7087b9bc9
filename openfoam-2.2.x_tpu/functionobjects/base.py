"""functionObjects: per-timestep hooks.

Reference: src/OpenFOAM/db/functionObjects/ (functionObjectList driven
by the `functions {}` block in controlDict) +
src/postProcessing/functionObjects/. Each object computes on-device
quantities from the solver state and writes series files under
postProcessing/<name>/ in the reference's layout."""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List

from ..core.dictionary import FoamDict

_TYPES: Dict[str, Callable] = {}


def register(name: str, cls) -> None:
    _TYPES[name] = cls


class FunctionObject:
    def __init__(self, name: str, spec: FoamDict, case):
        self.name = name
        self.spec = spec
        self.case = case
        self.out_dir = os.path.join(case.dir, "postProcessing", name)
        os.makedirs(self.out_dir, exist_ok=True)

    def execute(self, time_name: str, state: Dict) -> None:  # pragma: no cover
        raise NotImplementedError


class FunctionObjectList:
    def __init__(self, objects: List[FunctionObject]):
        self.objects = objects

    def execute(self, time_name: str, state: Dict) -> None:
        for obj in self.objects:
            try:
                obj.execute(time_name, state)
            except Exception as e:  # keep the run alive, as the reference does
                print(f"functionObject {obj.name}: {e}")


def make_function_objects(case) -> FunctionObjectList:
    """Build from controlDict `functions {}` (reference: functionObjectList)."""
    from . import (field, forces, misc, probes, sampling,  # noqa: F401
                   surfaces, values)

    objs: List[FunctionObject] = []
    fns = case.control_dict.get("functions")
    if isinstance(fns, FoamDict):
        for name, spec in fns.items():
            if not isinstance(spec, FoamDict):
                continue
            t = str(spec.get("type", ""))
            if t in _TYPES:
                objs.append(_TYPES[t](str(name), spec, case))
            else:
                print(f"functionObjects: unknown type {t!r} for {name!r} "
                      "(skipped)")
    return FunctionObjectList(objs)
