"""Load the reference's pure-PyTorch marching tetrahedra as a test oracle.

The reference implementation (reference:
prim3d/utility/marching_tetrahedras.py) is pure torch — no compiled extension
— so we can import the module file straight from the read-only mount and use
it as an independent golden implementation. Nothing is copied into this repo.
"""
from __future__ import annotations

import importlib.util

_REF = "/root/reference/prim3d/utility/marching_tetrahedras.py"


def load_reference_mt():
    import os

    if not os.path.exists(_REF):  # reference checkout absent: skip, not fail
        import pytest

        pytest.skip("reference torch MT oracle not available at " + _REF)
    spec = importlib.util.spec_from_file_location("ref_mt", _REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.marching_tetrahedras
