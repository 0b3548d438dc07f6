"""Native (C++) components, loaded via ctypes.

The build image has no pybind11; we compile small shared libraries with
g++ at first use and bind them with ctypes (SURVEY.md §2.4: C++ required
for the hot host loops — witness generation here; the executor port and
bincode-compatible serialization are staged next).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(__file__)
_LOCK = threading.Lock()
_LIBS: dict = {}


def load(name: str, sources):
    """Compile (if needed) and load lib<name>.so from `sources`."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        so_path = os.path.join(_DIR, f"lib{name}.so")
        srcs = [os.path.join(_DIR, s) for s in sources]
        newest = max(os.path.getmtime(s) for s in srcs)
        if not os.path.exists(so_path) or os.path.getmtime(so_path) < newest:
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                   "-o", so_path] + srcs
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        _LIBS[name] = lib
        return lib


def witness_lib():
    return load("bt_witness", ["witness_gen.cpp"])
