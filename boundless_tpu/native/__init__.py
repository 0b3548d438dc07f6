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
    """Compile (if needed) and load lib<name>.so from `sources`.

    Built into a /tmp cache keyed by source hash: executing shared objects
    from the (possibly network/overlay-backed) repo directory measured
    ~50x slower than from local tmpfs.
    """
    import hashlib
    import tempfile

    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        srcs = [os.path.join(_DIR, s) for s in sources]
        h = hashlib.sha256()
        for s in srcs:
            with open(s, "rb") as f:
                h.update(f.read())
        cache_dir = os.path.join(tempfile.gettempdir(), "bt_native")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir,
                               f"lib{name}-{h.hexdigest()[:16]}.so")
        if not os.path.exists(so_path):
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                   "-o", so_path] + srcs
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        _LIBS[name] = lib
        return lib


def witness_lib():
    return load("bt_witness", ["witness_gen.cpp"])


def executor_lib():
    return load("bt_executor", ["executor.cpp"])
