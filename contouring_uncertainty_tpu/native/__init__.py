"""Native (C++) runtime components, driven via ctypes.

Built on first use with g++ (cached as a .so beside the sources). Every
component has a pure-Python fallback so the framework works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

_NATIVE_DIR = Path(__file__).parent


def build_library(name: str, sources: list[str]) -> Optional[ctypes.CDLL]:
    """Compile (if needed) and dlopen a shared library from native/ sources."""
    so_path = _NATIVE_DIR / f"lib{name}.so"
    srcs = [_NATIVE_DIR / s for s in sources]
    if not so_path.exists() or any(s.stat().st_mtime > so_path.stat().st_mtime for s in srcs):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
               "-o", str(so_path)] + [str(s) for s in srcs]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as exc:
            print(f"[native] build of {name} failed ({exc}); using Python fallback")
            return None
    try:
        return ctypes.CDLL(str(so_path))
    except OSError:
        return None
