"""Native JIT driver: compile generated C/C++ with g++ and load via ctypes.

The rebuild of the reference's ``tensorflow_jit.py`` (SURVEY.md §2.1 #11):
flag assembly, ``subprocess`` g++ ``-shared -fPIC -O3``, content-hash
filenames with an on-disk cache (skip compile on hit), and loading — here
``ctypes.CDLL`` instead of ``tf.load_op_library`` (that variant lives in
backends/_tensorflow_native.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional, Sequence

logger = logging.getLogger(__name__)

__all__ = ["cache_dir", "compile_shared_library", "compile_and_load", "link"]

_DEFAULT_FLAGS = ["-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
                  "-ffast-math", "-std=c++17", "-x", "c++"]


def cache_dir() -> Path:
    root = os.environ.get("PYSTENCILS_ADTPU_CACHE",
                          os.path.join(os.path.expanduser("~"), ".cache",
                                       "pystencils_autodiff_tpu"))
    p = Path(root)
    p.mkdir(parents=True, exist_ok=True)
    return p


def _content_hash(*parts: str) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(p.encode())
    return h.hexdigest()[:16]


def compile_shared_library(source: str, name_hint: str = "kernel",
                           extra_flags: Sequence[str] = (),
                           compiler: str = "g++",
                           base_flags: Optional[Sequence[str]] = None,
                           post_flags: Sequence[str] = ()) -> Path:
    """Compile C/C++ source to a cached .so; returns its path.

    ``post_flags`` are placed *after* the source file on the command line —
    required for ``-l`` library flags, which GNU ld resolves left-to-right
    (a library named before any object that references it is discarded and
    the .so gets no DT_NEEDED entry, failing only at dlopen time).
    """
    flags = list(_DEFAULT_FLAGS if base_flags is None else base_flags) \
        + list(extra_flags)
    key = _content_hash(source, " ".join(flags), " ".join(post_flags), compiler)
    so_path = cache_dir() / f"{name_hint}_{key}.so"
    if so_path.exists():
        logger.debug("jit cache hit: %s", so_path)
        return so_path
    with tempfile.TemporaryDirectory() as td:
        src_path = Path(td) / f"{name_hint}.cpp"
        src_path.write_text(source)
        cmd = [compiler, *flags, str(src_path), *post_flags,
               "-o", str(so_path) + ".tmp"]
        logger.debug("jit compile: %s", " ".join(cmd))
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(
                f"native compilation failed:\n{proc.stderr}\n--- source ---\n"
                + "\n".join(f"{i+1:4d} {l}" for i, l in
                            enumerate(source.splitlines())))
        os.replace(str(so_path) + ".tmp", so_path)
    return so_path


def link(object_files: Sequence[str], name_hint: str = "linked",
         extra_flags: Sequence[str] = (), compiler: str = "g++") -> Path:
    """Link object files into a cached shared library (reference parity:
    ``tensorflow_jit.link``)."""
    key = _content_hash(*(str(o) for o in object_files), " ".join(extra_flags))
    so_path = cache_dir() / f"{name_hint}_{key}.so"
    if so_path.exists():
        return so_path
    cmd = [compiler, "-shared", "-fPIC", *extra_flags,
           *[str(o) for o in object_files], "-o", str(so_path)]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"linking failed:\n{proc.stderr}")
    return so_path


def compile_and_load(source: str, name_hint: str = "kernel",
                     extra_flags: Sequence[str] = ()) -> ctypes.CDLL:
    """Compile (or fetch from cache) and dlopen the library."""
    so_path = compile_shared_library(source, name_hint, extra_flags)
    return ctypes.CDLL(str(so_path))
