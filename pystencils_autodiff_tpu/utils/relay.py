"""Backend liveness probing for driver entry points.

A dead TPU relay makes ``jax.devices()`` hang inside the C extension
(observed 2026-08-17, multi-hour outage) — nothing a Python-level timeout
can interrupt in-process.  Driver checks (bench.py, __graft_entry__)
therefore probe backend init in a SUBPROCESS with a wall-clock timeout and
fall back to CPU with an honest label when it never comes up.
"""

from __future__ import annotations

import re
import subprocess
import sys

__all__ = ["probe_device_count", "backend_alive"]

_SENTINEL = "PYSTENCILS_ADTPU_NDEV="


def probe_device_count(timeout_s: float = 150.0) -> int:
    """Number of jax devices a fresh interpreter sees, or 0 if backend
    init fails or hangs past ``timeout_s``.

    The subprocess prints a sentinel-prefixed count so banners/warnings
    from sitecustomize or plugins on stdout cannot corrupt the parse.
    Always a subprocess — no in-process shortcut even when the env pins
    CPU, because the axon sitecustomize force-registers the TPU backend
    and OVERRIDES ``JAX_PLATFORMS`` (an in-process ``jax.devices()``
    would then hang on a dead relay despite the env var).
    """
    code = (f"import jax; print({_SENTINEL!r} + str(len(jax.devices())))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return 0
    if r.returncode != 0:
        return 0
    m = re.search(re.escape(_SENTINEL) + r"(\d+)", r.stdout)
    return int(m.group(1)) if m else 0


def backend_alive(timeout_s: float = 150.0) -> bool:
    """True if jax backend init completes within ``timeout_s``."""
    return probe_device_count(timeout_s) > 0
