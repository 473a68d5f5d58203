"""Host-machine introspection helpers (no jax imports — safe to use
before backend init, e.g. from the test conftest).

Two facts about this deployment environment live here so every consumer
shares ONE implementation:

* XLA:CPU AOT cache entries embed the compiling host's CPU features and
  fail AT LOAD on a different machine -> per-machine cache-dir salt
  (``machine_tag``).
* The tunneled-TPU relay can wedge so ``jax.devices()`` hangs forever in
  every process -> probe the live backend in a SUBPROCESS with a timeout
  (``probe_device_count``).
"""

from __future__ import annotations

import hashlib
import platform
import subprocess
import sys
from typing import Optional


def machine_tag() -> str:
    """Short fingerprint of the host CPU (salts CPU compilation-cache
    directories; see module docstring).

    Hashes the model identity lines AND the feature flags: LLVM derives
    tuning features like ``prefer-no-scatter``/``prefer-no-gather`` from
    the CPU *model*, so two hosts with identical cpuinfo flags but
    different models still produce incompatible AOT executables (observed
    r4: flags-only salt collided across hosts and the loader logged
    machine-feature mismatches)."""
    keys = ("flags", "model name", "model\t", "cpu family", "stepping", "vendor_id")
    lines = []
    try:
        with open("/proc/cpuinfo") as f:
            for l in f:
                if not l.strip():
                    break  # first processor block is enough
                if l.startswith(keys):
                    lines.append(l)
    except OSError:
        pass
    ident = "".join(lines) or platform.processor() or "unknown"
    return hashlib.sha1(ident.encode()).hexdigest()[:12]


def probe_device_count(timeout: int = 180) -> Optional[int]:
    """Count the live backend's devices OUT-OF-PROCESS with a timeout.

    Returns None when the probe hangs or fails — i.e. the device
    transport is wedged (or broken) and in-process ``jax.devices()``
    would hang forever. The subprocess inherits sitecustomize, so it
    dials exactly the backend the caller would."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            timeout=timeout, capture_output=True, text=True,
        )
        return int(out.stdout.strip()) if out.returncode == 0 else None
    except (subprocess.TimeoutExpired, ValueError):
        return None
