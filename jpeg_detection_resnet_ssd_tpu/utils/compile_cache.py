"""Persistent XLA compile-cache keying shared by the test suite and the
driver dryrun (`tests/conftest.py`, `__graft_entry__.py`).

XLA:CPU AOT artifacts are NOT portable across machine types: loading a
cache packed for a different target can abort the process (cpu_aot_loader
"machine feature not supported" -> SIGILL) or, worse, load with only a
warning ("Machine type used for XLA:CPU compilation doesn't match the
current machine...") and risk illegal instructions mid-run.  Round 4 keyed
the cache dir on the /proc/cpuinfo *flags* line alone, and the driver
machine still loaded a mismatched artifact — two different CPU models can
share a flags line while LLVM targets them differently.  The fingerprint
here therefore keys on everything that determines the generated code:

  * jax + jaxlib versions (codegen pipeline),
  * the CPU *model name* (maps ~1:1 onto LLVM's host CPU name, which is
    what XLA's AOT machine check compares),
  * the CPU feature flags line (belt and braces).
"""

from __future__ import annotations

import hashlib
import os


def cache_fingerprint() -> str | None:
    """12-hex-char key identifying (codegen stack, host CPU target)."""
    parts = []
    try:
        import jax
        import jaxlib

        parts.append(f"jax={jax.__version__}")
        parts.append(f"jaxlib={getattr(jaxlib, '__version__', '?')}")
    except Exception:  # pragma: no cover - jax is always present here
        return None
    model_name = flags = None
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if model_name is None and line.startswith("model name"):
                    model_name = line.strip()
                elif flags is None and line.startswith("flags"):
                    flags = line.strip()
                if model_name and flags:
                    break
    except OSError:
        import platform

        model_name = platform.processor()
    if not model_name and not flags:
        return None
    parts.append(model_name or "")
    parts.append(flags or "")
    return hashlib.sha1("\n".join(parts).encode()).hexdigest()[:12]


def enable_persistent_cache(jax, base_dir: str) -> str | None:
    """Point jax's persistent compilation cache at
    `{base_dir}/{fingerprint}`; returns the cache dir (None = disabled)."""
    fingerprint = cache_fingerprint()
    if fingerprint is None:
        return None
    cache_dir = os.path.join(base_dir, fingerprint)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is an optimization only
        return None
    return cache_dir
