"""Persistent XLA compilation cache.

Large-model train steps are expensive to compile (minutes through a
remote-compile path); caching makes every process after the first start in
seconds.  Call once before the first jit execution.

The cache directory is partitioned by a HOST FINGERPRINT (machine +
cpu-feature hash): XLA:CPU AOT results embed the compile machine's
feature set, and loading an entry produced on a different
microarchitecture is undefined — observed as a hard segfault in
``backend_compile_and_load`` when a home directory (and its cache)
migrates across hosts between sessions.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    feat = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feat = line
                    break
    except OSError:
        pass
    h = hashlib.sha256(
        (platform.machine() + feat).encode()).hexdigest()[:12]
    return f"{platform.machine()}-{h}"


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if path is None:
        path = os.path.join(
            os.path.expanduser("~/.cache/youku_mplug_tpu/xla"),
            _host_fingerprint())
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
