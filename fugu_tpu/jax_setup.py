"""One-time JAX runtime configuration for the engine.

Enables the persistent compilation cache (each new program shape costs
minutes of XLA compilation on this stack — cache hits make warmup
instant across processes/rounds).  Opt out with FUGU_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os
from pathlib import Path

_configured = False


def fetch_np(arrays):
    """Device→host transfer of a flat list of arrays, overlapped.

    On this host every device read pays a relay round trip and
    ``jax.device_get`` reads leaves serially; starting all the D2H
    copies first (``copy_to_host_async``) overlaps the round trips
    (measured ~2x on multi-buffer fetches).  Returns numpy arrays.
    """
    import numpy as np

    for a in arrays:
        start = getattr(a, "copy_to_host_async", None)
        if start is not None:
            try:
                start()
            except Exception:  # non-addressable/committed arrays
                pass
    return [np.asarray(a) for a in arrays]


def configure() -> None:
    global _configured
    if _configured:
        return
    _configured = True
    if os.environ.get("FUGU_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        str(Path.home() / ".cache" / "fugu_jax_cache"),
    )
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is best-effort
        pass
