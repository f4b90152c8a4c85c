"""Toolchain-fingerprinted persistent compile cache.

Round-2 lesson (CLAUDE.md): a persistent compile cache keyed less
specifically than machine × toolchain is a time bomb — XLA:CPU once replayed
an AOT executable whose loader rejected its own target features, killing a
device thread mid-collective. The TPU-side cache has been benign, but the fix
is structural: derive the cache directory from a fingerprint of everything
that can invalidate an executable (jax/jaxlib versions, backend platform,
libtpu/axon build), so a toolchain bump can never replay a stale binary.

Use `setup_compile_cache()` at the top of every TPU script instead of a
hard-coded `/tmp/jax_cache_cbl`.
"""
from __future__ import annotations

import hashlib
import os


def _dist_version(name: str) -> str:
    try:
        import importlib.metadata as md

        return md.version(name)
    except Exception:
        return ""


def cache_fingerprint() -> str:
    """Short hash over the pieces that key compiled-executable validity."""
    import jax

    parts = [
        f"jax={jax.__version__}",
        f"jaxlib={_dist_version('jaxlib') or _dist_version('jax')}",
        # platform name triggers backend init — these helpers are only used
        # by scripts that immediately dispatch to the device anyway
        f"backend={jax.default_backend()}",
        f"libtpu={_dist_version('libtpu') or _dist_version('libtpu-nightly')}",
        f"axon={_dist_version('axon')}",
    ]
    return hashlib.sha256(";".join(parts).encode()).hexdigest()[:12]


def setup_compile_cache(root: str = "/tmp") -> str:
    """Point jax's persistent compile cache at a fingerprint-keyed dir and
    return the path. Safe to call multiple times."""
    import jax

    path = os.path.join(root, f"jax_cache_cbl_{cache_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path
