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
        # executables depend on libtpu flags (e.g. the scoped-VMEM limit);
        # key them so flag changes can never replay a stale binary
        f"initargs={os.environ.get('LIBTPU_INIT_ARGS', '')}",
    ]
    return hashlib.sha256(";".join(parts).encode()).hexdigest()[:12]


_SCOPED_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib"


def setup_tpu_flags() -> None:
    """Raise the TPU scoped-VMEM (kernel stack) limit from the 16 MB default
    to 64 MB — the fused attention kernel's unrolled K-loop needs ~17 MB at
    the flagship enc0 shape (measured: scoped-VMEM OOM by 1.02 MB, round 4),
    and v5e has 128 MB of VMEM. Must run BEFORE the backend initializes
    (libtpu snapshots LIBTPU_INIT_ARGS at PJRT plugin init); no-op if the
    flag is already set."""
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    if _SCOPED_VMEM_FLAG not in cur:
        os.environ["LIBTPU_INIT_ARGS"] = (
            cur + f" {_SCOPED_VMEM_FLAG}=65536"
        ).strip()


def setup_compile_cache(root: str = "/tmp") -> str:
    """Point jax's persistent compile cache at a fingerprint-keyed dir and
    return the path. Safe to call multiple times. Also applies the TPU
    flag setup (scoped-VMEM limit) — callers invoke this before their first
    device op, which is exactly when the flags must be in the env.

    TPU backends only: the XLA:CPU persistent cache is poison in this
    deployment (AOT executables reloaded from it fail the loader's
    host-feature check and kill a device thread mid-collective — the
    round-1/2 dryrun failure mode; see STATUS.md round 3). On CPU this is a
    no-op returning ''."""
    import jax

    setup_tpu_flags()
    if jax.default_backend() not in ("tpu", "axon"):
        return ""
    path = os.path.join(root, f"jax_cache_cbl_{cache_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path
