"""Version-scoped persistent compilation cache.

AOT-compiled executables in the jax persistent cache HARD-FAIL instead of
degrading when the backend build changes: a libtpu rolling upgrade turned
round-3's multichip gate red (`FAILED_PRECONDITION: libtpu version
mismatch` while loading a cached executable), and stale CPU entries spew
`cpu_aot_loader` machine-feature mismatches. Scoping the cache directory
by the client build (jax / jaxlib / libtpu package versions) plus — when
the caller has probed it — the live backend's `platform_version` makes a
build change start a fresh subdirectory instead of poisoning every run
that touches the shared cache.

The reference has no compilation cache (eager torch); this is TPU-runtime
infrastructure for the remote-compile relay, where a cold 220^3 graph
costs minutes (see .claude/skills/verify/SKILL.md gotcha #3).
"""

from __future__ import annotations

import hashlib
import os

__all__ = ["client_build_id", "scoped_cache_dir", "setup_compilation_cache"]

DEFAULT_ROOT = "/root/repo/.jax_cache"


def client_build_id() -> str:
    """Build string of the CLIENT side of the compile path (no backend
    init — safe to call before choosing a platform)."""
    import jax
    import jaxlib

    parts = [f"jax{jax.__version__}",
             f"jaxlib{getattr(jaxlib, '__version__', '?')}"]
    try:
        from importlib.metadata import version

        parts.append("libtpu" + version("libtpu"))
    except Exception:
        pass
    return "-".join(parts)


def scoped_cache_dir(root: str = DEFAULT_ROOT,
                     platform_version: str | None = None) -> str:
    """Cache subdirectory keyed on the client build (+ the backend's
    platform_version when provided). Creates it, with a human-readable
    KEY.txt marker."""
    key = client_build_id()
    if platform_version:
        key += "|" + " ".join(str(platform_version).split())
    sub = hashlib.sha1(key.encode()).hexdigest()[:12]
    d = os.path.join(root, sub)
    try:
        os.makedirs(d, exist_ok=True)
        marker = os.path.join(d, "KEY.txt")
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write(key + "\n")
    except OSError:
        pass
    return d


def setup_compilation_cache(root: str = DEFAULT_ROOT,
                            platform_version: str | None = None):
    """Point jax's persistent cache at the version-scoped subdirectory.

    BRAINFM_DISABLE_CACHE=1 disables the persistent cache entirely (the
    poisoned-cache escape hatch bench.py re-execs itself with). Returns
    the directory used, or None when disabled."""
    import jax

    if os.environ.get("BRAINFM_DISABLE_CACHE") == "1":
        try:
            jax.config.update("jax_enable_compilation_cache", False)
        except Exception:
            pass
        return None
    d = scoped_cache_dir(root, platform_version)
    jax.config.update("jax_compilation_cache_dir", d)
    return d


def looks_like_cache_poisoning(exc: BaseException) -> bool:
    """True when an exception smells like a stale/skewed cache entry
    (libtpu mismatch, AOT deserialization failure) rather than a bug —
    the caller should retry once with the cache disabled."""
    s = f"{type(exc).__name__}: {exc}".lower()
    return ("libtpu version mismatch" in s
            or "aot" in s and "deserial" in s
            or "failed_precondition" in s and "version" in s
            or "machine features" in s)
