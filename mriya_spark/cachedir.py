"""User-scoped root for derived-artifact caches.

Materialized artifacts that are TRUSTED on re-read (the IVF index, the
staged streaming fixtures, the seeded mock org) used to live under
shared, predictable ``/tmp`` paths — on a multi-user host another user
could pre-create those paths and at best collide, at worst poison
query results. Everything now lands under ``~/.cache/mriya_spark``
(override: ``MRIYA_SPARK_CACHE_DIR``), the same user-scoped pattern
the OAuth token cache adopted in round 4
(`connector/transport.py:DEFAULT_SESSION_FILE`), with the root held at
0700 so other local users can neither read nor plant artifacts.

Reference analogue: the reference trusts its cwd session file
(/root/reference/data_connector.py:24,219-243); same class of derived
state, same fix.
"""

from __future__ import annotations

import os

_ENV_VAR = "MRIYA_SPARK_CACHE_DIR"


def cache_root() -> str:
    """The cache root (not created). Env-overridable for tests/CI."""
    return os.environ.get(_ENV_VAR) or os.path.join(
        os.path.expanduser("~"), ".cache", "mriya_spark"
    )


def cache_dir(*parts: str) -> str:
    """Return ``cache_root()/parts...``, creating it (and tightening
    the root to 0700 — but only when WE created it: chmod'ing a
    pre-existing user-chosen directory would silently strip
    deliberately-granted group access)."""
    root = cache_root()
    created_root = not os.path.isdir(root)
    os.makedirs(root, mode=0o700, exist_ok=True)
    if created_root:
        # makedirs' mode is filtered through the umask; re-tighten
        try:
            os.chmod(root, 0o700)
        except OSError:
            pass
    full = os.path.join(root, *parts) if parts else root
    os.makedirs(full, exist_ok=True)
    return full


def sweep_stale(
    subdir: str, *prefixes: str, max_age_s: float = 3600.0
) -> None:
    """Remove uuid-suffixed artifact dirs/files under
    ``cache_root()/subdir`` whose name starts with any of ``prefixes``
    and whose mtime is older than ``max_age_s`` (r6 ADVICE: unlike the
    old /tmp location, ~/.cache has no reboot/tmpwatch cleanup, so
    repeated bench/test runs would grow it without bound). Same
    age-gated posture as the IVF ``__build_`` sweep: a FRESH sibling
    may be a concurrent run still writing — only stale ones go.

    Staleness of a DIRECTORY is judged by the newest mtime among the
    dir itself and its immediate children, not the top-level mtime
    alone: a live Structured Streaming checkpoint writes into
    ``offsets/``/``commits/`` subdirs without refreshing the parent's
    mtime, and a long-running concurrent query must not have its
    checkpoint swept mid-run (r7 ADVICE). Plain files are removed with
    ``os.remove`` — ``rmtree(ignore_errors=True)`` silently no-ops on
    them (r7 ADVICE)."""
    import shutil
    import time

    d = os.path.join(cache_root(), subdir)
    if not os.path.isdir(d):
        return
    now = time.time()
    for name in os.listdir(d):
        if not name.startswith(prefixes):
            continue
        full = os.path.join(d, name)
        try:
            newest = os.path.getmtime(full)
            if os.path.isdir(full):
                for child in os.listdir(full):
                    try:
                        newest = max(
                            newest,
                            os.path.getmtime(os.path.join(full, child)),
                        )
                    except OSError:
                        continue
            if now - newest <= max_age_s:
                continue
        except OSError:
            continue
        if os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)
        else:
            try:
                os.remove(full)
            except OSError:
                pass
