"""Per-process frozen artifacts for serve-path registry queries.

Two registry queries measure a production READ path against an index
materialized once per process (the IVF Parquet index, the hash-bucketed
events layout). Their artifacts land under a shared ``$TMPDIR`` base as
``<md5-of-sf-dir>_<pid>`` directories; this module owns the lifecycle
rules both share:

- :func:`acquire` reserves the path, registers ONE shared atexit
  cleanup on first use, and sweeps dead-pid orphans once per base per
  process — so every frozen artifact gets the same lifecycle and a fix
  here fixes all of them (review find: the dance was previously
  duplicated per site);
- the owning process removes its own trees at exit;
- crashed runs' leftovers are swept by the next process's first freeze.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil

_OWNED: list[str] = []
_ATEXIT_REGISTERED = False
_SWEPT_BASES: set[str] = set()


def acquire(base: str, key: str) -> str:
    """Reserve this process's frozen dir for ``(base, key)`` and return
    its path (not created — the caller materializes into it). First use
    registers the shared atexit cleanup; first use PER BASE sweeps that
    base's dead-pid orphans."""
    global _ATEXIT_REGISTERED
    if not _ATEXIT_REGISTERED:
        atexit.register(release_all)
        _ATEXIT_REGISTERED = True
    if base not in _SWEPT_BASES:
        _SWEPT_BASES.add(base)
        sweep_orphans(base)
    digest = hashlib.md5(key.encode()).hexdigest()[:12]
    path = os.path.join(base, f"{digest}_{os.getpid()}")
    if path not in _OWNED:
        _OWNED.append(path)
    return path


def release(path: str) -> None:
    """Remove one owned artifact now (tests / explicit invalidation)."""
    shutil.rmtree(path, ignore_errors=True)
    if path in _OWNED:
        _OWNED.remove(path)


def release_all() -> None:
    """atexit: remove every artifact THIS process froze (the caches are
    per-process, so nothing else can be reading them at exit)."""
    for p in _OWNED:
        shutil.rmtree(p, ignore_errors=True)
    _OWNED.clear()


def sweep_orphans(base: str) -> None:
    """Remove sibling ``*_<pid>`` dirs under ``base`` whose owning pid
    is gone (review find: repeated bench/pytest runs used to leave one
    orphan tree per process). Best-effort: pid-reuse can spare an
    orphan until the next sweep; a dir owned by a LIVE process is never
    touched. The base is world-writable $TMPDIR, so hostile/garbage
    names must not crash the freeze: a "pid" too large to be real
    (os.kill raises OverflowError, not ProcessLookupError) is treated
    as dead — no live process can have it."""
    try:
        entries = os.listdir(base)
    except OSError:
        return
    for d in entries:
        pid_s = d.rsplit("_", 1)[-1]
        if not pid_s.isdigit() or int(pid_s) == os.getpid():
            continue
        try:
            os.kill(int(pid_s), 0)
        except (ProcessLookupError, OverflowError):
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another user: definitely not ours
