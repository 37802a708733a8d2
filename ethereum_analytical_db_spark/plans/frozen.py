"""Per-process frozen artifacts for serve-path registry queries.

Two registry queries measure a production READ path against an index
materialized once per process (the IVF Parquet index, the hash-bucketed
events layout). Their artifacts land under a shared ``$TMPDIR`` base as
``<md5-of-sf-dir>_<pid>`` directories; this module owns the lifecycle
rules both share:

- the owning process removes its own trees at exit (atexit);
- the FIRST freeze in a process sweeps sibling trees whose owning pid
  is dead — so crashed runs can't accumulate orphans forever.
"""

from __future__ import annotations

import os
import shutil


def sweep_orphans(base: str) -> None:
    """Remove sibling ``*_<pid>`` dirs under ``base`` whose owning pid
    is gone (review find: repeated bench/pytest runs used to leave one
    orphan tree per process). Best-effort: pid-reuse can spare an
    orphan until the next sweep; a dir owned by a LIVE process is never
    touched."""
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
        except ProcessLookupError:
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another user: definitely not ours
