"""Per-session scratch paths for sink/stream queries.

Sink and streaming queries materialize real on-disk state (upsert
tables, checkpoint logs, written-out tables) under the scratch root
(``SCRATCH`` below — a repo-keyed tmpfs dir by default, see
``_default_scratch``; ``SPARK_GRAFT_SCRATCH`` overrides). A
FIXED path there is a concurrency bug: two sessions (a test run
alongside a bench run — the scenario the page cache's flock already
defends against) destroy()/overwrite each other's live state mid-query.

The rule here: every such path is keyed by ``<tag>_<pid>`` so sessions
are mutually invisible, and dirs whose owning process is gone are
reaped on the next use of the same kind — bounded growth without ever
touching a LIVE session's state. (Shared CACHES keyed by source
content — the event page cache, the IVF index — stay shared by design
and serialize builders with flocks instead.)
"""

from __future__ import annotations

import os
import shutil

_REPO_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
)


def _default_scratch() -> str:
    """Scratch root selection (r15 optimization round, guide §6).

    Everything under scratch is EPHEMERAL: per-session sink state that
    each query destroys and rebuilds, availableNow checkpoints that are
    rmtree'd on every exit path, and content-keyed caches that rebuild
    from the parquet sources on any miss. None of it needs to survive a
    reboot, but the parquet-commit fsyncs (manifest + pointer + dir
    fsyncs in sinks/parquet_upsert._commit) and the streaming state
    store's many small checkpoint files pay real block-device latency
    on the repo filesystem — measured at sf0.1: a warm 4-page upsert
    round ran 2.89 s on disk vs 2.32 s on tmpfs, and the availableNow
    harness floor dropped 1.78 s -> 1.57 s. So the default root is a
    RAM-backed tmpfs when one is available, keyed by a hash of the
    repo path so two checkouts never share state. On a production
    cluster the analog is executor-local SSD/ramdisk for ephemera and
    durable storage for real sinks/checkpoints — point
    ``SPARK_GRAFT_SCRATCH`` at the right place (it also serves runs
    whose scratch volume would not fit in RAM, e.g. very large
    replicated-fixture sweeps)."""
    env = os.environ.get("SPARK_GRAFT_SCRATCH")
    if env:
        return os.path.abspath(env)
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        import hashlib

        # /dev/shm is world-writable shared tmp, so a predictable name
        # is the classic pre-create/symlink-squat surface (ADVICE r15):
        # key the dir by UID as well, create it 0o700 up front, and
        # refuse anything that is a symlink or owned by someone else —
        # falling back to the repo-local root rather than reading or
        # rmtree'ing through another user's plant.
        tag = hashlib.sha256(_REPO_SCRATCH.encode()).hexdigest()[:8]
        root = os.path.join(
            shm, f"spark_graft_scratch_{os.getuid()}_{tag}"
        )
        try:
            os.makedirs(root, mode=0o700, exist_ok=True)
            st = os.lstat(root)
        except OSError:
            return _REPO_SCRATCH
        import stat as _stat

        if not _stat.S_ISDIR(st.st_mode) or st.st_uid != os.getuid():
            return _REPO_SCRATCH
        return root
    return _REPO_SCRATCH


SCRATCH = _default_scratch()


def reap_dead_session_dirs(parent: str) -> None:
    """Remove ``*_<pid>`` entries under ``parent`` whose owning process
    no longer exists."""
    try:
        entries = os.listdir(parent)
    except FileNotFoundError:
        return
    for e in entries:
        pid = e.rsplit("_", 1)[-1]
        if not pid.isdigit() or int(pid) == os.getpid():
            continue
        try:
            os.kill(int(pid), 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(parent, e), ignore_errors=True)
        except PermissionError:
            pass  # alive under another uid — leave it


# paths this PROCESS has already claimed: the first claim per path
# wipes any leftover from a previous owner, later claims keep the
# session's own live state
_CLAIMED: set[str] = set()


def session_scratch(kind: str, tag: str = "") -> str:
    """A per-session scratch path ``.scratch/<kind>/<tag>_<pid>``,
    reaping the kind's dead-session leftovers on the way.

    PID RECYCLING makes the pid suffix alone an unsound identity: the
    reaper must skip entries matching our own pid, so a fresh process
    whose pid matches a CRASHED session's leftover dir would silently
    inherit that stranger's half-written state. The first claim of a
    path per process therefore removes whatever is already there —
    making the 'fresh per session' guarantee real instead of resting
    on every caller destroying/overwriting first. (A dead dir whose
    pid was recycled to some OTHER live process survives reaping until
    that pid dies — bounded-growth erosion, not a correctness hazard,
    since no live session ever reads it.)"""
    parent = os.path.join(SCRATCH, kind)
    os.makedirs(parent, exist_ok=True)
    reap_dead_session_dirs(parent)
    name = f"{tag}_{os.getpid()}" if tag else str(os.getpid())
    path = os.path.join(parent, name)
    if path not in _CLAIMED:
        shutil.rmtree(path, ignore_errors=True)
        _CLAIMED.add(path)
    return path
