"""Advisory file locking shared by on-disk maintainers (sink epoch
compaction, IVF index build/append/compact).

One implementation of the protocol both sites previously hand-coded
(review r6d — the r5d ENOLCK fix had to be re-derived for the second
copy): an exclusive `fcntl.flock`, which beats mtime-staleness protocols
on every axis the r5c review probed — acquisition is atomic (no
check-then-remove takeover race), a crashed holder's lock is released by
the kernel (no staleness heuristic to mis-fire on a long-lived live
holder), and there is nothing to heartbeat. Scope: local filesystems and
NFSv4; object stores need external coordination (README ops note).
"""

from __future__ import annotations


def try_flock(lock_path: str, blocking: bool, what: str, advice: str):
    """Acquire an exclusive advisory flock on `lock_path`.

    Returns an open fd the caller must `os.close()` to release (the
    kernel releases it if the process dies), or None when a NON-blocking
    attempt found the lock held (contention — skip the pass).

    If the lock facility itself is unavailable (e.g. ENOLCK on NFSv3
    without a lock manager), that is NOT contention: treating it as held
    would silently disable the maintenance forever (review r5d). The
    call warns naming `what`/`advice` and proceeds UNLOCKED — correct
    for the normal single-maintainer deployment, the caller's documented
    caveat otherwise.
    """
    import fcntl
    import os
    import warnings

    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
    flags = fcntl.LOCK_EX | (0 if blocking else fcntl.LOCK_NB)
    try:
        fcntl.flock(fd, flags)
    except BlockingIOError:
        os.close(fd)
        return None
    except OSError as e:
        warnings.warn(
            f"{what}: flock unavailable on {lock_path!r} ({e}); proceeding "
            f"without the advisory lock — {advice}",
            RuntimeWarning,
            stacklevel=3,
        )
    return fd
