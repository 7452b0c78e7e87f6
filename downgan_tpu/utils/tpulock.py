"""Single-tenant chip serialization for benchmark/gate processes.

The dev TPU is single-tenant: two processes contending for it serialize
at the runtime level and look hung, and — worse for receipts — a process
that COMPILES while another holds the chip can produce a measurably
different binary (the round-4 srresnet gate run 2 landed 0.6 dB off its
bit-reproducible siblings exactly this way; quality_gate_results.jsonl).
Every receipt harness therefore takes this advisory flock around its
whole run, so gate/bench runs are one-at-a-time by construction instead
of by operator discipline.

No reference equivalent (the reference assumes an exclusively-owned
GPU); this is framework-level process hygiene for shared dev chips.
Production pods are per-job exclusive, where the lock degrades to one
uncontended flock call.
"""
from __future__ import annotations

import contextlib
import os
import sys
import time
from typing import Iterator, Optional

DEFAULT_LOCK_PATH = os.path.join(
    os.path.expanduser("~"), ".cache", "downgan_tpu", "chip.lock")


@contextlib.contextmanager
def chip_lock(enabled: bool = True, path: Optional[str] = None,
              verbose: bool = True) -> Iterator[bool]:
    """Exclusive advisory lock on the (single-tenant) accelerator.

    Blocks until the lock is free; yields True when held, False when
    ``enabled`` is False (CPU/smoke runs) or the platform has no flock.
    Take it BEFORE the first JAX backend touch so compilation itself is
    serialized, not just execution.
    """
    if not enabled:
        yield False
        return
    try:
        import fcntl
    except ImportError:  # non-POSIX: nothing to serialize against here
        yield False
        return
    lock_path = path or os.environ.get("DOWNGAN_CHIP_LOCK", DEFAULT_LOCK_PATH)
    lock_dir = os.path.dirname(lock_path)
    if lock_dir:  # a bare filename locks in the cwd
        os.makedirs(lock_dir, exist_ok=True)
    f = open(lock_path, "a+")
    try:
        try:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            if verbose:
                print(f"waiting for chip lock {lock_path} "
                      "(another gate/bench run holds the chip)...",
                      file=sys.stderr, flush=True)
            t0 = time.monotonic()
            fcntl.flock(f, fcntl.LOCK_EX)
            if verbose:
                print(f"chip lock acquired after "
                      f"{time.monotonic() - t0:.0f}s", file=sys.stderr,
                      flush=True)
        yield True
    finally:
        fcntl.flock(f, fcntl.LOCK_UN)
        f.close()


_HELD = []  # managers held by hold_chip_lock for the process lifetime


def hold_chip_lock(enabled: bool = True, path: Optional[str] = None,
                   verbose: bool = True) -> bool:
    """Acquire the chip lock for the REMAINDER OF THE PROCESS.

    For harness mains that want the lock from backend init to exit
    without indenting their whole body. A bare
    ``chip_lock(...).__enter__()`` on the unreferenced temporary is a
    silent no-op — the context manager is garbage-collected immediately
    and its finalizer releases the flock — so this helper exists to hold
    the reference. Returns whether the lock was actually taken; released
    by the OS at process exit.
    """
    cm = chip_lock(enabled=enabled, path=path, verbose=verbose)
    held = cm.__enter__()
    _HELD.append(cm)
    return held
