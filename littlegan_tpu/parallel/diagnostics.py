"""fd-level capture of XLA's C++ compile diagnostics (SPMD warnings).

XLA's SPMD partitioner reports sharding-propagation fallbacks — notably
"Involuntary full rematerialization" (spmd_partitioner.cc:652), the
replicate-then-repartition last resort — as absl WARNINGs written directly
to file descriptor 2 from C++. Python-level stderr redirection cannot see
them; duplicating fd 2 into a temp file can. ``capture_stderr`` does that
while REPLAYING everything afterward, so wrapping a compile in it hides
nothing from the console/driver tail.

Used by ``__graft_entry__.dryrun_multichip`` (fails the dryrun on any
involuntary-remat warning — round-4 verdict #3: the r3 dryrun passed
silently over two of them) and by tests/test_spatial.py as the regression
gate that the spatial program compiles clean.
"""

from __future__ import annotations

import contextlib
import os
import sys
import tempfile

INVOLUNTARY_REMAT = "Involuntary full rematerialization"


class _Capture:
    def __init__(self):
        self._tmp = None
        self._final: str | None = None

    def text(self) -> str:
        """Text captured so far (live during the context, final after it)."""
        if self._final is not None:
            return self._final
        sys.stderr.flush()
        pos = self._tmp.tell()
        self._tmp.seek(0)
        data = self._tmp.read().decode("utf-8", "replace")
        self._tmp.seek(pos)
        return data


@contextlib.contextmanager
def capture_stderr():
    """Capture EVERYTHING written to fd 2 (incl. XLA C++ logs).

    Yields a ``_Capture`` whose ``.text()`` returns what was captured —
    usable during AND after the context. On exit the original fd is
    restored and the captured bytes are replayed to it, so nothing is
    hidden from the console/driver tail.
    """
    cap = _Capture()
    saved = os.dup(2)
    cap._tmp = tempfile.TemporaryFile(mode="w+b")
    sys.stderr.flush()
    os.dup2(cap._tmp.fileno(), 2)
    try:
        yield cap
    finally:
        sys.stderr.flush()
        os.dup2(saved, 2)
        os.close(saved)
        cap._tmp.seek(0)
        replay = cap._tmp.read()
        cap._final = replay.decode("utf-8", "replace")
        cap._tmp.close()
        cap._tmp = None
        while replay:  # POSIX os.write may be partial for large logs
            n = os.write(2, replay)
            replay = replay[n:]


def count_involuntary_remat(captured: str) -> int:
    return captured.count(INVOLUNTARY_REMAT)
