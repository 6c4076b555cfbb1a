"""Session-scoped scratch directories for write-and-read-back queries.

Several declared queries stage data through local temp directories
(JSON/CSV/ORC/XML sink round-trips, streaming sinks + checkpoints).
Each call needs a FRESH directory — a sink round-trip that appended
into a reused dir would read back stale rows — but a long-lived session
(bench battery: 4 runs x query, plus two-SF parity) would otherwise
leak dozens of orphaned dirs per session. Every scratch dir is
therefore registered here and removed at interpreter exit.

At 100 TB these paths are object-store URIs managed by the table
format's transaction log; the local tempdir is the test-scale stand-in.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_REGISTERED: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp that is cleaned up at process exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    _REGISTERED.append(d)
    return d


@atexit.register
def _cleanup() -> None:
    while _REGISTERED:
        shutil.rmtree(_REGISTERED.pop(), ignore_errors=True)
