"""Exit-cleaned temp dirs for entry/bench scratch space.

Every scratch directory an entry materializes (sink round-trips, persisted
indexes, streaming checkpoints) registers for interpreter-exit removal, so
repeated bench/gate/test runs never accumulate orphaned /tmp trees — the
leak class ADVICE r03 flagged for ``documents_stream``.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile


def tmpdir(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d
