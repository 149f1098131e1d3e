"""stdin input for the file readers (reference parity:
test/shell/read_fastx_stdin.sh, read_alignments_stdin.sh,
read_newick_stdin.sh; src/read_fastx.cpp:44-64).

A distributed scan cannot read the driver process's stdin on executors,
so ``'-'`` / ``'/dev/stdin'`` is SPOOLED once, driver-side, to a temp
file at bind time and scanned from there — same observable behavior as
the reference (which also materializes stdin in a single reader thread),
including ``filepath = '/dev/stdin'`` in the output. Spooling bounds
stdin inputs by local disk; huge inputs should be real files, which is
true of the reference too (stdin is inherently one stream).
"""

from __future__ import annotations

import sys
import tempfile

STDIN_MARKERS = ("-", "/dev/stdin")


def is_stdin(filename) -> bool:
    return isinstance(filename, str) and filename in STDIN_MARKERS


def any_stdin_in_list(filename) -> bool:
    return isinstance(filename, (list, tuple)) and any(
        f in STDIN_MARKERS for f in filename
    )


def spool_stdin(suffix: str = ".dat") -> str:
    """Drain the driver's stdin to a temp file; returns the path."""
    data = sys.stdin.buffer.read()
    f = tempfile.NamedTemporaryFile(delete=False, suffix=suffix, prefix="stdin_")
    f.write(data)
    f.close()
    return f.name
