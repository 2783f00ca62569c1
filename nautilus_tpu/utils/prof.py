"""Opt-in wall-clock sub-phase profiling (NAUTILUS_TPU_PROF=1).

Dispatches are asynchronous on TPU, so device time surfaces at the next
blocking fetch; regions are therefore drawn around fetch boundaries. Zero
overhead when the environment variable is unset.
"""

import os
from contextlib import contextmanager
from time import time

PROF = {}
ENABLED = os.environ.get('NAUTILUS_TPU_PROF') == '1'


@contextmanager
def region(name):
    """Accumulate wall time and call count for a named region."""
    if not ENABLED:
        yield
        return
    t0 = time()
    try:
        yield
    finally:
        dt = time() - t0
        s, n = PROF.get(name, (0.0, 0))
        PROF[name] = (s + dt, n + 1)


def report():
    """Formatted accumulated regions, slowest first."""
    rows = sorted(PROF.items(), key=lambda kv: -kv[1][0])
    return '\n'.join('{:<28s} {:8.2f} s  x{}'.format(k, s, n)
                     for k, (s, n) in rows)
