"""Shared engine tunables.

``DRIVER_FASTPATH_ROWS`` bounds the driver-side fast paths (dedup
winner collection, corpus-stats aggregation): below it the driver
collects a key-sized table instead of running a distributed shuffle.
It scales with the driver's physical memory (~100 B/row at ~2% of RAM)
instead of being a hardcoded constant, and can be pinned with
``SES_DRIVER_FASTPATH_ROWS`` for tests or constrained drivers.
"""

from __future__ import annotations

import os


def _default_fastpath_rows() -> int:
    try:
        mem = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    except (ValueError, OSError, AttributeError):
        return 5_000_000
    return max(1_000_000, int(mem * 0.02 / 100))


DRIVER_FASTPATH_ROWS = int(
    os.environ.get("SES_DRIVER_FASTPATH_ROWS", _default_fastpath_rows())
)
