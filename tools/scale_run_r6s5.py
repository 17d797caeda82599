#!/usr/bin/env python
"""Round-6 session-5 ANN scale point: two-level IVF (ivf2) on a
1,024k-vector derived store — one further doubling past the 512k run,
checking the hierarchical coarse quantizer holds its sublinear shape
and recall floor as n keeps growing. Thin wrapper over the shared
decade machinery in scale_run_r6.py (same protocol by construction).

Usage: python tools/scale_run_r6s5.py
Prints one JSON line. Quiet host only — the number goes into the
scale record.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_run_r6 import run_ivf2  # noqa: E402  (tools dir is sys.path[0])

if __name__ == "__main__":
    run_ivf2(copies=512, label="d15/ivf2 two-level @1M")
