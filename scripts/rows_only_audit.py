#!/usr/bin/env python
"""Emit the NOTES audit table for ROWS-ONLY catalog entries from a
full-gate log (VERDICT r11 #7: the driver records rows-only entries
as ``err: no_oracle``, so their audit trail — the local full-gate
PASS line with its row count — must be COMMITTED each round, not
just reproducible).

Usage::

    python scripts/check_oracle.py /root/testdata/sf0.01 > /tmp/gate.log 2>&1
    python scripts/rows_only_audit.py /tmp/gate.log

Prints a markdown table of every rows-only entry: row count, wall
seconds, and its TWINS certificate (the oracled entry whose driver
hash checks the same algorithm shape). Exits non-zero if any
rows-only catalog entry is MISSING from the log — a silent coverage
gap is exactly what this table exists to prevent.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(
    0, str(Path(__file__).resolve().parents[1])
)


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    log = Path(sys.argv[1]).read_text()
    from sqltask_spark.queries import ORACLES, QUERIES, TWINS

    rows_only = [k for k in QUERIES if k not in ORACLES]
    pat = re.compile(
        r"ok\s+(\S+): rows-only \((\d+) rows, no oracle\)"
        r"(?: \[([0-9.]+)s\])?"
    )
    seen = {
        m.group(1): (int(m.group(2)), m.group(3))
        for m in pat.finditer(log)
    }
    missing = [k for k in rows_only if k not in seen]
    print("| rows-only entry | gate rows | wall (s) | TWINS certificate |")
    print("|---|---|---|---|")
    for k in rows_only:
        if k in seen:
            n, secs = seen[k]
            print(f"| `{k}` | {n} | {secs or '—'} |"
                  f" `{TWINS.get(k, '—')}` |")
        else:
            print(f"| `{k}` | **MISSING FROM LOG** | — |"
                  f" `{TWINS.get(k, '—')}` |")
    if missing:
        print(f"\nMISSING: {missing}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
