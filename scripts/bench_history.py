#!/usr/bin/env python
"""Regenerate BENCH_HISTORY.jsonl from the committed BENCH_r*.json
driver artifacts (VERDICT r10 #2: cross-round perf claims must be
auditable FROM THE REPO, not from /tmp logs).

One JSON line per round, carrying everything a cross-round
comparison needs: raw total, per-entry seconds, and — where the
bench emitted them (r9+) — the calibration probe results, the
normalized total, and the per-class host factors. Fields absent
from an old record are simply absent from its line (no synthesized
numbers).

Usage::

    python scripts/bench_history.py          # rewrite from artifacts
    python scripts/bench_history.py --check  # verify file is current

Deterministic: the output is a pure function of the BENCH_r*.json
set, so re-running after each driver round keeps the file current
and the diff reviewable.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
OUT = ROOT / "BENCH_HISTORY.jsonl"

CARRY = (
    "value",
    "value_normalized",
    "calibration",
    "class_factors",
    "class_wall",
    "class_wall_normalized",
    "sf",
    # r12: the engine/certificate subtotal split (VERDICT r11 #5) —
    # carried verbatim; the queries dict may also hold the
    # "_fast_tail" {n, wall} fold (sub-noise-floor entries summed to
    # fit the driver's 1800-char stdout window), which rides along
    # like any other key
    "engine_wall",
    "certificate_wall",
    "queries",
)


def build_lines() -> list[str]:
    lines = []
    for p in sorted(ROOT.glob("BENCH_r*.json")):
        m = re.search(r"r(\d+)", p.stem)
        if not m:
            continue
        try:
            rec = json.loads(p.read_text())
        except ValueError:
            continue
        parsed = rec.get("parsed") or {}
        row: dict = {"round": int(m.group(1)), "source": p.name}
        for k in CARRY:
            if k in parsed:
                row[k] = parsed[k]
        lines.append(json.dumps(row, sort_keys=True))
    return lines


def main() -> int:
    lines = build_lines()
    text = "\n".join(lines) + "\n"
    if "--check" in sys.argv[1:]:
        if OUT.exists() and OUT.read_text() == text:
            print(f"BENCH_HISTORY.jsonl current ({len(lines)} rounds)")
            return 0
        print("BENCH_HISTORY.jsonl is stale — rerun without --check")
        return 1
    OUT.write_text(text)
    print(f"wrote {OUT.name}: {len(lines)} rounds")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
