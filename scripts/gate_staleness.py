#!/usr/bin/env python
"""Compute the stale-green gate rotation list (post-closure policy,
contract/__init__.py GATE-ORDER POLICY r15).

Once every registry query has driver-window exposure (262/262 after the
r15 window), the gate should cycle queries whose implementation files
changed AFTER their last driver-green — those are the greens whose
evidence is stale. This script derives that list mechanically:

1. For every query, the implementing files = the contract module that
   registers it plus every ``skope_api_spark`` module that module imports
   (one level — contract modules import exactly the operator/plan modules
   they wrap).
2. Last-change time per query = the newest git commit touching any of
   those files.
3. Last driver-green time per query = the commit time of the newest
   ``CORRECTNESS_r*.json`` whose entry for the query is fully green
   (rows+schema+hash, or rows-only for no-oracle queries).
4. STALE = last-change > last-green (never-green queries are listed
   separately — before the r15 window lands, that's the recorded 27).

Usage: python scripts/gate_staleness.py [--json]
"""

from __future__ import annotations

import inspect
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git_last_change() -> dict[str, int]:
    """file (repo-relative) -> newest commit unix time touching it."""
    out = subprocess.run(
        ["git", "log", "--format=#%ct", "--name-only"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    ts, last = 0, {}
    for line in out.splitlines():
        if line.startswith("#"):
            ts = int(line[1:])
        elif line and line not in last:
            # log is newest-first, so first sighting is the newest touch
            last[line] = ts
    return last


def _query_files() -> dict[str, set[str]]:
    """query -> repo-relative implementation files (contract module +
    its one-level skope_api_spark imports)."""
    import skope_api_spark  # noqa: F401
    from skope_api_spark.contract import QUERIES

    mod_files: dict[str, set[str]] = {}
    out: dict[str, set[str]] = {}
    for name, fn in QUERIES.items():
        mod = sys.modules[fn.__module__]
        key = fn.__module__
        if key not in mod_files:
            files = set()
            for obj in [mod] + [
                v for v in vars(mod).values() if inspect.ismodule(v)
            ] + [
                sys.modules[v.__module__]
                for v in vars(mod).values()
                if (inspect.isfunction(v) or inspect.isclass(v))
                and getattr(v, "__module__", "").startswith("skope_api_spark")
            ]:
                if not getattr(obj, "__name__", "").startswith("skope_api_spark"):
                    continue
                try:
                    f = inspect.getsourcefile(obj)
                except TypeError:
                    continue
                if f:
                    files.add(os.path.relpath(f, REPO))
            mod_files[key] = files
        out[name] = mod_files[key]
    return out


def _green(entry: dict) -> bool:
    if entry.get("err"):
        return False
    if entry.get("hash_match") is not None:
        return bool(
            entry.get("rows_match")
            and entry.get("schema_match")
            and entry.get("hash_match")
        )
    return bool(entry.get("rows_match", entry.get("spark_rows", 0) >= 0))


def _last_green() -> dict[str, int]:
    """query -> commit time of the newest CORRECTNESS file where green."""
    import glob

    last: dict[str, int] = {}
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        rel = os.path.basename(path)
        ts_out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", rel],
            cwd=REPO, capture_output=True, text=True,
        ).stdout.strip()
        ts = int(ts_out) if ts_out else 0
        try:
            data = json.load(open(path))
        except ValueError:
            continue
        for q, entry in data.items():
            if isinstance(entry, dict) and _green(entry):
                last[q] = max(last.get(q, 0), ts)
    return last


def main() -> int:
    changed = _git_last_change()
    qfiles = _query_files()
    greens = _last_green()

    stale, never = [], []
    for q, files in sorted(qfiles.items()):
        touched = max((changed.get(f, 0) for f in files), default=0)
        g = greens.get(q)
        if g is None:
            never.append(q)
        elif touched > g:
            stale.append((q, touched - g))

    if "--json" in sys.argv:
        print(json.dumps({
            "stale_green": [q for q, _ in stale],
            "never_gated": never,
        }))
        return 0
    print(f"never driver-gated ({len(never)}):")
    for q in never:
        print(f"  {q}")
    print(f"stale greens — impl changed after last gate green ({len(stale)}):")
    for q, dt in sorted(stale, key=lambda x: -x[1]):
        print(f"  {q}  (impl {dt/86400:.1f} days newer than green)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
