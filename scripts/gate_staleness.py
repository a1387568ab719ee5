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

Usage: python scripts/gate_staleness.py [--json] [--precise]

``--precise`` sharpens step 2 for the contract module itself: instead of
"newest commit touching the module file", it uses ``git log -L`` over the
query function's current line span (decorator through body), so an edit
to one query in a 60-query module stales only that query. Imported
non-contract modules (operators/plans the function wraps) stay at module
granularity — a change to operators/dedup.py legitimately stales every
dedup query. ~1-2 min for the full registry (one git -L walk per query).
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


def _green(entry: dict, has_oracle: bool) -> bool:
    """Full green = rows+schema+hash all True. A hash-less entry counts as
    green ONLY for queries with no registered oracle (the driver's weaker
    rows-only check is the strongest evidence that exists for those); an
    oracle-backed query whose gate entry lacks a hash (oracle timeout ->
    rows-only) was never value-checked and must NOT satisfy the rotation."""
    if entry.get("err"):
        return False
    if entry.get("hash_match") is not None:
        return bool(
            entry.get("rows_match") is True
            and entry.get("schema_match") is True
            and entry.get("hash_match") is True
        )
    if has_oracle:
        return False
    return entry.get("rows_match") is True or (
        "rows_match" not in entry and entry.get("spark_rows", -1) >= 0
    )


def _last_green() -> dict[str, int]:
    """query -> commit time of the newest CORRECTNESS file where green."""
    import glob

    from skope_api_spark.contract import ORACLES

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
            if isinstance(entry, dict) and _green(entry, q in ORACLES):
                last[q] = max(last.get(q, 0), ts)
    return last


def _fn_span_last_change(fn) -> int | None:
    """Newest commit time touching the query function's current line span
    (git log -L tracks the range back through renames/moves of the span).
    None if the span can't be resolved (fall back to module granularity)."""
    import inspect as _inspect

    try:
        src_file = _inspect.getsourcefile(fn)
        lines, start = _inspect.getsourcelines(fn)
    except (TypeError, OSError):
        return None
    if not src_file:
        return None
    rel = os.path.relpath(src_file, REPO)
    # getsourcelines starts at the @query decorator, so the span already
    # covers the oracle SQL literal plus the function body
    end = start + len(lines) - 1
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", f"-L{start},{end}:{rel}",
         "--no-patch"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    for tok in out.split():
        if tok.isdigit():
            return int(tok)
    return None


def main() -> int:
    precise = "--precise" in sys.argv
    changed = _git_last_change()
    qfiles = _query_files()
    greens = _last_green()

    fn_by_query = {}
    contract_file_by_query = {}
    if precise:
        from skope_api_spark.contract import QUERIES

        for q, fn in QUERIES.items():
            fn_by_query[q] = fn
            try:
                f = inspect.getsourcefile(sys.modules[fn.__module__])
                contract_file_by_query[q] = os.path.relpath(f, REPO)
            except (TypeError, KeyError):
                pass

    stale, never = [], []
    for q, files in sorted(qfiles.items()):
        if precise and q in contract_file_by_query:
            cfile = contract_file_by_query[q]
            span_ts = _fn_span_last_change(fn_by_query[q])
            per_file = [
                changed.get(f, 0) for f in files if f != cfile
            ]
            if span_ts is not None:
                per_file.append(span_ts)
            else:
                per_file.append(changed.get(cfile, 0))
            touched = max(per_file, default=0)
        else:
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
