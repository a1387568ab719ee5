"""Self-enforcing gate-rotation policy (VERDICT r15 item 8).

The post-closure policy (contract/__init__.py GATE-ORDER POLICY): the
50-query driver window must spend its slots where driver evidence is
missing or stale — never-gated queries, the latest round's reds, and
greens whose implementation changed after their last gate exposure.
These tests make that convention fail loudly at HEAD instead of relying
on the builder re-deriving it each round.

Uses module-granular staleness (fast; a SUPERSET of the precise
git-log -L variant), so "window fill must be stale" can never pass on a
query the precise tool would call stale but this one doesn't.
"""

from __future__ import annotations

import glob
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

# standing keeps: policy-named canaries/reps that hold window slots even
# when fresh-green (contract/__init__.py r16 window comment)
STANDING_KEEPS = {
    "mm_media_sniff_quarantine",
    "text_unicode_normalize",
    "ts_gap_fill_interpolate",
    "skope_reference_raster_zonal",
}


def _latest_correctness() -> dict:
    paths = sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json"))
    if not paths:
        pytest.skip("no CORRECTNESS files")
    return json.load(open(paths[-1]))


@pytest.fixture(scope="module")
def staleness():
    import subprocess

    if (
        subprocess.run(
            ["git", "rev-parse", "--git-dir"], cwd=REPO, capture_output=True
        ).returncode
        != 0
    ):
        pytest.skip("not a git checkout")
    import gate_staleness as gs

    changed = gs._git_last_change()
    qfiles = gs._query_files()
    greens = gs._last_green()
    stale, never = set(), set()
    for q, files in qfiles.items():
        touched = max((changed.get(f, 0) for f in files), default=0)
        g = greens.get(q)
        if g is None:
            never.add(q)
        elif touched > g:
            stale.add(q)
    return {"stale": stale, "never": never}


@pytest.fixture(scope="module")
def window():
    from skope_api_spark.contract import QUERIES

    return list(QUERIES)[:50]


class TestGateRotationPolicy:
    def test_never_gated_queries_are_in_window(self, staleness, window):
        missing = staleness["never"] - set(window)
        assert not missing, (
            f"queries with zero driver exposure not in the gate window: "
            f"{sorted(missing)}"
        )

    def test_latest_round_reds_stay_pinned(self, window):
        reds = {
            q
            for q, e in _latest_correctness().items()
            if isinstance(e, dict)
            and (
                e.get("err")
                or e.get("rows_match") is False
                or e.get("schema_match") is False
                or e.get("hash_match") is False
            )
        }
        unpinned = reds - set(window)
        assert not unpinned, (
            f"driver-red queries must stay in the window until green: "
            f"{sorted(unpinned)}"
        )

    def test_window_fill_slots_are_stale_or_never_gated(
        self, staleness, window
    ):
        """Every window slot must be spent on missing/stale evidence (or
        a policy-named standing keep) — a fresh green occupying a slot
        means the rotation wasn't applied this round."""
        eligible = (
            staleness["stale"] | staleness["never"] | STANDING_KEEPS
        )
        wasted = [q for q in window if q not in eligible]
        assert not wasted, (
            "window slots occupied by fresh greens (rotate in stale ones "
            f"instead): {wasted}"
        )
