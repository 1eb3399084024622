"""Driver-evaluation-window invariant (VERDICT r03 "what's wrong" #1).

The driver evaluates only the first ~50 registry queries per round. Twice
(r02, r03) new operators shipped past that window and never received a
correctness row. This test makes overflow a hard failure: every registered
query must either sit inside the first DRIVER_WINDOW entries of
all_queries() or already hold an evaluated row (any status) in some
CORRECTNESS_r*.json at the repo root.
"""

from __future__ import annotations

import glob
import json
import os

from docling_api_ray import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _evaluated_ever() -> set[str]:
    seen: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            seen.update(json.load(f).keys())
    return seen


def test_every_query_in_window_or_already_evaluated():
    queries = registry.all_queries()
    window = set(list(queries)[: registry.DRIVER_WINDOW])
    evaluated = _evaluated_ever()
    orphans = [k for k in queries if k not in window and k not in evaluated]
    assert not orphans, (
        f"{len(orphans)} queries are outside the driver's first-"
        f"{registry.DRIVER_WINDOW} window and have never been evaluated: "
        f"{orphans}. Rotate repeatedly-green entries out of the window in "
        f"registry._PRIORITY to make room."
    )


def test_priority_names_are_registered():
    # A typo'd name in _PRIORITY silently drops out of ordering; catch it.
    # (Names for not-yet-implemented queries are allowed only if flagged.)
    queries = registry.all_queries()
    unknown = [k for k in registry._PRIORITY if k not in queries]
    allowed_pending: set[str] = set()
    assert set(unknown) <= allowed_pending, f"unknown _PRIORITY names: {unknown}"


def test_oracle_keys_subset_of_queries():
    queries = registry.all_queries()
    oracles = registry.all_oracles()
    extra = [k for k in oracles if k not in queries]
    assert not extra, f"oracles without matching queries: {extra}"
