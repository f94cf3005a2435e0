"""Driver-contract invariants in __spark_entry__ (no Spark needed)."""

from __future__ import annotations

import json
import os

import __spark_entry__ as entry
from healthcare_data_pipeline_spark.queries import catalog

DRIVER_WINDOW = 50  # observed driver correctness cap (VERDICT r02)


def _write_history(d, rnd, rows):
    with open(os.path.join(d, f"CORRECTNESS_r{rnd:02d}.json"), "w") as fh:
        json.dump(rows, fh)


def test_order_puts_never_verified_first(tmp_path):
    names = sorted(catalog())
    a, b, c = names[0], names[1], names[2]
    _write_history(
        str(tmp_path),
        1,
        {
            a: {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
            b: {"rows_match": False, "schema_match": False, "hash_match": False, "err": None},
        },
    )
    order = entry._catalog_order(names, history_dir=str(tmp_path))
    # b FAILED its check and c was never checked -> both rank before a
    assert order.index(b) < order.index(a)
    assert order.index(c) < order.index(a)


def test_no_oracle_history_counts_only_while_oracle_absent(tmp_path, monkeypatch):
    """Every real catalog entry now has an oracle (r4), so the rows-only
    branch is pinned against a synthetic two-entry catalog: a query that
    GAINED an oracle since its no_oracle row must rank as never-verified;
    a genuinely oracle-less one keeps its rows-only credit."""
    from types import SimpleNamespace

    import healthcare_data_pipeline_spark.queries as queries_mod

    fake = {
        "a_gained_oracle": SimpleNamespace(oracle="SELECT 1"),
        "b_still_unoracled": SimpleNamespace(oracle=None),
    }
    monkeypatch.setattr(queries_mod, "catalog", lambda: fake)
    rows = {
        n: {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": 5,
            "err": "no_oracle",
        }
        for n in fake
    }
    _write_history(str(tmp_path), 2, rows)
    order = entry._catalog_order(sorted(fake), history_dir=str(tmp_path))
    assert order.index("a_gained_oracle") < order.index("b_still_unoracled")


def test_whole_catalog_is_oracled():
    """r4 contract: the rows-only set is empty — every entry registers SQL."""
    assert all(q.oracle is not None for q in catalog().values())


def test_crashed_and_hash_failed_rows_sort_first(tmp_path):
    """The r3 q26 lesson: a row with a real err (crash) or hash_match=False is
    NOT coverage — it must rank ahead of green rows, not rotate out."""
    names = sorted(catalog())
    green, crashed, hash_failed, schema_failed = names[0], names[1], names[2], names[3]
    _write_history(
        str(tmp_path),
        1,
        {
            green: {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
            crashed: {
                "rows_match": None,
                "schema_match": None,
                "hash_match": None,
                "err": "AnalysisException: ...",
            },
            hash_failed: {
                "rows_match": True,
                "schema_match": True,
                "hash_match": False,
                "err": None,
            },
            schema_failed: {
                "rows_match": True,
                "schema_match": False,
                "hash_match": None,
                "err": None,
            },
        },
    )
    order = entry._catalog_order(names, history_dir=str(tmp_path))
    for broken in (crashed, hash_failed, schema_failed):
        assert order.index(broken) < order.index(green), broken


def test_stale_green_ranks_before_fresh_green(tmp_path):
    """Recency rotation: an entry last verified in r1 outranks an r2 one."""
    names = sorted(catalog())
    stale, fresh = names[0], names[1]
    green = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    _write_history(str(tmp_path), 1, {stale: green, fresh: green})
    _write_history(str(tmp_path), 2, {fresh: green})
    order = entry._catalog_order(names, history_dir=str(tmp_path))
    assert order.index(stale) < order.index(fresh)


def test_all_unverified_fit_driver_window():
    """Every entry without r01/r02 driver evidence must sit inside the
    50-slot window so CORRECTNESS_r03 covers the whole catalog tail."""
    import glob

    names = list(catalog())
    order = entry._catalog_order(names)  # real repo history files
    window = set(order[:DRIVER_WINDOW])
    verified = set()
    for p in glob.glob(os.path.join(os.path.dirname(entry.__file__), "CORRECTNESS_r*.json")):
        with open(p) as fh:
            verified |= set(json.load(fh))
    # only entries with prior driver evidence may sit outside the window
    assert set(names) - window <= verified


def test_oracle_sql_is_subset_with_matching_keys():
    qs = entry.queries()
    osql = entry.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(isinstance(s, str) and s.strip() for s in osql.values())


def test_verification_cadence_never_drifts_past_rotation_bound():
    """Cadence insurance (r6 task 8 / r7 task 2, bound parametrized r13):
    the driver window verifies DRIVER_WINDOW of the catalog entries per
    round, so with `_catalog_order` front-loading the least-recently-
    verified, steady state re-verifies every entry at worst every
    ceil(len(catalog)/DRIVER_WINDOW) rounds — i.e. no entry's last GREEN
    may be older than that many rounds minus one behind the newest history
    round.  The bound is DERIVED FROM THE LIVE CATALOG SIZE (the r12
    verdict's task 6): a hardcoded lag silently loosens (or falsely trips)
    as the catalog grows.  At 139 entries / window 50 the bound is 2 —
    exactly the t08-t13/t18 situation this test exists to catch (last
    green r5 while the history had reached r7 and r8 was underway).
    Entries with no history at all are new this round; they sort first in
    the window, so flagging them would just punish adding operators."""
    import glob
    import math
    import re

    here = os.path.dirname(os.path.abspath(entry.__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    assert rounds, "no CORRECTNESS history — driver has not run yet"
    current = max(rounds)
    max_lag = math.ceil(len(catalog()) / DRIVER_WINDOW) - 1
    recency = entry._verification_recency()
    stale = {
        name: last
        for name, last in sorted(recency.items())
        if name in catalog() and last < current - max_lag
    }
    assert not stale, (
        f"entries last driver-verified more than {max_lag} rounds before r{current} "
        f"(rotation bound ceil({len(catalog())}/{DRIVER_WINDOW})-1; window rotation "
        f"has stalled — check _catalog_order and catalog growth): {stale}"
    )
    # Rotation-capacity bound — an EXPLICIT policy decision, not an accident
    # (r13 verdict task 4): the catalog passed 3 windows in r14, and the
    # chosen policy is to RAISE the bound to four windows (cadence
    # ceil(n/50) <= 4 rounds per entry) rather than consolidate or freeze,
    # because tests/test_oracle_queries.py independently re-verifies every
    # entry against its DuckDB oracle on current code each round — the
    # driver window is corroborating evidence, not the only gate (README
    # "Correctness model").  Growth past FOUR windows needs a new decision.
    assert len(catalog()) <= 4 * DRIVER_WINDOW, "catalog outgrew the rotation cadence"


def test_plan_ledger_covers_every_catalog_entry():
    """PLANS.md self-enforcement (r13 verdict task 1): the plan-audit ledger
    is the repo's shuffle/BNLJ red-flag instrument, and in r13 it silently
    lagged the catalog by 7 entries (w01-w05, dd26, t39 had no row) —
    exactly the newest plans flying without it.  Every catalog entry must
    have a row in the PLANS.md table (or an explicit entry in its audit-
    failures section); regenerating is `python tools/plan_audit.py`."""
    import re

    here = os.path.dirname(os.path.abspath(entry.__file__))
    with open(os.path.join(here, "PLANS.md"), encoding="utf-8") as fh:
        text = fh.read()
    covered = set(re.findall(r"^\| (\S+) \|", text, flags=re.M)) | set(
        re.findall(r"^- `(\S+)`:", text, flags=re.M)
    )
    missing = sorted(set(catalog()) - covered)
    assert not missing, (
        f"catalog entries with no PLANS.md row (regenerate with "
        f"`python tools/plan_audit.py`): {missing}"
    )
