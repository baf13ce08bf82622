"""Machine-checks for bench.py's published-record rules.

The sf1.0 coverage rule is STICKY (r10 verdict ask #2): once an
entry's DuckDB twin has EVER measured >0.2 s in a committed
BENCH_DETAIL_r*.json sf0.1 pass, the entry belongs to the
--sf1-corpus coverage set permanently. r10 showed why a live-derived
rule is not enough: x142 (6.6x at sf0.1) and x194 (17.2x) — the two
worst work-dominated ratios in the whole record — had boundary twins
(0.20-0.23 s) that timed under the threshold in the pass that fixed
the corpus composition, so exactly the entries most in need of
at-scale adjudication silently left the record. This test recomputes
the ever-crossed union from the committed detail files, so adding a
new detail file that crosses a new entry FAILS the suite until the
entry is added to a coverage tuple.
"""

import glob
import json
import os

import bench

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _coverage_set():
    return (set(bench.SF1_CORPUS_QUERIES)
            | set(bench.SF1_WATCHLIST_QUERIES)
            | set(bench.SF1_EXTENSION_QUERIES)
            | set(bench.SF1_STICKY_QUERIES)
            | set(bench.SF1_FIXED_COST_QUERIES))


def test_sf1_coverage_is_sticky():
    ever = set()
    for path in sorted(glob.glob(os.path.join(_REPO,
                                              "BENCH_DETAIL_r*.json"))):
        with open(path) as fh:
            detail = json.load(fh)
        for name, wall in detail.get("corpus_duckdb_queries", {}).items():
            if wall > 0.2:
                ever.add(name)
    # streaming gates never enter the corpus bench
    ever -= set(bench._STREAM_GATES)
    missing = sorted(ever - _coverage_set())
    assert not missing, (
        "entries whose DuckDB twin measured >0.2 s in a committed "
        f"sf0.1 pass are missing from the sf1.0 coverage set: {missing} "
        "— add them to SF1_STICKY_QUERIES (coverage is one-way)")


def test_sf1_coverage_names_resolve():
    """Every name in the coverage tuples is a real registry entry —
    a typo'd sticky name would silently cover nothing."""
    pool = bench._corpus_query_map()
    unknown = sorted(n for n in _coverage_set() if n not in pool)
    assert not unknown, f"coverage names not in the registry: {unknown}"


def test_fixed_cost_section_is_one_way():
    """r11 verdict ask #7: fixed-cost membership gets the same one-way
    machine-check as sticky coverage — once an entry has been
    adjudicated into a committed BENCH_SF1_CORPUS_r*.json
    fixed_cost_queries section, it must stay in
    bench.SF1_FIXED_COST_QUERIES, so a later edit can never silently
    move a floor-ratio row back into the scaling rollups."""
    ever = set()
    for path in sorted(glob.glob(os.path.join(
            _REPO, "BENCH_SF1_CORPUS_r*.json"))):
        with open(path) as fh:
            ever |= set(json.load(fh).get("fixed_cost_queries", {}))
    missing = sorted(ever - set(bench.SF1_FIXED_COST_QUERIES))
    assert not missing, (
        "entries adjudicated fixed-cost in a committed sf1.0 pass are "
        f"missing from SF1_FIXED_COST_QUERIES: {missing} "
        "(membership is one-way)")


def test_over_2x_rows_are_adjudicated():
    """r11 verdict ask #1's done-criterion, machine-checked: in the
    NEWEST committed BENCH_SF1_CORPUS file, every row whose ratio
    exceeds 2x must be adjudicated — either a committed falling-ratio
    curve in a BENCH_FLOORPROOF_r*.json (ratio_fell at a larger SF)
    or membership in the fixed-cost section. Prose claims about
    floors don't count; only these two committed evidence shapes do."""
    corpus = sorted(glob.glob(os.path.join(
        _REPO, "BENCH_SF1_CORPUS_r*.json")))
    assert corpus, "no committed sf1.0 corpus record"
    with open(corpus[-1]) as fh:
        latest = json.load(fh)
    floorproofed = set()
    for path in glob.glob(os.path.join(_REPO, "BENCH_FLOORPROOF_r*.json")):
        with open(path) as fh:
            for name, row in json.load(fh).get("ratio_curve", {}).items():
                if row.get("ratio_fell"):
                    floorproofed.add(name)
    bad = sorted(
        name for name, row in latest.get("queries", {}).items()
        if (row.get("ratio") or 0) > 2
        and name not in floorproofed
        and name not in bench.SF1_FIXED_COST_QUERIES)
    assert not bad, (
        f">2x sf1.0 rows with no committed adjudication: {bad} — "
        "run bench.py --floor-proof (falling ratio at sf10) or "
        "dissect into the fixed-cost section")
