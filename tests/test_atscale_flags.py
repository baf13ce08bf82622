"""Flag contract: the SPARK_GRAFT_APPROX_QUANTILES=1 at-scale
spellings must stay ORACLE-green, not just equal-to-flag-off.

The gate corpus (driver + selfcheck) runs flag-OFF, so without this
suite the flag-ON paths could silently rot and CI would stay green
(r9 verdict ask #8). This runs every exact flag-gated registry entry
against its own DuckDB oracle in ONE session with the flag on — the
same hash bar the driver applies to the flag-off spellings.

x179 (PSI drift) is deliberately NOT here: its flag-on path is a
percentile_approx sketch with a bounded rank error, not a
value-identical swap — tests/test_ranks.py pins its error bound.
"""

from __future__ import annotations

import pytest

# registry key -> (module, function) for every entry whose flag-on
# path is an EXACT range-partitioned/closed-form swap. Keep in sync
# with the SPARK_GRAFT_APPROX_QUANTILES grep; test_flag_list_is_exhaustive
# fails if a new flag site appears without a row here.
EXACT_FLAG_ENTRIES = {
    "x95_quality_dup_calibration": ("pipeline_queries",
                                    "_x95_quality_dup_calibration"),
    "x152_qq_alignment": ("analytics_queries", "_x152_qq_alignment"),
    "x155_gaps_islands": ("analytics_queries", "_x155_gaps_islands"),
    "x162_curriculum_schedule": ("analytics_queries",
                                 "_x162_curriculum_schedule"),
    "x187_watermark_lateness": ("analytics_queries",
                                "_x187_watermark_lateness"),
    "x188_rfm_segments": ("analytics_queries", "_x188_rfm_segments"),
    "x200_quantile_normalize": ("analytics_queries",
                                "_x200_quantile_normalize"),
    "x228_sequence_packing": ("audit_queries", "_x228_sequence_packing"),
}

#: flag-gated but approximate by design (sketch, bounded error) —
#: excluded from the oracle hash bar, still counted by exhaustiveness.
SKETCH_FLAG_FUNCTIONS = {"_decile_edges"}


@pytest.mark.parametrize("name", sorted(EXACT_FLAG_ENTRIES))
def test_flag_on_matches_oracle(name, spark, tables, duck, monkeypatch):
    import importlib

    from tests.oracle import compare
    mod_name, fn_name = EXACT_FLAG_ENTRIES[name]
    mod = importlib.import_module(f"hive_parse_lineage_spark.{mod_name}")
    fn = getattr(mod, fn_name)
    oracle = getattr(mod, f"{mod_name.split('_')[0]}_oracle_sql",
                     None)
    if oracle is None or name not in oracle():
        pytest.fail(f"{name}: no oracle entry")
    monkeypatch.setenv("SPARK_GRAFT_APPROX_QUANTILES", "1")
    res = compare(fn(spark, tables), oracle()[name], duck)
    assert res["hash_match"], (name, res)


def test_flag_list_is_exhaustive():
    """Every function body reading SPARK_GRAFT_APPROX_QUANTILES must
    be either in EXACT_FLAG_ENTRIES (oracle-gated flag-on above) or in
    SKETCH_FLAG_FUNCTIONS (documented approximate). A new flag site
    without a row here fails this test instead of silently escaping
    the flag-on gate."""
    import os
    import re
    pkg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "hive_parse_lineage_spark")
    covered = ({fn for _, fn in EXACT_FLAG_ENTRIES.values()}
               | SKETCH_FLAG_FUNCTIONS)
    flagged = set()
    for root, _, files in os.walk(pkg):
        for f in files:
            if not f.endswith(".py"):
                continue
            src = open(os.path.join(root, f)).read()
            cur = None
            for line in src.split("\n"):
                m = re.match(r"def (\w+)\(", line)
                if m:
                    cur = m.group(1)
                if ("SPARK_GRAFT_APPROX_QUANTILES" in line
                        and "environ" in line):
                    flagged.add(cur)
    assert flagged, "flag sites vanished — update this test"
    assert flagged <= covered, flagged - covered
