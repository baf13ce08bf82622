"""Multimodal column plumbing tests — metadata sniffing, Arrow batch
shape through mapInPandas, byte-histogram featurizer vs NumPy oracle."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.default_rng(7)
    rows = [
        (0, b"\x89PNG\r\n\x1a\n" + rng.bytes(100)),
        (1, b"\xff\xd8\xff\xe0" + rng.bytes(50)),
        (2, b"RIFF" + rng.bytes(64)),
        (3, rng.bytes(32)),
        (4, b""),
    ]
    return spark.createDataFrame(rows, "item_id long, content binary")


def test_sniff_metadata(spark, blobs):
    from hive_parse_lineage_spark.operators.multimodal import sniff_metadata
    got = {r["item_id"]: (r["meta"]["mime"], r["meta"]["size_bytes"])
           for r in sniff_metadata(blobs).collect()}
    assert got[0] == ("image/png", 108)
    assert got[1] == ("image/jpeg", 54)
    assert got[2] == ("audio/wav", 68)
    assert got[3][0] == "application/octet-stream"
    assert got[4] == ("application/octet-stream", 0)


def test_byte_histogram_vs_numpy(spark, blobs):
    from hive_parse_lineage_spark.operators.multimodal import (
        N_HISTOGRAM_BINS, byte_histogram_features)
    got = {r["item_id"]: r["features"]
           for r in byte_histogram_features(blobs).collect()}
    for r in blobs.collect():
        arr = np.frombuffer(bytes(r["content"]), dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=N_HISTOGRAM_BINS).astype(float)
        want = (hist / hist.sum()) if hist.sum() else hist
        assert got[r["item_id"]] == pytest.approx(want.tolist())
    assert all(len(f) == N_HISTOGRAM_BINS for f in got.values())


def test_metadata_only_query_prunes_content(spark, blobs):
    """A meta-only projection must not carry the binary column through
    the plan (column pruning — matters when blobs are TB-scale)."""
    from hive_parse_lineage_spark.operators.multimodal import sniff_metadata
    df = sniff_metadata(blobs).select("item_id", "meta.mime")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "meta" not in plan.split("Project")[0]  # top projection is narrow
    assert df.count() == 5


def test_decode_image_is_contracted_stub(spark, blobs):
    from hive_parse_lineage_spark.operators.multimodal import decode_image
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present; stub contract not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError) as e:
        decode_image(blobs)
    assert "schema contract" in str(e.value)


def test_decode_audio_and_frames_are_contracted_stubs(spark, blobs):
    from hive_parse_lineage_spark.operators.multimodal import (
        decode_audio, sample_frames,
    )
    for fn in (decode_audio, sample_frames):
        try:
            fn(blobs)
            raised = False
        except NotImplementedError as e:
            raised = True
            assert "schema contract" in str(e)
        assert raised


def test_engine_table_columns(spark, tables):
    from hive_parse_lineage_spark.engine import Engine
    eng = Engine(spark, register_tables=False)
    assert eng.table_columns("region") == ["r_regionkey", "r_name"]
