"""io.tables: parquet/jsonl round-trips, column projection, iceberg gate."""

from __future__ import annotations

from nemo_curator_spark.io import tables


def test_parquet_roundtrip_and_projection(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, s string, v double"
    )
    path = str(tmp_path / "t.parquet")
    tables.write_table(df, path)
    back = tables.read_table(spark, path, fields=["id", "s"])
    assert back.columns == ["id", "s"]
    assert back.count() == 2


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    path = str(tmp_path / "out.jsonl")
    tables.write_table(df, path, fmt="jsonl")
    back = tables.read_table(spark, path + "/*.json")
    assert back.count() == 1


def test_iceberg_gate_reports_absent(spark):
    # this image ships no iceberg jar; the gate must say so (not crash)
    assert tables.has_iceberg(spark) is False


def test_corpus_cache_layout_has_enough_splits(spark, tmp_path):
    """Parquet splits cannot cross row-group boundaries, so the corpus
    cache must span >= 64 files or every downstream scan is task-capped
    (the round-3 parallelism bug: 17 single-row-group files capped
    local[32] at ~6 effective cores)."""
    import glob

    from nemo_curator_spark import synth

    path = str(tmp_path / "corpus")
    synth.ensure_web_pages_parquet(spark, path, 600, chunk_size=100)
    files = [f for f in glob.glob(path + "/*.parquet")]
    assert len(files) >= 64
    assert spark.read.parquet(path).count() == 600
