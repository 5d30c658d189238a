"""Streaming incremental dedup (stream_demo.streaming_incremental_
dedup): per-micro-batch dedup against the persisted MinHash index,
exactly-once across restarts."""

from __future__ import annotations

from pyspark.sql import functions as F

from omni_crawler_spark.operators.dedup_incremental import MinHashIndex
from omni_crawler_spark.streaming.stream_demo import (
    streaming_incremental_dedup,
)

SF = "/root/testdata/sf0.001"


def _run(spark, tmp_path):
    return streaming_incremental_dedup(
        spark,
        docs_dir=str(tmp_path / "in"),
        index_root=str(tmp_path / "index"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        kept_dir=str(tmp_path / "kept"),
    )


def test_stream_dedups_across_microbatches_and_resumes(spark, tmp_path):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 160))
    )
    (tmp_path / "in").mkdir()

    def _write_file(df, name):
        # single parquet FILE (not a directory) — the file stream
        # source treats each file as an arrival
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.Table.from_pandas(df.toPandas()),
            str(tmp_path / "in" / name),
        )

    # file A: 60 originals; file B: exact copies under shifted ids —
    # whichever file becomes micro-batch 0, exactly one member of
    # each copy pair may survive overall
    _write_file(docs, "a.parquet")
    _write_file(
        docs.select((F.col("doc_id") + 300000).alias("doc_id"), "text"),
        "b.parquet",
    )

    q = _run(spark, tmp_path)
    q.awaitTermination(120)

    kept = spark.read.option("basePath", str(tmp_path / "kept")).parquet(
        str(tmp_path / "kept")
    )
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    # near-dup cliques inside the originals ({114 ~ 89 is outside this
    # range}; measured: none within 100-159) -> 60 distinct contents,
    # each copy pair resolves to exactly one survivor
    assert len(kept_ids) == 60
    for base in range(100, 160):
        assert (base in kept_ids) != (base + 300000 in kept_ids)

    ix = MinHashIndex(str(tmp_path / "index"), shingle_k=14, threshold=0.9)
    v_before = ix.table.current_version()

    # restart with the same checkpoint: nothing new -> no-op
    q2 = _run(spark, tmp_path)
    q2.awaitTermination(120)
    assert ix.table.current_version() == v_before

    # a third file of copies of EVERYTHING seen must drop entirely
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(
            docs.select(
                (F.col("doc_id") + 600000).alias("doc_id"), "text"
            ).toPandas()
        ),
        str(tmp_path / "in" / "c.parquet"),
    )
    q3 = _run(spark, tmp_path)
    q3.awaitTermination(120)
    kept_after = spark.read.option(
        "basePath", str(tmp_path / "kept")
    ).parquet(str(tmp_path / "kept"))
    assert {r.doc_id for r in kept_after.select("doc_id").collect()} == (
        kept_ids
    )
