"""Streaming incremental dedup (stream_demo.streaming_incremental_
dedup): per-micro-batch dedup against the persisted MinHash index,
exactly-once across restarts."""

from __future__ import annotations

import os

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


def test_streaming_search_index_matches_oneshot_and_resumes(spark, tmp_path):
    """Postings streamed in per-file micro-batches must answer queries
    identically to one-shot indexing of the union corpus, and a
    restart (same checkpoint) must not duplicate postings."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from omni_crawler_spark import search as SE
    from omni_crawler_spark.search_index import SearchIndex
    from omni_crawler_spark.streaming.stream_demo import (
        streaming_search_index,
    )

    rows = [
        (1, "Market report", "the market is up", "market watch",
         "Ann Lee", "news.com"),
        (2, "Daily notes", "nothing relevant here", "misc",
         "Bo Chan", "blog.net"),
        (3, "About markets", "a marekt typo inside", "trade",
         "Cy Day", "news.com"),
        (4, "Plain title", "market market market", "x",
         "Di Eve", "market.org"),
    ]
    cols = ["doc_id", "title", "content", "key_phrases", "authors", "domain"]
    docs_dir = tmp_path / "in"
    docs_dir.mkdir()
    # one plain parquet FILE per micro-batch (file-stream source needs
    # files, not df.write directories)
    for i, half in enumerate((rows[:2], rows[2:])):
        pq.write_table(
            pa.table({c: [r[j] for r in half] for j, c in enumerate(cols)}),
            str(docs_dir / f"part-{i}.parquet"),
        )
    kw = dict(
        docs_dir=str(docs_dir),
        index_root=str(tmp_path / "index"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    streaming_search_index(spark, **kw).awaitTermination()
    ix = SearchIndex(str(tmp_path / "index"))
    docs = spark.createDataFrame(rows, ", ".join(
        f"{c} {'long' if c == 'doc_id' else 'string'}" for c in cols))
    for q in ("market", "marekt", "market relevant"):
        got = sorted(
            (r.doc_id, r.score) for r in ix.query(spark, q).collect()
        )
        want = sorted(
            (r.doc_id, r.score) for r in SE.multi_match(docs, q).collect()
        )
        assert got == want, q
    # restart over the same checkpoint: no new batches, no new
    # snapshots, identical answers
    v = ix.table.current_version()
    streaming_search_index(spark, **kw).awaitTermination()
    assert ix.table.current_version() == v
    assert sorted(
        (r.doc_id, r.score) for r in ix.query(spark, "market").collect()
    ) == sorted(
        (r.doc_id, r.score) for r in SE.multi_match(docs, "market").collect()
    )


def test_streaming_search_upsert_replaces_changed_docs(spark, tmp_path):
    """The streaming UPSERT path: a later micro-batch carrying a
    CHANGED version of an already-indexed doc replaces its postings
    (stale tokens stop matching); a restart over the same checkpoint
    is a no-op."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from omni_crawler_spark.search_index import SearchIndex
    from omni_crawler_spark.streaming.stream_demo import (
        streaming_search_upsert,
    )

    cols = ["doc_id", "title", "content", "key_phrases", "authors", "domain"]
    v1 = [
        (1, "Market report", "the market is up", "market watch",
         "Ann Lee", "news.com"),
        (2, "Daily notes", "nothing relevant here", "misc",
         "Bo Chan", "blog.net"),
    ]
    # doc 1 re-crawled with entirely new text
    v2 = [
        (1, "Garden report", "tulip prices fell", "garden watch",
         "Ann Lee", "news.com"),
    ]
    docs_dir = tmp_path / "in"
    docs_dir.mkdir()
    for i, batch in enumerate((v1, v2)):
        path = docs_dir / f"part-{i}.parquet"
        pq.write_table(
            pa.table({c: [r[j] for r in batch] for j, c in enumerate(cols)}),
            str(path),
        )
        # FileStreamSource orders files by MILLISECOND mtime; two
        # back-to-back writes can land in the same tick, making the
        # v1-before-v2 batch order (which this test depends on)
        # nondeterministic. Pin strictly increasing mtimes.
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    kw = dict(
        docs_dir=str(docs_dir),
        index_root=str(tmp_path / "index"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    streaming_search_upsert(spark, **kw).awaitTermination()
    ix = SearchIndex(str(tmp_path / "index"))

    def hits(q):
        return {
            r.doc_id for r in ix.query(spark, q, fuzziness=None).collect()
        }

    assert hits("market") == set()      # stale tokens dead
    assert hits("tulip") == {1}         # new tokens live
    assert hits("relevant") == {2}      # untouched doc intact
    # restart: no new snapshots on either leg, same answers
    v_post, v_tomb = ix.table.current_version(), ix.tomb.current_version()
    streaming_search_upsert(spark, **kw).awaitTermination()
    assert ix.table.current_version() == v_post
    assert ix.tomb.current_version() == v_tomb
    assert hits("market") == set() and hits("tulip") == {1}
