"""Persisted, incrementally-maintained inverted search index.

The reference never rebuilds its search index per query: Elasticsearch
maintains it continuously — every stored article is indexed at save
time (src/storage/omni_storage.py:88-135 defines the mapping; each
save indexes the doc) and src/search/advanced_search.py:15-39 only
ever PROBES it. ``search.multi_match`` built the token index inline
per invocation, which is correct but pays the full corpus
explode+distinct on every query — the amortization that justifies an
inverted index never happened (measured: the indexed plan was +24%
vs the scan it replaced at sf0.1).

:class:`SearchIndex` is the missing persistence layer, the same shape
as the MinHash/IVF incremental indexes (operators/dedup_incremental.py,
operators/ivf.py):

- ``bootstrap`` pays the one-time corpus tokenization and commits the
  postings ``(tok, fld, boost10, doc_id, gen)`` to a
  :class:`SnapshotTable` under an idempotent ``op_id`` — replays and
  concurrent sessions resolve to one copy;
- ``index_batch`` appends postings for NEW docs only — O(batch) per
  crawl cycle, the ES save-time indexing analog;
- ``reindex`` / ``delete`` give the index the reference's
  replace-by-id semantics (every reference sink replaces: ES doc_id =
  article_id omni_storage.py:275-296, PG ``ON CONFLICT DO UPDATE``
  :137-205, SQLite ``INSERT OR REPLACE`` :410-464) via DELETION
  VECTORS: postings carry a generation number and a tiny tombstone
  table records, per re-indexed doc, the minimum live generation —
  a probe anti-filters stale postings through one BROADCAST join of
  the tombstones (O(#docs-reindexed-since-compaction), not O(corpus))
  and ``compact`` folds the vectors away. This is the Iceberg/Delta
  merge-on-read deletion-vector pattern, chosen over rewrite-on-
  reindex because a re-crawl touches a tiny fraction of a 10^10-doc
  corpus per cycle and must not rewrite corpus-sized postings;
- ``query`` probes the persisted postings: fuzzy-expands the terms
  against the distinct-token vocabulary (Heaps'-law small), one
  broadcast equi-join back into the postings — the corpus-sized side
  never sees an edit distance, and the corpus text is never re-read;
- ``compact`` folds the append-per-cycle dirs into one snapshot with
  tombstones applied (read-amplification bound, same as every other
  index here).

100 TB shape: the postings table is bucketed by ``tok`` so a probe
prunes to the touched buckets; the vocabulary is the distinct ``tok``
of a dictionary-encoded parquet column — a metadata-cheap scan that
never touches document text; tombstones stay broadcast-sized between
compactions because re-crawled-and-changed docs per maintenance
window are a sliver of the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omni_crawler_spark.lakehouse.table import (
    SnapshotTable,
    ensure_params_marker,
)
from omni_crawler_spark.search import (
    DEFAULT_FIELDS,
    _parse_terms,
    build_inverted_index,
    multi_match_indexed,
)

# tombstone min_gen for a plain delete: no future generation of the
# doc exists, so every posting is stale
_DELETED = 2**31 - 1


class SearchIndex:
    """Persisted postings ``(tok, fld, boost10, <id_col>, gen)`` with
    incremental maintenance and replace-by-id re-indexing. ``fields``
    ({column: boost×10}) is fixed per index root — postings indexed
    under one boost config are not comparable to another, so opening
    an existing root with different params fails loudly (the
    MinHashIndex signature-marker contract).
    """

    def __init__(
        self,
        root: str,
        fields: dict[str, int] | None = None,
        id_col: str = "doc_id",
    ):
        self.table = SnapshotTable(root, name="inverted_index")
        # deletion vectors: (<id_col>, min_gen) — postings of a doc
        # with gen < its max tombstoned min_gen are dead
        self.tomb = SnapshotTable(
            os.path.join(root, "tombstones"), name="inverted_index_tomb"
        )
        self.fields = fields or dict(DEFAULT_FIELDS)
        self.id_col = id_col
        params = {"fields": self.fields, "id_col": id_col}
        ensure_params_marker(
            os.path.join(root, "index_params.json"), params, "search index"
        )

    def _next_gen(self) -> int:
        return self.table.current_version() + 1

    def _postings_for(self, docs: DataFrame, gen: int) -> DataFrame:
        return build_inverted_index(docs, self.fields, self.id_col).withColumn(
            "gen", F.lit(gen)
        )

    def bootstrap(
        self, spark: SparkSession, docs: DataFrame, op_id: str | None = None
    ) -> None:
        """Index an existing corpus (one-time backfill); idempotent
        under ``op_id``."""
        self.table.append(
            self._postings_for(docs, self._next_gen()), op_id=op_id
        )

    def index_batch(
        self, spark: SparkSession, docs: DataFrame, op_id: str | None = None
    ) -> None:
        """Append postings for a batch of NEW docs — O(batch) per
        cycle, never a corpus re-tokenize. Caller guarantees the ids
        are new (the crawl pipeline's seen-filter already does); for
        a CHANGED known doc use :meth:`reindex`, which tombstones the
        stale postings instead of letting them match forever."""
        self.table.append(
            self._postings_for(docs, self._next_gen()), op_id=op_id
        )

    def reindex(
        self, spark: SparkSession, docs: DataFrame, op_id: str | None = None
    ) -> None:
        """Replace the indexed postings of ``docs`` (re-crawled,
        changed pages) — the PG ``ON CONFLICT DO UPDATE`` analog.
        O(batch): new postings are appended at a fresh generation and
        one tombstone row per doc marks every older generation dead;
        no corpus-sized rewrite happens (``compact`` folds later).
        Idempotent under ``op_id`` (each leg carries a derived op_id;
        replay after a crash between the two commits converges). A
        crash after the postings commit but before the tombstone
        commit leaves BOTH generations matching until the replay —
        transient duplicate hits, never lost docs."""
        gen = self._next_gen()
        self.table.append(
            self._postings_for(docs, gen),
            op_id=None if op_id is None else f"{op_id}-post",
        )
        self.tomb.append(
            docs.select(F.col(self.id_col)).distinct().withColumn(
                "min_gen", F.lit(gen)
            ),
            op_id=None if op_id is None else f"{op_id}-tomb",
        )

    def delete(
        self, spark: SparkSession, ids: DataFrame, op_id: str | None = None
    ) -> None:
        """Drop docs from the index (pages gone on re-crawl — the
        SQLite/ES delete-by-id analog): one tombstone row per id, no
        postings touched until ``compact``."""
        self.tomb.append(
            ids.select(F.col(self.id_col)).distinct().withColumn(
                "min_gen", F.lit(_DELETED)
            ),
            op_id=op_id,
        )

    def compact(self, spark: SparkSession, op_id: str | None = None) -> int:
        """Fold append-per-cycle data dirs into one snapshot with the
        deletion vectors APPLIED (stale/deleted postings physically
        dropped, tombstones cleared). Crash between the two commits is
        safe: re-applying tombstones to already-resolved postings is
        a no-op (every surviving row's gen >= its tombstone floor)."""
        if self.tomb.is_empty():
            return self.table.rewrite(spark, op_id=op_id)
        live = self._live(spark, keep_gen=True)
        v = self.table.overwrite(
            live, op_id=None if op_id is None else f"{op_id}-post"
        )
        self.tomb.overwrite(
            self.tomb.read(spark).limit(0),
            op_id=None if op_id is None else f"{op_id}-tomb",
        )
        return v

    def _live(self, spark: SparkSession, keep_gen: bool = False) -> DataFrame:
        """Postings minus deletion-vector casualties. The tombstone
        side is broadcast (it is O(#reindexed-since-compaction), tiny
        by construction); the postings side streams — no shuffle."""
        df = self.table.read(spark)
        if "gen" not in df.columns:  # pre-deletion-vector root
            df = df.withColumn("gen", F.lit(0))
        gen = F.coalesce(F.col("gen"), F.lit(0))
        if self.tomb.is_empty():
            out = df
        else:
            floors = (
                self.tomb.read(spark)
                .groupBy(self.id_col)
                .agg(F.max("min_gen").alias("_floor"))
            )
            out = (
                df.join(F.broadcast(floors), self.id_col, "left")
                .filter(
                    F.col("_floor").isNull() | (gen >= F.col("_floor"))
                )
                .drop("_floor")
            )
        return out if keep_gen else out.drop("gen")

    def postings(self, spark: SparkSession) -> DataFrame:
        """The LIVE posting rows (deletion vectors applied)."""
        return self._live(spark)

    def query(
        self,
        spark: SparkSession,
        query: str,
        fuzziness: str | None = "AUTO",
        size: int = 20,
    ) -> DataFrame:
        """Probe the persisted index — identical results to
        ``search.multi_match`` over the same corpus (pytest-pinned),
        without ever re-reading or re-tokenizing document text."""
        term_df = _parse_terms(spark, query, fuzziness)
        return multi_match_indexed(
            self.postings(spark), term_df, id_col=self.id_col, size=size
        )
