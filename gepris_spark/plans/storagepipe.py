"""Storage-side deduplication: content-defined chunking (CDC).

A crawl store at 10^10 URLs does not deduplicate at document
granularity only — WARC stores, CAS blob stores and backup systems
(LBFS/Venti/restic lineage) split every payload at CONTENT-DEFINED
boundaries so that shared runs between near-identical revisions land
in identical chunks regardless of byte offsets, and the store keeps
one copy per chunk digest. This module profiles exactly that over the
`documents` table: gear-style boundaries on the token stream, chunk
digests, global first-occurrence ownership, and the per-source
dedup ratio the storage planner would use to size the chunk store.

Reference tie-in: the reference crawler stores full page snapshots per
run and deduplicates only via whole-item change detection
(`/root/reference/gepris_crawler/database.py` insert-if-changed,
mirrored by operators/history.py); re-crawled pages that changed one
attribute re-store the whole document. Chunk-level dedup is what
replaces that at web scale.

Engine-neutral determinism (same discipline as plans/datapipe.py):
tokenization = the shared `[a-z0-9]+` regex, boundary decision =
hash60('cdc:'||token) % D == 0, digest = md5 of the space-joined
chunk text — every formula restated verbatim in the DuckDB oracle.

Scale shape: the boundary flag is scan-side; the chunk-id assignment
is ONE window partitioned by doc_id (never a global ORDER BY — a doc
is the unit of sequential dependence, exactly like the per-host visit
sequencing in operators/politeness.py); chunk assembly reuses the
doc-partitioned exchange; first-occurrence ownership is one shuffle
on the digest (linear, the same key the chunk store itself shards
by); the per-source rollup is a partial-agg groupBy over O(sources)
rows. No all-pairs, no Python rows.

Byte-level production note: real CDC runs a rolling hash over BYTES
with min/avg/max chunk bounds (FastCDC). Token granularity keeps the
whole computation inside whole-stage codegen and bit-identical across
engines; the plan shape (scan-side boundary, per-doc window, digest
shuffle) is unchanged by the rolling-hash swap, which would live in a
mapInPandas stage exactly like the codec stages in
operators/multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gepris_spark.functions import textstats as TS
from gepris_spark.plans.relational import load

# Expected chunk length in tokens: a token terminates its chunk when
# hash60('cdc:'||tok) % _CDC_D == 0, so chunks average ~_CDC_D tokens.
_CDC_D = 16
# first-occurrence key = doc_id * _CDC_KEYSPACE + chunk_id; chunk_id is
# bounded by the doc's token count, far under this.
_CDC_KEYSPACE = 1_000_000


def q_storage_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source chunk-store dedup profile under content-defined
    chunking: how many chunks, how many distinct digests, how many
    copies a digest-addressed store would NOT re-store, and the token
    savings in basis points. `dup_copies` counts chunks whose digest
    was first minted by an earlier (doc_id, chunk_id) anywhere in the
    corpus — the store-wide view, so near-duplicate documents landing
    in different sources still share storage."""
    toks = (
        load(spark, sf_dir, "documents", spread=True)
        .select("doc_id", "source", F.posexplode(TS.tokens(F.col("text"))).alias("pos0", "tok"))
        .select(
            "doc_id",
            "source",
            (F.col("pos0") + 1).alias("pos"),
            "tok",
            (TS.hash60(F.concat(F.lit("cdc:"), F.col("tok"))) % _CDC_D == 0)
            .cast("long")
            .alias("is_boundary"),
        )
    )
    # chunk_id = boundaries strictly before this position: the boundary
    # token is the LAST token of the chunk it closes (standard CDC cut
    # placement), and the tail after the final boundary is its own chunk.
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = toks.withColumn("chunk_id", F.coalesce(F.sum("is_boundary").over(w), F.lit(0)))
    chunks = (
        assigned.groupBy("doc_id", "source", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("digest"),
        )
        .withColumn("key", F.col("doc_id") * _CDC_KEYSPACE + F.col("chunk_id"))
    )
    first = chunks.groupBy("digest").agg(F.min("key").alias("first_key"))
    return (
        chunks.join(first, "digest")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count_distinct(F.col("digest")).alias("distinct_digests"),
            F.sum((F.col("key") != F.col("first_key")).cast("long")).alias("dup_copies"),
            F.sum("n_tokens").alias("tokens_total"),
            F.sum(
                F.when(F.col("key") != F.col("first_key"), F.col("n_tokens")).otherwise(0)
            ).alias("tokens_saved"),
        )
        .select(
            "source",
            "n_chunks",
            "distinct_digests",
            "dup_copies",
            "tokens_total",
            "tokens_saved",
            F.expr("CAST((tokens_saved * 10000) DIV tokens_total AS BIGINT)").alias("dedup_bp"),
            F.expr("CAST((tokens_total * 1000) DIV n_chunks AS BIGINT)").alias(
                "avg_chunk_millitok"
            ),
        )
        .orderBy("source")
    )


_SQL_TOKENS_STORAGE = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def _sql_cdc_chunks() -> str:
    h = "('0x' || substr(md5('cdc:' || tok), 1, 15))::BIGINT"
    return f"""
WITH t AS (SELECT doc_id, source, {_SQL_TOKENS_STORAGE} AS toks FROM documents),
p AS (SELECT doc_id, source, u.pos, toks[u.pos] AS tok
      FROM t, unnest(generate_series(1, len(toks))) AS u(pos)),
b AS (SELECT doc_id, source, pos, tok,
             CASE WHEN {h} % {_CDC_D} = 0 THEN 1 ELSE 0 END AS is_boundary
      FROM p),
a AS (SELECT doc_id, source, pos, tok,
             coalesce(sum(is_boundary) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
      FROM b),
c AS (SELECT doc_id, source, chunk_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS digest,
             doc_id * {_CDC_KEYSPACE} + chunk_id AS key
      FROM a GROUP BY doc_id, source, chunk_id),
f AS (SELECT digest, min(key) AS first_key FROM c GROUP BY digest),
s AS (SELECT source,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(count(DISTINCT c.digest) AS BIGINT) AS distinct_digests,
             CAST(sum(CASE WHEN c.key <> f.first_key THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_copies,
             CAST(sum(c.n_tokens) AS BIGINT) AS tokens_total,
             CAST(sum(CASE WHEN c.key <> f.first_key THEN c.n_tokens ELSE 0 END) AS BIGINT)
               AS tokens_saved
      FROM c JOIN f USING (digest) GROUP BY source)
SELECT source, n_chunks, distinct_digests, dup_copies, tokens_total, tokens_saved,
       (tokens_saved * 10000) // tokens_total AS dedup_bp,
       (tokens_total * 1000) // n_chunks AS avg_chunk_millitok
FROM s ORDER BY source
"""


SQL_STORAGE_CDC_CHUNKS = _sql_cdc_chunks()


STORAGEPIPE_QUERIES = {
    "storage_cdc_chunks": (q_storage_cdc_chunks, SQL_STORAGE_CDC_CHUNKS),
}
