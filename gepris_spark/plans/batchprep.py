"""Training-batch preparation operators (session 6): statistical-LM
quality scoring and bucketed batch packing for text and images.

Three contract queries, each with a full DuckDB oracle mirror:

* `text_lm_perplexity` — CCNet-style corpus-LM quality signal: train an
  add-one-smoothed bigram LM on the corpus itself, score every document
  by mean bigram negative-log-likelihood, gate on a threshold. The
  standard statistical quality filter a 100 TB pipeline runs before any
  neural scoring (Wenzek et al. 2019, CCNet).
* `corpus_length_buckets` — sequence-length bucketed batch packing:
  documents binned to power-of-two token-length buckets, each bucket
  packed into batches with a constant *token* budget (longer sequences
  -> smaller batches), the deterministic assignment a padded-batch
  dataloader consumes.
* `image_aspect_buckets` — SDXL-style aspect-ratio bucketing over the
  input_hint image catalog: each image is assigned the nearest aspect
  bucket (integer cross-multiplication argmin — no float aspect ratios
  anywhere near the decision), then packed into fixed-size batches per
  bucket.

Cross-engine discipline (same as plans/trainprep.py): the sole libm
call (`ln`) is snapped to integer micro-units immediately, every sum a
BIGINT (addition-order invariant), bucket argmins computed from ONE
generated SQL expression string evaluated by both engines, and every
computed column aliased identically on both sides.

Scale notes live on each operator; the shared theme is `bucketed_pack`:
a per-bucket global sequence that is NEVER a single-partition window —
range-partition on (bucket, order key), per-partition counts to the
driver (O(partitions x buckets) rows), exclusive prefix offsets
broadcast back as a literal map, window partitioned by (partition id,
bucket). Same pattern as datapipe.q_pack_sequences and the crawl's
visit ordering (operators/politeness.py).

No reference counterpart: the reference crawler trains nothing; these
are beyond-reference training-data operators over the driver testdata
and the input_hint catalog fixture.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gepris_spark import cacheutil
from gepris_spark.functions import textstats as TS
from gepris_spark.plans.imagepipe import _SQL_CATALOG, load_catalog
from gepris_spark.plans.relational import load

_SQL_TOKENS = "regexp_extract_all(lower(text), '[a-z0-9]+')"


# ------------------------------------------------------------------
# shared: skew-free bucketed batch packing
# ------------------------------------------------------------------
def bucketed_pack(
    df: DataFrame,
    bucket_col: str,
    order_col: str,
    batch_sizes: dict[int, int],
) -> DataFrame:
    """Assign every row a (batch_id, slot, full_batch) within its
    bucket, ordered by `order_col`, with `batch_sizes[bucket]` rows per
    batch.

    The per-bucket global sequence avoids the single-partition-window
    trap: range-partition on (bucket, order key) so each partition
    holds a contiguous slice of at most a few buckets, collect the
    O(partitions x buckets) per-(partition, bucket) counts, compute
    exclusive prefix offsets driver-side, and broadcast them back as a
    literal map keyed "pid|bucket". The row_number window is then
    partitioned by (_pid, bucket) — bounded by the partition size, no
    skew no matter how large one bucket grows. `full_batch` comes free:
    the driver already holds per-bucket totals.

    The input must carry an integer-valued `bucket_col`; rows whose
    bucket is missing from `batch_sizes` raise (a silent default would
    desync the oracle). The returned frame keeps the range layout
    persisted (cacheutil-tracked; callers own release, same contract as
    datapipe.q_pack_sequences).
    """
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    ranged = cacheutil.track(
        df.repartitionByRange(n, F.col(bucket_col).asc(), F.col(order_col).asc())
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = (
        ranged.groupBy("_pid", bucket_col).agg(F.count(F.lit(1)).alias("c")).collect()
    )
    per_bucket: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for r in counts:
        b = int(r[bucket_col])
        if b not in batch_sizes:
            raise ValueError(f"bucketed_pack: bucket {b} has no batch size")
        per_bucket[b].append((int(r["_pid"]), int(r["c"])))
    offsets: dict[str, int] = {}
    totals: dict[int, int] = {}
    for b, lst in per_bucket.items():
        acc = 0
        for pid, c in sorted(lst):
            offsets[f"{pid}|{b}"] = acc
            acc += c
        totals[b] = acc
    key = F.concat_ws(
        "|", F.col("_pid").cast("string"), F.col(bucket_col).cast("long").cast("string")
    )
    if offsets:
        off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])[key]
    else:
        off = F.lit(0)
    bsize = F.create_map(
        *[F.lit(x) for b, s in sorted(batch_sizes.items()) for x in (b, s)]
    )[F.col(bucket_col).cast("long")]
    nfull = F.create_map(
        *[
            F.lit(x)
            for b in sorted(totals)
            for x in (b, totals[b] // batch_sizes[b])
        ]
    )[F.col(bucket_col).cast("long")]
    win = Window.partitionBy("_pid", bucket_col).orderBy(F.col(order_col).asc())
    seq0 = (F.row_number().over(win) - 1 + F.coalesce(off, F.lit(0))).cast("long")
    return (
        ranged.withColumn("_seq0", seq0)
        .withColumn("batch_id", F.floor(F.col("_seq0") / bsize).cast("long"))
        .withColumn("slot", (F.col("_seq0") % bsize).cast("long"))
        .withColumn("full_batch", F.col("batch_id") < nfull)
        .drop("_pid", "_seq0")
    )


# ------------------------------------------------------------------
# text_lm_perplexity — bigram-LM quality scoring (CCNet-style)
# ------------------------------------------------------------------
_LM_ALPHA = 1  # add-one smoothing
# keep gate on mean bigram NLL (nats): documents whose text re-uses the
# corpus's frequent bigrams (boilerplate, near-dup clusters) score low
# and pass; high-entropy token soup scores high and is dropped
_LM_KEEP_MAX_NLL = 3.39


def q_text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM perplexity quality gate (CCNet, Wenzek et al. 2019):
    train an add-one bigram LM on the corpus, score each document by
    mean bigram NLL, keep documents under the threshold. Output one row
    per doc: (doc_id, n_bigrams, nll_micro_sum, mean_nll, kept).

    Shape at 100 TB: tokenization and the bigram arrays are scan-side
    (array slice+zip, no join builds the n-grams). Model training is
    ONE corpus shuffle — groupBy(bigram) with map-side partial
    aggregation — and the prefix counts c1(w1) are a second aggregate
    over the (already tiny) bigram-count table, never a second corpus
    pass. V is an exact distinct over tokens here; at real scale the
    same plan takes approx_count_distinct without touching anything
    else. Scoring joins bigram instances to the model on the bigram key
    (equi-join; the model side is vocab-squared — too big to broadcast,
    so both sides shuffle on `bg` once) and the per-doc sum partials
    map-side after the join.

    Cross-engine exactness: p = (c2+1)/(c1+V) is a correctly-rounded
    IEEE division of identical integers on both engines; the sole libm
    `ln` is snapped to integer micro-nats immediately
    (round(-ln(p)*1e6) -> BIGINT), the per-doc score is a BIGINT sum of
    those (order-invariant), and mean_nll re-enters float space through
    the identical op sequence (sum*1.0/n)/1e6 on both engines."""
    docs = load(spark, sf_dir, "documents", spread=True)
    toks = docs.select("doc_id", TS.tokens(F.col("text")).alias("toks"))
    bgs = TS._bind(
        F.col("toks"),
        lambda t: F.when(
            F.size(t) >= 2,
            F.zip_with(
                F.slice(t, F.lit(1), F.size(t) - 1),
                F.slice(t, F.lit(2), F.size(t) - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    g = cacheutil.track(toks.select("doc_id", bgs.alias("bgs")).persist())
    inst = g.select("doc_id", F.explode("bgs").alias("bg"))
    c2 = inst.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    c1 = (
        c2.groupBy(F.substring_index("bg", " ", 1).alias("w1"))
        .agg(F.sum("c2").alias("c1"))
    )
    v = toks.select(F.explode("toks").alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    p = ((F.col("c2") + F.lit(_LM_ALPHA)) * F.lit(1.0)) / (
        F.col("c1") + F.lit(_LM_ALPHA) * F.col("v")
    )
    model = (
        c2.join(c1, F.substring_index(F.col("bg"), " ", 1) == F.col("w1"))
        .crossJoin(F.broadcast(v))
        .select("bg", F.round(-F.log(p) * F.lit(1000000.0), 0).cast("long").alias("nll_micro"))
    )
    agg = (
        inst.join(model, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("nll_micro").alias("nll_micro_sum"),
        )
    )
    mean_nll = F.round(
        (F.col("nll_micro_sum") * F.lit(1.0) / F.col("n_bigrams")) / F.lit(1000000.0), 6
    )
    return (
        g.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("nll_micro_sum", F.lit(0)).cast("long").alias("nll_micro_sum"),
            mean_nll.alias("mean_nll"),
            F.coalesce(mean_nll <= F.lit(_LM_KEEP_MAX_NLL), F.lit(False)).alias("kept"),
        )
        .orderBy("doc_id")
    )


SQL_TEXT_LM_PERPLEXITY = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
g AS (SELECT doc_id,
        CASE WHEN len(toks) >= 2
             THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
             ELSE CAST([] AS VARCHAR[]) END AS bgs
      FROM t),
inst AS (SELECT doc_id, unnest(bgs) AS bg FROM g),
c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM inst GROUP BY bg),
c1 AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(c2) AS BIGINT) AS c1
       FROM c2 GROUP BY 1),
v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
      FROM (SELECT unnest(toks) AS tok FROM t)),
model AS (SELECT bg,
                 CAST(round(-ln(((c2.c2 + {_LM_ALPHA}) * 1.0)
                                / (c1.c1 + {_LM_ALPHA} * v.v)) * 1000000.0, 0)
                      AS BIGINT) AS nll_micro
          FROM c2 JOIN c1 ON split_part(c2.bg, ' ', 1) = c1.w1 CROSS JOIN v),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(nll_micro) AS BIGINT) AS nll_micro_sum
        FROM inst JOIN model USING (bg) GROUP BY doc_id)
SELECT g.doc_id,
       COALESCE(a.n_bigrams, 0) AS n_bigrams,
       COALESCE(a.nll_micro_sum, 0) AS nll_micro_sum,
       round((a.nll_micro_sum * 1.0 / a.n_bigrams) / 1000000.0, 6) AS mean_nll,
       COALESCE(round((a.nll_micro_sum * 1.0 / a.n_bigrams) / 1000000.0, 6)
                <= {_LM_KEEP_MAX_NLL!r}, FALSE) AS kept
FROM g LEFT JOIN agg a USING (doc_id) ORDER BY g.doc_id
"""


# ------------------------------------------------------------------
# corpus_length_buckets — seq-len bucketed batch packing (text)
# ------------------------------------------------------------------
_LEN_BUCKETS = [16, 32, 64, 128]  # power-of-two token-length ceilings
_LEN_TOKEN_BUDGET = 1024  # per-batch padded-token budget
_LEN_BATCH_SIZES = {b: _LEN_TOKEN_BUDGET // b for b in _LEN_BUCKETS}

# ONE generated expression string evaluated by both engines
_LEN_BUCKET_CASE = (
    "CASE "
    + " ".join(f"WHEN n_tokens <= {b} THEN {b}" for b in _LEN_BUCKETS[:-1])
    + f" ELSE {_LEN_BUCKETS[-1]} END"
)


def q_corpus_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketed batch packing: documents binned to
    power-of-two length buckets (padding a 40-token doc to 64 wastes
    37%; padding it to the corpus max wastes 10x), each bucket packed
    into batches holding `budget / bucket_len` sequences, so every
    batch costs the same padded-token count. Output one row per doc:
    (doc_id, n_tokens, bucket_len, batch_id, slot, full_batch).

    Shape at 100 TB: token counts are scan-side; the bucket CASE is a
    generated literal chain (no libm log2 — cross-engine exact by
    construction); packing is `bucketed_pack` (module docstring): the
    per-bucket order is NEVER a global window — range partition,
    driver-side O(partitions x buckets) offsets, (_pid, bucket)
    windows."""
    docs = load(spark, sf_dir, "documents", spread=True).select(
        "doc_id", TS.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    b = docs.withColumn("bucket_len", F.expr(_LEN_BUCKET_CASE).cast("long"))
    return (
        bucketed_pack(b, "bucket_len", "doc_id", _LEN_BATCH_SIZES)
        .select("doc_id", "n_tokens", "bucket_len", "batch_id", "slot", "full_batch")
        .orderBy("doc_id")
    )


def _sql_length_buckets() -> str:
    bsize = (
        "CASE bucket_len "
        + " ".join(f"WHEN {b} THEN {s}" for b, s in sorted(_LEN_BATCH_SIZES.items()))
        + " END"
    )
    return f"""
WITH t AS (SELECT doc_id, CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tokens
           FROM documents),
b AS (SELECT doc_id, n_tokens, CAST({_LEN_BUCKET_CASE} AS BIGINT) AS bucket_len FROM t),
s AS (SELECT *, row_number() OVER (PARTITION BY bucket_len ORDER BY doc_id) - 1 AS seq0
      FROM b),
n AS (SELECT bucket_len, CAST(count(*) AS BIGINT) AS tot FROM b GROUP BY bucket_len)
SELECT doc_id, n_tokens, bucket_len,
       CAST(floor(seq0 / ({bsize})) AS BIGINT) AS batch_id,
       CAST(seq0 % ({bsize}) AS BIGINT) AS slot,
       CAST(floor(seq0 / ({bsize})) AS BIGINT)
         < CAST(floor(tot / ({bsize})) AS BIGINT) AS full_batch
FROM s JOIN n USING (bucket_len) ORDER BY doc_id
"""


SQL_CORPUS_LENGTH_BUCKETS = _sql_length_buckets()


# ------------------------------------------------------------------
# image_aspect_buckets — aspect-ratio bucketed batching (image)
# ------------------------------------------------------------------
# (num, den) aspect ratios, SDXL-style; deliberately NOT containing the
# catalog's 4:1 strip exactly, so the argmin resolves a true nearest
_ASPECT_BUCKETS = [(1, 1), (5, 4), (4, 5), (3, 2), (2, 3), (3, 1), (1, 3)]
_ASPECT_BATCH = 8


def _aspect_case() -> str:
    """Generated argmin expression: bucket i's distance to aspect w/h
    is |w/h - n_i/d_i| = |w*d_i - h*n_i| / (h*d_i); h > 0 is common so
    the comparable cost is |w*d_i - h*n_i| / d_i — an exact integer
    numerator and a correctly-rounded IEEE division, identical on both
    engines. least() + first-match CASE gives lowest-index tie-break."""
    costs = [f"(abs(w * {d} - h * {n}) * 1.0 / {d})" for n, d in _ASPECT_BUCKETS]
    m = "least(" + ", ".join(costs) + ")"
    whens = " ".join(f"WHEN {c} = {m} THEN {i}" for i, c in enumerate(costs))
    return f"CASE {whens} END"


_ASPECT_BUCKET_CASE = _aspect_case()
_ASPECT_W = (
    "CASE bucket_id "
    + " ".join(f"WHEN {i} THEN {n}" for i, (n, d) in enumerate(_ASPECT_BUCKETS))
    + " END"
)
_ASPECT_H = (
    "CASE bucket_id "
    + " ".join(f"WHEN {i} THEN {d}" for i, (n, d) in enumerate(_ASPECT_BUCKETS))
    + " END"
)


def q_image_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SDXL-style aspect-ratio bucketing over the input_hint image
    catalog: every image joins the aspect bucket nearest its w/h ratio
    (integer cross-multiplication argmin, lowest bucket index breaks
    ties), then each bucket packs into fixed-size batches ordered by
    image_id — the exact (bucket, batch, slot) assignment an
    aspect-bucketed training dataloader consumes. Output one row per
    image: (image_id, w, h, bucket_id, bucket_w, bucket_h, batch_id,
    slot, full_batch).

    Shape at 100 TB: metadata-only — the scan reads (image_id, w, h),
    never bytes/caption (the same column-pruning contract as the rest
    of plans/imagepipe.py). The argmin is a per-row expression over a
    7-entry literal list (no join, no explode); packing is
    `bucketed_pack` — no global window, offsets driver-side."""
    cat = load_catalog(spark).select("image_id", "w", "h")
    b = cat.withColumn("bucket_id", F.expr(_ASPECT_BUCKET_CASE).cast("long"))
    sizes = {i: _ASPECT_BATCH for i in range(len(_ASPECT_BUCKETS))}
    return (
        bucketed_pack(b, "bucket_id", "image_id", sizes)
        .withColumn("bucket_w", F.expr(_ASPECT_W).cast("long"))
        .withColumn("bucket_h", F.expr(_ASPECT_H).cast("long"))
        .select(
            "image_id", "w", "h", "bucket_id", "bucket_w", "bucket_h",
            "batch_id", "slot", "full_batch",
        )
        .orderBy("image_id")
    )


SQL_IMAGE_ASPECT_BUCKETS = f"""
WITH cat AS (SELECT image_id, w, h FROM ({_SQL_CATALOG})),
b AS (SELECT image_id, w, h, CAST({_ASPECT_BUCKET_CASE} AS BIGINT) AS bucket_id
      FROM cat),
s AS (SELECT *, row_number() OVER (PARTITION BY bucket_id ORDER BY image_id) - 1
               AS seq0
      FROM b),
n AS (SELECT bucket_id, CAST(count(*) AS BIGINT) AS tot FROM b GROUP BY bucket_id)
SELECT image_id, w, h, bucket_id,
       CAST({_ASPECT_W} AS BIGINT) AS bucket_w,
       CAST({_ASPECT_H} AS BIGINT) AS bucket_h,
       CAST(floor(seq0 / {_ASPECT_BATCH}) AS BIGINT) AS batch_id,
       CAST(seq0 % {_ASPECT_BATCH} AS BIGINT) AS slot,
       CAST(floor(seq0 / {_ASPECT_BATCH}) AS BIGINT)
         < CAST(floor(tot / {_ASPECT_BATCH}) AS BIGINT) AS full_batch
FROM s JOIN n USING (bucket_id) ORDER BY image_id
"""


# ------------------------------------------------------------------
# image_train_manifest — the image-axis capstone (curation -> aspect
# buckets -> packed batches -> shard manifest), one oracle-checked plan
# ------------------------------------------------------------------
def q_image_train_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full image-side training-data pipeline composed end-to-end,
    the image twin of datapipe.q_corpus_curation: LAION-style curation
    (size / aspect / caption gates + exact-pHash dedup, imagepipe's
    funnel), survivors bucketed by nearest aspect ratio, each bucket
    packed into fixed-size batches, and the FULL batches emitted as a
    shard manifest — one row per shard: (bucket_id, bucket_w, bucket_h,
    batch_id, n_images, first_image, last_image, checksum), where
    `checksum` is the order-invariant BIGINT sum of hash60(image_id)
    over the shard's members — the integrity record a shard writer
    publishes so a training job can verify what it reads. The sum is
    provably overflow-free here: a full batch has exactly
    _ASPECT_BATCH=8 members and hash60 < 2^60, so the sum is at most
    8*(2^60-1) < 2^63 (larger shard sizes must switch to bit_xor, as
    shardwriter.write_text_shards does).

    Shape at 100 TB: curation is metadata-only (bytes/caption never
    scanned — the imagepipe column-pruning contract), its one shuffle
    is the phash dedup window; bucketing is a per-row literal argmin;
    packing is `bucketed_pack` (range partition + driver offsets, no
    single-partition window); the manifest is one further groupBy over
    (bucket, batch) with map-side partial sums."""
    from gepris_spark.plans.imagepipe import _staged, _with_dedup_reason

    cur = (
        _with_dedup_reason(_staged(spark))
        .where(F.col("reason").isNull())
        .select("image_id", "w", "h")
    )
    b = cur.withColumn("bucket_id", F.expr(_ASPECT_BUCKET_CASE).cast("long"))
    sizes = {i: _ASPECT_BATCH for i in range(len(_ASPECT_BUCKETS))}
    packed = bucketed_pack(b, "bucket_id", "image_id", sizes)
    return (
        packed.where(F.col("full_batch"))
        .groupBy("bucket_id", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("image_id").alias("first_image"),
            F.max("image_id").alias("last_image"),
            F.sum(TS.hash60(F.col("image_id"))).alias("checksum"),
        )
        .withColumn("bucket_w", F.expr(_ASPECT_W).cast("long"))
        .withColumn("bucket_h", F.expr(_ASPECT_H).cast("long"))
        .select(
            "bucket_id", "bucket_w", "bucket_h", "batch_id",
            "n_images", "first_image", "last_image", "checksum",
        )
        .orderBy("bucket_id", "batch_id")
    )


def _sql_train_manifest() -> str:
    from gepris_spark.plans.imagepipe import _SQL_REASONED

    return f"""
WITH cur AS (SELECT image_id, w, h FROM ({_SQL_REASONED}) WHERE reason IS NULL),
b AS (SELECT image_id, w, h, CAST({_ASPECT_BUCKET_CASE} AS BIGINT) AS bucket_id
      FROM cur),
s AS (SELECT *, row_number() OVER (PARTITION BY bucket_id ORDER BY image_id) - 1
               AS seq0
      FROM b),
n AS (SELECT bucket_id, CAST(count(*) AS BIGINT) AS tot FROM b GROUP BY bucket_id),
p AS (SELECT s.*, CAST(floor(seq0 / {_ASPECT_BATCH}) AS BIGINT) AS batch_id
      FROM s JOIN n USING (bucket_id)
      WHERE CAST(floor(seq0 / {_ASPECT_BATCH}) AS BIGINT)
              < CAST(floor(tot / {_ASPECT_BATCH}) AS BIGINT))
SELECT bucket_id,
       CAST({_ASPECT_W} AS BIGINT) AS bucket_w,
       CAST({_ASPECT_H} AS BIGINT) AS bucket_h,
       batch_id,
       CAST(count(*) AS BIGINT) AS n_images,
       min(image_id) AS first_image,
       max(image_id) AS last_image,
       CAST(sum(('0x' || substr(md5(image_id), 1, 15))::BIGINT) AS BIGINT) AS checksum
FROM p GROUP BY bucket_id, batch_id ORDER BY bucket_id, batch_id
"""


SQL_IMAGE_TRAIN_MANIFEST = _sql_train_manifest()


BATCHPREP_QUERIES: dict[str, tuple] = {
    "text_lm_perplexity": (q_text_lm_perplexity, SQL_TEXT_LM_PERPLEXITY),
    "corpus_length_buckets": (q_corpus_length_buckets, SQL_CORPUS_LENGTH_BUCKETS),
    "image_aspect_buckets": (q_image_aspect_buckets, SQL_IMAGE_ASPECT_BUCKETS),
    "image_train_manifest": (q_image_train_manifest, SQL_IMAGE_TRAIN_MANIFEST),
}
