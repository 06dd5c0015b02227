"""Image-catalog pipeline operators (the image half of a multimodal
training-data pipeline), each with a full DuckDB oracle SQL mirror.

The input is the image+caption catalog of EXACTLY the input_hint
schema (image_id string, bytes binary, w int32, h int32, fmt string,
caption string, phash int64). These operators are catalog-scale —
perceptual-hash dedup and LAION-style caption/dimension curation run
over metadata and must NEVER read the bytes column (column pruning is
what makes them viable at 100 TB; tests/test_plan_audit.py asserts the
scan's ReadSchema excludes bytes/caption). The binary decode paths
live in operators/multimodal.py; q_image_decode_verify runs the
input_hint's per-row decode invariant over this same table. Both
engines read the SAME committed fixture parquet
(fixtures/image_catalog.parquet, regen-guarded against
gepris_spark/sources/corpus.py:gen_image_catalog_pdf), so the oracle
compare exercises the operators, not the generator.

Scale notes:

* phash near-dup is the same banded pigeonhole shape as
  datapipe.q_dedup_simhash_pairs: 4 disjoint 16-bit bands over the
  64-bit hash guarantee every pair within hamming distance 3 collides
  on at least one band, so candidate generation is a band equi-join
  (linear shuffle, never all-pairs) and the exact verify is one
  bit_count(xor) per candidate.
* curation is filters + one window (min image_id per phash) — a single
  shuffle on phash, which is uniformly distributed by construction.

No reference counterpart: the reference crawler has no image tables at
all; the catalog schema comes from BASELINE.json's input_hint.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

FIXTURE_DIR = Path(__file__).resolve().parents[2] / "fixtures"
CATALOG_PATH = str(FIXTURE_DIR / "image_catalog.parquet")

_PHASH_HAMMING_MAX = 3
_PHASH_BANDS = 4  # disjoint 16-bit bands; d<=3 leaves >=1 band intact
_MIN_SIDE = 48  # LAION-style min dimension
_MAX_ASPECT = 3  # drop if w > 3h or h > 3w
_MIN_CAPTION_TOKENS = 3

_SQL_CATALOG = f"SELECT * FROM read_parquet('{CATALOG_PATH}')"
# identical tokenization contract as datapipe/textstats
_SQL_CAPTION_TOKENS = "len(regexp_extract_all(lower(caption), '[a-z0-9]+'))"


def load_catalog(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(CATALOG_PATH)


def _caption_tokens(caption: Column) -> Column:
    return F.size(F.regexp_extract_all(F.lower(caption), F.lit("[a-z0-9]+"), F.lit(0)))


# -------------------------------------------------------- phash near-dup
def q_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate pairs: 4x16-bit banded hamming
    search over the 64-bit pHash (pigeonhole-complete for d<=3), exact
    bit_count(xor) verify per candidate. Cross-format re-encodes land
    at hamming 0; mild noise variants at 1-3; unrelated images in this
    catalog are never closer than 14 bits, so the pair set is exactly
    the planted duplicates the banding can see."""
    cat = load_catalog(spark).select("image_id", "phash")
    bands = cat.select(
        "image_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("phash", 16 * b).bitwiseAND(F.lit(65535)).alias("key"),
                    )
                    for b in range(_PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("image_id", "phash", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.image_id") < F.col("b.image_id")),
        )
        .where(
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
            <= _PHASH_HAMMING_MAX
        )
        .select(
            F.col("a.image_id").alias("image_a"),
            F.col("b.image_id").alias("image_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias("hamming"),
        )
        .distinct()
        .orderBy("image_a", "image_b")
    )


SQL_IMAGE_PHASH_NEARDUP = f"""
WITH bands AS (
  SELECT image_id, phash, b.b AS band,
         (phash >> (16 * b.b)) & 65535 AS key
  FROM ({_SQL_CATALOG}), UNNEST(range(0, {_PHASH_BANDS})) AS b(b))
SELECT DISTINCT a.image_id AS image_a, b.image_id AS image_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.key = b.key AND a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= {_PHASH_HAMMING_MAX}
ORDER BY image_a, image_b
"""


# --------------------------------------------------------- curation
def _staged(spark: SparkSession, cat: DataFrame | None = None) -> DataFrame:
    """Catalog rows + the sequential drop-reason column (the funnel
    order is part of the contract: size -> aspect -> caption -> dedup).
    `cat` overrides the fixture catalog with any input_hint-shaped
    table (e.g. one a crawl just produced, plans/pipeline.py)."""
    cat = cat if cat is not None else load_catalog(spark)
    return cat.select(
        "image_id",
        "fmt",
        "w",
        "h",
        "phash",
        _caption_tokens(F.col("caption")).alias("n_caption_tokens"),
    ).withColumn(
        "drop_reason",
        F.when(F.least("w", "h") < _MIN_SIDE, "too_small")
        .when(
            (F.col("w") > _MAX_ASPECT * F.col("h"))
            | (F.col("h") > _MAX_ASPECT * F.col("w")),
            "bad_aspect",
        )
        .when(F.col("n_caption_tokens") < _MIN_CAPTION_TOKENS, "short_caption"),
    )


_SQL_STAGED = f"""
  SELECT image_id, fmt, w, h, phash,
         CAST({_SQL_CAPTION_TOKENS} AS INT) AS n_caption_tokens,
         CASE WHEN least(w, h) < {_MIN_SIDE} THEN 'too_small'
              WHEN w > {_MAX_ASPECT} * h OR h > {_MAX_ASPECT} * w THEN 'bad_aspect'
              WHEN {_SQL_CAPTION_TOKENS} < {_MIN_CAPTION_TOKENS} THEN 'short_caption'
              END AS drop_reason
  FROM ({_SQL_CATALOG})
"""


def _with_dedup_reason(staged: DataFrame) -> DataFrame:
    """Adds the final funnel stage: among filter-survivors, the keeper
    per phash is the min image_id; later ids get reason 'phash_dup'.
    One window over phash — the only shuffle in the plan."""
    from pyspark.sql import Window

    keeper = F.min(
        F.when(F.col("drop_reason").isNull(), F.col("image_id"))
    ).over(Window.partitionBy("phash"))
    return staged.withColumn(
        "reason",
        F.coalesce(
            F.col("drop_reason"),
            F.when(F.col("image_id") != keeper, "phash_dup"),
        ),
    )


_SQL_REASONED = f"""
  SELECT *, coalesce(
           drop_reason,
           CASE WHEN image_id <> min(CASE WHEN drop_reason IS NULL THEN image_id END)
                                 OVER (PARTITION BY phash)
                THEN 'phash_dup' END) AS reason
  FROM ({_SQL_STAGED})
"""


def q_image_caption_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-style image+caption curation, survivors row-level: drop
    undersized images, extreme aspect ratios, too-short captions, then
    exact-pHash dedup (keeper = min image_id). The output is the kept
    catalog a caption-training pipeline would feed downstream."""
    return (
        _with_dedup_reason(_staged(spark))
        .where(F.col("reason").isNull())
        .select("image_id", "fmt", "w", "h", "n_caption_tokens", "phash")
        .orderBy("image_id")
    )


SQL_IMAGE_CAPTION_CURATION = f"""
SELECT image_id, fmt, w, h, n_caption_tokens, phash
FROM ({_SQL_REASONED})
WHERE reason IS NULL
ORDER BY image_id
"""


def q_image_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same curation pipeline as a per-format funnel report:
    how many rows each stage dropped and how many survive — the
    dataset-card numbers a curation run publishes."""
    reasons = ("too_small", "bad_aspect", "short_caption", "phash_dup")
    reasoned = _with_dedup_reason(_staged(spark))
    aggs = [
        F.sum(F.when(F.col("reason") == r, 1).otherwise(0)).alias(f"n_{r}")
        for r in reasons
    ]
    return (
        reasoned.groupBy("fmt")
        .agg(
            F.count(F.lit(1)).alias("n_input"),
            *aggs,
            F.sum(F.when(F.col("reason").isNull(), 1).otherwise(0)).alias("n_kept"),
        )
        .orderBy("fmt")
    )


SQL_IMAGE_CURATION_FUNNEL = f"""
SELECT fmt, count(*) AS n_input,
       count(*) FILTER (reason = 'too_small') AS n_too_small,
       count(*) FILTER (reason = 'bad_aspect') AS n_bad_aspect,
       count(*) FILTER (reason = 'short_caption') AS n_short_caption,
       count(*) FILTER (reason = 'phash_dup') AS n_phash_dup,
       count(*) FILTER (reason IS NULL) AS n_kept
FROM ({_SQL_REASONED})
GROUP BY fmt ORDER BY fmt
"""


def q_image_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image duplicate clusters: connected components over the pHash
    near-dup pair graph, by the same large-star/small-star contraction
    the document path uses (datapipe.cc_large_small_star, O(log² n)
    rounds regardless of component diameter) — a base image, its noise
    variant and its re-encode all collapse to one canonical image_id
    even when not every pair collided in a band. Oracle: recursive-CTE
    reachability over the identical pair SQL."""
    from gepris_spark.plans.datapipe import cc_large_small_star

    pairs = q_image_phash_neardup(spark, sf_dir).select(
        F.col("image_a").alias("u"), F.col("image_b").alias("v")
    )
    return (
        cc_large_small_star(pairs)
        .select(F.col("doc_id").alias("image_id"), "cluster_root")
        .orderBy("image_id")
    )


SQL_IMAGE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS ({SQL_IMAGE_PHASH_NEARDUP}),
und AS (SELECT image_a AS a, image_b AS b FROM pairs
        UNION ALL SELECT image_b, image_a FROM pairs),
reach(s, t) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM und)
  UNION
  SELECT r.s, u.b FROM reach r JOIN und u ON u.a = r.t)
SELECT s AS image_id, min(t) AS cluster_root
FROM reach GROUP BY s ORDER BY image_id
"""


_HAMMING_TOPK_K = 5
_HAMMING_TOPK_QUERIES = 3


def q_image_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pHash retrieval baseline — the image-axis analogue of
    ann_topk_cosine: for a bounded query set (first 3 image_ids) rank
    the whole catalog by bit_count(xor) hamming distance. The query
    side broadcasts, so the plan is one linear scan of the catalog per
    batch of queries (never all-pairs); the banded near-dup search
    (q_image_phash_neardup) is the sub-linear candidate path whose
    d<=3 completeness this baseline makes checkable."""
    from pyspark.sql.window import Window

    cat = load_catalog(spark).select("image_id", "phash")
    queries = cat.orderBy("image_id").limit(_HAMMING_TOPK_QUERIES).select(
        F.col("image_id").alias("query_id"), F.col("phash").alias("qhash")
    )
    scored = (
        F.broadcast(queries)
        .join(cat, F.col("image_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("image_id").alias("neighbor_id"),
            F.bit_count(F.col("qhash").bitwiseXOR(F.col("phash"))).cast("int").alias("hamming"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= _HAMMING_TOPK_K)
        .select("query_id", "neighbor_id", "hamming", "rank")
        .orderBy("query_id", "rank")
    )


SQL_IMAGE_HAMMING_TOPK = f"""
WITH cat AS (SELECT image_id, phash FROM ({_SQL_CATALOG})),
q AS (SELECT image_id AS query_id, phash AS qhash FROM cat
      ORDER BY image_id LIMIT {_HAMMING_TOPK_QUERIES}),
scored AS (
  SELECT q.query_id, c.image_id AS neighbor_id,
         CAST(bit_count(xor(q.qhash, c.phash)) AS INT) AS hamming
  FROM q JOIN cat c ON c.image_id <> q.query_id)
SELECT query_id, neighbor_id, hamming, CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY hamming ASC, neighbor_id ASC) AS rank
      FROM scored)
WHERE rank <= {_HAMMING_TOPK_K}
ORDER BY query_id, rank
"""


# ------------------------------------------------ augmentation planner
_AUG_EPOCHS = 2
_AUG_MIN_PM = 700  # crop keeps 700..1000 permille of each side


def q_image_augment_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch augmentation planner over the catalog —
    the reproducible-training half of RandomResizedCrop+flip: instead
    of trainer-local RNG (whose state dies with the job and differs
    per worker), every (image, epoch) gets its crop box and flip bit
    from hash60 formulas over (image_id, epoch), so any re-run, any
    worker, and the DuckDB oracle derive the identical plan — the same
    discipline as corpus_shuffle_shards' seeded order. Per side the
    crop keeps 700..1000 permille (integer arithmetic throughout);
    offsets are uniform over the valid range by construction, and the
    graded in_bounds column proves every box fits its image.

    Shape at 100 TB: scan-side only — the epoch fan-out is a map-side
    explode, every output column is hash/integer arithmetic on
    (image_id, w, h), and the scan reads ONLY those three columns (the
    bytes stay on disk; the decode+crop happens trainer-side at batch
    load, tests/test_plan_audit.py pins the pruned scan). No joins, no
    aggregates, no windows — zero data shuffles."""
    from gepris_spark.functions.textstats import hash60

    def _h(tag: str) -> Column:
        return hash60(
            F.concat(
                F.lit(f"aug:{tag}:"),
                F.col("image_id"),
                F.lit(":"),
                F.col("epoch").cast("string"),
            )
        )

    cat = load_catalog(spark).select("image_id", "w", "h")
    ep = cat.select(
        "image_id",
        "w",
        "h",
        F.explode(F.array(*[F.lit(e) for e in range(_AUG_EPOCHS)])).alias("epoch"),
    )
    sized = ep.select(
        "image_id",
        F.col("epoch").cast("long").alias("epoch"),
        "w",
        "h",
        (F.lit(_AUG_MIN_PM) + _h("s") % (1001 - _AUG_MIN_PM)).alias("frac_pm"),
        (_h("x")).alias("hx"),
        (_h("y")).alias("hy"),
        (_h("f") % 2 == 1).alias("flip"),
    ).select(
        "image_id",
        "epoch",
        "w",
        "h",
        F.expr("(CAST(w AS BIGINT) * frac_pm) div 1000").alias("crop_w"),
        F.expr("(CAST(h AS BIGINT) * frac_pm) div 1000").alias("crop_h"),
        "hx",
        "hy",
        "flip",
    )
    return (
        sized.select(
            "image_id",
            "epoch",
            (F.col("hx") % (F.col("w").cast("long") - F.col("crop_w") + 1)).alias("crop_x"),
            (F.col("hy") % (F.col("h").cast("long") - F.col("crop_h") + 1)).alias("crop_y"),
            "crop_w",
            "crop_h",
            "flip",
            (
                (F.col("hx") % (F.col("w").cast("long") - F.col("crop_w") + 1) + F.col("crop_w") <= F.col("w"))
                & (F.col("hy") % (F.col("h").cast("long") - F.col("crop_h") + 1) + F.col("crop_h") <= F.col("h"))
            ).alias("in_bounds"),
        )
        .orderBy("image_id", "epoch")
    )


_AUG_H = (
    "('0x' || substr(md5('aug:{tag}:' || image_id || ':' || CAST(epoch AS VARCHAR)), 1, 15))::BIGINT"
)
SQL_IMAGE_AUGMENT_PLAN = f"""
WITH cat AS (SELECT image_id, w, h FROM ({_SQL_CATALOG})),
ep AS (SELECT image_id, w, h, e AS epoch
       FROM cat, UNNEST(range(0, {_AUG_EPOCHS})) AS t(e)),
sized AS (
  SELECT image_id, epoch, w, h,
         (CAST(w AS BIGINT) * ({_AUG_MIN_PM} + {_AUG_H.format(tag='s')} % {1001 - _AUG_MIN_PM})) // 1000 AS crop_w,
         (CAST(h AS BIGINT) * ({_AUG_MIN_PM} + {_AUG_H.format(tag='s')} % {1001 - _AUG_MIN_PM})) // 1000 AS crop_h,
         {_AUG_H.format(tag='x')} AS hx,
         {_AUG_H.format(tag='y')} AS hy,
         {_AUG_H.format(tag='f')} % 2 = 1 AS flip
  FROM ep)
SELECT image_id, epoch,
       hx % (CAST(w AS BIGINT) - crop_w + 1) AS crop_x,
       hy % (CAST(h AS BIGINT) - crop_h + 1) AS crop_y,
       crop_w, crop_h, flip,
       (hx % (CAST(w AS BIGINT) - crop_w + 1) + crop_w <= w
        AND hy % (CAST(h AS BIGINT) - crop_h + 1) + crop_h <= h) AS in_bounds
FROM sized
ORDER BY image_id, epoch
"""


# ---------------------------------------------- cross-modal dedup classes
def q_image_crossmodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal duplicate classification over the image+caption
    catalog — the LAION-style curation decision that needs BOTH
    modalities: a pair can be a true duplicate (same image AND same
    caption → drop one), a recaption (same image, different caption →
    keep; caption diversity is training signal), or a stock caption
    (same caption on different images → flag; the classic scraped-
    alt-text failure). Neither single-modality dedup
    (q_image_phash_neardup / text dedup) can make this call.

    Image side = the same 4x16-band pigeonhole candidates + hamming<=3
    verify as q_image_phash_neardup (complete for d<=3, linear
    shuffle); caption side = normalized-token equality (the exact-dup
    grouping; near-dup captions would swap in the minhash kernel).
    The two pair sets FULL-OUTER join on the pair key — both sides are
    O(duplicate incidences), never all-pairs — and the verdict is a
    row-local CASE. The bytes column is provably never read (metadata
    plan; the plan-audit ReadSchema discipline of this module)."""
    cat = load_catalog(spark).select(
        "image_id",
        "phash",
        F.array_join(
            F.regexp_extract_all(F.lower(F.col("caption")), F.lit("[a-z0-9]+"), 0), " "
        ).alias("ncap"),
    )
    bands = cat.select(
        "image_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("phash", 16 * b).bitwiseAND(F.lit(65535)).alias("key"),
                    )
                    for b in range(_PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("image_id", "phash", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    img_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.image_id") < F.col("b.image_id")),
        )
        .where(
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
            <= _PHASH_HAMMING_MAX
        )
        .select(
            F.col("a.image_id").alias("image_a"),
            F.col("b.image_id").alias("image_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias("hamming"),
        )
        .distinct()
    )
    ca, cb = cat.alias("ca"), cat.alias("cb")
    cap_pairs = (
        ca.join(
            cb,
            (F.col("ca.ncap") == F.col("cb.ncap"))
            & (F.col("ca.image_id") < F.col("cb.image_id")),
        )
        .select(
            F.col("ca.image_id").alias("image_a"),
            F.col("cb.image_id").alias("image_b"),
            F.lit(True).alias("caption_match"),
        )
    )
    joined = img_pairs.join(cap_pairs, ["image_a", "image_b"], "full_outer")
    verdict = (
        F.when(F.col("hamming").isNotNull() & F.col("caption_match"), F.lit("duplicate"))
        .when(F.col("hamming").isNotNull(), F.lit("recaption"))
        .otherwise(F.lit("stock_caption"))
    )
    return joined.select(
        "image_a",
        "image_b",
        F.coalesce(F.col("hamming"), F.lit(-1)).cast("int").alias("hamming"),
        F.coalesce(F.col("caption_match"), F.lit(False)).alias("caption_match"),
        F.col("hamming").isNotNull().alias("image_match"),
        verdict.alias("verdict"),
    ).orderBy("image_a", "image_b")


SQL_IMAGE_CROSSMODAL_DEDUP = f"""
WITH cat AS (
  SELECT image_id, phash,
         array_to_string(regexp_extract_all(lower(caption), '[a-z0-9]+'), ' ') AS ncap
  FROM ({_SQL_CATALOG})),
bands AS (
  SELECT image_id, phash, b.b AS band,
         (phash >> (16 * b.b)) & 65535 AS key
  FROM cat, UNNEST(range(0, {_PHASH_BANDS})) AS b(b)),
img AS (
  SELECT DISTINCT a.image_id AS image_a, b.image_id AS image_b,
         CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.image_id < b.image_id
  WHERE bit_count(xor(a.phash, b.phash)) <= {_PHASH_HAMMING_MAX}),
cap AS (
  SELECT a.image_id AS image_a, b.image_id AS image_b, true AS caption_match
  FROM cat a JOIN cat b ON a.ncap = b.ncap AND a.image_id < b.image_id)
SELECT coalesce(i.image_a, c.image_a) AS image_a,
       coalesce(i.image_b, c.image_b) AS image_b,
       CAST(coalesce(i.hamming, -1) AS INT) AS hamming,
       coalesce(c.caption_match, false) AS caption_match,
       i.hamming IS NOT NULL AS image_match,
       CASE WHEN i.hamming IS NOT NULL AND c.caption_match THEN 'duplicate'
            WHEN i.hamming IS NOT NULL THEN 'recaption'
            ELSE 'stock_caption' END AS verdict
FROM img i FULL OUTER JOIN cap c
  ON i.image_a = c.image_a AND i.image_b = c.image_b
ORDER BY image_a, image_b
"""


IMAGEPIPE_QUERIES: dict[str, tuple] = {
    "image_crossmodal_dedup": (q_image_crossmodal_dedup, SQL_IMAGE_CROSSMODAL_DEDUP),
    "image_phash_neardup": (q_image_phash_neardup, SQL_IMAGE_PHASH_NEARDUP),
    "image_hamming_topk": (q_image_hamming_topk, SQL_IMAGE_HAMMING_TOPK),
    "image_caption_curation": (q_image_caption_curation, SQL_IMAGE_CAPTION_CURATION),
    "image_curation_funnel": (q_image_curation_funnel, SQL_IMAGE_CURATION_FUNNEL),
    "image_dedup_clusters": (q_image_dedup_clusters, SQL_IMAGE_DEDUP_CLUSTERS),
    "image_augment_plan": (q_image_augment_plan, SQL_IMAGE_AUGMENT_PLAN),
}
