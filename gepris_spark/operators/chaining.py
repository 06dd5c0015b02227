"""A6 — de→en request chaining + bilingual item assembly
(SURVEY §2.7 A6; reference spiders/details.py:59-117).

The reference crawls each details id as a chain: german page → english
page (→ optional result pages), threading the partial item through
`cb_kwargs`. A distributed engine replaces callback-threading with
*stage columns and a join*:

  parse(de batch) ── success ──> continuation rows (language='en')
                └─ moved/error -> terminal immediately (no en fetch,
                                  matching details.py:72-76)
  parse(en batch) ──┐
  final item = de rows LEFT JOIN en rows ON (context, item_id)

The join is an equi-join on the id — at scale both sides arrive
partitioned by the same frontier keys, so co-partitioning makes it
shuffle-light; the en side is never larger than the de success set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gepris_spark.functions import canonical as C

CHAIN_LANGS = ("de", "en")


def continuation_rows(parsed_de: DataFrame, language: str = "en") -> DataFrame:
    """Follow-up frontier rows for the next language stage: only pages
    that parsed successfully in german get an english fetch
    (details.py:59-76 yields the en request from parse_german)."""
    return parsed_de.where(F.col("status") == "success").select(
        "url",
        "context",
        "item_id",
        F.lit(language).alias("language"),
    )


def assemble_bilingual(parsed_de: DataFrame, parsed_en: DataFrame) -> DataFrame:
    """Final details item: german fields + english name/attributes where
    the english page succeeded (details.py:78-117 merges the en parse
    into the de item). Output carries one JSON `item` column shaped
    like the reference's JSONB (name_de/name_en, attributes, trees).

    Left join: a failed/missing en page degrades to a de-only item with
    en_status recorded — the reference's error middleware records the
    same partial outcome.
    """
    de = parsed_de.select(
        "url",
        "context",
        F.col("item_id").cast("long").alias("item_id"),
        F.col("status").alias("status"),
        F.col("name").alias("name_de"),
        F.col("attributes").alias("attributes_de"),
        F.col("trees_json").alias("trees_de"),
        "caption",
        "image_id",
        "phash",
    )
    en = parsed_en.select(
        "context",
        F.col("item_id").cast("long").alias("item_id"),
        F.col("status").alias("en_status"),
        F.col("name").alias("name_en"),
        F.col("attributes").alias("attributes_en"),
    )
    joined = de.join(en, ["context", "item_id"], "left")
    item = F.to_json(
        F.struct(
            F.col("name_de"),
            F.col("name_en"),
            F.col("attributes_de").alias("attributes"),
            F.col("attributes_en"),
            F.col("trees_de").alias("trees_json"),
            F.col("caption"),
            F.col("image_id"),
            F.col("phash"),
        )
    )
    return joined.select(
        F.col("item_id").alias("id"),
        "context",
        "url",
        "status",
        F.coalesce(F.col("en_status"), F.lit("missing")).alias("en_status"),
        item.alias("item"),
    )


def details_chain(
    scheduled_de: DataFrame,
    pages: DataFrame,
    parse,
    max_retries: int = 2,
) -> dict[str, DataFrame]:
    """Run the full two-language details chain over a scheduled batch.

    `parse` is the parse stage callable (fetched -> parsed), injected so
    tests can pass a corpus-backed fetch; `pages` is the page source
    for operators.fetchparse.fetch_pages.

    Returns {'items': bilingual items, 'retry': rows needing re-fetch,
    'terminal_nonsuccess': moved/error de rows}. Retries here cover the
    de stage (language/structure failures re-enter the frontier with
    attempt+1, A5); en failures degrade to de-only items instead of
    blocking the chain.
    """
    from gepris_spark.operators import fetchparse
    from gepris_spark.operators.history import route_statuses

    parsed_de = parse(fetchparse.fetch_pages(scheduled_de, pages))
    if "attempt" in scheduled_de.columns:
        # the parse stage emits only the PARSED schema — re-attach the
        # retry budget so route_statuses can exhaust it (urls are
        # unique within a batch)
        parsed_de = parsed_de.join(
            scheduled_de.select("url", "attempt").dropDuplicates(["url"]), "url", "left"
        )
    routed = route_statuses(parsed_de, max_retries=max_retries)
    terminal_de = routed["terminal"]

    cont = continuation_rows(terminal_de)
    parsed_en = parse(fetchparse.fetch_pages(cont, pages))

    items = assemble_bilingual(
        terminal_de.where(F.col("status") == "success"), parsed_en
    )
    return {
        "items": items,
        "retry": routed["retry"],
        # drop the threaded attempt column so terminal outputs have a
        # stable schema whether or not the batch carried a retry budget
        "terminal_nonsuccess": terminal_de.where(F.col("status") != "success").drop("attempt"),
    }
