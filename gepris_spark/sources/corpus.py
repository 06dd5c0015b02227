"""Deterministic synthetic crawl corpus (FIXTURES.md §§1-3).

Replaces live HTTP for tests and benchmarks: seeded, reproducible
generation of

* `images`  — image+caption payload rows per BASELINE.json input_hint
              (real PNG / qdct encodings of seeded pixel arrays),
* `seeds`   — the seed-list replay corpus (canonical GEPRIS urls +
              duplicates + invalid variants, priority/recency/host),
* `pages`   — GEPRIS-shaped HTML responses (h1.facelift title,
              content_inside div, nameX/valueX attribute span pairs,
              ul/li trees, data-URI embedded image + figcaption),
              with status routes success/moved/bad_structure/
              wrong_language matching the reference's middleware
              validation paths (middlewares.py:15-114).

Everything derives from (seed, index) — no wall clock, no randomness
outside numpy's seeded PCG64 — so the replay oracle and engine see
byte-identical inputs.
"""

from __future__ import annotations

import base64
import hashlib
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from gepris_spark.codecs import image as imagecodec
from gepris_spark.schemas import CONTEXT_PRIORITY, CONTEXTS

GEPRIS_HOST = "gepris.dfg.de"
BASE_EPOCH = datetime(2021, 10, 18, 6, 0, 0, tzinfo=timezone.utc)

# German attribute keys from the reference's attribute grammar
# (spiders/base.py:42-118 zips nameX/valueX span runs).
ATTR_KEYS = [
    "Antragsteller",
    "Fachliche Zuordnung",
    "Förderung",
    "Projektkennung",
    "DFG-Verfahren",
    "Internetseite",
]


def _stable_u64(*parts) -> int:
    digest = hashlib.md5("|".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(digest[:8], "big")


from functools import lru_cache


@lru_cache(maxsize=4096)
def ref_pixels(image_index: int, seed: int = 42) -> np.ndarray:
    """The pre-encode reference pixels for image n: seeded gradient+noise.

    The verification oracle re-derives these to check decoded-pixel
    allclose / PSNR without storing a companion table. Cached (the
    derivation is deterministic and verify paths re-ask per row); the
    returned array is marked read-only so a cache hit can never be
    mutated in place.
    """
    rng = np.random.default_rng(seed * 1_000_003 + image_index)
    size = (32, 48, 64)[image_index % 3]
    yy, xx = np.mgrid[0:size, 0:size]
    base = np.stack(
        [
            (xx * 255 // max(size - 1, 1)),
            (yy * 255 // max(size - 1, 1)),
            ((xx + yy) * 255 // max(2 * size - 2, 1)),
        ],
        axis=-1,
    ).astype(np.float64)
    noise = rng.normal(0, 12, size=(size, size, 3))
    out = np.clip(base + noise, 0, 255).astype(np.uint8)
    out.flags.writeable = False
    return out


def caption_for(image_index: int) -> str:
    """Deterministic caption with unicode, extra whitespace and
    non-printables so clean_string parity (F1) is exercised."""
    return (
        f"Abbildung {image_index}:  Förderung\tder   Universität"
        f" — Projekt {image_index * 7 % 9973}​ (†)"
    )


def gen_images_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    """IMAGES rows (input_hint schema). fmt cycles png (lossless),
    qdct and real baseline jpeg (both lossy, exercise PSNR>=40dB)."""
    rows = []
    for i in range(n):
        pixels = ref_pixels(i, seed)
        fmt = ("png", "qdct", "jpeg")[i % 3]
        data = imagecodec.encode(pixels, fmt)
        rows.append(
            {
                "image_id": f"img{i:08d}",
                "bytes": data,
                "w": pixels.shape[1],
                "h": pixels.shape[0],
                "fmt": fmt,
                "caption": caption_for(i),
                "phash": imagecodec.phash64(pixels),
            }
        )
    return pd.DataFrame(rows)


def box_blur5(pixels: np.ndarray) -> np.ndarray:
    """Deterministic 5x5 edge-clamped box blur (padded 2-D cumsum, no
    scipy) — the generator's 'blurry variant' for the sharpness
    filter's would-be-rejected control population."""

    def one(ch: np.ndarray) -> np.ndarray:
        p = np.pad(ch.astype(np.float64), 2, mode="edge")
        c = p.cumsum(0).cumsum(1)
        c = np.pad(c, ((1, 0), (1, 0)))
        h, w = ch.shape
        s = c[5 : 5 + h, 5 : 5 + w] - c[:h, 5 : 5 + w] - c[5 : 5 + h, :w] + c[:h, :w]
        return s / 25.0

    out = np.stack([one(pixels[:, :, c]) for c in range(pixels.shape[2])], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def gen_sharpness_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    """Sharpness-filter input: every corpus image plus a 5x5-box-blurred
    control (png re-encode, lossless — the blur is the only change), so
    the filter's verdict separates two known populations."""
    rows = []
    for r in gen_images_pdf(n, seed=seed).itertuples(index=False):
        rows.append({"image_id": r.image_id, "bytes": r.bytes, "fmt": r.fmt})
        blurred = box_blur5(imagecodec.decode(bytes(r.bytes), r.fmt))
        rows.append(
            {
                "image_id": f"{r.image_id}-blur",
                "bytes": imagecodec.encode(blurred, "png"),
                "fmt": "png",
            }
        )
    return pd.DataFrame(rows)


def _noise_variant(pixels: np.ndarray, image_index: int, seed: int = 42) -> np.ndarray:
    """The catalog's near-duplicate: base pixels + sigma-1.5 gaussian
    noise from a (seed, index) generator — shared by the generator and
    catalog_pixels so the formulas cannot drift apart."""
    rng = np.random.default_rng(seed * 9_999_991 + image_index)
    return np.clip(
        pixels.astype(np.float64) + rng.normal(0, 1.5, pixels.shape), 0, 255
    ).astype(np.uint8)


def catalog_pixels(image_id: str, seed: int = 42) -> np.ndarray:
    """Re-derive an image-catalog row's pre-encode reference pixels
    from its image_id alone (`cat%06d-{a,v,r,w}`) — the per-row decode
    invariant's reference side, callable on executors."""
    i = int(image_id[3:9])
    kind = image_id.rsplit("-", 1)[1]
    if kind in ("a", "r"):
        return ref_pixels(i, seed)
    if kind == "v":
        return _noise_variant(ref_pixels(i, seed), i, seed)
    if kind == "w":
        return _wide_pixels(i, seed)
    raise ValueError(f"unknown catalog image_id kind: {image_id}")


def _wide_pixels(image_index: int, seed: int = 42) -> np.ndarray:
    """A 4:1 aspect-ratio gradient strip (48x192) — aspect-filter fodder
    for the image-catalog curation queries (tall enough to clear the
    min-size filter, so the aspect predicate is what drops it)."""
    rng = np.random.default_rng(seed * 2_000_003 + image_index)
    yy, xx = np.mgrid[0:48, 0:192]
    base = np.stack(
        [xx % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.float64)
    out = np.clip(base + rng.normal(0, 8, base.shape), 0, 255).astype(np.uint8)
    out.flags.writeable = False
    return out


def gen_image_catalog_pdf(n_base: int = 160, seed: int = 42) -> pd.DataFrame:
    """Image+caption catalog of EXACTLY the input_hint shape —
    (image_id string, bytes binary, w int32, h int32, fmt string,
    caption string, phash int64) — for the image-pipeline contract
    queries (plans/imagepipe.py). `bytes` is the real encoded payload
    in `fmt` (codecs/image.py png/qdct/jpeg encoders); `phash` is
    computed on the pre-encode pixels, so it is the canonical content
    hash a decode must land near (exactly for lossless fmts).

    Deterministic mix, all derived from (seed, index) formulas:

    * one base row per index (ref_pixels sizes cycle 32/48/64 — the
      32px rows are min-size-filter fodder);
    * index % 7 == 3: the base caption degrades to a single token
      (caption-length-filter fodder);
    * index % 4 == 1: a noise variant (sigma 1.5) — a near-duplicate
      whose phash lands 0-6 bits from the base (most within the d<=3
      banding guarantee, some legitimately outside it);
    * index % 5 == 2: a cross-format re-encode — identical pre-encode
      pixels, so an EXACT phash duplicate under a different image_id;
    * index % 11 == 4: a 4:1 wide strip (aspect-filter fodder).

    The catalog is materialized once to fixtures/image_catalog.parquet
    (tools/gen_truth_fixtures.py) and BOTH engines read that same file,
    so the oracle compare checks the operators, not the generator; a
    regen-guard test pins the fixture to these formulas."""
    rows = []

    def add(image_id: str, pixels: np.ndarray, fmt: str, caption: str) -> None:
        rows.append(
            {
                "image_id": image_id,
                "bytes": imagecodec.encode(pixels, fmt),
                "w": int(pixels.shape[1]),
                "h": int(pixels.shape[0]),
                "fmt": fmt,
                "caption": caption,
                "phash": imagecodec.phash64(pixels),
            }
        )

    fmts = ("png", "qdct", "jpeg")
    for i in range(n_base):
        pixels = ref_pixels(i, seed)
        caption = "img" if i % 7 == 3 else caption_for(i)
        add(f"cat{i:06d}-a", pixels, fmts[i % 3], caption)
        if i % 4 == 1:
            variant = _noise_variant(pixels, i, seed)
            add(f"cat{i:06d}-v", variant, fmts[(i + 1) % 3], caption + "  (Variante)")
        if i % 5 == 2:
            add(f"cat{i:06d}-r", pixels, fmts[(i + 2) % 3], caption)
        if i % 11 == 4:
            add(f"cat{i:06d}-w", _wide_pixels(i, seed), fmts[i % 3], caption_for(i))
    return pd.DataFrame(rows).astype({"w": "int32", "h": "int32"})


def gen_jpeg_quality_pdf(n: int = 36, seed: int = 42) -> pd.DataFrame:
    """JPEG-quality-gate corpus: row i is the (seed, index) reference
    image re-encoded as baseline JFIF at the deterministic quality
    factor q_i = 30 + (i*13) % 66 — gcd(13, 66) = 1, so 36 rows hit 36
    DISTINCT qualities spanning 30..95, straddling the keep threshold
    (operators/multimodal.py JPEG_QUALITY_MIN = 50) on both sides. The
    quality is intentionally NOT a column: the gate must recover it
    from the DQT bytes alone, and the truth fixture re-derives it from
    this formula."""
    from gepris_spark.codecs import jpeg as jpegcodec

    rows = []
    for i in range(n):
        pixels = ref_pixels(i, seed)
        rows.append(
            {
                "image_id": f"jq{i:06d}",
                "bytes": jpegcodec.encode(pixels, quality=30 + (i * 13) % 66),
                "fmt": "jpeg",
                "w": int(pixels.shape[1]),
                "h": int(pixels.shape[0]),
            }
        )
    return pd.DataFrame(rows).astype({"w": "int32", "h": "int32"})


def gen_seeds_pdf(
    n_per_context: dict[str, int] | int,
    seed: int = 42,
    n_extra_hosts: int = 3,
    dup_rate: float = 0.03,
    invalid_rate: float = 0.02,
) -> pd.DataFrame:
    """Seed-list replay corpus (FIXTURES.md §2).

    Includes ~dup_rate duplicate urls (dup-arrival warn path,
    search_results.py:60-63) and ~invalid_rate non-canonical variants
    (query params, /gepris/projekt/null) that must be canonicalized or
    filtered.
    """
    if isinstance(n_per_context, int):
        n_per_context = {c: n_per_context for c in CONTEXTS}
    rows = []
    for context in CONTEXTS:
        n = n_per_context.get(context, 0)
        for i in range(n):
            item_id = i + 1
            h = _stable_u64(seed, context, item_id)
            # mostly gepris.dfg.de plus a few synthetic hosts to
            # exercise per-host politeness + salting
            host = (
                GEPRIS_HOST
                if h % 10 < 7
                else f"mirror{h % n_extra_hosts}.example.org"
            )
            url = f"https://{host}/gepris/{context}/{item_id}"
            recency = BASE_EPOCH - timedelta(minutes=int(h % 100_000))
            rows.append(
                {
                    "url": url,
                    "context": context,
                    "item_id": item_id,
                    "language": "de",
                    "priority_type": CONTEXT_PRIORITY[context],
                    "recency_ts": recency,
                    "host": host,
                }
            )
            frac = (h >> 8) % 10_000 / 10_000
            if frac < dup_rate:
                rows.append({**rows[-1]})  # exact duplicate arrival
            elif frac < dup_rate + invalid_rate:
                noisy = dict(rows[-1])
                if h % 2 == 0:
                    noisy["url"] = url + "?language=en#top"  # canonicalizes to url
                else:
                    noisy["url"] = f"https://{host}/gepris/{context}/null"
                    noisy["item_id"] = None
                rows.append(noisy)
    pdf = pd.DataFrame(rows)
    # microsecond precision: Spark's parquet reader rejects NANOS
    pdf["recency_ts"] = (
        pd.to_datetime(pdf["recency_ts"], utc=True).dt.tz_localize(None).astype("datetime64[us]")
    )
    # explicit arrival order: the replay contract batches on this
    pdf["arrival_seq"] = range(len(pdf))
    return pdf


def gen_seeds_df(spark, n_per_context: int, seed: int = 42, n_extra_hosts: int = 3,
                 dup_rate: float = 0.03, invalid_rate: float = 0.02):
    """Distributed seed-list generator for benchmarks: same shape as
    gen_seeds_pdf (host mix, priority/recency, ~3% dup arrivals, ~2%
    non-canonical urls) but built from spark.range + expressions, so a
    10^7-row corpus materializes in seconds across executors instead of
    a driver-side Python loop. Deterministic via xxhash64(seed, ctx, id).

    Used for throughput/scaling measurement only — correctness replay
    tests use the pandas generator, which the oracle mirrors row-for-row.
    """
    from pyspark.sql import functions as F

    dfs = []
    for ctx_idx, context in enumerate(CONTEXTS):
        base = spark.range(1, n_per_context + 1).select(
            F.lit(context).alias("context"), (F.col("id")).alias("item_id")
        )
        h = F.abs(F.xxhash64(F.lit(seed), F.col("context"), F.col("item_id")))
        host = (
            F.when(h % 10 < 7, F.lit(GEPRIS_HOST)).otherwise(
                F.concat(F.lit("mirror"), (h % n_extra_hosts).cast("string"), F.lit(".example.org"))
            )
        )
        url = F.concat(
            F.lit("https://"), host, F.lit("/gepris/"), F.col("context"), F.lit("/"),
            F.col("item_id").cast("string"),
        )
        recency = F.lit(BASE_EPOCH.replace(tzinfo=None)) - F.make_interval(
            mins=(h % 100_000).cast("int")
        )
        frac = (F.shiftright(h, 8) % 10_000) / 10_000
        rows = base.select(
            url.alias("url"),
            "context",
            F.col("item_id").cast("long").alias("item_id"),
            F.lit("de").alias("language"),
            F.lit(CONTEXT_PRIORITY[context]).cast("int").alias("priority_type"),
            recency.alias("recency_ts"),
            host.alias("host"),
            # dense deterministic arrival order: contexts interleaved
            ((F.col("item_id") - 1) * len(CONTEXTS) + F.lit(ctx_idx))
            .cast("long")
            .alias("arrival_seq"),
            frac.alias("_frac"),
            h.alias("_h"),
        )
        dup = rows.where(F.col("_frac") < dup_rate)
        noisy = rows.where((F.col("_frac") >= dup_rate) & (F.col("_frac") < dup_rate + invalid_rate))
        noisy = noisy.withColumn(
            "url",
            F.when(F.col("_h") % 2 == 0, F.concat(F.col("url"), F.lit("?language=en#top"))).otherwise(
                F.concat(
                    F.lit("https://"), F.col("host"), F.lit("/gepris/"), F.col("context"),
                    F.lit("/null"),
                )
            ),
        ).withColumn("item_id", F.when(F.col("_h") % 2 == 0, F.col("item_id")))
        dfs.append(rows.unionByName(dup).unionByName(noisy))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    # dup/noisy arrivals share their original's arrival_seq (same
    # micro-batch — the dup-warn path); generation stays shuffle-free
    return out.drop("_frac", "_h")


def gen_pages_df(spark, seeds, n_images: int = 24, seed: int = 42, languages=("de",)):
    """Distributed page generator for benchmark-scale corpora: one
    GEPRIS-shaped HTML page per (distinct canonical seed url, language),
    built with Spark string expressions + a broadcast join onto the
    (tiny) image table for the embedded data-URI figure. Same status
    mix as gen_pages_pdf (94/2/2/2); pages carry the same structural
    elements the parser exercises (h1.facelift, nameX/valueX spans,
    ul/li tree, figure+figcaption). Fidelity is benchmark-grade — the
    byte-exact fixture pages for correctness tests come from the
    pandas generator."""
    from pyspark.sql import functions as F

    images = gen_images_pdf(n_images, seed)
    img_rows = [
        (i, base64.b64encode(r["bytes"]).decode(), r["fmt"], r["caption"], r["image_id"])
        for i, r in images.iterrows()
    ]
    img_df = spark.createDataFrame(
        img_rows, "img_idx long, b64 string, fmt string, caption string, image_id string"
    )
    uniq = (
        seeds.dropna(subset=["item_id"])
        .where(~F.col("url").contains("?"))
        .dropDuplicates(["url"])
        .select("url", "context", "item_id")
    )
    out = []
    for language in languages:
        h = F.abs(F.xxhash64(F.lit(seed), F.lit("page"), F.col("url"), F.lit(language)))
        p = h % 100
        status = (
            F.when(p < 94, "success")
            .when(p < 96, "moved")
            .when(p < 98, "bad_structure")
            .otherwise("wrong_language")
        )
        page_lang = F.when(
            status == "wrong_language", F.lit("en" if language == "de" else "de")
        ).otherwise(F.lit(language))
        joined = uniq.withColumn("img_idx", F.col("item_id") % n_images).join(
            F.broadcast(img_df), "img_idx"
        )
        spans = F.format_string(
            '<span class="name1">Antragsteller</span>'
            '<span class="value1">Wert %s-1 für Antragsteller</span>'
            '<span class="name2">Fachliche Zuordnung</span>'
            '<span class="value2">Wert %s-2 für Fachliche Zuordnung</span>'
            '<span class="name3">Förderung</span>'
            '<span class="value3">Förderung von %s bis %s</span>'
            '<span class="name4">Internetseite</span>'
            '<span class="value4">https://example.org/p/%s</span>',
            F.col("item_id").cast("string"),
            F.col("item_id").cast("string"),
            (F.lit(2000) + h % 20).cast("string"),
            (F.lit(2001) + h % 21).cast("string"),
            F.col("item_id").cast("string"),
        )
        tree = F.format_string(
            '<div id="projektbaum" class="content_frame"><ul>'
            '<li><a href="/gepris/projekt/%s">Teilprojekt A</a></li>'
            '<li>Gruppe<ul><li><a href="/gepris/projekt/%s">Teilprojekt B</a></li></ul></li>'
            "</ul></div>",
            (F.col("item_id") * 10 + 1).cast("string"),
            (F.col("item_id") * 10 + 2).cast("string"),
        )
        figure = F.format_string(
            '<figure><img id="%s" src="data:image/%s;base64,%s"/>'
            "<figcaption>%s</figcaption></figure>",
            F.col("image_id"), F.col("fmt"), F.col("b64"), F.col("caption"),
        )
        success_html = F.concat(
            F.format_string(
                '<html lang="%s"><head><title>GEPRIS</title></head><body>'
                '<abbr title="Deutsche Forschungsgemeinschaft">DFG</abbr>'
                '<h2 class="h2-context-title">%s</h2>'
                '<h1 class="facelift">Eintrag %s  (%s)</h1>'
                '<div class="content_inside">',
                page_lang, F.col("context"), F.col("item_id").cast("string"), F.col("context"),
            ),
            spans, tree, figure, F.lit("</div></body></html>"),
        )
        moved_title = "Page not found" if language == "en" else "Seite nicht gefunden"
        html = (
            F.when(status == "bad_structure", F.lit("<html><body><p>unexpected layout</p></body></html>"))
            .when(
                status == "moved",
                F.lit(
                    f"<html><head><title>{moved_title}</title></head>"
                    f"<body><h2>{moved_title}</h2></body></html>"
                ),
            )
            .otherwise(success_html)
        )
        out.append(
            joined.select(
                "url",
                F.lit(language).alias("language"),
                status.alias("status"),
                html.alias("html"),
                F.when(status == "success", F.array(F.col("image_id")))
                .otherwise(F.array().cast("array<string>"))
                .alias("embedded_image_ids"),
                (F.lit(5) + F.shiftright(h, 16) % 45).cast("int").alias("fetch_cost_ms"),
            )
        )
    res = out[0]
    for d in out[1:]:
        res = res.unionByName(d)
    return res


def ref_person_ids(projekt_id: int) -> list[int]:
    """Person ids a projekt's Antragsteller span links to (1-2 ids from
    a 200-id pool — larger than any test crawl's person set, so some
    referenced persons are always undiscovered -> Q4 has work)."""
    h = _stable_u64("refperson", projekt_id)
    return sorted({1 + (h >> (8 * j)) % 200 for j in range(1 + h % 2)})


def ref_institution_id(projekt_id: int) -> int:
    """Institution id of the projekt's applicant institution link."""
    return 1 + _stable_u64("refinst", projekt_id) % 150


def sub_institution_ids(institution_id: int) -> list[int]:
    """Direct children in the synthetic institution hierarchy: a binary
    forest (children of k are 2k, 2k+1 up to a fixed 90-id pool), so
    crawled institutions form real multi-level trees for Q6/Q8."""
    kids = [k for k in (2 * institution_id, 2 * institution_id + 1) if k <= 90]
    return kids


def has_result(item_id: int) -> bool:
    """Whether a projekt carries a result tab (deterministic ~60%).

    Mirrors GEPRIS, where only a subset of projekte have the
    "Projektergebnisse" tab that triggers the 3rd/4th fetch of the
    details chain (spiders/details.py:91-96)."""
    return _stable_u64("hasresult", item_id) % 100 < 60


def result_href(item_id: int) -> str:
    """Root-relative result-tab href, as on the live site."""
    return f"/gepris/projekt/{item_id}/ergebnisse"


def _result_page_html(item_id: int, language: str, status: str) -> str:
    """Projekt result page (spiders/details.py:98-117 grammar):
    #projektbeschreibung with summary <p>, attribute span rows
    (Erstellungsjahr -> normalisation/project_result_attributes.py:7-9)
    and ul.publications entries whose trailing '(Siehe online unter'
    chrome the loader must filter (items.py:133-149)."""
    if status == "moved":
        title = "Page not found" if language == "en" else "Seite nicht gefunden"
        return f"<html><head><title>{title}</title></head><body><h2>{title}</h2></body></html>"
    h = _stable_u64("ressum", item_id, language)
    if h % 10 == 0:
        summary = (
            "Keine Zusammenfassung vorhanden" if language == "de" else "No abstract available"
        )
    else:
        summary = (
            f"Ergebnisbericht  {item_id}: Abschluss und  Auswertung ({language})."
        )
    year = 2005 + _stable_u64("resyear", item_id) % 18
    pubs = []
    for j in range(1 + h % 3):
        pubs.append(
            f"<li>Autor {item_id}-{j} (2020): Titel {item_id}-{j}"
            f'<a href="https://doi.org/10.5555/{item_id}.{j}">DOI {item_id}.{j}</a>'
            f'(Siehe online unter<a href="https://dx.doi.org/10.5555/{item_id}.{j}">'
            f"https://dx.doi.org/10.5555/{item_id}.{j}</a>)</li>"
        )
    return (
        f'<html lang="{language}"><head><title>GEPRIS</title></head><body>'
        f'<abbr title="Deutsche Forschungsgemeinschaft">DFG</abbr>'
        f'<h2 class="h2-context-title">projekt</h2>'
        f'<div id="projektbeschreibung">'
        f"<p>{summary}</p>"
        f'<div><span class="name1">Erstellungsjahr</span>'
        f'<span class="value1">{year}</span></div>'
        f'<ul class="publications">{"".join(pubs)}</ul>'
        f"</div></body></html>"
    )


def _page_html(context: str, item_id: int, language: str, image_b64: str | None,
               image_fmt: str | None, caption: str | None, status: str,
               image_id: str | None = None) -> str:
    """Minimal GEPRIS-shaped page (grammar of spiders/base.py:42-118:
    h1.facelift name, div.content_inside with nameX/valueX span pairs,
    a ul/li tree, and — beyond the reference, per input_hint — an
    embedded image with figcaption)."""
    if status == "bad_structure":
        return "<html><body><p>unexpected layout</p></body></html>"
    if status == "moved":
        title = "Page not found" if language == "en" else "Seite nicht gefunden"
        return f"<html><head><title>{title}</title></head><body><h2>{title}</h2></body></html>"
    page_lang = ("en" if language == "de" else "de") if status == "wrong_language" else language
    h = _stable_u64("attrs", context, item_id)
    spans = []
    for idx, key in enumerate(ATTR_KEYS[: 3 + h % 4], start=1):
        value = f"Wert {item_id}-{idx} für {key}"
        if key == "Förderung":
            value = f"Förderung von {2000 + h % 20} bis {2001 + h % 21}"
        if key == "Internetseite":
            value = f"https://example.org/p/{item_id}"
        if context == "projekt" and key == "Antragsteller":
            # real person-reference links (live pages link applicants);
            # key variant exercises the gendered N2 recode; ids spill
            # past any crawled id range so Q4 discovery has work
            key = ("Antragsteller", "Antragstellerin")[h % 3 == 1]
            value = "".join(
                f'<a href="/gepris/person/{pid}">Prof. Dr. Person {pid}</a>'
                for pid in ref_person_ids(item_id)
            )
        spans.append(
            f'<span class="name{idx}">{key}</span>'
            f'<span class="value{idx}">{value}</span>'
        )
    if context == "projekt":
        iid = ref_institution_id(item_id)
        idx = len(spans) + 1
        spans.append(
            f'<span class="name{idx}">Antragstellende Institution</span>'
            f'<span class="value{idx}">'
            f'<a href="/gepris/institution/{iid}">Institut {iid}</a></span>'
        )
    beschreibung = ""
    if context == "projekt":
        hb = _stable_u64("beschr", item_id, language)
        if hb % 12 == 0:
            text = (
                "Keine Zusammenfassung vorhanden" if language == "de" else "No abstract available"
            )
        else:
            text = f"Projektbeschreibung  {item_id}: Untersuchung und  Analyse ({language})."
        beschreibung = (
            f'<div id="projektbeschreibung"><div id="projekttext">{text}</div></div>'
        )
    tree = (
        f'<div id="projektbaum" class="content_frame"><ul>'
        f'<li><a href="/gepris/projekt/{item_id * 10 + 1}">Teilprojekt A</a></li>'
        f"<li>Gruppe<ul><li><a href=\"/gepris/projekt/{item_id * 10 + 2}\">Teilprojekt B</a>"
        f"</li></ul></li></ul></div>"
    )
    if context == "institution":
        kids = sub_institution_ids(item_id)
        if kids:
            grand = sub_institution_ids(kids[0])
            nested = (
                f'<ul><li><a href="/gepris/institution/{grand[0]}">Institut {grand[0]}</a>'
                f"</li></ul>" if grand else ""
            )
            lis = f'<li><a href="/gepris/institution/{kids[0]}">Institut {kids[0]}</a>{nested}</li>'
            for k in kids[1:]:
                lis += f'<li><a href="/gepris/institution/{k}">Institut {k}</a></li>'
            tree += (
                f'<div id="untergeordneteInstitutionen" class="content_frame">'
                f"<ul>{lis}</ul></div>"
            )
    figure = ""
    if image_b64 is not None:
        id_attr = f' id="{image_id}"' if image_id else ""
        figure = (
            f'<figure><img{id_attr} src="data:image/{image_fmt};base64,{image_b64}"/>'
            f"<figcaption>{caption}</figcaption></figure>"
        )
    tabs = ""
    if context == "projekt" and has_result(item_id):
        tabs = (
            '<ul class="tabs"><li id="tabbutton1"><a href="#">Details</a></li>'
            f'<li id="tabbutton2"><a href="{result_href(item_id)}">Projektergebnisse</a></li></ul>'
        )
    return (
        f'<html lang="{page_lang}"><head><title>GEPRIS</title></head><body>'
        f'<abbr title="Deutsche Forschungsgemeinschaft">DFG</abbr>'
        f'<h2 class="h2-context-title">{context}</h2>'
        f'<h1 class="facelift">Eintrag {item_id}  ({context})</h1>'
        f'<div class="content_inside">{tabs}{beschreibung}{"".join(spans)}{tree}{figure}</div>'
        f"</body></html>"
    )


def gen_pages_pdf(seeds_pdf: pd.DataFrame, images_pdf: pd.DataFrame, seed: int = 42) -> pd.DataFrame:
    """One page per (distinct canonical seed url, language in de/en).

    Status distribution ~94% success / 2% moved / 2% bad_structure /
    2% wrong_language (FIXTURES.md §3), deterministic per url.
    """
    uniq = seeds_pdf.dropna(subset=["item_id"]).drop_duplicates(subset=["url"])
    uniq = uniq[~uniq["url"].str.contains(r"[?#]")]
    images = images_pdf.reset_index(drop=True)
    n_images = len(images)
    rows = []
    for row in uniq.itertuples(index=False):
        for language in ("de", "en"):
            h = _stable_u64(seed, "page", row.url, language)
            p = h % 100
            status = (
                "success" if p < 94 else "moved" if p < 96 else "bad_structure" if p < 98 else "wrong_language"
            )
            img = images.iloc[int(row.item_id) % n_images] if n_images else None
            b64 = base64.b64encode(img["bytes"]).decode() if img is not None else None
            rows.append(
                {
                    "url": row.url,
                    "language": language,
                    "status": status,
                    "html": _page_html(
                        row.context,
                        int(row.item_id),
                        language,
                        b64,
                        img["fmt"] if img is not None else None,
                        img["caption"] if img is not None else None,
                        status,
                        image_id=img["image_id"] if img is not None else None,
                    ),
                    "embedded_image_ids": [img["image_id"]] if img is not None and status == "success" else [],
                    "fetch_cost_ms": int(5 + (h >> 16) % 45),
                }
            )
        # projekt result pages (A6 stages 3-4, spiders/details.py:91-117):
        # the server serves them whenever the projekt has a result tab;
        # whether they get fetched depends on the en detail page parse
        if row.context == "projekt" and has_result(int(row.item_id)):
            base = row.url.split("?")[0]
            host = base.split("/")[2]
            res_url = f"https://{host}{result_href(int(row.item_id))}"
            for language in ("de", "en"):
                hr = _stable_u64(seed, "respage", res_url, language)
                res_status = "success" if hr % 100 < 96 else "moved"
                rows.append(
                    {
                        "url": res_url,
                        "language": language,
                        "status": res_status,
                        "html": _result_page_html(int(row.item_id), language, res_status),
                        "embedded_image_ids": [],
                        "fetch_cost_ms": int(5 + (hr >> 16) % 45),
                    }
                )
    return pd.DataFrame(rows)


def _search_result_div(context: str, item_id, name: str, h: int) -> str:
    """One search-result row (search_results.py:45-100 grammar)."""
    href = f"/gepris/{context}/{item_id}"
    head = f'<h2><a href="{href}">{name}</a></h2>'
    if context == "projekt":
        spans = (
            '<span class="name1">Antragsteller</span>'
            f'<span class="value1">Person {h % 97}</span>'
            '<span class="name2">Förderung</span>'
            f'<span class="value2">Förderung von {2000 + h % 20} bis {2001 + h % 21}</span>'
        )
        body = f'<div class="details"><div>{spans}</div></div>'
    elif context == "person":
        body = f'<div class="beschreibung">Universität Beispielstadt {h % 50}</div>'
    else:
        subs = ""
        for j in range(h % 3):
            sub_id = int(item_id) * 100 + j if item_id != "null" else j
            subs += (
                f'<div class="subInstitution"><a href="/gepris/institution/{sub_id}">'
                f"Unterinstitut {sub_id}</a> Nebenstraße {j}</div>"
            )
        body = subs
    return f'<div class="result">{head}{body}</div>'


def gen_search_pages_pdf(
    context: str, n_items: int, page_size: int = 50, seed: int = 42, null_rate: float = 0.02
) -> pd.DataFrame:
    """Paginated search-result pages (S1/P6/P7 fixtures): `result-info`
    carries the dot-formatted total (G3); each page holds `page_size`
    result rows (last page short), ~null_rate rows are the
    `/gepris/<ctx>/null` links the parser must warn-and-skip
    (search_results.py:49-50); institutions carry subInstitution rows
    (P7)."""
    total_fmt = f"{n_items:,}".replace(",", ".")
    rows = []
    for start in range(0, n_items, page_size):
        ids = range(start + 1, min(start + page_size, n_items) + 1)
        divs = []
        n_real = 0
        for i in ids:
            h = _stable_u64(seed, "search", context, i)
            if (h % 10_000) / 10_000 < null_rate:
                divs.append(_search_result_div(context, "null", "Kaputt", h))
            else:
                divs.append(_search_result_div(context, i, f"Eintrag {i} ({context})", h))
                n_real += 1
        html = (
            f'<html lang="de"><body>'
            f'<div id="result-info" data-result-count="{total_fmt}"></div>'
            f'<div id="liste">{"".join(divs)}'
            f'<div class="pagination">1 2 3</div></div>'
            f"</body></html>"
        )
        rows.append(
            {
                "url": f"https://{GEPRIS_HOST}/search/{context}?index={start}",
                "context": context,
                "page_index": start // page_size,
                "html": html,
                "n_rows_on_page": len(list(ids)),
                "n_real_items": n_real,
            }
        )
    return pd.DataFrame(rows)


def ref_samples(audio_index: int, seed: int = 42) -> np.ndarray:
    """Pre-encode reference audio for row n: seeded harmonic stack +
    noise floor, int16 mono. The verification oracle re-derives these
    (same contract as ref_pixels)."""
    rng = np.random.default_rng(seed * 2_000_003 + audio_index)
    sr = (8000, 16000, 22050)[audio_index % 3]
    n = sr // 2  # half a second
    t = np.arange(n) / sr
    f0 = 110.0 * (1 + audio_index % 7)
    sig = (
        0.5 * np.sin(2 * np.pi * f0 * t)
        + 0.25 * np.sin(2 * np.pi * 2 * f0 * t + 0.3)
        + 0.1 * np.sin(2 * np.pi * 3 * f0 * t + 0.7)
        + 0.01 * rng.standard_normal(n)
    )
    return np.clip(np.round(sig * 18000), -32768, 32767).astype(np.int16)


def audio_sample_rate(audio_index: int) -> int:
    return (8000, 16000, 22050)[audio_index % 3]


def gen_audio_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    """Audio payload rows (binary WAV + typed metadata, the audio
    analogue of the input_hint image schema). fmt alternates pcm16
    (lossless) / mulaw (lossy, exercises the SNR>=30dB bound)."""
    from gepris_spark.codecs import wav

    rows = []
    for i in range(n):
        samples = ref_samples(i, seed)
        sr = audio_sample_rate(i)
        fmt = ("pcm16", "mulaw")[i % 2]
        rows.append(
            {
                "audio_id": f"aud{i:08d}",
                "bytes": wav.encode(samples, sr, fmt),
                "sample_rate": sr,
                "channels": 1,
                "n_samples": len(samples),
                "fmt": fmt,
            }
        )
    return pd.DataFrame(rows)


def ref_frame(video_index: int, frame_idx: int, seed: int = 42) -> np.ndarray:
    """Frame f of video n: a gradient field whose phase advances per
    frame (smooth motion — compresses like video, unlike iid noise)."""
    rng = np.random.default_rng(seed * 3_000_017 + video_index)
    size = (32, 48)[video_index % 2]
    phase = rng.uniform(0, 2 * np.pi)
    yy, xx = np.mgrid[0:size, 0:size]
    t = frame_idx / 8.0
    r = 127.5 + 120 * np.sin(2 * np.pi * xx / size + phase + t)
    g = 127.5 + 120 * np.sin(2 * np.pi * yy / size + phase - t)
    b = 127.5 + 120 * np.sin(2 * np.pi * (xx + yy) / (2 * size) + t)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def gen_video_pdf(n: int, seed: int = 42, n_frames: int = 12, fps: int = 8) -> pd.DataFrame:
    """Video payload rows: MJPEG-AVI containers of seeded moving-
    gradient frames (codecs/avi.py)."""
    from gepris_spark.codecs import avi

    rows = []
    for i in range(n):
        frames = [ref_frame(i, f, seed) for f in range(n_frames)]
        rows.append(
            {
                "video_id": f"vid{i:08d}",
                "bytes": avi.encode(frames, fps=fps),
                "n_frames": n_frames,
                "fps": fps,
                "w": frames[0].shape[1],
                "h": frames[0].shape[0],
            }
        )
    return pd.DataFrame(rows)


GOOGLE_CACHE_BASE_URL = "https://webcache.googleusercontent.com/search?q=cache:"


def cache_hit(url: str, seed: int = 42, hit_rate: int = 65) -> bool:
    """Whether google's webcache holds a snapshot for `url`
    (deterministic ~hit_rate%). Misses are simply absent from the cache
    page table — the connection-failure analogue that fires the
    reference's errback (spiders/person_details.py:66-69)."""
    return _stable_u64(seed, "gcache", url) % 100 < hit_rate


def gen_cache_pages_pdf(
    seeds_pdf: pd.DataFrame,
    images_pdf: pd.DataFrame,
    seed: int = 42,
    hit_rate: int = 65,
) -> pd.DataFrame:
    """Google-webcache snapshot corpus for the S9 fallback fetch
    (spiders/person_details.py): for ~hit_rate% of distinct person
    seed urls, a snapshot page exists at GOOGLE_CACHE_BASE_URL+url.

    The snapshot body is the same GEPRIS person page grammar (google
    serves a byte-preserved copy modulo its own banner chrome, which
    the parser ignores: it only reads h1.facelift / details spans /
    trees). Snapshots are always de-language and always structurally
    intact — a stale-but-parseable copy; the live-fetch fallback path
    carries the usual status mix."""
    uniq = seeds_pdf.dropna(subset=["item_id"]).drop_duplicates(subset=["url"])
    uniq = uniq[~uniq["url"].str.contains(r"[?#]")]
    uniq = uniq[uniq["context"] == "person"]
    images = images_pdf.reset_index(drop=True)
    n_images = len(images)
    rows = []
    for row in uniq.itertuples(index=False):
        if not cache_hit(row.url, seed, hit_rate):
            continue
        h = _stable_u64(seed, "gcachepage", row.url)
        img = images.iloc[int(row.item_id) % n_images] if n_images else None
        b64 = base64.b64encode(img["bytes"]).decode() if img is not None else None
        body = _page_html(
            "person",
            int(row.item_id),
            "de",
            b64,
            img["fmt"] if img is not None else None,
            img["caption"] if img is not None else None,
            "success",
            image_id=img["image_id"] if img is not None else None,
        )
        banner = (
            '<div id="google-cache-hdr">This is Google\'s cache of '
            f"{row.url}.</div>"
        )
        rows.append(
            {
                "url": GOOGLE_CACHE_BASE_URL + row.url,
                "language": "de",
                "status": "success",
                "html": body.replace("<body>", "<body>" + banner, 1),
                "embedded_image_ids": [img["image_id"]] if img is not None else [],
                "fetch_cost_ms": int(3 + (h >> 16) % 20),
            }
        )
    return pd.DataFrame(
        rows,
        columns=["url", "language", "status", "html", "embedded_image_ids", "fetch_cost_ms"],
    )


def fetch_latency_ms(canon_url: str, seed: int = 42) -> int:
    """Deterministic synthetic fetch latency for the AIMD politeness
    contract (operators/politeness.py AIMD notes): wide spread
    (50..16049 ms) so the per-host AutoThrottle delay actually evolves
    instead of pinning to the 2 s floor; keyed on (seed, canonical
    url)."""
    return 50 + _stable_u64(seed, "latency", canon_url) % 16000


def gen_latencies_pdf(seeds_pdf: pd.DataFrame, seed: int = 42) -> pd.DataFrame:
    """(url, fetch_cost_ms) over the seed list's canonical urls — the
    latency feed the AIMD engine joins against each visit batch; the
    replay oracle consumes the identical formula via
    fetch_latency_ms."""
    from gepris_spark.replay import canonicalize

    canon = sorted({c for c in (canonicalize(u) for u in seeds_pdf["url"]) if c})
    return pd.DataFrame(
        {"url": canon, "fetch_cost_ms": [fetch_latency_ms(u, seed) for u in canon]}
    )


def gen_sitemaps_pdf(
    n: int = 30,
    seed: int = 42,
    n_extra_hosts: int = 3,
    n_new_per_context: int = 10,
) -> pd.DataFrame:
    """Per-host sitemap XML corpus for the seed-discovery contract
    (crawl_sitemap_expand): one `<urlset>` per host over the SAME seed
    universe as the replay fixtures (gen_seeds_pdf(n) hosts/ids), all
    derived from (seed, index) hash formulas.

    Entry mix per host:

    * ~half of the host's already-crawled urls (must be anti-joined
      away against the visit-log seen set);
    * ~10% non-canonical `?language=en#top` variants of crawled urls
      (must canonicalize, then anti-join away);
    * every discovery url (item ids n+1 .. n+n_new_per_context per
      context, host by the same _stable_u64 placement formula as
      gen_seeds_pdf) — the expected output;
    * ~1/3 of mirror-host discoveries cross-listed on the
      gepris.dfg.de sitemap under a DIFFERENT lastmod (the dedup must
      collapse them to one row keeping the max lastmod);
    * per-host junk locs (`/gepris/projekt/null`, `/imprint`) the
      canonical-url grammar must reject.
    """

    def host_of(context: str, item_id: int) -> str:
        h = _stable_u64(seed, context, item_id)
        return GEPRIS_HOST if h % 10 < 7 else f"mirror{h % n_extra_hosts}.example.org"

    def lastmod_of(context: str, item_id, salt: str = "lastmod") -> str:
        h = _stable_u64(seed, salt, context, item_id)
        return (BASE_EPOCH - timedelta(days=int(h % 365))).date().isoformat()

    hosts = [GEPRIS_HOST] + [f"mirror{i}.example.org" for i in range(n_extra_hosts)]
    entries: dict[str, list[str]] = {h: [] for h in hosts}

    def add(host: str, loc: str, lastmod: str) -> None:
        entries[host].append(f"<url><loc>{loc}</loc><lastmod>{lastmod}</lastmod></url>")

    for context in CONTEXTS:
        for item_id in range(1, n + 1):  # already-crawled universe
            h = host_of(context, item_id)
            url = f"https://{h}/gepris/{context}/{item_id}"
            sel = _stable_u64(seed, "sm-seen", context, item_id)
            if sel % 2 == 0:
                add(h, url, lastmod_of(context, item_id))
            elif sel % 5 == 1:
                add(h, url + "?language=en#top", lastmod_of(context, item_id))
        for item_id in range(n + 1, n + n_new_per_context + 1):  # discoveries
            h = host_of(context, item_id)
            url = f"https://{h}/gepris/{context}/{item_id}"
            add(h, url, lastmod_of(context, item_id))
            if h != GEPRIS_HOST and _stable_u64(seed, "xlist", context, item_id) % 3 == 0:
                add(GEPRIS_HOST, url, lastmod_of(context, item_id, salt="lastmod2"))
    for h in hosts:  # grammar-reject fodder
        add(h, f"https://{h}/gepris/projekt/null", lastmod_of("junk", 0))
        add(h, f"https://{h}/imprint", lastmod_of("junk", 1))
    return pd.DataFrame(
        [
            {
                "host": h,
                "sitemap_xml": '<?xml version="1.0" encoding="UTF-8"?><urlset>'
                + "".join(es)
                + "</urlset>",
            }
            for h, es in entries.items()
        ]
    )


def gen_robots_pdf(seed: int = 42, n_extra_hosts: int = 3) -> pd.DataFrame:
    """Per-host robots.txt corpus for the robots-policy contract
    (crawl_robots_policy): deterministic bodies over the replay hosts
    exercising every branch of the A4 parser (politeness.py:79-106) —
    a non-star UA group that must be ignored (including its Disallow: /
    and Crawl-delay), comments, blank lines, the empty-Disallow
    allow-all line, 0-2 real star-group prefixes, fractional
    Crawl-delay seconds on some hosts, a Sitemap line the key grammar
    skips, and one host with no star group at all (default policy)."""
    hosts = [GEPRIS_HOST] + [f"mirror{i}.example.org" for i in range(n_extra_hosts)]
    rows = []
    for i, host in enumerate(hosts):
        h = _stable_u64(seed, "robots", host)
        lines = [
            "# synthetic robots fixture",
            "User-agent: SpecialBot",
            "Disallow: /",
            "Crawl-delay: 99",
            "",
        ]
        # branch mix keyed on the host INDEX so every parser branch is
        # guaranteed exercised (values stay hash-derived): host 3 has
        # no star group; hosts 0/1/2 carry 0/1/2 disallow prefixes;
        # even hosts a fractional Crawl-delay
        if i != 3:
            pool = ["/gepris/institution/", f"/gepris/person/{1 + h % 9}", "/private/"]
            lines += ["User-agent: *", "Disallow:"]
            lines += [f"Disallow: {pool[k]}" for k in range(i % 3)]
            if i % 2 == 0:
                lines.append(f"Crawl-delay: {1 + h % 5}.5")
            lines.append(f"Sitemap: https://{host}/sitemap.xml")
        rows.append({"host": host, "robots_txt": "\n".join(lines)})
    return pd.DataFrame(rows)


def write_fixtures(out_dir: str, n_per_context: int = 60, n_images: int = 40, seed: int = 42) -> dict:
    """Write the t1-scale fixture parquet files; returns row counts."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    images = gen_images_pdf(n_images, seed)
    seeds = gen_seeds_pdf(n_per_context, seed)
    pages = gen_pages_pdf(seeds, images, seed)
    images.to_parquet(os.path.join(out_dir, "images.parquet"), index=False)
    seeds.to_parquet(os.path.join(out_dir, "seeds.parquet"), index=False)
    pages.to_parquet(os.path.join(out_dir, "pages.parquet"), index=False)
    return {"images": len(images), "seeds": len(seeds), "pages": len(pages)}
