"""Text-analysis functions for large-scale training-data pipelines.

Language-ID (stopword n-gram heuristic), quality scoring, token
counting, and document fingerprinting — all as pure built-in Column
expressions (JVM-side, codegen'd), each with an exactly-equivalent
ANSI-SQL form used by the DuckDB oracle (see plans/datapipe.py).

Portability contract (Spark <-> DuckDB bit-identical):
* tokenization = regexp_extract_all(lower(text), '[a-z0-9]+')
* hash60(s) = int(md5(s)[:15 hex], 16)  — 60-bit, engine-neutral
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"

# Small, distinctive stopword sets (overlapping ambiguous tokens removed).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "was", "for", "with", "that", "this"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "un", "une", "est", "pour", "dans", "qui"],
    "es": ["el", "los", "las", "una", "por", "para", "que", "como", "pero", "sus"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tiebreak precedence

PUNCT_RE = r"[.,;:!?]"


def tokens(text: Column) -> Column:
    """Tokenize: lowercase alnum runs (BPE-ish regex tokenizer baseline)."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def _bind(value: Column, fn) -> Column:
    """Evaluate `value` ONCE per row and pass it to `fn` as a bound
    variable. Catalyst re-evaluates a Column expression at every
    reference — inside a higher-order-function lambda that means once
    PER ELEMENT (a regexp normalization referenced in a transform
    lambda cost 5x the whole query). Routing the value through a
    1-element array transform makes it a lambda variable, which is
    evaluated once and shared by every reference in fn's body."""
    return F.element_at(F.transform(F.array(value), fn), 1)


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def hash60(col: Column) -> Column:
    """Engine-neutral 60-bit hash: first 15 hex chars of md5 as a long.

    DuckDB form: ('0x' || substr(md5(x), 1, 15))::BIGINT
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _stopword_hits(toks: Column, lang: str) -> Column:
    stop = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(stop))).cast("long")


def langid(text: Column) -> Column:
    """Language-ID heuristic: argmax of stopword hits per language,
    ties broken by LANG_ORDER precedence; no hits at all -> 'unknown'.
    Tokenization is bound once per row; the CASE chain's many hit
    references then scan the bound array instead of re-tokenizing.
    """

    def body(toks: Column) -> Column:
        hits = {lang: _stopword_hits(toks, lang) for lang in LANG_ORDER}
        expr = F.lit("unknown")
        # Build the CASE chain back-to-front so earlier langs win ties.
        for lang in reversed(LANG_ORDER):
            cond = hits[lang] > 0
            for other in LANG_ORDER:
                if other == lang:
                    break
                cond = cond & (hits[lang] > hits[other])
            for other in LANG_ORDER[LANG_ORDER.index(lang) + 1 :]:
                cond = cond & (hits[lang] >= hits[other])
            expr = F.when(cond, F.lit(lang)).otherwise(expr)
        return expr

    return _bind(tokens(text), body)


def punct_count(text: Column) -> Column:
    return (F.length(text) - F.length(F.regexp_replace(text, PUNCT_RE, ""))).cast("long")


def quality_score(text: Column) -> Column:
    """Deterministic quality score in [0,1]:

      0.4 * clamp(token_count/100, 0, 1)          (length signal)
      + 0.4 * clamp(stopword_ratio * 5, 0, 1)     (fluency signal)
      + 0.2 * (1 - clamp(punct_ratio * 20, 0, 1)) (noise signal)

    stopword_ratio = hits over the union stoplist / token_count.
    """
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    punct_ratio = F.when(
        F.length(text) > 0, punct_count(text).cast("double") / F.length(text).cast("double")
    ).otherwise(F.lit(0.0))
    clamp = lambda c: F.least(F.greatest(c, F.lit(0.0)), F.lit(1.0))  # noqa: E731

    def body(toks: Column) -> Column:
        n = F.size(toks).cast("double")
        hits = F.size(F.filter(toks, lambda t: t.isin(all_stop))).cast("double")
        stop_ratio = F.when(n > 0, hits / n).otherwise(F.lit(0.0))
        return F.round(
            F.lit(0.4) * clamp(n / F.lit(100.0))
            + F.lit(0.4) * clamp(stop_ratio * 5)
            + F.lit(0.2) * (F.lit(1.0) - clamp(punct_ratio * 20)),
            6,
        )

    return _bind(tokens(text), body)


# Mersenne prime 2^61-1: the fingerprint accumulator is reduced mod
# this on every step, so the running value stays < 2^61 and the
# per-step add (< 2^61 + 2^31*n_tokens) can't overflow int64 for any
# document under 2^30 tokens. The DuckDB oracle applies the same mod to
# its (HUGEINT) total — identical residues because mod distributes over
# the sum.
FINGERPRINT_MOD = 2305843009213693951


def fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint (rolling-hash style):

      (sum over tokens of (hash60(token) mod 2^31) * position_1based)
        mod FINGERPRINT_MOD

    Without the modulus the sum overflows int64 around 10^4.5-token
    documents ((2^31) * n^2 / 2); the synthetic corpus never gets
    there, a real crawl does. Each term is < 2^31 * n, exact in int64
    up to n = 2^30 tokens/doc. DuckDB form uses unnest +
    generate_subscripts."""
    toks = tokens(text)
    weighted = F.transform(
        toks, lambda t, i: F.pmod(hash60(t), F.lit(2147483648)) * (i.cast("long") + 1)
    )
    return F.aggregate(
        weighted,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc + x, F.lit(FINGERPRINT_MOD)),
    )


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams (shingles) of the normalized text.

    Normalization: lowercase, collapse whitespace to single spaces —
    bound once per row (see _bind), then sliced at every offset via
    transform over a 1..len-n+1 index sequence.
    """
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))

    def shingle(s: Column) -> Column:
        idx = F.sequence(F.lit(1), F.length(s) - (n - 1))
        grams = F.array_distinct(F.transform(idx, lambda i: s.substr(i, F.lit(n))))
        # sequence(1, k) is descending when k < 1 — guard short strings.
        return F.when(F.length(s) >= n, grams).otherwise(F.array().cast("array<string>"))

    return _bind(norm, shingle)


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles joined by single spaces (tokenization
    bound once per row, not once per shingle)."""

    def shingle(toks: Column) -> Column:
        count = F.greatest(F.size(toks) - (k - 1), F.lit(0))
        idx = F.sequence(F.lit(0), count - 1)
        return F.when(count > 0, F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
        )).otherwise(F.array().cast("array<string>"))

    return _bind(tokens(text), shingle)
