"""Variable-length ExactSubstr (q_text_exact_substring_spans): planted
spans of known lengths must surface as maximal islands of exactly
those lengths (round-4 verdict stretch #10 — the any-length->=L
semantics of Lee et al. 2022, built from the fixed-L window relation
via union-of-intervals, no suffix array).
"""

from __future__ import annotations

import pandas as pd
import pytest

from gepris_spark.plans import trainprep as TP

L = TP._ESS_L  # 10


def _doc(tokens: list[str]) -> str:
    return " ".join(tokens)


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """doc 0 is the keeper; higher docs embed verbatim copies of known
    lengths, padded by per-doc unique filler so no window crosses a
    span boundary."""
    base = [f"w{i}x" for i in range(100)]

    def filler(doc: int, n: int, tag: str) -> list[str]:
        return [f"u{doc}{tag}{i}q" for i in range(n)]

    docs = {
        0: base,  # keeper: every shared hash's min doc_id
        # exactly L tokens copied -> one span of exactly L
        1: filler(1, 12, "a") + base[10:20] + filler(1, 12, "b"),
        # L+3 tokens -> one span of 13
        2: filler(2, 11, "a") + base[20:33] + filler(2, 11, "b"),
        # 2L+7 tokens -> one span of 27; filler kept under 27 tokens so
        # dup_frac = 27/49 > 0.5 and the keep gate trips
        3: filler(3, 10, "a") + base[0:27] + filler(3, 12, "b"),
        # two disjoint copies (10 and 16) -> two spans
        4: filler(4, 10, "a") + base[40:50] + filler(4, 12, "b") + base[60:76] + filler(4, 10, "c"),
        # shorter than L -> no windows at all
        5: [f"u5z{i}q" for i in range(L - 1)],
    }
    pdf = pd.DataFrame(
        {
            "doc_id": sorted(docs),
            "text": [_doc(docs[d]) for d in sorted(docs)],
            "lang": ["en"] * len(docs),
            "source": ["planted"] * len(docs),
            "n_chars": [len(_doc(docs[d])) for d in sorted(docs)],
        }
    )
    d = tmp_path_factory.mktemp("planted_spans")
    pdf.to_parquet(d / "documents.parquet")
    return str(d)


EXPECT = {
    # doc_id: (n_dup_spans, dup_tokens, max_span_tokens)
    0: (0, 0, 0),
    1: (1, L, L),
    2: (1, L + 3, L + 3),
    3: (1, 2 * L + 7, 2 * L + 7),
    4: (2, 10 + 16, 16),
    5: (0, 0, 0),
}


def _check(df: pd.DataFrame):
    got = df.set_index("doc_id")
    for doc, (n_spans, dup_tokens, max_span) in EXPECT.items():
        row = got.loc[doc]
        assert int(row["n_dup_spans"]) == n_spans, (doc, dict(row))
        assert int(row["dup_tokens"]) == dup_tokens, (doc, dict(row))
        assert int(row["max_span_tokens"]) == max_span, (doc, dict(row))
    # the keep gate: docs 3 and 4 lose >50% of their tokens
    assert bool(got.loc[0, "keep"]) and bool(got.loc[1, "keep"])
    assert not bool(got.loc[3, "keep"])


def test_planted_spans_spark(spark, planted_dir):
    _check(TP.q_text_exact_substring_spans(spark, planted_dir).toPandas())


def test_planted_spans_oracle(planted_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{planted_dir}/documents.parquet')"
    )
    _check(con.execute(TP.SQL_TEXT_EXACT_SUBSTRING_SPANS).df())


def test_fixed_l_and_spans_agree_on_who_is_duplicated(spark):
    """On the real corpus both ExactSubstr variants must flag the same
    document set (a doc has a dup WINDOW iff it has a dup SPAN — every
    dup window lies in some >=L island), while the span variant's
    token coverage is >= the window count only when spans overlap-
    merge; the sets are the invariant."""
    sf = "/root/testdata/sf0.001"
    fixed = TP.q_text_exact_substring(spark, sf).toPandas()
    spans = TP.q_text_exact_substring_spans(spark, sf).toPandas()
    assert set(fixed[fixed.n_dup_windows > 0].doc_id) == set(
        spans[spans.n_dup_spans > 0].doc_id
    )
