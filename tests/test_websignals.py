"""Semantic tests for the web-signal operators (plans/websignals.py):
anchor-text inversion, DUST rule mining, HITS, and the ordered funnel.
Oracle parity is covered by tests/test_contract_oracle.py; these pin
the domain invariants the SQL mirror alone would not catch."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

from gepris_spark.plans import websignals as ws

SF = "/root/testdata/sf0.001"


def test_anchor_text_rank_and_totals(spark):
    pdf = ws.q_graph_anchor_text(spark, SF).toPandas()
    for dst, grp in pdf.groupby("dst"):
        grp = grp.sort_values("rnk")
        # ranks are 1..k dense and frequency-ordered with anchor tiebreak
        assert list(grp.rnk) == list(range(1, len(grp) + 1))
        assert list(grp.n_links) == sorted(grp.n_links, reverse=True)
        # top anchors never exceed the target's total in-links
        assert grp.n_links.sum() <= grp.in_links.iloc[0]
        assert (grp.in_links == grp.in_links.iloc[0]).all()
    # the generic navigational anchor shows up across many targets
    assert (pdf.anchor == "hier klicken").sum() > 100


def test_dust_recovers_exactly_the_planted_rules(spark):
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    assert docs.text.nunique() == len(docs), "precondition: digests collide only via aliases"
    pdf = ws.q_dedup_url_dust(spark, SF).toPandas().set_index("rule")
    assert set(pdf.index) == {
        "strip-trailing-slash",
        "strip-param:session",
        "other-collision",
    }
    # each even doc_id plants exactly one slash pair, each %3 doc one session pair
    assert pdf.loc["strip-trailing-slash", "support"] == (docs.doc_id % 2 == 0).sum()
    assert pdf.loc["strip-param:session", "support"] == (docs.doc_id % 3 == 0).sum()
    # %6 docs carry BOTH non-base aliases, whose pair (base+'/' vs
    # base+'?session=') is same-digest but not prefix-shaped — it must
    # surface as a collision, not vanish
    assert pdf.loc["other-collision", "support"] == (docs.doc_id % 6 == 0).sum()
    assert pdf.support.ge(pdf.n_digests).all()
    assert pdf.example_url.str.startswith(ws._DUST_BASE).all()


def test_hits_mass_conservation_and_bipartite_roles(spark):
    pdf = ws.q_graph_hits(spark, SF).toPandas()
    auth = pdf[pdf.role == "authority"]
    hub = pdf[pdf.role == "hub"]
    assert auth.node.str.startswith("s:").all()
    assert hub.node.str.startswith("c:").all()
    # integer renormalization bounds each vector's total mass to
    # [MASS - n, 2*MASS): dividing by floor(total/MASS) >= 1 lands the
    # new total in [total/q - n, MASS*(q+1)/q) — deterministic on both
    # engines, within a factor of 2 of the nominal mass
    for part, total in (("auth", auth.score_m.sum()), ("hub", hub.score_m.sum())):
        assert ws._HITS_MASS - len(pdf) <= total < 2 * ws._HITS_MASS, (part, total)
    assert (pdf.score_m >= 0).all()


def test_funnel_matches_sequential_pandas_oracle(spark):
    got = ws.q_events_funnel(spark, SF).toPandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "event_type", "ts"]).to_pandas()
    n = {"view": 0, "click": 0, "purchase": 0}
    for _, g in ev.groupby("user_id"):
        t_view = g.loc[g.event_type == "view", "ts"].min()
        if pd.isna(t_view):
            continue
        n["view"] += 1
        t_click = g.loc[(g.event_type == "click") & (g.ts >= t_view), "ts"].min()
        if pd.isna(t_click):
            continue
        n["click"] += 1
        t_buy = g.loc[(g.event_type == "purchase") & (g.ts >= t_click), "ts"].min()
        if not pd.isna(t_buy):
            n["purchase"] += 1
    assert dict(zip(got.step, got.n_users)) == n
    assert list(got.n_users) == sorted(got.n_users, reverse=True), "funnel is monotone"
    assert got.bp_of_first.iloc[0] == ws._FUNNEL_BP
    expect_bp = [(u * ws._FUNNEL_BP) // max(n["view"], 1) for u in got.n_users]
    assert list(got.bp_of_first) == expect_bp


def test_retention_matches_sequential_pandas_oracle(spark):
    got = ws.q_events_retention(spark, SF).toPandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts"]).to_pandas()
    ev["week"] = ev.ts.dt.to_period("W-SUN").dt.start_time  # Monday starts
    first = ev.groupby("user_id").week.min().rename("cohort_week")
    aged = ev.join(first, on="user_id")
    aged["age_weeks"] = ((aged.week - aged.cohort_week).dt.days // 7).astype(int)
    cells = aged.drop_duplicates(["user_id", "cohort_week", "age_weeks"])
    matrix = (
        cells.groupby(["cohort_week", "age_weeks"]).size().rename("n_active").reset_index()
    )
    size = matrix[matrix.age_weeks == 0].set_index("cohort_week").n_active
    exp = {
        (r.cohort_week, r.age_weeks): (
            r.n_active,
            int(size[r.cohort_week]),
            (r.n_active * 10000) // int(size[r.cohort_week]),
        )
        for r in matrix.itertuples()
    }
    got_map = {
        (r.cohort_week, r.age_weeks): (r.n_active, r.cohort_size, r.retention_bp)
        for r in got.itertuples()
    }
    assert got_map == exp
    # matrix is monotone within a cohort only if activity never returns;
    # the hard invariants: age-0 row equals cohort size, bp <= 10000
    assert (got[got.age_weeks == 0].n_active == got[got.age_weeks == 0].cohort_size).all()
    assert got.retention_bp.le(10000).all()
