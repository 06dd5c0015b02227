"""crawl_recrawl_schedule semantics: the distributed plan must equal a
plain-pandas replay of change-rate estimation over the same events
parquet — per item: changes = value-vs-previous diffs in (ts, event_id)
order, interval = span // max(changes, 1), next_due = last + interval,
overdue measured against the corpus-wide newest observation."""

from __future__ import annotations

import pandas as pd

from gepris_spark.plans.contract_extra import q_crawl_recrawl_schedule

SF = "/root/testdata/sf0.001"


def test_recrawl_schedule_equals_pandas_replay(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")

    expected = {}
    for item, grp in ev.groupby("user_id"):
        grp = grp.sort_values(["ts", "event_id"])
        vals = grp["value"].tolist()
        n_changes = sum(1 for a, b in zip(vals, vals[1:]) if a != b)
        first, last = int(grp["us"].min()), int(grp["us"].max())
        interval = (last - first) // max(n_changes, 1)
        expected[item] = (len(grp), n_changes, interval, last + interval)
    now = max(v[3] - v[2] for v in expected.values())  # newest last-obs

    got = q_crawl_recrawl_schedule(spark, SF).toPandas()
    assert set(got["item_id"]) == set(expected)
    for _, r in got.iterrows():
        n_obs, n_changes, interval, next_due = expected[r["item_id"]]
        assert int(r["n_obs"]) == n_obs, r["item_id"]
        assert int(r["n_changes"]) == n_changes, r["item_id"]
        assert int(r["interval_us"]) == interval, r["item_id"]
        assert int(r["next_due_us"]) == next_due, r["item_id"]
        assert int(r["overdue_us"]) == now - next_due, r["item_id"]
        assert bool(r["due"]) == (now - next_due >= 0), r["item_id"]
    # the schedule actually discriminates: some items due, some not,
    # and a hot item (many changes) rechecks sooner than a cold one
    assert got["due"].any() and (~got["due"]).any()
    hot = got.loc[got["n_changes"].idxmax(), "interval_us"]
    cold = got.loc[got["n_changes"].idxmin(), "interval_us"]
    assert hot < cold
