"""Monitor path tests: P8 synonym-map parse (incl. renamed-key
regression the reference guards, test_data_monitor_spider.py), K7
alert decision matrix (test_pipelines.py:33-187 cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gepris_spark.operators import monitor

MONITOR_HTML = """
<html><body>
<p>GEPRIS Version 1.9.9-rc3</p>
<table><tbody>
<tr><td>Projekte</td><td>136.266</td></tr>
<tr><td>Personen</td><td>87.475</td></tr>
<tr><td>Institutionen</td><td>37.472</td></tr>
<tr><td>Geistes- und Sozialwissenschaften</td><td>40.000</td></tr>
<tr><td>Projekte für die Abschlussberichtsdaten in GEPRIS vorliegen</td><td>30.641</td></tr>
<tr><td>Brandneue Zeile</td><td>123</td></tr>
</tbody></table>
</body></html>
"""


def test_parse_monitor_html_synonyms_and_unknown():
    out = monitor.parse_monitor_html(MONITOR_HTML)
    assert out["counters"]["project_count"] == 136266
    assert out["counters"]["person_count"] == 87475
    assert out["counters"]["institution_count"] == 37472
    assert out["counters"]["humanities_count"] == 40000
    # synonym variant maps onto the same canonical key
    assert out["counters"]["finished_project_count"] == 30641
    # renamed-key regression: unknown labels surface, never silently drop
    assert out["unknown_labels"] == ["Brandneue Zeile"]
    assert out["gepris_version"] == "1.9.9-rc3"


def test_parse_monitor_stage(spark):
    df = spark.createDataFrame([("u1", MONITOR_HTML)], "url string, html string")
    row = monitor.parse_monitor_stage(df).first()
    assert row["counters"]["project_count"] == 136266
    assert row["gepris_version"] == "1.9.9-rc3"


def _runs(spark, rows):
    return spark.createDataFrame(
        rows,
        "spider string, context string, scraped_items long, moved_items long, "
        "expected_items long, had_error boolean, old_version string, new_version string",
    )


def test_alert_decision_matrix(spark):
    rows = [
        # error beats everything
        ("details", "projekt", 5, 0, 5, True, None, None),
        # count mismatch -> Warning with (diff)
        ("search_results", "projekt", 90, 0, 100, False, None, None),
        # monitor version change -> Warning with version note
        ("data_monitor", None, 1, 0, 1, False, "1.0", "2.0"),
        # details big success
        ("details", "person", 20000, 1, 20001, False, None, None),
        # quiet run -> no alert
        ("details", "person", 5, 0, 5, False, None, None),
    ]
    out = monitor.alert_decision(_runs(spark, rows)).collect()

    def one(pred):
        matches = [r for r in out if pred(r)]
        assert len(matches) == 1
        return matches[0]

    assert one(lambda r: r["had_error"])["alert_status"] == "Error"
    warn = one(lambda r: r["spider"] == "search_results")
    assert warn["alert_status"] == "Warning"
    assert warn["alert_subject"] == (
        "Warning - GeprisCrawler - Spider 'search_results' - context 'projekt'"
        " - 90 (-10) items"
    )
    mon = one(lambda r: r["spider"] == "data_monitor")
    assert mon["alert_status"] == "Warning"
    assert "new gepris version 2.0" in mon["alert_subject"]
    assert one(lambda r: r["scraped_items"] == 20000)["alert_status"] == "Success"
    quiet = one(lambda r: r["scraped_items"] == 5 and not r["had_error"])
    assert quiet["alert_status"] is None and quiet["alert_subject"] is None


def test_latest_stat(spark):
    df = spark.createDataFrame(
        [(1, "1.0", 100), (2, "1.1", 200)],
        "run_ended_at long, gepris_version string, project_count long",
    )
    assert monitor.latest_stat(df, "gepris_version") == "1.1"
    assert monitor.latest_stat(df.limit(0), "gepris_version") is None
