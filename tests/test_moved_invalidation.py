"""Q5/Q6 end-to-end moved-invalidation — exact ports of the reference
scenarios test/test_database.py:147-245 (moved institution flags the
referencing projekt; moved sub-institution flags its tree root)."""

from __future__ import annotations

import datetime

from gepris_spark import schemas
from gepris_spark.operators.frontier import Frontier
from gepris_spark.store.table import SnapshotStore


def _runs(spark, rows):
    base = datetime.datetime(2021, 1, 1)
    data = [
        (
            i,
            spider,
            ctx,
            base + datetime.timedelta(hours=i),
            base + datetime.timedelta(hours=i, minutes=30),
            n,
        )
        for (i, spider, ctx, n) in rows
    ]
    return spark.createDataFrame(data, schemas.RUNS)


def _flags(frontier):
    return {r["id"]: r["detail_check_needed"] for r in frontier.read().collect()}


def test_moved_institution_flags_referencing_projekt(spark, store_dir):
    """test_database.py:147-197: institution 200 moves in run 4 ->
    projekt 100 (which references it via unternehmen_institutionen)
    gets detail_check_needed=True; projekt 101 (references 201, which
    did NOT move) stays False."""
    fr = Frontier(spark, SnapshotStore(store_dir))
    runs = _runs(
        spark,
        [
            (1, "search_results", "projekt", 2),
            (2, "details", "projekt", 2),
            (3, "search_results", "institution", 2),
            (4, "details", "institution", 1),
        ],
    )
    frontier_rows = [
        (100, "projekt", 1, 1, '{"name_de": "p100"}', None, False),
        (101, "projekt", 1, 1, '{"name_de": "p101"}', None, False),
        (200, "institution", 3, 3, '{"name_de": "i200"}', None, False),
        (201, "institution", 3, 3, '{"name_de": "i201"}', None, False),
    ]
    fr.store.commit_snapshot(
        spark.createDataFrame(frontier_rows, schemas.FRONTIER), "frontier"
    )
    history = spark.createDataFrame(
        [
            (100, "projekt", 2, '{"attributes": {"unternehmen_institutionen": [200]}}', "success"),
            (101, "projekt", 2, '{"attributes": {"unternehmen_institutionen": [201]}}', "success"),
            (200, "institution", 4, None, "moved"),
            (201, "institution", 4, '{"name_de": "i201"}', "success"),
        ],
        schemas.HISTORY,
    )

    fr.mark_projekte_for_moved_references(history, runs, "institution", run_id=4)

    flags = _flags(fr)
    assert flags[100] is True
    assert flags[101] is False
    assert flags[200] is False and flags[201] is False


def test_moved_person_flags_referencing_projekt(spark, store_dir):
    """Same composition through the person reference view
    (database.py:164-167 person branch)."""
    fr = Frontier(spark, SnapshotStore(store_dir))
    runs = _runs(
        spark,
        [(2, "details", "projekt", 2), (4, "details", "person", 1)],
    )
    frontier_rows = [
        (100, "projekt", 1, 1, None, None, False),
        (101, "projekt", 1, 1, None, None, False),
    ]
    fr.store.commit_snapshot(
        spark.createDataFrame(frontier_rows, schemas.FRONTIER), "frontier"
    )
    history = spark.createDataFrame(
        [
            (100, "projekt", 2, '{"attributes": {"leiter_personen": [500, 501]}}', "success"),
            (101, "projekt", 2, '{"attributes": {"leiter_personen": [501]}}', "success"),
            (500, "person", 4, None, "moved"),
        ],
        schemas.HISTORY,
    )

    fr.mark_projekte_for_moved_references(history, runs, "person", run_id=4)

    flags = _flags(fr)
    assert flags[100] is True
    assert flags[101] is False


def test_moved_subinstitution_flags_root(spark, store_dir):
    """test_database.py:198-245: institution 101 (child of 100 in the
    hierarchy) moves in run 3 -> root 100 flagged; 101 and the
    unrelated 102 stay False."""
    fr = Frontier(spark, SnapshotStore(store_dir))
    runs = _runs(
        spark,
        [
            (1, "search_results", "institution", 3),
            (2, "details", "institution", 2),
            (3, "details", "institution", 1),
        ],
    )
    frontier_rows = [
        (100, "institution", 1, 1, '{"name_de": "i100"}', 2, False),
        (101, "institution", 1, 1, '{"name_de": "i101"}', 2, False),
        (102, "institution", 1, 1, '{"name_de": "i102"}', 2, False),
    ]
    fr.store.commit_snapshot(
        spark.createDataFrame(frontier_rows, schemas.FRONTIER), "frontier"
    )
    history = spark.createDataFrame(
        [
            (
                100,
                "institution",
                2,
                '{"name_de": "i100", "trees": {"normalised_subinstitutions": ["101"]}}',
                "success",
            ),
            (101, "institution", 2, '{"name_de": "i101"}', "success"),
            (101, "institution", 3, None, "moved"),
        ],
        schemas.HISTORY,
    )

    fr.mark_roots_for_moved_subinstitutions(history, runs, run_id=3)

    flags = _flags(fr)
    assert flags[100] is True
    assert flags[101] is False
    assert flags[102] is False


def test_moved_root_does_not_flag_itself_without_parent(spark, store_dir):
    """The reference join requires parent_id NOT NULL — a moved ROOT
    institution flags nothing (database.py:199-203)."""
    fr = Frontier(spark, SnapshotStore(store_dir))
    runs = _runs(spark, [(2, "details", "institution", 2), (3, "details", "institution", 1)])
    frontier_rows = [
        (100, "institution", 1, 1, None, 2, False),
        (101, "institution", 1, 1, None, 2, False),
    ]
    fr.store.commit_snapshot(
        spark.createDataFrame(frontier_rows, schemas.FRONTIER), "frontier"
    )
    history = spark.createDataFrame(
        [
            (
                100,
                "institution",
                2,
                '{"name_de": "i100", "trees": {"normalised_subinstitutions": ["101"]}}',
                "success",
            ),
            (101, "institution", 2, '{"name_de": "i101"}', "success"),
            (100, "institution", 3, None, "moved"),
        ],
        schemas.HISTORY,
    )

    fr.mark_roots_for_moved_subinstitutions(history, runs, run_id=3)

    flags = _flags(fr)
    assert flags[100] is False
    assert flags[101] is False
