"""Image-catalog pipeline (plans/imagepipe.py): semantic invariants
over the planted duplicate structure of the catalog generator.

Spark-vs-DuckDB value parity is covered by tests/test_contract_oracle.py
(the IMAGEPIPE_QUERIES entries are picked up automatically); the fixture
regen guard lives in tests/test_truth_fixtures.py. These tests pin the
*meaning*: the banded search finds exactly the planted duplicates it is
allowed to see, and the curation funnel is a partition of the input.
"""

from __future__ import annotations

import pandas as pd
import pytest

from gepris_spark.codecs import image as imagecodec
from gepris_spark.plans import imagepipe
from gepris_spark.sources import corpus


@pytest.fixture(scope="module")
def catalog() -> pd.DataFrame:
    return corpus.gen_image_catalog_pdf()


@pytest.fixture(scope="module")
def neardup(spark) -> pd.DataFrame:
    return imagepipe.q_image_phash_neardup(spark, "unused").toPandas()


def test_reencode_pairs_found_at_hamming_zero(catalog, neardup):
    """Every cross-format re-encode (same pre-encode pixels) must pair
    with its base at hamming 0 — banding can never miss d=0."""
    reencodes = [i for i in catalog["image_id"] if i.endswith("-r")]
    assert reencodes, "catalog lost its re-encode rows"
    pairs = {(a, b): h for a, b, h in neardup.itertuples(index=False)}
    for rid in reencodes:
        base = rid[:-2] + "-a"
        assert pairs.get((base, rid)) == 0, f"missing exact pair {base} ~ {rid}"


def test_all_pairs_are_planted_duplicates(neardup):
    """The catalog's unrelated images are >=14 bits apart, so every
    reported pair must share the base index (a/v/r suffixes of one
    image), never bridge two distinct source images."""
    assert len(neardup) > 0
    for a, b, h in neardup.itertuples(index=False):
        assert a[:9] == b[:9], f"cross-image pair {a} ~ {b} (hamming {h})"
        assert 0 <= h <= imagepipe._PHASH_HAMMING_MAX


def test_banding_catches_exactly_the_in_radius_variants(catalog, neardup):
    """Ground truth from the catalog itself: a (base, variant) pair is
    in the result iff its true hamming distance <= the verify radius —
    the 4x16 pigeonhole guarantees d<=3 is never missed."""
    by_id = dict(zip(catalog["image_id"], catalog["phash"]))
    got = {(a, b) for a, b, _ in neardup.itertuples(index=False)}
    checked = 0
    for vid in catalog["image_id"]:
        if not vid.endswith("-v"):
            continue
        base = vid[:-2] + "-a"
        d = imagecodec.hamming64(by_id[base], by_id[vid])
        assert ((base, vid) in got) == (d <= imagepipe._PHASH_HAMMING_MAX), (
            f"{base}~{vid}: true d={d}"
        )
        checked += 1
    assert checked >= 30


def test_funnel_partitions_the_input(spark, catalog):
    funnel = imagepipe.q_image_curation_funnel(spark, "unused").toPandas()
    assert funnel["n_input"].sum() == len(catalog)
    parts = funnel[
        ["n_too_small", "n_bad_aspect", "n_short_caption", "n_phash_dup", "n_kept"]
    ].sum(axis=1)
    assert (parts == funnel["n_input"]).all()
    # every planted failure mode actually fires
    assert funnel["n_too_small"].sum() > 0
    assert funnel["n_bad_aspect"].sum() > 0
    assert funnel["n_short_caption"].sum() > 0
    assert funnel["n_phash_dup"].sum() > 0
    assert funnel["n_kept"].sum() > 0


def test_survivors_are_unique_by_phash_and_pass_all_filters(spark):
    surv = imagepipe.q_image_caption_curation(spark, "unused").toPandas()
    assert len(surv) > 0
    assert surv["phash"].is_unique
    assert (surv[["w", "h"]].min(axis=1) >= imagepipe._MIN_SIDE).all()
    assert (surv["w"] <= imagepipe._MAX_ASPECT * surv["h"]).all()
    assert (surv["h"] <= imagepipe._MAX_ASPECT * surv["w"]).all()
    assert (surv["n_caption_tokens"] >= imagepipe._MIN_CAPTION_TOKENS).all()


def test_dedup_clusters_collapse_variant_chains(spark, neardup):
    """a~v and a~r pairs must land in one component rooted at the base
    id even when (v, r) never collided in a band — transitivity is what
    the CC stage adds over the raw pair list."""
    clusters = imagepipe.q_image_dedup_clusters(spark, "unused").toPandas()
    root = dict(zip(clusters["image_id"], clusters["cluster_root"]))
    # membership: exactly the vertices of the pair graph
    assert set(root) == set(neardup["image_a"]) | set(neardup["image_b"])
    by_base: dict[str, set] = {}
    for img in root:
        by_base.setdefault(img[:9], set()).add(img)
    multi = 0
    for base, members in by_base.items():
        if len(members) > 1:
            multi += 1
            assert {root[m] for m in members} == {min(members)}, (
                f"{base}: members {sorted(members)} roots {[root[m] for m in members]}"
            )
    assert multi >= 10


def test_neardup_plan_has_no_cartesian(spark):
    """The banded self-join must plan as an equi-join (hash/sort-merge),
    never BroadcastNestedLoop/CartesianProduct — the property that keeps
    it linear at 100 TB."""
    plan = imagepipe.q_image_phash_neardup(spark, "unused")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_augment_plan_boxes_apply_to_real_pixels(spark):
    """The planner's specs must be APPLICABLE: decode a handful of
    catalog images, apply crop+flip exactly as a trainer would, and
    get arrays of the planned shape; epochs must differ (the plan is
    per-epoch, not constant) and a re-run must be identical."""
    import numpy as np

    from gepris_spark.codecs import image as imagecodec

    plan = imagepipe.q_image_augment_plan(spark, "unused").toPandas()
    assert plan.in_bounds.all()
    assert (plan.crop_w >= 1).all() and (plan.crop_h >= 1).all()
    assert plan.flip.nunique() == 2  # both flip values occur
    # per-image the two epochs differ somewhere (crop or flip)
    diff = plan.groupby("image_id").apply(
        lambda g: g[["crop_x", "crop_y", "crop_w", "crop_h", "flip"]]
        .drop_duplicates()
        .shape[0],
        include_groups=False,
    )
    assert (diff > 1).mean() > 0.9
    # determinism: a second derivation is identical
    again = imagepipe.q_image_augment_plan(spark, "unused").toPandas()
    assert plan.equals(again)

    cat = imagepipe.load_catalog(spark).limit(3).toPandas()
    specs = plan.set_index(["image_id", "epoch"])
    for r in cat.itertuples(index=False):
        px = imagecodec.decode(bytes(r.bytes), r.fmt)
        for epoch in range(imagepipe._AUG_EPOCHS):
            s = specs.loc[(r.image_id, epoch)]
            crop = px[
                int(s.crop_y) : int(s.crop_y + s.crop_h),
                int(s.crop_x) : int(s.crop_x + s.crop_w),
            ]
            if s.flip:
                crop = crop[:, ::-1]
            assert crop.shape == (int(s.crop_h), int(s.crop_w), 3)
            assert isinstance(crop, np.ndarray)


def test_augment_plan_is_scan_side_and_pruned(spark):
    """Zero data shuffles (the only Exchange is the output ordering's
    range partitioning) and the scan reads only (image_id, w, h) —
    bytes/caption/phash stay on disk."""
    plan = (
        imagepipe.q_image_augment_plan(spark, "unused")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning" not in plan
    assert "Join" not in plan and "Window" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "image_id" in read_schema and "w" in read_schema
    assert "bytes" not in read_schema and "caption" not in read_schema
    assert "phash" not in read_schema
