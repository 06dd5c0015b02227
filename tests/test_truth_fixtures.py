"""Fixture-oracle integrity: the committed fixtures/*.parquet must
equal the truth formulas that justify them (truth.py re-derives every
expected output from the corpus generator's (seed, index) hashes / the
independent replay oracle — never through the engine), and the engine
queries they grade are covered by tests/test_contract_oracle.py, whose
parametrization picks the fixture-backed entries up automatically.

If a corpus-generator change breaks these, regenerate with
`python tools/gen_truth_fixtures.py` — but only after confirming the
engine-side parity tests still pass (the fixtures are the ORACLE; a
regen that merely mirrors an engine bug defeats them).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import gen_truth_fixtures  # noqa: E402

from gepris_spark.plans.contract_truth import FIXTURE_DIR, TRUTH_QUERIES  # noqa: E402


@pytest.fixture(scope="module")
def frames(spark):
    return gen_truth_fixtures.truth_frames(spark)


@pytest.mark.parametrize("name", sorted(gen_truth_fixtures.SCHEMAS))
def test_fixture_matches_truth_formula(frames, name):
    committed = pd.read_parquet(FIXTURE_DIR / f"{name}.parquet")
    fresh = frames[name][[f[0] for f in gen_truth_fixtures.SCHEMAS[name]]].reset_index(
        drop=True
    )
    assert list(committed.columns) == list(fresh.columns)
    assert len(committed) == len(fresh) > 0
    for c in committed.columns:
        a, b = committed[c], fresh[c]
        bad = ~(a.eq(b) | (a.isna() & b.isna()))
        assert not bad.any(), (
            f"{name}.{c}: fixture != truth at rows {list(bad[bad].index[:5])} "
            f"(fixture={a[bad].iloc[0]!r} truth={b[bad].iloc[0]!r})"
        )


def test_every_truth_query_has_a_fixture():
    for name in TRUTH_QUERIES:
        assert (FIXTURE_DIR / f"{name}.parquet").exists(), name
