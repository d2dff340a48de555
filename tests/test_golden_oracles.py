"""Golden-oracle machinery: manifest idempotence and Spark-parity spot checks.

The driver's correctness gate calls oracle_sql(), which materializes the golden
parquet tables via golden.ensure_goldens — these tests pin the behaviors that gate
depends on (cheap regeneration skip, version/name invalidation, Spark rounding
mirror)."""

import json
from pathlib import Path

import pytest

from lingvo_spark_kg import golden

SF = "/root/testdata/sf0.001"


def test_ensure_goldens_idempotent(tmp_path):
    names = ("kg_invariant", "media_meta")  # the two cheapest goldens
    p1 = golden.ensure_goldens(SF, tmp_path, names=names)
    stamps = {n: Path(p).stat().st_mtime_ns for n, p in p1.items()}
    p2 = golden.ensure_goldens(SF, tmp_path, names=names)
    assert p1 == p2
    # second call matched the manifest and did NOT rewrite the files
    assert stamps == {n: Path(p).stat().st_mtime_ns for n, p in p2.items()}


def test_ensure_goldens_invalidates_on_version_or_names(tmp_path, monkeypatch):
    names = ("kg_invariant",)
    golden.ensure_goldens(SF, tmp_path, names=names)
    manifest = json.loads((tmp_path / "manifest.json").read_text())
    assert manifest["version"] == golden.GOLDEN_VERSION

    # version bump → regeneration (manifest rewritten with the new version)
    monkeypatch.setattr(golden, "GOLDEN_VERSION", golden.GOLDEN_VERSION + 1)
    golden.ensure_goldens(SF, tmp_path, names=names)
    manifest2 = json.loads((tmp_path / "manifest.json").read_text())
    assert manifest2["version"] == manifest["version"] + 1

    # name-set change → regeneration too (the driver adds queries between rounds)
    golden.ensure_goldens(SF, tmp_path, names=("kg_invariant", "media_meta"))
    manifest3 = json.loads((tmp_path / "manifest.json").read_text())
    assert sorted(manifest3["names"]) == ["kg_invariant", "media_meta"]
    assert (tmp_path / "media_meta.parquet").exists()


def test_round_like_spark_half_up():
    """Golden float rounding must mirror Spark's Round-on-double semantics:
    shortest-repr decimal, HALF_UP (away from zero)."""
    assert golden._round_like_spark(0.12345, 4) == 0.1235  # half away from zero
    assert golden._round_like_spark(-0.12345, 4) == -0.1235
    assert golden._round_like_spark(2.5, 0) == 3.0
    # shortest-repr, not exact binary: 0.1 is stored as 0.1000000000000000055…,
    # but Spark (and this mirror) round the decimal "0.1"
    assert golden._round_like_spark(0.1, 1) == 0.1


def test_invariant_golden_counts():
    import pyarrow as pa

    t = golden.compute("kg_invariant", SF)
    assert isinstance(t, pa.Table)
    row = t.to_pylist()[0]
    assert row["violations"] == 0
    assert row["n_docs"] == golden.n_docs_for(SF)
