"""Golden-oracle machinery: manifest idempotence and Spark-parity spot checks.

The driver's correctness gate calls oracle_sql(), which materializes the golden
parquet tables via golden.ensure_goldens — these tests pin the behaviors that gate
depends on (cheap regeneration skip, version/name invalidation, Spark rounding
mirror)."""

import json
from pathlib import Path

import pytest

from conftest import SF_DIR as SF

from lingvo_spark_kg import golden


def _counting_compute(monkeypatch):
    """Instrument golden.compute so tests assert recomputation directly (mtime
    comparisons are granularity-dependent)."""
    calls = []
    real = golden.compute

    def spy(name, sf_dir, _cache=None):
        calls.append(name)
        return real(name, sf_dir, _cache=_cache)

    monkeypatch.setattr(golden, "compute", spy)
    return calls


def test_ensure_goldens_idempotent(tmp_path, monkeypatch):
    names = ("kg_invariant", "media_meta")  # the two cheapest goldens
    calls = _counting_compute(monkeypatch)
    p1 = golden.ensure_goldens(SF, tmp_path, names=names)
    assert sorted(calls) == sorted(names)
    p2 = golden.ensure_goldens(SF, tmp_path, names=names)
    assert p1 == p2
    # second call matched the manifest and did NOT recompute anything
    assert sorted(calls) == sorted(names)
    assert all(Path(p).exists() for p in p2.values())


def test_ensure_goldens_invalidates_on_version_or_names(tmp_path, monkeypatch):
    names = ("kg_invariant",)
    calls = _counting_compute(monkeypatch)
    golden.ensure_goldens(SF, tmp_path, names=names)
    manifest = json.loads((tmp_path / "manifest.json").read_text())
    assert manifest["version"] == golden.GOLDEN_VERSION
    assert calls == ["kg_invariant"]

    # version bump → actual recomputation, not just a manifest rewrite
    monkeypatch.setattr(golden, "GOLDEN_VERSION", golden.GOLDEN_VERSION + 1)
    golden.ensure_goldens(SF, tmp_path, names=names)
    manifest2 = json.loads((tmp_path / "manifest.json").read_text())
    assert manifest2["version"] == manifest["version"] + 1
    assert calls == ["kg_invariant", "kg_invariant"]

    # name-set change → regeneration too (the driver adds queries between rounds)
    golden.ensure_goldens(SF, tmp_path, names=("kg_invariant", "media_meta"))
    manifest3 = json.loads((tmp_path / "manifest.json").read_text())
    assert sorted(manifest3["names"]) == ["kg_invariant", "media_meta"]
    assert (tmp_path / "media_meta.parquet").exists()
    assert calls.count("media_meta") == 1


def test_round_like_spark_half_up():
    """Golden float rounding must mirror Spark's Round-on-double semantics:
    shortest-repr decimal, HALF_UP (away from zero)."""
    assert golden._round_like_spark(0.12345, 4) == 0.1235  # half away from zero
    assert golden._round_like_spark(-0.12345, 4) == -0.1235
    assert golden._round_like_spark(2.5, 0) == 3.0
    # shortest-repr, not exact binary: 0.1 is stored as 0.1000000000000000055…,
    # but Spark (and this mirror) round the decimal "0.1"
    assert golden._round_like_spark(0.1, 1) == 0.1


def test_fuzzy_golden_links_an_exact_miss():
    """VERDICT r3 item 4 'done' criterion: the fuzzy golden must cover a case the
    exact pass misses — an inflected surface linked only via the stem block."""
    links = golden.compute("kg_links", SF).to_pylist()
    fuzzy = golden.compute("kg_links_fuzzy", SF).to_pylist()
    ex = {(r["mention_norm"], r["mention_type"]): r["entity_id"] for r in links}
    gained = [r for r in fuzzy
              if r["entity_id"] is not None
              and ex[(r["mention_norm"], r["mention_type"])] is None]
    assert gained, "fuzzy pass linked nothing the exact pass missed"
    # the canonical inflected case: dative 'с . козлову' → the kozlov entity
    by_norm = {r["mention_norm"]: r for r in gained}
    assert "с . козлову" in by_norm
    assert by_norm["с . козлову"]["entity_id"] == "E000000"
    assert by_norm["с . козлову"]["link_score"] == pytest.approx(0.909091)


def test_invariant_golden_counts():
    import pyarrow as pa

    t = golden.compute("kg_invariant", SF)
    assert isinstance(t, pa.Table)
    row = t.to_pylist()[0]
    assert row["violations"] == 0
    assert row["n_docs"] == golden.n_docs_for(SF)
