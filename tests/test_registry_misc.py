"""Tests: S6 source registry, P4 warp-skip guard, W7 embed rules."""

from __future__ import annotations

import pytest

from sarpro_spark.plans.pipeline import needs_warp
from sarpro_spark.sinks.writers import IDENTITY_GT, tiff_embed_plan
from sarpro_spark.sources import registry


def test_registry_parquet_and_schema(spark, sf_dir):
    df, info = registry.open_source(spark, f"{sf_dir}/nation.parquet", "parquet")
    assert df.count() == 25
    assert info.format == "parquet" and info.n_columns == 3
    assert "n_nationkey" in info.schema_ddl


def test_registry_csv_json_roundtrip(spark, sf_dir, tmp_path):
    src, _ = registry.open_source(spark, f"{sf_dir}/region.parquet", "parquet")
    csv_path = str(tmp_path / "region_csv")
    json_path = str(tmp_path / "region_json")
    src.write.option("header", "true").csv(csv_path)
    src.write.json(json_path)
    c, ci = registry.open_source(spark, csv_path, "csv")
    j, ji = registry.open_source(spark, json_path, "json")
    assert c.count() == 5 and j.count() == 5
    assert ci.n_columns == 2  # header + inferSchema defaults applied
    assert sorted(j.columns) == sorted(src.columns)


def test_registry_unknown_format(spark):
    with pytest.raises(ValueError, match="unknown format"):
        registry.open_source(spark, "/nope", "netcdf")
    assert "parquet" in registry.supported_formats()


def test_needs_warp_guard():
    # P4: same CRS -> skip (sentinel1.rs:959-986)
    assert not needs_warp("EPSG:32632", "EPSG:32632")
    assert not needs_warp("epsg:32632 ", "EPSG:32632")
    assert needs_warp("EPSG:4326", "EPSG:32632")
    assert needs_warp(None, "EPSG:32632")  # unknown source CRS -> must warp
    assert not needs_warp("EPSG:4326", None)  # no target -> never warp


def test_tiff_embed_rules():
    fields = {"PLATFORM": "SENTINEL-1"}
    # identity gt -> neither gt nor projection embedded (metadata.rs:305-307)
    p = tiff_embed_plan(IDENTITY_GT, "EPSG:32632", fields)
    assert p["set_geotransform"] is None and p["set_projection"] is None
    assert p["metadata_items"] == fields
    # real gt -> both
    gt = [500000.0, 10.0, 0.0, 6000000.0, 0.0, -10.0]
    p = tiff_embed_plan(gt, "EPSG:32632", fields)
    assert p["set_geotransform"] == gt and p["set_projection"] == "EPSG:32632"
    # no gt at all -> no projection either
    p = tiff_embed_plan(None, "EPSG:32632", fields)
    assert p["set_geotransform"] is None and p["set_projection"] is None


def test_every_query_is_driver_certified():
    """Certification-completeness invariant: every registered query must be
    (a) in HEAD_ORDER, (b) a member of a head pack, (c) an oracle-SQL twin
    of a certified query (bit-equality separately asserted in tests), or
    (d) on the documented subsumption list below. Guards future drift: a
    new query registered without a certification path fails here, not in
    the next round's verdict."""
    from sarpro_spark.queries import HEAD_ORDER, REGISTRY, spark_queries
    from sarpro_spark.queries_packs import PACK_MEMBERS

    # name -> (covering certified query, why no dedicated driver row needed)
    SUBSUMED = {
        "affine_warp_bilinear": (
            "affine_warp_kernels",
            "bilinear leg of the r6 three-kernel union certificate (same "
            "gather operator and doctrine; this single-kernel twin keeps its "
            "own oracle in the tail for targeted debugging)",
        ),
        "autoscale_standard_u16": (
            "autoscale_advanced_u16",
            "A2 u16 leg; u8 leg shares the kernel oracle, branches golden-tested",
        ),
        "autoscale_robust_u16": ("autoscale_advanced_u16", "member of the A3 union certificate"),
        "autoscale_adaptive_u16": ("autoscale_advanced_u16", "member of the A3 union certificate"),
        "autoscale_equalized_u16": ("autoscale_advanced_u16", "member of the A3 union certificate"),
        "autoscale_tamed_u16": ("autoscale_advanced_u16", "member of the A3 union certificate"),
        "dedup_minhash_signatures": (
            "dedup_minhash_verified",
            "first stage of the verified chain (same signatures upstream)",
        ),
        "datum_roundtrip_pack": (
            "ups_roundtrip_points",
            "bench-consolidation union (r12, verdict item 5): a pure stack() "
            "unpivot-union of nine round-trip members, each ALREADY certified "
            "as a head row or head-pack member; the union row exists only to "
            "fuse their per-job floors in bench.py and adds no new values — "
            "its own oracle stays in the tail (check_oracle covers it)",
        ),
    }

    spark_queries()  # load all modules
    head = set(HEAD_ORDER)
    assert len(HEAD_ORDER) == 50, "driver checks exactly the first 50"
    certified = set(head)
    for p in head:
        certified |= set(PACK_MEMBERS.get(p, ()))

    def sql_of(n):
        s = REGISTRY[n].sql
        return s if isinstance(s, str) else None

    cert_sqls = {sql_of(n) for n in certified if sql_of(n)}
    uncovered = []
    for name in REGISTRY:
        if name in certified or sql_of(name) in cert_sqls:
            continue
        if name in SUBSUMED:
            cover, _why = SUBSUMED[name]
            assert cover in certified, f"{name} subsumed by uncertified {cover}"
            continue
        uncovered.append(name)
    assert not uncovered, f"queries with no certification path: {uncovered}"
