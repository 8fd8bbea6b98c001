"""Sinks + bucketed-table co-location: the write-side scale story.

The bucketed-join test is the proof artifact for "pay the shuffle once":
two tables bucketed on the join key must SortMergeJoin with no Exchange
on either side.
"""

import io
from contextlib import redirect_stdout

import pytest

from pandarallel_spark.sources import (
    load_table,
    read_csv,
    read_json,
    write_bucketed,
    write_csv,
    write_json,
    write_parquet,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_parquet_roundtrip_partitioned(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_by_region")
    write_parquet(nation, out, partition_by=["n_regionkey"])
    back = spark.read.parquet(out)
    assert back.count() == nation.count()
    # partition pruning: filtering on the layout key prunes at scan time
    plan = _plan(back.filter("n_regionkey = 1"))
    assert "PartitionFilters" in plan and "n_regionkey" in plan.split("PartitionFilters", 1)[1][:200]


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    write_csv(region, str(tmp_path / "r_csv"))
    write_json(region, str(tmp_path / "r_json"))
    c = read_csv(spark, str(tmp_path / "r_csv"), schema="r_regionkey bigint, r_name string")
    j = read_json(spark, str(tmp_path / "r_json"), schema="r_regionkey bigint, r_name string")
    assert sorted(r.r_name for r in c.collect()) == sorted(r.r_name for r in region.collect())
    assert j.count() == region.count()


@pytest.mark.usefixtures("spark")
def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8)
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 8)
    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")

    # broadcast would hide the point at this scale — force SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: shuffle paid at write
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
    assert n == lineitem.count()  # every lineitem has its order


def test_orc_round_trip_with_partition_pruning(spark, sf_dir, tmp_path):
    """ORC sink + source round-trips values; a key=value partitioned
    layout prunes partitions on re-read like parquet."""
    from pandarallel_spark.sources import load_table, read_orc, write_orc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path, partition_by=["lang"])
    back = read_orc(spark, path)
    assert back.count() == docs.count()
    assert set(back.columns) == {"doc_id", "lang", "source"}

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        back.filter(back.lang == "en").explain("formatted")
    # partition filter reaches the scan (pruned layout, not a full read)
    assert "PartitionFilters" in buf.getvalue()
    got = back.filter(back.lang == "en").count()
    exp = docs.filter(docs.lang == "en").count()
    assert got == exp


def test_binary_file_source_feeds_multimodal_decode(spark, tmp_path):
    """binaryFile ingestion → real PPM decode, end to end: write raw
    .ppm files (plus an oversized one and a .txt decoy), read the dir
    with glob + max_bytes pushdown, and run the real numpy decoder over
    the binary column — features must match the analytically known
    constant-pixel luma."""
    import numpy as np

    from pandarallel_spark.operators.multimodal import decode_features
    from pandarallel_spark.sources import read_binary_dir

    d = tmp_path / "media"
    d.mkdir()

    def ppm(w, h, rgb):
        return b"P6\n%d %d\n255\n" % (w, h) + bytes(rgb) * (w * h)

    (d / "a.ppm").write_bytes(ppm(4, 3, (255, 0, 0)))
    (d / "b.ppm").write_bytes(ppm(2, 2, (0, 255, 0)))
    (d / "big.ppm").write_bytes(ppm(64, 64, (1, 2, 3)))  # over max_bytes
    (d / "decoy.txt").write_bytes(b"not an image")

    src = read_binary_dir(spark, str(d), glob="*.ppm", max_bytes=200)
    rows = src.collect()
    assert sorted(r.media_id.rsplit("/", 1)[-1] for r in rows) == [
        "a.ppm", "b.ppm",
    ]

    feats = (
        decode_features(src, require_real_codec=True)
        .toPandas().sort_values("media_id").reset_index(drop=True)
    )
    assert feats["decoded"].all()
    # constant-pixel luma (normalized to [0,1]): (0.299R+0.587G+0.114B)/255
    lum_a = feats.loc[0, "features"][0]
    lum_b = feats.loc[1, "features"][0]
    assert abs(lum_a - 0.299) < 1 / 255
    assert abs(lum_b - 0.587) < 1 / 255


def test_zorder_key_prunes_both_dimensions(spark):
    """Z-order layout must make min/max row-group stats prune BOTH
    dimensions: simulate parquet row groups (contiguous chunks of the
    sorted output), compute per-group min/max, and count groups a range
    predicate overlaps. Sorting by x alone prunes x-ranges but a
    y-range predicate touches ~every group; the z-order sort must
    prune substantially on BOTH x-ranges and y-ranges."""
    import numpy as np
    import pandas as pd

    from pandarallel_spark.sources.tables import zorder_key

    rng = np.random.default_rng(13)
    n = 20000
    pdf = pd.DataFrame({
        "x": rng.random(n) * 1000.0,
        "y": rng.random(n) * 1000.0,
    })
    sdf = spark.createDataFrame(pdf).repartition(8)

    def groups_touched(order_pdf, col, lo, hi, n_groups=64):
        chunks = np.array_split(order_pdf[col].to_numpy(), n_groups)
        return sum(1 for c in chunks if len(c) and c.min() <= hi and c.max() >= lo)

    zp = (
        zorder_key(sdf, ["x", "y"], bits_per_col=8)
        .toPandas().sort_values("__zkey__", kind="mergesort")
        .reset_index(drop=True)
    )
    xp = pdf.sort_values("x", kind="mergesort").reset_index(drop=True)

    # y-range predicate (100-wide = 10% selectivity)
    z_y = groups_touched(zp, "y", 450, 550)
    x_y = groups_touched(xp, "y", 450, 550)
    assert x_y >= 60  # x-sort: y stats are useless, ~all 64 groups touched
    assert z_y <= 32  # z-order: at most half the groups overlap
    # x-range predicate still prunes under z-order
    z_x = groups_touched(zp, "x", 450, 550)
    assert z_x <= 32
    # degenerate guards
    with pytest.raises(ValueError, match="2-4 columns"):
        zorder_key(sdf, ["x"])
    with pytest.raises(ValueError, match="> 63"):
        zorder_key(sdf, ["x", "y"], bits_per_col=32)


def test_schema_memo_serves_and_invalidates(spark, tmp_path):
    """r14: load_table memoizes the inferred parquet schema per
    concrete file set (driver-side footer I/O saved on repeat loads).
    The memo must serve an identical schema on a repeat load and
    INVALIDATE when the files change — an overwrite with a different
    schema must never be served the stale one."""
    from pandarallel_spark.sources.tables import (
        _SCHEMA_MEMO,
        _read_parquet_memo_schema,
    )

    p = str(tmp_path / "t.parquet")
    spark.range(5).selectExpr("id", "id * 2 AS a").write.parquet(p)
    before = len(_SCHEMA_MEMO)
    d1 = _read_parquet_memo_schema(spark, p)
    assert len(_SCHEMA_MEMO) == before + 1
    d2 = _read_parquet_memo_schema(spark, p)
    assert d2.schema == d1.schema
    assert [r["a"] for r in d2.orderBy("id").collect()] == [0, 2, 4, 6, 8]
    # overwrite with a DIFFERENT schema -> fresh inference, new entry
    spark.range(3).selectExpr(
        "id", "CAST(id AS STRING) AS b"
    ).write.mode("overwrite").parquet(p)
    d3 = _read_parquet_memo_schema(spark, p)
    assert "b" in d3.columns and "a" not in d3.columns
    assert d3.count() == 3
