"""File-level min/max skipping index: pruning skips provably-disjoint
files, keeps unprovable ones (null stats), and the skipped read is
always exactly the row-filtered result."""

from __future__ import annotations

import pyspark.sql.functions as F

from nbi_oedi_etl_v2_spark.operators import layout
from nbi_oedi_etl_v2_spark.sources import skipping


def _write_clustered(spark, tmp_path, n=4096, files=8):
    """n rows with x in [0, 1024), range-clustered on x into `files`
    files so each file owns a disjoint x span."""
    path = str(tmp_path / "tbl")
    df = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") % 1024).alias("x")
    )
    df.repartitionByRange(files, "x").write.mode("overwrite").parquet(path)
    return path


def test_prune_skips_disjoint_files_and_result_is_exact(spark, tmp_path):
    path = _write_clustered(spark, tmp_path)
    idx = skipping.build_skipping_index(spark, path, ["x"])
    total_files = idx.count()
    assert total_files >= 4

    got = skipping.read_with_skipping(
        spark, path, idx, {"x": (100, 140)}
    )
    # a 41/1024 slice of a range-clustered table must skip most files
    survivors = skipping.prune_files(idx, {"x": (100, 140)})
    assert len(survivors) < total_files
    expect = (
        spark.read.parquet(path)
        .where((F.col("x") >= 100) & (F.col("x") <= 140))
        .collect()
    )
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in expect
    )


def test_prune_open_bounds(spark, tmp_path):
    path = _write_clustered(spark, tmp_path)
    idx = skipping.build_skipping_index(spark, path, ["x"])
    total = idx.count()
    hi_only = skipping.prune_files(idx, {"x": (None, 50)})
    lo_only = skipping.prune_files(idx, {"x": (1000, None)})
    assert 0 < len(hi_only) < total
    assert 0 < len(lo_only) < total
    n = skipping.read_with_skipping(
        spark, path, idx, {"x": (None, 50)}
    ).count()
    assert n == spark.read.parquet(path).where("x <= 50").count()


def test_null_stats_keep_the_file(spark, tmp_path):
    path = str(tmp_path / "nulls")
    spark.createDataFrame([(1, None)], "k bigint, x bigint").write.mode(
        "overwrite"
    ).parquet(path)
    idx = skipping.build_skipping_index(spark, path, ["x"])
    # min/max are NULL: the file is unprovable, so it must survive
    assert len(skipping.prune_files(idx, {"x": (0, 10)})) == 1


def test_empty_survivor_set_returns_empty_with_schema(spark, tmp_path):
    path = _write_clustered(spark, tmp_path)
    idx = skipping.build_skipping_index(spark, path, ["x"])
    out = skipping.read_with_skipping(spark, path, idx, {"x": (5000, 6000)})
    assert out.count() == 0
    assert set(out.columns) == {"k", "x"}


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path):
    """The marquee combination: z-order on (x, y), then the zone map
    prunes on EITHER dimension alone — what a single-column sort
    cannot do for its non-prefix dimension."""
    path = str(tmp_path / "z")
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    layout.zorder_layout(df, ["x", "y"], bits=6, num_partitions=16).drop(
        "zvalue"
    ).write.mode("overwrite").parquet(path)
    idx = skipping.build_skipping_index(spark, path, ["x", "y"])
    total = idx.count()
    x_files = skipping.prune_files(idx, {"x": (0, 7)})
    y_files = skipping.prune_files(idx, {"y": (0, 7)})
    assert len(x_files) < total
    assert len(y_files) < total
    # and the pruned reads stay exact
    got = skipping.read_with_skipping(spark, path, idx, {"y": (0, 7)})
    assert got.count() == spark.read.parquet(path).where("y <= 7").count()


def test_many_file_read_batches_the_path_handoff(spark, tmp_path):
    """At large #files the surviving-path list is handed to the reader
    in READ_BATCH_FILES-sized chunks unioned lazily; force a tiny batch
    size so the chunked union path is exercised and stays exact."""
    path = _write_clustered(spark, tmp_path, n=4096, files=32)
    idx = skipping.build_skipping_index(spark, path, ["x"])
    got = skipping.read_with_skipping(
        spark, path, idx, {"x": (0, 900)}, batch_files=5
    )
    expect = spark.read.parquet(path).where("x <= 900")
    assert got.count() == expect.count()
    assert len(skipping.prune_files(idx, {"x": (0, 900)})) > 5


def test_partitioned_layout_is_rejected(spark, tmp_path):
    """Hive-partitioned layouts must be rejected: partition columns
    live in dir names, and a footer-pinned schema would NULL them."""
    import pytest

    path = str(tmp_path / "part")
    spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("p")
    ).write.partitionBy("p").mode("overwrite").parquet(path)
    idx = skipping.build_skipping_index(spark, path, ["k"])
    with pytest.raises(ValueError, match="flat"):
        skipping.read_with_skipping(spark, path, idx, {"k": (0, 50)})


def test_guard_path_normalization(spark, tmp_path):
    """ADVICE r4: the Hive guard must align the index's qualified
    file URIs (file:///…) with however the caller spells the root —
    trailing slash, bare path — and must ignore '=' in LEAF file
    names (only directory segments are partition evidence)."""
    import os
    import shutil

    import pytest

    path = str(tmp_path / "flat")
    spark.range(0, 50).select(F.col("id").alias("k")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    # rename the single data file to contain '=' — legal in a flat dir
    part = next(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )
    shutil.move(
        os.path.join(path, part), os.path.join(path, "a=b.parquet")
    )
    idx = skipping.build_skipping_index(spark, path, ["k"])
    # trailing slash on the root must not break alignment either
    got = skipping.read_with_skipping(spark, path + "/", idx, {"k": (0, 10)})
    assert got.count() == 11

    # and a REAL partition dir still trips the guard under the same
    # qualified-vs-bare spelling
    ppath = str(tmp_path / "part2")
    spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    ).write.partitionBy("p").mode("overwrite").parquet(ppath)
    pidx = skipping.build_skipping_index(spark, ppath, ["k"])
    with pytest.raises(ValueError, match="flat"):
        skipping.read_with_skipping(spark, ppath + "/", pidx, {"k": (0, 50)})


def _write_hash_clustered(spark, tmp_path, n=8000, files=16):
    """n rows hash-partitioned by a high-cardinality key into `files`
    files: every file's [min, max] key interval spans the whole
    domain, so zone maps prune nothing — the Bloom index's case."""
    path = str(tmp_path / "btbl")
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 500).alias("key"),
        F.concat(F.lit("u"), (F.col("id") % 500).cast("string")).alias("name"),
    )
    df.repartition(files, "key").write.mode("overwrite").parquet(path)
    return path


def test_bloom_prunes_where_zone_maps_cannot(spark, tmp_path):
    path = _write_hash_clustered(spark, tmp_path)
    idx = skipping.build_skipping_index(
        spark, path, ["key"], bloom_cols=["key"]
    ).cache()
    n_files = idx.count()
    # zone maps alone: every file overlaps key=137's point range
    zone_only = skipping.prune_files(idx, {"key": (137, 137)})
    assert len(zone_only) == n_files  # the motivating failure
    # bloom: hash partitioning puts key=137 in exactly one file; the
    # only extra survivors are bloom false positives (rare at 4096
    # bits / ~32 distinct keys per file)
    bloomed = skipping.prune_files(idx, {}, equals={"key": 137})
    assert 1 <= len(bloomed) <= max(2, n_files // 4)
    # absent key must prune everything (no hash can be present)
    assert skipping.prune_files(idx, {}, equals={"key": 999999}) == []


def test_bloom_read_is_exact_and_string_typed(spark, tmp_path):
    path = _write_hash_clustered(spark, tmp_path)
    idx = skipping.build_skipping_index(
        spark, path, [], bloom_cols=["key", "name"]
    ).cache()
    got = skipping.read_with_skipping(
        spark, path, idx, {}, equals={"key": 137}
    )
    rows = sorted(r["k"] for r in got.collect())
    assert rows == sorted(range(137, 8000, 500))  # zero false negatives
    by_name = skipping.read_with_skipping(
        spark, path, idx, {}, equals={"name": "u41"}
    )
    assert sorted(r["k"] for r in by_name.collect()) == sorted(
        range(41, 8000, 500)
    )


def test_bloom_missing_index_and_null_values(spark, tmp_path):
    import pytest

    path = str(tmp_path / "nulls")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, F.col("id") % 7).alias("key"),
    )
    df.repartition(4).write.mode("overwrite").parquet(path)
    idx = skipping.build_skipping_index(spark, path, [], bloom_cols=["key"])
    with pytest.raises(ValueError):
        skipping.prune_files(idx, {}, equals={"k": 1})  # k has no bloom
    # null rows never create false negatives for real values
    got = skipping.read_with_skipping(
        spark, path, idx, {}, equals={"key": 3}
    )
    assert sorted(r["k"] for r in got.collect()) == sorted(
        i for i in range(0, 100, 2) if i % 7 == 3
    )


def test_partition_dir_segments_fallback_anchors_on_root():
    # ADVICE r5: when the file path doesn't align under the caller's
    # root spelling, the fallback must not scan segments ABOVE the
    # root — a legal key=value dir there (/data/run=5/table/) is not
    # a Hive partition of THIS table.
    from nbi_oedi_etl_v2_spark.sources.skipping import (
        _partition_dir_segments,
    )

    # aligned: segments strictly between root and leaf
    assert _partition_dir_segments(
        "/data/tbl/a/f.parquet", "/data/tbl"
    ) == ["a"]
    # misaligned spelling, key=value dir above the root: invisible
    assert _partition_dir_segments(
        "file:///data/run=5/table/f.parquet", "table"
    ) == []
    # …but a partition dir BELOW the anchored root still surfaces
    assert _partition_dir_segments(
        "file:///data/run=5/table/p=1/f.parquet", "table"
    ) == ["p=1"]
    # no anchor at all: longest-common-prefix fallback (here: none),
    # conservative old behavior — every directory segment considered
    assert _partition_dir_segments(
        "/x/y=2/f.parquet", "/other/root"
    ) == ["x", "y=2"]


def test_key_value_dir_above_root_reads_clean(spark, tmp_path):
    base = tmp_path / "run=5" / "tbl"
    path = str(base)
    spark.range(0, 64).select(
        F.col("id").alias("k")
    ).coalesce(2).write.mode("overwrite").parquet(path)
    idx = skipping.build_skipping_index(spark, path, ["k"])
    got = skipping.read_with_skipping(spark, path, idx, {"k": (0, 9)})
    assert got.count() == 10
