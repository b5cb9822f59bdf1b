"""End-to-end OEDI ETL parity: generate a reference-shaped lake, run
the pipeline (EP1 restated), then run the three saved queries on the
catalog via Spark SQL and hash-compare each against DuckDB running the
same (substituted) SQL over the same output files — SURVEY §7 phases
1-3 in one test module."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from nbi_oedi_etl_v2_spark.config import ETLConfig, JobConfig
from nbi_oedi_etl_v2_spark.pipeline import run_etl
from nbi_oedi_etl_v2_spark.plans.query_registry import load_registry
from nbi_oedi_etl_v2_spark.sources.paths import discover_counties
from nbi_oedi_etl_v2_spark.testing import compare

from .oedi_fixtures import (
    BASE_PARTITION,
    COUNTY_CODES,
    DATA_PARTITION,
    KETCHIKAN,
    RELEASE,
    YEAR,
    generate_oedi_lake,
)

SAVED_QUERIES_SQL = os.path.join(
    os.path.dirname(__file__), "..", "nbi_oedi_etl_v2_spark", "plans", "saved_queries.sql"
)


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("oedi"))
    info = generate_oedi_lake(root)
    info["output_root"] = os.path.join(root, "etl_output")
    return info


@pytest.fixture(scope="module")
def etl_config(lake):
    meta_root = os.path.join(
        lake["bucket"], BASE_PARTITION, YEAR, RELEASE, "metadata_and_annual_results"
    )
    return ETLConfig(
        src_bucket=lake["bucket"],
        base_partition=BASE_PARTITION,
        data_partition_in_release=DATA_PARTITION,
        output_dir=lake["output_root"],
        job_specific=[
            JobConfig(
                release_name=RELEASE,
                release_year=YEAR,
                state="AK",
                upgrades=["0", "1"],
                metadata_root_dir=meta_root,
                relative_metadata_prefix_type="1",
            )
        ],
    )


@pytest.fixture(scope="module")
def etl_run(spark, etl_config, lake):
    summary = run_etl(spark, etl_config, output_root=lake["output_root"], db="nbi_analytics")
    return summary


def test_summary_counts(etl_run):
    job = etl_run.jobs[0]
    # 4 files × 2 upgrades listed; metadata: 2 v1 files (upgrade 0, 1)
    assert job.data_files_listed == 8
    assert job.data_files_written > 0
    assert job.metadata_files_listed == 2
    assert job.metadata_files_uploaded == 2
    ref_json = etl_run.to_reference_json()
    assert '"total_metadata_files_listed": 2' in ref_json
    assert '"total_time_seconds"' in ref_json
    # O5 observe() accounting: rows flowed and the 15-min → hourly
    # downsample reduced them (~4×)
    assert job.rows_read > 0
    assert 0 < job.rows_written < job.rows_read


def test_output_layout(etl_run, lake):
    job = etl_run.jobs[0]
    # S6 layout: {output}/{run_ts}/{job_name}/data/upgrade=*/state=AK
    assert "/data" in job.data_path
    assert os.path.isdir(os.path.join(job.data_path, "upgrade=0", "state=AK"))
    assert os.path.isdir(os.path.join(job.data_path, "upgrade=1", "state=AK"))


def test_downsample_schema_quirk(spark, etl_run):
    df = spark.read.parquet(etl_run.jobs[0].data_path)
    cols = set(df.columns)
    # SURVEY §1.2: aggregate columns named {col}_{fn}; keys retained
    assert {"timestamp_min", "bldg_id_min", "timestamp", "bldg_id"} <= cols
    assert "out.electricity.total.energy_consumption_mean" in cols
    assert "units_represented_min" in cols
    # 15-min → hourly = 4× row reduction (README.md:164)
    n_in = 560 * 192 * 2
    assert df.count() == n_in // 4


def _substitutions(job_name: str, db: str) -> dict[str, str]:
    return {
        "db": db,
        "metadata_table_prefix": f"metadata_{job_name}".lower(),
        "data_table_prefix": f"data_{job_name}".lower(),
        "state": "ak",
        "state_value": "AK",
        "county_value": KETCHIKAN,
        "building_type": "Hospital",
        "building_type_group": "Healthcare",
    }


@pytest.fixture(scope="module")
def oracle_con(etl_run):
    job = etl_run.jobs[0]
    con = duckdb.connect()
    con.execute("CREATE SCHEMA oracle_db")
    prefix_meta = f"metadata_{job.job_name}".lower()
    prefix_data = f"data_{job.job_name}".lower()
    meta_files = ", ".join(f"'{p}'" for p in job.metadata_files)
    con.execute(
        f"CREATE VIEW oracle_db.{prefix_meta}_parquet AS "
        f"SELECT * FROM read_parquet([{meta_files}])"
    )
    con.execute(
        f"CREATE VIEW oracle_db.{prefix_data} AS SELECT * FROM "
        f"read_parquet('{job.data_path}/*/*/*.parquet', hive_partitioning=true)"
    )
    con.execute(
        f"CREATE VIEW oracle_db.{prefix_data}_state_ak AS "
        f"SELECT * FROM oracle_db.{prefix_data} WHERE state = 'AK'"
    )
    yield con, job
    con.close()


@pytest.mark.parametrize(
    "qname",
    [
        "total_number_of_individual_building_models",
        "number_of_buildings_by_building_type_group",
        "isolated_individual_building_models",
    ],
)
def test_saved_query_matches_oracle(spark, etl_run, oracle_con, qname):
    con, job = oracle_con
    registry = load_registry(SAVED_QUERIES_SQL)
    nq = registry[qname]

    spark_pdf = nq.run(spark, _substitutions(job.job_name, "nbi_analytics")).toPandas()
    oracle_pdf = con.execute(nq.render(_substitutions(job.job_name, "oracle_db"))).df()
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, f"{qname}:\n" + "\n".join(problems)


def test_saved_query3_truncates(spark, etl_run):
    registry = load_registry(SAVED_QUERIES_SQL)
    nq = registry["isolated_individual_building_models"]
    df = nq.run(spark, _substitutions(etl_run.jobs[0].job_name, "nbi_analytics"))
    n = df.count()
    # 520 Healthcare buildings joined to 192 data rows each → only the
    # buildings whose row blocks intersect rank 1..500 survive (the
    # reference query's actual semantics — window before DISTINCT).
    assert 0 < n <= 500
    assert n < 520  # truncation really bit


def test_county_discovery(lake):
    # fixed S3 wildcard discovery (reference's is documented buggy)
    meta_root = os.path.join(
        lake["bucket"], BASE_PARTITION, YEAR, RELEASE, "metadata_and_annual_results"
    )
    assert discover_counties(meta_root, "AK") == sorted(COUNTY_CODES["AK"])


def test_partition_pruned_scan(spark, etl_config):
    from nbi_oedi_etl_v2_spark.sources.reader import read_timeseries

    df = read_timeseries(spark, etl_config, etl_config.job_specific[0])
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Catalyst must prune to state=AK (P1 → partition pruning)
    assert "state" in plan
    # no CA rows read
    assert df.filter("state = 'CA'").count() == 0
    assert df.count() == 560 * 192 * 2


def test_concurrent_jobs_match_sequential(spark, etl_config, lake, tmp_path):
    # one job per state run from a thread pool; job_name derives from
    # release/state, so states give the jobs disjoint output paths
    from dataclasses import replace

    two_jobs = replace(
        etl_config,
        job_specific=[
            etl_config.job_specific[0],
            replace(etl_config.job_specific[0], state="CA"),
        ],
    )
    out = str(tmp_path / "concurrent")
    summary = run_etl(
        spark, two_jobs, output_root=out, register_catalog=False,
        max_concurrent_jobs=2,
    )
    assert len(summary.jobs) == 2
    assert {j.job_name for j in summary.jobs} == {
        j.job_name for j in two_jobs.job_specific
    }
    assert all(j.data_files_written > 0 for j in summary.jobs)
    assert all(0 < j.rows_written < j.rows_read for j in summary.jobs)


def _make_config(lake_root: str, scheme: str = "") -> ETLConfig:
    bucket = scheme + os.path.join(lake_root, "oedi-data-lake")
    meta_root = os.path.join(bucket, BASE_PARTITION, YEAR, RELEASE,
                             "metadata_and_annual_results")
    return ETLConfig(
        src_bucket=bucket,
        base_partition=BASE_PARTITION,
        data_partition_in_release=DATA_PARTITION,
        output_dir=os.path.join(lake_root, "etl_output"),
        job_specific=[
            JobConfig(
                release_name=RELEASE,
                release_year=YEAR,
                state="AK",
                upgrades=["0", "1"],
                metadata_root_dir=meta_root,
                relative_metadata_prefix_type="1",
            )
        ],
    )


def test_corrupt_file_reported_not_fatal(spark, tmp_path):
    # reference parity (README.md:465-466, tracker.py:194-289): one
    # corrupt input is reported in the summary, the job completes
    import glob
    import json

    info = generate_oedi_lake(str(tmp_path))
    config = _make_config(str(tmp_path))
    files = sorted(
        glob.glob(
            os.path.join(
                info["bucket"], BASE_PARTITION, YEAR, RELEASE, DATA_PARTITION,
                "upgrade=0", "state=AK", "*.parquet",
            )
        )
    )
    victim = files[0]
    blob = open(victim, "rb").read()
    with open(victim, "wb") as f:
        f.write(blob[: len(blob) // 3])  # destroys the footer

    summary = run_etl(spark, config, register_catalog=False)
    job = summary.jobs[0]
    assert job.data_files_listed == 8
    assert job.data_files_read == 7
    assert len(job.missing_data_files) == 1
    assert job.missing_data_files[0].endswith(os.path.basename(victim))
    assert job.rows_written > 0  # the other 7 files flowed through
    stats = json.loads(summary.to_reference_json())["data_files_stats"]
    assert stats["missing_data_transforms_count"] == 1
    assert stats["missing_data_uploads_count"] == 1
    assert list(stats["missing_data_transforms_files"]) == [job.job_name]


def test_pipeline_end_to_end_with_file_uris(spark, tmp_path):
    # the Hadoop-FS seam (fs.py): discovery, bypass copy and run
    # accounting must work when every configured path is a file: URI,
    # proving the same code path an s3a:// deployment takes
    generate_oedi_lake(str(tmp_path))
    config = _make_config(str(tmp_path), scheme="file:")
    assert config.src_bucket.startswith("file:/")

    summary = run_etl(spark, config, register_catalog=False)
    job = summary.jobs[0]
    assert job.data_files_listed == 8
    assert job.data_files_read == 8
    assert job.data_files_written > 0
    assert job.metadata_files_listed == 2
    assert job.metadata_files_uploaded == 2
    assert 0 < job.rows_written < job.rows_read

    # county discovery through the Hadoop listing, file: scheme
    meta_root = config.job_specific[0].metadata_root_dir
    assert discover_counties(meta_root, "AK") == sorted(COUNTY_CODES["AK"])


def test_read_any_csv_json_roundtrip(spark, sf_dir, tmp_path):
    from nbi_oedi_etl_v2_spark.sources.reader import read_any
    from nbi_oedi_etl_v2_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    # csv: escaped newlines keep files splittable; read back with the
    # written escape conventions and the ORIGINAL schema (no inference)
    csv_path = str(tmp_path / "docs_csv")
    docs.write.mode("overwrite").option("header", "true").option(
        "escape", '"'
    ).csv(csv_path)
    got_csv = read_any(
        spark, csv_path, fmt="csv", schema=docs.schema, escape='"', multiLine="true"
    )
    assert got_csv.exceptAll(docs).count() == 0
    assert docs.exceptAll(got_csv).count() == 0

    # json-lines roundtrip
    json_path = str(tmp_path / "docs_json")
    docs.write.mode("overwrite").json(json_path)
    got_json = read_any(spark, json_path, fmt="json", schema=docs.schema)
    assert got_json.exceptAll(docs).count() == 0
    assert docs.exceptAll(got_json).count() == 0

    # schema-less csv/json at scale is an error, not a silent infer
    import pytest

    with pytest.raises(ValueError, match="explicit schema"):
        read_any(spark, csv_path, fmt="csv")


def test_upsert_overwrites_only_incoming_partitions(spark, tmp_path):
    from nbi_oedi_etl_v2_spark.sources.sinks import upsert_partitions

    path = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [("AK", 1, 10.0), ("AK", 2, 20.0), ("CA", 1, 30.0), ("CA", 2, 40.0)],
        ["state", "bldg", "v"],
    )
    upsert_partitions(base, path, ["state"])
    # re-run only AK with corrected values
    fixed_ak = spark.createDataFrame(
        [("AK", 1, 11.0), ("AK", 2, 21.0), ("AK", 3, 31.0)], ["state", "bldg", "v"]
    )
    upsert_partitions(fixed_ak, path, ["state"])
    got = spark.read.parquet(path)
    assert got.count() == 5  # 3 new AK rows + 2 untouched CA rows
    assert got.filter("state = 'AK'").agg(F.sum("v")).first()[0] == 63.0
    assert got.filter("state = 'CA'").agg(F.sum("v")).first()[0] == 70.0


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    from nbi_oedi_etl_v2_spark.sources.sinks import compact_partitions
    import glob

    path = str(tmp_path / "smallfiles")
    df = spark.range(0, 10_000).select(
        (F.col("id") % 2).cast("string").alias("state"),
        F.col("id"),
        (F.col("id") * 0.5).alias("v"),
    )
    # fragment: 32 tasks × 2 partitions → many small files
    df.repartition(32).write.partitionBy("state").parquet(path)
    before = len(glob.glob(f"{path}/state=*/*.parquet"))
    assert before >= 32
    n = compact_partitions(spark, path, ["state"], target_records_per_file=10_000)
    assert n == 10_000
    after = len(glob.glob(f"{path}/state=*/*.parquet"))
    assert after <= 4  # ~1 file per partition
    got = spark.read.parquet(path)
    assert got.count() == 10_000
    assert got.agg(F.sum("v")).first()[0] == sum(i * 0.5 for i in range(10_000))


def test_empty_parquet_file_is_not_a_discrepancy(spark, tmp_path):
    # a zero-row part file yields no input_file_name() rows but is NOT
    # corrupt — the accounting probe must clear it, not raise a false
    # missing-file alarm
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    info = generate_oedi_lake(str(tmp_path))
    config = _make_config(str(tmp_path))
    files = sorted(
        glob.glob(
            os.path.join(
                info["bucket"], BASE_PARTITION, YEAR, RELEASE, DATA_PARTITION,
                "upgrade=0", "state=AK", "*.parquet",
            )
        )
    )
    schema = pq.read_schema(files[0])
    empty = os.path.join(os.path.dirname(files[0]), "part-empty.parquet")
    pq.write_table(pa.table({f.name: pa.array([], f.type) for f in schema}), empty)

    summary = run_etl(spark, config, register_catalog=False)
    job = summary.jobs[0]
    assert job.data_files_listed == 9  # 8 generated + the empty one
    assert job.missing_data_files == []  # empty ≠ corrupt


def test_compact_aborts_on_failed_rename(spark, tmp_path, monkeypatch):
    import pytest as _pytest

    from nbi_oedi_etl_v2_spark.sources import fs as fsmod
    from nbi_oedi_etl_v2_spark.sources.sinks import compact_partitions

    path = str(tmp_path / "tbl")
    spark.range(100).selectExpr("id", "id % 4 AS p").write.partitionBy("p").parquet(path)
    real_rename = fsmod.rename

    def failing_rename(src, dest):
        if dest.endswith(".compact-old"):
            return False  # simulate Hadoop rename returning false
        return real_rename(src, dest)

    monkeypatch.setattr(fsmod, "rename", failing_rename)
    with _pytest.raises(IOError, match="aborting swap"):
        compact_partitions(spark, path, ["p"], 1000)
    # original data untouched by the aborted swap
    assert spark.read.parquet(path).count() == 100
