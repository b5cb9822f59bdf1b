"""JSONL / CSV disk round-trips must be lossless for the events
table (timestamps, doubles, JSON-in-string props with quotes)."""

from __future__ import annotations

from nbi_oedi_etl_v2_spark.sources import formats
from nbi_oedi_etl_v2_spark.tables import load_table

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _frame(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(r) for r in df.select(*cols).collect()), key=repr
    )


def test_jsonl_roundtrip_lossless(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events").limit(2000)
    path = str(tmp_path / "events_jsonl")
    formats.write_jsonl(e, path)
    back = formats.read_jsonl(spark, path, EVENTS_SCHEMA)
    assert _frame(back) == _frame(e)


def test_csv_roundtrip_lossless(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events").limit(2000)
    path = str(tmp_path / "events_csv")
    formats.write_csv(e, path)
    back = formats.read_csv(spark, path, EVENTS_SCHEMA)
    assert _frame(back) == _frame(e)


def test_jsonl_is_splittable_one_record_per_line(spark, sf_dir, tmp_path):
    """multiLine stays off: every output line parses standalone —
    the property that makes jsonl splittable into byte-range tasks."""
    import glob
    import json

    e = load_table(spark, sf_dir, "events").limit(100)
    path = str(tmp_path / "events_lines")
    formats.write_jsonl(e, path)
    n = 0
    for f in glob.glob(path + "/part-*"):
        with open(f) as fh:
            for line in fh:
                json.loads(line)
                n += 1
    assert n == 100
