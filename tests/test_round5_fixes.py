"""Round-5 fixes: ADVICE items (tz-independent NTZ normalization, PPM
whitespace guard, single-file stream-source guard)."""

from __future__ import annotations

import datetime as dt

import pytest

from journal_batch_processer_spark.operators.multimodal import decode_ppm_bytes


def test_ppm_rejects_crlf_after_maxval():
    """ADVICE r04: a CRLF-emitting writer mis-offsets the raster by one
    byte; the decoder must fail loud, never emit shifted means."""
    img = b"P6\n2 1\n255\r\n" + bytes([10, 20, 30] * 2)
    with pytest.raises(ValueError, match="whitespace"):
        decode_ppm_bytes(img)


def test_ppm_accepts_single_lf_or_space():
    for sep in (b"\n", b" ", b"\r"):
        img = b"P6\n1 1\n255" + sep + bytes([1, 2, 3])
        f = decode_ppm_bytes(img)
        assert (f["mean_r"], f["mean_g"], f["mean_b"]) == (1.0, 2.0, 3.0)


def test_ntz_normalization_is_session_tz_independent(spark):
    """ADVICE r04 (medium): under a non-UTC session timezone the old
    to_utc_timestamp(·,'UTC') layered on the implicit NTZ cast shifted
    instants by the session offset. The normalized instant must be the
    NTZ wall clock READ AS UTC, whatever the session tz."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType, TimestampNTZType

    from journal_batch_processer_spark.session import normalize_events_ts

    wall = dt.datetime(2024, 1, 1, 12, 0, 0)
    expected_us = int(
        wall.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )
    schema = StructType([StructField("ts", TimestampNTZType())])
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = normalize_events_ts(spark.createDataFrame([(wall,)], schema))
            got = df.select(F.unix_micros("ts").alias("us")).collect()[0].us
            assert got == expected_us, f"shifted under session tz {tz}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_stream_dir_rejects_multifile_source(tmp_path, monkeypatch):
    """The stream oracles assume a single-file single-batch drain; the
    guard must refuse a directory-shaped events.parquet."""
    from journal_batch_processer_spark.queries.streaming_q import _stream_dir

    sf = tmp_path / "sfX"
    (sf / "events.parquet").mkdir(parents=True)  # directory, not a file
    with pytest.raises(RuntimeError, match="single parquet file"):
        _stream_dir(str(sf), "events", "jbp_guard_test")
