"""Streaming-vs-batch equivalence: the streaming hourly windows must produce
the same result as the batch e50 query over the same files."""

from __future__ import annotations

import os
import shutil

from oss_data_lake_spark.operators.windows import tumbling_hourly
from oss_data_lake_spark.streaming.event_stream import (
    hourly_counts_stream,
    run_to_completion,
)


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"), landing / "events.parquet"
    )
    stream = hourly_counts_stream(spark, str(landing))
    got = {
        (r.hour_start.strftime("%Y-%m-%d %H:%M:%S"), r.event_type): (
            r.n,
            round(r.sum_value, 6),
        )
        for r in run_to_completion(stream, "hourly_test").collect()
    }
    want = {
        (r.hour_start, r.event_type): (r.n, round(r.sum_value, 6))
        for r in tumbling_hourly(spark, sf_dir).collect()
    }
    assert got == want
