from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from streaming_downsampling_spark.session import get_spark

    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_tbl():
    from streaming_downsampling_spark.datagen import generate_transcripts

    return generate_transcripts(sf=0.3, seed=42)


@pytest.fixture(scope="session")
def transcripts(spark, transcripts_tbl, tmp_path_factory):
    import pyarrow.parquet as pq

    path = str(tmp_path_factory.mktemp("data") / "transcripts.parquet")
    pq.write_table(transcripts_tbl, path)
    from streaming_downsampling_spark.operators.rollup import with_signal

    return with_signal(spark.read.parquet(path))
