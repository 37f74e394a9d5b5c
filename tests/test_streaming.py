"""Structured Streaming tests: replay the events parquet through a file
source and check the windowed operators against their batch twins (the same
function body runs in both modes — that equivalence is the test)."""

import shutil

import pytest

from building_a_rag_pipeline_with_airflow_spark import schemas
from building_a_rag_pipeline_with_airflow_spark.streaming import windows as W


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-0.parquet")
    return str(d)


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return schemas.load_table(spark, sf_dir, "events")


def _run_stream_to_memory(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_stream_equals_batch(spark, events_batch, events_dir):
    raw = W.read_events_stream(spark, events_dir)
    stream_out = _run_stream_to_memory(
        spark, W.tumbling_counts(raw, watermark=None), "tumbling_mem"
    )
    batch_out = W.tumbling_counts(events_batch)
    a = sorted(map(tuple, stream_out.collect()))
    b = sorted(map(tuple, batch_out.collect()))
    assert a == b
    assert len(a) > 0


def test_session_counts_batch(spark, events_batch):
    out = W.session_counts(events_batch).collect()
    assert len(out) > 0
    for r in out:
        assert r.session_end > r.session_start
        assert r.n_events >= 1


def test_parse_props(spark, events_batch):
    row = W.parse_props(events_batch).select("props_parsed.k").first()
    assert row.k is not None
