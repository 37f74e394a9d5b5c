"""Z-order layout tests: Morton interleave correctness and the actual
data-skipping property — per-file min/max footers must bound BOTH
dimensions tightly, which is the entire point of the layout.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from building_a_rag_pipeline_with_airflow_spark import schemas
from building_a_rag_pipeline_with_airflow_spark.sources import io as sio


def test_z_value_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 3)], "a long, b long"
    )
    out = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", sio.z_value("a", "b").alias("z")).collect()
    }
    # bit i of a -> position 2i; bit i of b -> position 2i+1
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    assert out[(1, 1)] == 3
    assert out[(2, 0)] == 4
    assert out[(0, 2)] == 8
    assert out[(3, 3)] == 15


def _file_spans(path, col):
    spans = []
    lo_all, hi_all = None, None
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            spans.append((min(los), max(his)))
            lo_all = min(lo_all, min(los)) if lo_all is not None else min(los)
            hi_all = max(hi_all, max(his)) if hi_all is not None else max(his)
    full = max(hi_all - lo_all, 1)
    return [
        (hi - lo) / full for lo, hi in spans
    ]


def test_zorder_layout_bounds_both_dimensions(spark, sf_dir, tmp_path):
    li = schemas.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "single")
    sio.write_zordered(li, zpath, "l_orderkey", "l_partkey", n_files=8)
    # baseline: the usual single-column sort layout
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(spath)
    )
    # correctness: same rows either way
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(spath).count()
        == li.count()
    )
    z_ok = _file_spans(zpath, "l_orderkey")
    z_pk = _file_spans(zpath, "l_partkey")
    s_pk = _file_spans(spath, "l_partkey")
    # single-column sort leaves the second dimension unbounded per file
    assert sum(s_pk) / len(s_pk) > 0.9
    # z-order bounds BOTH dimensions: every file covers a fraction of
    # each key range, so min/max pruning works for either predicate
    assert sum(z_ok) / len(z_ok) < 0.7
    assert sum(z_pk) / len(z_pk) < 0.7


def test_zorder_sub_unit_span_keeps_resolution(spark, tmp_path):
    """A dimension whose whole value span is < 1 (rates, scores) must
    still spread across the interleave grid — dividing by max(span, 1)
    would compress it into a sliver and one file would cover the whole
    range."""
    import itertools

    rows = [
        (float(a), b / 100.0)
        for a, b in itertools.product(range(64), range(64))
    ]
    df = spark.createDataFrame(rows, "x double, rate double")  # rate spans 0..0.63
    path = str(tmp_path / "subunit")
    sio.write_zordered(df, path, "x", "rate", n_files=8)
    spans = _file_spans(path, "rate")
    # every file must cover a strict fraction of the 0.63 rate range
    assert sum(spans) / len(spans) < 0.7


def test_zorder_constant_column_does_not_divide_by_zero(spark, tmp_path):
    df = spark.createDataFrame(
        [(float(i), 5.0) for i in range(100)], "x double, c double"
    )
    path = str(tmp_path / "const")
    sio.write_zordered(df, path, "x", "c", n_files=4)
    assert spark.read.parquet(path).count() == 100
