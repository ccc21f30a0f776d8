"""The single-job rewrite's range-exchange sizing rule (r10): grows with
input bytes, floored by write parallelism, capped by the output-file
estimate — never inherited from spark.sql.shuffle.partitions."""

from delta_sorter_spark.operators.compact import _range_partitions_for


class _Meta:
    configuration = {}


def test_range_sizing_regimes(spark):
    par = spark.sparkContext.defaultParallelism
    meta = _Meta()
    # tiny single-partition table: no fan-out
    assert _range_partitions_for(5 * 2**20, 1, None, meta, spark) == 1
    # small many-partition backfill: floored at min(groups, parallelism)
    assert _range_partitions_for(70 * 2**20, 100, None, meta, spark) == min(100, par)
    # big table: ~one partition per target file size, parallelism-independent
    assert _range_partitions_for(100 * 2**30, 10, None, meta, spark) == 800
    # explicit target wins over the 128 MiB default
    assert _range_partitions_for(2**30, 1, 2**28, meta, spark) == 4


def test_range_sizing_table_property(spark):
    meta = _Meta()
    meta.configuration = {"delta.targetFileSize": "256mb"}
    assert _range_partitions_for(2**30, 1, None, meta, spark) == 4
