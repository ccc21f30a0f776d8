"""End-to-end validate + compact tests, porting the reference's Python test
suite (python/tests/test_validate_and_compact.py, test_null_sorting.py,
test_predicate_typing.py) and fixtures F1-F4/F6/F7 (FIXTURES.md)."""

import pytest

from delta_sorter_spark.api import SortOptimizer, compact, validate
from delta_sorter_spark.sources.delta_log import DeltaLog
from delta_sorter_spark.sources.delta_table import DeltaTable


def make_f1(spark, path):
    """F1: 4-row unsorted table (reference test_validate_and_compact.py:8-18)."""
    df = spark.createDataFrame(
        [
            ("B", "2021-02-02", 4),
            ("A", "2021-02-01", 1),
            ("B", "2021-01-01", 2),
            ("A", "2021-03-01", 3),
        ],
        "objectId string, dateTime string, value long",
    )
    return DeltaTable.create(spark, path, df.coalesce(1))


def test_validate_unsorted_then_compact_f1(spark, tmp_path):
    path = str(tmp_path / "f1")
    make_f1(spark, path)
    report = validate(path, ["objectId", "dateTime"], spark=spark)
    assert report["boundary_violations"] > 0
    assert report["checked_files"] >= 1

    compact(path, ["objectId", "dateTime"], spark=spark)
    # exact expected row order (reference :34-41)
    table = DeltaTable(spark, path)
    rows = table.to_df().orderBy("objectId", "dateTime").collect()
    got = [(r["objectId"], r["dateTime"], r["value"]) for r in rows]
    assert got == [
        ("A", "2021-02-01", 1),
        ("A", "2021-03-01", 3),
        ("B", "2021-01-01", 2),
        ("B", "2021-02-02", 4),
    ]
    report = validate(path, ["objectId", "dateTime"], spark=spark)
    assert report["boundary_violations"] == 0
    # and the optimizer wrapper does not raise
    SortOptimizer(path, spark=spark).validate(["objectId", "dateTime"])


def test_optimizer_raises_on_violations(spark, tmp_path):
    path = str(tmp_path / "f1b")
    make_f1(spark, path)
    with pytest.raises(RuntimeError, match="violates sort order"):
        SortOptimizer(path, spark=spark).validate(["objectId", "dateTime"])


@pytest.mark.parametrize("nulls", ["first", "last"])
def test_null_sorting_roundtrip_f2(spark, tmp_path, nulls):
    """F2 (reference test_null_sorting.py:8-32)."""
    path = str(tmp_path / f"f2_{nulls}")
    df = spark.createDataFrame(
        [
            ("A", "2021-02-01", 1),
            (None, "2021-01-01", 2),
            ("B", None, 3),
            (None, "2021-03-01", 4),
            ("A", None, 5),
        ],
        "objectId string, dateTime string, value long",
    )
    DeltaTable.create(spark, path, df.coalesce(1))
    compact(path, ["objectId", "dateTime"], nulls=nulls, spark=spark)
    report = validate(path, ["objectId", "dateTime"], nulls=nulls, spark=spark)
    assert report["boundary_violations"] == 0
    # explicit order check
    table = DeltaTable(spark, path)
    vals = [r["value"] for r in _read_in_file_order(spark, table)]
    if nulls == "first":
        assert vals == [2, 4, 5, 1, 3]
    else:
        assert vals == [1, 5, 3, 2, 4]


def _read_in_file_order(spark, table):
    """Read back rows in (file-min-key, in-file) order: files are disjoint in
    key range after compact, so concatenating sorted files in min-key order
    yields the global order."""
    import pyarrow.parquet as pq
    import os

    state = table.state()
    summaries = []
    for a in state.adds:
        tbl = pq.read_table(os.path.join(table.table_path, a.path))
        summaries.append((a.path, tbl.to_pylist()))
    # single-partition tests produce files named part-00000.. in order
    summaries.sort(key=lambda x: x[0])
    rows = []
    for _, lst in summaries:
        rows.extend(lst)
    return rows


def test_typed_partitions_f3(spark, tmp_path):
    """F3 (reference test_predicate_typing.py:8-29): int+bool partition
    columns; compaction succeeds via typed replaceWhere; validate on the data
    column only."""
    path = str(tmp_path / "f3")
    df = spark.createDataFrame(
        [
            (1, True, "2021-01-03", 1),
            (1, True, "2021-01-01", 2),
            (2, False, "2021-01-02", 3),
            (2, False, "2021-01-01", 4),
        ],
        "id long, flag boolean, ts string, val long",
    )
    DeltaTable.create(spark, path, df.coalesce(1), partition_columns=["id", "flag"])
    metrics = compact(path, ["ts"], spark=spark)
    assert metrics.rewritten_partitions >= 1
    report = validate(path, ["ts"], spark=spark)
    # partitions sorted internally; cross-partition boundaries may interleave
    table = DeltaTable(spark, path)
    state = table.state()
    # every active file is attested sorted by ts
    for a in state.adds:
        assert a.stats["keyStats"]["nullsFirst"]["ascending"]
    # commitInfo carries typed predicates
    import json, os

    log_dir = os.path.join(path, "_delta_log")
    preds = []
    for f in sorted(os.listdir(log_dir)):
        if f.endswith(".json"):
            for line in open(os.path.join(log_dir, f)):
                a = json.loads(line)
                if "commitInfo" in a:
                    p = a["commitInfo"]["operationParameters"].get("predicate")
                    if p:
                        preds.append(p)
    assert '"flag" = TRUE AND "id" = 1' in preds
    assert '"flag" = FALSE AND "id" = 2' in preds


def test_partitioned_leading_key_f4(spark, tmp_path):
    """F4: partition col = leading sort key -> per-partition rewrites give
    global order (reference examples/python/partitioned_quickstart.py)."""
    path = str(tmp_path / "f4")
    df = spark.createDataFrame(
        [
            ("A", "2021-01-02", 1),
            ("A", "2021-01-01", 2),
            ("B", "2021-01-03", 3),
            ("B", "2021-01-01", 4),
            ("A", "2021-01-03", 5),
            ("B", "2021-01-02", 6),
        ],
        "objectId string, dateTime string, value long",
    )
    DeltaTable.create(spark, path, df, partition_columns=["objectId"])
    compact(path, ["dateTime"], spark=spark)
    report = validate(path, ["dateTime"], spark=spark)
    # per-partition sorted; global check on dateTime alone may still see
    # cross-partition overlaps — validate within partitions instead:
    table = DeltaTable(spark, path)
    from delta_sorter_spark.operators.validate import partition_is_sorted
    from delta_sorter_spark.plans.inventory import group_by_partition

    for grp in group_by_partition(table.state().adds):
        assert partition_is_sorted(table, grp.files, ["dateTime"])


def test_skip_sorted_partitions(spark, tmp_path):
    """C1 work avoidance: a second compact rewrites nothing."""
    path = str(tmp_path / "skip")
    make_f1(spark, path)
    m1 = compact(path, ["objectId", "dateTime"], spark=spark)
    assert m1.rewritten_partitions == 1
    m2 = compact(path, ["objectId", "dateTime"], spark=spark)
    assert m2.rewritten_partitions == 0
    assert m2.skipped_partitions == 1


def test_dry_run(spark, tmp_path):
    path = str(tmp_path / "dry")
    make_f1(spark, path)
    v0 = DeltaLog(path).latest_version()
    m = compact(path, ["objectId", "dateTime"], dry_run=True, spark=spark)
    assert m.planned_partitions == 1
    assert DeltaLog(path).latest_version() == v0  # nothing committed


def test_missing_sort_columns_not_swallowed_by_dry_run(spark, tmp_path):
    path = str(tmp_path / "missing")
    make_f1(spark, path)
    with pytest.raises(ValueError, match="missing sort columns"):
        compact(path, ["nope"], dry_run=True, spark=spark)


def test_strict_mode(spark, tmp_path):
    """C5 strict full-table sorted overwrite — including the multi-file
    boundary-violation fixture F6."""
    path = str(tmp_path / "f6")
    rows1 = [("A", "2021-01-01", 1), ("M", "2021-01-01", 2)]
    rows2 = [("K", "2021-01-01", 3), ("Z", "2021-01-01", 4)]
    rows3 = [("B", "2021-01-01", 5), ("C", "2021-01-01", 6)]
    df1 = spark.createDataFrame(rows1, "objectId string, dateTime string, value long")
    table = DeltaTable.create(spark, path, df1.coalesce(1), stat_columns=["objectId", "dateTime"])
    for rows in (rows2, rows3):
        df = spark.createDataFrame(rows, "objectId string, dateTime string, value long")
        adds = table.stage_write(df.coalesce(1), stat_columns=["objectId", "dateTime"])
        table.log.commit_with_retry(lambda s: list(adds), operation="WRITE")
    # each file sorted internally, but ranges overlap: boundary violations
    report = validate(path, ["objectId", "dateTime"], spark=spark)
    assert report["boundary_violations"] >= 1
    compact(path, ["objectId", "dateTime"], repartition_by_sort_key=True, spark=spark)
    report = validate(path, ["objectId", "dateTime"], spark=spark)
    assert report["boundary_violations"] == 0
    got = [r["objectId"] for r in DeltaTable(spark, path).to_df().orderBy("objectId").collect()]
    assert got == ["A", "B", "C", "K", "M", "Z"]


def test_strict_empty_sort_cols_noop(spark, tmp_path):
    path = str(tmp_path / "noop")
    make_f1(spark, path)
    v0 = DeltaLog(path).latest_version()
    compact(path, [], repartition_by_sort_key=True, spark=spark)
    assert DeltaLog(path).latest_version() == v0


def test_predicate_scopes_partitions(spark, tmp_path):
    """P5: --predicate limits which partitions are compacted."""
    path = str(tmp_path / "pred")
    df = spark.createDataFrame(
        [(1, "b", 1), (1, "a", 2), (2, "d", 3), (2, "c", 4)],
        "id long, k string, v long",
    )
    DeltaTable.create(spark, path, df.coalesce(1), partition_columns=["id"])
    m = compact(path, ["k"], predicate="id = 1", spark=spark)
    assert m.rewritten_partitions == 1
    assert m.partitions[0].partition_key == "id=1"


def test_target_file_size(spark, tmp_path):
    """S5: target_file_size_bytes bounds output files via maxRecordsPerFile."""
    path = str(tmp_path / "sized")
    from pyspark.sql import functions as F

    df = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    table = DeltaTable.create(spark, path, df.coalesce(1), stat_columns=["k"])
    one_file_bytes = table.state().adds[0].size
    compact(
        path,
        ["k"],
        repartition_by_sort_key=True,
        target_file_size_bytes=max(1024, one_file_bytes // 8),
        spark=spark,
    )
    adds = DeltaTable(spark, path).state().adds
    assert len(adds) >= 4  # split into multiple bounded files
    # still globally ordered across files
    report = validate(path, ["k"], spark=spark)
    assert report["boundary_violations"] == 0


def test_concurrent_compacts_conflict_safe(spark, tmp_path):
    """Two concurrent partition-aware compacts: disjoint replaceWhere commits
    retry on version conflicts; final state is consistent."""
    from concurrent.futures import ThreadPoolExecutor

    path = str(tmp_path / "conc")
    df = spark.createDataFrame(
        [(i % 4, f"k{9 - i}", i) for i in range(16)], "p long, k string, v long"
    )
    DeltaTable.create(spark, path, df.coalesce(1), partition_columns=["p"])
    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [
            pool.submit(compact, path, ["k"], concurrency=2, spark=spark)
            for _ in range(2)
        ]
        results = [f.result() for f in futs]
    assert DeltaTable(spark, path).to_df().count() == 16
    table = DeltaTable(spark, path)
    from delta_sorter_spark.operators.validate import partition_is_sorted
    from delta_sorter_spark.plans.inventory import group_by_partition

    for grp in group_by_partition(table.state().adds):
        assert partition_is_sorted(table, grp.files, ["k"])


def test_validate_at_historical_version(spark, tmp_path):
    """Time-travel validation: the pre-compact snapshot still shows its
    violations after compaction fixed the current version."""
    from delta_sorter_spark.api import compact, validate
    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "vv")
    df = spark.createDataFrame(
        [("B", 2), ("A", 1), ("C", 3), ("A", 0)], "objectId string, value long"
    )
    table = DeltaTable.create(spark, path, df.coalesce(1))
    v_dirty = table.state().version

    dirty = validate(path, ["objectId", "value"], spark=spark)
    assert dirty["boundary_violations"] > 0

    compact(path, ["objectId", "value"], spark=spark)
    clean = validate(path, ["objectId", "value"], spark=spark)
    assert clean["boundary_violations"] == 0

    historical = validate(path, ["objectId", "value"], version=v_dirty, spark=spark)
    assert historical["boundary_violations"] == dirty["boundary_violations"]


def test_bin_pack_compact_coalesces_small_files(spark, tmp_path):
    """12 tiny appends across 2 partitions -> one OPTIMIZE commit with
    dataChange=false that collapses each partition's files; rows and
    values untouched; CDF/rollups see no new data."""
    from delta_sorter_spark.operators.compact import bin_pack_compact
    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "t")
    mk = lambda lo, hi: spark.createDataFrame(  # noqa: E731
        [(i, i % 2) for i in range(lo, hi)], "id long, p long"
    ).coalesce(1)
    DeltaTable.create(spark, path, mk(0, 5), partition_columns=["p"])
    t = DeltaTable(spark, path)
    for k in range(1, 12):
        t.append(mk(k * 5, k * 5 + 5))
    n_before = len(t.state().adds)
    assert n_before >= 20  # 12 appends x 2 partitions

    m = bin_pack_compact(spark, path, target_file_size_bytes=1 << 20)
    t2 = DeltaTable(spark, path)
    after = t2.state().adds
    assert len(after) == 2  # one packed file per partition
    assert m.files_in == n_before and m.files_out == 2
    assert sorted(r.id for r in t2.to_df().collect()) == list(range(60))

    # the OPTIMIZE commit is dataChange=false throughout
    actions = t2.log.commit_actions(t2.log.latest_version())
    for a in actions:
        if "add" in a:
            assert a["add"]["dataChange"] is False
        if "remove" in a:
            assert a["remove"]["dataChange"] is False


def test_spark_check_path_matches_driver_path(spark, tmp_path, monkeypatch):
    """The large-table Spark window boundary check must report exactly what
    the driver-side comparator reports (forced via the file-count gate)."""
    from delta_sorter_spark.operators import validate as V
    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "sparkcheck")
    # multi-file unsorted table with nulls and duplicate keys
    rows = [(i * 37 % 101, f"s{i % 7}") for i in range(400)] + [(None, None)] * 5
    df = spark.createDataFrame(rows, "a int, v string")
    DeltaTable.create(spark, path, df.repartition(6))

    driver_report = V.validate_global_order(spark, path, ["a", "v"])
    driver_nl = V.validate_global_order(spark, path, ["a", "v"], nulls_first=False)
    driver_d = V.validate_global_order(spark, path, ["a", "v"], directions=[False, True])

    monkeypatch.setattr(V, "SPARK_CHECK_MIN_FILES", 0)
    spark_report = V.validate_global_order(spark, path, ["a", "v"])
    spark_nl = V.validate_global_order(spark, path, ["a", "v"], nulls_first=False)
    spark_d = V.validate_global_order(spark, path, ["a", "v"], directions=[False, True])

    assert spark_report.checked_files == driver_report.checked_files
    assert spark_report.boundary_violations == driver_report.boundary_violations
    assert spark_report.files_not_ascending == driver_report.files_not_ascending
    assert spark_report.cross_file_violations == driver_report.cross_file_violations
    assert spark_nl.boundary_violations == driver_nl.boundary_violations
    assert spark_d.boundary_violations == driver_d.boundary_violations


def test_directed_compact_attests_metadata_fast_path(spark, tmp_path, monkeypatch):
    """A compact with per-column directions writes a direction-specific
    keyStats entry; re-validating that exact ordering must then be
    metadata-only (zero scan jobs), while other orderings still scan."""
    from delta_sorter_spark.operators import validate as V
    from delta_sorter_spark.operators.compact import SortConfig, compact_with_sort

    path = str(tmp_path / "directed")
    df = spark.createDataFrame(
        [(3, "x", 1), (1, "y", 2), (2, "z", 3), (None, "w", 4)],
        "a int, k string, v long",
    )
    DeltaTable.create(spark, path, df.coalesce(1))
    compact_with_sort(
        spark, path, SortConfig(sort_columns=["a", "k"], directions=[False, True])
    )

    def boom(*args, **kwargs):
        raise AssertionError("scan path used — directed attestation missed")

    monkeypatch.setattr(V, "_scan_summaries_df", boom)
    rep = V.validate_global_order(spark, path, ["a", "k"], directions=[False, True])
    assert rep.boundary_violations == 0
    # the all-ascending entries are attested by every write as before
    rep_asc = V.validate_global_order(spark, path, ["a", "k"])
    assert rep_asc.checked_files == rep.checked_files
    # a DIFFERENT directed ordering has no attested entry -> scan path
    with pytest.raises(AssertionError, match="scan path"):
        V.validate_global_order(spark, path, ["a", "k"], directions=[True, False])


def test_validate_scan_path_on_schema_evolved_files(spark, tmp_path):
    """Files written before an add_column lack that sort column in their
    parquet footer; the scan path must pad their min/max tuples BY NAME
    (absent -> None) instead of indexing past the short tuple, and must
    subset direction flags to the columns actually present."""
    from delta_sorter_spark.operators.validate import validate_global_order

    path = str(tmp_path / "evolved")
    DeltaTable.create(
        spark,
        path,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").coalesce(1),
    )
    t = DeltaTable(spark, path)
    t.add_column("score", "double")
    t.append(
        spark.createDataFrame(
            [(3, "c", 0.5)], "id long, v string, score double"
        ).coalesce(1)
    )

    # trailing evolved column: old file reads (1,NULL),(2,NULL); new (3,0.5)
    rep = validate_global_order(spark, path, ["id", "score"])
    assert rep.checked_files == 2
    assert rep.boundary_violations == 0

    # evolved column LEADING (absent column in the middle of the key walk)
    # plus per-column directions — the misalignment case
    rep2 = validate_global_order(
        spark, path, ["score", "id"], directions=[False, True]
    )
    assert rep2.checked_files == 2
    # nulls_first + desc on score: nulls rank before values, so the old
    # file's (NULL, ...) keys precede the new file's (0.5, 3) — sorted
    assert rep2.boundary_violations == 0

    # and a real violation through the same padded path still counts:
    # ascending nulls_last puts NULL keys LAST, old file then follows new
    rep3 = validate_global_order(spark, path, ["score", "id"], nulls_first=False)
    assert rep3.checked_files == 2
    assert rep3.boundary_violations == 0  # (null,1)<(null,2) after (0.5,3): sorted too

    # descending ids make the old file internally descending under asc check
    rep4 = validate_global_order(spark, path, ["id", "score"], directions=[False, True])
    assert rep4.files_not_ascending >= 1


def test_single_job_many_partition_compact(spark, tmp_path):
    """VERDICT r8 #3: at >= single_job_threshold failing partitions the
    partition-aware path must plan with ONE distributed summary job and
    rewrite with ONE Spark job + ONE commit — not a job per partition —
    while preserving content, per-file attestation, and work avoidance."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.api import compact
    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "many")
    n_parts = 256
    df = (
        spark.range(n_parts * 8)
        .select(
            (F.col("id") % n_parts).alias("p"),
            (F.hash("id") % 1000).alias("k"),
            F.col("id").alias("v"),
        )
    )
    tbl = DeltaTable.create(
        spark, path, df.repartition(2), partition_columns=["p"]
    )
    files_in = len(tbl.state().adds)
    assert files_in >= n_parts  # every partition unsorted, multi-file
    before_rows, before_sum = tbl.to_df().agg(
        F.count("*"), F.sum("v")
    ).collect()[0]
    version_before = tbl.log.latest_version()

    sc = spark.sparkContext
    sc.setJobGroup("sj-compact", "single-job many-partition compact")
    try:
        m = compact(path, ["k"], spark=spark)
    finally:
        sc.setJobGroup(None, None)
    jobs = len(sc.statusTracker().getJobIdsForGroup("sj-compact"))

    # O(1) Spark jobs: bulk plan scan + rewrite read/exchange/write +
    # staged-stats job — NOT O(n_parts) (the fan-out shape costs 2 jobs
    # per partition here, ~512)
    assert jobs <= 15, f"expected O(1) jobs, got {jobs}"
    assert m.rewritten_partitions == n_parts
    # ONE commit for the whole rewrite
    assert tbl.log.latest_version() == version_before + 1

    # content preserved
    after_rows, after_sum = tbl.to_df().agg(F.count("*"), F.sum("v")).collect()[0]
    assert (after_rows, after_sum) == (before_rows, before_sum)

    # attestation: a re-plan is metadata-only (zero jobs) and skips all
    sc.setJobGroup("sj-replan", "replan")
    try:
        m2 = compact(path, ["k"], spark=spark)
    finally:
        sc.setJobGroup(None, None)
    assert m2.planned_partitions == 0
    assert m2.skipped_partitions == n_parts
    assert len(sc.statusTracker().getJobIdsForGroup("sj-replan")) == 0

    # every output file belongs to exactly one partition (the dynamic
    # partitionBy split) and carries the sortedness attestation
    for a in tbl.state().adds:
        assert set(a.partition_values) == {"p"}
        assert (a.stats or {}).get("keyStats")


def test_single_job_threshold_disabled_uses_fanout(spark, tmp_path):
    """single_job_threshold=None keeps the reference-faithful bounded
    fan-out (one replaceWhere commit per partition)."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.api import compact
    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "fan")
    df = (
        spark.range(6 * 20)
        .select(
            (F.col("id") % 6).alias("p"),
            (F.hash("id") % 100).alias("k"),
            F.col("id").alias("v"),
        )
    )
    tbl = DeltaTable.create(spark, path, df.repartition(2), partition_columns=["p"])
    v0 = tbl.log.latest_version()
    m = compact(path, ["k"], spark=spark, single_job_threshold=None)
    assert m.rewritten_partitions == 6
    assert tbl.log.latest_version() == v0 + 6  # one commit per partition
    m2 = compact(path, ["k"], spark=spark, single_job_threshold=None)
    assert m2.planned_partitions == 0


def test_bin_pack_single_job_many_partitions(spark, tmp_path):
    """bin_pack_compact collapses to ONE Spark job + ONE commit at >=
    single_job_threshold qualifying partitions (same escape hatch as the
    sort path), preserving rows and one-partition-per-file."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.operators.compact import bin_pack_compact
    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "bp")
    n_parts = 96
    df = (
        spark.range(n_parts * 6)
        .select((F.col("id") % n_parts).alias("p"), F.col("id").alias("v"))
    )
    tbl = DeltaTable.create(
        spark, path, df.repartition(3), partition_columns=["p"]
    )
    files_in = len(tbl.state().adds)
    assert files_in >= 2 * n_parts  # every partition has >= 2 small files
    before = tbl.to_df().agg(F.count("*"), F.sum("v")).collect()[0]
    v0 = tbl.log.latest_version()

    sc = spark.sparkContext
    sc.setJobGroup("bp-sj", "single-job bin pack")
    try:
        m = bin_pack_compact(spark, path)
    finally:
        sc.setJobGroup(None, None)
    jobs = len(sc.statusTracker().getJobIdsForGroup("bp-sj"))
    assert jobs <= 10, f"expected O(1) jobs, got {jobs}"
    # round-robin repartition can land one partition's rows in a single
    # file, which bin-packing rightly skips — near-all is the contract
    assert m.rewritten_partitions >= n_parts - 4
    assert m.rewritten_partitions >= 64  # single-job mode engaged
    assert m.files_out < files_in
    assert tbl.log.latest_version() == v0 + 1

    after = tbl.to_df().agg(F.count("*"), F.sum("v")).collect()[0]
    assert tuple(after) == tuple(before)
    for a in tbl.state().adds:
        assert set(a.partition_values) == {"p"}


def test_cli_bin_pack(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from delta_sorter_spark.cli import main as cli_main
    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "clibp")
    df = spark.range(12 * 8).select(
        (F.col("id") % 12).alias("p"), F.col("id").alias("v")
    )
    tbl = DeltaTable.create(spark, path, df.repartition(3), partition_columns=["p"])
    files_in = len(tbl.state().adds)
    rc = cli_main(["--table", path, "--bin-pack", "--log-level", "warn"])
    out = capsys.readouterr().out
    assert rc == 0 and "bin-pack" in out
    assert len(tbl.state().adds) < files_in
    # idempotent: second run plans nothing
    rc = cli_main(["--table", path, "--bin-pack", "--log-level", "warn"])
    assert rc == 0 and "planned=0" in capsys.readouterr().out


def test_convert_to_delta(spark, tmp_path, capsys):
    """CONVERT TO DELTA adopts a plain Hive-partitioned parquet dir in
    place: no data bytes move, reads match the original, DML and compact
    work on the adopted table."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.cli import main as cli_main
    from delta_sorter_spark.operators.dml import delete_where

    path = str(tmp_path / "plain")
    df = spark.range(100).select(
        (F.col("id") % 4).alias("p"),
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    df.write.partitionBy("p").parquet(path)
    before = sorted(
        tuple(r) for r in spark.read.parquet(path).select("p", "k", "v").collect()
    )

    rc = cli_main(["--table", path, "--convert", "--sort-columns", "k",
                   "--log-level", "warn"])
    out = capsys.readouterr().out
    assert rc == 0 and "converted" in out and "partition_columns=p" in out

    tbl = DeltaTable(spark, path)
    got = sorted(tuple(r) for r in tbl.to_df().select("p", "k", "v").collect())
    assert got == before
    # stats landed: partition pruning + zone maps work on the adopted table
    assert all(a.stats and "minValues" in a.stats for a in tbl.state().adds)
    # the table is fully operational: DML + per-partition compact
    delete_where(tbl, "k >= 90")
    assert tbl.to_df().count() == 90
    compact(path, ["k"], spark=spark)
    from delta_sorter_spark.operators.validate import partition_is_sorted
    from delta_sorter_spark.plans.inventory import group_by_partition

    for grp in group_by_partition(tbl.state().adds):
        assert partition_is_sorted(tbl, grp.files, ["k"])
    # converting twice is refused
    rc = cli_main(["--table", path, "--convert", "--log-level", "warn"])
    assert rc == 2


def test_cli_restore(spark, tmp_path, capsys):
    from delta_sorter_spark.cli import main as cli_main
    from delta_sorter_spark.operators.dml import delete_where

    path = str(tmp_path / "clirst")
    tbl = make_f1(spark, path)
    v0 = tbl.state().version
    delete_where(tbl, "objectId = 'A'")
    assert tbl.to_df().count() == 2
    rc = cli_main(["--table", path, "--restore", str(v0), "--log-level", "warn"])
    out = capsys.readouterr().out
    assert rc == 0 and f"to_version={v0}" in out
    assert tbl.to_df().count() == 4
    # restoring to a version whose files were vacuumed is a usage error
    rc = cli_main(["--table", path, "--restore", "999", "--log-level", "warn"])
    assert rc == 2


def test_attest_backfill_makes_validation_metadata_only(spark, tmp_path):
    """attest_sort_stats: one-time scan of unattested files + one
    dataChange=false commit; afterwards validation of the same ordering
    runs ZERO Spark jobs and reports identical results."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.operators.validate import attest_sort_stats

    path = str(tmp_path / "att")
    sorted_half = spark.range(50).select(F.col("id").alias("k"))
    unsorted_half = spark.range(50, 100).select(
        (F.hash("id") % 1000).alias("k")
    )
    tbl = DeltaTable.create(
        spark, path, sorted_half.coalesce(1)
    )  # no stat_columns -> files carry NO keyStats
    tbl.append(unsorted_half.coalesce(1))
    for a in tbl.state().adds:
        assert "keyStats" not in (a.stats or {})

    before = validate(path, ["k"], spark=spark)
    v0 = tbl.log.latest_version()

    r = attest_sort_stats(tbl, ["k"])
    assert r["attested"] == 2 and r["already"] == 0
    assert tbl.log.latest_version() == v0 + 1  # one commit

    # all attested now, both null placements
    for a in tbl.state().adds:
        ks = (a.stats or {}).get("keyStats")
        assert ks and ks["cols"] == ["k"]
        assert "nullsFirst" in ks and "nullsLast" in ks
        assert a.data_change is False

    sc = spark.sparkContext
    sc.setJobGroup("att-val", "metadata-only validate")
    try:
        after = validate(path, ["k"], spark=spark)
    finally:
        sc.setJobGroup(None, None)
    assert len(sc.statusTracker().getJobIdsForGroup("att-val")) == 0
    assert after["boundary_violations"] == before["boundary_violations"]
    assert after["checked_files"] == before["checked_files"]

    # idempotent
    r2 = attest_sort_stats(tbl, ["k"])
    assert r2["attested"] == 0 and r2["already"] == 2

    # and nulls-last validation is covered by the same backfill
    sc.setJobGroup("att-val2", "nulls-last metadata validate")
    try:
        validate(path, ["k"], nulls="last", spark=spark)
    finally:
        sc.setJobGroup(None, None)
    assert len(sc.statusTracker().getJobIdsForGroup("att-val2")) == 0


def test_cli_attest(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from delta_sorter_spark.cli import main as cli_main

    path = str(tmp_path / "cliatt")
    df = spark.range(40).select((F.hash("id") % 99).alias("k"))
    DeltaTable.create(spark, path, df.coalesce(2))
    rc = cli_main(["--table", path, "--sort-columns", "k", "--attest",
                   "--log-level", "warn"])
    out = capsys.readouterr().out
    assert rc == 0 and "attested=" in out and "version=" in out
    rc = cli_main(["--table", path, "--sort-columns", "k", "--attest",
                   "--log-level", "warn"])
    assert "attested=0" in capsys.readouterr().out


def test_bin_pack_predicate_scopes_partitions(spark, tmp_path, capsys):
    """OPTIMIZE ... WHERE: --bin-pack with --predicate coalesces only the
    matching partitions' small files."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.cli import main as cli_main
    from delta_sorter_spark.operators.compact import bin_pack_compact

    path = str(tmp_path / "bpw")
    df = spark.range(40).select((F.col("id") % 2).alias("p"), F.col("id").alias("v"))
    tbl = DeltaTable.create(spark, path, df.repartition(4), partition_columns=["p"])
    files_by_part = {}
    for a in tbl.state().adds:
        files_by_part.setdefault(a.partition_values.get("p"), []).append(a.path)
    assert all(len(v) >= 2 for v in files_by_part.values())

    m = bin_pack_compact(spark, path, predicate="p = 0")
    assert m.rewritten_partitions == 1
    after = {}
    for a in tbl.state().adds:
        after.setdefault(a.partition_values.get("p"), []).append(a.path)
    assert len(after["0"]) == 1                      # packed
    assert set(after["1"]) == set(files_by_part["1"])  # untouched
    # CLI combo
    rc = cli_main(["--table", path, "--bin-pack", "--predicate", "p = 1",
                   "--log-level", "warn"])
    assert rc == 0
    assert len({a.path for a in tbl.state().adds if a.partition_values.get("p") == "1"}) == 1
