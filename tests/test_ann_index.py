"""Table-registered ANN index lifecycle (operators/ann_index.py): build ->
serve == direct pq_topk, incremental refresh after append / merge-on-read
delete / compaction, stale-serve safety, vacuum protection, drop."""

import os

import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.operators.ann_index import (
    ann_specs,
    ann_topk,
    build_ann_index,
    drop_ann_index,
    refresh_ann_index,
)
from delta_sorter_spark.sources.delta_table import DeltaTable

DIM = 8


def _vec(i: int) -> list:
    # deterministic, non-degenerate unit-ish vectors
    return [float(((i * 7 + j * 3) % 13) - 6) / 6.0 for j in range(DIM)]


def _rows(ids):
    return [(int(i), _vec(i)) for i in ids]


def _mk_table(spark, tmp_path, ids, name="t"):
    df = spark.createDataFrame(
        _rows(ids), "vid long, emb array<float>"
    ).coalesce(2)
    return DeltaTable.create(spark, os.path.join(str(tmp_path), name), df)


def _queries(spark, ids):
    return (
        spark.createDataFrame(_rows(ids), "vid long, emb array<float>")
    )


def test_build_serve_matches_direct_pq(spark, tmp_path):
    from delta_sorter_spark.operators.ivf import pq_topk

    tbl = _mk_table(spark, tmp_path, range(40))
    info = build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4, n_iters=2)
    assert info["rows"] == 40 and info["files"] >= 1
    q = _queries(spark, [0, 7, 21])
    served = ann_topk(tbl, q, "vid", "emb", "emb", k=3)
    direct = pq_topk(
        tbl.to_df(), q, "vid", "emb", "vid", "emb",
        dim=DIM, k=3, m=2, n_codes=4, n_iters=2,
    )
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, served.collect()), key=lambda t: (t[0], t[2])) \
        == sorted(map(tuple, direct.collect()), key=lambda t: (t[0], t[2]))


def test_refresh_after_append_covers_new_rows(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path, range(20))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4)
    tbl.append(
        spark.createDataFrame(_rows(range(20, 30)), "vid long, emb array<float>")
        .coalesce(1)
    )
    # stale index: new rows invisible, but nothing phantom
    pre = ann_topk(tbl, _queries(spark, [25]), "vid", "emb", "emb", k=5)
    assert all(r["id"] < 20 for r in pre.collect())
    info = refresh_ann_index(tbl, "emb")
    assert info["reencoded_files"] >= 1 and info["dropped_files"] == 0
    post = ann_topk(tbl, _queries(spark, [25]), "vid", "emb", "emb", k=29)
    ids = {r["id"] for r in post.collect()}
    assert set(range(20, 30)) - {25} <= ids  # appended rows now served


def test_refresh_noop_commits_nothing(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path, range(10))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4)
    v = tbl.log.latest_version()
    info = refresh_ann_index(tbl, "emb")
    assert info["reencoded_files"] == 0 and info["dropped_files"] == 0
    assert tbl.log.latest_version() == v


def test_refresh_after_dv_delete_drops_rows(spark, tmp_path):
    from delta_sorter_spark.operators.dml import delete_where_dv

    tbl = _mk_table(spark, tmp_path, range(30))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4)
    delete_where_dv(tbl, "vid % 5 = 1")
    refresh_ann_index(tbl, "emb")  # dv digest changed -> re-encode
    out = ann_topk(tbl, _queries(spark, [0]), "vid", "emb", "emb", k=29)
    ids = {r["id"] for r in out.collect()}
    assert not any(i % 5 == 1 for i in ids)


def test_compaction_stale_serve_then_refresh(spark, tmp_path):
    from delta_sorter_spark.api import compact

    tbl = _mk_table(spark, tmp_path, range(24))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4)
    compact(tbl.table_path, sort_columns=["vid"],
            repartition_by_sort_key=True, spark=spark)
    tbl = DeltaTable(spark, tbl.table_path)
    # every path replaced: stale serve returns NOTHING (never stale rows)
    stale = ann_topk(tbl, _queries(spark, [3]), "vid", "emb", "emb", k=5)
    assert stale.count() == 0
    info = refresh_ann_index(tbl, "emb")
    assert info["dropped_files"] >= 1 and info["reencoded_files"] >= 1
    post = ann_topk(tbl, _queries(spark, [3]), "vid", "emb", "emb", k=5)
    assert post.count() == 5


def test_vacuum_protects_registered_collects_dropped(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path, range(12))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4)
    rel = ann_specs(tbl)["emb"]["path"]
    doomed = tbl.vacuum(dry_run=True)
    assert not any(p.startswith(rel) for p in doomed)
    drop_ann_index(tbl, "emb")
    doomed = tbl.vacuum()
    assert any(p.startswith("_ann_index/") for p in doomed)
    assert "emb" not in ann_specs(tbl)
    with pytest.raises(KeyError):
        refresh_ann_index(tbl, "emb")


def test_build_validations(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path, range(4))
    with pytest.raises(ValueError, match="unknown column"):
        build_ann_index(tbl, "nope", "vid", DIM)
    df = spark.createDataFrame([("a", _vec(1))], "sid string, emb array<float>")
    t2 = DeltaTable.create(spark, os.path.join(str(tmp_path), "t2"), df)
    with pytest.raises(ValueError, match="integral"):
        build_ann_index(t2, "emb", "sid", DIM)


def test_carried_and_reencoded_codes_identical(spark, tmp_path):
    """pq_assign against the frozen codebooks reproduces build's codes
    bit-for-bit: append + refresh, then rebuild-free comparison of the
    original rows' codes before and after."""
    from delta_sorter_spark.operators.ann_index import ann_codes

    tbl = _mk_table(spark, tmp_path, range(16))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4)
    before = {
        (r["id"]): (r["code_0"], r["code_1"])
        for r in ann_codes(tbl, "emb").collect()
    }
    tbl.append(
        spark.createDataFrame(_rows([100]), "vid long, emb array<float>")
        .coalesce(1)
    )
    refresh_ann_index(tbl, "emb")
    after = {
        (r["id"]): (r["code_0"], r["code_1"])
        for r in ann_codes(tbl, "emb").collect()
    }
    assert {k: v for k, v in after.items() if k != 100} == before
    assert 100 in after


def test_concurrent_refreshes_converge(spark, tmp_path):
    """Two maintenance jobs refresh the same ANN index after an append:
    both commits land (conditional-PUT retry), the last registration wins,
    serving stays correct throughout, and the loser's dataset is
    vacuum-able while the winner's is protected."""
    import threading

    tbl = _mk_table(spark, tmp_path, range(20))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4)
    tbl.append(
        spark.createDataFrame(_rows([50, 51]), "vid long, emb array<float>")
        .coalesce(1)
    )
    errs = []

    def run():
        try:
            refresh_ann_index(DeltaTable(tbl.spark, tbl.table_path), "emb")
        except Exception as exc:  # pragma: no cover - failure reporting
            errs.append(exc)

    threads = [threading.Thread(target=run) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    assert not errs
    out = ann_topk(tbl, _queries(spark, [50]), "vid", "emb", "emb", k=21)
    ids = {r["id"] for r in out.collect()}
    assert 51 in ids and set(range(20)) <= ids
    # exactly one dataset protected; the rest collectable
    winner = ann_specs(tbl)["emb"]["path"]
    doomed = tbl.vacuum(dry_run=True)
    assert not any(p.startswith(winner) for p in doomed)
    assert any(p.startswith("_ann_index/") for p in doomed)


def test_ivf_index_probed_serve_matches_ivfpq(spark, tmp_path):
    """IVF-PQ registered index: probed serving from the persisted datasets
    equals the in-session ivfpq_topk on the same corpus (same coarse seeds,
    same codebooks, same ADC)."""
    from delta_sorter_spark.operators.ivf import ivfpq_topk

    tbl = _mk_table(spark, tmp_path, range(60))
    build_ann_index(
        tbl, "emb", "vid", DIM, m=2, n_codes=4, n_centroids=4
    )
    q = _queries(spark, [0, 13, 37])
    served = ann_topk(tbl, q, "vid", "emb", "emb", k=3, n_probes=2)
    direct = ivfpq_topk(
        tbl.to_df(), q, "vid", "emb", "vid", "emb",
        dim=DIM, k=3, m=2, n_codes=4, n_centroids=4, n_probes=2,
    )
    norm = lambda df: sorted(map(tuple, df.collect()))
    assert norm(served) == norm(direct)


def test_ivf_refresh_assigns_new_rows_to_frozen_lists(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path, range(30))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4, n_centroids=4)
    tbl.append(
        spark.createDataFrame(_rows(range(30, 40)), "vid long, emb array<float>")
        .coalesce(1)
    )
    refresh_ann_index(tbl, "emb")
    # probed serve sees appended rows; flat serve still works on the index
    probed = ann_topk(tbl, _queries(spark, [35]), "vid", "emb", "emb",
                      k=39, n_probes=4)
    assert {r["id"] for r in probed.collect()} >= set(range(30, 40)) - {35}
    flat = ann_topk(tbl, _queries(spark, [35]), "vid", "emb", "emb", k=5)
    assert flat.count() == 5
    # a re-encoded row's list id matches a fresh build's assignment rule:
    # carried rows and refreshed rows share the same frozen coarse centroids
    from delta_sorter_spark.operators.ann_index import ann_codes

    cents = {
        r["id"]: r["centroid"]
        for r in ann_codes(tbl, "emb").select("id", "centroid").collect()
    }
    assert set(cents) == set(range(40))


def test_probes_on_flat_index_rejected(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path, range(10))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4)
    with pytest.raises(ValueError, match="n_probes"):
        ann_topk(tbl, _queries(spark, [1]), "vid", "emb", "emb",
                 k=2, n_probes=2)


def test_streaming_ingest_keeps_index_fresh(spark, tmp_path):
    """Production wiring: a micro-batch stream appends into the table via
    the exactly-once Delta sink, and each batch's foreachBatch also runs
    refresh_ann_index — so the registered index tracks the stream with
    O(new files) work per batch, and serving after the drain covers every
    streamed row."""
    import os

    from delta_sorter_spark.streaming.events import delta_append_sink

    tbl = _mk_table(spark, tmp_path, range(20))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4)
    src = os.path.join(str(tmp_path), "src")
    spark.createDataFrame(_rows(range(20, 26)), "vid long, emb array<float>") \
        .repartition(2).write.parquet(src)
    sink = delta_append_sink(tbl.table_path, "ann-ingest")
    refreshes = []

    def batch_fn(df, bid):
        sink(df, bid)
        refreshes.append(
            refresh_ann_index(DeltaTable(df.sparkSession, tbl.table_path),
                              "emb")["reencoded_files"]
        )

    q = (
        spark.readStream.schema(tbl.to_df().schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(refreshes) == 2 and all(r >= 1 for r in refreshes)
    out = ann_topk(tbl, _queries(spark, [22]), "vid", "emb", "emb", k=25)
    ids = {r["id"] for r in out.collect()}
    assert set(range(20, 26)) - {22} <= ids


def test_residual_registered_index_matches_in_session(spark, tmp_path):
    """residual=True registered index: probed serving from the persisted
    datasets equals the in-session ivfpq_residual_topk, and flat serving
    is refused (residual codes need their list's centroid)."""
    from delta_sorter_spark.operators.ivf import ivfpq_residual_topk

    tbl = _mk_table(spark, tmp_path, range(60))
    build_ann_index(
        tbl, "emb", "vid", DIM, m=2, n_codes=4, n_centroids=4, residual=True
    )
    q = _queries(spark, [0, 13, 37])
    served = ann_topk(tbl, q, "vid", "emb", "emb", k=3, n_probes=2)
    direct = ivfpq_residual_topk(
        tbl.to_df(), q, "vid", "emb", "vid", "emb",
        dim=DIM, k=3, m=2, n_codes=4, n_centroids=4, n_probes=2,
    )
    norm = lambda df: sorted(map(tuple, df.collect()))
    assert norm(served) == norm(direct)
    with pytest.raises(ValueError, match="residual"):
        ann_topk(tbl, q, "vid", "emb", "emb", k=3)
    with pytest.raises(ValueError, match="n_centroids"):
        build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4,
                        residual=True)


def test_residual_refresh_frozen_pipeline(spark, tmp_path):
    """Append + refresh on a residual index: new rows residualize against
    the FROZEN coarse centroids and encode with the FROZEN codebooks —
    carried and re-encoded rows stay bit-compatible and serving covers
    the appended rows."""
    tbl = _mk_table(spark, tmp_path, range(30))
    build_ann_index(
        tbl, "emb", "vid", DIM, m=2, n_codes=4, n_centroids=4, residual=True
    )
    tbl.append(
        spark.createDataFrame(_rows(range(30, 40)), "vid long, emb array<float>")
        .coalesce(1)
    )
    info = refresh_ann_index(tbl, "emb")
    assert info["reencoded_files"] >= 1
    out = ann_topk(tbl, _queries(spark, [35]), "vid", "emb", "emb",
                   k=39, n_probes=4)
    ids = {r["id"] for r in out.collect()}
    assert set(range(30, 40)) - {35} <= ids


def test_refresh_io_is_o_new_not_o_index(spark, tmp_path):
    """Round-8 contract: refresh never rewrites carried codes.  The
    original build's codes part stays byte-identical on disk; the refresh
    writes only the new generation's part + a file-count-sized manifest."""
    from delta_sorter_spark.operators.ann_index import ann_codes

    tbl = _mk_table(spark, tmp_path, range(30))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4)
    spec0 = ann_specs(tbl)["emb"]
    part0 = os.path.join(tbl.table_path, *spec0["codes_parts"][0]["dir"].split("/"))
    before = {
        f: os.path.getmtime(os.path.join(part0, f))
        for f in os.listdir(part0) if f.endswith(".parquet")
    }
    tbl.append(
        spark.createDataFrame(_rows(range(30, 36)), "vid long, emb array<float>")
        .coalesce(1)
    )
    info = refresh_ann_index(tbl, "emb")
    assert info["reencoded_files"] == 1 and info["carried_files"] >= 1
    spec1 = ann_specs(tbl)["emb"]
    # base path stable, a SECOND generational part appeared
    assert spec1["path"] == spec0["path"]
    assert len(spec1["codes_parts"]) == 2
    assert spec1["files_dir"] != spec0["files_dir"]
    # the original part was not touched (no rewrite of carried codes)
    after = {
        f: os.path.getmtime(os.path.join(part0, f))
        for f in os.listdir(part0) if f.endswith(".parquet")
    }
    assert after == before
    # and the authoritative view covers everything exactly once
    ids = [r["id"] for r in ann_codes(tbl, "emb").select("id").collect()]
    assert sorted(ids) == list(range(36))


def test_refresh_dv_change_supersedes_old_part_rows(spark, tmp_path):
    """A DV re-encode bumps the file's generation: its old codes remain in
    the old part on disk but are never served (manifest excludes them) —
    no duplicates, no phantoms."""
    from delta_sorter_spark.operators.ann_index import ann_codes
    from delta_sorter_spark.operators.dml import delete_where_dv

    tbl = _mk_table(spark, tmp_path, range(20))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4)
    delete_where_dv(tbl, "vid < 4")
    refresh_ann_index(tbl, "emb")
    ids = [r["id"] for r in ann_codes(tbl, "emb").select("id").collect()]
    assert sorted(ids) == list(range(4, 20))  # once each, deleted gone
    # k=16 over 16 live rows: self-match (id == query_id) is excluded by
    # design, so exactly the 15 other live ids come back, once each
    out = ann_topk(tbl, _queries(spark, [7]), "vid", "emb", "emb", k=16)
    got = [r["id"] for r in out.collect()]
    assert sorted(got) == [i for i in range(4, 20) if i != 7]


def test_compact_ann_index_consolidates_and_reclaims(spark, tmp_path):
    from delta_sorter_spark.operators.ann_index import (
        ann_codes,
        compact_ann_index,
    )

    tbl = _mk_table(spark, tmp_path, range(20))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4)
    for lo in (20, 30):
        tbl.append(
            spark.createDataFrame(
                _rows(range(lo, lo + 5)), "vid long, emb array<float>"
            ).coalesce(1)
        )
        refresh_ann_index(tbl, "emb")
    spec = ann_specs(tbl)["emb"]
    assert len(spec["codes_parts"]) == 3
    served_pre = sorted(
        map(tuple, ann_topk(tbl, _queries(spark, [3]), "vid", "emb", "emb", k=5).collect())
    )
    info = compact_ann_index(tbl, "emb")
    assert info["parts_in"] == 3 and info["rows"] == 30
    spec2 = ann_specs(tbl)["emb"]
    assert spec2["path"] != spec["path"]
    assert len(spec2["codes_parts"]) == 1
    # identical serving (frozen codebooks copied verbatim)
    served_post = sorted(
        map(tuple, ann_topk(tbl, _queries(spark, [3]), "vid", "emb", "emb", k=5).collect())
    )
    assert served_post == served_pre
    ids = [r["id"] for r in ann_codes(tbl, "emb").select("id").collect()]
    assert sorted(ids) == list(range(25)) + list(range(30, 35))
    # the superseded generational dirs are no longer referenced -> vacuumable
    doomed = tbl.vacuum(dry_run=True)
    assert any(p.startswith(spec["path"]) for p in doomed)
    assert not any(p.startswith(spec2["path"]) for p in doomed)


def test_compact_ann_index_ivf_keeps_probed_serving(spark, tmp_path):
    from delta_sorter_spark.operators.ann_index import compact_ann_index

    tbl = _mk_table(spark, tmp_path, range(40))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4, n_centroids=4)
    tbl.append(
        spark.createDataFrame(_rows(range(40, 48)), "vid long, emb array<float>")
        .coalesce(1)
    )
    refresh_ann_index(tbl, "emb")
    pre = sorted(map(tuple, ann_topk(
        tbl, _queries(spark, [5, 42]), "vid", "emb", "emb", k=3, n_probes=2
    ).collect()))
    compact_ann_index(tbl, "emb")
    post = sorted(map(tuple, ann_topk(
        tbl, _queries(spark, [5, 42]), "vid", "emb", "emb", k=3, n_probes=2
    ).collect()))
    assert post == pre


def test_cli_compact_ann_index(spark, tmp_path, capsys):
    from delta_sorter_spark import cli
    from delta_sorter_spark.operators.ann_index import ann_specs

    tbl = _mk_table(spark, tmp_path, range(20))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4)
    tbl.append(
        spark.createDataFrame(_rows(range(20, 25)), "vid long, emb array<float>")
        .coalesce(1)
    )
    refresh_ann_index(tbl, "emb")
    assert cli.main(["--table", tbl.table_path, "--compact-ann-index", "emb"]) == 0
    out = capsys.readouterr().out
    assert "parts_in=2" in out and "rows=25" in out
    assert len(ann_specs(tbl)["emb"]["codes_parts"]) == 1
    # usage error: unknown index
    assert cli.main(["--table", tbl.table_path, "--compact-ann-index", "x"]) == 2


def test_ann_status_reports_generations_and_staleness(spark, tmp_path):
    from delta_sorter_spark.operators.ann_index import (
        ann_status,
        compact_ann_index,
    )
    from delta_sorter_spark.operators.dml import delete_where_dv

    tbl = _mk_table(spark, tmp_path, range(20))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4)
    st = ann_status(tbl, "emb")
    assert st["kind"] == "pq" and st["rows"] == 20 and st["parts"] == 1
    assert st["dead_rows"] == 0 and st["stale_files"] == 0
    assert not st["recommend_compaction"]

    # append without refresh: stale, nothing generational yet
    tbl.append(
        spark.createDataFrame(_rows(range(20, 25)), "vid long, emb array<float>")
        .coalesce(1)
    )
    st = ann_status(tbl, "emb")
    assert st["stale_files"] == 1 and st["parts"] == 1

    refresh_ann_index(tbl, "emb")
    # DV-change one original file: its old codes become dead weight
    delete_where_dv(tbl, "vid < 3")
    refresh_ann_index(tbl, "emb")
    st = ann_status(tbl, "emb")
    assert st["parts"] == 3 and st["stale_files"] == 0
    assert st["rows"] == 22  # 25 - 3 deleted
    assert st["dead_rows"] == 10  # the DV'd file's superseded gen-0 codes
    assert st["indexed_files"] == st["live_files"]

    compact_ann_index(tbl, "emb")
    st = ann_status(tbl, "emb")
    assert st["parts"] == 1 and st["dead_rows"] == 0 and st["rows"] == 22

    with pytest.raises(KeyError):
        ann_status(tbl, "nope")


def test_stale_index_never_serves_dv_deleted_rows(spark, tmp_path):
    """VERDICT r8 #5 pin: staleness costs recall, never correctness.
    After delete_where_dv on indexed files with NO refresh, serving
    exact-reranks against the live table (ann_topk -> _exact_rank), so a
    DV-deleted id can never surface as a phantom — and the result may
    hold fewer than k rows.  Guarded on BOTH serve paths (flat ADC and
    probed IVF) against future serve-path edits that skip _exact_rank."""
    from delta_sorter_spark.operators.dml import delete_where_dv

    # flat path
    tbl = _mk_table(spark, tmp_path, range(40), name="stale_flat")
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4)
    delete_where_dv(tbl, "vid % 2 = 1")  # half the corpus, index NOT refreshed
    out = ann_topk(tbl, _queries(spark, [0, 7]), "vid", "emb", "emb", k=30)
    rows = out.collect()
    ids = {r["id"] for r in rows}
    assert ids, "stale serve should still return the live rows"
    assert not any(i % 2 == 1 for i in ids), "DV-deleted id served as phantom"
    by_q: dict = {}
    for r in rows:
        by_q[r["query_id"]] = by_q.get(r["query_id"], 0) + 1
    # only 20 rows survive the delete; k=30 must degrade to < k, not pad
    assert all(n < 30 for n in by_q.values())

    # probed (IVF) path
    tbl2 = _mk_table(spark, tmp_path, range(40), name="stale_ivf")
    build_ann_index(tbl2, "emb", "vid", DIM, m=2, n_codes=4, n_centroids=4)
    delete_where_dv(tbl2, "vid % 2 = 1")
    out2 = ann_topk(
        tbl2, _queries(spark, [0, 7]), "vid", "emb", "emb", k=30, n_probes=2
    )
    ids2 = {r["id"] for r in out2.collect()}
    assert ids2 and not any(i % 2 == 1 for i in ids2)


def test_ann_status_counts_false_is_metadata_only(spark, tmp_path):
    """counts=False: planner-scale probe — log state + the file-count-sized
    manifest read only (no codes scan), staleness fields intact, row
    counts None."""
    from delta_sorter_spark.operators.ann_index import ann_status

    tbl = _mk_table(spark, tmp_path, range(25))
    build_ann_index(tbl, "emb", "vid", DIM, m=2, n_codes=4)
    tbl.append(spark.createDataFrame(_rows(range(25, 30)), "vid long, emb array<float>").coalesce(1))

    sc = spark.sparkContext
    sc.setJobGroup("st-fast", "metadata-only status")
    try:
        st = ann_status(tbl, "emb", counts=False)
    finally:
        sc.setJobGroup(None, None)
    # the manifest collect is the only job-shaped work (file-count rows);
    # the codes parts are never scanned
    assert len(sc.statusTracker().getJobIdsForGroup("st-fast")) <= 2
    assert st["rows"] is None and st["part_rows"] is None
    assert st["stale_files"] == 1 and st["parts"] == 1
    assert st["recommend_compaction"] is False
