"""Row-level table mutations on top of the transaction log: UPSERT (MERGE),
DELETE, RESTORE.

The reference is maintenance-only (rewrites never change data,
data_change=false throughout, lib.rs:818-828); a usable lakehouse engine also
needs the data-changing verbs.  All three are built from the same two
primitives the compactor uses — stage_write + Remove/Add commit — so they
inherit optimistic concurrency and vacuum/time-travel behavior for free.

Scale posture: UPSERT and DELETE rewrite only *candidate files*, never the
whole table.

- UPSERT prunes candidates with the per-file min/max key stats already
  attached by our writes (zone-map pruning: a file whose key interval cannot
  overlap the source's key range keeps its bytes untouched).  Correctness
  never depends on pruning — the anti-join drops exactly the matched rows.
- DELETE finds files that actually contain matching rows with one
  column-pruned scan (``input_file_name`` + the predicate), then rewrites
  only those.
- RESTORE is metadata-only: re-Add the target version's files, Remove the
  rest — zero data bytes moved (files must not have been vacuumed).
"""

from __future__ import annotations

import os
import urllib.parse
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_sorter_spark.sources.delta_log import AddAction
from delta_sorter_spark.sources.delta_table import DeltaTable, parse_stat
from delta_sorter_spark.functions.localframe import local_df


def _key_bounds(source: DataFrame, keys: Sequence[str]) -> dict[str, tuple]:
    aggs = []
    for k in keys:
        aggs += [F.min(k).alias(f"__lo_{k}"), F.max(k).alias(f"__hi_{k}")]
    row = source.agg(*aggs).collect()[0]
    return {k: (row[f"__lo_{k}"], row[f"__hi_{k}"]) for k in keys}


def _may_contain(add, bounds: dict[str, tuple], schema) -> bool:
    """Zone-map check: can this file's key intervals overlap the source's?
    Missing stats => conservatively True.  Stats are keyed by PHYSICAL
    column names (identical to logical unless renamed via column mapping)."""
    stats = add.stats or {}
    mins, maxs = stats.get("minValues", {}), stats.get("maxValues", {})
    for k, (lo, hi) in bounds.items():
        md = (schema[k].metadata or {}) if k in schema.names else {}
        pk = md.get("delta.columnMapping.physicalName", k)
        if lo is None or pk not in mins or pk not in maxs:
            return True
        fmin = parse_stat(mins[pk], schema[k].dataType)
        fmax = parse_stat(maxs[pk], schema[k].dataType)
        if fmin is None or fmax is None:
            return True
        if fmax < lo or fmin > hi:  # disjoint intervals on this key
            return False
    return True



def _require_mutable(table: DeltaTable, op: str) -> None:
    """Enforce ``delta.appendOnly`` (legacy writer-version-2 property, the
    ``appendOnly`` table feature under table features): a writer may only
    ADD data — every verb that removes or modifies rows refuses.
    dataChange=false maintenance (compaction, clustering OPTIMIZE) stays
    allowed: it moves bytes, not data."""
    cfg = table.metadata.configuration or {}
    if str(cfg.get("delta.appendOnly", "")).lower() == "true":
        raise ValueError(
            f"{op}: table is delta.appendOnly=true — writers may only append"
        )

def upsert(
    table: DeltaTable,
    source: DataFrame,
    keys: Sequence[str],
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> dict:
    """MERGE-style upsert: rows in ``source`` replace table rows with equal
    key tuples; unmatched source rows are inserted.  Only candidate files
    (zone-map overlap with the source's key range) are rewritten.

    ``txn_app_id``/``txn_version``: SetTransaction idempotence — if the
    table has already applied (app_id, version' >= version) the call is a
    no-op before any compute, mirroring :func:`merge`.

    Returns {"rewritten_files", "untouched_files", "version"}."""
    _require_mutable(table, "MERGE (upsert)")
    keys = list(keys)
    state = table.state()
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version must be passed together")
    if txn_app_id is not None and state.txns.get(txn_app_id, -1) >= txn_version:
        return {
            "rewritten_files": 0,
            "untouched_files": len(state.adds),
            "version": state.version,
            "skipped": True,
        }
    schema = state.metadata.schema
    bounds = _key_bounds(source, keys)
    candidates = [a for a in state.adds if _may_contain(a, bounds, schema)]

    source = source.select(*[F.col(f.name).cast(f.dataType) for f in schema.fields])
    # CHECK constraints: only the incoming rows can violate (kept rows
    # passed when they were written), so the one-pass check stays
    # source-sized, never table-sized
    table._enforce_constraints(source, state.metadata.write_constraints)
    if candidates:
        old = table.to_df(adds=candidates)
        kept = old.join(source.select(*keys).distinct(), keys, "left_anti")
        merged = kept.unionByName(source)
    else:
        merged = source
    adds = table.stage_write(merged, stat_columns=keys, data_change=True)
    removes = [a.remove_action(True) for a in candidates]
    cdc_extra = None
    if table.cdf_enabled(state.metadata):
        # replaced rows are update pre/post pairs, new keys are inserts;
        # kept rows (rewritten for file granularity only) emit nothing
        names_all = [f.name for f in schema.fields]
        if candidates:
            old_keys = old.select(*keys).distinct()
            frames = [
                old.join(source.select(*keys).distinct(), keys, "left_semi")
                .select(*names_all)
                .withColumn("_change_type", F.lit("update_preimage")),
                source.join(old_keys, keys, "left_semi")
                .select(*names_all)
                .withColumn("_change_type", F.lit("update_postimage")),
                source.join(old_keys, keys, "left_anti")
                .select(*names_all)
                .withColumn("_change_type", F.lit("insert")),
            ]
        else:
            frames = [
                source.select(*names_all).withColumn(
                    "_change_type", F.lit("insert")
                )
            ]
        u = frames[0]
        for fdf in frames[1:]:
            u = u.unionByName(fdf)
        cdc_extra = table.stage_cdc_write(u)
    version = table.commit_rewrite(
        adds, removes, operation="MERGE",
        txn_app_id=txn_app_id, txn_version=txn_version,
        extra_actions=cdc_extra,
    )
    return {
        "rewritten_files": len(candidates),
        "untouched_files": len(state.adds) - len(candidates),
        "version": version,
    }


def merge(
    table: DeltaTable,
    source: DataFrame,
    keys: Sequence[str],
    when_matched_update: dict[str, str] | None = None,
    when_matched_delete: str | None = None,
    matched_condition: str | None = None,
    when_not_matched_insert: bool = True,
    when_not_matched_by_source_update: dict[str, str] | None = None,
    when_not_matched_by_source_delete: str | None = None,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> dict:
    """Full conditional MERGE INTO.  Clause semantics (evaluated per target
    row; ``t.`` = target, ``s.`` = source in all expression strings):

    - key-matched and ``when_matched_delete`` true  -> row dropped
    - key-matched and ``matched_condition`` true (or None) -> columns set to
      ``when_matched_update``'s expressions; unnamed columns keep ``t.`` values
    - key-matched otherwise -> row kept unchanged
    - source rows matching no target key -> inserted (unless disabled)
    - target rows with NO source match (Delta's WHEN NOT MATCHED BY SOURCE,
      the full-sync clauses): ``when_not_matched_by_source_delete`` is a
      ``t.``-only predicate dropping the row (pass ``"true"`` for mirror
      semantics — anything absent from the source disappears);
      ``when_not_matched_by_source_update`` sets columns from ``t.``-only
      expressions (e.g. mark stale).  Delete wins if both hit.

    Like Delta/SQL MERGE, a target row matching MULTIPLE source rows is
    ambiguous and raises.  Two-pass, Delta-style: pass 1 finds the files
    that actually CONTAIN a changed row (matched update/delete hit, or a
    by-source clause firing) with one join that Catalyst column-prunes to
    the keys + condition columns; pass 2 rewrites only those files.  A
    merge touching one key range leaves the rest of a 100 TB table's files
    untouched, and an insert-only merge rewrites nothing at all.  BY SOURCE
    clauses widen the pass-1 READ to EVERY data file (exactly as Delta's
    own MERGE must read the full target then): a row outside the source's
    key range still has no source match, so zone-map pruning against the
    source bounds would silently exempt it from the sync — but files where
    no clause changes any row still keep their Adds intact.

    ``txn_app_id``/``txn_version``: SetTransaction idempotence (exactly-once
    foreachBatch CDC apply) — an already-recorded (appId, version) makes the
    whole merge a no-op BEFORE any compute or staging.

    Returns {"rewritten_files", "untouched_files", "version"}."""
    _require_mutable(table, "MERGE")
    keys = list(keys)
    update = dict(when_matched_update or {})
    state = table.state()
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version must be passed together")
    if txn_app_id is not None and state.txns.get(txn_app_id, -1) >= txn_version:
        return {
            "rewritten_files": 0,
            "untouched_files": len(state.adds),
            "version": state.version,
        }
    by_src = bool(
        when_not_matched_by_source_update or when_not_matched_by_source_delete
    )
    schema = state.metadata.schema
    bounds = _key_bounds(source, keys)
    candidates = (
        list(state.adds)
        if by_src
        else [a for a in state.adds if _may_contain(a, bounds, schema)]
    )

    src = source.select(
        *[F.col(f.name).cast(f.dataType) for f in schema.fields]
    )
    dup = src.groupBy(*keys).count().where(F.col("count") > 1).limit(1).collect()
    if dup:
        dupkey = {k: dup[0][k] for k in keys}
        raise ValueError(f"MERGE source has multiple rows for key {dupkey}")

    by_src_update = dict(when_not_matched_by_source_update or {})

    def _join(t):
        s = src.alias("s")
        cond = None
        for k in keys:
            c = F.col(f"t.{k}") == F.col(f"s.{k}")
            cond = c if cond is None else cond & c
        return t.join(s, cond, "left").withColumn(
            "__matched__", F.col(f"s.{keys[0]}").isNotNull()
        )

    def _clause_hits():
        delete_hit = (
            F.col("__matched__") & F.coalesce(F.expr(when_matched_delete), F.lit(False))
            if when_matched_delete
            else F.lit(False)
        )
        update_hit = F.col("__matched__") & (
            F.coalesce(F.expr(matched_condition), F.lit(False))
            if matched_condition
            else F.lit(True)
        )
        by_src_delete_hit = (
            ~F.col("__matched__")
            & F.coalesce(F.expr(when_not_matched_by_source_delete), F.lit(False))
            if when_not_matched_by_source_delete
            else F.lit(False)
        )
        return delete_hit, update_hit, by_src_delete_hit

    # Pass 1: which candidate files CONTAIN a row any clause changes?
    # (Catalyst prunes this scan+join to keys + condition columns.)
    rewrite: list = []
    if candidates:
        tagged = _target_with_path(table, candidates).alias("t")
        joined = _join(tagged)
        delete_hit, update_hit, by_src_delete_hit = _clause_hits()
        changed = delete_hit | by_src_delete_hit
        if update:
            changed = changed | update_hit
        if by_src_update:
            # the by-source update applies to EVERY unmatched row
            changed = changed | ~F.col("__matched__")
        changed_paths = {
            r["__p__"]
            for r in joined.where(changed)
            .select(F.col("t.__path__").alias("__p__"))
            .distinct()
            .collect()
        }
        rewrite = [a for a in candidates if a.path in changed_paths]

    # Inserts anti-join against ALL candidates (zone pruning keeps every
    # file that may hold a source key, so candidate keys == table keys
    # for this purpose), never just the rewrite subset
    inserts = None
    if when_not_matched_insert:
        if candidates:
            inserts = src.join(
                table.to_df(adds=candidates).select(*keys), keys, "left_anti"
            )
        else:
            inserts = src

    # Pass 2: rewrite only the changed files
    rt = table.row_tracking_enabled(state.metadata)
    if rt:
        mat_id, mat_ver = table._materialized_row_cols(state.metadata)
    cdc_frames: list[DataFrame] = []
    cdf_on = table.cdf_enabled(state.metadata)
    if rewrite:
        t = table.read_for_rewrite(rewrite, state.metadata).alias("t")
        joined = _join(t)
        delete_hit, update_hit, by_src_delete_hit = _clause_hits()
        keep_unmatched = ~F.col("__matched__")
        out_cols = []
        for f in schema.fields:
            updated = (
                F.expr(update[f.name]).cast(f.dataType)
                if f.name in update
                else F.col(f"t.{f.name}")
            )
            col = F.when(keep_unmatched | ~update_hit, F.col(f"t.{f.name}")).otherwise(
                updated
            )
            if f.name in by_src_update:
                col = F.when(
                    ~F.col("__matched__"),
                    F.expr(by_src_update[f.name]).cast(f.dataType),
                ).otherwise(col)
            out_cols.append(col.alias(f.name))
        if cdf_on:
            # change rows fall straight out of the clause masks: delete
            # wins over update (the merged .where drops those rows), the
            # by-source update touches every unmatched row, and rows no
            # clause changed emit nothing.  out_cols at this point is
            # exactly the logical schema (post-values).
            tcols = [F.col(f"t.{f.name}").alias(f.name) for f in schema.fields]
            del_mask = delete_hit | by_src_delete_hit
            upd_mask = (
                F.col("__matched__") & update_hit & ~delete_hit
                if update
                else F.lit(False)
            )
            if by_src_update:
                upd_mask = upd_mask | (
                    ~F.col("__matched__") & ~by_src_delete_hit
                )
            cdc_frames.append(
                joined.where(del_mask)
                .select(*tcols)
                .withColumn("_change_type", F.lit("delete"))
            )
            cdc_frames.append(
                joined.where(upd_mask)
                .select(*tcols)
                .withColumn("_change_type", F.lit("update_preimage"))
            )
            cdc_frames.append(
                joined.where(upd_mask)
                .select(*out_cols)
                .withColumn("_change_type", F.lit("update_postimage"))
            )
        if rt:
            # every surviving row keeps its id; rows a clause CHANGED null
            # their materialized commit version so readers fall back to the
            # fresh Add's (= this merge's commit), untouched rows carry
            changed_row = (F.col("__matched__") & update_hit & F.lit(bool(update))) | (
                ~F.col("__matched__") & F.lit(bool(by_src_update))
            )
            out_cols += [
                F.col(f"t.{mat_id}").alias(mat_id),
                F.when(changed_row, F.lit(None).cast("long"))
                .otherwise(F.col(f"t.{mat_ver}"))
                .alias(mat_ver),
            ]
        merged = joined.where(~delete_hit & ~by_src_delete_hit).select(*out_cols)
        if inserts is not None:
            icols = [F.col(f.name) for f in schema.fields]
            if rt:
                icols += [
                    F.lit(None).cast("long").alias(mat_id),
                    F.lit(None).cast("long").alias(mat_ver),
                ]
            merged = merged.unionByName(inserts.select(*icols))
    else:
        if inserts is None:
            return {  # nothing changed, nothing to insert: metadata no-op
                "rewritten_files": 0,
                "untouched_files": len(state.adds),
                "version": state.version,
            }
        icols = [F.col(f.name) for f in schema.fields]
        if rt:
            icols += [
                F.lit(None).cast("long").alias(mat_id),
                F.lit(None).cast("long").alias(mat_ver),
            ]
        merged = inserts.select(*icols)

    # CHECK constraints over the staged output — changed-file rows plus
    # inserts, the smallest frame that contains every clause-produced value
    table._enforce_constraints(
        merged.select(*[f.name for f in schema.fields]),
        state.metadata.write_constraints,
    )
    adds = table.stage_write(
        merged, stat_columns=keys, data_change=True,
        schema=table.rewrite_schema(state.metadata),
    )
    removes = [a.remove_action(True) for a in rewrite]
    if not adds and not removes:
        return {  # e.g. insert-only merge whose source fully matched
            "rewritten_files": 0,
            "untouched_files": len(state.adds),
            "version": state.version,
        }
    cdc_extra = None
    if cdf_on:
        if inserts is not None:
            cdc_frames.append(
                inserts.select(*[F.col(f.name) for f in schema.fields])
                .withColumn("_change_type", F.lit("insert"))
            )
        if cdc_frames:
            u = cdc_frames[0]
            for fdf in cdc_frames[1:]:
                u = u.unionByName(fdf)
            cdc_extra = table.stage_cdc_write(u)
    version = table.commit_rewrite(
        adds, removes, operation="MERGE",
        txn_app_id=txn_app_id, txn_version=txn_version,
        extra_actions=cdc_extra,
    )
    return {
        "rewritten_files": len(rewrite),
        "untouched_files": len(state.adds) - len(rewrite),
        "version": version,
    }


def _predicate_hit_paths(table: DeltaTable, state, predicate: str) -> set[str]:
    """Table-relative paths of data files that contain at least one row
    matching ``predicate`` — ONE scan, O(#files-touched) to the driver.

    The scan itself is zone-map pruned first (functions/skipping.py): files
    whose stats prove the predicate can't match are never scheduled, so a
    selective DELETE/UPDATE on a clustered column reads only the overlapping
    files instead of the whole table.  Bloom indexes (operators/
    bloom_index.py) then drop files whose filters prove the predicate's
    equality values absent — the unclustered point-lookup case."""
    from delta_sorter_spark.functions.skipping import prune_adds
    from delta_sorter_spark.operators.bloom_index import bloom_prune_adds

    scan_adds = prune_adds(
        state.adds, predicate, state.metadata.schema,
        state.metadata.partition_columns,
    )
    scan_adds = bloom_prune_adds(table, scan_adds, predicate, state.metadata)
    if not scan_adds:
        return set()
    if table.is_remote:
        # F.input_file_name() is empty under the Python Data Source; the
        # source's withFilePath option emits the table-relative path instead
        from delta_sorter_spark.streaming.delta_source import FILE_COL

        # pin the scan to the snapshot the candidates come from (explicit
        # file specs): an unpinned read sees files committed AFTER state was
        # captured, so hit paths would miss every candidate and the DML
        # silently no-ops under a concurrent rewrite
        df = table._to_df_remote(adds=scan_adds, with_file_path=True)
        return {
            r["__f__"]
            for r in df.where(predicate)
            .select(F.col(FILE_COL).alias("__f__"))
            .distinct()
            .collect()
        }
    df = table.to_df(adds=scan_adds)
    hit_uris = {
        r["__f__"]
        for r in df.where(predicate)
        .select(F.input_file_name().alias("__f__"))
        .distinct()
        .collect()
    }
    return {
        os.path.relpath(
            urllib.parse.unquote(urllib.parse.urlparse(u).path), table.table_path
        )
        for u in hit_uris
    }


def delete_where(table: DeltaTable, predicate: str) -> dict:
    """DELETE FROM table WHERE predicate — rewrites only the files that
    actually contain matching rows (one scan to find them, one to rewrite).

    Returns {"rewritten_files", "deleted_rows", "version"}."""
    _require_mutable(table, "DELETE")
    state = table.state()
    hit_paths = _predicate_hit_paths(table, state, predicate)
    candidates = [a for a in state.adds if a.path in hit_paths]
    if not candidates:
        return {"rewritten_files": 0, "deleted_rows": 0, "version": state.version}

    # read_for_rewrite: with row tracking on, surviving rows carry their
    # materialized ids into the rewritten files (stable ids across DELETE)
    old = table.read_for_rewrite(candidates)
    before = old.count()
    # SQL DELETE semantics: delete rows where the predicate is TRUE; rows
    # where it evaluates NULL are kept (NOT(NULL) is NULL, which a bare
    # where() would silently drop — hence the coalesce)
    kept = old.where(F.coalesce(F.expr(f"NOT ({predicate})"), F.lit(True)))
    after = kept.count()
    adds = (
        table.stage_write(kept, data_change=True, schema=table.rewrite_schema())
        if after
        else []
    )
    removes = [a.remove_action(True) for a in candidates]
    extra = None
    if table.cdf_enabled(state.metadata):
        extra = table.stage_cdc_write(
            old.where(F.coalesce(F.expr(predicate), F.lit(False)))
            .select(*[f.name for f in state.metadata.schema.fields])
            .withColumn("_change_type", F.lit("delete"))
        )
    version = table.commit_rewrite(
        adds, removes, operation="DELETE", extra_actions=extra
    )
    return {
        "rewritten_files": len(candidates),
        "deleted_rows": before - after,
        "version": version,
    }


def update_where(
    table: DeltaTable, predicate: str, set_exprs: dict[str, str]
) -> dict:
    """UPDATE table SET col = expr, ... WHERE predicate — the remaining
    DML verb next to :func:`delete_where`/:func:`merge`.  SQL semantics:
    rows where the predicate is TRUE get each ``set_exprs[col]`` (an
    expression over the row's OLD column values, all evaluated before any
    assignment); FALSE/NULL rows are untouched.  Only files that actually
    contain matching rows are rewritten — one scan finds them
    (:func:`_predicate_hit_paths`), one rewrites; at 100 TB a predicate
    touching one key range rewrites those files only.

    Returns {"rewritten_files", "updated_rows", "version"}."""
    _require_mutable(table, "UPDATE")
    state = table.state()
    schema = state.metadata.schema
    names = {f.name for f in schema.fields}
    unknown = sorted(set(set_exprs) - names)
    if unknown:
        raise ValueError(f"update_where: unknown columns {unknown}")
    hit_paths = _predicate_hit_paths(table, state, predicate)
    candidates = [a for a in state.adds if a.path in hit_paths]
    if not candidates:
        return {"rewritten_files": 0, "updated_rows": 0, "version": state.version}

    old = table.read_for_rewrite(candidates)
    hit = F.coalesce(F.expr(predicate), F.lit(False))
    updated_rows = old.where(hit).count()
    out_cols = []
    for f in schema.fields:
        if f.name in set_exprs:
            out_cols.append(
                F.when(hit, F.expr(set_exprs[f.name]).cast(f.dataType))
                .otherwise(F.col(f.name))
                .alias(f.name)
            )
        else:
            out_cols.append(F.col(f.name))
    # CHECK constraints on the post-assignment values of HIT rows only —
    # unhit rows in the same files are byte-identical and passed already
    table._enforce_constraints(
        old.where(hit).select(*out_cols), state.metadata.write_constraints
    )
    cdc_extra = None
    if table.cdf_enabled(state.metadata):
        # out_cols is exactly the logical schema at this point (row-tracking
        # columns are appended below): pre/post images of the hit rows
        names_all = [f.name for f in schema.fields]
        pre = (
            old.where(hit)
            .select(*names_all)
            .withColumn("_change_type", F.lit("update_preimage"))
        )
        post = (
            old.where(hit)
            .select(*out_cols)
            .withColumn("_change_type", F.lit("update_postimage"))
        )
        cdc_extra = table.stage_cdc_write(pre.unionByName(post))
    if table.row_tracking_enabled(state.metadata):
        # updated rows KEEP their row id; their materialized commit version
        # nulls out so readers fall back to the rewritten Add's fresh
        # defaultRowCommitVersion (= this UPDATE's commit) while untouched
        # rows carry their old version forward
        mat_id, mat_ver = table._materialized_row_cols(state.metadata)
        out_cols += [
            F.col(mat_id),
            F.when(hit, F.lit(None).cast("long"))
            .otherwise(F.col(mat_ver))
            .alias(mat_ver),
        ]
    adds = table.stage_write(
        old.select(*out_cols), data_change=True, schema=table.rewrite_schema()
    )
    removes = [a.remove_action(True) for a in candidates]
    version = table.commit_rewrite(
        adds, removes, operation="UPDATE", extra_actions=cdc_extra
    )
    return {
        "rewritten_files": len(candidates),
        "updated_rows": updated_rows,
        "version": version,
    }


def _target_with_path(table: DeltaTable, adds) -> DataFrame:
    """DV-applied read of ``adds`` plus a ``__path__`` table-relative path
    column, computed Spark-side — the find-touched-files pass of MERGE.

    The file column comes from the scan's ``_metadata.file_path``
    (``_read_dv_files(keep_file_col=True)``), NOT ``input_file_name()``:
    when any add carries a deletion vector the positional anti-join severs
    the file-scan lineage and input_file_name() silently yields '' — which
    would tag every DV'd file's rows with an empty path (MERGE would then
    miss those files, and an ANN refresh would encode codes serving can
    never match)."""
    if table.is_remote:
        from delta_sorter_spark.streaming.delta_source import FILE_COL

        df = table._to_df_remote(
            adds=list(adds), with_file_path=True
        ).withColumnRenamed(FILE_COL, "__file__")
    else:
        df = table._read_dv_files(
            list(adds), table.metadata, keep_file_col=True
        )
    return df.withColumn("__path__", _rel_path_col(table)).drop("__file__")


def _rel_path_col(table: DeltaTable):
    """Table-relative path column for a positional scan's ``__file__``."""
    import re as _re

    if table.is_remote:
        # the Python Data Source's file column is the table-relative path
        # verbatim (no URL re-encoding involved)
        return F.regexp_replace(
            F.col("__file__"),
            "^" + _re.escape(table.table_path.rstrip("/")) + "/",
            "",
        )
    # URI -> table-relative path, computed in Spark.  '+' is a literal
    # in URI paths (spaces are %20), but url_decode treats it as a
    # space — re-encode it first so both survive.
    abs_col = F.regexp_replace(
        F.expr("url_decode(replace(__file__, '+', '%2B'))"), "^[a-z]+:/+", "/"
    )
    return F.regexp_replace(
        abs_col, "^" + _re.escape(table.table_path.rstrip("/")) + "/", ""
    )


def delete_where_dv(
    table: DeltaTable,
    predicate: str | None,
    vector_format: str = "roaring",
    txn_app_id: str | None = None,
    txn_version: int | None = None,
    _insert_adds: list | None = None,
    _operation: str = "DELETE",
    _hits_df: DataFrame | None = None,
    _cdc_frames: list | None = None,
    _txn_app_id: str | None = None,
    _txn_version: int | None = None,
) -> dict:
    """Merge-on-read DELETE: instead of rewriting hit files, record the
    deleted row POSITIONS in a deletion vector and re-Add each file with a
    ``deletionVector`` pointer.  Readers (``to_df``) drop those positions
    via a broadcast anti-join on the native parquet ``_metadata.row_index``
    — no data bytes are rewritten.

    This is the scale path for small deletes on huge tables (GDPR one-row
    erasure on a 100 TB table touches only the log + a KB vector vs
    rewriting multi-GB files).  Trade-off: reads of DV'd files carry the
    anti-join until ``purge_deletion_vectors`` (or any compaction rewrite)
    materializes the delete.

    ``vector_format="roaring"`` (default) writes STANDARD Delta-protocol
    deletion vectors — one ``deletion_vector_<uuid>.bin`` roaring-bitmap
    file per touched data file, storageType "u" descriptors
    (sources/roaring.py; the format the reference's own table layer,
    delta-rs ``deltalake 0.28``, reads).  ``"parquet"`` keeps this engine's
    earlier ``(path, pos)`` parquet-dataset sidecar (non-standard; purge
    before pointing foreign readers at the table).

    Returns {"dv_files", "deleted_rows", "version"}.

    Scale path: the matched row positions never pass through the driver.
    The predicate scan tags each hit with its table-relative path (computed
    in Spark from ``_metadata.file_path``), unions in the prior positions of
    any already-DV'd hit file (positions are cumulative per vector), and
    writes the merged vectors directly from executors (one applyInPandas
    group per touched file for roaring; a dataset write for parquet).  The
    driver sees only one descriptor row per touched file — O(#files-
    touched), the same order as the commit itself."""
    _require_mutable(table, "DELETE")
    import uuid as _uuid  # noqa: F401  (parquet sidecar branch below)

    if vector_format not in ("roaring", "parquet"):
        raise ValueError(f"unknown vector_format {vector_format!r}")
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version must be passed together")
    if _txn_app_id is None:
        _txn_app_id, _txn_version = txn_app_id, txn_version

    state = table.state()
    if _txn_app_id is not None and state.txns.get(_txn_app_id, -1) >= _txn_version:
        return {
            "dv_files": 0,
            "deleted_rows": 0,
            "version": state.version,
            "skipped": True,
        }

    def _stage_caller_cdc() -> list[dict]:
        # caller-provided change frames (update_where_dv images, merge_dv
        # clause rows) — staged lazily so no-commit early returns leave no
        # orphan cdc files
        if not (_cdc_frames and table.cdf_enabled(state.metadata)):
            return []
        u = _cdc_frames[0]
        for fdf in _cdc_frames[1:]:
            u = u.unionByName(fdf)
        return table.stage_cdc_write(u)

    if _hits_df is not None:
        # caller-provided (path, pos) hit set (merge_dv's positional join)
        hits = _hits_df.persist()
    else:
        # Raw positional scan (existing DVs not applied): rows already
        # deleted may re-match the predicate, but the sidecar-level
        # distinct() makes that a no-op, and deleted_rows counts only NEW
        # positions.  Zone-map pruned first (functions/skipping.py): files
        # whose stats exclude the predicate get no scan task and no vector.
        from delta_sorter_spark.functions.skipping import prune_adds
        from delta_sorter_spark.operators.bloom_index import bloom_prune_adds

        scan_adds = prune_adds(
            state.adds, predicate, state.metadata.schema,
            state.metadata.partition_columns,
        )
        scan_adds = bloom_prune_adds(table, scan_adds, predicate, state.metadata)
        if not scan_adds:
            if _insert_adds:
                version = table.commit_rewrite(
                    list(_insert_adds), [], operation=_operation,
                    txn_app_id=_txn_app_id, txn_version=_txn_version,
                    extra_actions=_stage_caller_cdc() or None,
                )
                return {"dv_files": 0, "deleted_rows": 0, "version": version}
            return {"dv_files": 0, "deleted_rows": 0, "version": state.version}
        scan = table.scan_with_positions(scan_adds)
        # Cache the positional scan: it feeds the touched-path set, the
        # prior-DV restriction, AND the merged vector write — without the
        # persist the full predicate scan would re-execute once per
        # consumer.
        hits = (
            scan.where(F.coalesce(F.expr(predicate), F.lit(False)))
            .select(
                _rel_path_col(table).alias("path"), F.col("__pos__").alias("pos")
            )
            .persist()
        )
    # O(#files-touched) driver-side: materializes the scan ONCE into the
    # cache and gives the path set both downstream filters reuse.
    touched = sorted(r["path"] for r in hits.select("path").distinct().collect())
    if not touched:
        hits.unpersist()
        if _insert_adds:
            # insert-only outcome (e.g. a MERGE that matched nothing):
            # still one atomic commit of the staged value files
            version = table.commit_rewrite(
                list(_insert_adds), [], operation=_operation,
                txn_app_id=_txn_app_id, txn_version=_txn_version,
                extra_actions=_stage_caller_cdc() or None,
            )
            return {"dv_files": 0, "deleted_rows": 0, "version": version}
        return {"dv_files": 0, "deleted_rows": 0, "version": state.version}
    restrict_df = local_df(table.spark, [(p,) for p in touched], "path string")

    cdc_extra: list[dict] = []
    if table.cdf_enabled(state.metadata):
        if _cdc_frames:
            # merge-on-read UPDATE / MERGE riding this flow: the caller's
            # image/clause frames are the change data
            cdc_extra = _stage_caller_cdc()
        elif _hits_df is None:
            # plain DV DELETE: newly-deleted row VALUES are the live view
            # (prior DVs applied) of the scanned files under the predicate
            # — read against the PRE-COMMIT snapshot's adds, so vectors
            # written below don't hide them
            names_all = [f.name for f in state.metadata.schema.fields]
            cdc_extra = table.stage_cdc_write(
                table.read_for_rewrite(scan_adds)
                .where(F.coalesce(F.expr(predicate), F.lit(False)))
                .select(*names_all)
                .withColumn("_change_type", F.lit("delete"))
            )
        # a bare _hits_df with no frames (not a path any public verb takes)
        # falls back to file-level synthesis in table_changes

    # Prior positions of currently-DV'd files, restricted to files this
    # delete touches (their Add is re-pointed, so the new sidecar must carry
    # the union).  Parquet sidecars stream executor-side; legacy JSON
    # sidecars (small by construction) load driver-side.
    prev_parts = _dv_positions_parts(table, state.adds, restrict=restrict_df)
    merged = hits
    if prev_parts:
        prev = prev_parts[0]
        for p in prev_parts[1:]:
            prev = prev.unionByName(p)
        prev = prev.where(F.col("path").isin(touched))
        merged = hits.unionByName(prev)
    merged = merged.distinct()

    extra_actions = None
    if vector_format == "roaring":
        dv_by_path = _write_roaring_vectors(table, merged)
        if not dv_by_path:
            hits.unpersist()
            return {"dv_files": 0, "deleted_rows": 0, "version": state.version}
        counts = {rel: dv["cardinality"] for rel, dv in dv_by_path.items()}
        extra_actions = _dv_protocol_upgrade(state)
    else:
        sidecar_rel = f"_deletion_vectors/{_uuid.uuid4().hex}"
        # co-locate each file's positions so readers filtering on path touch
        # few sidecar files
        table.write_parquet_dataset(merged.repartition("path"), sidecar_rel)
        counts = {
            r["path"]: r["n"]
            for r in table.read_parquet_dataset(
                sidecar_rel, ["path", "pos"], "path string, pos long"
            )
            .groupBy("path")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        if not counts:
            # no-match delete: drop the just-written empty sidecar dataset so
            # repeated no-op deletes don't accumulate orphan directories
            table.delete_dataset(sidecar_rel)
            hits.unpersist()
            return {"dv_files": 0, "deleted_rows": 0, "version": state.version}
        dv_by_path = {
            rel: {"storagePath": sidecar_rel, "cardinality": n}
            for rel, n in counts.items()
        }
    hits.unpersist()  # vectors written; the cached scan has served every consumer

    adds_by_path = {a.path: a for a in state.adds}
    new_adds, removes = [], []
    deleted_rows = 0
    for rel, cardinality in counts.items():
        old = adds_by_path[rel]
        prev_n = (old.deletion_vector or {}).get("cardinality", 0)
        deleted_rows += cardinality - prev_n
        removes.append(old.remove_action(True))
        new_adds.append(
            AddAction(
                path=old.path,
                size=old.size,
                partition_values=old.partition_values,
                modification_time=old.modification_time,
                data_change=True,
                stats=_loose_stats(old.stats),
                deletion_vector=dv_by_path[rel],
                # same physical file: row ids are position-based and stable
                base_row_id=old.base_row_id,
                default_row_commit_version=old.default_row_commit_version,
                # ...and the clustering attestation stays true of its bytes
                tags=old.tags,
                clustering_provider=old.clustering_provider,
            )
        )
    n_dv_files = len(new_adds)
    if _insert_adds:
        # merge-on-read UPDATE rides this flow: the updated row VALUES are
        # pre-staged files that join the same atomic commit as the vectors
        new_adds = new_adds + list(_insert_adds)
    if cdc_extra:
        extra_actions = list(extra_actions or []) + cdc_extra
    version = table.commit_rewrite(
        new_adds, removes, operation=_operation, extra_actions=extra_actions,
        txn_app_id=_txn_app_id, txn_version=_txn_version,
    )
    return {
        "dv_files": n_dv_files,
        "deleted_rows": deleted_rows,
        "version": version,
    }


def update_where_dv(
    table: DeltaTable,
    predicate: str,
    set_exprs: dict[str, str],
    vector_format: str = "roaring",
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> dict:
    """Merge-on-read UPDATE — Delta's DV-update shape: the matched rows'
    positions go into deletion vectors (their multi-GB data files are NOT
    rewritten) and the updated row VALUES append as new files, both in ONE
    atomic commit, so readers see either every old row or every new one.

    This is the scale path for small updates on huge tables (the one-row
    correction on a 100 TB table costs a KB vector + a tiny new file),
    exactly as :func:`delete_where_dv` is for small deletes; the copy-on-
    write sibling :func:`update_where` stays the right call when an update
    touches most of a file.  SET semantics match :func:`update_where`
    (expressions over the OLD row values).

    ``txn_app_id``/``txn_version``: SetTransaction idempotence as in
    :func:`merge_dv` — a redelivered batch no-ops before any compute.

    Returns {"dv_files", "updated_rows", "version"}."""
    _require_mutable(table, "UPDATE")
    state = table.state()
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version must be passed together")
    if txn_app_id is not None and state.txns.get(txn_app_id, -1) >= txn_version:
        return {
            "dv_files": 0,
            "updated_rows": 0,
            "version": state.version,
            "skipped": True,
        }
    schema = state.metadata.schema
    names = {f.name for f in schema.fields}
    unknown = sorted(set(set_exprs) - names)
    if unknown:
        raise ValueError(f"update_where_dv: unknown columns {unknown}")
    # Updated values come from the LIVE view (existing DVs applied): a row
    # already deleted by a prior vector must not be resurrected even though
    # the raw positional scan below will (no-op) re-mark its position.
    # Zone-map pruned (functions/skipping.py): only files whose stats admit
    # the predicate are scanned for values.
    from delta_sorter_spark.functions.skipping import prune_adds

    value_adds = prune_adds(
        state.adds, predicate, schema, state.metadata.partition_columns
    )
    live_hits = table.read_for_rewrite(value_adds).where(
        F.coalesce(F.expr(predicate), F.lit(False))
    )
    out_cols = []
    for f in schema.fields:
        if f.name in set_exprs:
            out_cols.append(
                F.expr(set_exprs[f.name]).cast(f.dataType).alias(f.name)
            )
        else:
            out_cols.append(F.col(f.name))
    rt = table.row_tracking_enabled(state.metadata)
    if rt:
        # the appended value rows are the SAME logical rows the vectors
        # retire: materialize their ids (version nulls to the fresh Add's)
        mat_id, mat_ver = table._materialized_row_cols(state.metadata)
        out_cols += [F.col(mat_id), F.lit(None).cast("long").alias(mat_ver)]
    updated = live_hits.select(*out_cols).localCheckpoint(eager=True)
    n_updated = updated.count()
    if n_updated == 0:
        # nothing staged yet, so a no-match update leaves no orphan files
        return {"dv_files": 0, "updated_rows": 0, "version": state.version}
    # CHECK constraints on the appended values (checkpointed: one cheap agg)
    table._enforce_constraints(
        updated.select(*[f.name for f in schema.fields]),
        state.metadata.write_constraints,
    )
    insert_adds = table.stage_write(
        updated, data_change=True, schema=table.rewrite_schema()
    )
    cdc_frames = None
    if table.cdf_enabled(state.metadata):
        names_all = [f.name for f in schema.fields]
        cdc_frames = [
            live_hits.select(*names_all).withColumn(
                "_change_type", F.lit("update_preimage")
            ),
            updated.select(*names_all).withColumn(
                "_change_type", F.lit("update_postimage")
            ),
        ]
    res = delete_where_dv(
        table,
        predicate,
        vector_format,
        _insert_adds=insert_adds,
        _operation="UPDATE",
        _hits_df=None,
        _cdc_frames=cdc_frames,
        _txn_app_id=txn_app_id,
        _txn_version=txn_version,
    )
    return {
        "dv_files": res["dv_files"],
        "updated_rows": n_updated,
        "version": res["version"],
    }


def merge_dv(
    table: DeltaTable,
    source: DataFrame,
    keys: Sequence[str],
    when_matched_update: dict[str, str] | None = None,
    when_matched_delete: str | None = None,
    matched_condition: str | None = None,
    when_not_matched_insert: bool = True,
    vector_format: str = "roaring",
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> dict:
    """Merge-on-read MERGE — the DV sibling of :func:`merge`: rows the
    statement CHANGES (matched-update or matched-delete hits) have their
    positions recorded in deletion vectors, updated values and unmatched-
    source inserts append as new files, all in ONE atomic commit.  Matched
    rows no clause touches keep their bytes AND their positions — nothing
    is rewritten for them.

    Clause semantics match :func:`merge` (``t.``/``s.`` expression strings,
    delete wins over update, ``matched_condition`` gates the update,
    multi-source-row keys raise).  BY SOURCE clauses are copy-on-write
    territory — use :func:`merge`.

    Scale shape: where :func:`merge` rewrites every zone-map candidate
    file, this touches only a KB vector per file containing a changed row
    plus the appended values — the CDC-apply path for wide tables where
    each batch changes a sliver of many files.  Updated values come from
    the LIVE view (prior DV deletes are not resurrected); positions come
    from the raw positional scan (re-marking an already-deleted row is a
    sidecar-level no-op).

    ``txn_app_id``/``txn_version``: SetTransaction idempotence, exactly as
    :func:`merge` — an exactly-once foreachBatch CDC apply re-delivering a
    batch is a no-op BEFORE any compute or staging.

    Returns {"dv_files", "dv_marked_rows", "appended_rows", "version"}."""
    _require_mutable(table, "MERGE")
    keys = list(keys)
    state = table.state()
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version must be passed together")
    if txn_app_id is not None and state.txns.get(txn_app_id, -1) >= txn_version:
        return {
            "dv_files": 0,
            "dv_marked_rows": 0,
            "appended_rows": 0,
            "version": state.version,
            "skipped": True,
        }
    schema = state.metadata.schema
    update = dict(when_matched_update or {})
    src = source.select(*[F.col(f.name).cast(f.dataType) for f in schema.fields])
    dup = src.groupBy(*keys).count().where(F.col("count") > 1).limit(1).collect()
    if dup:
        dupkey = {k: dup[0][k] for k in keys}
        raise ValueError(f"MERGE source has multiple rows for key {dupkey}")

    def key_cond():
        cond = None
        for k in keys:
            c = F.col(f"t.{k}") == F.col(f"s.{k}")
            cond = c if cond is None else cond & c
        return cond

    delete_hit = (
        F.coalesce(F.expr(when_matched_delete), F.lit(False))
        if when_matched_delete
        else F.lit(False)
    )
    # No update clause -> matched rows are NOT a matched action: without
    # this, an insert-only merge would DV + re-append every matched row
    # unchanged — same data, but needless vector churn and spurious
    # delete+insert pairs in the change feed.
    if not update:
        update_hit = F.lit(False)
    elif matched_condition:
        update_hit = F.coalesce(F.expr(matched_condition), F.lit(False))
    else:
        update_hit = F.lit(True)

    # Zone-map prune once by the source's key bounds (same planner step as
    # copy-on-write merge/upsert): a file whose key interval is disjoint
    # from the source's can contain neither a matched row nor a key that
    # blocks an insert, so both the live view and the positional scan below
    # restrict to candidates — the CDC-apply batch touching one key range
    # of a 100 TB table scans that range only.
    bounds = _key_bounds(src, keys)
    cand_adds = [a for a in state.adds if _may_contain(a, bounds, schema)]

    # Values: live matched rows that the update clause rewrites + inserts.
    t_live = table.read_for_rewrite(cand_adds).alias("t")
    s = src.alias("s")
    matched_live = t_live.join(s, key_cond(), "inner")
    out_cols = []
    for f in schema.fields:
        out_cols.append(
            F.expr(update[f.name]).cast(f.dataType).alias(f.name)
            if f.name in update
            else F.col(f"t.{f.name}")
        )
    rt = table.row_tracking_enabled(state.metadata)
    if rt:
        # updated rows keep their ids (version nulls to the fresh Add's);
        # inserts get NULL ids -> fresh baseRowId+position at read time
        mat_id, mat_ver = table._materialized_row_cols(state.metadata)
        out_cols += [
            F.col(f"t.{mat_id}"), F.lit(None).cast("long").alias(mat_ver)
        ]
    upd_rows = matched_live.where(~delete_hit & update_hit).select(*out_cols)
    new_values = upd_rows
    if when_not_matched_insert:
        icols = [F.col(f.name) for f in schema.fields]
        if rt:
            icols += [
                F.lit(None).cast("long").alias(mat_id),
                F.lit(None).cast("long").alias(mat_ver),
            ]
        inserts = src.join(t_live.select(*keys), keys, "left_anti").select(*icols)
        new_values = new_values.unionByName(inserts)
    new_values = new_values.localCheckpoint(eager=True)
    n_appended = new_values.count()

    # Positions: raw scan rows whose source match triggers delete OR update.
    if cand_adds:
        scan = table.scan_with_positions(cand_adds)
        hits = (
            scan.select(
                *[F.col(f.name) for f in schema.fields],
                _rel_path_col(table).alias("__relp__"),
                F.col("__pos__"),
            )
            .alias("t")
            .join(s, key_cond())
            .where(delete_hit | update_hit)
            .select(F.col("__relp__").alias("path"), F.col("__pos__").alias("pos"))
        )
    else:
        # pure-insert batch (every source key beyond the table's zone maps):
        # no file can hold a matched row, so there is nothing to mark
        hits = local_df(table.spark, [], "path string, pos long")
    if n_appended:
        # CHECK constraints on the appended values (update outputs +
        # inserts; DV-marked removals cannot violate)
        table._enforce_constraints(
            new_values.select(*[f.name for f in schema.fields]),
            state.metadata.write_constraints,
        )
    insert_adds = (
        table.stage_write(
            new_values, data_change=True, schema=table.rewrite_schema()
        )
        if n_appended
        else None
    )
    cdc_frames = None
    if table.cdf_enabled(state.metadata):
        # clause rows straight off the live matched join: delete wins over
        # update, untouched matched rows emit nothing
        names_all = [f.name for f in schema.fields]
        tcols = [F.col(f"t.{f.name}").alias(f.name) for f in schema.fields]
        post_cols = out_cols[: len(schema.fields)]
        cdc_frames = [
            matched_live.where(delete_hit)
            .select(*tcols)
            .withColumn("_change_type", F.lit("delete")),
            matched_live.where(~delete_hit & update_hit)
            .select(*tcols)
            .withColumn("_change_type", F.lit("update_preimage")),
            matched_live.where(~delete_hit & update_hit)
            .select(*post_cols)
            .withColumn("_change_type", F.lit("update_postimage")),
        ]
        if when_not_matched_insert:
            cdc_frames.append(
                src.join(t_live.select(*keys), keys, "left_anti")
                .select(*names_all)
                .withColumn("_change_type", F.lit("insert"))
            )
    res = delete_where_dv(
        table,
        None,
        vector_format,
        _insert_adds=insert_adds,
        _operation="MERGE",
        _hits_df=hits,
        _cdc_frames=cdc_frames,
        _txn_app_id=txn_app_id,
        _txn_version=txn_version,
    )
    return {
        "dv_files": res["dv_files"],
        "dv_marked_rows": res["deleted_rows"],
        "appended_rows": n_appended,
        "version": res["version"],
    }


def _loose_stats(stats: dict | None) -> dict | None:
    """Stats to carry on a re-Add that attaches a deletion vector WITHOUT
    recomputing them.  Per the Delta protocol (Per-file Statistics /
    Deletion Vectors), a writer keeping a file's pre-delete stats must mark
    them ``"tightBounds": false`` — min/max remain valid BOUNDS over the
    surviving rows but are no longer tight, and ``numRecords`` stays the
    PHYSICAL row count of the parquet file.  Without the flag a stock
    reader's stats-only MIN/MAX answer could surface a deleted row's value."""
    if stats is None:
        return None
    return {**stats, "tightBounds": False}


def _dv_positions_parts(
    table: DeltaTable, adds, restrict: DataFrame | None = None
) -> list[DataFrame]:
    """(path, pos) DataFrames for every DV'd add, one part per storage kind:
    legacy parquet sidecar datasets stream distributed, legacy JSON sidecars
    (small by construction) load driver-side, protocol roaring bins decode
    executor-side via ``_roaring_positions_df``.

    ``restrict`` (a ``path``-column DataFrame) prunes the roaring decode to
    just those files BEFORE the mapInPandas stage — without it a one-row
    delete on a heavily-DV'd table would GET + decode every bitmap in the
    table only to discard most of them."""
    from delta_sorter_spark.sources.delta_table import _is_protocol_dv

    prev_parts: list[DataFrame] = []
    json_rows: list[tuple[str, int]] = []
    seen_sidecars: set[str] = set()
    roaring_prev: list[tuple[str, dict]] = []
    for a in adds:
        if not a.deletion_vector:
            continue
        if _is_protocol_dv(a.deletion_vector):
            roaring_prev.append((a.path, a.deletion_vector))
            continue
        sp = a.deletion_vector["storagePath"]
        sidecar = os.path.join(table.table_path, sp)
        if table.is_remote:
            fsobj = table.log.fs
            is_dataset = any(
                n.endswith(".parquet")
                for n in fsobj.list_dir(fsobj.join(table.table_path, sp))
            )
        else:
            is_dataset = os.path.isdir(sidecar)
        if is_dataset:
            if sp not in seen_sidecars:
                seen_sidecars.add(sp)
                prev_parts.append(
                    table.read_parquet_dataset(
                        sp, ["path", "pos"], "path string, pos long"
                    )
                )
        else:  # legacy JSON sidecar (single object; small by construction)
            json_rows += [(a.path, int(p)) for p in table.read_deletion_vector(a)]
    if json_rows:
        prev_parts.append(
            local_df(table.spark, json_rows, "path string, pos long")
        )
    if roaring_prev:
        prev_parts.append(table._roaring_positions_df(roaring_prev, restrict=restrict))
    return prev_parts


def migrate_deletion_vectors(table: DeltaTable) -> dict:
    """Convert every LEGACY deletion vector (parquet ``(path, pos)`` sidecar
    dataset or single-JSON map) to the STANDARD protocol encoding — one
    roaring ``deletion_vector_<uuid>.bin`` per file, storageType "u"
    descriptors, protocol upgraded to advertise the deletionVectors feature.

    Unlike ``purge_deletion_vectors`` this touches NO data files: the
    migration rewrites only the KB-scale vectors plus the log, so it is the
    cheap path to stock-reader interop for tables written by earlier
    versions of this engine.  Old sidecars become orphans for ``vacuum``.

    Returns {"migrated_files", "version"}."""
    from delta_sorter_spark.sources.delta_table import _is_protocol_dv

    state = table.state()
    legacy = [
        a
        for a in state.adds
        if a.deletion_vector and not _is_protocol_dv(a.deletion_vector)
    ]
    if not legacy:
        return {"migrated_files": 0, "version": state.version}
    parts = _dv_positions_parts(table, legacy)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    # sidecar datasets are shared across files: keep only THESE adds' rows
    legacy_paths = {a.path for a in legacy}
    merged = merged.where(
        F.col("path").isin(*legacy_paths) if legacy_paths else F.lit(False)
    ).distinct()
    dv_by_path = _write_roaring_vectors(table, merged)
    adds_by_path = {a.path: a for a in state.adds}
    new_adds, removes = [], []
    for rel, dv in dv_by_path.items():
        old = adds_by_path[rel]
        removes.append(old.remove_action(False))
        new_adds.append(
            AddAction(
                path=old.path,
                size=old.size,
                partition_values=old.partition_values,
                modification_time=old.modification_time,
                data_change=False,  # same logical rows, new vector encoding
                stats=_loose_stats(old.stats),
                deletion_vector=dv,
                base_row_id=old.base_row_id,
                default_row_commit_version=old.default_row_commit_version,
                tags=old.tags,
                clustering_provider=old.clustering_provider,
            )
        )
    version = table.commit_rewrite(
        new_adds,
        removes,
        operation="MIGRATE DV",
        extra_actions=_dv_protocol_upgrade(state),
    )
    return {"migrated_files": len(new_adds), "version": version}


def _dv_protocol_upgrade(state) -> list[dict] | None:
    """Protocol action(s) the first standard-DV commit must carry: a stock
    reader only honors deletion vectors when the table advertises the
    ``deletionVectors`` table feature (minReaderVersion 3 / minWriterVersion
    7).  Table-features protocols must list EVERY active feature, so the
    upgrade also declares whichever of columnMapping / checkConstraints /
    identityColumns / generatedColumns this table already uses.  Returns
    None when the feature is already declared (no-op commit payload)."""
    p = state.protocol or {}
    if "deletionVectors" in (p.get("readerFeatures") or []):
        return None
    cfg = state.metadata.configuration
    writer_feats = set(p.get("writerFeatures") or []) | {"deletionVectors"}
    reader_feats = set(p.get("readerFeatures") or []) | {"deletionVectors"}
    if cfg.get("delta.columnMapping.mode") in ("name", "id"):
        writer_feats.add("columnMapping")
        reader_feats.add("columnMapping")
    if any(k.startswith("delta.constraints.") for k in cfg):
        writer_feats.add("checkConstraints")
    # legacy writer-version features become explicit under table features:
    # a 3/7 protocol that drops them would stop stock writers enforcing them
    if str(cfg.get("delta.appendOnly", "")).lower() == "true":
        writer_feats.add("appendOnly")
    if str(cfg.get("delta.enableChangeDataFeed", "")).lower() == "true":
        writer_feats.add("changeDataFeed")
    for f in state.metadata.schema.fields:
        md = f.metadata or {}
        if any(k.startswith("delta.identity.") for k in md):
            writer_feats.add("identityColumns")
        if "delta.generationExpression" in md:
            writer_feats.add("generatedColumns")
        if "delta.invariants" in md:
            writer_feats.add("invariants")
    return [
        {
            "protocol": {
                "minReaderVersion": max(3, p.get("minReaderVersion", 1)),
                "minWriterVersion": max(7, p.get("minWriterVersion", 2)),
                "readerFeatures": sorted(reader_feats),
                "writerFeatures": sorted(writer_feats),
            }
        }
    ]


def _write_roaring_vectors(table: DeltaTable, merged: DataFrame) -> dict[str, dict]:
    """Write one standard ``deletion_vector_<uuid>.bin`` per touched data
    file from the executors (one applyInPandas group per file — a file's
    positions are bounded by its row count) and return
    {table-relative data path: protocol deletionVector descriptor}."""
    import json as _json

    from delta_sorter_spark.sources.fs import capture_aws_env

    table_path = table.table_path
    remote = table.is_remote
    aws_env = capture_aws_env() if remote else None

    def write_group(pdf):
        import json as _j
        import uuid as _u

        import pandas as pd

        from delta_sorter_spark.sources.roaring import (
            encode_dv_file,
            make_dv_descriptor,
            serialize_roaring_array,
        )

        rel = pdf["path"].iloc[0]
        positions = sorted({int(p) for p in pdf["pos"]})
        data = serialize_roaring_array(positions)
        fbytes, spans = encode_dv_file([data])
        u = _u.uuid4()
        name = f"deletion_vector_{u}.bin"
        if aws_env:
            from delta_sorter_spark.sources.fs import apply_aws_env

            apply_aws_env(aws_env)
        from delta_sorter_spark.sources.delta_table import write_dv_bytes

        write_dv_bytes(table_path, name, fbytes)
        desc = make_dv_descriptor(u.bytes, spans[0][0], spans[0][1], len(positions))
        return pd.DataFrame(
            [{"path": rel, "dv": _j.dumps(desc)}]
        )

    rows = (
        merged.groupBy("path")
        .applyInPandas(write_group, "path string, dv string")
        .collect()  # one row per touched FILE — O(files), not O(rows)
    )
    return {r["path"]: _json.loads(r["dv"]) for r in rows}


def purge_deletion_vectors(table: DeltaTable) -> dict:
    """Materialize all deletion vectors: rewrite each DV'd file without its
    deleted rows (fresh stats, no DV pointer).  The REORG TABLE ... APPLY
    (PURGE) operation; compaction achieves the same as a side effect since
    rewrites read through the DV-aware view."""
    state = table.state()
    dv_adds = [a for a in state.adds if a.deletion_vector]
    if not dv_adds:
        return {"purged_files": 0, "version": state.version}
    kept = table.to_df(adds=dv_adds)
    meta = table.metadata
    # stats keys are physical names; stage_write expects logical
    stat_cols = [
        meta.logical_of(c)
        for c in (dv_adds[0].stats or {}).get("minValues", {})
    ]
    adds = table.stage_write(kept, stat_columns=stat_cols, data_change=False)
    removes = [a.remove_action(False) for a in dv_adds]
    version = table.commit_rewrite(adds, removes, operation="REORG")
    return {"purged_files": len(dv_adds), "version": version}


def restore(table: DeltaTable, version: int) -> dict:
    """RESTORE TABLE ... TO VERSION AS OF — metadata-only commit that makes
    the active file set equal the target version's (files must still exist,
    i.e. not vacuumed).

    Returns {"added_files", "removed_files", "version"}."""
    _require_mutable(table, "RESTORE")
    target = table.state(version=version)
    current = table.state()
    # file-existence probe through the fs layer so RESTORE (metadata-only)
    # also works on remote table URIs
    tfs = table.log.fs
    missing = [
        a.path
        for a in target.adds
        if not tfs.exists(tfs.join(table.table_path, a.path))
    ]
    if missing:
        raise FileNotFoundError(
            f"cannot restore to version {version}: {len(missing)} data files "
            f"were vacuumed (e.g. {missing[0]})"
        )
    current_by_path = {a.path: a for a in current.adds}
    target_paths = {a.path for a in target.adds}
    # A path live in BOTH versions still needs re-adding when its deletion
    # vector differs (e.g. restoring past a merge-on-read DELETE): per the
    # protocol a new Add for the same path replaces the prior one in log
    # replay, which reinstates the target version's DV (or clears it).
    re_adds = [
        a
        for a in target.adds
        if a.path not in current_by_path
        or current_by_path[a.path].deletion_vector != a.deletion_vector
    ]
    removes = [a.remove_action(True) for a in current.adds if a.path not in target_paths]
    new_version = table.log.commit_with_retry(
        lambda state: removes + re_adds,
        operation="RESTORE",
        operation_params={"version": str(version)},
    )
    return {
        "added_files": len(re_adds),
        "removed_files": len(removes),
        "version": new_version,
    }


def table_changes(
    table: DeltaTable, from_version: int, to_version: int | None = None
) -> DataFrame:
    """Change data feed between versions (Delta CDF shape,
    ``table_changes(t, from, to)``): one row per changed row in every
    DATA-CHANGING commit of ``(from_version, to_version]``, tagged with
    ``_change_type`` and ``_commit_version``.

    Two fidelities, resolved per commit exactly as stock Delta readers do:

    - Commits carrying protocol ``cdc`` actions (the table had
      ``delta.enableChangeDataFeed`` set when the DML ran) feed their
      ``_change_data/`` files verbatim — true row-level CDC with all four
      change types ('insert' | 'delete' | 'update_preimage' |
      'update_postimage').
    - Every other data-changing commit is synthesized file-level: removed
      files' rows feed as deletes, written files' rows as inserts —
      coarser, but multiset-equivalent: applying (old - deletes + inserts)
      per version reproduces every snapshot, which is the property
      incremental consumers need.

    Compaction rewrites (dataChange=false) emit NOTHING — sorting history
    never re-feeds downstream, the same property operators/rollup.py
    relies on.

    O(changed files), not O(table): the log bounds which files are read.
    Raises if a referenced file was vacuumed (feed no longer derivable)."""
    log = table.log
    latest = log.latest_version()
    if to_version is None:
        to_version = latest
    if not 0 <= from_version <= to_version <= latest:
        raise ValueError(
            f"version range ({from_version}, {to_version}] outside [0, {latest}]"
        )
    meta = table.state(version=to_version).metadata
    spark = table.spark

    from delta_sorter_spark.sources.delta_log import physical_name

    def read_paths(paths: list[str], ctype: str, version: int) -> DataFrame:
        files = [os.path.join(table.table_path, p) for p in paths]
        missing = [f for f in files if not os.path.exists(f)]
        if missing:
            raise FileNotFoundError(
                f"change feed for version {version} needs vacuumed file(s), "
                f"e.g. {missing[0]}"
            )
        reader = spark.read
        if meta.partition_columns:
            reader = reader.option("basePath", table.table_path)
        # files (and partition dirs) carry PHYSICAL names (column mapping)
        df = reader.parquet(*files).select(
            *[
                F.col(physical_name(f)).cast(f.dataType).alias(f.name)
                for f in meta.schema.fields
            ]
        )
        return df.withColumn("_change_type", F.lit(ctype)).withColumn(
            "_commit_version", F.lit(version).cast("long")
        )

    def tag(df: DataFrame, ctype: str, version: int) -> DataFrame:
        return df.withColumn("_change_type", F.lit(ctype)).withColumn(
            "_commit_version", F.lit(version).cast("long")
        )

    from delta_sorter_spark.sources.delta_log import roll_adds

    out: DataFrame | None = None
    # one prior-state replay for the range, rolled forward per version
    # (not a fresh O(checkpoint) replay per version — the CDF planner
    # bottleneck at 10^6 files)
    prev = {a.path: a for a in table.state(version=from_version).adds}
    for v in range(from_version + 1, to_version + 1):
        adds: dict[str, dict] = {}
        removes: list[str] = []
        cdcs: list[str] = []
        for action in log.commit_actions(v):
            if "add" in action and action["add"].get("dataChange", True):
                adds[action["add"]["path"]] = action["add"]
            elif "remove" in action and action["remove"].get("dataChange", True):
                removes.append(action["remove"]["path"])
            elif "cdc" in action and action["cdc"].get("path"):
                cdcs.append(action["cdc"]["path"])
        if cdcs:
            # the writer materialized row-level change data (protocol
            # AddCDCFile, delta.enableChangeDataFeed): the cdc files ARE
            # this version's feed — full fidelity (update_preimage /
            # update_postimage), no file-level synthesis
            files = [os.path.join(table.table_path, p) for p in cdcs]
            missing = [f for f in files if not os.path.exists(f)]
            if missing:
                raise FileNotFoundError(
                    f"change feed for version {v} needs vacuumed cdc "
                    f"file(s), e.g. {missing[0]}"
                )
            reader = spark.read
            if meta.partition_columns:
                reader = reader.option(
                    "basePath", os.path.join(table.table_path, "_change_data")
                )
            df = (
                reader.parquet(*files)
                .select(
                    *[
                        F.col(physical_name(f)).cast(f.dataType).alias(f.name)
                        for f in meta.schema.fields
                    ],
                    F.col("_change_type"),
                )
                .withColumn("_commit_version", F.lit(v).cast("long"))
            )
            out = df if out is None else out.unionByName(df)
            roll_adds(log, prev, v)
            continue
        if not adds and not removes:
            roll_adds(log, prev, v)
            continue
        frames: list[DataFrame] = []
        # A same-path remove+add where the add carries a deletion vector is
        # a merge-on-read DELETE: feed only the NEWLY deleted positions.
        dv_delta = {
            p
            for p, a in adds.items()
            if a.get("deletionVector") and p in removes
        }
        for p in dv_delta:
            new_add = AddAction(
                path=p, size=0, deletion_vector=adds[p]["deletionVector"]
            )
            new_pos = table.read_deletion_vector(new_add)
            old_pos = table.read_deletion_vector(prev[p]) if p in prev else set()
            fresh = sorted(new_pos - old_pos)
            if fresh:
                rows = table.scan_with_positions([new_add], meta).where(
                    F.col("__pos__").isin(fresh)
                )
                frames.append(
                    tag(rows.select(*[f.name for f in meta.schema.fields]), "delete", v)
                )
        # Removed files feed as deletes THROUGH their prior deletion vector
        # (rows a DV already deleted were fed in the DV commit, not here).
        plain_removes = [p for p in removes if p not in dv_delta]
        if plain_removes:
            prior = [prev[p] for p in plain_removes if p in prev]
            dvd = [a for a in prior if a.deletion_vector]
            plain = [p for p in plain_removes if p not in {a.path for a in dvd}]
            if plain:
                frames.append(read_paths(plain, "delete", v))
            if dvd:
                frames.append(tag(table._read_dv_files(dvd, meta), "delete", v))
        plain_adds = [p for p in adds if p not in dv_delta]
        if plain_adds:
            frames.append(read_paths(plain_adds, "insert", v))
        for df in frames:
            out = df if out is None else out.unionByName(df)
        roll_adds(log, prev, v)
    if out is None:
        from pyspark.sql import types as T

        fields = list(meta.schema.fields) + [
            T.StructField("_change_type", T.StringType()),
            T.StructField("_commit_version", T.LongType()),
        ]
        return local_df(spark, [], T.StructType(fields))
    return out
