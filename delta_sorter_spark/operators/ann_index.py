"""Table-registered ANN (product-quantization) index lifecycle: build ->
serve -> incremental refresh -> drop, mirroring the Bloom index
(operators/bloom_index.py) so vector search gets the same
index-as-table-metadata treatment as point-lookup skipping.

Why this exists: :func:`ivf.pq_topk` trains + encodes per call — right for
exploration, wrong for production, where the corpus is encoded ONCE per
corpus version and every query batch pays only ADC lookups
(:func:`ivf.pq_serve`).  This module makes that index a durable part of the
Delta table: datasets under ``_ann_index/`` inside the table directory,
registered in table configuration (``deltasort.annIndex.<column>``),
vacuum-protected while registered, refreshed incrementally.

Index datasets (all parquet, written through the table's fs layer so the
same code serves local and object-store tables):

- ``codes``:      (path, id, [centroid,] code_0..code_{m-1}) — one row per
                  LIVE corpus row, carrying its origin data file so
                  maintenance is file-granular.  CODES-ONLY: the index
                  never stores embeddings, so its footprint is m small
                  ints per row (not dim×8 bytes) and the serving scan is
                  codes-width; exact cosine / rerank fetches original
                  vectors from the TABLE for the shortlist only
                  (:func:`_exact_rank` — queries × max(rerank, k) rows,
                  pruned to the shortlist's data files);
- ``codebooks``:  (m, centroid, cvec) — the frozen per-subspace codewords;
- ``files``:      (path, dv, gen) — the indexed snapshot's file list with
                  each file's deletion-vector digest and the GENERATION
                  whose codes are authoritative for it (see the
                  generational-layout block below).

Refresh semantics (O(changed files) data touched): a file is re-encoded
when its path is new OR its deletion-vector digest changed (DML
merge-on-read); codes for dropped paths (compaction, copy-on-write
rewrites) are discarded; unchanged files' codes carry forward — and because
:func:`ivf.pq_assign` replays the exact trainer argmin against the FROZEN
codebooks, a carried row and a re-encoded row are bit-identical.  Codebooks
are never retrained by refresh: retraining is a ``build`` (a new corpus
version), the same once-per-version discipline as the reference's sort
attestation (reference README.md:49-55 — maintenance must not silently
change what was attested).

Serving (:func:`ann_topk`) additionally SEMI-JOINS the codes against the
current snapshot's file list, so a stale index (post-compaction, pre-
refresh) degrades to reduced recall — never to duplicate, deleted, or
phantom rows.
"""

from __future__ import annotations

import json
import uuid as _uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_sorter_spark.operators.bloom_index import (
    _mark_building,
    _unmark_building,
)
from delta_sorter_spark.operators.ivf import pq_assign, pq_encode
from delta_sorter_spark.sources.delta_table import DeltaTable
from delta_sorter_spark.functions.localframe import local_df

ANN_PROP_PREFIX = "deltasort.annIndex."

_ID_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def ann_specs(table: DeltaTable, meta=None) -> dict[str, dict]:
    """column -> registered ANN index spec."""
    meta = meta if meta is not None else table.metadata
    out = {}
    for key, raw in (meta.configuration or {}).items():
        if not key.startswith(ANN_PROP_PREFIX):
            continue
        try:
            spec = json.loads(raw)
        except ValueError:
            continue
        if isinstance(spec, dict) and "path" in spec:
            out[key[len(ANN_PROP_PREFIX):]] = spec
    return out


def _dv_digest(add) -> str:
    dv = add.deletion_vector
    return json.dumps(dv, sort_keys=True) if dv else ""


def _codes_ddl(m: int, ivf: bool) -> str:
    cols = ", ".join(f"code_{j} int" for j in range(m))
    coarse = "centroid int, " if ivf else ""
    return f"path string, id bigint, {coarse}{cols}"


def _codes_cols(m: int, ivf: bool) -> list[str]:
    return (
        ["path", "id"]
        + (["centroid"] if ivf else [])
        + [f"code_{j}" for j in range(m)]
    )


# -- generational codes layout ----------------------------------------------
# The codes dataset is APPEND-FRIENDLY: the spec carries ``codes_parts``
# (a list of {"dir": <table-relative dataset dir>, "gen": n}) plus
# ``files_dir`` — the manifest (path, dv, gen) naming, per data file, the
# GENERATION whose codes are authoritative for it.  A refresh writes ONLY
# the re-encoded files' codes (a new part dir) and a new manifest; carried
# codes are never rewritten, so refresh IO is O(changed files) + O(files),
# independent of carried-code volume.  Readers union the parts and keep a
# code row only when its (path, gen) matches the manifest — superseded
# rows in old parts are dead weight on disk (reclaimed by
# :func:`compact_ann_index`) but never served.


def _spec_parts(spec: dict) -> list[dict]:
    if "codes_parts" in spec:  # may legitimately be [] (empty table)
        return [dict(p) for p in spec["codes_parts"]]
    # legacy single-part spec (pre-generational layout)
    return [{"dir": spec["path"] + "/codes", "gen": 0}]


def _read_manifest_rows(table: DeltaTable, spec: dict) -> list[tuple]:
    """[(path, dv, gen)] — file-count-sized planner read, never data-scale."""
    if "codes_parts" in spec:
        rows = table.read_parquet_dataset(
            spec["files_dir"], ["path", "dv", "gen"],
            "path string, dv string, gen int",
        ).collect()
        # drop the ("", "", -1) placeholder an empty-manifest write carries
        return [
            (r["path"], r["dv"], int(r["gen"])) for r in rows if r["path"]
        ]
    rows = table.read_parquet_dataset(
        spec["path"] + "/files", ["path", "dv"], "path string, dv string"
    ).collect()
    return [(r["path"], r["dv"], 0) for r in rows]


def _read_codes_union(
    table: DeltaTable,
    spec: dict,
    m: int,
    ivf: bool,
    probed_cents=None,
) -> DataFrame:
    """Union of every code part, each row tagged with its part's ``gen``.
    The probed-centroid membership filter is pushed into EVERY part's scan
    (each part keeps the centroid-major layout, so parquet stats prune
    non-probed files in old and new parts alike)."""
    isin = ("centroid", probed_cents) if probed_cents is not None else None
    out = None
    for part in _spec_parts(spec):
        df = table.read_parquet_dataset(
            part["dir"], _codes_cols(m, ivf), _codes_ddl(m, ivf), isin=isin
        ).withColumn("gen", F.lit(int(part["gen"])))
        out = df if out is None else out.unionByName(df)
    if out is None:  # an empty-table index has no parts at all
        out = local_df(table.spark, 
            [], _codes_ddl(m, ivf) + ", gen int"
        )
    return out


def ann_codes(table: DeltaTable, column: str, spec: dict | None = None) -> DataFrame:
    """The index's AUTHORITATIVE codes — one row per indexed corpus row:
    (path, id, [centroid,] code_0..code_{m-1}).  Unions the generational
    parts and keeps only rows whose (path, gen) the manifest names, i.e.
    exactly what serving ranks (before the live-snapshot semi-join)."""
    spec = spec or ann_specs(table).get(column)
    if spec is None:
        raise KeyError(f"no ann index on column {column!r}")
    m, ivf = int(spec["m"]), "n_centroids" in spec
    manifest = _read_manifest_rows(table, spec)
    auth = local_df(table.spark, 
        [(p, g) for p, _d, g in manifest] or [("", -1)], "path string, gen int"
    )
    return (
        _read_codes_union(table, spec, m, ivf)
        .join(F.broadcast(auth), ["path", "gen"], "left_semi")
        .drop("gen")
    )


def _rows_with_path(table: DeltaTable, adds, id_col: str, emb_col: str):
    """(path, id, emb) for the LIVE rows of the given files (deletion
    vectors applied by the scan)."""
    from delta_sorter_spark.operators.dml import _target_with_path

    return _target_with_path(table, list(adds)).select(
        F.col("__path__").alias("path"),
        F.col(id_col).cast("bigint").alias("__annid__"),
        F.col(emb_col).alias("__annemb__"),
    )


def _read_codebooks(table: DeltaTable, spec: dict) -> list[DataFrame]:
    cb = table.read_parquet_dataset(
        spec["path"] + "/codebooks",
        ["m", "centroid", "cvec"],
        "m int, centroid int, cvec array<double>",
    ).localCheckpoint(eager=True)
    return [
        cb.where(F.col("m") == j).select("centroid", "cvec")
        for j in range(int(spec["m"]))
    ]


def _write_datasets(
    table: DeltaTable,
    rel: str,
    codes: DataFrame,
    codebooks_union: DataFrame,
    files: DataFrame,
    n_files: int,
    coarse: DataFrame | None = None,
) -> None:
    _mark_building(table, rel)  # vacuum-protect until registered
    # part count scales with the table's file count (bounded, the bloom
    # _write_index discipline) — serving opens every part, so part count
    # is the read bill, not row count.  IVF indexes lay the codes out
    # CENTROID-major (range partition + sort): each part covers a disjoint
    # centroid interval, so the probed serve's pushed isin filter prunes
    # whole parts — "partition the codes dataset by centroid and a probe
    # prunes files too", made physical
    nparts = max(1, min(64, -(-n_files // 64)))
    # materialize the (codes-width) rows BEFORE the range exchange:
    # repartitionByRange's sampling pass executes its child once and the
    # shuffle re-executes it, so an un-checkpointed layout ran the whole
    # encode pipeline TWICE (guide §1.2); the checkpoint holds m ints +
    # path per row — the narrow proxy, never the embeddings
    codes = codes.localCheckpoint(eager=True)
    if coarse is not None:
        # enough parts that each covers ~a few inverted lists — file-level
        # pruning needs file boundaries to prune at; row-group sorting
        # handles the remainder inside a part
        nparts = max(nparts, min(64, coarse.count()))
        layout = codes.repartitionByRange(
            nparts, "centroid", "id"
        ).sortWithinPartitions("centroid", "id")
    else:
        layout = codes.repartitionByRange(
            nparts, "path"
        ).sortWithinPartitions("path", "id")
    table.write_parquet_dataset(layout, rel + "/codes")
    table.write_parquet_dataset(codebooks_union.coalesce(1), rel + "/codebooks")
    table.write_parquet_dataset(files.coalesce(1), rel + "/files")
    if coarse is not None:
        table.write_parquet_dataset(
            coarse.select("centroid", "cvec").coalesce(1), rel + "/coarse"
        )


def _read_coarse(table: DeltaTable, spec: dict) -> DataFrame:
    return table.read_parquet_dataset(
        spec["path"] + "/coarse",
        ["centroid", "cvec"],
        "centroid int, cvec array<double>",
    ).localCheckpoint(eager=True)


def _residualize(
    normed: DataFrame, coarse: DataFrame, extra_cols: tuple = ()
) -> DataFrame:
    """(__annid__, centroid, __orig__, __res__): assign each normalized
    vector to its coarse list and subtract that centroid — the residual
    the PQ codebooks see under ``residual=True``.  ``extra_cols`` (e.g.
    ``path``) pass through unchanged."""
    from delta_sorter_spark.operators.ivf import _assign

    return (
        _assign(normed, coarse, "__annemb__")
        .join(F.broadcast(coarse), "centroid")
        .select(
            "__annid__", "centroid",
            F.col("__annemb__").alias("__orig__"),
            F.expr(
                "zip_with(__annemb__, cvec, (x, y) -> CAST(x AS DOUBLE) - y)"
            ).alias("__res__"),
            *[F.col(c) for c in extra_cols],
        )
    )


def _register(table: DeltaTable, column: str, spec: dict, op: str) -> int:
    version = table.set_table_properties(
        {ANN_PROP_PREFIX + column: json.dumps(spec)}, operation=op
    )
    _unmark_building(table, spec["path"])
    return version


def build_ann_index(
    table: DeltaTable,
    column: str,
    id_col: str,
    dim: int,
    m: int = 2,
    n_codes: int = 8,
    n_iters: int = 2,
    normalize: bool = True,
    n_centroids: int | None = None,
    residual: bool = False,
) -> dict:
    """Train codebooks over the CURRENT snapshot, encode every live row,
    persist the datasets and register the spec — one metadata commit.
    Building again retrains (a new corpus version); the replaced dataset
    becomes vacuum-able.  Returns {"column", "rows", "files", "dataset",
    "version"}.

    ``n_centroids`` upgrades the index to IVF-PQ: a coarse quantizer is
    trained alongside the codebooks, every code row carries its inverted-
    list id, and :func:`ann_topk` with ``n_probes`` scans only the probed
    lists — |corpus| × probes / n_centroids candidates in expectation,
    the 100 TB serving shape (partition the codes dataset by centroid and
    a probe prunes files too).  ``residual=True`` (needs ``n_centroids``)
    trains and encodes on ``x - coarse_centroid(x)`` — the classic Jégou
    form (ivf.ivfpq_residual_topk); serving then REQUIRES ``n_probes``
    (residual codes have no meaning without their list's centroid)."""
    state = table.state()
    meta = state.metadata
    for c in (column, id_col):
        if c not in meta.schema.names:
            raise ValueError(f"build_ann_index: unknown column {c!r}")
    if not isinstance(meta.schema[id_col].dataType, _ID_TYPES):
        raise ValueError(
            f"build_ann_index: id column must be integral (got "
            f"{meta.schema[id_col].dataType.simpleString()})"
        )
    if not state.adds:
        raise ValueError(
            "build_ann_index: empty table — codebooks need corpus rows"
        )
    if residual and n_centroids is None:
        raise ValueError("build_ann_index: residual=True needs n_centroids")
    rows = _rows_with_path(table, state.adds, id_col, column)
    rows = rows.localCheckpoint(eager=True)  # one scan feeds train + paths
    coarse = None
    winner_vecs = None
    if n_centroids is not None:
        from delta_sorter_spark.operators.ivf import (
            _assign,
            _kmeans_train,
            _normalize_expr,
            _residual_winner_vecs,
        )

        normed = rows.select(
            F.col("__annid__"),
            F.expr(
                _normalize_expr("__annemb__") if normalize else "__annemb__"
            ).alias("__annemb__"),
            F.col("path"),
        )
        # driver-side Lloyd state makes `coarse` a LOCAL Arrow frame — no
        # localCheckpoint (pinning driver-local data cost a pointless
        # Spark job); the seeding collect is reused for the PQ codebook
        # seeds (same ids, same hash order — one fewer corpus job,
        # guide §1.2), with the residual path computing the winners'
        # residuals driver-side via the exact _assign fold
        cents, winners = _kmeans_train(
            normed, "__annemb__", dim, int(n_centroids), n_iters,
            id_col="__annid__",
        )
        coarse = local_df(
            rows.sparkSession, cents, "centroid int, cvec array<double>"
        )
        winner_vecs = (
            _residual_winner_vecs(winners, cents)
            if residual
            else [v for _sid, v in winners]
        )
    # `path` (and `centroid` for residual) ride the encode map-side via
    # extra_cols — no id-keyed re-attach join of the corpus (guide §8)
    if residual:
        # codes quantize x - coarse_centroid(x); the inverted-list id rides
        # along, the ORIGINAL vector does NOT — exact cosine re-reads the
        # table for the serve shortlist (_exact_rank)
        res = _residualize(normed, coarse, extra_cols=("path",)).localCheckpoint(
            eager=True
        )
        codes, codebooks = pq_encode(
            res, "__annid__", "__res__", dim, m, n_codes, n_iters,
            normalize=False, extra_cols=("centroid", "path"),
            winner_vecs=winner_vecs,
        )
        codes = codes.drop("__cemb__")
    else:
        codes, codebooks = pq_encode(
            rows, "__annid__", "__annemb__", dim, m, n_codes, n_iters,
            normalize, extra_cols=("path",), winner_vecs=winner_vecs,
        )
        if coarse is not None:
            # inverted-list id per code row (codes' __cemb__ is the same
            # normalized vector the coarse quantizer trained on)
            codes = _assign(codes, coarse, "__cemb__")
        codes = codes.drop("__cemb__")
    cb_union = None
    for j, cb in enumerate(codebooks):
        part = cb.select(F.lit(j).alias("m"), "centroid", "cvec")
        cb_union = part if cb_union is None else cb_union.unionByName(part)
    files = local_df(table.spark, 
        [(a.path, _dv_digest(a), 0) for a in state.adds],
        "path string, dv string, gen int",
    )
    rel = f"_ann_index/{column}/{_uuid.uuid4().hex}"
    _write_datasets(
        table, rel, codes, cb_union, files, len(state.adds), coarse=coarse
    )
    # count from the written dataset — recounting `codes` would re-run the
    # whole encode pipeline as a second job
    n_rows = table.read_parquet_dataset(
        rel + "/codes", ["id"], "id bigint"
    ).count()
    spec = {
        "path": rel,
        "version": state.version,
        "id_col": id_col,
        "dim": int(dim),
        "m": int(m),
        "n_codes": int(n_codes),
        "normalize": bool(normalize),
        "codes_parts": [{"dir": rel + "/codes", "gen": 0}],
        "files_dir": rel + "/files",
    }
    if n_centroids is not None:
        spec["n_centroids"] = int(n_centroids)
    if residual:
        spec["residual"] = True
    version = _register(table, column, spec, "CREATE ANN INDEX")
    return {
        "column": column,
        "rows": int(n_rows),
        "files": len(state.adds),
        "dataset": rel,
        "version": version,
    }


def _encode_adds(table, spec, column, adds, codebooks, coarse):
    """Encode the given files' live rows against the FROZEN codebooks (and
    frozen coarse quantizer for IVF): pq_assign replays the exact trainer
    argmin, so these rows are bit-identical to a build-time encode."""
    m, dim = int(spec["m"]), int(spec["dim"])
    ivf = "n_centroids" in spec
    residual = bool(spec.get("residual"))
    id_col, normalize = spec["id_col"], bool(spec["normalize"])
    rows = _rows_with_path(table, adds, id_col, column)
    # `path` (and `centroid` for residual) ride the encode map-side via
    # extra_cols — no id-keyed re-attach join (guide §8)
    if residual:
        from delta_sorter_spark.operators.ivf import _normalize_expr

        normed = rows.select(
            "__annid__",
            F.expr(
                _normalize_expr("__annemb__") if normalize else "__annemb__"
            ).alias("__annemb__"),
            F.col("path"),
        )
        res = _residualize(normed, coarse, extra_cols=("path",))
        fresh = pq_assign(
            res, "__annid__", "__res__", codebooks, dim, normalize=False,
            extra_cols=("centroid", "path"),
        ).drop("__cemb__")
    else:
        fresh = pq_assign(
            rows, "__annid__", "__annemb__", codebooks, dim, normalize,
            extra_cols=("path",),
        )
        if ivf:
            from delta_sorter_spark.operators.ivf import _assign

            # frozen coarse quantizer: re-encoded rows land in the same
            # inverted list they would have at build time
            fresh = _assign(fresh, coarse, "__cemb__")
        fresh = fresh.drop("__cemb__")
    return fresh.select(*_codes_cols(m, ivf))


def _write_codes_part(table, rel_dir, codes, n_files, coarse):
    """One generational codes part, laid out like _write_datasets' codes."""
    nparts = max(1, min(64, -(-n_files // 64)))
    # same single-pass discipline as _write_datasets: don't let the range
    # sampling re-run the re-encode of the changed files
    codes = codes.localCheckpoint(eager=True)
    if coarse is not None:
        nparts = max(nparts, min(64, coarse.count()))
        layout = codes.repartitionByRange(
            nparts, "centroid", "id"
        ).sortWithinPartitions("centroid", "id")
    else:
        layout = codes.repartitionByRange(
            nparts, "path"
        ).sortWithinPartitions("path", "id")
    table.write_parquet_dataset(layout, rel_dir)


def refresh_ann_index(table: DeltaTable, column: str) -> dict:
    """Catch the index up with the current snapshot — O(new) in BOTH
    compute and IO: files whose path is new or whose deletion vector
    changed are re-encoded (against the FROZEN codebooks) and written as a
    NEW generational codes part; carried codes are never rewritten — the
    refresh writes only the fresh part plus a new (file-count-sized)
    manifest naming each file's authoritative generation.  Codes of
    dropped/superseded files become dead rows in their old parts (never
    served — the manifest excludes them; reclaimed by
    :func:`compact_ann_index`).  A no-change snapshot short-circuits
    without a commit.  Returns {"column", "reencoded_files" (new paths
    PLUS files whose deletion vector changed), "dropped_files",
    "carried_files", "dataset", "version"}."""
    state = table.state()  # ONE snapshot: spec and file list stay coherent
    spec = ann_specs(table, state.metadata).get(column)
    if spec is None:
        raise KeyError(
            f"no ann index on column {column!r} — build_ann_index first"
        )
    current = {a.path: _dv_digest(a) for a in state.adds}
    manifest = _read_manifest_rows(table, spec)
    indexed = {p: (d, g) for p, d, g in manifest}
    changed = {
        p for p, d in current.items()
        if p not in indexed or indexed[p][0] != d
    }
    dropped = set(indexed) - set(current)
    if not changed and not dropped:
        return {
            "column": column,
            "reencoded_files": 0,
            "dropped_files": 0,
            "carried_files": len(indexed),
            "dataset": spec["path"],
            "version": state.version,
        }
    parts = _spec_parts(spec)
    new_gen = max((p["gen"] for p in parts), default=-1) + 1
    ivf = "n_centroids" in spec
    coarse = _read_coarse(table, spec) if ivf else None
    # fresh part + manifest live in their own uuid dir: unreferenced on a
    # lost registration race, vacuum-able like any losing dataset
    rel = f"_ann_index/{column}/{_uuid.uuid4().hex}"
    _mark_building(table, rel)  # vacuum-protect until registered
    changed_adds = [a for a in state.adds if a.path in changed]
    if changed_adds:
        codebooks = _read_codebooks(table, spec)
        fresh = _encode_adds(table, spec, column, changed_adds, codebooks, coarse)
        _write_codes_part(
            table, rel + "/codes", fresh, len(changed_adds), coarse
        )
        parts.append({"dir": rel + "/codes", "gen": new_gen})
    files_rows = [
        (p, d, new_gen if p in changed else indexed[p][1])
        for p, d in current.items()
    ]
    files = local_df(table.spark, 
        files_rows or [("", "", -1)], "path string, dv string, gen int"
    )
    table.write_parquet_dataset(files.coalesce(1), rel + "/files")
    # prune parts no manifest row references (fully superseded): readers
    # stop opening them and — no longer in the registered spec — they
    # become vacuum-able
    used_gens = {g for _p, _d, g in files_rows}
    parts = [p for p in parts if p["gen"] in used_gens]
    new_spec = dict(
        spec,
        codes_parts=parts,
        files_dir=rel + "/files",
        version=state.version,
    )
    version = _register(table, column, new_spec, "REFRESH ANN INDEX")
    _unmark_building(table, rel)
    return {
        "column": column,
        "reencoded_files": len(changed),
        "dropped_files": len(dropped),
        "carried_files": len(set(current) - changed),
        "dataset": spec["path"],
        "version": version,
    }


def compact_ann_index(table: DeltaTable, column: str) -> dict:
    """Consolidate the generational code parts into a fresh single-part
    dataset (new base dir, frozen codebooks/coarse copied verbatim) and
    register it — the old base and every superseded part become
    vacuum-able.  This is the reclamation half of the O(new) refresh
    design: refresh appends parts cheaply, compaction (run occasionally,
    like data-file compaction) pays the one O(index) rewrite.  Returns
    {"column", "parts_in", "rows", "dataset", "version"}."""
    state = table.state()
    spec = ann_specs(table, state.metadata).get(column)
    if spec is None:
        raise KeyError(
            f"no ann index on column {column!r} — build_ann_index first"
        )
    parts_in = len(_spec_parts(spec))
    ivf = "n_centroids" in spec
    coarse = _read_coarse(table, spec) if ivf else None
    codes = ann_codes(table, column, spec)
    cb = table.read_parquet_dataset(
        spec["path"] + "/codebooks",
        ["m", "centroid", "cvec"],
        "m int, centroid int, cvec array<double>",
    )
    manifest = _read_manifest_rows(table, spec)
    files = local_df(table.spark, 
        [(p, d, 0) for p, d, _g in manifest] or [("", "", -1)],
        "path string, dv string, gen int",
    )
    rel = f"_ann_index/{column}/{_uuid.uuid4().hex}"
    _write_datasets(
        table, rel, codes, cb, files, max(1, len(manifest)), coarse=coarse
    )
    n_rows = table.read_parquet_dataset(
        rel + "/codes", ["id"], "id bigint"
    ).count()
    new_spec = dict(
        spec,
        path=rel,
        codes_parts=[{"dir": rel + "/codes", "gen": 0}],
        files_dir=rel + "/files",
        version=state.version,
    )
    version = _register(table, column, new_spec, "COMPACT ANN INDEX")
    return {
        "column": column,
        "parts_in": parts_in,
        "rows": int(n_rows),
        "dataset": rel,
        "version": version,
    }


def drop_ann_index(table: DeltaTable, column: str) -> int:
    """Unregister ``column``'s index (the datasets become vacuum-able)."""
    if column not in ann_specs(table):
        raise KeyError(f"no ann index on column {column!r}")
    return table.set_table_properties(
        {ANN_PROP_PREFIX + column: None}, operation="DROP ANN INDEX"
    )


def ann_topk(
    table: DeltaTable,
    queries: DataFrame,
    query_id_col: str,
    query_emb_col: str,
    column: str,
    k: int = 5,
    rerank: int | None = None,
    n_probes: int | None = None,
) -> DataFrame:
    """Serve top-k from the registered index: corpus never re-encoded, only
    ADC tables + lookups run.  Codes are semi-joined against the CURRENT
    snapshot's files first, so a stale index degrades to reduced recall,
    never to rows the table no longer holds.

    CODES-WIDTH SERVING: the candidate scan reads (path, id, [centroid],
    code_0..m) — m small ints per row, never an embedding — and ranks by
    pure ADC; the exact cosine (and the optional ``rerank`` reorder) then
    fetches ORIGINAL vectors from the table for the shortlist only
    (queries × max(rerank, k) rows), scanning just the data files those
    rows live in (:func:`_exact_rank`).  Same normalization expression as
    build time, so the cosine is bit-identical to scoring against a
    stored vector.  At 100 TB that makes the index m bytes/row and the
    per-batch I/O |candidates| × m + |shortlist| × dim, instead of
    |candidates| × dim×8.

    On an IVF-PQ index (built with ``n_centroids``), pass ``n_probes`` to
    scan only each query's nearest inverted lists — the broadcast NLJ of
    flat ADC becomes a centroid EQUI-join over |corpus| × probes /
    n_centroids expected candidates.  ``n_probes=None`` serves flat even
    on an IVF index (exhaustive ADC — the recall ceiling)."""
    state = table.state()  # ONE snapshot: spec and live-path set coherent
    spec = ann_specs(table, state.metadata).get(column)
    if spec is None:
        raise KeyError(
            f"no ann index on column {column!r} — build_ann_index first"
        )
    m = int(spec["m"])
    ivf = "n_centroids" in spec
    residual = bool(spec.get("residual"))
    if n_probes is not None and not ivf:
        raise ValueError(
            "ann_topk: n_probes needs an IVF index — rebuild with "
            "n_centroids"
        )
    if residual and n_probes is None:
        raise ValueError(
            "ann_topk: a residual index serves by probe only — residual "
            "codes are meaningless without their list's centroid; pass "
            "n_probes"
        )
    # one broadcast frame folds BOTH serving filters: the manifest's
    # (path, gen) picks each file's authoritative generational part, and
    # the intersection with the live snapshot's paths drops files the
    # table no longer holds (stale index -> reduced recall, never
    # phantoms).  O(files) driver-side, the standard planner size.
    live = {a.path for a in state.adds}
    auth_rows = [
        (p, g) for p, _d, g in _read_manifest_rows(table, spec) if p in live
    ]
    auth = local_df(table.spark, 
        auth_rows or [("", -1)], "path string, gen int"
    )

    def _codes(probed_cents=None):
        # keep `path` through ranking: the exact-cosine fetch prunes the
        # table scan to the shortlist's data files.  With probed centroids
        # the membership filter is PUSHED into every part's parquet scan —
        # the centroid-major layout means non-probed files are skipped on
        # stats, the file-pruning half of the IVF story
        c = _read_codes_union(table, spec, m, ivf, probed_cents)
        return c.join(F.broadcast(auth), ["path", "gen"], "left_semi").drop(
            "gen"
        )

    codebooks = _read_codebooks(table, spec)
    dim, normalize = int(spec["dim"]), bool(spec["normalize"])
    from delta_sorter_spark.operators.ivf import (
        _assign,
        _normalize_expr,
        adc_query_tables,
        adc_shortlist,
    )

    if n_probes is None:
        codes = _codes()
        if ivf:
            codes = codes.drop("centroid")
        q = adc_query_tables(
            queries, query_id_col, query_emb_col, codebooks, dim, normalize
        )
        short = adc_shortlist(codes.crossJoin(F.broadcast(q)), m, k, rerank)
        return _exact_rank(table, state, spec, column, short, k, rerank)

    # probe assignment, then the SAME ADC tables + ranking tail as the flat
    # path (ivf.pq_serve) — only the candidate join differs: centroid
    # equi-join over the probed lists instead of the broadcast cross join
    coarse = _read_coarse(table, spec)
    if residual:
        # per-probe tables from THAT probe's residual q - centroid; exact
        # cosine from the original query vector (ivfpq_residual_topk shape)
        q_expr = (
            _normalize_expr(query_emb_col) if normalize else query_emb_col
        )
        probed = (
            _assign(
                queries.select(
                    F.col(query_id_col).alias("query_id"),
                    F.expr(q_expr).alias("__qorig__"),
                ),
                coarse,
                "__qorig__",
                n_best=int(n_probes),
            )
            .join(F.broadcast(coarse), "centroid")
            .select(
                "query_id", "centroid", "__qorig__",
                F.expr(
                    "zip_with(__qorig__, cvec,"
                    " (x, y) -> CAST(x AS DOUBLE) - y)"
                ).alias("__qres__"),
            )
        )
        q = adc_query_tables(
            probed, "query_id", "__qres__", codebooks, dim, normalize=False,
            extra_cols=("centroid", "__qorig__"),
        )
        q = q.drop("__qemb__").withColumnRenamed("__qorig__", "__qemb__")
    else:
        q = adc_query_tables(
            queries, query_id_col, query_emb_col, codebooks, dim, normalize
        )
        q = _assign(q, coarse, "__qemb__", n_best=int(n_probes))
    # materialize the (tiny: queries × probes) query frame once, read the
    # probed list ids off it, and push them into the codes scan
    q = q.localCheckpoint(eager=True)
    cents = sorted(
        r["centroid"] for r in q.select("centroid").distinct().collect()
    )
    short = adc_shortlist(_codes(cents).join(q, "centroid"), m, k, rerank)
    return _exact_rank(table, state, spec, column, short, k, rerank)


def _exact_rank(
    table: DeltaTable,
    state,
    spec: dict,
    column: str,
    shortlist: DataFrame,
    k: int,
    rerank: int | None,
) -> DataFrame:
    """Attach the exact cosine to an ADC shortlist and produce the final
    (query_id, id, rank, approx_d, cosine) — the dim-wide half of serving,
    paid only for queries × max(rerank, k) rows.

    The shortlist (tiny) is checkpointed, its distinct ``path`` set read
    driver-side, and original vectors scanned from ONLY those data files
    (deletion vectors applied — a row DV-deleted after the last refresh
    silently drops here, the same no-phantom guarantee as the path
    semi-join).  Normalization replays build's ``_normalize_expr`` on the
    raw column, so cosine values are bit-identical to the stored-vector
    design this replaces."""
    from pyspark.sql import Window
    from delta_sorter_spark.operators.ivf import _normalize_expr
    from delta_sorter_spark.operators.similarity import cosine_expr

    shortlist = shortlist.select(
        "query_id", "id", "path", "approx_d", "__qemb__"
    ).localCheckpoint(eager=True)
    paths = {r["path"] for r in shortlist.select("path").distinct().collect()}
    adds = [a for a in state.adds if a.path in paths]
    if not adds:
        return shortlist.limit(0).select(
            "query_id", "id", F.lit(None).cast("int").alias("rank"),
            "approx_d", F.lit(None).cast("double").alias("cosine"),
        )
    rows = _rows_with_path(table, adds, spec["id_col"], column)
    emb = (
        F.expr(_normalize_expr("__annemb__"))
        if bool(spec["normalize"]) else F.col("__annemb__")
    )
    fetched = rows.select(
        "path", F.col("__annid__").alias("id"), emb.alias("__cemb__")
    )
    pairs = fetched.join(F.broadcast(shortlist), ["path", "id"]).withColumn(
        "cosine", cosine_expr("__qemb__", "__cemb__")
    )
    order = (
        [F.asc("approx_d"), F.asc("id")] if rerank is None
        else [F.desc("cosine"), F.asc("id")]
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "id", "rank", "approx_d", "cosine")
    )


def ann_status(
    table: DeltaTable, column: str, counts: bool = True
) -> dict:
    """Operational snapshot of ``column``'s registered index — the
    cluster_status twin for ANN maintenance scheduling: how generational
    the codes have become (parts), how stale vs the live snapshot
    (unindexed/changed/dropped files), and whether a compaction is worth
    scheduling.

    With ``counts=True`` (default) this is index-scale work, NOT
    metadata-only: beyond the O(files) manifest read it counts every code
    part (a union + broadcast semi-join over the full index codes —
    m bytes/row, never the dim-wide table) — schedule it at a maintenance
    cadence, not per-query.  ``counts=False`` is the planner-scale probe
    (log state + the file-count-sized manifest read, no codes scan):
    row/dead-row fields come back None and ``recommend_compaction`` uses
    the part count alone — cheap enough for a per-batch freshness gate.

    Returns {"column", "kind", "rows", "parts" (count),
    "part_rows" [{gen, rows}], "dead_rows" (superseded code rows still on
    disk — what compact_ann_index reclaims), "indexed_files",
    "live_files", "stale_files" (new or DV-changed since last refresh),
    "dropped_files", "recommend_compaction" (dead rows exceed live rows
    OR more than 8 parts)}."""
    state = table.state()
    spec = ann_specs(table, state.metadata).get(column)
    if spec is None:
        raise KeyError(f"no ann index on column {column!r}")
    m, ivf = int(spec["m"]), "n_centroids" in spec
    manifest = _read_manifest_rows(table, spec)
    indexed = {p: (d, g) for p, d, g in manifest}
    current = {a.path: _dv_digest(a) for a in state.adds}
    stale = sum(
        1 for p, d in current.items()
        if p not in indexed or indexed[p][0] != d
    )
    dropped = len(set(indexed) - set(current))
    parts = _spec_parts(spec)
    kind = (
        "residual-ivf-pq" if spec.get("residual")
        else ("ivf-pq" if ivf else "pq")
    )
    if not counts:
        return {
            "column": column,
            "kind": kind,
            "rows": None,
            "parts": len(parts),
            "part_rows": None,
            "dead_rows": None,
            "indexed_files": len(indexed),
            "live_files": len(current),
            "stale_files": int(stale),
            "dropped_files": int(dropped),
            "recommend_compaction": len(parts) > 8,
        }
    part_rows = []
    total = 0
    for part in parts:
        n = table.read_parquet_dataset(
            part["dir"], ["id"], "id bigint"
        ).count()
        part_rows.append({"gen": int(part["gen"]), "rows": int(n)})
        total += int(n)
    auth = ann_codes(table, column, spec).count()
    dead = total - int(auth)
    return {
        "column": column,
        "kind": kind,
        "rows": int(auth),
        "parts": len(parts),
        "part_rows": part_rows,
        "dead_rows": int(dead),
        "indexed_files": len(indexed),
        "live_files": len(current),
        "stale_files": int(stale),
        "dropped_files": int(dropped),
        "recommend_compaction": bool(dead > auth or len(parts) > 8),
    }
