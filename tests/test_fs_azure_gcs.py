"""azure:// and gs:// FileSystem backends (reference enables s3+azure+gcs,
crates/sorter-core/Cargo.toml:15).

The backends speak the services' plain REST/XML protocols through urllib, so
these tests run them against in-process emulator servers that enforce the
REAL conditional-create semantics:

- Azure Blob: ``Put Blob`` with ``If-None-Match: *`` -> 409 BlobAlreadyExists
  for the losing writer (plus the ``x-ms-blob-type`` header requirement);
- GCS XML API: PUT with ``x-goog-if-generation-match: 0`` -> 412.

Contract coverage reuses the same log-lifecycle exerciser the s3/memory
backends run (create / commit / conflict / checkpoint / time travel), plus
an end-to-end strict compact + remote validate through Spark executors
against the emulator (the data plane writes parquet objects over HTTP from
the python workers)."""

from __future__ import annotations

import threading
from email.utils import formatdate
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

import pytest

from delta_sorter_spark.sources.fs import (
    AzureBlobFileSystem,
    GcsFileSystem,
    resolve,
)

from test_fs_objectstore import _exercise_log


class _Store:
    """Shared bucket state: key -> (bytes, mtime-epoch)."""

    def __init__(self):
        self.objects: dict[str, tuple[bytes, float]] = {}
        self.lock = threading.Lock()


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


class _FakeObjectStoreHandler(BaseHTTPRequestHandler):
    """Common GET/HEAD/PUT/DELETE + list plumbing; subclasses differ in the
    conditional-create header they enforce and the list XML they emit."""

    store: _Store
    flavor = ""

    def log_message(self, *args):  # quiet
        pass

    def _key(self) -> str:
        return unquote(urlparse(self.path).path.lstrip("/"))

    def _send(self, code: int, body: bytes = b"", headers: dict | None = None):
        self.send_response(code)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(body)

    def do_GET(self):
        parsed = urlparse(self.path)
        q = parse_qs(parsed.query)
        key = self._key()
        if "/" not in key or "comp" in q or ("prefix" in q and "/" not in key):
            # container-level list: /bucket?...  (azure: restype&comp=list)
            return self._list(key.split("/", 1)[0], q)
        with self.store.lock:
            entry = self.store.objects.get(key)
        if entry is None:
            return self._send(404)
        self._send(200, entry[0])

    def do_HEAD(self):
        key = self._key()
        with self.store.lock:
            entry = self.store.objects.get(key)
        if entry is None:
            return self._send(404)
        self._send(200, entry[0])

    def do_DELETE(self):
        key = self._key()
        with self.store.lock:
            existed = self.store.objects.pop(key, None)
        self._send(202 if existed else 404)

    def do_PUT(self):
        import time as _time

        key = self._key()
        length = int(self.headers.get("Content-Length", 0))
        data = self.rfile.read(length)
        conditional = self._is_conditional_create()
        if self.flavor == "azure" and not self.headers.get("x-ms-blob-type"):
            return self._send(400, b"x-ms-blob-type required")
        with self.store.lock:
            if conditional and key in self.store.objects:
                return self._send(409 if self.flavor == "azure" else 412)
            self.store.objects[key] = (data, _time.time())
        self._send(201)

    def _is_conditional_create(self) -> bool:
        if self.flavor == "azure":
            return self.headers.get("If-None-Match") == "*"
        return self.headers.get("x-goog-if-generation-match") == "0"

    # GCS fake paginates delimiter-less listings (3 keys/page) the way the
    # real V1-style XML API does: IsTruncated=true with NO NextMarker — the
    # client must continue from the last key it saw.  Regression surface for
    # >1000-object tables (vacuum/delete_dataset completeness).
    GCS_PAGE = 3

    def _list(self, bucket: str, q: dict):
        prefix = q.get("prefix", [""])[0]
        delimiter = q.get("delimiter", [None])[0]
        marker = q.get("marker", [None])[0]
        full_prefix = f"{bucket}/{prefix}"
        with self.store.lock:
            matching = sorted(
                (k[len(bucket) + 1:], m)
                for k, (_, m) in self.store.objects.items()
                if k.startswith(full_prefix)
            )
        keys, prefixes = [], []
        seen = set()
        for rel, mtime in matching:
            if delimiter:
                tail = rel[len(prefix):]
                if delimiter in tail:
                    p = prefix + tail.split(delimiter, 1)[0] + delimiter
                    if p not in seen:
                        seen.add(p)
                        prefixes.append(p)
                    continue
            keys.append((rel, mtime))
        truncated = False
        if self.flavor == "gcs" and not delimiter:
            if marker:
                keys = [e for e in keys if e[0] > marker]
            truncated = len(keys) > self.GCS_PAGE
            keys = keys[: self.GCS_PAGE]
        self._send(200, self._list_xml(keys, prefixes, truncated))

    def _list_xml(self, keys, prefixes, truncated=False) -> bytes:
        if self.flavor == "azure":
            blobs = "".join(
                f"<Blob><Name>{_xml_escape(k)}</Name><Properties>"
                f"<Last-Modified>{formatdate(m, usegmt=True)}</Last-Modified>"
                f"</Properties></Blob>"
                for k, m in keys
            )
            bps = "".join(
                f"<BlobPrefix><Name>{_xml_escape(p)}</Name></BlobPrefix>"
                for p in prefixes
            )
            return (
                f"<?xml version='1.0'?><EnumerationResults>"
                f"<Blobs>{blobs}{bps}</Blobs><NextMarker/></EnumerationResults>"
            ).encode()
        import datetime as _dt

        contents = "".join(
            f"<Contents><Key>{_xml_escape(k)}</Key><LastModified>"
            f"{_dt.datetime.fromtimestamp(m, _dt.timezone.utc).isoformat()}"
            f"</LastModified></Contents>"
            for k, m in keys
        )
        cps = "".join(
            f"<CommonPrefixes><Prefix>{_xml_escape(p)}</Prefix></CommonPrefixes>"
            for p in prefixes
        )
        return (
            f"<?xml version='1.0'?><ListBucketResult>"
            f"{contents}{cps}"
            f"<IsTruncated>{'true' if truncated else 'false'}</IsTruncated>"
            f"</ListBucketResult>"
        ).encode()


def _serve(flavor: str):
    store = _Store()
    handler = type(
        f"{flavor.title()}Handler",
        (_FakeObjectStoreHandler,),
        {"store": store, "flavor": flavor},
    )
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, store


@pytest.fixture()
def azure_env(monkeypatch):
    server, store = _serve("azure")
    port = server.server_address[1]
    monkeypatch.setenv("AZURE_STORAGE_ENDPOINT", f"http://127.0.0.1:{port}")
    yield store
    server.shutdown()


@pytest.fixture()
def gcs_env(monkeypatch):
    server, store = _serve("gcs")
    port = server.server_address[1]
    monkeypatch.setenv("STORAGE_EMULATOR_HOST", f"http://127.0.0.1:{port}")
    yield store
    server.shutdown()


# ---------------------------------------------------------------------------
# FileSystem contract
# ---------------------------------------------------------------------------


def _exercise_fs_contract(fs, base: str):
    assert not fs.exists(f"{base}/a.txt")
    fs.put_if_absent(f"{base}/a.txt", b"first")
    assert fs.exists(f"{base}/a.txt")
    assert fs.read_bytes(f"{base}/a.txt") == b"first"
    with pytest.raises(FileExistsError):
        fs.put_if_absent(f"{base}/a.txt", b"second")
    assert fs.read_bytes(f"{base}/a.txt") == b"first"  # loser changed nothing

    fs.write_bytes(f"{base}/a.txt", b"updated")  # unconditional overwrite
    assert fs.read_bytes(f"{base}/a.txt") == b"updated"

    fs.write_bytes(f"{base}/sub/b.txt", b"bb")
    fs.write_bytes(f"{base}/sub/deep/c.txt", b"cc")
    assert fs.list_dir(base) == ["a.txt", "sub"]
    assert fs.list_dir(f"{base}/sub") == ["b.txt", "deep"]
    assert fs.exists(f"{base}/sub")  # prefix-existence for "directories"

    rec = dict(fs.list_files_recursive(base))
    assert set(rec) == {"a.txt", "sub/b.txt", "sub/deep/c.txt"}
    assert all(m > 0 for m in rec.values())  # real mtimes (vacuum retention)

    with pytest.raises(FileNotFoundError):
        fs.read_bytes(f"{base}/missing.txt")
    fs.delete(f"{base}/a.txt")
    assert not fs.exists(f"{base}/a.txt")
    fs.delete(f"{base}/a.txt")  # idempotent


def test_azure_fs_contract(azure_env):
    _exercise_fs_contract(AzureBlobFileSystem(), "azure://cont/tables/x")


def test_gcs_fs_contract(gcs_env):
    _exercise_fs_contract(GcsFileSystem(), "gs://bkt/tables/x")


def test_gcs_list_paginates_without_nextmarker(gcs_env):
    """The fake truncates delimiter-less listings at 3 keys per page with
    IsTruncated=true and NO NextMarker (V1 semantics); the client must
    continue from its last key or it silently loses the tail."""
    fs = GcsFileSystem()
    base = "gs://bkt/paged"
    names = [f"obj{i:02d}.bin" for i in range(8)]
    for n in names:
        fs.write_bytes(f"{base}/{n}", b"x")
    rec = dict(fs.list_files_recursive(base))
    assert set(rec) == set(names)


def test_resolve_routes_schemes(azure_env, gcs_env):
    fs_a, norm_a = resolve("azure://cont/t/")
    assert isinstance(fs_a, AzureBlobFileSystem) and norm_a == "azure://cont/t"
    fs_g, norm_g = resolve("gs://bkt/t/")
    assert isinstance(fs_g, GcsFileSystem) and norm_g == "gs://bkt/t"


# ---------------------------------------------------------------------------
# Delta log on azure:// and gs:// (same exerciser as s3/memory)
# ---------------------------------------------------------------------------


def test_azure_log_lifecycle(azure_env):
    _exercise_log("azure://cont/tables/t1")


def test_gcs_log_lifecycle(gcs_env):
    _exercise_log("gs://bkt/tables/t1")


@pytest.mark.parametrize("scheme_base", ["azure://cont", "gs://bkt"])
def test_contended_commits_one_winner_per_version(
    scheme_base, azure_env, gcs_env
):
    """N threads race commit_with_retry through the REST conditional-create:
    every writer lands exactly once on a distinct version (the same
    optimistic-concurrency contract the S3 backend passes via moto)."""
    import threading

    from pyspark.sql import types as T

    from delta_sorter_spark.sources.delta_log import DeltaLog

    schema = T.StructType([T.StructField("id", T.LongType())])
    log = DeltaLog(f"{scheme_base}/tables/race")
    log.create_table(schema)
    n_writers = 6
    results: dict[int, int] = {}
    errors: list[Exception] = []

    def writer(i: int) -> None:
        try:
            from test_fs_objectstore import _add

            results[i] = log.commit_with_retry(
                lambda s, i=i: [_add(i)], operation="WRITE", max_attempts=50
            )
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors, errors
    assert sorted(results.values()) == list(range(1, n_writers + 1))


# ---------------------------------------------------------------------------
# end-to-end: strict compact + validate THROUGH the emulator, executors
# writing parquet objects over HTTP
# ---------------------------------------------------------------------------


def _roundtrip_compact(spark, uri: str):
    from delta_sorter_spark.api import compact, validate
    from delta_sorter_spark.sources.delta_table import DeltaTable

    df = spark.createDataFrame(
        [("B", 4), ("A", 1), ("C", 2), ("A", 3)], "k string, v long"
    )
    # create remotely: the log goes through the REST fs; the initial data
    # files are staged by executors via the same fs
    t = DeltaTable.create(spark, uri, df.coalesce(1))
    assert validate(uri, ["k", "v"], spark=spark)["boundary_violations"] >= 1

    metrics = compact(uri, ["k", "v"], repartition_by_sort_key=True, spark=spark)
    assert metrics.rewritten_partitions == 1
    assert validate(uri, ["k", "v"], spark=spark)["boundary_violations"] == 0

    got = sorted((r["k"], r["v"]) for r in t.to_df().collect())
    assert got == [("A", 1), ("A", 3), ("B", 4), ("C", 2)]


def test_azure_compact_end_to_end(azure_env, spark):
    _roundtrip_compact(spark, "azure://cont/tables/compact_me")


def test_gcs_compact_end_to_end(gcs_env, spark):
    _roundtrip_compact(spark, "gs://bkt/tables/compact_me")


def _roundtrip_partition_aware(spark, uri: str):
    """Partition-aware compact (skip attested-sorted, replaceWhere-scoped
    rewrite of the dirty partition) + zone-map-pruned upsert + revalidate,
    all through the emulator — the same contract the s3 e2e pins
    (test_fs_objectstore.py), for the other two schemes of the reference's
    store matrix (crates/sorter-core/Cargo.toml:15)."""
    from delta_sorter_spark.api import compact, validate
    from delta_sorter_spark.operators.dml import upsert
    from delta_sorter_spark.sources.delta_table import DeltaTable

    rows = [(1, "b", 1), (1, "a", 2), (2, "z", 9), (2, "m", 7)]
    df = spark.createDataFrame(rows, "p int, k string, v long")
    DeltaTable.create(spark, uri, df.coalesce(1), partition_columns=["p"])
    compact(uri, ["k"], spark=spark)  # sort + attest both partitions
    # break p=2 with an unattested append overlapping its key range
    DeltaTable(spark, uri).append(
        spark.createDataFrame([(2, "n", 8)], "p int, k string, v long").coalesce(1)
    )
    p1_before = {
        a.path
        for a in DeltaTable(spark, uri).state().adds
        if a.partition_values.get("p") == "1"
    }

    metrics = compact(uri, ["k"], spark=spark)
    assert metrics.rewritten_partitions == 1  # only p=2
    assert metrics.skipped_partitions == 1    # p=1 attested sorted

    state = DeltaTable(spark, uri).state()
    p1_after = {a.path for a in state.adds if a.partition_values.get("p") == "1"}
    assert p1_after == p1_before  # replaceWhere scope: p=1 untouched
    p2 = [a for a in state.adds if a.partition_values.get("p") == "2"]
    assert p2 and all(a.stats and a.stats.get("keyStats") for a in p2)

    assert validate(uri, ["k"], spark=spark)["boundary_violations"] == 0
    t = DeltaTable(spark, uri)
    got = sorted((r["p"], r["k"], r["v"]) for r in t.to_df().collect())
    assert got == sorted(rows + [(2, "n", 8)])

    # remote row-level DML through the same fs
    res = upsert(
        t,
        spark.createDataFrame([(2, "m", 77)], "p int, k string, v long"),
        ["p", "k"],
    )
    assert res["rewritten_files"] >= 1
    vals = {(r["p"], r["k"]): r["v"] for r in t.to_df().collect()}
    assert vals[(2, "m")] == 77 and len(vals) == 5


def test_azure_partition_aware_compact_and_dml(azure_env, spark):
    _roundtrip_partition_aware(spark, "azure://cont/tables/part_dml")


def test_gcs_partition_aware_compact_and_dml(gcs_env, spark):
    _roundtrip_partition_aware(spark, "gs://bkt/tables/part_dml")


def _roundtrip_bloom_index(spark, uri: str):
    """Bloom-index lifecycle through the REST emulator — the s3 e2e's
    contract (test_fs_objectstore.py) for the other two schemes; notably
    the Spark-free probe reads index parts via the full-object REST fetch
    (fs.pyarrow_open_input), not pyarrow's native S3 filesystem."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.operators.bloom_index import (
        bloom_prune_adds_local,
        build_bloom_index,
        refresh_bloom_index,
    )
    from delta_sorter_spark.sources.delta_table import DeltaTable

    df = spark.range(0, 200).select(
        F.col("id").alias("k"),
        ((F.col("id") * 13) % 200).cast("string").alias("u"),
    )
    DeltaTable.create(
        spark, uri,
        df.repartitionByRange(4, "k").sortWithinPartitions("k"),
        stat_columns=["k"],
    )
    tbl = DeltaTable(spark, uri)
    assert build_bloom_index(tbl, "u", m_bits=1 << 13)["files"] == 4
    kept = tbl.files_matching("u = '26'")
    assert 1 <= len(kept) <= 2
    assert tbl.to_df(where="u = '26'").count() == 1
    st = tbl.state()
    kept_local = {
        a.path
        for a in bloom_prune_adds_local(uri, st.adds, "u = '26'", st.metadata)
    }
    assert kept_local == {a.path for a in kept}
    tbl.append(spark.createDataFrame([(9000, "zzz")], "k long, u string"))
    assert refresh_bloom_index(tbl, "u")["new_files"] == 1
    assert tbl.to_df(where="u = 'zzz'").count() == 1


def test_azure_bloom_index(azure_env, spark):
    _roundtrip_bloom_index(spark, "azure://cont/tables/bloom")


def test_gcs_bloom_index(gcs_env, spark):
    _roundtrip_bloom_index(spark, "gs://bkt/tables/bloom")
