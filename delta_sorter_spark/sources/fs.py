"""Filesystem abstraction for metadata-plane IO (log, checkpoints, sidecars).

The reference addresses tables by URI (crates/sorter-cli/src/main.rs:13-15,
"Table URI, e.g. s3://bucket/table"; object-store backends are feature flags
in crates/sorter-core/Cargo.toml:15).  This engine routes every Delta-log
read/write through this layer so ``--table s3://bucket/table`` behaves like a
local path.

Correctness requirement: commits need **put-if-absent**, not POSIX rename —
object stores have no atomic rename.  Backends:

- local paths .......... ``os.link`` (fails if target exists, atomic);
- ``s3://`` ............ boto3 ``PutObject`` with ``IfNoneMatch='*'``
                          (S3 conditional writes; a losing writer gets HTTP
                          412 PreconditionFailed);
- ``azure://`` ......... Azure Blob REST, Put Blob with ``If-None-Match: *``
                          (losing writer gets 409 BlobAlreadyExists / 412);
- ``gs://`` ............ GCS XML API, PUT with
                          ``x-goog-if-generation-match: 0`` (loser gets 412);
- ``memory://`` ........ in-process dict (hermetic tests, no server).

The reference enables exactly s3 + azure + gcs object stores
(crates/sorter-core/Cargo.toml:15); the Azure/GCS backends speak plain REST
(urllib) so the conditional-create semantics are first-class and testable
against emulator endpoints (``AZURE_STORAGE_ENDPOINT`` /
``STORAGE_EMULATOR_HOST``) without any cloud SDK in the image.  Auth rides
the standard env: an SAS token (``AZURE_STORAGE_SAS_TOKEN``) or bearer
token (``AZURE_STORAGE_TOKEN`` / ``GCS_OAUTH_TOKEN``); unauthenticated
requests work against emulators and public buckets.

The S3 client honours the standard AWS SDK environment (credentials,
``AWS_ENDPOINT_URL`` for S3-compatible stores / test servers).

Data-plane note: Spark reads/writes parquet through its own Hadoop
filesystems, so a fully remote table additionally needs the hadoop-aws jars
on the Spark classpath (``s3a://``).  This module deliberately covers the
transaction-log plane, which is where atomicity and listing semantics live;
the Spark data plane needs no custom code, only the standard connector jars.
"""

from __future__ import annotations

import os
import posixpath
import threading
import time
import uuid


class FileSystem:
    """Interface over full paths/URIs (each call carries the full address)."""

    def join(self, base: str, *parts: str) -> str:
        return posixpath.join(base, *parts)

    def parent(self, path: str) -> str:
        return posixpath.dirname(path.rstrip("/"))

    # -- queries -----------------------------------------------------------
    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def list_dir(self, path: str) -> list[str]:
        """Names (not paths) of immediate children; [] if dir is absent."""
        raise NotImplementedError

    # -- IO ----------------------------------------------------------------
    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def write_bytes(self, path: str, data: bytes) -> None:
        """Overwrite-capable write (atomic replace where the store allows)."""
        raise NotImplementedError

    def put_if_absent(self, path: str, data: bytes) -> None:
        """Atomic create; raises FileExistsError if ``path`` already exists."""
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        """Create directory marker; no-op on stores without directories."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def list_files_recursive(self, path: str) -> list[tuple[str, float]]:
        """All files under ``path`` as (relative path, mtime-epoch) pairs.
        Powers vacuum's orphan sweep on every backend."""
        raise NotImplementedError

    # -- text sugar --------------------------------------------------------
    def read_text(self, path: str) -> str:
        return self.read_bytes(path).decode("utf-8")

    def write_text(self, path: str, text: str) -> None:
        self.write_bytes(path, text.encode("utf-8"))


class LocalFileSystem(FileSystem):
    def join(self, base: str, *parts: str) -> str:
        return os.path.join(base, *parts)

    def parent(self, path: str) -> str:
        return os.path.dirname(path.rstrip(os.sep))

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def list_dir(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        return os.listdir(path)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as fh:
            return fh.read()

    def write_bytes(self, path: str, data: bytes) -> None:
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, path)

    def put_if_absent(self, path: str, data: bytes) -> None:
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        try:
            os.link(tmp, path)  # atomic, fails when target exists
        finally:
            os.unlink(tmp)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def delete(self, path: str) -> None:
        os.unlink(path)

    def list_files_recursive(self, path: str) -> list[tuple[str, float]]:
        out = []
        for root, _dirs, names in os.walk(path):
            for n in names:
                full = os.path.join(root, n)
                try:
                    mtime = os.path.getmtime(full)
                except OSError:
                    continue
                out.append((os.path.relpath(full, path).replace(os.sep, "/"), mtime))
        return out


class MemoryFileSystem(FileSystem):
    """``memory://`` — shared in-process store; flat key space with
    directory semantics derived from key prefixes (object-store-like)."""

    _objects: dict[str, bytes] = {}
    _mtimes: dict[str, float] = {}
    _lock = threading.Lock()

    @classmethod
    def reset(cls) -> None:
        with cls._lock:
            cls._objects.clear()
            cls._mtimes.clear()

    @staticmethod
    def _key(path: str) -> str:
        return path[len("memory://"):] if path.startswith("memory://") else path

    def exists(self, path: str) -> bool:
        k = self._key(path)
        with self._lock:
            if k in self._objects:
                return True
            prefix = k.rstrip("/") + "/"
            return any(o.startswith(prefix) for o in self._objects)

    def list_dir(self, path: str) -> list[str]:
        prefix = self._key(path).rstrip("/") + "/"
        with self._lock:
            names = {
                o[len(prefix):].split("/", 1)[0]
                for o in self._objects
                if o.startswith(prefix)
            }
        return sorted(names)

    def read_bytes(self, path: str) -> bytes:
        k = self._key(path)
        with self._lock:
            if k not in self._objects:
                raise FileNotFoundError(path)
            return self._objects[k]

    def write_bytes(self, path: str, data: bytes) -> None:
        with self._lock:
            k = self._key(path)
            self._objects[k] = data
            self._mtimes[k] = time.time()

    def put_if_absent(self, path: str, data: bytes) -> None:
        k = self._key(path)
        with self._lock:
            if k in self._objects:
                raise FileExistsError(path)
            self._objects[k] = data
            self._mtimes[k] = time.time()

    def makedirs(self, path: str) -> None:  # no directories in object stores
        pass

    def delete(self, path: str) -> None:
        with self._lock:
            k = self._key(path)
            self._objects.pop(k, None)
            self._mtimes.pop(k, None)

    def list_files_recursive(self, path: str) -> list[tuple[str, float]]:
        # Real write-time mtimes, so vacuum's retention window protects
        # recently written / in-flight staged objects on memory:// exactly
        # like on the other backends.
        prefix = self._key(path).rstrip("/") + "/"
        with self._lock:
            return [
                (o[len(prefix):], self._mtimes.get(o, 0.0))
                for o in self._objects
                if o.startswith(prefix)
            ]


class S3FileSystem(FileSystem):
    """``s3://bucket/key`` via boto3.  Conditional PUT gives the atomic
    version-claim the commit protocol needs (AWS S3 conditional writes)."""

    _clients: dict[int, object] = {}

    def _client(self):
        # boto3 clients are not fork-safe; key the cache per-process.
        pid = os.getpid()
        cli = self._clients.get(pid)
        if cli is None:
            import boto3

            cli = boto3.client("s3")  # region/creds/endpoint from standard env
            self._clients[pid] = cli
        return cli

    @staticmethod
    def _split(path: str) -> tuple[str, str]:
        rest = path[len("s3://"):]
        bucket, _, key = rest.partition("/")
        return bucket, key

    def exists(self, path: str) -> bool:
        import botocore

        bucket, key = self._split(path)
        cli = self._client()
        try:
            cli.head_object(Bucket=bucket, Key=key)
            return True
        except botocore.exceptions.ClientError as exc:
            # Only a definitive not-found means absent; 403/throttle/5xx must
            # propagate or restore()'s existence probe would spuriously
            # report committed files as missing on transient errors.
            code = str(exc.response.get("Error", {}).get("Code", ""))
            status = exc.response.get("ResponseMetadata", {}).get("HTTPStatusCode")
            if code not in ("404", "NoSuchKey", "NotFound") and status != 404:
                raise
        resp = cli.list_objects_v2(
            Bucket=bucket, Prefix=key.rstrip("/") + "/", MaxKeys=1
        )
        return resp.get("KeyCount", 0) > 0

    def list_dir(self, path: str) -> list[str]:
        bucket, key = self._split(path)
        prefix = key.rstrip("/") + "/"
        names: set[str] = set()
        paginator = self._client().get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=bucket, Prefix=prefix, Delimiter="/"):
            for obj in page.get("Contents", []):
                names.add(obj["Key"][len(prefix):])
            for cp in page.get("CommonPrefixes", []):
                names.add(cp["Prefix"][len(prefix):].rstrip("/"))
        return sorted(n for n in names if n)

    def read_bytes(self, path: str) -> bytes:
        import botocore

        bucket, key = self._split(path)
        try:
            return self._client().get_object(Bucket=bucket, Key=key)["Body"].read()
        except botocore.exceptions.ClientError as exc:
            code = exc.response.get("Error", {}).get("Code", "")
            if code in ("NoSuchKey", "404"):
                raise FileNotFoundError(path) from exc
            raise

    def write_bytes(self, path: str, data: bytes) -> None:
        bucket, key = self._split(path)
        self._client().put_object(Bucket=bucket, Key=key, Body=data)

    def put_if_absent(self, path: str, data: bytes) -> None:
        import botocore

        bucket, key = self._split(path)
        try:
            self._client().put_object(
                Bucket=bucket, Key=key, Body=data, IfNoneMatch="*"
            )
        except botocore.exceptions.ClientError as exc:
            code = exc.response.get("Error", {}).get("Code", "")
            if code in ("PreconditionFailed", "412"):
                raise FileExistsError(path) from exc
            raise

    def makedirs(self, path: str) -> None:  # S3 has no directories
        pass

    def delete(self, path: str) -> None:
        bucket, key = self._split(path)
        self._client().delete_object(Bucket=bucket, Key=key)

    def list_files_recursive(self, path: str) -> list[tuple[str, float]]:
        bucket, key = self._split(path)
        prefix = key.rstrip("/") + "/"
        out = []
        paginator = self._client().get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=bucket, Prefix=prefix):
            for obj in page.get("Contents", []):
                out.append(
                    (obj["Key"][len(prefix):], obj["LastModified"].timestamp())
                )
        return out


class _RestObjectStore(FileSystem):
    """Shared REST plumbing for the Azure Blob and GCS backends: both are
    addressed as ``scheme://container/key`` and exposed by their services as
    plain HTTP objects with conditional-create headers — which is all the
    transaction log needs.  Requests go through urllib (no SDK dependency);
    subclasses supply the endpoint, auth decoration, list parsing, and the
    conditional-create header."""

    scheme = ""  # subclass

    # -- subclass surface --------------------------------------------------
    def _object_url(self, bucket: str, key: str) -> str:
        raise NotImplementedError

    def _decorate(self, req) -> None:
        """Attach auth (bearer header / SAS query) to a urllib Request."""
        raise NotImplementedError

    def _conditional_headers(self) -> dict:
        raise NotImplementedError

    def _put_headers(self) -> dict:
        return {}

    def _list_objects(
        self, bucket: str, prefix: str, delimiter: str | None
    ) -> tuple[list[tuple[str, float]], list[str]]:
        """-> ([(key, mtime-epoch)], [common-prefixes])"""
        raise NotImplementedError

    # -- shared ------------------------------------------------------------
    def _split(self, path: str) -> tuple[str, str]:
        rest = path[len(self.scheme) + 3:]
        bucket, _, key = rest.partition("/")
        return bucket, key

    def _request(self, method: str, url: str, data: bytes | None = None,
                 headers: dict | None = None):
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, data=data, method=method)
        for k, v in (headers or {}).items():
            req.add_header(k, v)
        self._decorate(req)
        return urllib.request.urlopen(req, timeout=60)

    def exists(self, path: str) -> bool:
        import urllib.error

        bucket, key = self._split(path)
        try:
            self._request("HEAD", self._object_url(bucket, key)).close()
            return True
        except urllib.error.HTTPError as exc:
            if exc.code != 404:
                raise
        keys, prefixes = self._list_objects(bucket, key.rstrip("/") + "/", "/")
        return bool(keys or prefixes)

    def list_dir(self, path: str) -> list[str]:
        bucket, key = self._split(path)
        prefix = key.rstrip("/") + "/" if key else ""
        keys, prefixes = self._list_objects(bucket, prefix, "/")
        names = {k[len(prefix):] for k, _ in keys}
        names |= {p[len(prefix):].rstrip("/") for p in prefixes}
        return sorted(n for n in names if n)

    def read_bytes(self, path: str) -> bytes:
        import urllib.error

        bucket, key = self._split(path)
        try:
            with self._request("GET", self._object_url(bucket, key)) as resp:
                return resp.read()
        except urllib.error.HTTPError as exc:
            if exc.code == 404:
                raise FileNotFoundError(path) from exc
            raise

    def write_bytes(self, path: str, data: bytes) -> None:
        bucket, key = self._split(path)
        self._request(
            "PUT", self._object_url(bucket, key), data=data,
            headers=self._put_headers(),
        ).close()

    def put_if_absent(self, path: str, data: bytes) -> None:
        import urllib.error

        bucket, key = self._split(path)
        headers = {**self._put_headers(), **self._conditional_headers()}
        try:
            self._request(
                "PUT", self._object_url(bucket, key), data=data, headers=headers
            ).close()
        except urllib.error.HTTPError as exc:
            # Azure: 409 BlobAlreadyExists (If-None-Match: *); GCS: 412
            # PreconditionFailed (if-generation-match 0)
            if exc.code in (409, 412):
                raise FileExistsError(path) from exc
            raise

    def makedirs(self, path: str) -> None:  # no directories in object stores
        pass

    def delete(self, path: str) -> None:
        import urllib.error

        bucket, key = self._split(path)
        try:
            self._request("DELETE", self._object_url(bucket, key)).close()
        except urllib.error.HTTPError as exc:
            if exc.code != 404:
                raise

    def list_files_recursive(self, path: str) -> list[tuple[str, float]]:
        bucket, key = self._split(path)
        prefix = key.rstrip("/") + "/" if key else ""
        keys, _ = self._list_objects(bucket, prefix, None)
        return [(k[len(prefix):], m) for k, m in keys]


def _parse_http_date(value: str | None) -> float:
    if not value:
        return 0.0
    from email.utils import parsedate_to_datetime

    try:
        return parsedate_to_datetime(value).timestamp()
    except (TypeError, ValueError):
        try:
            import datetime as _dt

            return _dt.datetime.fromisoformat(value.replace("Z", "+00:00")).timestamp()
        except ValueError:
            return 0.0


class AzureBlobFileSystem(_RestObjectStore):
    """``azure://container/key`` over the Azure Blob REST API.

    Endpoint: ``AZURE_STORAGE_ENDPOINT`` (e.g. an Azurite emulator,
    ``http://127.0.0.1:10000/devstoreaccount1``) or
    ``https://{AZURE_STORAGE_ACCOUNT}.blob.core.windows.net``.  Put Blob
    with ``If-None-Match: *`` is the documented conditional-create
    (docs.microsoft.com, Specifying Conditional Headers for Blob Service)."""

    scheme = "azure"

    def _endpoint(self) -> str:
        ep = os.environ.get("AZURE_STORAGE_ENDPOINT")
        if ep:
            return ep.rstrip("/")
        account = os.environ.get("AZURE_STORAGE_ACCOUNT", "")
        if not account:
            raise OSError(
                "azure:// needs AZURE_STORAGE_ENDPOINT or AZURE_STORAGE_ACCOUNT"
            )
        return f"https://{account}.blob.core.windows.net"

    def _object_url(self, bucket: str, key: str) -> str:
        import urllib.parse as _up

        return f"{self._endpoint()}/{bucket}/{_up.quote(key)}"

    def _decorate(self, req) -> None:
        sas = os.environ.get("AZURE_STORAGE_SAS_TOKEN")
        if sas:
            sep = "&" if "?" in req.full_url else "?"
            req.full_url = f"{req.full_url}{sep}{sas.lstrip('?')}"
        token = os.environ.get("AZURE_STORAGE_TOKEN")
        if token:
            req.add_header("Authorization", f"Bearer {token}")
        req.add_header("x-ms-version", "2021-08-06")

    def _put_headers(self) -> dict:
        return {"x-ms-blob-type": "BlockBlob"}

    def _conditional_headers(self) -> dict:
        return {"If-None-Match": "*"}

    def _list_objects(self, bucket, prefix, delimiter):
        import urllib.parse as _up
        import xml.etree.ElementTree as ET

        keys: list[tuple[str, float]] = []
        prefixes: list[str] = []
        marker = None
        while True:
            q = f"restype=container&comp=list&prefix={_up.quote(prefix)}"
            if delimiter:
                q += f"&delimiter={_up.quote(delimiter)}"
            if marker:
                q += f"&marker={_up.quote(marker)}"
            with self._request("GET", f"{self._endpoint()}/{bucket}?{q}") as resp:
                root = ET.fromstring(resp.read())
            for blob in root.iter("Blob"):
                name = blob.findtext("Name")
                mtime = _parse_http_date(
                    blob.findtext("Properties/Last-Modified")
                )
                if name:
                    keys.append((name, mtime))
            for bp in root.iter("BlobPrefix"):
                name = bp.findtext("Name")
                if name:
                    prefixes.append(name)
            marker = root.findtext("NextMarker")
            if not marker:
                return keys, prefixes


class GcsFileSystem(_RestObjectStore):
    """``gs://bucket/key`` over the GCS XML API (S3-compatible shapes).

    Endpoint: ``STORAGE_EMULATOR_HOST`` (the standard GCS emulator env) or
    ``https://storage.googleapis.com``.  ``x-goog-if-generation-match: 0``
    makes the PUT create-only (cloud.google.com/storage/docs/xml-api,
    generation preconditions): a losing writer gets 412."""

    scheme = "gs"

    def _endpoint(self) -> str:
        ep = os.environ.get("STORAGE_EMULATOR_HOST")
        if ep:
            if not ep.startswith("http"):
                ep = f"http://{ep}"
            return ep.rstrip("/")
        return "https://storage.googleapis.com"

    def _object_url(self, bucket: str, key: str) -> str:
        import urllib.parse as _up

        return f"{self._endpoint()}/{bucket}/{_up.quote(key)}"

    def _decorate(self, req) -> None:
        token = os.environ.get("GCS_OAUTH_TOKEN")
        if token:
            req.add_header("Authorization", f"Bearer {token}")

    def _conditional_headers(self) -> dict:
        return {"x-goog-if-generation-match": "0"}

    def _list_objects(self, bucket, prefix, delimiter):
        import urllib.parse as _up
        import xml.etree.ElementTree as ET

        keys: list[tuple[str, float]] = []
        prefixes: list[str] = []
        marker = None
        while True:
            q = f"prefix={_up.quote(prefix)}"
            if delimiter:
                q += f"&delimiter={_up.quote(delimiter)}"
            if marker:
                q += f"&marker={_up.quote(marker)}"
            with self._request("GET", f"{self._endpoint()}/{bucket}?{q}") as resp:
                root = ET.fromstring(resp.read())
            # ListBucketResult may carry an xmlns; match on local names
            def _local(tag):
                return tag.rsplit("}", 1)[-1]

            marker = None
            truncated = False
            page_last_key = None
            for el in root.iter():
                tag = _local(el.tag)
                if tag == "Contents":
                    name = mtime = None
                    for ch in el:
                        if _local(ch.tag) == "Key":
                            name = ch.text
                        elif _local(ch.tag) == "LastModified":
                            mtime = _parse_http_date(ch.text)
                    if name:
                        keys.append((name, mtime or 0.0))
                        page_last_key = name
                elif tag == "CommonPrefixes":
                    for ch in el:
                        if _local(ch.tag) == "Prefix" and ch.text:
                            prefixes.append(ch.text)
                elif tag == "NextMarker":
                    marker = el.text
                elif tag == "IsTruncated":
                    truncated = (el.text or "").strip().lower() == "true"
            if not marker and truncated:
                # V1-style listings return NextMarker only when a delimiter
                # was given; a delimiter-less truncated page continues from
                # its last key — without this, tables past 1000 objects
                # silently lose the tail (vacuum would miss orphans)
                marker = page_last_key
            if not marker:
                return keys, prefixes


def is_remote_uri(path: str) -> bool:
    return path.startswith(("s3://", "azure://", "gs://", "memory://"))


_AWS_ENV_KEYS = (
    "AWS_ENDPOINT_URL",
    "AWS_ACCESS_KEY_ID",
    "AWS_SECRET_ACCESS_KEY",
    "AWS_SESSION_TOKEN",
    "AWS_DEFAULT_REGION",
    "AWS_REGION",
    # Azure / GCS backends (same worker-env problem, same fix)
    "AZURE_STORAGE_ENDPOINT",
    "AZURE_STORAGE_ACCOUNT",
    "AZURE_STORAGE_SAS_TOKEN",
    "AZURE_STORAGE_TOKEN",
    "STORAGE_EMULATOR_HOST",
    "GCS_OAUTH_TOKEN",
)


def capture_aws_env() -> dict:
    """Driver-side snapshot of the standard object-store environment (AWS +
    Azure + GCS keys), for shipping inside task closures.  Python workers
    are forked from a daemon the JVM launched, so env vars set in the driver
    AFTER SparkSession creation never reach them — shipping the snapshot and
    applying it in the task makes executor-side store access deterministic."""
    return {k: os.environ[k] for k in _AWS_ENV_KEYS if k in os.environ}


def apply_aws_env(env: dict | None) -> None:
    """Worker-side: install a driver-captured AWS env snapshot."""
    changed = False
    for k, v in (env or {}).items():
        if os.environ.get(k) != v:
            os.environ[k] = v
            changed = True
    if changed:
        # drop any per-process boto3 client cached with stale settings
        S3FileSystem._clients.pop(os.getpid(), None)


def pyarrow_open_input(path: str):
    """Source argument for ``pyarrow.parquet.ParquetFile``: local paths pass
    through; ``s3://`` opens via pyarrow's native S3 filesystem (credentials
    and ``AWS_ENDPOINT_URL`` from the standard AWS environment).  This is
    what lets the validator scan remote tables from executors WITHOUT any
    Spark filesystem connector jars — the per-file reads are pyarrow, not
    Hadoop."""
    if path.startswith("s3://"):
        from pyarrow import fs as pafs

        kwargs = {}
        ep = os.environ.get("AWS_ENDPOINT_URL")
        if ep:
            kwargs["endpoint_override"] = ep
            if ep.startswith("http://"):
                kwargs["scheme"] = "http"
        region = os.environ.get("AWS_DEFAULT_REGION") or os.environ.get("AWS_REGION")
        if region:
            kwargs["region"] = region
        fsys = pafs.S3FileSystem(**kwargs)
        return fsys.open_input_file(path[len("s3://"):])
    if path.startswith(("azure://", "gs://")):
        # full-object fetch through the REST backend; fine for the
        # validator's per-file scans and the streaming tail, where each
        # task reads exactly one file it needs wholly anyway
        import io

        fsobj, norm = resolve(path)
        return io.BytesIO(fsobj.read_bytes(norm))
    if path.startswith("memory://"):
        import io

        return io.BytesIO(MemoryFileSystem().read_bytes(path))
    return path


def resolve(table_path: str) -> tuple[FileSystem, str]:
    """URI → (filesystem, normalized path).  Local paths are absolutized so
    relative test paths behave like before."""
    if table_path.startswith("s3://"):
        return S3FileSystem(), table_path.rstrip("/")
    if table_path.startswith("azure://"):
        return AzureBlobFileSystem(), table_path.rstrip("/")
    if table_path.startswith("gs://"):
        return GcsFileSystem(), table_path.rstrip("/")
    if table_path.startswith("memory://"):
        return MemoryFileSystem(), table_path.rstrip("/")
    if table_path.startswith("file://"):
        return LocalFileSystem(), os.path.abspath(table_path[len("file://"):])
    return LocalFileSystem(), os.path.abspath(table_path)
