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
- ``memory://`` ........ in-process dict (hermetic tests, no server).

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


def is_remote_uri(path: str) -> bool:
    return path.startswith(("s3://", "memory://"))


_AWS_ENV_KEYS = (
    "AWS_ENDPOINT_URL",
    "AWS_ACCESS_KEY_ID",
    "AWS_SECRET_ACCESS_KEY",
    "AWS_SESSION_TOKEN",
    "AWS_DEFAULT_REGION",
    "AWS_REGION",
)


def capture_aws_env() -> dict:
    """Driver-side snapshot of the standard AWS environment, for shipping
    inside task closures.  Python workers are forked from a daemon the JVM
    launched, so env vars set in the driver AFTER SparkSession creation
    never reach them — shipping the snapshot and applying it in the task
    makes executor-side S3 access deterministic."""
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
    if path.startswith("memory://"):
        import io

        return io.BytesIO(MemoryFileSystem().read_bytes(path))
    return path


def resolve(table_path: str) -> tuple[FileSystem, str]:
    """URI → (filesystem, normalized path).  Local paths are absolutized so
    relative test paths behave like before."""
    if table_path.startswith("s3://"):
        return S3FileSystem(), table_path.rstrip("/")
    if table_path.startswith("memory://"):
        return MemoryFileSystem(), table_path.rstrip("/")
    if table_path.startswith("file://"):
        return LocalFileSystem(), os.path.abspath(table_path[len("file://"):])
    return LocalFileSystem(), os.path.abspath(table_path)
