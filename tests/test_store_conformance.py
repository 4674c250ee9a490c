"""The CommitStore conformance battery over every shipped impl —
LocalFS, InMemory, S3, and GCS, the object stores against stubbed
clients replaying their documented status codes (the container has no
boto3 / google-cloud-storage and no network; the integration half of
each contract needs a real bucket and runs where one exists). Plus
protocol pins: S3 412/409 and GCS 412/429 → conflict semantics,
NoSuchKey/404 → FileNotFoundError, delimiter listing with pagination,
s3a/gs URIs, and a catalog running end-to-end over the stubbed
stores."""

from __future__ import annotations

import io
import itertools
import threading
import time

import pytest

from etl_job_spark.commit_store import (
    GCSCommitStore,
    InMemoryCommitStore,
    LocalFSCommitStore,
    S3CommitStore,
    StoreConflict,
)
from etl_job_spark.store_conformance import run_conformance, run_fault_taxonomy

_fresh = itertools.count()


class _ClientError(Exception):
    """botocore.ClientError look-alike: carries the ``response`` shape
    S3CommitStore duck-types against."""

    def __init__(self, code: str, status: int):
        super().__init__(code)
        self.response = {
            "Error": {"Code": code},
            "ResponseMetadata": {"HTTPStatusCode": status},
        }


class StubS3Client:
    """In-memory boto3-S3-shaped client replaying the documented
    semantics the store relies on: conditional PutObject
    (If-None-Match:* → 412 PreconditionFailed on an existing key),
    injectable 409 ConditionalRequestConflict, GetObject/HeadObject
    404s, idempotent DeleteObject, and ListObjectsV2 with Delimiter
    grouping and ContinuationToken pagination (a tiny page size forces
    the pagination loop in every listing test)."""

    def __init__(self, page_size: int = 2):
        self.objects: dict[str, tuple[bytes, float]] = {}
        self.page_size = page_size
        self.lock = threading.RLock()
        self.fail_next: list[tuple[str, int]] = []

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        with self.lock:
            if self.fail_next:
                code, status = self.fail_next.pop(0)
                raise _ClientError(code, status)
            if IfNoneMatch == "*" and Key in self.objects:
                raise _ClientError("PreconditionFailed", 412)
            self.objects[Key] = (bytes(Body), time.time())
            return {}

    def get_object(self, Bucket, Key):
        with self.lock:
            if Key not in self.objects:
                raise _ClientError("NoSuchKey", 404)
            return {"Body": io.BytesIO(self.objects[Key][0])}

    def head_object(self, Bucket, Key):
        with self.lock:
            if Key not in self.objects:
                raise _ClientError("404", 404)
            return {"LastModified": self.objects[Key][1]}

    def delete_object(self, Bucket, Key):
        with self.lock:
            self.objects.pop(Key, None)
            return {}

    def list_objects_v2(self, Bucket, Prefix, Delimiter=None,
                        ContinuationToken=None):
        with self.lock:
            entries: list[tuple[str, str]] = []
            seen_prefixes: set[str] = set()
            for key in sorted(self.objects):
                if not key.startswith(Prefix):
                    continue
                rest = key[len(Prefix):]
                if Delimiter and Delimiter in rest:
                    cp = Prefix + rest.split(Delimiter, 1)[0] + Delimiter
                    if cp not in seen_prefixes:
                        seen_prefixes.add(cp)
                        entries.append(("prefix", cp))
                else:
                    entries.append(("key", key))
            start = int(ContinuationToken or 0)
            page = entries[start : start + self.page_size]
            resp: dict = {
                "CommonPrefixes": [
                    {"Prefix": v} for k, v in page if k == "prefix"
                ],
                "Contents": [{"Key": v} for k, v in page if k == "key"],
            }
            if start + self.page_size < len(entries):
                resp["IsTruncated"] = True
                resp["NextContinuationToken"] = str(start + self.page_size)
            return resp


class _GCSError(Exception):
    """google.api_core exception look-alike: carries the integer
    ``code`` GCSCommitStore duck-types against."""

    def __init__(self, code: int, msg: str = ""):
        super().__init__(msg or str(code))
        self.code = code


class _StubGCSBlob:
    def __init__(self, client, name):
        self._c = client
        self.name = name
        self.updated = None

    def upload_from_string(self, data, if_generation_match=None):
        with self._c.lock:
            if self._c.fail_next:
                raise _GCSError(self._c.fail_next.pop(0))
            if if_generation_match == 0 and self.name in self._c.objects:
                raise _GCSError(412, "conditionNotMet")
            self._c.objects[self.name] = (
                data if isinstance(data, bytes) else data.encode(),
                time.time(),
            )

    def download_as_bytes(self):
        with self._c.lock:
            if self.name not in self._c.objects:
                raise _GCSError(404, "notFound")
            return self._c.objects[self.name][0]

    def exists(self):
        with self._c.lock:
            return self.name in self._c.objects

    def delete(self):
        with self._c.lock:
            if self.name not in self._c.objects:
                raise _GCSError(404, "notFound")
            del self._c.objects[self.name]

    def reload(self):
        with self._c.lock:
            if self.name not in self._c.objects:
                raise _GCSError(404, "notFound")
            self.updated = self._c.objects[self.name][1]


class _StubGCSBucket:
    def __init__(self, client):
        self._c = client

    def blob(self, name):
        return _StubGCSBlob(self._c, name)


class _StubGCSListing(list):
    """list_blobs result: iterable of blobs with a ``prefixes`` set
    (the real HTTPIterator populates it during consumption)."""

    def __init__(self, blobs, prefixes):
        super().__init__(blobs)
        self.prefixes = prefixes


class StubGCSClient:
    """In-memory google-cloud-storage-shaped client replaying the
    documented semantics the store relies on: if_generation_match=0 →
    412 conditionNotMet on an existing object, injectable 429 rate
    limits, 404s on read/delete/reload, and list_blobs with delimiter
    grouping into ``prefixes``."""

    def __init__(self):
        self.objects: dict[str, tuple[bytes, float]] = {}
        self.lock = threading.RLock()
        self.fail_next: list[int] = []

    def bucket(self, name):
        return _StubGCSBucket(self)

    def list_blobs(self, bucket_or_name, prefix="", delimiter=None):
        with self.lock:
            blobs, prefixes = [], set()
            for key in sorted(self.objects):
                if not key.startswith(prefix):
                    continue
                rest = key[len(prefix):]
                if delimiter and delimiter in rest:
                    prefixes.add(prefix + rest.split(delimiter, 1)[0] + delimiter)
                else:
                    blobs.append(_StubGCSBlob(self, key))
            return _StubGCSListing(blobs, prefixes)


def _localfs(tmp_path):
    return lambda: LocalFSCommitStore(str(tmp_path / f"s{next(_fresh)}"))


def _inmemory(tmp_path):
    return lambda: InMemoryCommitStore()


def _stubbed_s3(tmp_path):
    return lambda: S3CommitStore(
        "test-bucket", f"root{next(_fresh)}", client=StubS3Client()
    )


def _stubbed_gcs(tmp_path):
    return lambda: GCSCommitStore(
        "test-bucket", f"root{next(_fresh)}", client=StubGCSClient()
    )


@pytest.mark.parametrize(
    "make", [_localfs, _inmemory, _stubbed_s3, _stubbed_gcs]
)
def test_conformance_battery(tmp_path, make):
    run_conformance(make(tmp_path))


@pytest.mark.parametrize(
    "make", [_localfs, _inmemory, _stubbed_s3, _stubbed_gcs]
)
def test_fault_taxonomy(tmp_path, make):
    run_fault_taxonomy(make(tmp_path))


# -- S3-specific protocol pins -----------------------------------------


def test_s3_conditional_request_conflict_retries_then_wins():
    # a 409 ConditionalRequestConflict means the conditional write
    # RACED and neither writer may have landed — the slot can still be
    # free, so the store reissues the put instead of conceding a
    # spurious StoreConflict (ADVICE r13 #4)
    client = StubS3Client()
    s = S3CommitStore("b", client=client)
    client.fail_next.append(("ConditionalRequestConflict", 409))
    s.write_if_absent("m/v1.json", b"x")  # retry lands the write
    assert s.read("m/v1.json") == b"x"


def test_s3_persistent_conditional_conflict_maps_to_store_conflict():
    client = StubS3Client()
    s = S3CommitStore("b", client=client)
    client.fail_next.extend([("ConditionalRequestConflict", 409)] * 3)
    with pytest.raises(StoreConflict):
        s.write_if_absent("m/v1.json", b"x")
    s.write_if_absent("m/v1.json", b"x")  # slot was free: next txn wins


def test_s3_unrelated_409_propagates():
    # OperationAborted is ALSO a 409 but not a conditional-write race —
    # matching on bare statuses would mislabel it a lost commit race
    client = StubS3Client()
    s = S3CommitStore("b", client=client)
    client.fail_next.append(("OperationAborted", 409))
    with pytest.raises(Exception) as ei:
        s.write_if_absent("m/v1.json", b"x")
    assert not isinstance(ei.value, StoreConflict)


def test_s3_unrelated_errors_propagate():
    client = StubS3Client()
    s = S3CommitStore("b", client=client)
    client.fail_next.append(("SlowDown", 503))
    with pytest.raises(Exception) as ei:
        s.write_if_absent("m/v1.json", b"x")
    assert not isinstance(ei.value, StoreConflict)  # 503 is NOT a conflict


def test_s3_listing_paginates_with_delimiter():
    s = S3CommitStore("b", "tbl", client=StubS3Client(page_size=2))
    for i in range(5):
        s.write(f"m/v{i}.json", b"x")
    s.write("m/sub/deep.json", b"y")
    s.write("top.json", b"z")
    got = s.list_dir("m")
    assert got == ["sub", "v0.json", "v1.json", "v2.json", "v3.json", "v4.json"]
    assert s.list_dir("") == ["m", "top.json"]
    assert s.list_dir("missing") == []


def test_s3_uri_is_engine_readable_s3a():
    s = S3CommitStore("bkt", "cat/t1", client=StubS3Client())
    assert s.uri("_manifests/files-x.parquet") == (
        "s3a://bkt/cat/t1/_manifests/files-x.parquet"
    )
    assert s.scoped("sub").uri("a.json") == "s3a://bkt/cat/t1/sub/a.json"


def test_catalog_runs_end_to_end_over_stubbed_s3(spark, tmp_path):
    """The control plane lives in the (stubbed) bucket; the data plane
    still writes real parquet under the table path — the split the
    two-plane contract documents."""
    from etl_job_spark.sql import execute_sql, execute_sql_script
    from etl_job_spark.txn import TransactionalCatalog

    store = S3CommitStore("b", "cat", client=StubS3Client())
    cat = TransactionalCatalog(str(tmp_path), store=store)
    cat.commit(
        lambda txn: txn.overwrite(
            "t", spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
        )
    )
    execute_sql_script(
        spark, cat,
        "CREATE TABLE m AS SELECT k, v * 2 AS v2 FROM t;"
        "UPDATE m SET v2 = 0.0 WHERE k = 1;",
    )
    got = sorted(
        tuple(r) for r in execute_sql(spark, cat, "SELECT k, v2 FROM m").collect()
    )
    assert got == [(1, 0.0), (2, 40.0)]
    show = sorted(
        tuple(r) for r in execute_sql(spark, cat, "SHOW TABLES").collect()
    )
    assert ("m", 2) in show and ("t", 1) in show


# -- GCS-specific protocol pins ------------------------------------------


def test_gcs_412_maps_to_store_conflict():
    client = StubGCSClient()
    s = GCSCommitStore("b", client=client)
    s.write_if_absent("m/v1.json", b"x")
    with pytest.raises(StoreConflict):
        s.write_if_absent("m/v1.json", b"y")
    assert s.read("m/v1.json") == b"x"  # first writer's bytes intact


def test_gcs_429_contention_retries_then_wins():
    # GCS surfaces same-object conditional-write contention as a 429
    # mutation-rate limit — the slot may still be free, so the store
    # reissues the upload instead of conceding a spurious conflict
    client = StubGCSClient()
    s = GCSCommitStore("b", client=client)
    client.fail_next.append(429)
    s.write_if_absent("m/v1.json", b"x")
    assert s.read("m/v1.json") == b"x"
    client.fail_next.extend([429, 429, 429])
    with pytest.raises(StoreConflict):
        s.write_if_absent("m/v2.json", b"x")
    s.write_if_absent("m/v2.json", b"x")  # slot was free: next txn wins


def test_gcs_unrelated_errors_propagate():
    client = StubGCSClient()
    s = GCSCommitStore("b", client=client)
    client.fail_next.append(503)
    with pytest.raises(Exception) as ei:
        s.write_if_absent("m/v1.json", b"x")
    assert not isinstance(ei.value, StoreConflict)


def test_gcs_uri_and_scoping():
    s = GCSCommitStore("bkt", "cat", client=StubGCSClient())
    t = s.scoped("mart")
    assert t.uri("_manifests/v1.json") == "gs://bkt/cat/mart/_manifests/v1.json"
    t.write("_manifests/v1.json", b"{}")
    assert s.read("mart/_manifests/v1.json") == b"{}"
    assert s.list_dir("mart") == ["_manifests"]
    assert s.list_dir("mart/_manifests") == ["v1.json"]


def test_gcs_delete_is_idempotent_and_read_404s():
    s = GCSCommitStore("b", client=StubGCSClient())
    s.delete("never/there.json")  # racing vacuums: not an error
    with pytest.raises(FileNotFoundError):
        s.read("never/there.json")
    with pytest.raises(FileNotFoundError):
        s.mtime("never/there.json")


def test_catalog_end_to_end_over_stubbed_gcs(spark, tmp_path):
    """A TransactionalCatalog running its whole commit protocol over
    the stubbed GCS store: the control plane is store-agnostic."""
    from etl_job_spark.sql import execute_sql
    from etl_job_spark.txn import TransactionalCatalog

    store = GCSCommitStore("bkt", "cats/c1", client=StubGCSClient())
    cat = TransactionalCatalog(str(tmp_path / "c1"), store=store)
    t = cat.table("mart")
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    execute_sql(spark, cat, "UPDATE mart SET v = 'z' WHERE k = 1")
    got = {
        r.k: r.v
        for r in execute_sql(spark, cat, "SELECT k, v FROM mart").collect()
    }
    assert got == {1: "z", 2: "b"}


# -- Azure Blob stub + pins ----------------------------------------------


class _AzureError(Exception):
    """azure-core HttpResponseError look-alike: carries the
    ``error_code`` AzureBlobCommitStore duck-types against."""

    def __init__(self, error_code: str):
        super().__init__(error_code)
        self.error_code = error_code


class _StubAzureItem:
    def __init__(self, name):
        self.name = name


class _StubAzureDownload:
    def __init__(self, data):
        self._d = data

    def readall(self):
        return self._d


class _StubAzureBlobClient:
    def __init__(self, client, name):
        self._c = client
        self._n = name

    def exists(self):
        with self._c.lock:
            return self._n in self._c.objects

    def get_blob_properties(self):
        with self._c.lock:
            if self._n not in self._c.objects:
                raise _AzureError("BlobNotFound")
            return type(
                "P", (), {"last_modified": self._c.objects[self._n][1]}
            )()


class StubAzureContainerClient:
    """In-memory azure-storage-blob ContainerClient look-alike
    replaying the documented semantics the store relies on:
    upload_blob(overwrite=False) → 409 BlobAlreadyExists on an
    existing name, injectable error codes, BlobNotFound 404s,
    walk_blobs one-level delimiter grouping (BlobPrefix names end
    with the delimiter, like the real SDK)."""

    def __init__(self):
        self.objects: dict[str, tuple[bytes, float]] = {}
        self.lock = threading.RLock()
        self.fail_next: list[str] = []

    def upload_blob(self, name, data, overwrite=False):
        with self.lock:
            if self.fail_next:
                raise _AzureError(self.fail_next.pop(0))
            if not overwrite and name in self.objects:
                raise _AzureError("BlobAlreadyExists")
            self.objects[name] = (bytes(data), time.time())

    def download_blob(self, name):
        with self.lock:
            if name not in self.objects:
                raise _AzureError("BlobNotFound")
            return _StubAzureDownload(self.objects[name][0])

    def delete_blob(self, name):
        with self.lock:
            if name not in self.objects:
                raise _AzureError("BlobNotFound")
            del self.objects[name]

    def get_blob_client(self, name):
        return _StubAzureBlobClient(self, name)

    def walk_blobs(self, name_starts_with="", delimiter="/"):
        with self.lock:
            seen = set()
            for key in sorted(self.objects):
                if not key.startswith(name_starts_with):
                    continue
                rest = key[len(name_starts_with):]
                if delimiter and delimiter in rest:
                    p = name_starts_with + rest.split(delimiter, 1)[0] + delimiter
                    if p not in seen:
                        seen.add(p)
                        yield _StubAzureItem(p)  # BlobPrefix
                else:
                    yield _StubAzureItem(key)


def _stubbed_azure(tmp_path):
    from etl_job_spark.commit_store import AzureBlobCommitStore

    return lambda: AzureBlobCommitStore(
        "cont", f"root{next(_fresh)}", client=StubAzureContainerClient()
    )


@pytest.mark.parametrize("make", [_stubbed_azure])
def test_conformance_battery_azure(tmp_path, make):
    run_conformance(make(tmp_path))


@pytest.mark.parametrize("make", [_stubbed_azure])
def test_fault_taxonomy_azure(tmp_path, make):
    run_fault_taxonomy(make(tmp_path))


def test_azure_blob_already_exists_maps_to_store_conflict():
    from etl_job_spark.commit_store import AzureBlobCommitStore

    client = StubAzureContainerClient()
    s = AzureBlobCommitStore("c", client=client)
    s.write_if_absent("m/v1.json", b"x")
    with pytest.raises(StoreConflict):
        s.write_if_absent("m/v1.json", b"y")
    assert s.read("m/v1.json") == b"x"


def test_azure_unrelated_409s_propagate():
    from etl_job_spark.commit_store import AzureBlobCommitStore

    client = StubAzureContainerClient()
    s = AzureBlobCommitStore("c", client=client)
    client.fail_next.append("LeaseIdMissing")
    with pytest.raises(Exception) as ei:
        s.write_if_absent("m/v1.json", b"x")
    assert not isinstance(ei.value, StoreConflict)


def test_azure_uri_scheme_and_fallback():
    from etl_job_spark.commit_store import AzureBlobCommitStore

    c = StubAzureContainerClient()
    s = AzureBlobCommitStore("cont", "cat", client=c, account="acct")
    assert (
        s.scoped("mart").uri("m/v1.json")
        == "abfss://cont@acct.dfs.core.windows.net/cat/mart/m/v1.json"
    )
    # no account: not engine-readable — planning falls back to read()
    assert AzureBlobCommitStore("cont", client=c).uri("x") is None


def test_catalog_end_to_end_over_stubbed_azure(spark, tmp_path):
    from etl_job_spark.commit_store import AzureBlobCommitStore
    from etl_job_spark.sql import execute_sql
    from etl_job_spark.txn import TransactionalCatalog

    store = AzureBlobCommitStore(
        "cont", "cats/c1", client=StubAzureContainerClient()
    )
    cat = TransactionalCatalog(str(tmp_path / "c1"), store=store)
    t = cat.table("mart")
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    execute_sql(spark, cat, "DELETE FROM mart WHERE k = 2")
    assert [
        (r.k, r.v)
        for r in execute_sql(spark, cat, "SELECT k, v FROM mart").collect()
    ] == [(1, "a")]
