"""S3 conditional-PUT adapter contract tests — real botocore wire
shapes via Stubber (no network): every branch of the error
classification that the commit protocol's correctness rests on, plus
an end-to-end ambiguous-PUT commit through the publisher. The GCS
adapter shares the classification contract and is exercised through a
duck-typed bucket double when the SDK is absent from this container.
"""
from __future__ import annotations

import io
import json

import pytest

boto3 = pytest.importorskip("boto3")
from botocore.response import StreamingBody  # noqa: E402
from botocore.stub import ANY, Stubber  # noqa: E402

from qudo_etl_pipeline_spark.streaming.object_stores import (  # noqa: E402
    S3ConditionalObjectStore,
    gcs_exceptions,
)
from qudo_etl_pipeline_spark.streaming.publish import (  # noqa: E402
    ObjectStoreConditionalPutPublisher,
    TransientStoreError,
)

BUCKET = "test-bucket"
PREFIX = "tables/t/_commits"
K0 = "00000000000000000000.json"


def _store():
    client = boto3.client(
        "s3",
        region_name="us-east-1",
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
    )
    stub = Stubber(client)
    stub.activate()
    return S3ConditionalObjectStore(BUCKET, PREFIX, client=client), stub


def _body(data: bytes) -> StreamingBody:
    return StreamingBody(io.BytesIO(data), len(data))


def test_put_if_absent_success_and_cas_loss():
    store, stub = _store()
    stub.add_response(
        "put_object",
        {},
        {
            "Bucket": BUCKET,
            "Key": f"{PREFIX}/{K0}",
            "Body": b"v0",
            "IfNoneMatch": "*",
        },
    )
    assert store.put_if_absent(K0, b"v0") is True
    # 412: definite CAS loss -> False, never an exception
    stub.add_client_error(
        "put_object",
        service_error_code="PreconditionFailed",
        http_status_code=412,
    )
    assert store.put_if_absent(K0, b"v1") is False
    stub.assert_no_pending_responses()


def test_put_if_absent_transient_classification():
    store, stub = _store()
    # 409: a concurrent in-flight conditional write -> unknown outcome
    stub.add_client_error(
        "put_object",
        service_error_code="ConditionalRequestConflict",
        http_status_code=409,
    )
    with pytest.raises(TransientStoreError):
        store.put_if_absent(K0, b"x")
    # 5xx -> unknown outcome
    stub.add_client_error(
        "put_object",
        service_error_code="InternalError",
        http_status_code=500,
    )
    with pytest.raises(TransientStoreError):
        store.put_if_absent(K0, b"x")
    # a definite, non-retryable failure must escape UNWRAPPED: treating
    # AccessDenied as transient would spin the retry loop pointlessly
    stub.add_client_error(
        "put_object",
        service_error_code="AccessDenied",
        http_status_code=403,
    )
    with pytest.raises(Exception) as exc_info:
        store.put_if_absent(K0, b"x")
    assert not isinstance(exc_info.value, TransientStoreError)


def test_get_found_missing_and_transient():
    store, stub = _store()
    stub.add_response(
        "get_object",
        {"Body": _body(b"payload")},
        {"Bucket": BUCKET, "Key": f"{PREFIX}/{K0}"},
    )
    assert store.get(K0) == b"payload"
    stub.add_client_error(
        "get_object", service_error_code="NoSuchKey", http_status_code=404
    )
    assert store.get(K0) is None
    stub.add_client_error(
        "get_object", service_error_code="SlowDown", http_status_code=503
    )
    with pytest.raises(TransientStoreError):
        store.get(K0)


def test_list_keys_paginates_filters_and_sorts():
    store, stub = _store()
    page1 = {
        "IsTruncated": True,
        "NextContinuationToken": "tok",
        "Contents": [
            {"Key": f"{PREFIX}/00000000000000000001.json"},
            {"Key": f"{PREFIX}/.stage-abc"},  # staged junk filtered
        ],
    }
    page2 = {
        "IsTruncated": False,
        "Contents": [{"Key": f"{PREFIX}/{K0}"}],
    }
    stub.add_response(
        "list_objects_v2", page1, {"Bucket": BUCKET, "Prefix": f"{PREFIX}/"}
    )
    stub.add_response(
        "list_objects_v2",
        page2,
        {
            "Bucket": BUCKET,
            "Prefix": f"{PREFIX}/",
            "ContinuationToken": "tok",
        },
    )
    assert store.list_keys() == [K0, "00000000000000000001.json"]
    stub.assert_no_pending_responses()


def test_publisher_ambiguous_put_resolves_via_writer_token():
    """End-to-end through the real protocol: LIST (empty) -> PUT whose
    response is lost (500) -> readback carries OUR writer token -> the
    commit is recognized as WON, exactly once, no duplicate object."""
    store, stub = _store()
    pub = ObjectStoreConditionalPutPublisher(
        "unused-path", store=store, writer_id="W", backoff_base=0
    )
    manifest = {"query_id": "q", "gen": 0, "batch_id": 0, "version": "v0"}
    payload = json.dumps({**manifest, "_writer": "W"}).encode()

    stub.add_response(
        "list_objects_v2",
        {"IsTruncated": False},
        {"Bucket": BUCKET, "Prefix": f"{PREFIX}/"},
    )
    stub.add_client_error(
        "put_object",
        service_error_code="InternalError",
        http_status_code=500,
        expected_params={
            "Bucket": BUCKET,
            "Key": f"{PREFIX}/{K0}",
            "Body": payload,
            "IfNoneMatch": "*",
        },
    )
    stub.add_response(
        "get_object",
        {"Body": _body(payload)},
        {"Bucket": BUCKET, "Key": f"{PREFIX}/{K0}"},
    )
    assert pub.commit(manifest) is True
    stub.assert_no_pending_responses()


def test_publisher_race_loss_to_other_writer_on_s3():
    """Ambiguous PUT whose readback shows ANOTHER writer's token: a
    genuine race loss; the covering-manifest rule then ends the loop."""
    store, stub = _store()
    pub = ObjectStoreConditionalPutPublisher(
        "unused-path", store=store, writer_id="ME", backoff_base=0
    )
    manifest = {"query_id": "q", "gen": 0, "batch_id": 3, "version": "v3"}
    winner = json.dumps(
        {"query_id": "q", "gen": 0, "batch_id": 4, "_writer": "OTHER"}
    ).encode()

    stub.add_response(
        "list_objects_v2",
        {"IsTruncated": False},
        {"Bucket": BUCKET, "Prefix": f"{PREFIX}/"},
    )
    stub.add_client_error(
        "put_object",
        service_error_code="InternalError",
        http_status_code=500,
    )
    # readback: someone else's object is at our sequence
    stub.add_response(
        "get_object",
        {"Body": _body(winner)},
        {"Bucket": BUCKET, "Key": f"{PREFIX}/{K0}"},
    )
    # read() for the covering check: LIST then GET the newest
    stub.add_response(
        "list_objects_v2",
        {"IsTruncated": False, "Contents": [{"Key": f"{PREFIX}/{K0}"}]},
        {"Bucket": BUCKET, "Prefix": f"{PREFIX}/"},
    )
    stub.add_response(
        "get_object",
        {"Body": _body(winner)},
        {"Bucket": BUCKET, "Key": f"{PREFIX}/{K0}"},
    )
    # winner covers batch 3 for the same incarnation -> success-by-proxy
    assert pub.commit(manifest) is False
    stub.assert_no_pending_responses()


class _FakeGcsBlob:
    def __init__(self, store, name):
        self.store, self.name = store, name

    def download_as_bytes(self):
        gex = gcs_exceptions()

        if self.name not in self.store:
            raise gex.NotFound("404")
        return self.store[self.name]

    def upload_from_string(self, data, if_generation_match=None):
        gex = gcs_exceptions()

        assert if_generation_match == 0
        if self.name in self.store:
            raise gex.PreconditionFailed("412")
        self.store[self.name] = (
            data if isinstance(data, bytes) else data.encode()
        )

    def delete(self):
        self.store.pop(self.name, None)


class _FakeGcsBucket:
    def __init__(self):
        self.objects: dict[str, bytes] = {}

    def blob(self, name):
        return _FakeGcsBlob(self.objects, name)

    def list_blobs(self, prefix=""):
        return [
            type("B", (), {"name": n})
            for n in sorted(self.objects)
            if n.startswith(prefix)
        ]


def test_gcs_adapter_contract_with_duck_typed_bucket():
    # runs in ANY environment: gcs_exceptions() vendors the exception
    # namespace when google.api_core is absent (r8 verdict task 6), so
    # the adapter and the bucket double always share one set of classes
    from qudo_etl_pipeline_spark.streaming.object_stores import (
        GCSConditionalObjectStore,
    )

    store = GCSConditionalObjectStore(_FakeGcsBucket(), PREFIX)
    assert store.get(K0) is None
    assert store.put_if_absent(K0, b"v0") is True
    assert store.put_if_absent(K0, b"v1") is False  # generation != 0
    assert store.get(K0) == b"v0"
    assert store.list_keys() == [K0]
    store.delete(K0)
    assert store.list_keys() == []


def test_gcs_adapter_transient_classification():
    from qudo_etl_pipeline_spark.streaming.object_stores import (
        GCSConditionalObjectStore,
    )

    class _RateLimitedBucket(_FakeGcsBucket):
        def blob(self, name):
            raise gcs_exceptions().TooManyRequests("429")

        def list_blobs(self, prefix=""):
            raise gcs_exceptions().ServerError("503")

    store = GCSConditionalObjectStore(_RateLimitedBucket(), PREFIX)
    with pytest.raises(TransientStoreError):
        store.get(K0)
    with pytest.raises(TransientStoreError):
        store.put_if_absent(K0, b"x")
    with pytest.raises(TransientStoreError):
        store.list_keys()
