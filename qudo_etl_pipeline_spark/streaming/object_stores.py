"""Cloud adapters for the conditional-PUT commit protocol.

:class:`~qudo_etl_pipeline_spark.streaming.publish.ObjectStore` is the
three-call surface the protocol needs (GET / conditional-create /
LIST); this module speaks it through the vendor SDKs using each
store's PUBLICLY DOCUMENTED conditional-write primitive:

- **S3**: ``PutObject`` with ``IfNoneMatch="*"`` — 412
  PreconditionFailed when the key already exists (the CAS loss), 409
  ConditionalRequestConflict while a concurrent conditional write to
  the same key is in flight (retryable: someone may or may not win —
  re-read). Both are in the S3 conditional-writes documentation.
- **GCS**: upload with ``if_generation_match=0`` — generation 0 means
  "only if the object does not exist"; 412 is the CAS loss.

Error classification is the adapter's whole job: a CAS loss must
surface as ``False`` (the protocol resolves it), an UNKNOWN outcome
(5xx / timeout / connection drop / in-flight conflict) must raise
:class:`TransientStoreError` so the publisher's readback-with-writer-
token resolution runs — misclassifying an unknown outcome as a clean
loss is exactly the double-commit bug the protocol exists to prevent.

Adapters are import-gated: constructing one without its SDK installed
raises ImportError at call time; importing this module never does.
"""

from __future__ import annotations

from qudo_etl_pipeline_spark.streaming.publish import (
    ObjectStore,
    TransientStoreError,
)

__all__ = [
    "S3ConditionalObjectStore",
    "GCSConditionalObjectStore",
    "gcs_exceptions",
]


class _VendoredGcsExceptions:
    """Minimal stand-in for ``google.api_core.exceptions`` so the GCS
    adapter's classification contract is testable (duck-typed bucket
    doubles) in environments without the SDK — the same role botocore's
    Stubber plays for the S3 adapter. Only the classes the adapter
    catches exist; with the real SDK installed this is never used.
    """

    class GoogleAPICallError(Exception):
        pass

    class NotFound(GoogleAPICallError):
        pass

    class PreconditionFailed(GoogleAPICallError):
        pass

    class TooManyRequests(GoogleAPICallError):
        pass

    class ServerError(GoogleAPICallError):
        pass

    class RetryError(Exception):
        pass


def gcs_exceptions():
    """``google.api_core.exceptions`` when installed, else the vendored
    stand-in — the single exception-namespace source for the adapter
    AND any test double, so both always raise/catch the same classes."""
    try:
        from google.api_core import exceptions as gex  # noqa: PLC0415

        return gex
    except ImportError:
        return _VendoredGcsExceptions

# S3 error codes whose outcome is unknown or retryable: the request
# may have mutated the store (or will succeed on retry), so the
# protocol must resolve by readback, never by assuming a clean loss
_S3_TRANSIENT_CODES = {
    "ConditionalRequestConflict",  # concurrent in-flight conditional
    "InternalError",
    "ServiceUnavailable",
    "SlowDown",
    "RequestTimeout",
    "Throttling",
    "ThrottlingException",
    "RequestLimitExceeded",
    "503",
}


class S3ConditionalObjectStore(ObjectStore):
    """S3-backed :class:`ObjectStore` using ``If-None-Match: *``
    conditional creates.

    ``client`` is injectable (a ``boto3`` S3 client, a
    ``botocore.stub.Stubber``-wrapped client in tests, or a
    LocalStack/minio endpooint client) — the adapter holds no
    credentials logic of its own. ``prefix`` should be the table's
    ``_commits/`` path; ``list_keys`` paginates and returns keys
    RELATIVE to it, sorted (S3 LIST is lexicographic, which is the
    protocol's sequence order already).
    """

    def __init__(self, bucket: str, prefix: str, client=None):
        if client is None:  # pragma: no cover - needs real credentials
            import boto3

            client = boto3.client("s3")
        self.bucket = bucket
        self.prefix = prefix.rstrip("/") + "/" if prefix else ""
        self.client = client

    def _full(self, key: str) -> str:
        return f"{self.prefix}{key}"

    def _classify(self, exc) -> None:
        """Re-raise ``exc`` as TransientStoreError when its outcome is
        unknown/retryable; return None when the caller should handle
        it (i.e. it is a definite, meaningful response)."""
        err = getattr(exc, "response", {}) or {}
        code = str(err.get("Error", {}).get("Code", ""))
        status = err.get("ResponseMetadata", {}).get("HTTPStatusCode")
        if (
            code in _S3_TRANSIENT_CODES
            or status == 409
            or (isinstance(status, int) and status >= 500)
        ):
            raise TransientStoreError(
                f"s3 transient outcome ({code or status})"
            ) from exc

    def get(self, key: str) -> bytes | None:
        import botocore.exceptions as bex

        try:
            resp = self.client.get_object(
                Bucket=self.bucket, Key=self._full(key)
            )
            return resp["Body"].read()
        except bex.ClientError as exc:
            code = exc.response.get("Error", {}).get("Code", "")
            if code in ("NoSuchKey", "404"):
                return None
            self._classify(exc)
            raise
        except (bex.ConnectionError, bex.HTTPClientError) as exc:
            raise TransientStoreError("s3 get: connection") from exc

    def put_if_absent(self, key: str, data: bytes) -> bool:
        import botocore.exceptions as bex

        try:
            self.client.put_object(
                Bucket=self.bucket,
                Key=self._full(key),
                Body=data,
                IfNoneMatch="*",
            )
            return True
        except bex.ClientError as exc:
            code = exc.response.get("Error", {}).get("Code", "")
            status = exc.response.get("ResponseMetadata", {}).get(
                "HTTPStatusCode"
            )
            if code == "PreconditionFailed" or status == 412:
                return False  # definite CAS loss: the key exists
            self._classify(exc)
            raise
        except (bex.ConnectionError, bex.HTTPClientError) as exc:
            # the classic ambiguous PUT: the object may exist
            raise TransientStoreError("s3 put: connection") from exc

    def list_keys(self) -> list[str]:
        import botocore.exceptions as bex

        keys: list[str] = []
        token: str | None = None
        try:
            while True:
                kwargs = {"Bucket": self.bucket, "Prefix": self.prefix}
                if token:
                    kwargs["ContinuationToken"] = token
                resp = self.client.list_objects_v2(**kwargs)
                for obj in resp.get("Contents", []):
                    rel = obj["Key"][len(self.prefix):]
                    if rel.endswith(".json"):
                        keys.append(rel)
                if not resp.get("IsTruncated"):
                    break
                token = resp.get("NextContinuationToken")
        except bex.ClientError as exc:
            self._classify(exc)
            raise
        except (bex.ConnectionError, bex.HTTPClientError) as exc:
            raise TransientStoreError("s3 list: connection") from exc
        return sorted(keys)

    def delete(self, key: str) -> None:
        import botocore.exceptions as bex

        try:
            self.client.delete_object(
                Bucket=self.bucket, Key=self._full(key)
            )
        except bex.ClientError as exc:
            self._classify(exc)
            raise
        except (bex.ConnectionError, bex.HTTPClientError) as exc:
            raise TransientStoreError("s3 delete: connection") from exc


class GCSConditionalObjectStore(ObjectStore):
    """GCS-backed :class:`ObjectStore` using ``if_generation_match=0``
    conditional creates (generation 0 == "must not exist" — the
    documented GCS precondition idiom).

    Same classification contract as the S3 adapter: 412 is a definite
    CAS loss (False); 429/5xx/connection drops are
    :class:`TransientStoreError` (resolve by readback). ``bucket`` is
    injectable (a ``google.cloud.storage.Bucket`` or a test double
    exposing ``blob``/``list_blobs``).
    """

    def __init__(self, bucket, prefix: str):
        self.bucket = bucket
        self.prefix = prefix.rstrip("/") + "/" if prefix else ""

    def _exceptions(self):
        return gcs_exceptions()

    def get(self, key: str) -> bytes | None:
        gex = self._exceptions()
        try:
            return self.bucket.blob(f"{self.prefix}{key}").download_as_bytes()
        except gex.NotFound:
            return None
        except (
            gex.TooManyRequests,
            gex.ServerError,
            gex.RetryError,
        ) as exc:
            raise TransientStoreError("gcs get") from exc

    def put_if_absent(self, key: str, data: bytes) -> bool:
        gex = self._exceptions()
        try:
            self.bucket.blob(f"{self.prefix}{key}").upload_from_string(
                data, if_generation_match=0
            )
            return True
        except gex.PreconditionFailed:
            return False
        except (
            gex.TooManyRequests,
            gex.ServerError,
            gex.RetryError,
        ) as exc:
            raise TransientStoreError("gcs put") from exc

    def list_keys(self) -> list[str]:
        gex = self._exceptions()
        try:
            blobs = self.bucket.list_blobs(prefix=self.prefix)
            return sorted(
                b.name[len(self.prefix):]
                for b in blobs
                if b.name.endswith(".json")
            )
        except (
            gex.TooManyRequests,
            gex.ServerError,
            gex.RetryError,
        ) as exc:
            raise TransientStoreError("gcs list") from exc

    def delete(self, key: str) -> None:
        gex = self._exceptions()
        try:
            self.bucket.blob(f"{self.prefix}{key}").delete()
        except gex.NotFound:
            pass
        except (
            gex.TooManyRequests,
            gex.ServerError,
            gex.RetryError,
        ) as exc:
            raise TransientStoreError("gcs delete") from exc
