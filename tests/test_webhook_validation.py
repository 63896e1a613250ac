"""F1 chunk-validation webhook tests (reference src/worker/worker.py:156-172).

The operator's transport is injectable; these tests exercise (a) the
keep-only-returned-ids filter semantics, (b) fail-batch-on-error parity —
a transport exception drops exactly that batch and the job continues, and
(c) the real HTTP transport against a local stdlib server, including the
timeout -> failed-batch path.
"""

import http.server
import json
import threading
import time

import pytest
from pyspark.sql import functions as F

from vectorflow_spark.operators.filters import (
    http_validation_transport,
    validate_chunks_webhook,
)


# transports are built as closures (not module-level defs): cloudpickle
# ships closures by value, while a module-level function from an
# unimportable test module would pickle by reference and fail on workers


def _make_approve_even():
    def approve(rows):
        return [r["id"] for r in rows if int(r["id"]) % 2 == 0]

    return approve


def _make_fail_low_ids():
    def transport(rows):
        if any(int(r["id"]) < 10 for r in rows):
            raise TimeoutError("simulated 30s validation timeout")
        return [r["id"] for r in rows]

    return transport


@pytest.fixture(scope="module")
def chunks(spark):
    # one ordered partition so the 10-row batch boundaries are deterministic
    return spark.range(0, 30, 1, 1).select(
        F.col("id").alias("chunk_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


class TestValidateChunksWebhook:
    def test_keeps_only_returned_ids(self, chunks):
        out = validate_chunks_webhook(chunks, _make_approve_even(), batch_size=7)
        ids = sorted(int(r.chunk_id) for r in out.collect())
        assert ids == list(range(0, 30, 2))

    def test_transport_error_fails_that_batch_only(self, chunks):
        """Batches [0..9] raise (reference: timeout marks the batch failed);
        the remaining batches still validate — the job never dies."""
        out = validate_chunks_webhook(chunks, _make_fail_low_ids(), batch_size=10)
        ids = sorted(int(r.chunk_id) for r in out.collect())
        assert ids == list(range(10, 30))

    def test_schema_preserved(self, chunks):
        out = validate_chunks_webhook(chunks, _make_approve_even())
        assert out.schema == chunks.schema


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        if self.path == "/slow":
            time.sleep(3)
        # server-side rule: reject texts ending in '7'
        ids = [c["id"] for c in body["chunks"] if not c["text"].endswith("7")]
        out = json.dumps({"valid_ids": ids}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestHttpTransport:
    def test_post_roundtrip(self, chunks, server):
        transport = http_validation_transport(f"{server}/validate")
        out = validate_chunks_webhook(chunks, transport, batch_size=10)
        ids = sorted(int(r.chunk_id) for r in out.collect())
        assert ids == [i for i in range(30) if not str(i).endswith("7")]

    def test_timeout_fails_batches(self, chunks, server):
        """1 s client timeout vs 3 s server delay: every batch times out,
        every chunk is dropped, and the query still completes."""
        transport = http_validation_transport(f"{server}/slow", timeout=1.0)
        out = validate_chunks_webhook(chunks, transport, batch_size=15)
        assert out.count() == 0


class TestRequestValidation:
    """F2: ordered first-failure dispatch parity with
    reference src/api/validators.py:34-46."""

    def _req(self, spark, **over):
        base = {
            "vectorflow_key": "key-0",
            "embeddings_type": "open_ai",
            "vector_db_type": "qdrant",
            "vector_db_index": "idx",
            "vector_db_key": "dbk",
            "webhook_url": None,
            "webhook_key": None,
            "has_source_data": True,
            "presigned_url": None,
        }
        base.update(over)
        schema = (
            "vectorflow_key string, embeddings_type string, vector_db_type string, "
            "vector_db_index string, vector_db_key string, webhook_url string, "
            "webhook_key string, has_source_data boolean, presigned_url string"
        )
        return spark.createDataFrame([tuple(base[k] for k in base)], schema)

    def _run(self, spark, checks=None, valid_keys=("key-0",), local=False, **over):
        from vectorflow_spark.operators.filters import EMBED_CHECKS, validate_requests

        df = validate_requests(
            self._req(spark, **over),
            checks=checks or EMBED_CHECKS,
            valid_keys=valid_keys,
            local_vector_db=local,
        )
        return df.select("failed_validation", "error", "status_code").first()

    def test_accepted(self, spark):
        r = self._run(spark)
        assert (r.failed_validation, r.error, r.status_code) == (None, None, 200)

    def test_cred_fails_first_even_if_everything_else_fails(self, spark):
        # ordered dispatch: CRED wins over the later failures (validators.py:45)
        r = self._run(spark, vectorflow_key="wrong", embeddings_type=None, has_source_data=False)
        assert (r.failed_validation, r.status_code) == ("CRED", 401)
        assert r.error == "Invalid credentials"

    def test_metadata_requires_db_key_unless_local(self, spark):
        assert self._run(spark, vector_db_key=None).failed_validation == "METADATA"
        assert self._run(spark, vector_db_key=None, local=True).failed_validation is None

    def test_embedding_type_gate(self, spark):
        r = self._run(spark, embeddings_type="cohere")
        assert (r.failed_validation, r.status_code) == ("EMBEDDING_TYPE", 400)
        assert "hugging_face_model_name" in r.error

    def test_webhook_url_without_key(self, spark):
        r = self._run(spark, webhook_url="https://x")
        assert (r.failed_validation, r.error) == ("WEBHOOK", "Webhook URL provided but no webhook key")
        assert self._run(spark, webhook_url="https://x", webhook_key="k").failed_validation is None

    def test_jobs_checks_use_has_files(self, spark):
        from vectorflow_spark.operators.filters import JOBS_CHECKS

        r = self._run(spark, checks=JOBS_CHECKS, has_source_data=False)
        assert (r.failed_validation, r.error) == ("HAS_FILES", "No file part in the request")

    def test_presigned_variant(self, spark):
        checks = ("CRED", "METADATA", "PRE_SIGNED")
        r = self._run(spark, checks=checks)
        assert (r.failed_validation, r.status_code) == ("PRE_SIGNED", 400)
        assert self._run(spark, checks=checks, presigned_url="https://s3/x").failed_validation is None
