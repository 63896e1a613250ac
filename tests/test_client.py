"""Client façade (vectorflow_spark/client.py): the reference's pip-client
call shapes — embed / upload / get_job_status(es) — against the Spark
engine, with the /jobs classification rules (unsupported -> failed,
empty -> counted, duplicate filename -> counted, oversized -> failed)."""

from __future__ import annotations

import pytest

from vectorflow_spark.client import Response, Vectorflow
from vectorflow_spark.config import JobStatus, PipelineConfig


@pytest.fixture()
def client(spark, tmp_path):
    return Vectorflow(
        spark,
        cfg=PipelineConfig(embeddings_type="deterministic", embedding_dim=8),
        job_root=str(tmp_path / "jobs"),
    )


def _write(tmp_path, name: str, content: bytes) -> str:
    p = tmp_path / name
    p.write_bytes(content)
    return str(p)


class TestEmbed:
    def test_embed_roundtrip(self, client, spark, tmp_path):
        path = _write(tmp_path, "doc.txt", b"hello spark pipeline\nsecond line here")
        resp = client.embed(path)
        assert resp.status_code == 200 and resp.job_id == 1
        status = client.get_job_status(resp.job_id)
        assert status.job_status == JobStatus.COMPLETED.value
        vecs = client.read_job_vectors(resp.job_id)
        assert set(vecs.columns) == {"id", "source_data", "source_document", "embeddings"}
        rows = vecs.collect()
        assert len(rows) > 0
        assert all(len(r.embeddings) == 8 for r in rows)
        assert all(r.source_document == "doc.txt" for r in rows)

    def test_embed_unsupported_extension_400(self, client, tmp_path):
        path = _write(tmp_path, "data.csv", b"a,b,c")
        resp = client.embed(path)
        assert resp.status_code == 400
        assert "not a TXT, PDF, Markdown or DOCX" in resp.error  # reference message

    def test_embed_zero_byte_file_creates_a_job(self, client, tmp_path):
        """Reference parity: a 0-byte file with a valid name passes every
        /embed check and creates a job ('empty' means empty FILENAME in
        the reference, not zero bytes)."""
        path = _write(tmp_path, "empty.txt", b"")
        resp = client.embed(path)
        assert resp.status_code == 200 and resp.job_id is not None
        # zero surviving documents -> NOT_STARTED per job_status_row
        assert client.get_job_status(resp.job_id).job_status == JobStatus.NOT_STARTED.value

    def test_embed_oversize_is_413(self, spark, tmp_path):
        small_cap = Vectorflow(
            spark,
            cfg=PipelineConfig(embeddings_type="deterministic", max_file_size_bytes=10),
            job_root=str(tmp_path / "jobs413"),
        )
        path = _write(tmp_path, "big.txt", b"x" * 100)
        resp = small_cap.embed(path)
        assert resp.status_code == 413
        assert "/jobs" in resp.error  # the reference message points at /jobs


class TestUpload:
    def test_upload_classifies_like_the_jobs_endpoint(self, client, tmp_path):
        good1 = _write(tmp_path, "a.txt", b"first document body text")
        good2 = _write(tmp_path, "b.md", b"# title\n\nsome prose")
        bad = _write(tmp_path, "c.exe", b"MZbinary")
        zero = _write(tmp_path, "d.txt", b"")
        dup_dir = tmp_path / "other"
        dup_dir.mkdir()
        dup = dup_dir / "a.txt"
        dup.write_bytes(b"same filename, different dir")
        resp = client.upload([good1, good2, bad, zero, str(dup)])
        assert resp.status_code == 200 and resp.message == "Files processed"
        # reference parity: the zero-byte file SUCCEEDS (no size/content
        # check on /jobs); the second a.txt is a case-sensitive duplicate
        # of an earlier SUCCESS
        assert [j.filename for j in resp.successful_uploads] == ["a.txt", "b.md", "d.txt"]
        assert resp.failed_uploads == ["c.exe"]
        assert resp.empty_files_count == 0
        assert resp.duplicate_files_count == 1
        for j in resp.successful_uploads[:2]:
            assert client.get_job_status(j.job_id).job_status == JobStatus.COMPLETED.value

    def test_case_sensitive_duplicates_and_failed_first(self, client, tmp_path):
        """Reference parity details: 'A.txt' and 'a.txt' are DIFFERENT
        filenames (two jobs); a name that previously FAILED is not a
        duplicate when retried valid."""
        a1 = _write(tmp_path, "A.txt", b"uppercase doc body")
        a2 = _write(tmp_path, "a.txt", b"lowercase doc body")
        resp = client.upload([a1, a2])
        assert [j.filename for j in resp.successful_uploads] == ["A.txt", "a.txt"]
        assert resp.duplicate_files_count == 0

    def test_upload_all_bad_still_200(self, client, tmp_path):
        """Reference parity: /jobs always returns 200 'Files processed';
        the caller reads failed_uploads."""
        bad = _write(tmp_path, "x.bin", b"\x00\x01")
        resp = client.upload([bad])
        assert resp.status_code == 200
        assert resp.successful_uploads is None
        assert resp.failed_uploads == ["x.bin"]


class TestStatusLookup:
    def test_multi_status_and_missing(self, client, tmp_path):
        p = _write(tmp_path, "s.txt", b"content for the job")
        r = client.embed(p)
        multi = client.get_job_statuses([r.job_id, 999])
        assert [j.job_id for j in multi.jobs] == [r.job_id]
        missing = client.get_job_status(999)
        assert missing.status_code == 404
        # reference parity: /jobs/status with NO matches is a 404
        none_found = client.get_job_statuses([998, 999])
        assert none_found.status_code == 404 and none_found.error == "Jobs not found"

    def test_registry_survives_new_client_instance(self, client, spark, tmp_path):
        p = _write(tmp_path, "s.txt", b"content for the job")
        r = client.embed(p)
        fresh = Vectorflow(spark, cfg=client.cfg, job_root=client.job_root)
        assert fresh.get_job_status(r.job_id).job_status == JobStatus.COMPLETED.value

    def test_response_shape_matches_reference_fields(self):
        # the porting contract: same attribute names as the reference client
        r = Response()
        for f in (
            "error", "message", "successful_uploads", "failed_uploads",
            "empty_files_count", "duplicate_files_count", "job_id", "jobs",
            "job_status", "status_code",
        ):
            assert hasattr(r, f)
