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
        assert "unsupported" in resp.error

    def test_embed_empty_file_400(self, client, tmp_path):
        path = _write(tmp_path, "empty.txt", b"")
        resp = client.embed(path)
        assert resp.status_code == 400
        assert "empty" in resp.error


class TestUpload:
    def test_upload_classifies_like_the_jobs_endpoint(self, client, tmp_path):
        good1 = _write(tmp_path, "a.txt", b"first document body text")
        good2 = _write(tmp_path, "b.md", b"# title\n\nsome prose")
        bad = _write(tmp_path, "c.exe", b"MZbinary")
        empty = _write(tmp_path, "d.txt", b"")
        dup_dir = tmp_path / "other"
        dup_dir.mkdir()
        dup = dup_dir / "a.txt"
        dup.write_bytes(b"same filename, different dir")
        resp = client.upload([good1, good2, bad, empty, str(dup)])
        assert resp.status_code == 200
        assert [j.filename for j in resp.successful_uploads] == ["a.txt", "b.md"]
        assert resp.failed_uploads == ["c.exe"]
        assert resp.empty_files_count == 1
        assert resp.duplicate_files_count == 1
        # every successful upload has a completed job
        for j in resp.successful_uploads:
            assert client.get_job_status(j.job_id).job_status == JobStatus.COMPLETED.value

    def test_upload_all_bad_is_400(self, client, tmp_path):
        bad = _write(tmp_path, "x.bin", b"\x00\x01")
        resp = client.upload([bad])
        assert resp.status_code == 400
        assert resp.successful_uploads is None


class TestStatusLookup:
    def test_multi_status_and_missing(self, client, tmp_path):
        p = _write(tmp_path, "s.txt", b"content for the job")
        r = client.embed(p)
        multi = client.get_job_statuses([r.job_id, 999])
        assert [j.job_id for j in multi.jobs] == [r.job_id]
        missing = client.get_job_status(999)
        assert missing.status_code == 404

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
