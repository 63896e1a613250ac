"""K1 id parity and vector expression correctness."""

import math
import uuid

import pytest
from pyspark.sql import functions as F

from vectorflow_spark.functions.ids import (
    VECTORFLOW_NAMESPACE,
    content_id,
    uuid5_from_parts,
    uuid5_udf,
)
from vectorflow_spark.functions.vector import cosine_similarity, dot, l2_distance, l2_norm


def reference_generate_uuid_from_tuple(t):
    """Independent restatement of reference src/shared/utils.py:5-10."""
    return str(uuid.uuid5(VECTORFLOW_NAMESPACE, "-".join(map(str, t))))


class TestUuid5:
    def test_driver_side_parity(self):
        for t in [("hello", 0, "exact"), ("a-b", 12, "sentence"), ("", 5, "exact")]:
            assert uuid5_from_parts(*t) == reference_generate_uuid_from_tuple(t)

    def test_udf_parity(self, spark):
        rows = [("some text", 0, "exact"), ("más texto ñ", 128, "exact"), ("x" * 1000, 256, "sentence")]
        df = spark.createDataFrame(rows, "text string, offset int, tag string")
        got = df.select(uuid5_udf("text", "offset", "tag").alias("u")).collect()
        want = [reference_generate_uuid_from_tuple(t) for t in rows]
        assert [r.u for r in got] == want

    def test_uuid5_is_rfc4122(self):
        u = uuid.UUID(uuid5_from_parts("text", 1, "exact"))
        assert u.version == 5
        assert u.variant == uuid.RFC_4122

    def test_content_id_deterministic(self, spark):
        df = spark.createDataFrame([("abc", 1)], "text string, doc_id int")
        a = df.select(content_id("text", "doc_id").alias("c")).first().c
        b = df.select(content_id("text", "doc_id").alias("c")).first().c
        assert a == b
        assert len(a) == 32


class TestVectorFunctions:
    def test_dot_and_norm(self, spark):
        df = spark.createDataFrame(
            [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<float>, b array<float>"
        )
        r = df.select(
            dot("a", "b").alias("d"),
            l2_norm("a").alias("na"),
            l2_distance("a", "b").alias("dist"),
            cosine_similarity("a", "b").alias("cos"),
        ).first()
        assert r.d == pytest.approx(32.0)
        assert r.na == pytest.approx(math.sqrt(14.0))
        assert r.dist == pytest.approx(math.sqrt(27.0))
        assert r.cos == pytest.approx(32.0 / (math.sqrt(14) * math.sqrt(77)))

    def test_zero_norm_is_null(self, spark):
        df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], "a array<float>, b array<float>")
        assert df.select(cosine_similarity("a", "b").alias("c")).first().c is None
