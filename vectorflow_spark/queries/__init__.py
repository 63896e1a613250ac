"""Driver-contract queries, split per family; importing this package
registers every query in QUERIES/ORACLE (see _core for the registry and
the correctness discipline notes)."""

from vectorflow_spark.queries._core import ORACLE, QUERIES, _t, query

from vectorflow_spark.queries import pipeline as _pipeline  # noqa: E402,F401
from vectorflow_spark.queries import similarity as _similarity  # noqa: E402,F401
from vectorflow_spark.queries import dedup as _dedup  # noqa: E402,F401
from vectorflow_spark.queries import text as _text  # noqa: E402,F401
from vectorflow_spark.queries import relational as _relational  # noqa: E402,F401
from vectorflow_spark.queries import multimodal as _multimodal  # noqa: E402,F401
from vectorflow_spark.queries import temporal as _temporal  # noqa: E402,F401
from vectorflow_spark.queries import curation as _curation  # noqa: E402,F401
from vectorflow_spark.queries import tpch as _tpch  # noqa: E402,F401
from vectorflow_spark.queries import events as _events  # noqa: E402,F401
from vectorflow_spark.queries import analytics as _analytics  # noqa: E402,F401
from vectorflow_spark.queries import analytics2 as _analytics2  # noqa: E402,F401
from vectorflow_spark.queries import lines as _lines  # noqa: E402,F401
from vectorflow_spark.queries import formats as _formats  # noqa: E402,F401
from vectorflow_spark.queries import audio as _audio  # noqa: E402,F401
from vectorflow_spark.queries import storage as _storage  # noqa: E402,F401

# legacy re-exports used by tests
from vectorflow_spark.queries.pipeline import _C1_SQL, _C3_SQL, _C4_SQL, _C5_SQL  # noqa: E402
from vectorflow_spark.queries.lines import _bow_weights  # noqa: E402

__all__ = ["ORACLE", "QUERIES", "_t", "query"]
