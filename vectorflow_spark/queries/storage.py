"""Storage-layer gates: the engine's own Parquet internals, engine-vs-engine.

Four surfaces of sources/parquetmini.py (thrift footer parser, stats walk,
schema mapper, byte-level page decoder + operators/snappymini.py) are each
proven against INDEPENDENTLY derived facts on the same bytes:

  * q_parquet_meta — footer statistics vs the data itself: per-column
    num_values / null_count / min / max parsed from the thrift footers of
    the sf tables must equal COUNT/MIN/MAX computed relationally by DuckDB
    over the same files. A hash match proves the compact-protocol walk,
    the typed stat decode, and the row-group aggregation.
  * q_parquet_schema — our schema-tree walk + SQL type mapping vs
    ``typeof()`` in DuckDB, column by column, ordinal by ordinal (incl.
    the nested FLOAT[] list shape of embeddings).
  * q_parquet_rawscan — full byte-level column decode (footer offsets ->
    snappy pages -> levels -> dictionaries -> values) of a Spark-written
    multi-file corpus vs the relational values.
  * q_parquet_prune — min/max row-group pruning: the scan-planning
    decision recomputed from OUR parsed stats must match per-bucket
    min/max/count ground truth (the audit that pushdown planning at 100 TB
    is trustworthy).
  * q_snappy_roundtrip — the distributed compress->decompress identity of
    our snappy codec over every document.

Scale shapes: footer scans parallelize over FILES (2 ranged reads each, no
data pages touched); raw scans over (file, row_group) — both exactly how a
1000-executor catalog crawl or scan shards. The bucketed-orders corpus is a
build-once cached fixture (same discipline as _cdx_corpus_dir) so the
timed body of the scan gates is the read path, not the writer.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectorflow_spark.queries._core import _t, query

# (column, kind) per table: kind 'num' = plain numeric leaf, 'ts' =
# timestamp-micros leaf (stats live as epoch micros), 'elems' = repeated
# float leaf (the FLOAT[] element). Strings are covered by q_parquet_rawscan
# and q_parquet_schema, not by the stats gate (their stats may legally be
# truncated by writers).
_META_COLS: dict[str, list[tuple[str, str]]] = {
    "customer": [("c_custkey", "num"), ("c_nationkey", "num"), ("c_acctbal", "num")],
    "documents": [("doc_id", "num"), ("n_chars", "num")],
    "embeddings": [("vec_id", "num"), ("label", "num"), ("embedding.list.element", "elems")],
    "events": [("event_id", "num"), ("user_id", "num"), ("value", "num"), ("ts", "ts")],
    "lineitem": [
        ("l_orderkey", "num"),
        ("l_partkey", "num"),
        ("l_suppkey", "num"),
        ("l_linenumber", "num"),
        ("l_quantity", "num"),
        ("l_extendedprice", "num"),
        ("l_discount", "num"),
        ("l_tax", "num"),
        ("l_shipdate", "ts"),
    ],
    "nation": [("n_nationkey", "num"), ("n_regionkey", "num")],
    "orders": [("o_orderkey", "num"), ("o_custkey", "num"), ("o_totalprice", "num"), ("o_orderdate", "ts")],
    "part": [("p_partkey", "num"), ("p_size", "num"), ("p_retailprice", "num")],
    "region": [("r_regionkey", "num")],
    "supplier": [("s_suppkey", "num"), ("s_nationkey", "num"), ("s_acctbal", "num")],
}

# full SQL-facing column lists in file order (the schema gate's ground set)
_ALL_COLS: dict[str, list[str]] = {
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "lineitem": [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "orders": [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "region": ["r_regionkey", "r_name"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
}


def _meta_sql() -> str:
    terms = []
    for t in sorted(_META_COLS):
        for c, kind in _META_COLS[t]:
            if kind == "num":
                mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
                nv = "CAST(COUNT(*) AS BIGINT)"
                nn = f"CAST(COUNT(*) - COUNT({c}) AS BIGINT)"
            elif kind == "ts":
                mn = f"CAST(epoch_us(MIN({c})) AS DOUBLE)"
                mx = f"CAST(epoch_us(MAX({c})) AS DOUBLE)"
                nv = "CAST(COUNT(*) AS BIGINT)"
                nn = f"CAST(COUNT(*) - COUNT({c}) AS BIGINT)"
            else:  # repeated float leaf: one footer value slot per element
                mn = (
                    "CAST((SELECT MIN(e) FROM (SELECT UNNEST(embedding) AS e"
                    f" FROM {t})) AS DOUBLE)"
                )
                mx = (
                    "CAST((SELECT MAX(e) FROM (SELECT UNNEST(embedding) AS e"
                    f" FROM {t})) AS DOUBLE)"
                )
                nv = "CAST(SUM(len(embedding)) AS BIGINT)"
                nn = "CAST(0 AS BIGINT)"
            terms.append(
                f"SELECT '{t}' AS tbl, '{c}' AS col, {nv} AS n_values,"
                f" {nn} AS n_nulls, {mn} AS min_v, {mx} AS max_v FROM {t}"
            )
    return "\nUNION ALL\n".join(terms)


@query("q_parquet_meta", _meta_sql())
def q_parquet_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thrift-footer statistics vs the data: parse every sf table's footer
    with OUR compact-protocol reader (distributed, one task per file, two
    ranged reads each — the object-store catalog crawl) and emit per-column
    num_values / null_count / min / max aggregated across row groups; the
    oracle recomputes the same facts relationally. Proves the parser reads
    the true bytes — wrong offsets, wrong zigzag, wrong stat typing all
    hash-mismatch. The 100-TB use: these rows ARE the external row-group
    index that q_parquet_prune plans from."""
    from vectorflow_spark.sources.parquetmini import footer_meta_scan

    paths = [f"{sf_dir}/{t}.parquet" for t in sorted(_META_COLS)]
    want = [f"{t}|{c}" for t in _META_COLS for c, _ in _META_COLS[t]]
    scan = footer_meta_scan(spark, paths).withColumn(
        "tbl", F.regexp_extract("file_name", r"([^/]+)\.parquet$", 1)
    )
    sel = scan.filter(F.concat_ws("|", "tbl", "path_in_schema").isin(want))
    return (
        sel.groupBy("tbl", F.col("path_in_schema").alias("col"))
        .agg(
            F.sum("num_values").cast("bigint").alias("n_values"),
            F.sum("stats_null_count").cast("bigint").alias("n_nulls"),
            F.min("stats_min_num").alias("min_v"),
            F.max("stats_max_num").alias("max_v"),
        )
    )


def _schema_sql() -> str:
    terms = []
    for t in sorted(_ALL_COLS):
        for i, c in enumerate(_ALL_COLS[t]):
            terms.append(
                f"(SELECT '{t}' AS tbl, '{c}' AS col, CAST({i} AS BIGINT) AS ordinal,"
                f" typeof({c}) AS sql_type FROM {t} LIMIT 1)"
            )
    return "\nUNION ALL\n".join(terms)


@query("q_parquet_schema", _schema_sql())
def q_parquet_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-tree walk + SQL type mapping vs the engine: for every table
    our footer parser emits (column, ordinal, mapped SQL type) — including
    the 3-level LIST group of embeddings mapping to FLOAT[] — and the
    oracle derives the same rows from DuckDB's ``typeof``. Distributed one
    task per file like the catalog crawl."""
    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from vectorflow_spark.sources.parquetmini import (
        duckdb_type_of,
        read_file_meta,
        top_level_fields,
    )

    out_schema = StructType(
        [
            StructField("tbl", StringType()),
            StructField("col", StringType()),
            StructField("ordinal", LongType()),
            StructField("sql_type", StringType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                meta = read_file_meta(p)
                t = os.path.basename(p)[: -len(".parquet")]
                for i, name in enumerate(top_level_fields(meta)):
                    rows.append((t, name, i, duckdb_type_of(meta, name)))
            yield pd.DataFrame(rows, columns=["tbl", "col", "ordinal", "sql_type"])

    paths = [(f"{sf_dir}/{t}.parquet",) for t in sorted(_ALL_COLS)]
    pdf = spark.createDataFrame(paths, ["path"])
    return pdf.repartition(len(paths), "path").mapInPandas(gen, out_schema)


# bump when the fixture layout (bucket width, columns, writer conf) changes:
# the cached dir name carries the rev so stale corpora are never reused
_PQFIX_REV = 1
_BUCKET = 2048


def _bucketed_orders_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once bucketed-orders parquet corpus shared by q_parquet_rawscan
    and q_parquet_prune: orders partitioned by ``o_orderkey div 2048`` into
    one Spark-written file per bucket (hash repartition on the partition
    key -> exactly one task owns each bucket dir). Value-derived buckets
    make file membership reconstructable in pure SQL — no reliance on row
    order. Timestamps are written as TIMESTAMP_MICROS (not Spark's INT96
    default) so the byte-level decoder's supported-type contract holds;
    the conf is restored after the write."""
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_pqfix_r{_PQFIX_REV}_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    orders = _t(spark, sf_dir, "orders", split=True).withColumn(
        "bucket", F.expr(f"o_orderkey div {_BUCKET}")
    )
    key = "spark.sql.parquet.outputTimestampType"
    old = spark.conf.get(key, "INT96")
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        orders.repartition("bucket").write.mode("overwrite").partitionBy("bucket").parquet(
            out_dir
        )
    finally:
        spark.conf.set(key, old)
    with open(marker, "w", encoding="utf-8") as f:
        f.write("built by _bucketed_orders_dir\n")
    return out_dir


def _fixture_files(out_dir: str) -> list[str]:
    files = sorted(_glob.glob(os.path.join(out_dir, "bucket=*", "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {out_dir}")
    return files


@query(
    "q_parquet_rawscan",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
           epoch_us(o_orderdate) AS odate_us
    FROM orders
    """,
)
def q_parquet_rawscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level column decode of a Spark-written multi-file corpus: every
    value of five orders columns recovered by OUR footer walk -> chunk
    ranged-read -> snappy (our codec) -> page headers -> RLE/bit-packed
    levels -> dictionary/PLAIN values, one task per (file, row_group); the
    oracle reads the same logical rows relationally. A hash match proves
    the whole storage stack on parquet-java-written bytes (dictionary
    fallback pages, v1 pages, CRC-bearing headers), not just on arrow's.
    Timestamps surface as epoch micros so both engines compare integers."""
    from vectorflow_spark.sources.parquetmini import raw_scan

    files = _fixture_files(_bucketed_orders_dir(spark, sf_dir))
    df = raw_scan(
        spark,
        files,
        ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderdate"],
    )
    # UTC session: ntz -> timestamp is value-preserving (same presentation
    # rule as _t's events handling)
    return df.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderstatus",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("odate_us"),
    )


@query(
    "q_parquet_prune",
    f"""
    SELECT CAST(o_orderkey // {_BUCKET} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           (MAX(o_orderkey) >= 3000 AND MIN(o_orderkey) <= 9000) AS kept
    FROM orders GROUP BY 1
    """,
)
def q_parquet_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scan-planning audit: harvest per-file o_orderkey stats from OUR
    footer parser over the bucketed corpus (no data pages read — the
    planning cost model at 100 TB) and decide which files a
    ``BETWEEN 3000 AND 9000`` scan may skip. The oracle recomputes each
    bucket's true min/max/count from the data; a hash match proves the
    pruning decision would never skip a file that holds matching rows —
    the property that makes stats-based pushdown safe to trust at scale."""
    from vectorflow_spark.sources.parquetmini import footer_meta_scan

    files = _fixture_files(_bucketed_orders_dir(spark, sf_dir))
    scan = footer_meta_scan(spark, files).filter(
        F.col("path_in_schema") == "o_orderkey"
    )
    per_bucket = (
        scan.withColumn(
            "bucket", F.regexp_extract("file_name", r"bucket=(\d+)", 1).cast("bigint")
        )
        .groupBy("bucket")
        .agg(
            (F.sum("num_values") - F.sum("stats_null_count")).cast("bigint").alias("n_rows"),
            F.min("stats_min_num").cast("bigint").alias("min_key"),
            F.max("stats_max_num").cast("bigint").alias("max_key"),
        )
    )
    return per_bucket.select(
        "bucket",
        "n_rows",
        "min_key",
        "max_key",
        ((F.col("max_key") >= 3000) & (F.col("min_key") <= 9000)).alias("kept"),
    )


@query(
    "q_parquet_write_roundtrip",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def q_parquet_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine WRITES its own storage format byte-level: the documents
    table serialized by OUR pure-Python parquet writer (thrift-compact
    footer encoder, PLAIN v1 pages, RLE def levels, our snappy, typed
    stats, column_orders) through the distributed rename-commit sink — one
    file per task, no driver data movement — then read back by Spark's own
    parquet-java reader. The oracle is the table itself, so a hash match
    proves a fully independent reader accepts every byte we emit. Unit
    tests additionally pin pyarrow and DuckDB over the same output, and
    our own decoder closes the loop. Per-process output dir, wiped before
    each run (same discipline as q_warc_scan: rename-commit only replaces
    files the current run produces)."""
    from vectorflow_spark.sources.parquetmini import write_parquet_corpus

    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_pqwrite_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = _t(spark, sf_dir, "documents", split=True)
    kinds = {"doc_id": "i64", "text": "str", "lang": "str", "source": "str", "n_chars": "i64"}
    write_parquet_corpus(docs, out_dir, kinds).count()  # the write IS this action
    return spark.read.parquet(out_dir).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


@query(
    "q_parquet_delta_roundtrip",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def q_parquet_delta_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The writer's MODERN encoding tier: the documents table serialized by
    OUR writer as DATA_PAGE_V2 pages with DELTA encodings —
    DELTA_BINARY_PACKED for the int columns, DELTA_BYTE_ARRAY (front
    coding) for the strings — sorted within each task by doc_id so the
    delta streams are tight, then read back by Spark's parquet-java
    reader with the table itself as the oracle. v2 pages keep def levels
    uncompressed with explicit byte lengths and compress only the values
    section; a hash match proves an independent reader accepts our v2
    page headers, CRC placement, delta headers, miniblock widths and
    front-coded suffix streams byte-for-byte. Unit tests additionally pin
    pyarrow + DuckDB + our own decoder over the same writer, and pin the
    size win vs PLAIN on sorted keys."""
    from vectorflow_spark.sources.parquetmini import write_parquet_corpus

    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_pqdelta_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = _t(spark, sf_dir, "documents", split=True).sortWithinPartitions("doc_id")
    kinds = {"doc_id": "i64", "text": "str", "lang": "str", "source": "str", "n_chars": "i64"}
    write_parquet_corpus(
        docs.select(*kinds), out_dir, kinds,
        delta_columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).count()  # the write IS this action
    return spark.read.parquet(out_dir).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


@query("q_snappy_roundtrip", "SELECT doc_id, text FROM documents")
def q_snappy_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed identity proof of the pure-Python snappy codec: every
    document compressed and decompressed by OUR encoder/decoder inside an
    Arrow-batched UDF; the oracle is the text itself. Unit tests pin both
    halves against native snappy — this gate proves the same kernels under
    executor parallelism."""
    import pandas as pd
    from pyspark.sql.types import StringType

    from vectorflow_spark.operators.snappymini import compress, decompress

    rt = F.pandas_udf(
        lambda texts: texts.map(
            lambda t: None if t is None else decompress(compress(t.encode())).decode()
        ),
        StringType(),
    )

    docs = _t(spark, sf_dir, "documents", split=True)
    return docs.select("doc_id", rt("text").alias("text"))


# bump when the page-fixture layout (bucket width, page size, sort) changes
_PGFIX_REV = 1
_PG_BUCKET = 8192
_PG_ROWS = 1024


def _paged_orders_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once page-indexed orders corpus for q_parquet_page_prune: one
    file per ``o_orderkey div 8192`` bucket, written by OUR writer through
    the group-wise sink — each file sorted by o_orderkey and paged at 1024
    rows with ColumnIndex/OffsetIndex. Orderkey uniqueness makes every
    page's row-rank range reconstructable in pure SQL."""
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_pgfix_r{_PGFIX_REV}_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    from vectorflow_spark.sources.parquetmini import write_parquet_grouped

    orders = _t(spark, sf_dir, "orders", split=True).select(
        "o_orderkey", "o_custkey", F.expr(f"o_orderkey div {_PG_BUCKET}").alias("bucket")
    )
    write_parquet_grouped(
        orders,
        out_dir,
        {"o_orderkey": "i64", "o_custkey": "i64"},
        "bucket",
        ["o_orderkey"],
        rows_per_page=_PG_ROWS,
    ).count()
    with open(marker, "w", encoding="utf-8") as f:
        f.write("built by _paged_orders_dir\n")
    return out_dir


@query(
    "q_parquet_page_prune",
    f"""
    WITH r AS (
        SELECT o_orderkey, o_orderkey // {_PG_BUCKET} AS bucket,
               row_number() OVER (PARTITION BY o_orderkey // {_PG_BUCKET}
                                  ORDER BY o_orderkey) - 1 AS rn
        FROM orders)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(rn // {_PG_ROWS} AS BIGINT) AS page,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           (MAX(o_orderkey) >= 5000 AND MIN(o_orderkey) <= 6000) AS kept
    FROM r GROUP BY 1, 2
    """,
)
def q_parquet_page_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGE-level pruning — one granularity below q_parquet_prune: harvest
    per-page min/max from OUR ColumnIndex/OffsetIndex (written by OUR
    writer through the group-wise clustered sink, parsed by OUR reader —
    three ranged reads per file, zero data pages) and decide which 1024-row
    pages a ``BETWEEN 5000 AND 6000`` point-range scan may skip. The
    oracle reconstructs every page's true bounds from rank arithmetic over
    the unique sort key. This is the 100-TB point-lookup plan: file ->
    row group -> page, all from index bytes."""
    from vectorflow_spark.sources.parquetmini import page_index_scan

    out_dir = _paged_orders_dir(spark, sf_dir)
    files = sorted(_glob.glob(os.path.join(out_dir, "bucket=*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {out_dir}")
    scan = page_index_scan(spark, files, "o_orderkey")
    return scan.select(
        F.regexp_extract("file_name", r"bucket=(-?\d+)", 1).cast("bigint").alias("bucket"),
        "page",
        (F.col("last_row_index") - F.col("first_row_index") + 1).alias("n_rows"),
        F.col("min_num").cast("bigint").alias("min_key"),
        F.col("max_num").cast("bigint").alias("max_key"),
        ((F.col("max_num") >= 5000) & (F.col("min_num") <= 6000)).alias("kept"),
    )


@query(
    "q_parquet_indexed_lookup",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey BETWEEN 1024 AND 1400 AND o_orderkey % 13 = 5
    """,
)
def q_parquet_indexed_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END index-driven point-range lookup over the bucketed corpus:
    harvest per-file o_orderkey bounds from OUR footer parser (no data
    pages), keep only files whose [min, max] intersects the probe range —
    the file list is driver-sized by construction (bounded by file count,
    the same class as bloom.py's bit array) — then BYTE-LEVEL decode only
    the surviving files with raw_scan and apply the exact residual
    predicate. One file of ~73 survives at sf0.1: the selective-scan plan
    a 100-TB engine runs for every point query, with every stage (stats
    harvest, prune decision, targeted decode, residual) exercised by the
    oracle's relational ground truth."""
    from vectorflow_spark.sources.parquetmini import footer_meta_scan, raw_scan

    files = _fixture_files(_bucketed_orders_dir(spark, sf_dir))
    stats = (
        footer_meta_scan(spark, files)
        .filter(F.col("path_in_schema") == "o_orderkey")
        .groupBy("file_name")
        .agg(F.min("stats_min_num").alias("mn"), F.max("stats_max_num").alias("mx"))
        .filter((F.col("mx") >= 1024) & (F.col("mn") <= 1400))
    )
    survivors = sorted(r.file_name for r in stats.collect())
    if not survivors:
        # a sparse sf may place no keys in range: empty result, same schema
        survivors = files[:1]
    rows = raw_scan(spark, survivors, ["o_orderkey", "o_custkey", "o_totalprice"])
    return rows.filter(
        F.col("o_orderkey").between(1024, 1400) & (F.col("o_orderkey") % 13 == 5)
    )


# bump when the ORC fixture layout changes
_ORCFIX_REV = 1


def _orc_docs_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once ORC corpus of the documents table: one pyarrow-written
    .orc file per partition (mapInPandas, rename-commit). pyarrow is the
    EXTERNAL writer here — the pinning direction the gate wants: foreign
    bytes through OUR byte-level reader."""
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_orcfix_r{_ORCFIX_REV}_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    docs = _t(spark, sf_dir, "documents", split=True)

    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    man_schema = StructType(
        [StructField("part", StringType()), StructField("n_rows", LongType())]
    )

    def sink(batches):
        import uuid

        import pyarrow as pa
        import pyarrow.orc as orc

        rows = []
        pdfs = [p for p in batches if len(p)]
        if pdfs:
            pdf = pd.concat(pdfs, ignore_index=True)
            table = pa.Table.from_pandas(pdf, preserve_index=False)
            part = f"part-{uuid.uuid4().hex}.orc"
            tmp = os.path.join(out_dir, f".uncommitted-{part}")
            orc.write_table(table, tmp, compression="zlib")
            os.replace(tmp, os.path.join(out_dir, part))
            rows.append((part, len(pdf)))
        yield pd.DataFrame(rows, columns=["part", "n_rows"])

    docs.mapInPandas(sink, man_schema).count()
    with open(marker, "w", encoding="utf-8") as f:
        f.write("built by _orc_docs_dir\n")
    return out_dir


@query(
    "q_orc_rawscan",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def q_orc_rawscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SECOND columnar format, byte-level: the documents table written
    to ORC by pyarrow (foreign bytes) and decoded entirely by OUR reader —
    protobuf footers, ZLIB chunk framing, RLEv2 runs, dictionary and
    direct strings, PRESENT bitstreams — one task per (file, stripe),
    hash-matched against the table itself. With q_parquet_rawscan this
    makes the engine storage-format-complete for the two formats a 100-TB
    lake actually holds (sources/orcmini.py; scope and refusals in the
    module docstring)."""
    from vectorflow_spark.sources.orcmini import orc_raw_scan

    out_dir = _orc_docs_dir(spark, sf_dir)
    files = sorted(_glob.glob(os.path.join(out_dir, "part-*.orc")))
    if not files:
        raise FileNotFoundError(f"no orc files under {out_dir}")
    return orc_raw_scan(spark, files, ["doc_id", "text", "lang", "source", "n_chars"])


@query(
    "q_orc_write_roundtrip",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def q_orc_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine WRITES ORC byte-level too: documents serialized by OUR
    pure-Python ORC writer (protobuf footer encoder, RLEv1 ints, byte-RLE
    booleans/presents, direct strings, ZLIB chunk framing) through the
    distributed rename-commit sink, read back by Spark's own ORC reader
    and hash-matched against the table. Symmetric with
    q_parquet_write_roundtrip — the storage stack is read/write complete
    for both lake formats. Per-process output dir wiped each run (the
    q_warc_scan discipline)."""
    from vectorflow_spark.sources.orcmini import write_orc_corpus

    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_orcwrite_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = _t(spark, sf_dir, "documents", split=True)
    kinds = {"doc_id": "i64", "text": "str", "lang": "str", "source": "str", "n_chars": "i64"}
    write_orc_corpus(docs, out_dir, kinds).count()  # the write IS this action
    return spark.read.orc(out_dir).select("doc_id", "text", "lang", "source", "n_chars")


@query(
    "q_orc_meta",
    """
    SELECT 'doc_id' AS col, CAST(COUNT(doc_id) AS BIGINT) AS n_values,
           CAST(SUM(doc_id) AS BIGINT) AS sum_v,
           CAST(CAST(MIN(doc_id) AS BIGINT) AS VARCHAR) AS min_s,
           CAST(CAST(MAX(doc_id) AS BIGINT) AS VARCHAR) AS max_s
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(COUNT(n_chars) AS BIGINT), CAST(SUM(n_chars) AS BIGINT),
           CAST(CAST(MIN(n_chars) AS BIGINT) AS VARCHAR),
           CAST(CAST(MAX(n_chars) AS BIGINT) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'lang', CAST(COUNT(lang) AS BIGINT), CAST(SUM(strlen(lang)) AS BIGINT),
           MIN(lang), MAX(lang) FROM documents
    UNION ALL
    SELECT 'source', CAST(COUNT(source) AS BIGINT), CAST(SUM(strlen(source)) AS BIGINT),
           MIN(source), MAX(source) FROM documents
    """,
)
def q_orc_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC footer statistics vs the data (the q_parquet_meta twin): per-
    column non-null counts, exact integer min/max/sum and string min/max +
    total UTF-8 byte length parsed from OUR protobuf stats walk over the
    pyarrow-written corpus, aggregated across files; the oracle recomputes
    the same facts relationally. One tail read per file — the catalog
    crawl that builds external table indexes at 100 TB."""
    from vectorflow_spark.sources.orcmini import orc_footer_scan

    out_dir = _orc_docs_dir(spark, sf_dir)
    files = sorted(_glob.glob(os.path.join(out_dir, "part-*.orc")))
    scan = orc_footer_scan(spark, files).filter(
        F.col("column").isin("doc_id", "n_chars", "lang", "source")
    )
    # string sums included: StringStatistics.sum is sint64 — the first
    # cut read it unzigzagged (exactly 2x) and misblamed the writer
    agg = scan.groupBy(F.col("column").alias("col")).agg(
        F.sum("n_values").cast("bigint").alias("n_values"),
        F.sum("sum_num").cast("bigint").alias("sum_v"),
        F.min("min_int").alias("_mn"),
        F.max("max_int").alias("_mx"),
        F.min("min_str").alias("_mns"),
        F.max("max_str").alias("_mxs"),
    )
    return agg.select(
        "col",
        "n_values",
        "sum_v",
        F.coalesce(F.col("_mn").cast("string"), F.col("_mns")).alias("min_s"),
        F.coalesce(F.col("_mx").cast("string"), F.col("_mxs")).alias("max_s"),
    )


# bump when the ORC prune-fixture layout changes
_ORCPFIX_REV = 1


def _bucketed_orders_orc_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once bucketed-orders ORC corpus (the parquet prune fixture's
    twin): one OUR-writer file per ``o_orderkey div 2048`` bucket, sorted
    within, footer stats intact."""
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_orcpfix_r{_ORCPFIX_REV}_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    from vectorflow_spark.sources.orcmini import write_orc_grouped

    orders = _t(spark, sf_dir, "orders", split=True).select(
        "o_orderkey", "o_custkey", F.expr(f"o_orderkey div {_BUCKET}").alias("bucket")
    )
    write_orc_grouped(
        orders, out_dir, {"o_orderkey": "i64", "o_custkey": "i64"}, "bucket", ["o_orderkey"]
    ).count()
    with open(marker, "w", encoding="utf-8") as f:
        f.write("built by _bucketed_orders_orc_dir\n")
    return out_dir


@query(
    "q_orc_prune",
    f"""
    SELECT CAST(o_orderkey // {_BUCKET} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           (MAX(o_orderkey) >= 3000 AND MIN(o_orderkey) <= 9000) AS kept
    FROM orders GROUP BY 1
    """,
)
def q_orc_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-based file pruning over OUR ORC files (the q_parquet_prune
    twin, closing the loop on both formats: our writer's footer statistics
    are trustworthy planning inputs): per-bucket min/max/count harvested
    by orc_footer_scan from OUR-written clustered files vs relational
    ground truth, plus the BETWEEN keep/skip decision."""
    from vectorflow_spark.sources.orcmini import orc_footer_scan

    out_dir = _bucketed_orders_orc_dir(spark, sf_dir)
    files = sorted(_glob.glob(os.path.join(out_dir, "bucket=*.orc")))
    if not files:
        raise FileNotFoundError(f"no orc files under {out_dir}")
    scan = orc_footer_scan(spark, files).filter(F.col("column") == "o_orderkey")
    per_bucket = (
        scan.withColumn(
            "bucket", F.regexp_extract("file_name", r"bucket=(-?\d+)", 1).cast("bigint")
        )
        .groupBy("bucket")
        .agg(
            F.sum("n_values").cast("bigint").alias("n_rows"),
            F.min("min_int").alias("min_key"),
            F.max("max_int").alias("max_key"),
        )
    )
    return per_bucket.select(
        "bucket",
        "n_rows",
        "min_key",
        "max_key",
        ((F.col("max_key") >= 3000) & (F.col("min_key") <= 9000)).alias("kept"),
    )


@query(
    "q_rawpq_pushdown_scan",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey BETWEEN 1024 AND 1400 AND o_orderkey % 13 = 5
    """,
)
def q_rawpq_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The byte-level reader as a FIRST-CLASS Spark source: the bucketed
    corpus read through ``spark.read.format("vf_rawpq")`` with the range
    predicate pushed into the source (sources/pqsource.py), which prunes
    row groups from footer stats at PLANNING time and returns every filter
    for exact re-application — same relational result as
    q_parquet_indexed_lookup but planned by Catalyst end to end through
    the Python DataSource pushdown API instead of a hand-built
    harvest->prune->decode pipeline. One bucket file of ~73 survives
    planning at sf0.1."""
    from vectorflow_spark.sources import pqsource

    pqsource.register(spark)
    out_dir = _bucketed_orders_dir(spark, sf_dir)
    df = spark.read.format("vf_rawpq").load(out_dir)
    return (
        df.filter(
            F.col("o_orderkey").between(1024, 1400) & (F.col("o_orderkey") % 13 == 5)
        ).select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_raworc_pushdown_scan",
    """
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_orderkey BETWEEN 3000 AND 4000 AND o_orderkey % 7 = 2
    """,
)
def q_raworc_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vf_rawpq gate's ORC twin: the bucketed ORC corpus (OUR writer,
    OUR footer statistics) read through ``spark.read.format("vf_raworc")``
    with the range predicate pruning whole FILES from file-level stats at
    planning time (sources/orcsource.py), filters re-applied exactly by
    Spark. Closes the loop: our ORC bytes, our stats, Catalyst's pushdown
    machinery, relational ground truth."""
    from vectorflow_spark.sources import orcsource

    orcsource.register(spark)
    out_dir = _bucketed_orders_orc_dir(spark, sf_dir)
    df = spark.read.format("vf_raworc").load(out_dir)
    return df.filter(
        F.col("o_orderkey").between(3000, 4000) & (F.col("o_orderkey") % 7 == 2)
    ).select("o_orderkey", "o_custkey")


# ---------------------------------------------------------------------------
# Avro: the row-oriented third format of the storage stack
# (sources/avromini.py — binary encoding, container blocks, sync-marker
# splits; pinned against the JVM avro-1.12.1.jar in tests/test_avro.py)
# ---------------------------------------------------------------------------

_AVROFIX_REV = 1


def _avro_docs_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once Avro corpus of the documents table: ONE container file,
    small blocks (128 rows), deflate — the shape that exercises the
    sync-marker split walk (many blocks per file, many byte-range tasks
    over one file)."""
    from vectorflow_spark.sources.avromini import write_avro_corpus

    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_avrofix_r{_AVROFIX_REV}_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    docs = _t(spark, sf_dir, "documents", split=True).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    kinds = {"doc_id": "i64", "text": "str", "lang": "str", "source": "str", "n_chars": "i64"}
    write_avro_corpus(docs.coalesce(1), out_dir, kinds, rows_per_block=128).count()
    with open(marker, "w", encoding="utf-8") as f:
        f.write("built by _avro_docs_dir\n")
    return out_dir


@query(
    "q_avro_write_roundtrip",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def q_avro_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The THIRD storage format, write+read byte-level: documents
    serialized by OUR pure-Python Avro writer (binary encoding, deflate
    blocks, content-derived sync markers) through the distributed
    rename-commit sink, read back by OUR distributed byte-range scan and
    hash-matched against the table. Row-oriented Avro completes the lake
    trio (columnar parquet + ORC cover the analytics shape; Avro is what
    ingest/CDC feeds actually deliver). JVM-parity pin in
    tests/test_avro.py; per-process output dir wiped each run."""
    from vectorflow_spark.sources.avromini import avro_raw_scan, write_avro_corpus

    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_avrowrite_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = _t(spark, sf_dir, "documents", split=True)
    kinds = {"doc_id": "i64", "text": "str", "lang": "str", "source": "str", "n_chars": "i64"}
    write_avro_corpus(
        docs.select(*kinds), out_dir, kinds
    ).count()  # the write IS this action
    files = sorted(_glob.glob(os.path.join(out_dir, "part-*.avro")))
    return avro_raw_scan(spark, files, list(kinds))


@query(
    "q_avro_split_scan",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def q_avro_split_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sync-marker input splits, the property that makes row-oriented
    Avro viable at 100 TB: ONE container file (128-row deflate blocks)
    scanned as many ~64 KiB byte-range tasks, each entering mid-file,
    seeking to the next sync and owning exactly the blocks that start in
    its range (the JVM DataFileReader sync/pastSync contract, replicated
    bit-for-bit — tests/test_avro.py proves exact single-ownership for
    arbitrary split sizes). Hash-match against the table proves no block
    is lost or read twice at the seams."""
    from vectorflow_spark.sources.avromini import avro_raw_scan

    out_dir = _avro_docs_dir(spark, sf_dir)
    files = sorted(_glob.glob(os.path.join(out_dir, "part-*.avro")))
    if not files:
        raise FileNotFoundError(f"no avro files under {out_dir}")
    return avro_raw_scan(
        spark, files, ["doc_id", "text", "lang", "source", "n_chars"], split_bytes=64 << 10
    )


@query(
    "q_avro_meta",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM documents GROUP BY lang
    """,
)
def q_avro_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only row counts (the avro twin of q_parquet_meta): one
    container file per lang written by the grouped sink, then per-file
    counts summed from BLOCK HEADERS alone — no payload is ever
    decompressed (avromini.count_rows), which is what a catalog stats
    pass costs over an avro lake. Oracle recomputes the counts
    relationally."""
    import pandas as pd

    from vectorflow_spark.sources.avromini import count_rows, write_avro_grouped

    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_avrometa_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text", "lang")
    kinds = {"doc_id": "i64", "text": "str"}

    # ONE grouped-sink job writes every lang=value.avro file (applyInPandas
    # over groupBy(lang)) — a per-lang driver loop would serialize thousands
    # of groups into thousands of jobs at corpus scale
    write_avro_grouped(docs, out_dir, kinds, group_col="lang", sort_cols=["doc_id"]).count()

    entries = sorted(_glob.glob(os.path.join(out_dir, "lang=*.avro")))
    files_df = spark.createDataFrame(
        [(p, os.path.basename(p)[5:-5]) for p in entries],
        "path string, lang string",
    ).repartition(max(len(entries), 1))

    def meta(batches):
        for pdf in batches:
            rows = []
            for path, lg in zip(pdf["path"], pdf["lang"]):
                with open(path, "rb") as f:
                    rows.append((lg, count_rows(f.read())))
            yield pd.DataFrame(rows, columns=["lang", "n_rows"])

    per_file = files_df.mapInPandas(meta, "lang string, n_rows long")
    return per_file.groupBy("lang").agg(F.sum("n_rows").alias("n_rows"))


@query(
    "q_rawavro_scan",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def q_rawavro_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vf_rawpq/vf_raworc sibling for the ingest format:
    ``spark.read.format("vf_rawavro")`` over the single-file fixture with
    64 KiB splits — Catalyst sees a normal relation, the Python DataSource
    underneath plans byte-range partitions from file sizes alone and each
    task does the sync-marker split walk. No pushdown, honestly: avro
    blocks carry no statistics (sources/avrosource.py docstring); Spark
    re-applies everything post-scan."""
    from vectorflow_spark.sources import avrosource

    avrosource.register(spark)
    out_dir = _avro_docs_dir(spark, sf_dir)
    return (
        spark.read.format("vf_rawavro")
        .option("split_bytes", 64 << 10)
        .load(out_dir)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


_BLOOMFIX_REV = 1


def _bloom_orders_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once: orders HASH-distributed over 8 parquet files with a
    split-block bloom filter on o_orderkey (Spark/parquet-java is the
    writer — foreign filters through OUR reader). Hash distribution makes
    every file span ~the whole key domain, so min/max range pruning can
    drop NOTHING for a point lookup: whatever vf_rawpq prunes here is the
    bloom probe working."""
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_bloomfix_r{_BLOOMFIX_REV}_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    orders = _t(spark, sf_dir, "orders", split=True).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    (
        orders.repartition(8, "o_orderkey")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#o_orderkey", "true")
        .option("parquet.bloom.filter.expected.ndv#o_orderkey", "200000")
        .parquet(out_dir)
    )
    return out_dir


@query(
    "q_parquet_bloom_prune",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey IN (SELECT MIN(o_orderkey) FROM orders)
       OR o_orderkey IN (SELECT MAX(o_orderkey) FROM orders)
    """,
)
def q_parquet_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-lookup row-group skipping via split-block BLOOM filters —
    the pruning class min/max statistics can NEVER provide: the fixture
    hash-distributes o_orderkey over 8 files so every chunk's [min, max]
    spans the whole domain, then two equality lookups (the min and max
    key, computed from the table driver-side — 1-row aggregates) run
    through ``vf_rawpq``, whose planner probes each row group's
    parquet-java-written filter with OUR xxhash64 (functions/xxh.py,
    pinned against Spark's xxhash64 and the spec vectors) and keeps only
    admitting row groups. tests/test_bloom.py asserts pruned >= 5 of 8
    for this shape; correctness here is the relational ground truth."""
    from vectorflow_spark.sources import pqsource

    pqsource.register(spark)
    out_dir = _bloom_orders_dir(spark, sf_dir)
    bounds = _t(spark, sf_dir, "orders", split=True).agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]  # driver-side: two scalars
    # two SEPARATE loads: a shared relation instance would route both
    # (contradictory) equality pushdowns into one reader's filter state
    lo = (
        spark.read.format("vf_rawpq").load(out_dir)
        .filter(F.col("o_orderkey") == int(bounds.lo))
    )
    hi = (
        spark.read.format("vf_rawpq").load(out_dir)
        .filter(F.col("o_orderkey") == int(bounds.hi))
    )
    return lo.unionAll(hi).select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "q_parquet_bloom_write",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE doc_id IN (SELECT MIN(doc_id) FROM documents)
       OR doc_id IN (SELECT MAX(doc_id) FROM documents)
    """,
)
def q_parquet_bloom_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE side of the bloom story (q_parquet_bloom_prune's twin):
    documents written by OUR distributed parquet sink with split-block
    bloom filters on doc_id (encode_parquet bloom_columns — bitset sized
    from the true distinct count, parquet-java hash/membership parity
    pinned in tests/test_bloom.py), hash-spread over 8 tasks so every
    part spans the id domain, then two point lookups read back through
    vf_rawpq, whose planner prunes on the blooms WE wrote. Read/write
    symmetric: our bytes, our filters, our pruning, relational ground
    truth. Per-process output dir wiped each run."""
    from vectorflow_spark.sources import pqsource
    from vectorflow_spark.sources.parquetmini import write_parquet_corpus

    pqsource.register(spark)
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_bloomwrite_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "lang", "n_chars")
    kinds = {"doc_id": "i64", "lang": "str", "n_chars": "i64"}
    write_parquet_corpus(
        docs.repartition(8, "doc_id"), out_dir, kinds, bloom_columns=["doc_id"]
    ).count()
    bounds = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    lo = (
        spark.read.format("vf_rawpq").load(out_dir)
        .filter(F.col("doc_id") == int(bounds.lo))
    )
    hi = (
        spark.read.format("vf_rawpq").load(out_dir)
        .filter(F.col("doc_id") == int(bounds.hi))
    )
    return lo.unionAll(hi).select("doc_id", "lang", "n_chars")


_ORCBLOOMFIX_REV = 1


def _orc_bloom_orders_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once: orders hash-distributed over 8 ORC files with bloom
    filters on o_orderkey (Spark/orc-core writes them; zlib so OUR reader
    decodes). Hash distribution defeats min/max pruning for point lookups
    — only the bloom can skip stripes."""
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_orcbloomfix_r{_ORCBLOOMFIX_REV}_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    orders = _t(spark, sf_dir, "orders", split=True).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    (
        orders.repartition(8, "o_orderkey")
        .write.mode("overwrite")
        .option("compression", "zlib")
        .option("orc.bloom.filter.columns", "o_orderkey")
        .orc(out_dir)
    )
    return out_dir


@query(
    "q_orc_bloom_prune",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey IN (SELECT MIN(o_orderkey) FROM orders)
       OR o_orderkey IN (SELECT MAX(o_orderkey) FROM orders)
    """,
)
def q_orc_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_parquet_bloom_prune's ORC twin: point lookups through
    ``vf_raworc`` probing orc-core-written per-row-group bloom filter
    indexes (kind-8 BLOOM_FILTER_UTF8 streams) with OUR hash pair — Thomas Wang signed-
    shift mix for longs, Murmur3 hash64 for strings — both pinned
    value-for-value against the orc.util classes in tests/test_bloom.py.
    Stripes whose every row group rejects the key are dropped at
    planning; correctness is the relational ground truth. Separate loads
    per branch (the documented shared-relation rule)."""
    from vectorflow_spark.sources import orcsource

    orcsource.register(spark)
    out_dir = _orc_bloom_orders_dir(spark, sf_dir)
    bounds = _t(spark, sf_dir, "orders", split=True).agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]  # driver-side: two scalars
    lo = (
        spark.read.format("vf_raworc").load(out_dir)
        .filter(F.col("o_orderkey") == int(bounds.lo))
    )
    hi = (
        spark.read.format("vf_raworc").load(out_dir)
        .filter(F.col("o_orderkey") == int(bounds.hi))
    )
    return lo.unionAll(hi).select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "q_avro_evolution",
    """
    SELECT doc_id,
           lang,
           CAST(n_chars AS DOUBLE) AS n_chars_d,
           'unscored' AS quality
    FROM documents
    """,
)
def q_avro_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro Schema Resolution, distributed (the spec's evolution rules,
    JVM-pinned in tests/test_avro.py): the v1 container fixture is read
    with a v2 READER schema that drops text/source (skip-decoded, never
    materialized), promotes n_chars long->double (spec promotion table),
    and adds a ``quality`` field filled from its default — the shape
    every long-lived CDC/ingest pipeline hits when producers evolve
    ahead of consumers. Oracle recomputes the projection relationally."""
    import pandas as pd

    from vectorflow_spark.sources.avromini import read_avro

    out_dir = _avro_docs_dir(spark, sf_dir)
    files = sorted(_glob.glob(os.path.join(out_dir, "part-*.avro")))
    reader_schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "doc_id", "type": ["null", "long"]},
            {"name": "lang", "type": ["null", "string"]},
            {"name": "n_chars_d", "type": ["null", "double"], "aliases": ["n_chars"]},
            {"name": "quality", "type": ["null", "string"], "default": "unscored"},
        ],
    }
    files_df = spark.createDataFrame([(p,) for p in files], "path string").repartition(
        max(len(files), 1)
    )

    def evolve(batches):
        for pdf in batches:
            for path in pdf["path"]:
                with open(path, "rb") as f:
                    data = f.read()
                cols = read_avro(
                    data,
                    reader_schema=reader_schema,
                    defaults={"quality": "unscored"},
                )
                yield pd.DataFrame(cols, columns=["doc_id", "lang", "n_chars_d", "quality"])

    return files_df.mapInPandas(
        evolve, "doc_id long, lang string, n_chars_d double, quality string"
    )


# ---------------------------------------------------------------------------
# vf_table snapshot gates (sources/table.py)
# ---------------------------------------------------------------------------

_TBLFIX_REV = 3


def _table_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once vf_table over orders with a 4-snapshot history:
    create (keys%4==0) -> append (%4 in 1,2) -> copy-on-write delete
    (o_totalprice > 400000) -> append (%4==3) -> merge (upsert every
    key%20==0 with a sentinel price/status). Every snapshot's content
    is reconstructable in pure SQL from the orders table, which is what
    makes the time-travel gate oracle-able. Appends are range-
    repartitioned on o_orderkey so file stats have narrow key ranges and
    manifest pruning has something to prune (asserted in
    tests/test_table.py; the gates' OUTPUT never depends on the sampled
    file boundaries)."""
    from vectorflow_spark.sources.table import (
        table_append,
        table_create,
        table_delete_where,
    )

    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_tblfix_r{_TBLFIX_REV}_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    orders = _t(spark, sf_dir, "orders", split=True).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    part = lambda m: orders.filter(F.col("o_orderkey") % 4 == m).repartitionByRange(  # noqa: E731
        4, "o_orderkey"
    )
    table_create(part(0), out_dir)
    table_append(part(1).unionByName(part(2)).repartitionByRange(4, "o_orderkey"), out_dir)
    table_delete_where(
        spark, out_dir, "o_totalprice > 400000", predicates=[("o_totalprice", ">", 400000.0)]
    )
    table_append(part(3), out_dir)
    # snapshot 5: copy-on-write MERGE — every key % 20 == 0 upserted with
    # a sentinel price/status (updates existing rows AND re-inserts keys
    # the snapshot-3 delete removed)
    from vectorflow_spark.sources.table import table_merge

    ups = orders.filter(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit(123.45).alias("o_totalprice"),
        F.lit("U").alias("o_orderstatus"),
    )
    table_merge(spark, out_dir, ups, "o_orderkey")
    with open(marker, "w", encoding="utf-8") as f:
        f.write("built by _table_fixture_dir\n")
    return out_dir


_TBL_S3 = "((o_orderkey % 4 IN (0, 1, 2)) AND o_totalprice <= 400000)"
_TBL_SNAP_SQL = {
    1: "o_orderkey % 4 = 0",
    2: "o_orderkey % 4 IN (0, 1, 2)",
    3: _TBL_S3,
    4: f"({_TBL_S3} OR o_orderkey % 4 = 3)",
}


@query(
    "q_table_timetravel",
    " UNION ALL ".join(
        f"""
    SELECT {sid} AS snapshot_id, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders WHERE {cond}"""
        for sid, cond in _TBL_SNAP_SQL.items()
    ),
)
def q_table_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel across the vf_table's 4-snapshot history
    (create -> append -> copy-on-write delete -> append): read each
    snapshot id and aggregate rows + decimal-exact price sum. The oracle
    reconstructs every snapshot's content directly from orders — a hash
    match proves the manifest machinery (atomic commits, carried-forward
    file references, delete rewrites) preserves EXACTLY the right rows
    at every point in history. Reads resolve one json manifest and then
    scan only that snapshot's files; no directory listing anywhere."""
    from functools import reduce

    from vectorflow_spark.sources.table import table_read

    root = _table_fixture_dir(spark, sf_dir)
    frames = [
        table_read(spark, root, snapshot=sid).agg(
            F.lit(sid).alias("snapshot_id"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        # agg puts the lit first only if grouped; re-select for stable order
        .select("snapshot_id", "n_rows", "sum_price")
        for sid in (1, 2, 3, 4)
    ]
    return reduce(lambda a, b: a.unionByName(b), frames)


@query(
    "q_table_prune_read",
    f"""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE ({_TBL_SNAP_SQL[4]}) AND o_orderkey BETWEEN 1000 AND 2000
    """,
)
def q_table_prune_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-side scan planning: read the current snapshot with a
    key-range predicate that prunes files by their footer-harvested
    min/max BEFORE Spark lists or opens anything, then apply the exact
    row filter. The oracle recomputes the same rows from orders — the
    match proves pruning never drops a matching file (conservative
    bounds), while tests/test_table.py asserts it does skip
    non-overlapping ones. At a year-sized table this is the difference
    between opening 4 files and 4000."""
    from vectorflow_spark.sources.table import table_read

    root = _table_fixture_dir(spark, sf_dir)
    df = table_read(
        spark, root, snapshot=4, predicates=[("o_orderkey", "between", (1000, 2000))]
    )
    return df.filter("o_orderkey BETWEEN 1000 AND 2000").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice")
    )


@query(
    "q_table_merge_read",
    f"""
    WITH s5 AS (
        SELECT o_orderkey, o_custkey, 123.45 AS o_totalprice, 'U' AS o_orderstatus
        FROM orders WHERE o_orderkey % 20 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        FROM orders WHERE ({_TBL_SNAP_SQL[4]}) AND o_orderkey % 20 <> 0
    )
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM s5 GROUP BY 1
    """,
)
def q_table_merge_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE verified end-to-end: snapshot 5 upserts every
    key%20==0 order with a sentinel price/status — updating rows present
    in snapshot 4 AND re-inserting keys the snapshot-3 delete removed.
    The oracle reconstructs the post-merge content directly from orders
    (updates-first union with the anti-set), so the hash match proves the
    merge's anti-join + file carry logic loses nothing and doubles
    nothing. Only files whose key bounds overlap the update range were
    rewritten; the rest carry by reference (tests/test_table.py)."""
    from vectorflow_spark.sources.table import table_read

    root = _table_fixture_dir(spark, sf_dir)
    return (
        table_read(spark, root, snapshot=5)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )
