"""WebDataset layer over ``vf_tar``: sample assembly + distributed
shard writing.

WebDataset's contract: a SAMPLE is the set of adjacent tar members
sharing a key (basename up to the first dot) — ``0001.jpg`` +
``0001.json`` + ``0001.txt`` is one training example. Because members of
a sample are adjacent WITHIN a shard and one shard = one scan partition
(sources/tarsource.py), samples assemble with a per-partition linear
pass and ZERO shuffle — the property that makes WebDataset the standard
container for 100 TB image-text corpora, preserved here end to end.

* ``read_tar(spark, path)``        — vf_tar scan: one row per member.
* ``webdataset_samples(rows)``     — member rows -> one row per sample
  (``shard, key, parts map<ext, binary>, n_parts``), no shuffle.
* ``read_webdataset(spark, path)`` — the composition.
* ``write_webdataset(df, ...)``    — distributed SINK: samples -> tar
  shards (hash(key) sharding, members sorted by key, zeroed tar
  metadata so reruns are byte-identical, write-temp + rename commit).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F


def read_tar(
    spark,
    path: str,
    glob: str | None = None,
    on_corrupt: str = "row",
    io: str = "auto",
    io_register: str | None = None,
    index: str = "auto",
    samples_per_task: int | None = None,
    bytes_per_task: int | None = None,
) -> DataFrame:
    """One row per tar member across every shard under ``path`` (vf_tar:
    one partition per shard — or many sample-aligned RANGE partitions
    per shard when the ``_<shard>.tar.idx.json`` sidecar exists and
    ``index`` allows (auto|never|require) — members streamed or
    seek-read; a range chunk closes at ``samples_per_task`` samples OR
    ``bytes_per_task`` bytes (default 128 MB), whichever hits first, so
    byte-skewed shards split into balanced tasks; same ``io`` backends
    and pushdown as vf_warc — see sources/tarsource.py)."""
    from vectorflow_spark.sources import tarsource

    tarsource.register(spark)
    reader = (
        spark.read.format("vf_tar")
        .option("onCorrupt", on_corrupt)
        .option("io", io)
        .option("index", index)
    )
    if glob:
        reader = reader.option("glob", glob)
    if io_register:
        reader = reader.option("io_register", io_register)
    if samples_per_task is not None:
        reader = reader.option("samplesPerTask", str(samples_per_task))
    if bytes_per_task is not None:
        reader = reader.option("bytesPerTask", str(bytes_per_task))
    return reader.load(path)


def webdataset_samples(rows: DataFrame) -> DataFrame:
    """Member rows (vf_tar schema) -> one row per SAMPLE: ``shard, key,
    parts map<ext, binary>, n_parts``. Zero-shuffle: members of a sample
    are adjacent within their shard's partition, so a linear
    mapInPandas pass with carry-over across Arrow batches assembles
    them — at 100 TB this is a pure map stage, scaling by shard count.
    Error rows (ext='error') pass through with a null key dropped here;
    filter them upstream for per-shard error accounting."""
    import pandas as pd

    schema = "shard string, key string, parts map<string,binary>, n_parts int"

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur: tuple[str, str] | None = None
        parts: dict[str, bytes] = {}

        def flush() -> dict:
            return {
                "shard": cur[0],
                "key": cur[1],
                "parts": dict(parts),
                "n_parts": len(parts),
            }

        for pdf in batches:
            out = []
            for shard, key, ext, data in zip(
                pdf["shard"], pdf["key"], pdf["ext"], pdf["data"]
            ):
                if key is None:  # error row (onCorrupt='row')
                    continue
                if cur is not None and (shard, key) != cur:
                    out.append(flush())
                    parts = {}
                cur = (shard, key)
                parts[ext] = bytes(data)
            yield pd.DataFrame(out, columns=["shard", "key", "parts", "n_parts"])
        if cur is not None:
            yield pd.DataFrame([flush()], columns=["shard", "key", "parts", "n_parts"])

    return rows.mapInPandas(assemble, schema=schema)


def read_webdataset(spark, path: str, **kwargs) -> DataFrame:
    """Tar shards -> one row per sample (see webdataset_samples)."""
    return webdataset_samples(read_tar(spark, path, **kwargs))


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    part_cols: dict[str, str],
    n_shards: int = 16,
    shard_prefix: str = "shard",
    compress: bool = False,
    index: bool = False,
) -> DataFrame:
    """Distributed WebDataset SINK: each row becomes one sample whose
    members are ``<key>.<ext>`` for every (column -> ext) in
    ``part_cols`` (string columns utf-8 encode; binary pass through).
    Plan mirrors warcmini.write_warc_corpus: shard = hash(key) mod
    n_shards (one shuffle), each task streams ITS tar with zeroed
    member metadata (mtime/uid/gid) and key-sorted samples so reruns
    are byte-identical, committed via write-temp + rename. Returns the
    manifest (shard, path, n_samples, n_bytes); files exist when it
    materializes. Size shards ~100 MB-1 GB at scale, exactly like
    n_files on the WARC sink.

    ``index=True`` (plain tar only — gzip is not seekable) also writes a
    ``_<shard>.tar.idx.json`` SIDECAR of member (name, offset, size) —
    the wids-style index that makes tar shards SPLITTABLE: the
    ``vf_tar`` scan's ``index`` mode turns each shard into many
    sample-aligned byte-range partitions, so a few huge shards no
    longer cap parallelism. The leading underscore keeps sidecars out
    of shard listings (the hidden-name rule every scan applies).

    Strict JOB-commit semantics (no file visible before the whole job
    commits; task retries orphan nothing) are available via the
    DataSource writer instead: ``rows.repartition(n, "shard")
    .write.format("vf_tar").save(dir)`` with rows (shard, member, data
    [, seq]) — see sources/tarsource.VfTarWriter."""
    import io
    import json
    import os
    import tarfile
    import tempfile

    import pandas as pd

    if index and compress:
        raise ValueError("write_webdataset: index=True requires compress=False (gzip tars are not seekable)")
    os.makedirs(out_dir, exist_ok=True)
    cols = [key_col, *part_cols.keys()]
    suffix = ".tar.gz" if compress else ".tar"

    def one_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values(key_col, kind="mergesort")
        buf = io.BytesIO()
        mode = "w:gz" if compress else "w"
        # mtime=0 inside gzip too: tarfile's gz writer stamps time unless
        # we build the GzipFile ourselves
        if compress:
            import gzip

            gz = gzip.GzipFile(fileobj=buf, mode="wb", mtime=0)
            tar = tarfile.open(fileobj=gz, mode="w")
        else:
            gz = None
            tar = tarfile.open(fileobj=buf, mode=mode)
        n = 0
        col_names = list(part_cols)
        # zip over columns, not iterrows: the per-row Series construction
        # dominates the task otherwise
        for key, *vals in zip(pdf[key_col], *(pdf[c] for c in col_names)):
            for col, v in zip(col_names, vals):
                data = v.encode("utf-8") if isinstance(v, str) else bytes(v)
                info = tarfile.TarInfo(name=f"{key}.{part_cols[col]}")
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                info.mode = 0o644
                tar.addfile(info, io.BytesIO(data))
            n += 1
        tar.close()
        if gz is not None:
            gz.close()
        blob = buf.getvalue()
        name = f"{shard_prefix}-{seg:05d}{suffix}"
        path = os.path.join(out_dir, name)
        fd, tmp = tempfile.mkstemp(dir=out_dir, prefix=".tmp-shard-")
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        if index:
            with tarfile.open(fileobj=io.BytesIO(blob), mode="r:") as t:
                members = [
                    {"name": m.name, "offset": m.offset_data, "size": m.size}
                    for m in t
                    if m.isfile()
                ]
            side = os.path.join(out_dir, f"_{name}.idx.json")
            fd, tmp = tempfile.mkstemp(dir=out_dir, prefix=".tmp-idx-")
            with os.fdopen(fd, "w") as f:
                json.dump({"members": members}, f)
            os.replace(tmp, side)
        return pd.DataFrame(
            [{"shard": seg, "path": path, "n_samples": n, "n_bytes": len(blob)}]
        )

    return (
        df.select(*cols)
        .withColumn("_shard", F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards)))
        .groupBy("_shard")
        .applyInPandas(one_shard, "shard int, path string, n_samples long, n_bytes long")
    )
