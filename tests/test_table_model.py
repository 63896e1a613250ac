"""Model-based property test for vf_table (sources/table.py): seeded
random operation sequences checked after EVERY step against a plain
Python multiset model — the strongest correctness net a table format
can have short of formal methods. Covers interleavings no example test
enumerates: delete-after-merge on carried files, compact over a
half-rewritten history, expiry mid-sequence, time travel into any
surviving snapshot."""

import random

import pyspark.sql.functions as F
import pytest

from vectorflow_spark.sources.table import (
    table_append,
    table_cluster,
    table_compact,
    table_create,
    table_delete_where,
    table_expire_snapshots,
    table_merge,
    table_read,
    table_snapshots,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "k long, v long").coalesce(1)


def _read_set(spark, root, snapshot=None):
    return sorted((r.k, r.v) for r in table_read(spark, root, snapshot=snapshot).collect())


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_op_sequences_match_model(spark, tmp_path, seed):
    rnd = random.Random(seed)
    root = str(tmp_path / f"tbl{seed}")
    next_k = 0

    def fresh_rows(n):
        nonlocal next_k
        rows = [(next_k + i, rnd.randrange(1000)) for i in range(n)]
        next_k += n
        return rows

    model = {k: v for k, v in fresh_rows(rnd.randrange(5, 20))}
    table_create(_frame(spark, sorted(model.items())), root)
    history = {1: dict(model)}  # sid -> expected content

    for _ in range(12):
        op = rnd.choice(["append", "delete", "merge", "compact", "cluster", "expire"])
        if op == "append":
            rows = fresh_rows(rnd.randrange(1, 15))
            sid = table_append(_frame(spark, rows), root)
            model.update(rows)
        elif op == "delete":
            if not model:
                continue
            cut = rnd.choice(sorted(model))
            sid = table_delete_where(
                spark, root, f"k >= {cut}", predicates=[("k", ">=", cut)]
            )
            model = {k: v for k, v in model.items() if k < cut}
        elif op == "merge":
            # mix of updates to existing keys and brand-new keys
            ups = {}
            for k in rnd.sample(sorted(model), min(len(model), rnd.randrange(0, 5))):
                ups[k] = rnd.randrange(1000)
            for k, v in fresh_rows(rnd.randrange(0, 4)):
                ups[k] = v
            if not ups:
                continue
            sid = table_merge(spark, root, _frame(spark, sorted(ups.items())), "k")
            model.update(ups)
        elif op == "compact":
            sid = table_compact(spark, root, target_bytes=1 << 30)
        elif op == "cluster":
            if not model:
                continue
            sid = table_cluster(spark, root, ["k", "v"], n_files=rnd.randrange(1, 4))
        else:  # expire
            keep = rnd.randrange(1, len(table_snapshots(root)) + 1)
            kept_ids = {s["id"] for s in table_snapshots(root)[-keep:]}
            table_expire_snapshots(root, keep=keep)
            history = {sid: m for sid, m in history.items() if sid in kept_ids}
            sid = max(kept_ids)
        history[sid] = dict(model)

        if model:
            assert _read_set(spark, root) == sorted(model.items()), f"seed={seed} op={op}"
        else:
            # a delete at the min key empties the table; reading an empty
            # snapshot raises by contract (no schema source)
            with pytest.raises(ValueError):
                _read_set(spark, root)

    # time travel into every surviving snapshot still matches its
    # recorded point-in-time content
    surviving = {s["id"] for s in table_snapshots(root)}
    for sid, snap_model in history.items():
        if sid in surviving and snap_model:
            assert _read_set(spark, root, snapshot=sid) == sorted(snap_model.items()), (
                f"seed={seed} time-travel sid={sid}"
            )
