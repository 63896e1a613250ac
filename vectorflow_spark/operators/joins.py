"""Temporal join operators for event/feature alignment.

The reference has no joins in its data plane (SURVEY.md §2.12) — these are
the extension operators a training-data pipeline needs when aligning event
streams with slowly-changing context (features, labels, sessions).

``asof_join`` is implemented as the union-sort-window composition rather
than a range join: tag both sides, union, and carry the last right-side row
forward within each key with an ``ignorenulls`` window. One shuffle on the
key, one sort within partitions — the same cost profile as a sort-merge
join, with no range-explosion and no skew beyond what the key itself has.
(A ``l.ts BETWEEN r.ts AND r.ts + delta`` range join would make Catalyst
fall back to a broadcast-nested-loop or an inequality sort-merge that
re-scans the right side per row; the union form is linear.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row with the same ``on``
    key: ``backward`` (default) takes the most recent right row with
    ``right_ts <= left_ts`` ("latest feature value at event time");
    ``forward`` takes the earliest right row with ``right_ts >= left_ts``
    ("next outcome after the event" — label alignment). Left rows with no
    qualifying right row keep nulls — LEFT ASOF semantics.

    ``tolerance`` (same units as the ts columns) bounds the match
    distance: a nearest match farther than the tolerance becomes NULL —
    "a feature older than 10 minutes is no feature". Applied AFTER the
    window scan, so it adds one projection, not a join condition (the
    union-sort-window plan is unchanged).

    Right-side ties on (key, ts) are resolved by the ordering of
    ``right_cols[0]`` descending (pre-aggregate the right side to unique
    (key, ts) rows when exact tie semantics matter).

    Returns every left column plus ``{prefix}{c}`` for each right column.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.struct(*left.columns).alias("_l"),
    )
    r_struct = F.struct(F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_cols])
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        r_struct.alias("_r"),
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows (_tag 0) sort before left rows at equal ts, so the
    # boundary instant is included in both directions; _r is null on left
    # rows and last(ignorenulls) carries the nearest right payload along
    # the scan direction (ascending for backward, descending for forward).
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_order, F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    if tolerance is not None:
        dist = (
            F.col("_ts") - F.col("_m._rts")
            if direction == "backward"
            else F.col("_m._rts") - F.col("_ts")
        )
        matched = matched.withColumn("_m", F.when(dist <= tolerance, F.col("_m")))
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_m._rts").alias(f"{prefix}{right_ts}"))
    out_cols.extend(F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols)
    return matched.select(*out_cols)


def skew_profiled_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    heavy_threshold: int = 100_000,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Auto-detecting skew join: profile the fact side's key histogram,
    salt ONLY the heavy keys, and union with the untouched light path —
    the production fix when a handful of keys (the null-ish user, the
    default tenant, the viral document) would otherwise pin one reducer
    while 999 executors idle.

    Plan, in three verifiable pieces:
    1. PROFILE: one map-side-combinable ``groupBy(key).count()`` over the
       fact table; keys with count > ``heavy_threshold`` become the heavy
       set. The profile shuffles only the per-key count table, and the
       heavy set is bounded by construction (at most rows/threshold keys
       can exceed the threshold), so it broadcasts.
    2. LIGHT PATH: fact rows whose key is NOT heavy join ``dim`` on the
       plain key — zero overhead for the non-skewed 99.99%.
    3. HEAVY PATH: heavy fact rows get a per-row salt
       (pmod(xxhash64 over the fact row's key + a partition-local
       counter), uniform), the heavy SLICE of dim (semi-joined first, so
       replication cost is heavy keys x salts, not |dim| x salts)
       explodes across all salts, and the join key becomes (key, salt):
       a key with m rows spreads over ``num_salts`` tasks.

    The union is row-identical to the plain join (salts never leave the
    plan), so the operator stays oracle-checkable against the unsalted
    SQL. AQE's skew-join handles the moderate cases at runtime; this is
    the explicit form for EXTREME known skew, where you also want the
    profile (step 1) logged as a first-class artifact. ``how`` supports
    inner/left joins (fact side preserved).

    Cost note at 100 TB: the profile is a second scan of the fact table
    (map-side combined, so it ships only the count table — cheap in
    shuffle, not in read I/O). When even that scan is too dear, profile a
    ``fact.sample(0.01)`` with ``heavy_threshold`` scaled by the fraction:
    a key heavy enough to hurt is heavy in any 1% sample, and a
    false-positive heavy key merely pays harmless salting."""
    if how not in ("inner", "left"):
        raise ValueError(f"skew_profiled_join supports inner/left, got {how!r}")
    # Overlapping names would silently corrupt the left-join null path
    # (withColumn(c, NULL) over a shared name overwrites the FACT column)
    # and degrade unionByName across the light/heavy branches, so refuse
    # up front; rename dim columns before calling.
    overlap = sorted(set(fact.columns) & set(dim.columns))
    if overlap:
        raise ValueError(
            f"skew_profiled_join: fact and dim share column names {overlap}; "
            "alias the dim side first"
        )
    # NULL fact keys can never match (SQL equality), yet a hash shuffle
    # sends them ALL to one partition — the literal "null-ish user" skew
    # this operator exists to fix. Route them around the join entirely:
    # inner drops them (what the plain join does), left appends them with
    # null dim columns, and neither path ever shuffles them.
    fact_null = fact.filter(F.col(fact_key).isNull())
    fact = fact.filter(F.col(fact_key).isNotNull())
    counts = fact.groupBy(F.col(fact_key).alias("_hk")).agg(F.count(F.lit(1)).alias("_n"))
    heavy = counts.filter(F.col("_n") > heavy_threshold).select("_hk").localCheckpoint()

    fact_light = fact.join(
        F.broadcast(heavy), fact[fact_key] == heavy["_hk"], "left_anti"
    )
    fact_heavy = fact.join(
        F.broadcast(heavy), fact[fact_key] == heavy["_hk"], "left_semi"
    )
    light = fact_light.join(dim, fact_light[fact_key] == dim[dim_key], how)

    # dim's heavy slice only — replication is heavy_keys x salts
    dim_heavy = dim.join(F.broadcast(heavy), dim[dim_key] == heavy["_hk"], "left_semi")
    salts = F.array(*[F.lit(i) for i in range(num_salts)])
    f_salted = fact_heavy.withColumn(
        "_fsalt",
        F.pmod(
            F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(num_salts),
        ).cast("int"),
    )
    d_salted = dim_heavy.withColumn("_dsalt", F.explode(salts)).withColumn(
        "_dsalt", F.col("_dsalt").cast("int")
    )
    heavy_joined = (
        f_salted.join(
            d_salted,
            (f_salted[fact_key] == d_salted[dim_key]) & (f_salted["_fsalt"] == d_salted["_dsalt"]),
            how,
        )
        .drop("_fsalt")
        .drop("_dsalt")
    )
    out = light.unionByName(heavy_joined)
    if how == "left":
        nulls = fact_null
        for c in dim.columns:
            nulls = nulls.withColumn(c, F.lit(None).cast(dim.schema[c].dataType))
        out = out.unionByName(nulls)
    return out


def anti_join(left: DataFrame, right: DataFrame, left_key: str, right_key: str | None = None) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (left_anti — one shuffle,
    or a broadcast hash anti when the right side is small)."""
    right_key = right_key or left_key
    return left.join(
        right.select(F.col(right_key).alias(left_key)).distinct(),
        on=left_key,
        how="left_anti",
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_size: int,
) -> DataFrame:
    """Inner join on interval overlap (``l_start <= r_end AND r_start <=
    l_end``; closed bounds, integer columns) — the scale-safe alternative
    to what Spark plans for a raw inequality join: a broadcast-nested-loop
    over the full cross product.

    Both sides explode their intervals into fixed-width bins
    (``sequence(start div bin, end div bin)``) and equi-join on the bin, so
    only temporally-close rows ever meet, and AQE/skew handling applies
    because it IS an equi-join. A pair overlapping several shared bins is
    emitted exactly once — from the bin containing ``greatest(l_start,
    r_start)`` — so no distinct pass is needed afterwards.

    Cost model: each row fans out to ``interval_len/bin_size + 1`` bin
    rows; pick ``bin_size`` near the median interval length so the fan-out
    stays O(1) per row. A pathologically long interval degrades to many
    bins (never to a cross product); cap such outliers upstream if the
    domain allows. Columns must be integers (epoch seconds/nanos) and
    distinct between the two sides."""
    lb = left.withColumn(
        "_bin", F.explode(F.sequence(F.expr(f"`{l_start}` div {bin_size}"), F.expr(f"`{l_end}` div {bin_size}")))
    )
    rb = right.withColumn(
        "_bin", F.explode(F.sequence(F.expr(f"`{r_start}` div {bin_size}"), F.expr(f"`{r_end}` div {bin_size}")))
    )
    pair_bin = F.expr(f"greatest(`{l_start}`, `{r_start}`) div {bin_size}")
    return (
        lb.join(rb, "_bin")
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("_bin") == pair_bin)
        )
        .drop("_bin")
    )


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance: int | None = None,
    coarse: int | None = 64,
) -> DataFrame:
    """The cogrouped-pandas twin of ``asof_join``: left and right rows meet
    in Arrow batches (``groupBy().cogroup()``) and pandas ``merge_asof``
    performs the alignment. Pinned to the union-sort-window operator by an
    equivalence test — the declarative form stays the default
    (oracle-verified, one shuffle of the UNION); this twin is the escape
    hatch for per-key alignment logic the window plan cannot express
    (custom interpolation, multi-column nearest, per-key state machines).

    ``coarse`` is the cogroup-cost control: cogrouping directly on ``on``
    invokes Python once per key — thousands of tiny frames. Cogrouping on
    ``hash(on) % coarse`` instead and letting ``merge_asof(by=on)`` do the
    per-key split inside each bucket keeps the Python-call count at
    ``coarse`` with identical semantics — the same bounded-task-count
    discipline a 100 TB run needs (measured ~4x at sf0.1). ``coarse=None``
    cogroups per key exactly.

    Integer right columns ride as pandas nullable Int64 so left rows with
    no qualifying match surface as NULL (merge_asof's NaN would otherwise
    break the Arrow long conversion)."""
    import pandas as pd

    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    rcols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
    rtypes = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    # column contract == asof_join's: matched right ts first, then payloads
    out_fields += [f"{prefix}{right_ts} {rtypes[right_ts]}"]
    out_fields += [f"{prefix}{c} {rtypes[c]}" for c in rcols]
    schema = ", ".join(out_fields)
    by = on if coarse else None

    def align(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf[[c for c in lpdf.columns if c != "_ck"]]
        lp = lpdf.sort_values([left_ts, on] if by else [left_ts], kind="mergesort")
        if lp.empty:
            return lp.assign(
                **{
                    f"{prefix}{c}": pd.Series(dtype="object")
                    for c in [right_ts] + rcols
                }
            )
        rsel = ([on] if by else []) + [right_ts] + rcols
        rp = rpdf[rsel].sort_values([right_ts] + ([on] if by else []), kind="mergesort")
        rp.columns = ([on] if by else []) + ["_rts"] + [f"{prefix}{c}" for c in rcols]
        for c in rp.columns:
            # value columns only — the merge keys must keep the left dtype
            if c not in ("_rts", on) and pd.api.types.is_integer_dtype(rp[c]):
                rp[c] = rp[c].astype("Int64")
        out = pd.merge_asof(
            lp,
            rp,
            left_on=left_ts,
            right_on="_rts",
            by=by,
            direction=direction,
            tolerance=tolerance,
        )
        out = out.rename(columns={"_rts": f"{prefix}{right_ts}"})
        mk = f"{prefix}{right_ts}"
        if pd.api.types.is_integer_dtype(rpdf[right_ts]):
            out[mk] = out[mk].astype("Int64")
        return out[list(lpdf.columns) + [mk] + [f"{prefix}{c}" for c in rcols]]

    if coarse:
        ck = F.pmod(F.xxhash64(F.col(on)), F.lit(coarse)).alias("_ck")
        gl = left.select("*", ck).groupBy("_ck")
        gr = right.select("*", ck).groupBy("_ck")
    else:
        gl, gr = left.groupBy(on), right.groupBy(on)
    return gl.cogroup(gr).applyInPandas(align, schema=schema)
