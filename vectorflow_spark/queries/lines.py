"""Line-level cleaning + corpus curation extensions (CCNet-style)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from vectorflow_spark.queries._core import _t, query
from vectorflow_spark.queries.similarity import _DUCK_COS


# ---------------------------------------------------------------------------
# Line-level cleaning + corpus-curation operators (round 2 extensions)
# ---------------------------------------------------------------------------

# Synthetic line framing shared by the two line-dedup queries: the driver
# documents are single-line, so boilerplate is constructed around them the
# way the markdown-parity query constructs markdown — a per-language NAV
# header (repeated within the doc), a global FOOTER (repeated within the
# doc AND across every doc), the document body, and a unique ID line.
_LINE_FRAME_SQL = (
    "'NAV ' || lang || chr(10) || text || chr(10) || 'NAV ' || lang || chr(10) || "
    "'FOOTER' || chr(10) || 'ID ' || CAST(doc_id AS VARCHAR) || chr(10) || 'FOOTER'"
)


def _line_frame_col() -> F.Column:
    return F.concat(
        F.lit("NAV "), F.col("lang"), F.lit("\n"),
        F.col("text"), F.lit("\n"),
        F.lit("NAV "), F.col("lang"), F.lit("\n"),
        F.lit("FOOTER"), F.lit("\n"),
        F.lit("ID "), F.col("doc_id").cast("string"), F.lit("\n"),
        F.lit("FOOTER"),
    )


@query(
    "q_line_dedup_doc",
    f"""
    WITH t AS (SELECT doc_id, {_LINE_FRAME_SQL} AS txt FROM documents),
    l AS (SELECT doc_id, string_split(txt, chr(10)) AS lines FROM t)
    SELECT doc_id,
           array_to_string(
             list_filter(lines, (x, i) -> list_position(lines, x) = i),
             chr(10)) AS clean_text
    FROM l
    """,
)
def q_line_dedup_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document line dedup (keep-first) as ONE pure Catalyst
    expression — operators/lines.dedup_lines_in_doc_expr: split ->
    filter((x, i) -> array_position(lines, x) == i+1) -> array_join.
    Zero shuffle, zero Python; array_position returns the FIRST index, so
    a line survives iff it is the first occurrence. The repeated NAV and
    FOOTER lines collapse; body and ID lines survive. This is the
    intra-page half of CCNet-style line dedup."""
    from vectorflow_spark.operators.lines import dedup_lines_in_doc_expr

    d = _t(spark, sf_dir, "documents", split=True)
    return d.select(
        "doc_id", dedup_lines_in_doc_expr(_line_frame_col()).alias("clean_text")
    )


@query(
    "q_drop_frequent_lines",
    f"""
    WITH t AS (SELECT doc_id, {_LINE_FRAME_SQL} AS txt FROM documents),
    lines AS (
        SELECT doc_id, unnest(string_split(txt, chr(10))) AS line,
               generate_subscripts(string_split(txt, chr(10)), 1) AS pos
        FROM t
    ),
    freq AS (
        SELECT line FROM lines WHERE trim(line) != ''
        GROUP BY line HAVING count(DISTINCT doc_id) >= 10
    ),
    kept AS (
        SELECT l.doc_id, l.pos, l.line FROM lines l
        ANTI JOIN freq f ON l.line = f.line
    ),
    rebuilt AS (
        SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_lines_kept,
           CAST(len(string_split(t.txt, chr(10))) - coalesce(r.n_kept, 0) AS BIGINT)
               AS n_lines_dropped
    FROM t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
    """,
)
def q_drop_frequent_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-level boilerplate-line removal (the CCNet cleaning pass the
    reference roadmap's dedup implies): lines appearing in >= 10 distinct
    documents (every NAV header ~100 docs/language, FOOTER all docs) are
    stripped and each document is rebuilt in original line order; body and
    unique ID lines survive. Plan (operators/lines.drop_frequent_lines):
    one map-side-combined frequency count, a BROADCAST anti-join (the
    frequent set is bounded by total_lines/min_count), and one rebuild
    aggregation keyed on doc_id — the exploded lines never shuffle for the
    filter itself."""
    from vectorflow_spark.operators.lines import drop_frequent_lines

    d = _t(spark, sf_dir, "documents", split=True).select(
        "doc_id", _line_frame_col().alias("framed")
    )
    return drop_frequent_lines(
        d, doc_col="doc_id", text_col="framed", min_doc_count=10
    )


@query(
    "q_token_budget_select",
    r"""
    WITH toks AS (
        SELECT doc_id, n_chars,
               CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t != ''))
                    AS BIGINT) AS n_tok
        FROM documents
    ),
    run AS (
        SELECT doc_id, n_tok,
               sum(n_tok) OVER (ORDER BY n_chars DESC, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS running_tok
        FROM toks
    ),
    tot AS (SELECT sum(n_tok) // 2 AS budget FROM toks)
    SELECT doc_id, n_tok, CAST(running_tok AS BIGINT) AS running_tok
    FROM run, tot WHERE running_tok <= budget
    """,
)
def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection — "take documents in priority order
    (longest first) until half the corpus token count": the standard
    curation step when a training run has a token budget, composed from
    the distributed ranking operator. The running total comes from
    operators/ranking.global_running_sum (range-sort + partition-offset),
    NOT a global window — a bare sum() OVER (ORDER BY ...) serializes the
    corpus through one task at 100 TB. The budget itself is a broadcast
    1-row re-aggregation, never a driver collect."""
    from vectorflow_spark.operators.ranking import global_running_sum

    d = _t(spark, sf_dir, "documents", split=True)
    toks = d.select(
        "doc_id",
        "n_chars",
        F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")).cast(
            "long"
        ).alias("n_tok"),
    )
    # The token-budget scalar rides the running sum's own totals table
    # (total_col) — the separate toks.agg(sum) re-ran the whole tokenize
    # pipeline for one number, a second full corpus pass at scale (r12;
    # guide §2.3 aggregate-once). budget = total div 2, same integer.
    run = global_running_sum(
        toks,
        [F.col("n_chars").desc(), F.col("doc_id")],
        "n_tok",
        out_col="running_tok",
        total_col="_tok_total",
    )
    return (
        run.filter(F.col("running_tok") <= F.expr("_tok_total div 2"))
        .select("doc_id", "n_tok", F.col("running_tok").cast("long").alias("running_tok"))
    )


@query(
    "q_domain_mixture",
    r"""
    WITH d AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(list_filter(string_split_regex(text, '\s+'), t -> t != '')))
                    AS BIGINT) AS n_tok
        FROM documents GROUP BY lang
    ),
    w AS (
        SELECT lang, n_docs, n_tok,
               CAST(floor(sqrt(CAST(n_tok AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS wq
        FROM d
    ),
    t AS (SELECT sum(wq) AS tot FROM w)
    SELECT lang, n_docs, n_tok,
           CAST(wq * 1000000 // tot AS BIGINT) AS weight_ppm
    FROM w, t
    """,
)
def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted domain mixture (alpha = 0.5): per-language
    sampling weights proportional to sqrt(domain token count) — the
    standard flattening that upweights low-resource domains when
    composing a training mixture (multilingual LM recipes). Exactness:
    sqrt is correctly rounded IEEE on both engines, the weight is
    micro-quantized half-up to an int64 BEFORE the cross-domain sum, and
    the normalized weight is an integral ppm division — no float fold
    order anywhere. One map-side-combined aggregation + a broadcast 1-row
    total."""
    d = _t(spark, sf_dir, "documents", split=True)
    per = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""))
        ).cast("long").alias("n_tok"),
    )
    w = per.withColumn(
        "wq",
        F.floor(F.sqrt(F.col("n_tok").cast("double")) * 1_000_000 + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    tot = w.agg(F.sum("wq").alias("_tot"))
    return (
        w.join(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_tok",
            F.expr("CAST(wq * 1000000 div _tot AS BIGINT)").alias("weight_ppm"),
        )
    )


def _bow_weights(n_buckets: int = 64) -> list[int]:
    """Deterministic classifier weights in [-8, 8]: md5-derived per bucket,
    generated identically for the Spark literal array and the oracle SQL."""
    import hashlib

    return [
        int(hashlib.md5(f"bow-w-{b}".encode()).hexdigest()[:6], 16) % 17 - 8
        for b in range(n_buckets)
    ]


def _hashed_bow_sql(n_buckets: int = 64) -> str:
    w = _bow_weights(n_buckets)
    wlist = "[" + ", ".join(str(v) for v in w) + "]"
    bucket = f"(('0x' || substr(md5(t), 1, 6))::BIGINT % {n_buckets})"
    return rf"""
    WITH toks AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(text, '\s+'), t -> t != '') AS ts
        FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(ts) AS BIGINT) AS n_tok,
           CAST(coalesce(list_sum(list_transform(ts, t -> {wlist}[{bucket} + 1])), 0)
                AS BIGINT) AS score,
           CASE WHEN coalesce(list_sum(list_transform(ts, t -> {wlist}[{bucket} + 1])), 0) >= 0
                THEN 'keep' ELSE 'drop' END AS decision
    FROM toks
    """


@query("q_hashed_bow_score", _hashed_bow_sql())
def q_hashed_bow_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed bag-of-words linear classifier inference — the fastText-style
    model-based quality filter (CCNet/LLaMA-recipe Wikipedia-likeness
    scoring) as a pure expression: token -> md5 hash bucket (mod 64) ->
    literal weight-table lookup -> integer sum -> keep/drop. Weights are
    deterministic literals inlined in BOTH engines; the score is exact
    int64 (order-free), so a trained model exported as a weight array runs
    entirely JVM-side with no Python and no shuffle at any scale."""
    w = _bow_weights(64)
    # one parsed bigint-array expression, not 64 py4j lit+cast round-trips
    wlit = F.expr("array(" + ",".join(f"{int(v)}L" for v in w) + ")")
    d = _t(spark, sf_dir, "documents", split=True)
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    bucket = lambda t: F.conv(F.substring(F.md5(t), 1, 6), 16, 10).cast("bigint") % 64  # noqa: E731
    score = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.element_at(wlit, (bucket(t) + 1).cast("int")),
    )
    return d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tok"),
        score.alias("score"),
        F.when(score >= 0, F.lit("keep")).otherwise(F.lit("drop")).alias("decision"),
    )


def _ivf_recall_sql(k: int = 25, nprobe: int = 4) -> str:
    ones_cos = (
        "round(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE)))"
        " / (sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * sqrt(64.0)), 9)"
    )
    cos_ec = _DUCK_COS.format(a="e.embedding", b="c.cvec")
    return f"""
    WITH truth AS (
        SELECT vec_id FROM (
            SELECT vec_id, {ones_cos.format(v="embedding")} AS score FROM embeddings
        ) ORDER BY score DESC, vec_id LIMIT {k}
    ),
    cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cvec
        FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    probe AS (
        SELECT cid FROM (SELECT cid, {ones_cos.format(v="cvec")} AS s FROM cents)
        ORDER BY s DESC, cid LIMIT {nprobe}
    ),
    scored AS (
        SELECT e.vec_id, c.cid, {cos_ec} AS s
        FROM embeddings e CROSS JOIN cents c
    ),
    best AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
            FROM scored
        ) WHERE rn = 1
    ),
    approx AS (
        SELECT e.vec_id FROM embeddings e
        JOIN best b ON e.vec_id = b.vec_id
        JOIN probe p ON b.cid = p.cid
        ORDER BY {ones_cos.format(v="e.embedding")} DESC, e.vec_id LIMIT {k}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_truth,
           CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS recall
    FROM truth t LEFT JOIN approx a ON t.vec_id = a.vec_id
    """


@query("q_ivf_recall", _ivf_recall_sql())
def q_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF quality audit: recall@25 of the nprobe=4 IVF search against the
    brute-force ground truth — the eval gate before trusting an ANN index
    config, completing the recall family started by q_lsh_recall. Both
    sides are already-verified pipelines; the comparison is one left join
    on vec_id over two k-row frames (trivial at any scale — the expensive
    parts are the searches, and IVF's is the pruned one)."""
    from vectorflow_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        ivf_topk_cosine,
        topk_cosine,
    )

    emb = _t(spark, sf_dir, "embeddings", split=True)
    truth = topk_cosine(emb, [1.0] * 64, k=25).select("vec_id")
    cents = ivf_centroids(emb, n_centroids=16)
    assigned = ivf_assign(emb, cents)
    approx = ivf_topk_cosine(assigned, cents, [1.0] * 64, k=25, nprobe=4).select(
        "vec_id", F.lit(True).alias("hit")
    )
    j = truth.join(approx, "vec_id", "left")
    hits = F.sum(F.when(F.col("hit"), 1).otherwise(0))
    return j.agg(
        F.count(F.lit(1)).alias("n_truth"),
        hits.cast("bigint").alias("n_hit"),
        (hits.cast("double") / F.count(F.lit(1))).alias("recall"),
    )


def _centroid_classify_sql(quant: int = 1_000_000) -> str:
    return f"""
    WITH q AS (
        SELECT vec_id, label,
               list_transform(embedding,
                              x -> CAST(floor(CAST(x AS DOUBLE) * {quant} + 0.5) AS BIGINT)) AS qv
        FROM embeddings
    ),
    ex AS (
        SELECT label, unnest(qv) AS v, generate_subscripts(qv, 1) AS dim FROM q
    ),
    cent AS (
        SELECT label, dim, sum(v) // count(*) AS cq FROM ex GROUP BY label, dim
    ),
    carr AS (
        SELECT label AS clabel, list(cq ORDER BY dim) AS cvec FROM cent GROUP BY label
    ),
    dist AS (
        SELECT q.vec_id, q.label, c.clabel,
               list_sum(list_transform(range(1, len(q.qv) + 1),
                        i -> CAST(q.qv[i] - c.cvec[i] AS HUGEINT)
                             * CAST(q.qv[i] - c.cvec[i] AS HUGEINT))) AS d2
        FROM q CROSS JOIN carr c
    ),
    assigned AS (
        SELECT vec_id, label, clabel FROM (
            SELECT vec_id, label, clabel,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
            FROM dist
        ) WHERE rn = 1
    )
    SELECT label AS true_label, clabel AS assigned_label,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM assigned GROUP BY 1, 2
    """


def _maxsim_sql(n_tok: int = 8, dsub: int = 8, n_queries: int = 4, topk: int = 3) -> str:
    dot = " + ".join(f"qt[{j}] * dt[{j}]" for j in range(1, dsub + 1))
    qnorm = "sqrt(" + " + ".join(f"qt[{j}] * qt[{j}]" for j in range(1, dsub + 1)) + ")"
    dnorm = "sqrt(" + " + ".join(f"dt[{j}] * dt[{j}]" for j in range(1, dsub + 1)) + ")"
    return f"""
    WITH toks AS (
        SELECT vec_id,
               list_transform(range(1, {n_tok + 1}),
                   t -> list_transform(embedding[(t-1)*{dsub}+1 : t*{dsub}],
                                       x -> CAST(x AS DOUBLE))) AS tokens
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, tokens AS qtoks FROM toks WHERE vec_id < {n_queries}),
    d AS (SELECT vec_id AS doc_id, tokens AS dtoks FROM toks WHERE vec_id >= {n_queries}),
    scored AS (
        SELECT q.query_id, d.doc_id,
               list_sum(list_transform(q.qtoks, qt ->
                   CAST(list_max(list_transform(d.dtoks, dt ->
                       CAST(floor(
                           CASE WHEN {qnorm} * {dnorm} = 0 THEN 0.0
                                ELSE ({dot}) / ({qnorm} * {dnorm}) END * 1000000 + 0.5
                       ) AS BIGINT))) AS BIGINT)
               )) AS maxsim_micro
        FROM q CROSS JOIN d
    ),
    ranked AS (
        SELECT query_id, doc_id, CAST(maxsim_micro AS BIGINT) AS maxsim_micro,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY maxsim_micro DESC, doc_id) AS rnk
        FROM scored
    )
    SELECT query_id, doc_id, maxsim_micro, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {topk}
    """


@query("q_maxsim_rerank", _maxsim_sql())
def q_maxsim_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style LATE-INTERACTION retrieval scoring: each document and
    query carries a BAG of token vectors (the 64-dim embedding split into
    8 x 8-dim token vectors — the multi-vector shape), and relevance is
    MaxSim — for every query token take its best cosine against the doc's
    tokens, sum over query tokens. The op single-vector search cannot
    express: a doc matching every query token weakly can outrank one
    matching a single token perfectly. Per-token cosines are
    micro-quantized (floor(cos*1e6+0.5)) BEFORE the max/sum folds so
    ranking is integer-exact cross-engine — the house determinism
    discipline.

    Plan: the query side is k documents by construction (vec_id < 4) and
    broadcasts; scoring is a bounded BNLJ (corpus never shuffles — the
    q_knn_batch contract) with the whole MaxSim fold as ONE transform/
    aggregate HOF expression per pair, then a per-query WindowGroupLimit
    top-k. At 100 TB the same plan reranks the candidate set an IVF/LSH
    first stage returns, which is exactly how late-interaction engines
    deploy (coarse retrieve -> MaxSim rerank)."""
    from vectorflow_spark.operators.similarity import maxsim_rerank

    n_tok, dsub, n_queries, topk = 8, 8, 4, 3
    emb = _t(spark, sf_dir, "embeddings", split=True)
    toks = emb.select(
        "vec_id",
        F.expr(
            f"transform(sequence(1, {n_tok}), t -> transform("
            f"slice(embedding, (t-1)*{dsub}+1, {dsub}), x -> CAST(x AS DOUBLE)))"
        ).alias("tokens"),
    )
    q = toks.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("tokens").alias("qtoks")
    )
    d = toks.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("doc_id"), F.col("tokens").alias("dtoks")
    )
    return maxsim_rerank(q, d, topk=topk)


@query("q_centroid_classify", _centroid_classify_sql())
def q_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (prototype) classification with a confusion-matrix
    rollup: per-label mean centroids from micro-quantized exact integer
    sums (sum div count — no float mean), then every vector assigned to
    the nearest centroid by exact integer squared-L2 (decimal-cast before
    squaring; ties break on label). Plan: one (label, dim) aggregation for
    centroids — 5x64 groups, map-side combined — re-packed to 5 array
    rows that BROADCAST into the scoring cross join (5 rows/vector), a
    per-vector argmin window bounded by 5 rows, and a tiny confusion
    aggregation. The label-prototype scoring shape behind SemDeDup-style
    cluster audits and cheap embedding-space eval."""
    quant = 1_000_000
    emb = _t(spark, sf_dir, "embeddings", split=True)
    q = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * quant + F.lit(0.5)).cast("bigint"),
        ).alias("qv"),
    )
    ex = q.select("label", F.posexplode("qv").alias("dim0", "v"))
    cent = ex.groupBy("label", "dim0").agg(F.expr("sum(v) div count(*)").alias("cq"))
    carr = cent.groupBy(F.col("label").alias("clabel")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim0", "cq"))), lambda s: s["cq"]
        ).alias("cvec")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.col("cvec"),
            lambda a, b: (a - b).cast("decimal(38,0)") * (a - b).cast("decimal(38,0)"),
        ),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, x: acc + x,
    )
    dist = q.crossJoin(F.broadcast(carr)).select(
        "vec_id", "label", "clabel", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "clabel")
    assigned = dist.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return assigned.groupBy(
        F.col("label").alias("true_label"), F.col("clabel").alias("assigned_label")
    ).agg(F.count(F.lit(1)).alias("n_vectors"))


@query(
    "q_bpe_merge_step",
    r"""
    WITH toks AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t != ''))
               AS tok
        FROM documents
    ),
    wf AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY tok),
    pairs AS (
        SELECT unnest(list_transform(range(1, length(tok)), i -> substr(tok, i, 2)))
               AS pair,
               freq
        FROM wf WHERE length(tok) >= 2
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 20
    """,
)
def q_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed BPE-training merge step: the most frequent adjacent
    symbol pair over the corpus, weighted by word frequency — exactly what
    a tokenizer trainer (functions/bpe.py consumes the resulting ranks)
    computes per merge round. Plan: token explode -> word-frequency count
    (map-side combined, distinct-word sized) -> per-word adjacent-pair
    explode over the DISTINCT word table (corpus scale drops out after the
    first count: pair generation touches vocabulary, not corpus) -> one
    pair aggregation + TakeOrderedAndProject top-20. Integer counts,
    deterministic pair tiebreak."""
    d = _t(spark, sf_dir, "documents", split=True)
    toks = d.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("tok")
    )
    wf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    # positional substring needs the lambda variable as the start index —
    # expressed via SQL transform (the python-lambda substr form can't take
    # a Column start before Spark 4's substr(Column, Column))
    pairs = (
        wf.filter(F.length("tok") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
            ).alias("pair"),
            "freq",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


@query(
    "q_vocab_coverage",
    r"""
    WITH toks AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t != ''))
               AS tok
        FROM documents
    ),
    tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY tok),
    run AS (
        SELECT tok, freq,
               sum(freq) OVER (ORDER BY freq DESC, tok
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_freq,
               row_number() OVER (ORDER BY freq DESC, tok) AS rank
        FROM tf
    ),
    tot AS (SELECT sum(freq) AS n_total FROM tf)
    SELECT CAST(rank AS BIGINT) AS rank, tok, freq,
           CAST(cum_freq AS BIGINT) AS cum_freq,
           CAST(cum_freq * 1000000 // n_total AS BIGINT) AS coverage_ppm
    FROM run, tot WHERE rank <= 30
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve (top 30): cumulative share of corpus
    tokens covered by the k most frequent terms — how a tokenizer/vocab
    size is chosen ("cover 99.x% of tokens"). The cumulative sum comes
    from operators/ranking.global_running_sum over the DISTINCT-term
    table in (freq DESC, term) order — vocabulary-sized input, and still
    no single-task global window even when the vocabulary itself is
    huge. Coverage is integral ppm: integer-exact on both engines."""
    from vectorflow_spark.operators.ranking import global_running_sum

    d = _t(spark, sf_dir, "documents", split=True)
    toks = d.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("tok")
    )
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    order = [F.col("freq").desc(), F.col("tok")]
    # rank, cumulative sum AND the corpus total share ONE range exchange +
    # pin (r12): rank_col and total_col ride global_running_sum's window
    # and totals machinery. The separate tf.agg(sum) re-ran the whole
    # tokenize+groupBy pipeline for one scalar — a second full corpus
    # pass at scale (guide §2.3 aggregate-once).
    ranked = global_running_sum(
        tf, order, "freq", out_col="cum_freq", rank_col="rank", total_col="_n_total"
    )
    return (
        ranked.filter(F.col("rank") <= 30)
        .select(
            F.col("rank").cast("long").alias("rank"),
            "tok",
            "freq",
            F.col("cum_freq").cast("long").alias("cum_freq"),
            F.expr("CAST(cum_freq * 1000000 div _n_total AS BIGINT)").alias("coverage_ppm"),
        )
    )


@query(
    "q_doc_embedding_pool",
    """
    WITH q AS (
        SELECT vec_id // 10 AS doc_id,
               list_transform(embedding,
                              x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv
        FROM embeddings
    ),
    ex AS (
        SELECT doc_id, generate_subscripts(qv, 1) - 1 AS dim, unnest(qv) AS v FROM q
    )
    SELECT doc_id, CAST(dim AS INT) AS dim,
           CAST(sum(v) // count(*) AS BIGINT) AS pooled_q
    FROM ex GROUP BY doc_id, dim
    """,
)
def q_doc_embedding_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pool chunk embeddings back to document embeddings — the
    standard reduction after the reference's chunk->embed pipeline when
    a doc-level vector is wanted (chunks of a doc = vec_id div 10 here).
    Exactness: micro-quantize each component half-up to int64 BEFORE the
    mean, integral sum div count — a float mean would be partitioning-
    dependent. Plan: one posexplode + one (doc, dim) aggregation,
    map-side combined, groups = docs x dims; no window, no join. At
    100 TB this is the same shape as the k-means centroid update
    (q_kmeans_step) keyed by document instead of cluster."""
    quant = 1_000_000
    emb = _t(spark, sf_dir, "embeddings", split=True)
    q = emb.select(
        F.expr("vec_id div 10").alias("doc_id"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * quant + F.lit(0.5)).cast("bigint"),
        ).alias("qv"),
    )
    ex = q.select("doc_id", F.posexplode("qv").alias("dim", "v"))
    return ex.groupBy("doc_id", F.col("dim").cast("int").alias("dim")).agg(
        F.expr("CAST(sum(v) div count(*) AS BIGINT)").alias("pooled_q")
    )


def _hard_negatives_sql(n_anchors: int = 5, k: int = 3) -> str:
    cos = _DUCK_COS.format(a="v.embedding", b="a.embedding")
    return f"""
    WITH anchors AS (
        SELECT vec_id AS a_id, label AS a_label, embedding
        FROM embeddings WHERE vec_id < {n_anchors}
    ),
    scored AS (
        SELECT a.a_id, a.a_label, v.vec_id, v.label, round({cos}, 9) AS score
        FROM embeddings v CROSS JOIN anchors a
        WHERE v.label <> a.a_label
    ),
    ranked AS (
        SELECT a_id, a_label, vec_id, label AS neg_label, score,
               row_number() OVER (PARTITION BY a_id ORDER BY score DESC, vec_id) AS rank
        FROM scored
    )
    SELECT a_id, a_label, vec_id, neg_label, score, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


@query("q_hard_negatives", _hard_negatives_sql())
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for each
    anchor, the top-k most-similar vectors with a DIFFERENT label — the
    pairs that actually move a metric-learning loss. Same broadcast
    nested-loop + per-anchor window shape as q_knn_batch with the label
    disagreement pushed into the join predicate, so same-label pairs
    never reach the scorer. At corpus scale the anchor side is the
    (small) training batch and the vector side is the indexed corpus —
    swap the brute-force scan for the IVF/LSH probe to mine from an
    index."""
    emb = _t(spark, sf_dir, "embeddings", split=True)
    anchors = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").alias("a_vec"),
    )
    from vectorflow_spark.functions.vector import dot, l2_norm

    v = emb.withColumn("_vn", l2_norm("embedding"))
    a = anchors.withColumn("_an", l2_norm("a_vec"))
    joined = v.join(F.broadcast(a), F.col("label") != F.col("a_label"))
    denom = F.col("_vn") * F.col("_an")
    scored = joined.select(
        "a_id",
        "a_label",
        "vec_id",
        F.col("label").alias("neg_label"),
        F.round(
            F.when(denom != 0.0, dot("embedding", "a_vec") / denom), 9
        ).alias("score"),
    )
    w = Window.partitionBy("a_id").orderBy(F.col("score").desc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
    )


@query(
    "q_variant_extract",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via the VARIANT type (Spark 4): parse_json
    once into the binary variant encoding, then typed variant_get paths —
    the engine-native successor to per-access get_json_object string
    re-parsing (each string access re-tokenizes the JSON; variant decodes
    once and field access is an offset lookup, the difference between
    O(fields * len) and O(len) per row on wide metadata blobs). Aggregated
    to integer sums so the check is exact; the oracle reads the same
    fields with DuckDB's JSON extraction."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("p")
    ).select(
        "event_type", F.variant_get("p", "$.k", "bigint").alias("k")
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.max("k").cast("bigint").alias("max_k"),
    )


