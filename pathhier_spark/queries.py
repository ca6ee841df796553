"""Driver-contract queries: one entry per implemented operator family
(SURVEY.md §2), each with a DuckDB-equivalent ANSI-SQL oracle.

Every query is a callable (spark, sf_dir) -> DataFrame; ORACLES[name] is the
SQL DuckDB runs on the same parquet (views pre-registered by the driver).
Column names and value rounding are aligned on both sides (the driver
compares row-count + schema + order-insensitive value hash).

Conventions:
  * every DOUBLE is round(x, 6) on both sides;
  * every ranking is computed on the unrounded value with a deterministic
    integer/string tie-break, identically on both sides;
  * tokenization parity: the SQL reproduces normalize_string + stopword
    semantics via literals generated from the same Python constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pathhier_spark import config
from pathhier_spark.functions.text import STOPWORDS, jaccard, tokenize
from pathhier_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
)
from pathhier_spark.operators.extract import extract_token_triples
from pathhier_spark.operators.linking import candidate_pairs
from pathhier_spark.operators.similarity import brute_force_topk
from pathhier_spark.operators.textstats import (
    _tokens as _tokens_q,
    char_entropy_profile,
    with_lang_id,
    with_quality_features,
    with_token_counts,
)

# ---------------------------------------------------------------------------
# shared literals (Python constants -> SQL literals, guaranteeing parity)
# ---------------------------------------------------------------------------

_STOP_SQL = "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in STOPWORDS) + "]"

# tokenize_string SQL (DuckDB): normalize + regex tokens + stopword drop with
# fallback (string_utils.py:5-24)
def _sql_norm(col: str) -> str:
    return (
        f"replace(replace(replace(replace(lower(trim({col})),"
        f"'-',' '),'_',' '),'/',' '),':',' ')"
    )


def _sql_raw_tokens(col: str) -> str:
    return f"regexp_extract_all({_sql_norm(col)}, '[A-Za-z0-9]+')"


def _sql_tokens(col: str) -> str:
    raw = _sql_raw_tokens(col)
    kept = f"list_filter({raw}, t -> not list_contains({_STOP_SQL}, t))"
    return f"(case when len({kept}) = 0 then {raw} else {kept} end)"


TRIGGERS = {
    "join": "participant",
    "filter": "controller",
    "merge": "component",
    "group": "member",
    "order": "to",
    "hash": "other",
}


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _rz(col, n: int):
    """Round, then normalize -0.0 -> +0.0 (IEEE-754: -0.0 + 0.0 == +0.0).
    DuckDB's round() can emit -0.0 where Spark emits +0.0 for the same
    numerically-zero value, and the driver's value hash distinguishes the
    sign bit (CORRECTNESS_r02 q30: one row, ent_id='hot ring' dim 51).
    Applied to every rounded double that can straddle zero; the SQL oracles
    add `+ 0.0` after their round() for the same reason."""
    return F.round(col, n) + F.lit(0.0)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents table, spread across the session's full parallelism: the
    driver testdata is a single parquet file (1-2 scan splits), which would
    cap every downstream explode/join at 2 tasks regardless of cores. The
    repartition is conditional on the scan's file count — a real many-file
    table at scale must not pay a pointless full shuffle."""
    return _tbl(spark, sf_dir, "documents")


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Compute-dense table read with the _docs() parallelism guarantee:
    the driver testdata ships each table as ONE parquet file with ONE row
    group, so a bare scan runs every codegen-fused stage up to the first
    exchange (tokenize/explode/vector quantization/partial agg) on a
    single core no matter the cluster size. Conditional on the file count
    < default parallelism, spread the rows once; a real many-file table
    at scale skips the shuffle entirely (guide §2: scale-adaptive
    partitioning, not a local-mode constant).

    Used ONLY for the compute-dense tables (documents: text regex work;
    embeddings: per-vector array math), where the measured win is large
    (q52 −60%). For the narrow relational tables (lineitem/orders/events)
    the first real operator is a join/groupBy whose own exchange already
    parallelizes everything after one cheap single-task shuffle write —
    there the extra exchange was a measured net LOSS (+0.4-0.7 s constant
    on every sub-second aggregate query), so those reads stay bare and
    hot self-joins pre-partition by their join key instead (q178)."""
    import os

    df = spark.read.parquet(_t(sf_dir, name))
    if os.environ.get("SPARK_GRAFT_PAR_SCAN", "1") == "0":
        return df
    par = spark.sparkContext.defaultParallelism
    if len(df.inputFiles()) < par:
        # hash-repartition on the table's primary key, NOT round-robin:
        # keyless repartition(n) pays a local sort of every input
        # partition (spark.sql.execution.sortBeforeRepartition, needed
        # for deterministic retries) — on the single scan task that sort
        # is serialized; a hash exchange on the unique key is sort-free,
        # deterministic under retries, and spreads rows evenly.
        df = df.repartition(par, F.col(_TBL_KEY[name]))
    return df


_TBL_KEY = {
    "part": "p_partkey",
    "documents": "doc_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "embeddings": "vec_id",
}


# ---------------------------------------------------------------------------
# Q1 — pricing summary (A-class aggregates + filters; TPC-H Q1 shape)
# ---------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q2 — top-N per group window (T1/T2 semantics)
# ---------------------------------------------------------------------------


def q02_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(_t(sf_dir, "orders"))
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey", "o_orderkey",
            F.round("o_totalprice", 4).alias("o_totalprice"), "rn",
        )
    )


Q02_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# Q3 — anti join (E5 done-set exclusion)
# ---------------------------------------------------------------------------


def q03_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.read.parquet(_t(sf_dir, "customer"))
    o = spark.read.parquet(_t(sf_dir, "orders"))
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


Q03_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# ---------------------------------------------------------------------------
# Q4 — multi-join + agg over broadcast dims (J4/J8)
# ---------------------------------------------------------------------------


def q04_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    o = spark.read.parquet(_t(sf_dir, "orders"))
    c = spark.read.parquet(_t(sf_dir, "customer"))
    n = spark.read.parquet(_t(sf_dir, "nation"))
    r = spark.read.parquet(_t(sf_dir, "region"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


Q04_SQL = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q5 — channel fusion (A2: max-per-channel + 0.75/0.25 weighting)
# ---------------------------------------------------------------------------


def q05_channel_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(_t(sf_dir, "events"))
    agg = (
        e.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "click", F.col("value"))).alias("click_s"),
            F.max(F.when(F.col("event_type") == "view", F.col("value"))).alias("view_s"),
        )
    )
    return (
        agg.select(
            "user_id",
            F.round(
                config.NAME_WEIGHT * F.coalesce(F.col("click_s"), F.lit(0.0))
                + config.DEF_WEIGHT * F.coalesce(F.col("view_s"), F.lit(0.0)),
                6,
            ).alias("fused_score"),
        )
        .filter(F.col("fused_score") >= config.SIMSCORE_THRESHOLD)
    )


Q05_SQL = f"""
SELECT user_id,
       round({config.NAME_WEIGHT} * coalesce(max(CASE WHEN event_type = 'click' THEN value END), 0)
           + {config.DEF_WEIGHT} * coalesce(max(CASE WHEN event_type = 'view' THEN value END), 0), 6)
       AS fused_score
FROM events WHERE event_type IN ('click', 'view')
GROUP BY user_id
HAVING round({config.NAME_WEIGHT} * coalesce(max(CASE WHEN event_type = 'click' THEN value END), 0)
           + {config.DEF_WEIGHT} * coalesce(max(CASE WHEN event_type = 'view' THEN value END), 0), 6)
       >= {config.SIMSCORE_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# Q6 — token IDF (J2, exact formula ln((N+1)/(df+1)))
# ---------------------------------------------------------------------------


def q06_token_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # count on the BARE scan: zero-column parquet count is metadata-speed,
    # while counting the _docs frame would execute its repartition exchange
    n_docs = spark.read.parquet(_t(sf_dir, "documents")).count()
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokenize(F.col("text")))).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "token",
            "df",
            F.round(F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)), 6).alias("idf"),
        )
        .orderBy("token")
    )


def _q06_sql() -> str:
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({_sql_tokens('text')}) AS token FROM documents
), n AS (SELECT count(*) AS n_docs FROM documents)
SELECT token, count(*) AS df,
       round(ln((n.n_docs + 1)::double / (count(*) + 1)), 6) AS idf
FROM tok, n GROUP BY token, n.n_docs ORDER BY token
"""


# ---------------------------------------------------------------------------
# Q7 — inverted-index candidate join (J1/A1/T1): documents vs part dictionary
# ---------------------------------------------------------------------------


def q07_candidate_link_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # _tbl: the broadcast-side BUILD (tokenize+explode+idf groupBy) was a
    # 1.9s single-task stage on the one-file scan; count stays on the bare
    # scan (metadata-speed)
    part = _tbl(spark, sf_dir, "part")
    n_parts = spark.read.parquet(_t(sf_dir, "part")).count()
    src = docs.select(
        F.col("doc_id").alias("s_id"), tokenize(F.col("text")).alias("tokens")
    )
    tgt = part.select(
        F.col("p_partkey").alias("ent_id"),
        tokenize(F.concat_ws(" ", "p_name", "p_type")).alias("tokens"),
    )
    cands = candidate_pairs(
        src, tgt, top_n=5, broadcast_target=True, target_doc_total=n_parts + 1
    )
    return cands.select(
        F.col("s_id").alias("doc_id"),
        F.col("t_id").alias("p_partkey"),
        F.round("cand_score", 6).alias("cand_score"),
        F.col("rank"),
    )


def _q07_sql() -> str:
    return f"""
WITH src AS (
  SELECT DISTINCT doc_id AS s_id, unnest({_sql_tokens('text')}) AS token
  FROM documents
), tgt AS (
  SELECT DISTINCT p_partkey AS t_id,
         unnest({_sql_tokens("(p_name || ' ' || p_type)")}) AS token
  FROM part
), n AS (SELECT count(*) + 1 AS total FROM part),
idf AS (
  SELECT token, ln(n.total::double / (count(*) + 1)) AS idf
  FROM tgt, n GROUP BY token, n.total
), scored AS (
  SELECT s.s_id, t.t_id, sum(i.idf) AS cand_score
  FROM src s JOIN tgt t USING (token) JOIN idf i USING (token)
  GROUP BY s.s_id, t.t_id
), ranked AS (
  SELECT s_id, t_id, cand_score,
         row_number() OVER (PARTITION BY s_id
                            ORDER BY cand_score DESC, t_id) AS rank
  FROM scored
)
SELECT s_id AS doc_id, t_id AS p_partkey,
       round(cand_score, 6) AS cand_score, rank
FROM ranked WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# Q8 — BOW linking end-to-end (pw_aligner.py:628-660 run_bow_model) on the
# part-name dictionary: 64 distinct names linked against themselves
# ---------------------------------------------------------------------------


def q08_bow_link_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _tbl(spark, sf_dir, "part")
    names = part.select(F.col("p_name")).distinct()
    n_names = names.count()
    toks = names.select(
        F.col("p_name").alias("ent_id"), tokenize(F.col("p_name")).alias("tokens")
    )
    cands = candidate_pairs(
        toks,
        toks,
        top_n=config.KEEP_TOP_N_CANDIDATES,
        broadcast_target=True,
        target_doc_total=n_names + 1,
    )
    mx = cands.agg(F.max("cand_score").alias("m"))
    normed = cands.crossJoin(F.broadcast(mx)).select(
        F.col("s_id").alias("src_name"),
        F.col("t_id").alias("match_name"),
        (F.col("cand_score") / F.col("m")).alias("score"),
    ).filter(F.col("score") >= config.BOW_SIMSCORE_THRESHOLD)
    w = Window.partitionBy("src_name").orderBy(
        F.col("score").desc(), F.col("match_name")
    )
    return (
        normed.withColumn("match_rank", F.row_number().over(w))
        .filter(F.col("match_rank") <= config.KEEP_TOP_N_MATCHES)
        .select("src_name", "match_name", F.round("score", 6).alias("score"), "match_rank")
    )


def _q08_sql() -> str:
    return f"""
WITH names AS (SELECT DISTINCT p_name FROM part),
tok AS (
  SELECT DISTINCT p_name AS ent_id, unnest({_sql_tokens('p_name')}) AS token
  FROM names
), n AS (SELECT count(*) + 1 AS total FROM names),
idf AS (
  SELECT token, ln(n.total::double / (count(*) + 1)) AS idf
  FROM tok, n GROUP BY token, n.total
), scored AS (
  SELECT s.ent_id AS src_name, t.ent_id AS match_name, sum(i.idf) AS raw
  FROM tok s JOIN tok t USING (token) JOIN idf i USING (token)
  GROUP BY 1, 2
), capped AS (
  SELECT src_name, match_name, raw,
         row_number() OVER (PARTITION BY src_name ORDER BY raw DESC, match_name) AS cr
  FROM scored
), topc AS (SELECT * FROM capped WHERE cr <= {config.KEEP_TOP_N_CANDIDATES}),
mx AS (SELECT max(raw) AS m FROM topc),
normed AS (
  SELECT src_name, match_name, raw / mx.m AS score FROM topc, mx
  WHERE raw / mx.m >= {config.BOW_SIMSCORE_THRESHOLD}
), ranked AS (
  SELECT src_name, match_name, score,
         row_number() OVER (PARTITION BY src_name ORDER BY score DESC, match_name) AS match_rank
  FROM normed
)
SELECT src_name, match_name, round(score, 6) AS score, match_rank
FROM ranked WHERE match_rank <= {config.KEEP_TOP_N_MATCHES}
"""


# ---------------------------------------------------------------------------
# Q9 — exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------


def q09_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return exact_dedup(docs).select("doc_id", "content_hash", "dup_count")


Q09_SQL = """
SELECT min(doc_id) AS doc_id, md5(text) AS content_hash,
       count(*) AS dup_count
FROM documents GROUP BY md5(text)
"""


# ---------------------------------------------------------------------------
# Q10 — minhash signatures (long format)
# ---------------------------------------------------------------------------

_MINHASH_SEEDS = 16
_SHINGLE_K = 3


def q10_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-format signatures straight from the minhash_signatures operator
    (one groupBy with N min-aggregates — no seed crossJoin, so the shuffle
    carries each shingle once instead of N times)."""
    docs = _docs(spark, sf_dir)
    sigs = minhash_signatures(
        docs, num_hashes=_MINHASH_SEEDS, shingle_k=_SHINGLE_K
    )
    return (
        sigs.select("doc_id", F.posexplode("sig").alias("seed", "mh"))
        .select("doc_id", F.col("seed").cast("int").alias("seed"), "mh")
        .orderBy("doc_id", "seed")
    )


def _sql_shingles() -> str:
    """Shingle list per doc, matching operators.dedup.shingles (k=3,
    distinct, space-joined)."""
    k = _SHINGLE_K
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM documents
), sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(t) >= {k}
         THEN list_distinct(list_transform(generate_series(1, len(t) - {k - 1}),
                            i -> array_to_string(t[i:i+{k - 1}], ' ')))
         ELSE [array_to_string(t, ' ')] END
  ) AS sh
  FROM toks
)"""


def _q10_sql() -> str:
    return (
        _sql_shingles()
        + f"""
SELECT doc_id, seed::int AS seed, min(md5(seed || ':' || sh)) AS mh
FROM sh, range(0, {_MINHASH_SEEDS}) s(seed)
GROUP BY doc_id, seed ORDER BY doc_id, seed
"""
    )


# ---------------------------------------------------------------------------
# Q11 — near-dup pairs: LSH bucket join + exact shingle-jaccard verify
# ---------------------------------------------------------------------------

_LSH_BANDS = 4
_LSH_ROWS = 4
_NEARDUP_T = 0.5


def q11_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    sigs = minhash_signatures(
        docs, num_hashes=_LSH_BANDS * _LSH_ROWS, shingle_k=_SHINGLE_K
    )
    cands = lsh_candidate_pairs(
        sigs, bands=_LSH_BANDS, rows_per_band=_LSH_ROWS, max_bucket_size=50
    )
    verified = ngram_jaccard_pairs(
        docs, cands, shingle_k=_SHINGLE_K, threshold=_NEARDUP_T
    )
    return verified.select(
        "id_a", "id_b", F.round("jacc", 6).alias("jacc")
    )


def _sql_neardup_ctes() -> str:
    """Shared LSH near-dup CTE chain ending in `verified(id_a, id_b,
    jacc_raw)` — the q11 result before rounding; q135 reuses it as the
    gold match-pair set (the q51/q57/q112 shared-chain discipline)."""
    nh = _LSH_BANDS * _LSH_ROWS
    return _sql_shingles().rstrip() + f""",
mh AS (
  SELECT doc_id, seed, min(md5(seed || ':' || sh)) AS mh
  FROM sh, range(0, {nh}) s(seed) GROUP BY doc_id, seed
), banded AS (
  SELECT doc_id, seed // {_LSH_ROWS} AS band,
         md5(string_agg(mh, '|' ORDER BY seed)) AS bucket
  FROM mh GROUP BY doc_id, seed // {_LSH_ROWS}
), sized AS (
  SELECT band, bucket FROM banded GROUP BY band, bucket
  HAVING count(*) <= 50
), small AS (
  SELECT b.* FROM banded b JOIN sized USING (band, bucket)
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM small a JOIN small b USING (band, bucket)
  WHERE a.doc_id < b.doc_id
), shs AS (
  SELECT doc_id, list(DISTINCT sh) AS shset FROM sh GROUP BY doc_id
), verified AS (
  SELECT p.id_a, p.id_b,
         len(list_intersect(x.shset, y.shset))::double
           / len(list_distinct(list_concat(x.shset, y.shset))) AS jacc_raw
  FROM pairs p JOIN shs x ON p.id_a = x.doc_id JOIN shs y ON p.id_b = y.doc_id
  WHERE len(list_intersect(x.shset, y.shset))::double
        / len(list_distinct(list_concat(x.shset, y.shset))) >= {_NEARDUP_T}
)"""


def _q11_sql() -> str:
    return _sql_neardup_ctes() + """
SELECT id_a, id_b, round(jacc_raw, 6) AS jacc FROM verified
"""


# ---------------------------------------------------------------------------
# Q12 — brute-force cosine top-k (similarity search baseline)
# ---------------------------------------------------------------------------


def q12_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _tbl(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), "embedding")
    out = brute_force_topk(queries, corpus, k=5)
    return out.select("q_id", "c_id", _rz(F.col("cos"), 6).alias("cos"), "nn_rank")


Q12_SQL = """
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT q_id, c_id,
         list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i]::double * cv[i]::double))
         / (sqrt(list_sum(list_transform(qv, x -> x::double * x::double)))
            * sqrt(list_sum(list_transform(cv, x -> x::double * x::double)))) AS cos
  FROM q, c
), ranked AS (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS nn_rank
  FROM scored
)
SELECT q_id, c_id, (round(cos, 6) + 0.0) AS cos, nn_rank FROM ranked WHERE nn_rank <= 5
"""


# ---------------------------------------------------------------------------
# Q13 — embedding centroids per label (array aggregation)
# ---------------------------------------------------------------------------


def q13_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _tbl(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(
            _rz(F.avg("val"), 6).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        .orderBy("label", "dim")
    )


Q13_SQL = """
SELECT label, (i - 1)::int AS dim, (round(avg(v), 6) + 0.0) AS centroid_val,
       count(*) AS n_vecs
FROM (
  SELECT label, unnest(embedding) AS v,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
)
GROUP BY label, i ORDER BY label, dim
"""


# ---------------------------------------------------------------------------
# Q14 — text quality features
# ---------------------------------------------------------------------------


def q14_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    out = with_quality_features(docs)
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("distinct_ratio", 6).alias("distinct_ratio"),
        F.round("mean_token_len", 6).alias("mean_token_len"),
    )


def _q14_sql() -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id, len(toks)::bigint AS n_tokens,
       round(CASE WHEN len(toks) > 0 THEN
         len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))::double / len(toks)
         ELSE 0 END, 6) AS stopword_ratio,
       round(CASE WHEN len(toks) > 0 THEN
         len(list_distinct(toks))::double / len(toks) ELSE 0 END, 6) AS distinct_ratio,
       round(CASE WHEN len(toks) > 0 THEN
         len(array_to_string(toks, ''))::double / len(toks) ELSE 0 END, 6) AS mean_token_len
FROM t
"""


# ---------------------------------------------------------------------------
# Q15 — language-ID heuristic + confusion counts
# ---------------------------------------------------------------------------


def q15_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        with_lang_id(docs)
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "lang_pred")
    )


def _q15_sql() -> str:
    from pathhier_spark.operators.textstats import LANG_MARKERS

    score_exprs = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        lit = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
        score_exprs.append(
            f"len(list_intersect(toks, {lit}))::double / {len(markers)} AS score_{lang}"
        )
    # argmax with lexicographic tie-break, mirroring textstats.with_lang_id
    langs = sorted(LANG_MARKERS)
    pred = f"'{langs[0]}'"
    best = f"score_{langs[0]}"
    for lang in langs[1:]:
        pred = f"CASE WHEN score_{lang} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"greatest(score_{lang}, {best})"
    return f"""
WITH t AS (
  SELECT doc_id, lang,
         list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '')) AS toks
  FROM documents
), scored AS (
  SELECT doc_id, lang, {', '.join(score_exprs)} FROM t
), pred AS (
  SELECT lang, {pred} AS lang_pred FROM scored
)
SELECT lang, lang_pred, count(*) AS n FROM pred
GROUP BY lang, lang_pred ORDER BY lang, lang_pred
"""


# ---------------------------------------------------------------------------
# Q16 — sessionization (gap > 30 min) over events
# ---------------------------------------------------------------------------


def q16_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(_t(sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = e.withColumn(
        "new_session",
        F.when(
            F.unix_timestamp(F.col("ts").cast("timestamp"))
            - F.lag(F.unix_timestamp(F.col("ts").cast("timestamp")), 1).over(w)
            > 1800,
            1,
        ).otherwise(0),
    )
    sess = gapped.withColumn(
        "session_no",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        sess.groupBy("user_id")
        .agg(
            (F.max("session_no") + 1).alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


Q16_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM g
)
SELECT user_id, (max(session_no) + 1)::bigint AS n_sessions, count(*) AS n_events
FROM s GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Q17 — token-window triple extraction (the extract stage on driver docs)
# ---------------------------------------------------------------------------


def q17_extract_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return extract_token_triples(docs, TRIGGERS).select(
        "doc_id", "pos", "subj", "pred", "obj"
    )


def _q17_sql() -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in sorted(TRIGGERS.items())
    )
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM documents
)
SELECT doc_id, (i - 1)::int AS pos, t[i-1] AS subj,
       CASE t[i] {cases} END AS pred, t[i+1] AS obj
FROM (
  SELECT doc_id, t, unnest(generate_series(2, len(t) - 1)) AS i FROM toks
)
WHERE t[i] IN {trig_list}
"""


# ---------------------------------------------------------------------------
# Q18 — connected components over a derived customer graph (G1-G3)
# ---------------------------------------------------------------------------


def q18_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.canonicalize import connected_components

    c = spark.read.parquet(_t(sf_dir, "customer"))
    # zero-pad keys so string min == numeric min inside the CC kernel
    # 20-char pad: F.lpad TRUNCATES inputs longer than the pad width, which
    # would silently merge distinct ids; bigints are at most 19 digits
    pad = lambda col: F.lpad(col.cast("string"), 20, "0")  # noqa: E731
    a = c.select(
        F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("n")
    )
    b = c.select(
        (F.col("c_custkey") - 1).alias("k"), F.col("c_nationkey").alias("n2"),
        F.col("c_custkey").alias("k2"),
    )
    edges = a.join(b, ["k"]).filter(F.col("n") == F.col("n2")).select(
        pad(F.col("k")).alias("xref_a"), pad(F.col("k2")).alias("xref_b")
    )
    nodes_all = c.select(pad(F.col("c_custkey")).alias("xref_a")).select(
        "xref_a", F.col("xref_a").alias("xref_b")
    )
    comp = connected_components(edges.union(nodes_all))
    return comp.select(
        F.col("node").cast("bigint").alias("c_custkey"),
        F.col("component").cast("bigint").alias("component"),
    ).orderBy("c_custkey")


Q18_SQL = """
WITH RECURSIVE e AS (
  SELECT a.c_custkey AS u, b.c_custkey AS v
  FROM customer a JOIN customer b
    ON b.c_custkey = a.c_custkey + 1 AND a.c_nationkey = b.c_nationkey
), sym AS (
  SELECT u, v FROM e UNION SELECT v, u FROM e
), reach(n, m) AS (
    SELECT c_custkey, c_custkey FROM customer
    UNION
    SELECT r.n, s.v FROM reach r JOIN sym s ON r.m = s.u
)
SELECT n::bigint AS c_custkey, min(m)::bigint AS component
FROM reach GROUP BY n ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Q19 — grouped collect (A7 gene-set style): suppliers per nation
# ---------------------------------------------------------------------------


def q19_grouped_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = spark.read.parquet(_t(sf_dir, "supplier"))
    n = spark.read.parquet(_t(sf_dir, "nation"))
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("s_name"))).alias("members"),
            F.countDistinct("s_name").alias("n_members"),
        )
        .orderBy("n_name")
    )


Q19_SQL = """
SELECT n_name, string_agg(DISTINCT s_name, ',' ORDER BY s_name) AS members,
       count(DISTINCT s_name) AS n_members
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Q20 — pivot (A2's pivot shape) + set ops
# ---------------------------------------------------------------------------


def q20_pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 4))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
        .orderBy("l_returnflag")
    )


Q20_SQL = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS qty_open,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS qty_filled
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q21 — token counts (whitespace + BPE-ish estimate)
# ---------------------------------------------------------------------------


def q21_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return with_token_counts(docs).select("doc_id", "ws_tokens", "bpe_tokens_est")


Q21_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id, len(toks)::bigint AS ws_tokens,
       coalesce(list_sum(list_transform(toks, x -> ceil(len(x) / 4.0)::bigint)), 0)::bigint
         AS bpe_tokens_est
FROM t
"""


# ---------------------------------------------------------------------------
# Q22 — simhash (md5-derived 32-bit token hashes; DuckDB recomputes them)
# ---------------------------------------------------------------------------

# DuckDB equivalent of Spark's conv(substring(md5(x),1,8),16,10): read the
# first 8 hex chars of md5 as a big-endian 32-bit integer
def _sql_hex32(expr: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, 8), j -> "
        f"(strpos('0123456789abcdef', substr(md5({expr}), j, 1)) - 1)::bigint"
        f" * (1::bigint << (4 * (8 - j)))))::bigint"
    )


def q22_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.dedup import simhash

    return simhash(_docs(spark, sf_dir)).orderBy("doc_id")


def _q22_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents
), counted AS (
  SELECT doc_id, tok, count(*) AS w FROM toks GROUP BY doc_id, tok
), hashed AS (
  SELECT doc_id, w, {_sql_hex32('tok')} AS th FROM counted
), votes AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (th >> bit::int) & 1 = 1 THEN w ELSE -w END) AS v
  FROM hashed, range(0, 32) b(bit) GROUP BY doc_id, bit
)
SELECT doc_id,
       sum(CASE WHEN v > 0 THEN (1::bigint << bit::int) ELSE 0 END)::bigint AS simhash
FROM votes GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q23 — winnowing fingerprint (md5 window-grams, sorted distinct top-16)
# ---------------------------------------------------------------------------

_FP_WINDOW = 8


def q23_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import with_fingerprint

    return with_fingerprint(_docs(spark, sf_dir), window=_FP_WINDOW).select(
        "doc_id", F.concat_ws(",", F.col("fingerprint")).alias("fingerprint")
    )


def _q23_sql() -> str:
    w = _FP_WINDOW
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
), grams AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {w}
              THEN list_transform(generate_series(1, len(toks) - {w - 1}),
                                  i -> md5(array_to_string(toks[i:i+{w - 1}], ' ')))
              ELSE [md5(array_to_string(toks, ' '))] END AS g
  FROM t
)
SELECT doc_id,
       array_to_string(list_sort(list_distinct(list_sort(g)[1:16])), ',') AS fingerprint
FROM grams
"""


# ---------------------------------------------------------------------------
# Q24 — LSH-bucketed ANN. Approximate vs brute force (recall >= 0.9 asserted
# in tests/test_entry_oracle.py), but DETERMINISTIC: the SRP planes are
# md5-derived integers and the bucket dot products are all-integer
# (similarity.md5_hyperplanes / _quantized), so the full banding + bucket
# join + exact-cosine re-rank is reproducible in DuckDB SQL below.
# ---------------------------------------------------------------------------

_ANN_BANDS = 24
_ANN_PLANES = 4
_EMB_DIM = 64  # driver embeddings table dimension (same constant as q30's SQL)


def q24_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.similarity import lsh_bucket_topk

    emb = _tbl(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), "embedding")
    return lsh_bucket_topk(
        queries_df, corpus, k=5, n_planes=_ANN_PLANES, n_bands=_ANN_BANDS
    ).select("q_id", "c_id", _rz(F.col("cos"), 6).alias("cos"), "nn_rank")


def _q24_sql() -> str:
    d = _EMB_DIM
    plane_key = "'plane:' || b.b::varchar || ':' || p.p::varchar || ':' || i.i::varchar"
    quant = "list_transform(embedding, x -> floor(x::double * 1000000)::bigint)"
    bucket = (
        "sum(CASE WHEN list_sum(list_transform(generate_series(1, {d}),"
        " i -> {v}[i] * cs[i])) >= 0 THEN (1::bigint << plane) ELSE 0 END)"
    )
    return f"""
WITH coef AS (
  SELECT b.b AS band, p.p AS plane, i.i AS i,
         ({_sql_hex32(plane_key)} % 2001) - 1000 AS c
  FROM range(0, {_ANN_BANDS}) b(b), range(0, {_ANN_PLANES}) p(p), range(0, {d}) i(i)
), planes AS (
  SELECT band, plane, list(c ORDER BY i) AS cs FROM coef GROUP BY band, plane
), q AS (
  SELECT vec_id AS q_id, embedding AS qe, {quant} AS qv
  FROM embeddings WHERE vec_id < 20
), c AS (
  SELECT vec_id AS c_id, embedding AS ce, {quant} AS cv FROM embeddings
), qb AS (
  SELECT q_id, band, {bucket.format(d=d, v='qv')} AS bucket
  FROM q, planes GROUP BY q_id, band
), cb AS (
  SELECT c_id, band, {bucket.format(d=d, v='cv')} AS bucket
  FROM c, planes GROUP BY c_id, band
), cands AS (
  SELECT DISTINCT q_id, c_id FROM qb JOIN cb USING (band, bucket)
), scored AS (
  SELECT cands.q_id, cands.c_id,
         list_sum(list_transform(generate_series(1, {d}),
                                 i -> qe[i]::double * ce[i]::double))
         / (sqrt(list_sum(list_transform(qe, x -> x::double * x::double)))
            * sqrt(list_sum(list_transform(ce, x -> x::double * x::double)))) AS cos
  FROM cands JOIN q ON cands.q_id = q.q_id JOIN c ON cands.c_id = c.c_id
), ranked AS (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS nn_rank
  FROM scored
)
SELECT q_id, c_id, (round(cos, 6) + 0.0) AS cos, nn_rank
FROM ranked WHERE nn_rank <= 5
"""


# ---------------------------------------------------------------------------
# Q25 — multimodal mapInPandas plumbing over a documents-derived media table
# (payload = UTF-8 text bytes, so the md5 checksum is SQL-verifiable)
# ---------------------------------------------------------------------------


def q25_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.multimodal import (
        extract_media_features,
        media_from_documents,
    )

    media = media_from_documents(_docs(spark, sf_dir))
    feats = extract_media_features(media)
    return feats.select(
        "media_id",
        "kind",
        "checksum",
        "width",
        "height",
        _rz(F.element_at("mean_rgb", 1), 6).alias("mean_r"),
        _rz(F.element_at("mean_rgb", 2), 6).alias("mean_g"),
        _rz(F.element_at("mean_rgb", 3), 6).alias("mean_b"),
    )


# image rows carry a real binary-PPM payload (P6 header + the text's bytes
# as npix = len//3 full RGB pixels in one row); the oracle reconstructs the
# exact payload string (corpus is pure ASCII: string md5 == byte md5) and
# recomputes the per-channel means the REAL decoder produced
Q25_SQL = """
WITH t AS (
  SELECT doc_id::bigint AS media_id,
         CASE (doc_id % 3) WHEN 0 THEN 'image'
                           WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         text,
         (len(text) // 3)::int AS npix
  FROM documents
), chan AS (
  SELECT media_id, kind, text, npix,
         CASE WHEN kind = 'image'
              THEN 'P6' || chr(10) || npix::varchar || ' 1' || chr(10)
                   || '255' || chr(10) || substr(text, 1, npix * 3)
              ELSE text END AS payload,
         list_transform(generate_series(1, npix),
                        p -> ord(substr(text, (p - 1) * 3 + 1, 1))) AS r,
         list_transform(generate_series(1, npix),
                        p -> ord(substr(text, (p - 1) * 3 + 2, 1))) AS g,
         list_transform(generate_series(1, npix),
                        p -> ord(substr(text, (p - 1) * 3 + 3, 1))) AS b
  FROM t
)
SELECT media_id, kind, md5(payload) AS checksum,
       CASE WHEN kind = 'image' THEN npix END AS width,
       CASE WHEN kind = 'image' THEN 1 END AS height,
       CASE WHEN kind = 'image' AND npix > 0
            THEN round(list_sum(r)::double / npix, 6) + 0.0 END AS mean_r,
       CASE WHEN kind = 'image' AND npix > 0
            THEN round(list_sum(g)::double / npix, 6) + 0.0 END AS mean_g,
       CASE WHEN kind = 'image' AND npix > 0
            THEN round(list_sum(b)::double / npix, 6) + 0.0 END AS mean_b
FROM chan
"""


# ---------------------------------------------------------------------------
# Q26 — rollup aggregate (hierarchical totals)
# ---------------------------------------------------------------------------


def q26_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


Q26_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# Q27 — LR-channel linking (the pw_aligner.py:213-250 _apply_lr_to_kb chain):
# candidates -> exact 5-feature vector (feature_generator.py:25-50) ->
# broadcast-coefficient logistic scoring -> SIMSCORE threshold -> rank.
# Coefficients are fixed literals so the oracle is deterministic.
# ---------------------------------------------------------------------------

_LR_COEF = [0.5, 3.0, 1.0, 1.0, 1.0]  # len_diff, tok_jac, 3/4/5-gram jac
_LR_INTERCEPT = -2.0


def q27_lr_link_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.linking import lr_score, pair_features

    part = _tbl(spark, sf_dir, "part")
    names = part.select(F.col("p_name")).distinct()
    n_names = names.count()
    toks = names.select(
        F.col("p_name").alias("ent_id"), tokenize(F.col("p_name")).alias("tokens")
    )
    cands = candidate_pairs(
        toks, toks, top_n=config.KEEP_TOP_N_CANDIDATES,
        broadcast_target=True, target_doc_total=n_names + 1,
    ).select(
        F.col("s_id").alias("src_name"), F.col("t_id").alias("match_name")
    )
    feats = pair_features(cands, "src_name", "match_name", pad="_")
    scored = lr_score(feats, _LR_COEF, _LR_INTERCEPT)
    w = Window.partitionBy("src_name").orderBy(
        F.col("p1").desc(), F.col("match_name")
    )
    return (
        scored.filter(F.col("p1") > config.SIMSCORE_THRESHOLD)
        .withColumn("lr_rank", F.row_number().over(w))
        .filter(F.col("lr_rank") <= config.KEEP_TOP_N_MATCHES)
        .select(
            "src_name", "match_name",
            F.round("p1", 6).alias("p1"),
            F.round("token_jaccard", 6).alias("token_jaccard"),
            F.round("ngram3_jaccard", 6).alias("ngram3_jaccard"),
            "lr_rank",
        )
    )


def _sql_char_ngrams(col: str, n: int) -> str:
    """Char n-grams of the normalized string with '_' padding ('_' cannot
    survive normalize_string, so jaccard is unchanged vs NUL padding)."""
    norm = _sql_norm(col)
    pad = "'" + "_" * (n - 1) + "'"
    padded = f"({pad} || {norm} || {pad})"
    return (
        f"list_transform(generate_series(1, len({norm}) + {n - 1}),"
        f" i -> substr({padded}, i, {n}))"
    )


def _sql_jaccard(a: str, b: str) -> str:
    return (
        f"(case when len(list_distinct(list_concat({a}, {b}))) > 0 then "
        f"len(list_intersect(list_distinct({a}), list_distinct({b})))::double"
        f" / len(list_distinct(list_concat({a}, {b}))) else 0 end)"
    )


def _q27_sql() -> str:
    z = f"{_LR_INTERCEPT}"
    feats = {
        "len_diff_perc": (
            "(case when len(s_toks) > 0 then "
            "abs(len(s_toks) - len(m_toks))::double / len(s_toks) else 0 end)"
        ),
        "token_jaccard": _sql_jaccard("s_toks", "m_toks"),
        "ngram3_jaccard": _sql_jaccard(
            _sql_char_ngrams("src_name", 3), _sql_char_ngrams("match_name", 3)
        ),
        "ngram4_jaccard": _sql_jaccard(
            _sql_char_ngrams("src_name", 4), _sql_char_ngrams("match_name", 4)
        ),
        "ngram5_jaccard": _sql_jaccard(
            _sql_char_ngrams("src_name", 5), _sql_char_ngrams("match_name", 5)
        ),
    }
    for c, name in zip(_LR_COEF, feats):
        z += f" + {c} * {name}"
    return f"""
WITH names AS (SELECT DISTINCT p_name FROM part),
tok AS (
  SELECT DISTINCT p_name AS ent_id, unnest({_sql_tokens('p_name')}) AS token
  FROM names
), n AS (SELECT count(*) + 1 AS total FROM names),
idf AS (
  SELECT token, ln(n.total::double / (count(*) + 1)) AS idf
  FROM tok, n GROUP BY token, n.total
), scored0 AS (
  SELECT s.ent_id AS src_name, t.ent_id AS match_name, sum(i.idf) AS raw
  FROM tok s JOIN tok t USING (token) JOIN idf i USING (token)
  GROUP BY 1, 2
), capped AS (
  SELECT src_name, match_name,
         row_number() OVER (PARTITION BY src_name ORDER BY raw DESC, match_name) AS cr
  FROM scored0
), cands AS (SELECT src_name, match_name FROM capped WHERE cr <= {config.KEEP_TOP_N_CANDIDATES}),
featured AS (
  SELECT src_name, match_name,
         {_sql_tokens('src_name')} AS s_toks,
         {_sql_tokens('match_name')} AS m_toks
  FROM cands
), f2 AS (
  SELECT src_name, match_name,
         {feats['len_diff_perc']} AS len_diff_perc,
         {feats['token_jaccard']} AS token_jaccard,
         {feats['ngram3_jaccard']} AS ngram3_jaccard,
         {feats['ngram4_jaccard']} AS ngram4_jaccard,
         {feats['ngram5_jaccard']} AS ngram5_jaccard
  FROM featured
), lr AS (
  SELECT src_name, match_name, token_jaccard, ngram3_jaccard,
         1.0 / (1.0 + exp(-({_LR_INTERCEPT} + {_LR_COEF[0]} * len_diff_perc
               + {_LR_COEF[1]} * token_jaccard + {_LR_COEF[2]} * ngram3_jaccard
               + {_LR_COEF[3]} * ngram4_jaccard + {_LR_COEF[4]} * ngram5_jaccard))) AS p1
  FROM f2
), ranked AS (
  SELECT src_name, match_name, p1, token_jaccard, ngram3_jaccard,
         row_number() OVER (PARTITION BY src_name ORDER BY p1 DESC, match_name) AS lr_rank
  FROM lr WHERE p1 > {config.SIMSCORE_THRESHOLD}
)
SELECT src_name, match_name, round(p1, 6) AS p1,
       round(token_jaccard, 6) AS token_jaccard,
       round(ngram3_jaccard, 6) AS ngram3_jaccard, lr_rank
FROM ranked WHERE lr_rank <= {config.KEEP_TOP_N_MATCHES}
"""


# ---------------------------------------------------------------------------
# Q28 — J6 rule-tier scoring (pathway_aligner.py:387-453) over entity pairs
# synthesized from part: pair groups by size bucket, sides by key parity,
# xrefs/names/parents/types derived deterministically from part columns so
# every tier (1.0 / 0.75 / 0.5 / 0.25 / type-restricted 0) is exercised.
# ---------------------------------------------------------------------------


def _part_rule_entities(spark: SparkSession, sf_dir: str):
    """Shared q28/q33 synthetic rule-tier entity construction: pair groups
    by size bucket, sides by key parity, xrefs/names/parents/types derived
    deterministically from part columns. Returns (left, right) sided
    DataFrames carrying the prelim_alignments columns plus (p_name,
    parent_str) for embedding-based consumers."""
    part = spark.read.parquet(_t(sf_dir, "part")).filter(F.col("p_partkey") % 7 < 2)
    first_type = F.split(F.col("p_type"), " ").getItem(0)
    base = part.select(
        F.concat(F.lit("g"), (F.col("p_size") % 5).cast("string")).alias("pair_id"),
        F.col("p_partkey"),
        F.col("p_name"),
        F.when(F.col("p_size") % 11 == 0, F.lit("Group"))
        .otherwise(first_type)
        .alias("obj_type"),
        F.array(F.col("p_brand")).alias("eq_xrefs"),
        tokenize(F.col("p_name")).alias("eq_names"),
        F.concat(F.lit("sz"), (F.col("p_size") % 10).cast("string")).alias(
            "parent_str"
        ),
        (F.col("p_partkey") % 2).alias("side"),
    ).withColumn("parent_xrefs", F.array(F.col("parent_str")))
    w = Window.partitionBy("pair_id", "side").orderBy("p_partkey")
    sided = base.withColumn("idx", F.row_number().over(w) - 1)
    return sided.filter(F.col("side") == 0), sided.filter(F.col("side") == 1)


# shared SQL fragments for the same construction (q28/q33 oracles)
_SQL_BASE_SIDED = """base AS (
  SELECT 'g' || (p_size % 5)::varchar AS pair_id,
         p_partkey, p_name,
         CASE WHEN p_size % 11 = 0 THEN 'Group'
              ELSE split_part(p_type, ' ', 1) END AS obj_type,
         [p_brand] AS eq_xrefs,
         {eq_names} AS eq_names,
         'sz' || (p_size % 10)::varchar AS parent_str,
         p_partkey % 2 AS side
  FROM part WHERE p_partkey % 7 < 2
), sided AS (
  SELECT *,
         row_number() OVER (PARTITION BY pair_id, side ORDER BY p_partkey) - 1 AS idx
  FROM base
)"""

# the J6 tier cascade over sided aliases l/r (parent_str equality ==
# single-element parent_xrefs overlap)
_SQL_RULE_CASE = """CASE WHEN (l.obj_type = 'Group') <> (r.obj_type = 'Group') THEN 0.0
              WHEN len(list_intersect(l.eq_xrefs, r.eq_xrefs)) > 0
                   AND l.obj_type = r.obj_type THEN 1.0
              WHEN len(list_intersect(l.eq_names, r.eq_names)) > 0
                   AND l.obj_type = r.obj_type THEN 0.75
              WHEN len(list_intersect(l.eq_names, r.eq_names)) > 0 THEN 0.5
              WHEN l.parent_str = r.parent_str
                   AND l.obj_type = r.obj_type THEN 0.25
              ELSE 0.0 END"""


def _sql_base_sided() -> str:
    return _SQL_BASE_SIDED.format(eq_names=_sql_tokens("p_name"))


def q28_rule_tier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.align import prelim_alignments

    left, right = _part_rule_entities(spark, sf_dir)
    out = prelim_alignments(left, right)
    return out.filter(F.col("rule_score") > 0).select(
        "pair_id", "i", "j", _rz(F.col("rule_score"), 6).alias("rule_score")
    )


def _q28_sql() -> str:
    return f"""
WITH {_sql_base_sided()}, scored AS (
  SELECT l.pair_id, l.idx AS i, r.idx AS j,
         {_SQL_RULE_CASE} AS rule_score
  FROM sided l JOIN sided r ON l.pair_id = r.pair_id AND l.side = 0 AND r.side = 1
)
SELECT pair_id, i::int AS i, j::int AS j,
       (round(rule_score, 6) + 0.0)::double AS rule_score
FROM scored WHERE rule_score > 0
"""


# ---------------------------------------------------------------------------
# Q29 — J9 pathway-pair set-similarity join (cluster_model.py:370-425) + A3
# pair-score aggregate (pathway_aligner.py:769-772): suppliers as pathways
# (entity set = distinct parts supplied), KBs from nationkey buckets;
# align_score aggregates matched pairs per KB pair.
# ---------------------------------------------------------------------------

_Q29_THRESHOLD = 0.2  # fused-score match floor (sf0.01 median ~0.20)
_Q29_MAX_SUPPKEY = 200  # J9's contract input is cluster-corpus-sized
# (pathway pairs, not document pairs — genesets.py docstring); bound the
# synthetic pathway set so the all-pairs join stays O(bounded^2) at any sf


def q29_pathway_pair_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.align import aggregate_pair_scores
    from pathhier_spark.operators.genesets import score_pathway_pairs

    s = spark.read.parquet(_t(sf_dir, "supplier")).filter(
        F.col("s_suppkey") <= _Q29_MAX_SUPPKEY
    )
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    ents = li.groupBy("l_suppkey").agg(F.collect_set("l_partkey").alias("entities"))
    members = s.join(ents, s["s_suppkey"] == ents["l_suppkey"], "left").select(
        F.col("s_suppkey").cast("string").alias("pathway_id"),
        F.concat(F.lit("kb"), (F.col("s_nationkey") % 3).cast("string")).alias("kb"),
        F.coalesce(F.col("entities"), F.array().cast("array<bigint>")).alias(
            "entities"
        ),
    )
    scored = score_pathway_pairs(members)
    matches = scored.filter(F.col("fused") >= _Q29_THRESHOLD).select(
        F.concat_ws(
            "|", F.least("kb_a", "kb_b"), F.greatest("kb_a", "kb_b")
        ).alias("pair_id"),
        "id_a", "id_b", "sim", "overlap", "fused",
    )
    kb_sizes = members.groupBy("kb").agg(F.count(F.lit(1)).alias("n"))
    sizes = (
        kb_sizes.select(F.col("kb").alias("kb1"), F.col("n").alias("n1"))
        .crossJoin(kb_sizes.select(F.col("kb").alias("kb2"), F.col("n").alias("n2")))
        .filter(F.col("kb1") < F.col("kb2"))
        .select(F.concat_ws("|", "kb1", "kb2").alias("pair_id"), "n1", "n2")
    )
    agg = aggregate_pair_scores(
        matches.select("pair_id", F.col("fused").alias("match_score")), sizes
    )
    return matches.join(agg, "pair_id").select(
        "pair_id", "id_a", "id_b",
        F.round("sim", 6).alias("sim"),
        F.round("overlap", 6).alias("overlap"),
        F.round("fused", 6).alias("fused"),
        F.round("align_score", 6).alias("align_score"),
        "n_matches",
    )


def _q29_sql() -> str:
    return f"""
WITH e AS (
  SELECT l_suppkey, list(DISTINCT l_partkey) AS ents FROM lineitem GROUP BY l_suppkey
), m AS (
  SELECT s_suppkey::varchar AS pid, 'kb' || (s_nationkey % 3)::varchar AS kb,
         coalesce(ents, []) AS ents
  FROM supplier LEFT JOIN e ON l_suppkey = s_suppkey
  WHERE s_suppkey <= {_Q29_MAX_SUPPKEY}
), p AS (
  SELECT least(a.kb, b.kb) || '|' || greatest(a.kb, b.kb) AS pair_id,
         a.pid AS id_a, b.pid AS id_b,
         CASE WHEN len(list_distinct(list_concat(a.ents, b.ents))) > 0 THEN
           len(list_intersect(a.ents, b.ents))::double
             / len(list_distinct(list_concat(a.ents, b.ents)))
         ELSE 0 END AS sim,
         CASE WHEN len(a.ents) > 0 AND len(b.ents) > 0 THEN
           2.0 * len(list_intersect(a.ents, b.ents))
             / (len(list_distinct(a.ents)) + len(list_distinct(b.ents)))
         ELSE 0 END AS overlap
  FROM m a JOIN m b ON a.pid < b.pid AND a.kb <> b.kb
), matches AS (
  SELECT pair_id, id_a, id_b, sim, overlap, (sim + overlap) / 2.0 AS fused
  FROM p WHERE (sim + overlap) / 2.0 >= {_Q29_THRESHOLD}
), kb_sizes AS (SELECT kb, count(*) AS n FROM m GROUP BY kb),
sizes AS (
  SELECT a.kb || '|' || b.kb AS pair_id, a.n AS n1, b.n AS n2
  FROM kb_sizes a JOIN kb_sizes b ON a.kb < b.kb
), agg AS (
  SELECT pair_id, avg(fused) * count(*) AS num, count(*) AS n_matches
  FROM matches GROUP BY pair_id
)
SELECT mt.pair_id, mt.id_a, mt.id_b,
       round(mt.sim, 6) AS sim, round(mt.overlap, 6) AS overlap,
       round(mt.fused, 6) AS fused,
       round(a.num / (0.5 * (s.n1 + s.n2)), 6) AS align_score,
       a.n_matches
FROM matches mt JOIN agg a USING (pair_id) JOIN sizes s USING (pair_id)
"""


# ---------------------------------------------------------------------------
# Q30 — M5 BOW embedding averaging (pathway_aligner.py:299-340): part-name
# entities averaged over a token->vector table hashed into the embeddings
# corpus (half the vocabulary misses -> exercises the seeded-OOV path).
# ---------------------------------------------------------------------------


def _hashed_token_vectors(spark: SparkSession, sf_dir: str):
    """Shared q30/q33 construction: part-name entity token sets + a
    token->vector table hashed into the embeddings corpus (vid =
    hex32(md5(token)) % 2*n_vecs; ~half the vocabulary misses and falls to
    the md5-seeded OOV path inside entity_bow_embeddings). Returns
    (ent_tokens, token_vectors, dim)."""
    emb = _tbl(spark, sf_dir, "embeddings")
    # bare-scan count/first: metadata-speed, skips _tbl's repartition
    bare = spark.read.parquet(_t(sf_dir, "embeddings"))
    n_vecs = bare.count()
    dim = len(bare.select("embedding").first()[0])
    names = spark.read.parquet(_t(sf_dir, "part")).select("p_name").distinct()
    ent_tokens = names.select(
        F.col("p_name").alias("ent_id"), tokenize(F.col("p_name")).alias("tokens")
    )
    vocab = ent_tokens.select(F.explode("tokens").alias("token")).distinct()
    vid = F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long") % (
        2 * n_vecs
    )
    token_vectors = (
        vocab.withColumn("vid", vid)
        .join(emb, F.col("vid") == F.col("vec_id"))
        .select("token", F.col("embedding").cast("array<double>").alias("vector"))
    )
    return ent_tokens, token_vectors, dim


def q30_bow_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.embeddings import entity_bow_embeddings

    ent_tokens, token_vectors, dim = _hashed_token_vectors(spark, sf_dir)
    out = entity_bow_embeddings(ent_tokens, token_vectors, dim=dim)
    # round to 4: the mean's float summation order differs between engines,
    # so the 6th decimal can land on a rounding boundary (~1 ulp apart)
    return out.select(
        "ent_id", F.posexplode("embedding").alias("dim", "val")
    ).select("ent_id", "dim", _rz(F.col("val"), 4).alias("val"))


def _sql_bow_dims_ctes() -> str:
    """Shared q30/q33 CTE chain: hashed token->embedding vectors with the
    md5-seeded OOV path, expanded to one (ent_id, dim, val) row per part-name
    entity per dimension. Spark counterpart: _hashed_token_vectors +
    entity_bow_embeddings."""
    # Spark's oov_vector component i = hex32(md5(token || ':<i>')) scaled
    oov_arg = "token || ':' || i.i::varchar"
    oov = f"({_sql_hex32(oov_arg)} % 2000000) / 1000000.0 - 1.0"
    return f"""n AS (SELECT count(*) AS n_vecs FROM embeddings),
names AS (SELECT DISTINCT p_name FROM part),
ent_tok AS (
  SELECT p_name AS ent_id, unnest({_sql_tokens('p_name')}) AS token FROM names
), tv AS (
  SELECT t.token, e.embedding
  FROM (SELECT DISTINCT token FROM ent_tok) t
  CROSS JOIN n
  JOIN embeddings e ON e.vec_id = ({_sql_hex32('t.token')} % (2 * n.n_vecs))
), vecs AS (
  SELECT et.ent_id, et.token, tv.embedding
  FROM ent_tok et LEFT JOIN tv ON et.token = tv.token
), dims AS (
  SELECT ent_id, i.i AS dim,
         CASE WHEN embedding IS NULL THEN {oov}
              ELSE embedding[(i.i + 1)::int]::double END AS val
  FROM vecs, range(0, 64) i(i)
)"""


def _q30_sql() -> str:
    return f"""
WITH {_sql_bow_dims_ctes()}
SELECT ent_id, dim::int AS dim, (round(avg(val), 4) + 0.0) AS val
FROM dims GROUP BY ent_id, dim
"""


# ---------------------------------------------------------------------------
# Q31 — near-dup doc clustering: the full dedup composition (minhash -> LSH
# bucket pairs -> exact-jaccard verify -> connected components -> canonical
# doc = component minimum). The canonical-selection step is what a training
# pipeline actually keeps; oracle = q11's pair SQL + a recursive-CTE CC.
# ---------------------------------------------------------------------------


def q31_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.canonicalize import connected_components

    docs = _docs(spark, sf_dir)
    sigs = minhash_signatures(
        docs, num_hashes=_LSH_BANDS * _LSH_ROWS, shingle_k=_SHINGLE_K
    )
    cands = lsh_candidate_pairs(
        sigs, bands=_LSH_BANDS, rows_per_band=_LSH_ROWS, max_bucket_size=50
    )
    verified = ngram_jaccard_pairs(
        docs, cands, shingle_k=_SHINGLE_K, threshold=_NEARDUP_T
    )
    # 20-char pad — see q18: lpad truncates beyond the width; 19-digit safe
    pad = lambda c: F.lpad(c.cast("string"), 20, "0")  # noqa: E731
    edges = verified.select(
        pad(F.col("id_a")).alias("xref_a"), pad(F.col("id_b")).alias("xref_b")
    )
    nodes = docs.select(pad(F.col("doc_id")).alias("xref_a")).select(
        "xref_a", F.col("xref_a").alias("xref_b")
    )
    comp = connected_components(edges.union(nodes))
    return comp.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("cluster"),
    ).withColumn("is_canonical", F.col("doc_id") == F.col("cluster")).orderBy(
        "doc_id"
    )


def _q31_sql() -> str:
    nh = _LSH_BANDS * _LSH_ROWS
    # the whole chain needs WITH RECURSIVE for the reach() CTE at the end
    shingle_ctes = _sql_shingles().rstrip().replace("WITH toks", "WITH RECURSIVE toks", 1)
    return shingle_ctes + f""",
mh AS (
  SELECT doc_id, seed, min(md5(seed || ':' || sh)) AS mh
  FROM sh, range(0, {nh}) s(seed) GROUP BY doc_id, seed
), banded AS (
  SELECT doc_id, seed // {_LSH_ROWS} AS band,
         md5(string_agg(mh, '|' ORDER BY seed)) AS bucket
  FROM mh GROUP BY doc_id, seed // {_LSH_ROWS}
), sized AS (
  SELECT band, bucket FROM banded GROUP BY band, bucket
  HAVING count(*) <= 50
), small AS (
  SELECT b.* FROM banded b JOIN sized USING (band, bucket)
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM small a JOIN small b USING (band, bucket)
  WHERE a.doc_id < b.doc_id
), shs AS (
  SELECT doc_id, list(DISTINCT sh) AS shset FROM sh GROUP BY doc_id
), verified AS (
  SELECT p.id_a, p.id_b
  FROM pairs p JOIN shs x ON p.id_a = x.doc_id JOIN shs y ON p.id_b = y.doc_id
  WHERE len(list_intersect(x.shset, y.shset))::double
        / len(list_distinct(list_concat(x.shset, y.shset))) >= {_NEARDUP_T}
), sym AS (
  SELECT id_a AS u, id_b AS v FROM verified
  UNION SELECT id_b, id_a FROM verified
), reach(n, m) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT r.n, s.v FROM reach r JOIN sym s ON r.m = s.u
)
SELECT n::bigint AS doc_id, min(m)::bigint AS cluster,
       (n = min(m)) AS is_canonical
FROM reach GROUP BY n ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q32 — embedding-cosine near-dup pairs (brute-force verification form;
# the production path buckets via q24's banded LSH)
# ---------------------------------------------------------------------------

# production near-dup would use ~0.9+; the driver's synthetic embeddings
# have no true near-dup pairs (max pairwise cosine ~0.5), so the gate
# threshold selects the top ~0.1% tail to verify real rows
_EMB_NEARDUP_T = 0.35


def q32_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.dedup import embedding_neardup_pairs

    emb = _tbl(spark, sf_dir, "embeddings")
    # round to 4: float32->double cosine sums in different orders across
    # engines (~1 ulp), which can land on the 6th-decimal rounding boundary
    return embedding_neardup_pairs(emb, threshold=_EMB_NEARDUP_T).select(
        "id_a", "id_b", _rz(F.col("cos"), 4).alias("cos")
    )


Q32_SQL = f"""
WITH v AS (SELECT vec_id, embedding FROM embeddings),
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(generate_series(1, len(a.embedding)),
                                 i -> a.embedding[i]::double * b.embedding[i]::double))
         / (sqrt(list_sum(list_transform(a.embedding, x -> x::double * x::double)))
            * sqrt(list_sum(list_transform(b.embedding, x -> x::double * x::double)))) AS cos
  FROM v a JOIN v b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, (round(cos, 4) + 0.0) AS cos FROM scored WHERE cos >= {_EMB_NEARDUP_T}
"""


# ---------------------------------------------------------------------------
# Q33 — fused similarity cells (pathway_aligner.py:455-504, the M4-channel
# fusion): q28's rule-tier entities + q30-style BOW name embeddings, with
# the structural ("top") vector = the seeded hash vector of the parent xref.
# score = 0 if type-restricted else max(clamped cosine, rule tier).
# ---------------------------------------------------------------------------


def q33_fused_alignment_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.align import (
        fused_similarity_cells,
        prelim_alignments,
    )
    from pathhier_spark.operators.embeddings import entity_bow_embeddings, oov_vector

    left, right = _part_rule_entities(spark, sf_dir)
    rules = prelim_alignments(left, right)

    # name embedding: q30's construction (tokens hashed into the embeddings
    # corpus, misses -> seeded OOV)
    ent_tokens, token_vectors, dim = _hashed_token_vectors(spark, sf_dir)
    name_emb = entity_bow_embeddings(ent_tokens, token_vectors, dim=dim)

    def side_emb(s):
        return s.join(
            F.broadcast(name_emb), s["p_name"] == name_emb["ent_id"]
        ).select(
            "pair_id", "idx",
            F.col("embedding").alias("emb"),
            oov_vector(F.col("parent_str"), dim).alias("top_emb"),
        )

    cells = fused_similarity_cells(side_emb(left), side_emb(right), rules)
    # round to 4: cross-engine float summation order (see q30/q32)
    return cells.select("pair_id", "i", "j", _rz(F.col("score"), 4).alias("score"))


def _q33_sql() -> str:
    par_oov = "parent_str || ':' || (i - 1)::varchar"
    return f"""
WITH {_sql_bow_dims_ctes()}, name_emb AS (
  SELECT ent_id, list(avg_val ORDER BY dim) AS nv
  FROM (SELECT ent_id, dim, avg(val) AS avg_val FROM dims GROUP BY ent_id, dim)
  GROUP BY ent_id
), {_sql_base_sided()}, sided_ev AS (
  SELECT s.*,
         list_concat(
           (SELECT nv FROM name_emb WHERE ent_id = s.p_name),
           list_transform(generate_series(1, 64),
             i -> ({_sql_hex32(par_oov)} % 2000000) / 1000000.0 - 1.0)
         ) AS ev
  FROM sided s
), cells AS (
  SELECT l.pair_id, l.idx AS i, r.idx AS j,
         (l.obj_type = 'Group') <> (r.obj_type = 'Group') AS restricted,
         {_SQL_RULE_CASE} AS rule_score,
         list_sum(list_transform(generate_series(1, 128), k -> l.ev[k] * r.ev[k]))
           / (sqrt(list_sum(list_transform(l.ev, x -> x * x)))
              * sqrt(list_sum(list_transform(r.ev, x -> x * x)))) AS cos
  FROM sided_ev l JOIN sided_ev r
    ON l.pair_id = r.pair_id AND l.side = 0 AND r.side = 1
)
SELECT pair_id, i::int AS i, j::int AS j,
       (round(CASE WHEN restricted THEN 0.0
                   ELSE greatest(greatest(cos, 0.0), rule_score) END, 4) + 0.0)::double
         AS score
FROM cells
"""


# ---------------------------------------------------------------------------
# Q34 — C4-style cross-document segment dedup: identical 8-token segments
# keep only their first corpus-wide occurrence; documents are reassembled
# from surviving segments.
# ---------------------------------------------------------------------------

_SEG_TOKENS = 8


def q34_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.dedup import segment_dedup

    docs = _docs(spark, sf_dir)
    return segment_dedup(docs, seg_tokens=_SEG_TOKENS).select(
        "doc_id", "text_dedup", "n_kept", "n_dropped"
    )


def _q34_sql() -> str:
    k = _SEG_TOKENS
    return f"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents
), segs AS (
  SELECT doc_id, (i - 1)::int AS pos,
         array_to_string(toks[(i-1)*{k}+1 : (i-1)*{k}+{k}], ' ') AS seg
  FROM (
    SELECT doc_id, toks,
           unnest(generate_series(1, ceil(len(toks) / {k}.0)::int)) AS i
    FROM t
  )
), flagged AS (
  SELECT doc_id, pos, seg,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
  FROM segs
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY pos), '')
         AS text_dedup,
       count(*) FILTER (rn = 1) AS n_kept,
       count(*) FILTER (rn > 1) AS n_dropped
FROM flagged GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Q35 — training-corpus preparation composition: quality scoring -> language
# filter -> exact dedup, in one pass (the standard pretraining-data prep
# funnel, assembled from the textstats + dedup operators).
# ---------------------------------------------------------------------------

_Q35_QUALITY_FLOOR = 0.5


def q35_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.dedup import exact_dedup
    from pathhier_spark.operators.textstats import (
        with_lang_id,
        with_quality_features,
    )

    docs = _docs(spark, sf_dir)
    scored = with_lang_id(with_quality_features(docs))
    kept = scored.filter(
        (F.col("quality_score") >= _Q35_QUALITY_FLOOR)
        & (F.col("lang_pred") == "en")
    )
    deduped = exact_dedup(kept)
    return deduped.select(
        "doc_id",
        F.col("lang_pred"),
        F.round("quality_score", 6).alias("quality_score"),
        "n_tokens",
        "dup_count",
    )


def _q35_sql() -> str:
    from pathhier_spark.operators.textstats import LANG_MARKERS

    score_exprs = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        lit = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
        score_exprs.append(
            f"len(list_intersect(dtoks, {lit}))::double / {len(markers)} AS score_{lang}"
        )
    langs = sorted(LANG_MARKERS)
    pred = f"'{langs[0]}'"
    best = f"score_{langs[0]}"
    for lang in langs[1:]:
        pred = f"CASE WHEN score_{lang} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"greatest(score_{lang}, {best})"
    return f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
), feat AS (
  SELECT doc_id, text, toks,
         list_distinct(toks) AS dtoks,
         len(toks)::bigint AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks))::double / len(toks) ELSE 0 END AS distinct_ratio,
         CASE WHEN len(text) > 0
              THEN (len(text) - len(regexp_replace(text, '[^\\w\\s]', '', 'g')))::double / len(text)
              ELSE 0 END AS punct_ratio
  FROM t
), scored AS (
  SELECT doc_id, text, n_tokens, {', '.join(score_exprs)},
         round(0.4 * least(n_tokens / 100.0, 1.0)
             + 0.3 * distinct_ratio
             + 0.3 * (1.0 - least(punct_ratio * 5.0, 1.0)), 6) AS quality_score
  FROM feat
), pred AS (
  SELECT doc_id, text, n_tokens, quality_score, {pred} AS lang_pred FROM scored
), kept AS (
  SELECT * FROM pred
  WHERE quality_score >= {_Q35_QUALITY_FLOOR} AND lang_pred = 'en'
)
SELECT min(doc_id) AS doc_id, any_value(lang_pred) AS lang_pred,
       any_value(quality_score) AS quality_score, any_value(n_tokens) AS n_tokens,
       count(*) AS dup_count
FROM kept GROUP BY md5(text)
"""


# ---------------------------------------------------------------------------
# Q36 — IVF (inverted-file) approximate top-k, the second ANN scale path
# next to q24's banded LSH. Full DuckDB value oracle: the whole k-means is
# engine-portable by construction (operators/similarity.py ivf_topk) — init
# centroids are the n smallest md5('ivf:' || id), vectors quantize to int64
# (floor(x*1e6)) so assignment is all-integer squared-L2 argmin, Lloyd
# updates are floor(sum/count) per dim keeping centroids integral, and the
# re-rank is exact double cosine — every step reproduced below as CTE
# rounds. n_probe=14/16 because the driver embeddings are near-uniform
# random (the ANN worst case: every neighbor is marginal, cells are
# ~arbitrary); on clustered production corpora n_probe=4 already reaches
# recall 1.0 (tests/test_similarity.py). tests/test_entry_oracle.py keeps
# the recall >= 0.9 gate vs exact brute_force_topk.
# ---------------------------------------------------------------------------

_IVF_CENTROIDS = 16
_IVF_PROBE = 14
_IVF_ITERS = 2


def q36_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.similarity import ivf_topk

    emb = _tbl(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), "embedding")
    return ivf_topk(
        queries_df,
        corpus,
        k=5,
        n_centroids=_IVF_CENTROIDS,
        n_probe=_IVF_PROBE,
        kmeans_iters=_IVF_ITERS,
    ).select("q_id", "c_id", _rz(F.col("cos"), 6).alias("cos"), "nn_rank")


_SQL_IVF_QUANT = (
    "list_transform(embedding, x -> floor(x::double * 1000000)::bigint)"
)


def _sql_ivf_dist(v: str, cvec: str) -> str:
    d = _EMB_DIM
    return (
        f"list_sum(list_transform(generate_series(1, {d}),"
        f" i -> ({v}[i] - {cvec}[i]) * ({v}[i] - {cvec}[i])))"
    )


def _sql_lloyd_prefix(*, with_cv: bool = False) -> tuple:
    """Shared CTE chain replaying operators/similarity._fit_kmeans exactly:
    quantized corpus `c`, md5-seeded `cent0`, _IVF_ITERS Lloyd rounds
    (assign -> per-(cell,dim) floor-means; cells that lost all members keep
    their previous centroid via the left join), and `corpus_cells` = each
    corpus vector's nearest FINAL cell. Returns (prefix_sql, final_cent).
    Used by q36 (IVF probe/score on top) and q80 (SemDeDup centroid-distance
    ranking on top; with_cv=True surfaces the quantized vector)."""
    d = _EMB_DIM
    dist = _sql_ivf_dist

    def lloyd(prev, a, m, cur):
        return f"""{a} AS (
  SELECT c_id, cv, cell FROM (
    SELECT c.c_id, c.cv, t.cell,
           row_number() OVER (PARTITION BY c.c_id
                              ORDER BY {dist('c.cv', 't.cvec')}, t.cell) AS rn
    FROM c, {prev} t
  ) WHERE rn = 1
), {m} AS (
  SELECT cell, dd.d AS d, floor(sum(cv[dd.d])::double / count(*))::bigint AS m
  FROM {a}, range(1, {d + 1}) dd(d)
  GROUP BY cell, dd.d
), {cur} AS (
  SELECT p.cell, coalesce(mm.vec, p.cvec) AS cvec
  FROM {prev} p LEFT JOIN (
    SELECT cell, list(m ORDER BY d) AS vec FROM {m} GROUP BY cell
  ) mm USING (cell)
)"""

    rounds = ",\n".join(
        lloyd(f"cent{i}", f"a{i}", f"m{i}", f"cent{i + 1}")
        for i in range(_IVF_ITERS)
    )
    final = f"cent{_IVF_ITERS}"
    cv_out = ", cv" if with_cv else ""
    cv_in = ", c.cv" if with_cv else ""
    prefix = f"""
WITH c AS (
  SELECT vec_id AS c_id, embedding AS ce, {_SQL_IVF_QUANT} AS cv
  FROM embeddings
), cent0 AS (
  SELECT (row_number() OVER (ORDER BY md5('ivf:' || c_id::varchar), c_id)) - 1
           AS cell,
         cv AS cvec
  FROM c
  QUALIFY (row_number() OVER (ORDER BY md5('ivf:' || c_id::varchar), c_id))
            <= {_IVF_CENTROIDS}
),
{rounds},
corpus_cells AS (
  SELECT c_id, ce{cv_out}, cell FROM (
    SELECT c.c_id, c.ce{cv_in}, t.cell,
           row_number() OVER (PARTITION BY c.c_id
                              ORDER BY {dist('c.cv', 't.cvec')}, t.cell) AS rn
    FROM c, {final} t
  ) WHERE rn = 1
)"""
    return prefix, final


def _q36_sql() -> str:
    d = _EMB_DIM
    dist = _sql_ivf_dist
    prefix, final = _sql_lloyd_prefix()
    return f"""{prefix}, q AS (
  SELECT vec_id AS q_id, embedding AS qe, {_SQL_IVF_QUANT} AS qv
  FROM embeddings WHERE vec_id < 20
), q_cells AS (
  SELECT q_id, qe, cell FROM (
    SELECT q.q_id, q.qe, t.cell,
           row_number() OVER (PARTITION BY q.q_id
                              ORDER BY {dist('q.qv', 't.cvec')}, t.cell) AS rn
    FROM q, {final} t
  ) WHERE rn <= {_IVF_PROBE}
), scored AS (
  SELECT q_cells.q_id, corpus_cells.c_id,
         list_sum(list_transform(generate_series(1, {d}),
                                 i -> qe[i]::double * ce[i]::double))
         / (sqrt(list_sum(list_transform(qe, x -> x::double * x::double)))
            * sqrt(list_sum(list_transform(ce, x -> x::double * x::double)))) AS cos
  FROM q_cells JOIN corpus_cells USING (cell)
), ranked AS (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS nn_rank
  FROM scored
)
SELECT q_id, c_id, (round(cos, 6) + 0.0) AS cos, nn_rank
FROM ranked WHERE nn_rank <= 5
"""


# ---------------------------------------------------------------------------
# Q37 — PII scrubbing (training-data prep: redact emails/IPv4 before the
# corpus ships). The driver corpus contains no PII, so both engines inject
# the SAME deterministic addresses into 2 of every 3 documents first — the
# redaction paths are then exercised on identical non-trivial input.
# ---------------------------------------------------------------------------


def q37_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import with_pii_scrub

    docs = _docs(spark, sf_dir)
    injected = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.col("text"))
        .otherwise(
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com from 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0.7"),
            )
        )
        .alias("text"),
    )
    return with_pii_scrub(injected).select(
        "doc_id", "n_emails", "n_ipv4", F.md5("text_scrubbed").alias("scrub_md5")
    )


def _q37_sql() -> str:
    # DuckDB feature req: list_reduce + list_prepend (DuckDB >= 0.9; present
    # in the driver env — q37 green since r4). Fallback if ever absent:
    # unroll the fold into nested regexp_replace rounds bounded by the max
    # candidate count per doc.
    # mirrors the FULL operator scrub chain (email -> ipv4 -> phone -> cc),
    # not just the two classes q37 reports: with_pii_scrub's text_scrubbed
    # redacts all four, so an oracle that stopped at IPv4 would silently
    # diverge the moment the corpus contains a phone-shaped or Luhn-valid
    # digit run (q42 exercises those classes with injected input)
    from pathhier_spark.operators.textstats import (
        PII_CC_RE,
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
    )

    luhn = (
        "list_sum(list_transform(generate_series(1, len(x)), i -> "
        "CASE WHEN i % 2 = 1 THEN substr(x, len(x) - i + 1, 1)::int "
        "ELSE CASE WHEN substr(x, len(x) - i + 1, 1)::int * 2 > 9 "
        "THEN substr(x, len(x) - i + 1, 1)::int * 2 - 9 "
        "ELSE substr(x, len(x) - i + 1, 1)::int * 2 END END)) % 10 = 0"
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text
              ELSE text || ' contact user' || doc_id::varchar
                   || '@example.com from 10.' || (doc_id % 256)::varchar
                   || '.0.7'
         END AS text
  FROM documents
), s1 AS (
  SELECT doc_id, text,
         regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS e
  FROM t
), s2 AS (
  SELECT *, regexp_replace(e, '{PII_IPV4_RE}', '<IP>', 'g') AS ip FROM s1
), s3 AS (
  SELECT *, regexp_replace(ip, '{PII_PHONE_RE}', '<PHONE>', 'g') AS ph FROM s2
), s4 AS (
  SELECT *, list_filter(regexp_extract_all(ph, '{PII_CC_RE}'), x -> {luhn})
              AS valid
  FROM s3
)
SELECT doc_id,
       len(regexp_extract_all(text, '{PII_EMAIL_RE}'))::bigint AS n_emails,
       len(regexp_extract_all(e, '{PII_IPV4_RE}'))::bigint AS n_ipv4,
       md5(list_reduce(list_prepend(ph, valid),
                       (acc, x) -> regexp_replace(acc, '\\b' || x || '\\b',
                                                  '<CC>', 'g'))) AS scrub_md5
FROM s4
"""


# ---------------------------------------------------------------------------
# Q38 — duplicate word-n-gram fractions (Gopher repetition quality signal).
# ---------------------------------------------------------------------------

_SQL_WS_TOKS = (
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
)


def _sql_word_ngrams(n: int) -> str:
    return (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_transform(generate_series(1, len(toks) - {n - 1}), "
        f"i -> array_to_string(toks[i:i+{n - 1}], ' ')) "
        f"ELSE []::varchar[] END"
    )


def q38_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import with_ngram_repetition

    docs = _docs(spark, sf_dir)
    return with_ngram_repetition(docs).select(
        "doc_id",
        F.round("dup_2gram_frac", 6).alias("dup_2gram_frac"),
        F.round("dup_3gram_frac", 6).alias("dup_3gram_frac"),
    )


def _q38_sql() -> str:
    frac = (
        "round(CASE WHEN len({g}) > 0 THEN "
        "1.0 - len(list_distinct({g})) / len({g})::double "
        "ELSE 0.0 END, 6)"
    )
    return f"""
WITH t AS (SELECT doc_id, {_SQL_WS_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id, {_sql_word_ngrams(2)} AS g2, {_sql_word_ngrams(3)} AS g3
  FROM t
)
SELECT doc_id, {frac.format(g='g2')} AS dup_2gram_frac,
       {frac.format(g='g3')} AS dup_3gram_frac
FROM g
"""


# ---------------------------------------------------------------------------
# Q39 — corpus-level boilerplate phrase mining: distinct 3-grams per doc ->
# document frequency -> threshold -> deterministic top-50.
# ---------------------------------------------------------------------------

_BP_N = 3
_BP_MIN_DF = 2
_BP_TOP_K = 50


def q39_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import boilerplate_ngrams

    docs = _docs(spark, sf_dir)
    return boilerplate_ngrams(
        docs, n=_BP_N, min_doc_freq=_BP_MIN_DF, top_k=_BP_TOP_K
    )


def _q39_sql() -> str:
    return f"""
WITH t AS (SELECT doc_id, {_SQL_WS_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, list_distinct({_sql_word_ngrams(_BP_N)}) AS grams FROM t),
e AS (SELECT doc_id, unnest(grams) AS gram FROM g)
SELECT gram, count(*) AS doc_freq
FROM e GROUP BY gram
HAVING count(*) >= {_BP_MIN_DF}
ORDER BY doc_freq DESC, gram
LIMIT {_BP_TOP_K}
"""


# ---------------------------------------------------------------------------
# Q40 — boilerplate removal END-TO-END: mine the corpus's hot 3-grams (q39)
# and strip every occurrence from every document (union of covered token
# positions). The mined phrase table broadcasts; the document side shuffles
# once on doc_id.
# ---------------------------------------------------------------------------


def q40_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import (
        boilerplate_ngrams,
        strip_boilerplate,
    )

    docs = _docs(spark, sf_dir)
    phrases = boilerplate_ngrams(
        docs, n=_BP_N, min_doc_freq=_BP_MIN_DF, top_k=_BP_TOP_K
    )
    return strip_boilerplate(docs, phrases, n=_BP_N).select(
        "doc_id", F.md5("text_stripped").alias("stripped_md5"), "n_stripped_tokens"
    )


def _q40_sql() -> str:
    n = _BP_N
    return f"""
WITH t AS (SELECT doc_id, {_SQL_WS_TOKS} AS toks FROM documents),
gd AS (SELECT doc_id, list_distinct({_sql_word_ngrams(n)}) AS grams FROM t),
e AS (SELECT doc_id, unnest(grams) AS gram FROM gd),
bp AS (
  SELECT gram FROM e GROUP BY gram HAVING count(*) >= {_BP_MIN_DF}
  ORDER BY count(*) DESC, gram LIMIT {_BP_TOP_K}
),
pos AS (
  SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t
),
starts AS (
  SELECT doc_id, i FROM pos
  WHERE len(toks) - i >= {n - 1}
    AND array_to_string(toks[i:i+{n - 1}], ' ') IN (SELECT gram FROM bp)
),
covered AS (
  SELECT DISTINCT s.doc_id, s.i + d.d AS i
  FROM starts s, range(0, {n}) d(d)
),
kept AS (
  SELECT p.doc_id, p.i, p.toks[p.i] AS tok
  FROM pos p LEFT JOIN covered c ON p.doc_id = c.doc_id AND p.i = c.i
  WHERE c.doc_id IS NULL
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text_stripped,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       md5(coalesce(a.text_stripped, '')) AS stripped_md5,
       (len(t.toks) - coalesce(a.n_kept, 0))::bigint AS n_stripped_tokens
FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
"""


# ---------------------------------------------------------------------------
# Q41 — C4-style LINE-level exact dedup (companion to q34's token-segment
# dedup; together they complete the C4 recipe): byte-identical lines keep
# only their first corpus-wide occurrence. The driver corpus has no
# newlines, so both engines inject the SAME deterministic line structure
# first (the q37 pattern): every document gains shared boilerplate lines
# ("subscribe..."/"copyright...") around its own body line — the hot lines
# survive exactly once, bodies survive per-document.
# ---------------------------------------------------------------------------


def q41_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.dedup import line_dedup

    docs = _docs(spark, sf_dir)
    injected = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("subscribe to our newsletter\n"),
                F.col("text"),
                F.lit("\ncopyright example corp"),
            ),
        )
        .otherwise(
            F.concat(
                F.col("text"),
                F.lit("\nsubscribe to our newsletter\ncopyright example corp"),
            )
        )
        .alias("text"),
    )
    return line_dedup(injected).select(
        "doc_id",
        F.md5("text_dedup").alias("dedup_md5"),
        "n_kept",
        "n_dropped",
    )


def _q41_sql() -> str:
    return """
WITH t AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN 'subscribe to our newsletter' || chr(10) || text
                   || chr(10) || 'copyright example corp'
              ELSE text || chr(10) || 'subscribe to our newsletter'
                   || chr(10) || 'copyright example corp'
         END AS text
  FROM documents
), split AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM t
), lines AS (
  SELECT doc_id, (i - 1)::int AS pos, ls[i] AS line
  FROM (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i FROM split)
), flagged AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM lines
)
SELECT doc_id,
       md5(coalesce(string_agg(CASE WHEN rn = 1 THEN line END, chr(10)
                               ORDER BY pos), '')) AS dedup_md5,
       count(*) FILTER (rn = 1) AS n_kept,
       count(*) FILTER (rn > 1) AS n_dropped
FROM flagged GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Q42 — phone + Luhn-validated card-number PII redaction (extends q37's
# email/IPv4 scrub). Injection (q37 pattern — both engines append the SAME
# deterministic strings): docs % 3 == 1 get a phone + a VALID card
# (4111111111111111, Luhn-passing -> redacted & counted), % 3 == 2 get an
# INVALID card (4111111111111112, Luhn-failing -> kept, count 0) + a
# parenthesized phone. The Luhn check is pure integer arithmetic on both
# engines (F.aggregate HOF / list_transform+list_sum), so the conditional
# redaction is fully value-oracled.
# ---------------------------------------------------------------------------


def q42_pii_phone_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import with_pii_scrub

    docs = _docs(spark, sf_dir)
    injected = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.col("text"))
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.col("text"),
                F.lit(" call 555-867-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" card 4111111111111111"),
            ),
        )
        .otherwise(
            F.concat(
                F.col("text"),
                F.lit(" card 4111111111111112 or (212) 555-0199"),
            )
        )
        .alias("text"),
    )
    return with_pii_scrub(injected).select(
        "doc_id",
        "n_emails",
        "n_ipv4",
        "n_phones",
        "n_ccs",
        F.md5("text_scrubbed").alias("scrub_md5"),
    )


def _q42_sql() -> str:
    # DuckDB feature req: list_reduce + list_prepend (>= 0.9; driver-green
    # since r4) — same conditional-redaction fold as _q37_sql.
    from pathhier_spark.operators.textstats import (
        PII_CC_RE,
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
    )

    luhn = (
        "list_sum(list_transform(generate_series(1, len(x)), i -> "
        "CASE WHEN i % 2 = 1 THEN substr(x, len(x) - i + 1, 1)::int "
        "ELSE CASE WHEN substr(x, len(x) - i + 1, 1)::int * 2 > 9 "
        "THEN substr(x, len(x) - i + 1, 1)::int * 2 - 9 "
        "ELSE substr(x, len(x) - i + 1, 1)::int * 2 END END)) % 10 = 0"
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text
              WHEN doc_id % 3 = 1 THEN
                   text || ' call 555-867-'
                        || lpad((doc_id % 10000)::varchar, 4, '0')
                        || ' card 4111111111111111'
              ELSE text || ' card 4111111111111112 or (212) 555-0199'
         END AS text
  FROM documents
), s1 AS (
  SELECT doc_id, text,
         regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS e
  FROM t
), s2 AS (
  SELECT *, regexp_replace(e, '{PII_IPV4_RE}', '<IP>', 'g') AS ip FROM s1
), s3 AS (
  SELECT *, regexp_replace(ip, '{PII_PHONE_RE}', '<PHONE>', 'g') AS ph FROM s2
), s4 AS (
  SELECT *, list_filter(regexp_extract_all(ph, '{PII_CC_RE}'), x -> {luhn})
              AS valid
  FROM s3
)
SELECT doc_id,
       len(regexp_extract_all(text, '{PII_EMAIL_RE}'))::bigint AS n_emails,
       len(regexp_extract_all(e, '{PII_IPV4_RE}'))::bigint AS n_ipv4,
       len(regexp_extract_all(ip, '{PII_PHONE_RE}'))::bigint AS n_phones,
       len(valid)::bigint AS n_ccs,
       md5(list_reduce(list_prepend(ph, valid),
                       (acc, x) -> regexp_replace(acc, '\\b' || x || '\\b',
                                                  '<CC>', 'g'))) AS scrub_md5
FROM s4
"""


# ---------------------------------------------------------------------------
# Q43 — URL canonicalization + URL-keyed dedup (web-corpus ingest: the same
# page arrives as case-variant scheme/host, default ports, tracking params,
# fragments). The driver corpus has no urls, so both engines inject the
# SAME deterministic spellings (q37 pattern): variants 0 and 1 differ only
# in case/port/tracking noise and must collapse to one canonical row;
# variant 3 has no scheme and passes through unchanged.
# ---------------------------------------------------------------------------


def q43_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.urls import url_dedup

    docs = _docs(spark, sf_dir)
    m = F.col("doc_id") % 4
    # k decorrelated from the variant selector so variants 0 and 1 share
    # page keys — the case/port/tracking collapse across spellings is real
    k = (F.floor(F.col("doc_id") / F.lit(4)).cast("long") % 10).cast("string")
    injected = docs.select(
        "doc_id",
        F.when(
            m == 0,
            F.concat(
                F.lit("HTTPS://WWW.Example.COM:443/Page/"), k,
                F.lit("?utm_source=feed&id="), k, F.lit("&ref=tw#frag"),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit("https://www.example.com/Page/"), k,
                F.lit("?id="), k,
            ),
        )
        .when(
            m == 2,
            F.concat(
                F.lit("http://CDN.Example.com:8080/asset?gclid=Z&v="),
                (F.col("doc_id") % 7).cast("string"),
            ),
        )
        .otherwise(F.concat(F.lit("example.com/relative/"), k))
        .alias("url"),
    )
    return url_dedup(injected).select("doc_id", "canon_url", "dup_count")


def _q43_sql() -> str:
    from pathhier_spark.operators.urls import TRACKING_PARAM_RE

    return f"""
WITH t AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN 'HTTPS://WWW.Example.COM:443/Page/'
                       || ((doc_id // 4) % 10)::varchar || '?utm_source=feed&id='
                       || ((doc_id // 4) % 10)::varchar || '&ref=tw#frag'
           WHEN 1 THEN 'https://www.example.com/Page/'
                       || ((doc_id // 4) % 10)::varchar || '?id='
                       || ((doc_id // 4) % 10)::varchar
           WHEN 2 THEN 'http://CDN.Example.com:8080/asset?gclid=Z&v='
                       || (doc_id % 7)::varchar
           ELSE 'example.com/relative/' || ((doc_id // 4) % 10)::varchar
         END AS url
  FROM documents
), p AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))
           AS scheme,
         regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS rest
  FROM t
), q AS (
  SELECT *, regexp_extract(rest, '^([^/?#]*)', 1) AS hostport,
         regexp_replace(rest, '^[^/?#]*', '') AS after_host
  FROM p
), r AS (
  SELECT *, lower(regexp_extract(hostport, '^([^:]*)', 1)) AS host,
         regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
         regexp_extract(after_host, '^([^?#]*)', 1) AS path,
         array_to_string(list_filter(
           string_split(regexp_extract(after_host, '\\?([^#]*)', 1), '&'),
           x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}')),
           '&') AS qs
  FROM q
), c AS (
  SELECT doc_id,
         CASE WHEN scheme = '' THEN url ELSE
           scheme || '://' || host
           || CASE WHEN (scheme = 'http' AND port = '80')
                        OR (scheme = 'https' AND port = '443')
                        OR port = '' THEN '' ELSE ':' || port END
           || CASE WHEN path = '' THEN '/' ELSE path END
           || CASE WHEN qs = '' THEN '' ELSE '?' || qs END
         END AS canon_url
  FROM r
)
SELECT min(doc_id) AS doc_id, canon_url, count(*) AS dup_count
FROM c GROUP BY canon_url
"""


# ---------------------------------------------------------------------------
# Q44 — mean unigram surprisal per document under the corpus's own unigram
# distribution (the cheap LM-perplexity stand-in for pretraining quality
# filtering). The per-document sum folds ln(count) in POSITION order on
# both engines (Spark: array_sort + sequential F.aggregate; DuckDB:
# list(... ORDER BY pos) + list_sum) — bit-stable, no shuffled float sums.
# ---------------------------------------------------------------------------


def q44_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import unigram_surprisal

    docs = _docs(spark, sf_dir)
    return unigram_surprisal(docs).select(
        "doc_id", "n_tokens", _rz(F.col("avg_surprisal"), 6).alias("avg_surprisal")
    )


def _q44_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, (i - 1)::int AS pos, ts[i] AS tok
  FROM (
    SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i
    FROM (SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents)
  )
), freqs AS (
  SELECT tok, count(*) AS tok_count FROM toks GROUP BY tok
), total AS (
  SELECT sum(tok_count)::double AS n_total FROM freqs
), per_doc AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         list_sum(list(ln(f.tok_count::double) ORDER BY t.pos)) AS sum_lnc
  FROM toks t JOIN freqs f USING (tok)
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
       (round(ln(n_total) - sum_lnc / n_tokens, 6) + 0.0) AS avg_surprisal
FROM per_doc, total
"""


# ---------------------------------------------------------------------------
# Q45 — exact corpus percentiles of per-document token counts via a value
# histogram (the scale-correct exact order statistic: no global sort, the
# only window orders the histogram — distinct-count-sized, corpus-size
# independent). Inverted-CDF rank (element at floor((n-1)*q)) — integer-
# exact on both engines, no interpolation to diverge.
# ---------------------------------------------------------------------------


def q45_token_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import token_count_percentiles

    docs = _docs(spark, sf_dir)
    return token_count_percentiles(docs, qs=(0.5, 0.9, 0.99))


def _q45_sql() -> str:
    def pick(q):
        return (
            f"(SELECT min(v) FROM cum WHERE cum >= "
            f"floor((SELECT (n - 1)::double FROM t) * {q}) + 1)"
        )

    return f"""
WITH c AS (
  SELECT len({_SQL_WS_TOKS})::bigint AS v FROM documents
), h AS (
  SELECT v, count(*) AS c FROM c GROUP BY v
), cum AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM h
), t AS (
  SELECT sum(c)::bigint AS n FROM h
)
SELECT (SELECT n FROM t) AS n_docs,
       {pick(0.5)} AS p50,
       {pick(0.9)} AS p90,
       {pick(0.99)} AS p99
"""


# ---------------------------------------------------------------------------
# Q46 — JSON property extraction over the events table (S6 source-format
# surface: semi-structured props parsed with the engine's REAL JSON path
# functions on both sides, not regex), aggregated per event type.
# ---------------------------------------------------------------------------


def q46_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(_t(sf_dir, "events"))
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"), "value")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            _rz(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# DuckDB feature req: json extension (json_extract_string — bundled and
# autoloaded in stock builds; driver-green at r4). The ::bigint around the
# sum() is LOAD-BEARING: DuckDB sums BIGINT into HUGEINT, which a pandas
# fetch silently converts to float64 and the driver then hash-diverges
# (r4's one red row).
Q46_SQL = """
SELECT event_type,
       count(*) AS n_events,
       sum(json_extract_string(props, '$.k')::bigint)::bigint AS sum_k,
       (round(avg(json_extract_string(props, '$.k')::bigint), 6) + 0.0)
         AS avg_k,
       min(json_extract_string(props, '$.k')::bigint) AS min_k,
       max(json_extract_string(props, '$.k')::bigint) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Q47 — backward as-of join (operators/temporal.py): each purchase event
# gains the user's latest view event at or before it. Spark side is the
# union-and-window composition (one key shuffle, no inequality join);
# the oracle is DuckDB's NATIVE ASOF LEFT JOIN — two entirely different
# evaluation strategies agreeing bit-for-bit. The view side pre-dedups to
# unique (user, ts) so the as-of winner is well-defined on both engines.
# ---------------------------------------------------------------------------


def q47_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import asof_join

    ev = spark.read.parquet(_t(sf_dir, "events"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 6).alias("purchase_value")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    out = asof_join(purchases, views, on="user_id")
    return out.select(
        "event_id",
        "user_id",
        "ts",
        _rz(F.col("purchase_value"), 6).alias("purchase_value"),
        F.col("r_ts").alias("view_ts"),
        _rz(F.col("r_view_value"), 6).alias("view_value"),
    )


# DuckDB feature req: native ASOF LEFT JOIN (>= 0.9; driver-green at r4).
# Deliberately kept native: the gate then compares two genuinely different
# as-of algorithms (DuckDB's interpolated lookup vs our union-and-window
# composition). Fallback if ever absent: LATERAL (ORDER BY ts DESC LIMIT 1).
Q47_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts, round(value, 6) AS purchase_value
  FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, ts, max(value) AS view_value
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, p.ts,
       (round(p.purchase_value, 6) + 0.0) AS purchase_value,
       v.ts AS view_ts,
       (round(v.view_value, 6) + 0.0) AS view_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


# ---------------------------------------------------------------------------
# Q48 — interval/range join (operators/temporal.py): attribute each click
# to every purchase whose 24-hour attribution window contains it. Spark
# side is the bin-bucketed equi-join (Catalyst's native plan for an
# inequality-only join is a BroadcastNestedLoopJoin — O(n x m)); the
# oracle is the plain BETWEEN join.
# ---------------------------------------------------------------------------


def q48_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import range_join

    ev = spark.read.parquet(_t(sf_dir, "events"))
    windows = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 24 HOURS")).alias("end_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    return range_join(
        clicks, windows, on="user_id", bin_seconds=86400
    ).select("purchase_id", "click_id", "user_id")


Q48_SQL = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, c.user_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 24 HOURS
"""


# ---------------------------------------------------------------------------
# Q49 — time-bucketed rollup over the events table (the hypertable-rollup
# shape: hierarchical day x event_type totals in one pass, q26's ROLLUP
# applied to a truncated time dimension).
# ---------------------------------------------------------------------------


def q49_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(_t(sf_dir, "events"))
    return (
        # cast to date: DuckDB's date_trunc('day', ...) returns DATE while
        # Spark's returns timestamp — str-canonicalized they differ
        ev.rollup(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # integer cents, not round(sum(double)): a cross-row float sum
            # is summation-order-dependent, and the grand-total row sums
            # the whole table — quantize per row first so the aggregate is
            # exact under any partitioning and on any engine
            F.sum(F.floor(F.col("value") * 100)).alias("sum_value_cents"),
        )
        .orderBy(
            F.col("day").asc_nulls_first(),
            F.col("event_type").asc_nulls_first(),
        )
    )


Q49_SQL = """
SELECT date_trunc('day', ts) AS day, event_type,
       count(*) AS n_events,
       sum(floor(value * 100))::bigint AS sum_value_cents
FROM events
GROUP BY ROLLUP (date_trunc('day', ts), event_type)
ORDER BY day ASC NULLS FIRST, event_type ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# Q50 — KMV distinct-count sketch over the document token vocabulary: the
# DETERMINISTIC sketch (md5-hashed k-minimum-values), so unlike HLL the
# estimate itself is value-oracled — both engines produce the identical
# k-th minimum hash and therefore the identical estimate. exact_distinct
# rides along to show the sketch's accuracy.
# ---------------------------------------------------------------------------

_KMV_K = 256


def q50_vocab_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import kmv_distinct

    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    toks = docs.select(F.explode(_tokens("text")).alias("tok"))
    sk = kmv_distinct(toks, "tok", k=_KMV_K)
    exact = toks.agg(F.countDistinct("tok").alias("exact_distinct"))
    return sk.crossJoin(exact).select(
        "k_used", "kth_hash", _rz(F.col("est_distinct"), 4).alias("est_distinct"),
        "exact_distinct",
    )


def _q50_sql() -> str:
    return f"""
WITH toks AS (
  SELECT unnest({_SQL_WS_TOKS}) AS tok FROM documents
), hashes AS (
  SELECT DISTINCT {_sql_hex32('tok')} AS h FROM toks
), mins AS (
  SELECT h FROM hashes ORDER BY h LIMIT {_KMV_K}
), sk AS (
  SELECT count(*) AS k_used, max(h) AS kth_hash FROM mins
)
SELECT k_used, kth_hash,
       (round(CASE WHEN k_used < {_KMV_K} THEN k_used::double
                   ELSE {_KMV_K - 1}.0 / (kth_hash::double / 4294967296.0)
              END, 4) + 0.0) AS est_distinct,
       (SELECT count(DISTINCT tok) FROM toks) AS exact_distinct
FROM sk
"""


# ---------------------------------------------------------------------------
# Q51 — integer fixed-point PageRank over the customer->supplier trade
# graph (iterative KG analytics beyond connected components). Ranks are
# int64 micro-units with floor-division contributions, so the iterative
# float algorithm is deterministic and the oracle replays every round as
# unrolled CTEs (the q36 Lloyd-round trick applied to a graph loop).
# ---------------------------------------------------------------------------

_PR_ITERS = 5
_PR_SCALE = 1_000_000
_PR_DAMP = 85


def q51_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import pagerank_fixedpoint

    orders = spark.read.parquet(_t(sf_dir, "orders"))
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    edges = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        # distinct over the two INT keys, then concat: the dedup shuffle
        # ships 16 bytes/row instead of two strings; the prefixes keep the
        # concat injective, so the edge set is identical
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )
    return pagerank_fixedpoint(
        edges, iterations=_PR_ITERS, damping_pct=_PR_DAMP, scale=_PR_SCALE
    ).select("node", "rank_fp", _rz(F.col("rank"), 6).alias("rank"))


def _sql_pagerank_chain(edge_cte: str, seed_where: str | None = None) -> str:
    """Unrolled fixed-point PageRank rounds over an arbitrary edge CTE
    (must define `e(s, d)`) — shared by the trade-graph (q51), the
    extracted-KG-triple-graph (q57), and (with `seed_where`, a predicate
    over `node`) the TrustRank (q112) oracles. With a seed predicate the
    teleport term and the r0 unit mass are restricted to seed nodes —
    the exact two deltas of trustrank_fixedpoint."""
    teleport = (100 - _PR_DAMP) * _PR_SCALE // 100
    if seed_where is None:
        node_cols = "node"
        tele_expr = str(teleport)
        r0_rank = f"{_PR_SCALE}::bigint"
    else:
        node_cols = f"node, CASE WHEN {seed_where} THEN 1 ELSE 0 END AS is_seed"
        tele_expr = f"(n.is_seed * {teleport})"
        r0_rank = f"(is_seed * {_PR_SCALE})::bigint"

    def rnd(prev, c, cur):
        return f"""{c} AS (
  SELECT e.d AS node,
         sum(floor(r.rank_fp::double / deg.deg)::bigint) AS in_sum
  FROM e JOIN {prev} r ON e.s = r.node JOIN deg ON e.s = deg.s
  GROUP BY e.d
), {cur} AS (
  SELECT n.node,
         ({tele_expr} + floor(({_PR_DAMP} * coalesce(c.in_sum, 0))::double
                             / 100)::bigint)::bigint AS rank_fp
  FROM nodes n LEFT JOIN {c} c ON n.node = c.node
)"""

    rounds = ",\n".join(
        rnd(f"r{i}", f"c{i + 1}", f"r{i + 1}") for i in range(_PR_ITERS)
    )
    return f"""
WITH e AS (
{edge_cte}
), nodes AS (
  SELECT {node_cols} FROM (
    SELECT DISTINCT node FROM (
      SELECT s AS node FROM e UNION ALL SELECT d AS node FROM e
    )
  )
), deg AS (
  SELECT s, count(*) AS deg FROM e GROUP BY s
), r0 AS (
  SELECT node, {r0_rank} AS rank_fp FROM nodes
),
{rounds}
SELECT node, rank_fp,
       (round(rank_fp::double / {_PR_SCALE}.0, 6) + 0.0) AS rank
FROM r{_PR_ITERS}
"""


def _q51_sql() -> str:
    return _sql_pagerank_chain(
        """  SELECT DISTINCT 'c' || o_custkey::varchar AS s,
                  's' || l_suppkey::varchar AS d
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey"""
    )


# ---------------------------------------------------------------------------
# Q52 — embedding near-dup via the NON-QUADRATIC bucketed path
# (operators/dedup.embedding_neardup_bucketed): banded SRP-LSH candidate
# generation + exact-cosine filter, vs q32's brute crossJoin form. The
# oracle replays the IDENTICAL md5-derived integer-plane bucketing in SQL
# (the q24 trick applied to a self-join), so the row set is fully
# value-oracled regardless of LSH recall — both engines derive the same
# candidate set from the same deterministic planes.
#
# Recall honesty: this gate runs at q32's threshold 0.35 so the two
# queries stay comparable on the driver corpus (which has no >=0.9 cosine
# pairs) — but 0.35 is a LOW-threshold regime where SRP banding separates
# poorly (boundary candidate probability 1-(1-p^4)^8 with
# p = 1 - arccos(0.35)/pi ~= 0.617 is ~0.71, not the >=0.9998 that holds
# at the operator's intended threshold >= 0.95). Measured vs the brute
# q32 row set: recall 0.74 (sf0.001) / 0.76 (sf0.01), strict subset,
# precision 1.0 — asserted in tests/test_dedup.py. Production use at
# near-dup thresholds (>=0.9) keeps the documented near-1 recall; users
# needing high recall at low thresholds should use the brute form or
# raise n_bands.
# ---------------------------------------------------------------------------

# 8 planes x 16 bands: 256 buckets/band keeps per-bucket pair counts
# ~n/256-sized (4x8's 16 buckets/band went nearly all-pairs once the
# corpus outgrew the bucket space — measured 815k candidate pairs from
# 2000 vectors at sf0.1), and the threshold-boundary recall bound is
# BETTER: 1-(1-p^8)^16 = 0.99986 at cos 0.95 vs 0.99979 for 4x8.
_BND_PLANES = 8
_BND_BANDS = 16


def q52_embedding_neardup_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.dedup import embedding_neardup_bucketed

    emb = _tbl(spark, sf_dir, "embeddings")
    return embedding_neardup_bucketed(
        emb,
        threshold=_EMB_NEARDUP_T,
        n_planes=_BND_PLANES,
        n_bands=_BND_BANDS,
        dim=_EMB_DIM,
    ).select("id_a", "id_b", _rz(F.col("cos"), 4).alias("cos"))


def _q52_sql() -> str:
    d = _EMB_DIM
    plane_key = "'plane:' || b.b::varchar || ':' || p.p::varchar || ':' || i.i::varchar"
    quant = "list_transform(embedding, x -> floor(x::double * 1000000)::bigint)"
    bucket = (
        "sum(CASE WHEN list_sum(list_transform(generate_series(1, {d}),"
        " i -> qv[i] * cs[i])) >= 0 THEN (1::bigint << plane) ELSE 0 END)"
    ).format(d=d)
    return f"""
WITH coef AS (
  SELECT b.b AS band, p.p AS plane, i.i AS i,
         ({_sql_hex32(plane_key)} % 2001) - 1000 AS c
  FROM range(0, {_BND_BANDS}) b(b), range(0, {_BND_PLANES}) p(p), range(0, {d}) i(i)
), planes AS (
  SELECT band, plane, list(c ORDER BY i) AS cs FROM coef GROUP BY band, plane
), v AS (
  SELECT vec_id, embedding, {quant} AS qv FROM embeddings
), vb AS (
  SELECT vec_id, band, {bucket} AS bucket
  FROM v, planes GROUP BY vec_id, band
), cands AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM vb a JOIN vb b USING (band, bucket)
  WHERE a.vec_id < b.vec_id
), scored AS (
  SELECT id_a, id_b,
         list_sum(list_transform(generate_series(1, {d}),
                                 i -> va.embedding[i]::double * vb2.embedding[i]::double))
         / (sqrt(list_sum(list_transform(va.embedding, x -> x::double * x::double)))
            * sqrt(list_sum(list_transform(vb2.embedding, x -> x::double * x::double)))) AS cos
  FROM cands
  JOIN v va ON cands.id_a = va.vec_id
  JOIN v vb2 ON cands.id_b = vb2.vec_id
)
SELECT id_a, id_b, (round(cos, 4) + 0.0) AS cos
FROM scored WHERE cos >= {_EMB_NEARDUP_T}
"""


# ---------------------------------------------------------------------------
# Q56 — REAL nearest-neighbor image resize on the P6 codec
# (operators/multimodal.resize_ppm_nearest). The oracle rebuilds the
# resized payload bytes in SQL from the same source text (ASCII corpus:
# string ops == byte ops) and md5s them — the resampling arithmetic
# itself (source index = x*w // out_w) is value-checked, not just the
# plumbing.
# ---------------------------------------------------------------------------

_RSZ_W = 16
_RSZ_H = 1


def q56_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.multimodal import (
        media_from_documents,
        resize_ppm_nearest,
    )

    docs = _docs(spark, sf_dir)
    media = media_from_documents(docs)
    return resize_ppm_nearest(media, out_w=_RSZ_W, out_h=_RSZ_H).select(
        "media_id", "width", "height", "checksum"
    ).orderBy("media_id")


def _q56_sql() -> str:
    return f"""
WITH im AS (
  SELECT doc_id AS media_id, (length(text) // 3)::int AS w,
         substr(text, 1, (length(text) // 3) * 3) AS body
  FROM documents WHERE doc_id % 3 = 0
), rz AS (
  SELECT media_id,
         'P6' || chr(10) || '{_RSZ_W} {_RSZ_H}' || chr(10) || '255'
              || chr(10) ||
         array_to_string(list_transform(generate_series(0, {_RSZ_W - 1}),
                          x -> substr(body, ((x * w) // {_RSZ_W}) * 3 + 1, 3)),
                         '') AS payload
  FROM im WHERE w > 0
)
SELECT media_id, {_RSZ_W} AS width, {_RSZ_H} AS height,
       md5(payload) AS checksum
FROM rz ORDER BY media_id
"""


# ---------------------------------------------------------------------------
# Q57 — PageRank over the EXTRACTED KG triple graph (subj -> obj edges
# from q17's token-window extraction): the graph-analytics stage running
# on the pipeline's own output rather than the trade graph — node
# centrality over extracted entities. Same integer fixed-point operator
# and unrolled-CTE oracle chain as q51, different edge derivation.
# ---------------------------------------------------------------------------


def q57_pagerank_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import pagerank_fixedpoint

    docs = _docs(spark, sf_dir)
    edges = (
        extract_token_triples(docs, TRIGGERS)
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
    )
    return pagerank_fixedpoint(
        edges, iterations=_PR_ITERS, damping_pct=_PR_DAMP, scale=_PR_SCALE
    ).select("node", "rank_fp", _rz(F.col("rank"), 6).alias("rank"))


def _q57_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    return _sql_pagerank_chain(
        f"""  SELECT DISTINCT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t FROM documents)
  )
  WHERE t[i] IN {trig_list}"""
    )


# ---------------------------------------------------------------------------
# Q58 — video frame sampling (operators/multimodal.sample_video_frames):
# the timestamp/partitioning plumbing of frame extraction — each video row
# explodes into its sampled frame timestamps (0, step, 2*step, ... <
# duration). Durations injected deterministically (10 ms per char) since
# the derived media table carries none.
# ---------------------------------------------------------------------------

_FRAME_STEP_MS = 500


def q58_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.multimodal import (
        media_from_documents,
        sample_video_frames,
    )

    docs = _docs(spark, sf_dir)
    media = media_from_documents(docs).withColumn(
        "duration_ms",
        F.when(
            F.col("kind") == "video", (F.col("media_id") % 100 + 1) * 100
        ).cast("long"),
    )
    return sample_video_frames(media, every_ms=_FRAME_STEP_MS).orderBy(
        "media_id", "frame_ts_ms"
    )


def _q58_sql() -> str:
    return f"""
WITH v AS (
  SELECT doc_id AS media_id, ((doc_id % 100 + 1) * 100)::bigint AS duration_ms
  FROM documents WHERE doc_id % 3 = 2
)
SELECT media_id, unnest(generate_series(0, duration_ms - 1, {_FRAME_STEP_MS}))::bigint
         AS frame_ts_ms
FROM v ORDER BY media_id, frame_ts_ms
"""


# ---------------------------------------------------------------------------
# Q53 — per-domain corpus stats + keep/drop curation decision
# (operators/urls.domain_stats). URLs synthesized deterministically from
# (source, doc_id) with case/port/tracking noise so the canonicalization
# inside domain_stats does real work; the oracle computes the canonical
# form from the generating formula directly (independent derivation, same
# answer).
# ---------------------------------------------------------------------------

_DOM_MIN_DOCS = 3
_DOM_MIN_MEAN_CHARS = 50.0


def q53_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.urls import domain_stats

    docs = _docs(spark, sf_dir)
    scheme = F.when(F.col("doc_id") % 2 == 0, F.lit("HTTPS://")).otherwise(
        F.lit("https://")
    )
    port = F.when(F.col("doc_id") % 3 == 0, F.lit(":443")).otherwise(F.lit(""))
    utm = F.when(F.col("doc_id") % 5 == 0, F.lit("?utm_source=x")).otherwise(
        F.lit("")
    )
    url = F.when(
        F.col("doc_id") % 499 == 0, F.lit("https://rare.example.com/only")
    ).otherwise(
        F.concat(
            scheme, F.col("source"), F.lit(".Example.com"), port,
            F.lit("/p/"), (F.col("doc_id") % 10).cast("string"), utm,
        )
    )
    injected = docs.select("doc_id", "n_chars", url.alias("url"))
    return domain_stats(
        injected,
        min_docs=_DOM_MIN_DOCS,
        min_mean_chars=_DOM_MIN_MEAN_CHARS,
    ).select(
        "host", "n_docs", "n_urls", "total_chars",
        _rz(F.col("mean_chars"), 6).alias("mean_chars"), "keep",
    ).orderBy("host")


def _q53_sql() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, n_chars,
         CASE WHEN doc_id % 499 = 0 THEN 'rare.example.com'
              ELSE source || '.example.com' END AS host,
         CASE WHEN doc_id % 499 = 0 THEN 'https://rare.example.com/only'
              ELSE 'https://' || source || '.example.com/p/'
                   || (doc_id % 10)::varchar END AS canon_url
  FROM documents
), per_url AS (
  SELECT host, canon_url, count(*) AS n_docs_url,
         sum(n_chars)::bigint AS chars_url
  FROM t GROUP BY host, canon_url
), agg AS (
  SELECT host, sum(n_docs_url)::bigint AS n_docs, count(*) AS n_urls,
         sum(chars_url)::bigint AS total_chars
  FROM per_url GROUP BY host
)
SELECT host, n_docs, n_urls, total_chars,
       (round(total_chars::double / n_docs, 6) + 0.0) AS mean_chars,
       (n_docs >= {_DOM_MIN_DOCS}
        AND total_chars::double / n_docs >= {_DOM_MIN_MEAN_CHARS}) AS keep
FROM agg ORDER BY host
"""


# ---------------------------------------------------------------------------
# Q54 — benchmark decontamination (operators/decontam.decontaminate): every
# 50th document plays the benchmark set; the whole corpus is checked for
# shared word 5-grams against it. Self-hits guarantee nonzero signal; any
# near-duplicate of a benchmark doc is flagged too — the eval-leak
# scenario the operator exists for.
# ---------------------------------------------------------------------------

_DECON_N = 5
_DECON_BENCH_MOD = 50


def q54_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.decontam import decontaminate

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % _DECON_BENCH_MOD == 0)
    return decontaminate(docs, bench, n=_DECON_N).select(
        "doc_id", "n_contaminated", "contaminated"
    ).orderBy("doc_id")


def _q54_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, {_SQL_WS_TOKS} AS toks FROM documents
), g AS (
  SELECT doc_id, {_sql_word_ngrams(_DECON_N)} AS grams FROM d
), bg AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g
  WHERE doc_id % {_DECON_BENCH_MOD} = 0
), dg AS (
  SELECT doc_id, unnest(list_distinct(grams)) AS gram FROM g
), hits AS (
  SELECT doc_id, count(*)::bigint AS n FROM dg JOIN bg USING (gram)
  GROUP BY doc_id
)
SELECT g.doc_id, coalesce(hits.n, 0)::bigint AS n_contaminated,
       coalesce(hits.n, 0) > 0 AS contaminated
FROM g LEFT JOIN hits USING (doc_id) ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q55 — deterministic hash-based train/val/test split
# (operators/sampling.hash_split): assignment is a salted md5 of the row
# identity, so it is reproducible across engines, partitionings, and
# corpus growth — unlike randomSplit, whose per-partition seed streams
# reassign rows whenever the input layout changes.
# ---------------------------------------------------------------------------


def q55_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.sampling import hash_split

    docs = _docs(spark, sf_dir)
    return hash_split(docs).select("doc_id", "split_bucket", "split").orderBy(
        "doc_id"
    )


def _q55_sql() -> str:
    bucket = f"{_sql_hex32(chr(39) + 'split:' + chr(39) + ' || doc_id::varchar')} % 1000000"
    return f"""
WITH b AS (
  SELECT doc_id, ({bucket})::bigint AS split_bucket FROM documents
)
SELECT doc_id, split_bucket,
       CASE WHEN split_bucket < 900000 THEN 'train'
            WHEN split_bucket < 950000 THEN 'val'
            ELSE 'test' END AS split
FROM b ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q59 — source-mixture sampling (operators/sampling.mixture_sample): each
# source keeps its own deterministic fraction — corpus mixing weights as
# one map-only hash filter, no join, no shuffle.
# ---------------------------------------------------------------------------

_MIX_FRACTIONS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
_MIX_DEFAULT = 0.05


def q59_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.sampling import mixture_sample

    docs = _docs(spark, sf_dir)
    return mixture_sample(
        docs,
        group_col="source",
        fractions=_MIX_FRACTIONS,
        default_fraction=_MIX_DEFAULT,
    ).select("doc_id", "source").orderBy("doc_id")


def _q59_sql() -> str:
    cases = " ".join(
        f"WHEN '{g}' THEN {int(round(f * 1_000_000))}"
        for g, f in sorted(_MIX_FRACTIONS.items())
    )
    bucket = _sql_hex32(chr(39) + "mixture:" + chr(39) + " || doc_id::varchar")
    return f"""
SELECT doc_id, source
FROM documents
WHERE ({bucket}) % 1000000
      < CASE source {cases} ELSE {int(round(_MIX_DEFAULT * 1_000_000))} END
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q60 — count-min sketch frequency estimates vs exact counts
# (operators/textstats.countmin_sketch / countmin_estimate): the
# deterministic counter sketch joining KMV (q50) in the sketch family.
# Every counter is md5-derived, so the full sketch AND every estimate are
# value-reproducible in SQL. exact_count rides along so the gate also
# pins the overestimate bound behavior on real data.
# ---------------------------------------------------------------------------

_CMS_W = 256
_CMS_D = 4


def q60_countmin_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import (
        _tokens,
        countmin_estimate,
        countmin_sketch,
    )

    docs = _docs(spark, sf_dir)
    # checkpoint: the token stream feeds three consumers (sketch, probe
    # set, exact counts) — uncached, each would re-run the scan + explode
    toks = docs.select(
        F.explode(_tokens("text")).alias("tok")
    ).localCheckpoint(eager=True)
    sketch = countmin_sketch(toks, "tok", width=_CMS_W, depth=_CMS_D)
    probes = toks.distinct()
    est = countmin_estimate(
        sketch, probes, "tok", width=_CMS_W, depth=_CMS_D
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_count"))
    return est.join(exact, "tok").select(
        "tok", "est_count", "exact_count"
    ).orderBy("tok")


def _q60_sql() -> str:
    h = _sql_hex32("'cms:' || i::varchar || ':' || tok")
    return f"""
WITH toks AS (
  SELECT unnest({_SQL_WS_TOKS}) AS tok FROM documents
), cells AS (
  SELECT tok, i, ({h}) % {_CMS_W} AS bucket
  FROM toks, range(0, {_CMS_D}) r(i)
), sketch AS (
  SELECT i, bucket, count(*)::bigint AS cnt FROM cells GROUP BY i, bucket
), probes AS (
  SELECT DISTINCT tok FROM toks
), pcells AS (
  SELECT tok, i, ({h}) % {_CMS_W} AS bucket
  FROM probes, range(0, {_CMS_D}) r(i)
), est AS (
  SELECT tok, min(coalesce(cnt, 0))::bigint AS est_count
  FROM pcells LEFT JOIN sketch USING (i, bucket) GROUP BY tok
), exact AS (
  SELECT tok, count(*)::bigint AS exact_count FROM toks GROUP BY tok
)
SELECT tok, est_count, exact_count
FROM est JOIN exact USING (tok) ORDER BY tok
"""


# ---------------------------------------------------------------------------
# Q61 — Bloom-filter membership verdicts (operators/bloom.py): the filter
# is built over a selective orders subset and probed with every distinct
# lineitem orderkey; the oracle rebuilds the IDENTICAL bit words with
# DuckDB bit_or (bit 63 via the two's-complement constant — DuckDB raises
# on 1::bigint << 63), so the bloom's bit arithmetic itself is
# value-checked, false positives included. actually_present rides along,
# pinning no-false-negatives on real data (member false ⇒ present false).
# ---------------------------------------------------------------------------

_BLOOM_M = 4096
_BLOOM_K = 4
_BLOOM_SEL_MOD = 37


def q61_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.bloom import (
        bloom_build,
        bloom_member,
        bloom_words_literal,
    )

    orders = spark.read.parquet(_t(sf_dir, "orders"))
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    small = orders.filter(
        F.col("o_orderkey") % _BLOOM_SEL_MOD == 0
    ).select(F.col("o_orderkey").alias("key")).distinct()
    words = bloom_words_literal(
        bloom_build(small, "key", m_bits=_BLOOM_M, k=_BLOOM_K),
        m_bits=_BLOOM_M,
    )
    probes = li.select(F.col("l_orderkey").alias("orderkey")).distinct()
    present = small.withColumnRenamed("key", "orderkey").withColumn(
        "actually_present", F.lit(True)
    )
    return (
        probes.withColumn(
            "bloom_member",
            bloom_member(
                F.col("orderkey"), words, m_bits=_BLOOM_M, k=_BLOOM_K
            ),
        )
        .join(present, "orderkey", "left")
        .select(
            "orderkey",
            "bloom_member",
            F.coalesce("actually_present", F.lit(False)).alias(
                "actually_present"
            ),
        )
        .orderBy("orderkey")
    )


def _q61_sql() -> str:
    pos = _sql_hex32("'bloom:' || i::varchar || ':' || key::varchar")
    ppos = _sql_hex32("'bloom:' || i::varchar || ':' || orderkey::varchar")
    bitval = (
        "CASE WHEN {p} % 64 = 63 THEN -9223372036854775808 "
        "ELSE (1::bigint << ({p} % 64)::int) END"
    )
    return f"""
WITH sk AS (
  SELECT DISTINCT o_orderkey AS key FROM orders
  WHERE o_orderkey % {_BLOOM_SEL_MOD} = 0
), kb AS (
  SELECT key, i, ({pos}) % {_BLOOM_M} AS p
  FROM sk, range(0, {_BLOOM_K}) r(i)
), words AS (
  SELECT (p // 64) AS word_idx,
         bit_or({bitval.format(p='p')}) AS word
  FROM kb GROUP BY (p // 64)
), probes AS (
  SELECT DISTINCT l_orderkey AS orderkey FROM lineitem
), pb AS (
  SELECT orderkey, i, ({ppos}) % {_BLOOM_M} AS p
  FROM probes, range(0, {_BLOOM_K}) r(i)
), verdicts AS (
  SELECT pb.orderkey,
         bool_and((coalesce(w.word, 0) & ({bitval.format(p='pb.p')})) <> 0)
           AS bloom_member
  FROM pb LEFT JOIN words w ON (pb.p // 64) = w.word_idx
  GROUP BY pb.orderkey
)
SELECT v.orderkey, v.bloom_member,
       (sk.key IS NOT NULL) AS actually_present
FROM verdicts v LEFT JOIN sk ON v.orderkey = sk.key
ORDER BY v.orderkey
"""


# ---------------------------------------------------------------------------
# Q62 — distributed BPE merge training (operators/bpe.py): learn the top-N
# byte-pair merges of the corpus vocabulary. Deterministic throughout
# (ties break count DESC, pair ASC), so the oracle replays every round as
# unrolled DuckDB CTEs — the q36 Lloyd / q51 PageRank trick applied to
# tokenizer training. The merge application is a fold on both engines:
# Spark F.aggregate over the symbol array, DuckDB list_reduce over a
# separator-joined string (chr(31) never occurs in the [a-z0-9]+ tokens).
# ---------------------------------------------------------------------------

_BPE_MERGES = 6
_BPE_SEP = chr(31)


def q62_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.bpe import bpe_train
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    words = (
        docs.select(F.explode(_tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return bpe_train(words, n_merges=_BPE_MERGES).orderBy("round")


def _sql_bpe_ctes() -> list:
    """The unrolled BPE-training CTE chain (w0..w{_BPE_MERGES}, with the
    per-round pair counts p{r} and argmax b{r}) shared by q62 (which
    reads the b{r} merge rows) and q73 (which reads the final vocabulary
    w{_BPE_MERGES} — the encoded form). w{r+1} LEFT JOINs the 1-row
    argmax ON TRUE so a pair-less round (empty b{r}) degrades to an
    identity fold — the NULL merge pair never fires the CASE — matching
    bpe_train's early break, instead of cross-joining the vocabulary to
    zero rows."""
    sep = _BPE_SEP

    def fold(best: str) -> str:
        return (
            f"list_reduce(s, (acc, x) -> CASE WHEN "
            f"regexp_extract(acc, '([^{sep}]*)$', 1) = {best}.a "
            f"AND x = {best}.b THEN "
            f"regexp_replace(acc, '[^{sep}]*$', {best}.a || {best}.b) "
            f"ELSE acc || chr(31) || x END)"
        )

    ctes = [
        f"""w0 AS (
  SELECT w, count(*)::bigint AS n,
         list_transform(generate_series(1, length(w)), i -> substr(w, i, 1)) AS s
  FROM (SELECT unnest({_SQL_WS_TOKS}) AS w FROM documents)
  GROUP BY w
)"""
    ]
    for r in range(_BPE_MERGES):
        ctes.append(
            f"""p{r} AS (
  SELECT n, s, unnest(generate_series(1, len(s) - 1)) AS i FROM w{r}
), b{r} AS (
  SELECT s[i] AS a, s[i+1] AS b, sum(n)::bigint AS cnt
  FROM p{r} GROUP BY s[i], s[i+1] ORDER BY cnt DESC, a, b LIMIT 1
), w{r + 1} AS (
  SELECT w, n, string_split({fold(f'b{r}')}, chr(31)) AS s
  FROM w{r} LEFT JOIN b{r} ON TRUE
)"""
        )
    return ctes


def _q62_sql() -> str:
    ctes = _sql_bpe_ctes()
    unions = "\nUNION ALL\n".join(
        f"SELECT {r}::int AS round, a, b, a || b AS merged, cnt FROM b{r}"
        for r in range(_BPE_MERGES)
    )
    return "WITH " + ",\n".join(ctes) + f"\n{unions}\nORDER BY round"


# ---------------------------------------------------------------------------
# Q63 — BM25 top-k retrieval (operators/retrieval.py): Okapi BM25 over the
# whitespace-token inverted index; queries are derived deterministically
# from the corpus (every 50th document's first three first-occurrence
# tokens). Scoring constants are computed ONCE in Python and inlined as
# identical literals on both engines; per-(query, doc) scores fold in term
# order (q44's discipline), so the ranking — computed on the unrounded
# fold with a doc_id tie-break — is bit-reproducible.
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_K = 10
_BM25_QMOD = 50
_BM25_QLEN = 3


def q63_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.retrieval import bm25_topk
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", _tokens("text").alias("ts"))
    qsrc = (
        toks.filter(F.col("doc_id") % _BM25_QMOD == 0)
        .select(
            F.col("doc_id").alias("qid"),
            F.posexplode("ts").alias("pos", "term"),
        )
        .groupBy("qid", "term")
        .agg(F.min("pos").alias("mp"))
    )
    qw = Window.partitionBy("qid").orderBy("mp", "term")
    qterms = (
        qsrc.withColumn("rn", F.row_number().over(qw))
        .filter(F.col("rn") <= _BM25_QLEN)
        .select("qid", "term")
    )
    out = bm25_topk(
        toks, qterms, F.col("ts"), k1=_BM25_K1, b=_BM25_B, k=_BM25_K
    )
    return out.select(
        "qid",
        "rank",
        "doc_id",
        (F.round("score", 6) + F.lit(0.0)).alias("score"),
    ).orderBy("qid", "rank")


def _sql_bm25_chain() -> str:
    """CTE chain through `ranked` (BM25 scoring + per-query ranking) —
    shared by the q63 top-k oracle and the q126 retrieval-eval oracle."""
    k1p1 = _BM25_K1 + 1.0
    omb = 1.0 - _BM25_B
    return f"""
WITH tl AS (
  SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents
), dl AS (
  SELECT doc_id, len(ts)::bigint AS dl FROM tl
), stats AS (
  SELECT count(*)::bigint AS n_docs, sum(dl)::double / count(*) AS avgdl
  FROM dl
), toks AS (
  SELECT doc_id, i::bigint AS pos, ts[i] AS term
  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i FROM tl)
), postings AS (
  SELECT doc_id, term, count(*)::bigint AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*)::bigint AS df FROM postings GROUP BY term
), qt0 AS (
  SELECT doc_id AS qid, term, min(pos) AS mp
  FROM toks WHERE doc_id % {_BM25_QMOD} = 0 GROUP BY doc_id, term
), qterms AS (
  SELECT qid, term FROM (
    SELECT qid, term,
           row_number() OVER (PARTITION BY qid ORDER BY mp, term) AS rn
    FROM qt0
  ) WHERE rn <= {_BM25_QLEN}
), scored AS (
  SELECT q.qid, p.doc_id, q.term,
         ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (p.tf * {k1p1!r})
           / (p.tf + {_BM25_K1!r} * ({omb!r} + {_BM25_B!r} * l.dl / s.avgdl))
           AS sc
  FROM qterms q
  JOIN postings p USING (term)
  JOIN dfreq d USING (term)
  JOIN dl l ON l.doc_id = p.doc_id, stats s
), folded AS (
  SELECT qid, doc_id, list_sum(list(sc ORDER BY term)) AS score
  FROM scored GROUP BY qid, doc_id
), ranked AS (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)
           AS "rank"
  FROM folded
)"""


def _q63_sql() -> str:
    return _sql_bm25_chain() + f"""
SELECT qid, "rank", doc_id, round(score, 6) + 0.0 AS score
FROM ranked WHERE "rank" <= {_BM25_K} ORDER BY qid, "rank"
"""


# ---------------------------------------------------------------------------
# Q64 — PMI collocations (operators/textstats.py pmi_pairs): token pairs
# co-occurring at the document level more than chance, pmi =
# ln(N*c_xy / (c_x*c_y)) from pure integer counts (the ln of the same
# rational is bit-identical cross-engine, so the top-50 cut on the
# unrounded value agrees). Per-doc participation capped to the first 20
# first-occurrence tokens — the bound that keeps the pair fan-out linear
# in corpus size.
# ---------------------------------------------------------------------------

_PMI_CAP = 20
_PMI_MINP = 5
_PMI_TOPK = 50


def q64_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import pmi_pairs

    docs = _docs(spark, sf_dir)
    out = pmi_pairs(docs, cap=_PMI_CAP, min_pairs=_PMI_MINP)
    return (
        out.orderBy(F.desc("pmi"), "x", "y")
        .limit(_PMI_TOPK)
        .select("x", "y", "c_xy", (F.round("pmi", 6) + F.lit(0.0)).alias("pmi"))
    )


def _q64_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, i::bigint AS pos, ts[i] AS term
  FROM (
    SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i
    FROM (SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents)
  )
), mp AS (
  SELECT doc_id, term, min(pos) AS mp FROM toks GROUP BY doc_id, term
), capped AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, term,
           row_number() OVER (PARTITION BY doc_id ORDER BY mp, term) AS rn
    FROM mp
  ) WHERE rn <= {_PMI_CAP}
), nd AS (
  SELECT count(*)::bigint AS n FROM documents
), cx AS (
  SELECT term, count(*)::bigint AS c FROM capped GROUP BY term
), cxy AS (
  SELECT a.term AS x, b.term AS y, count(*)::bigint AS c_xy
  FROM capped a JOIN capped b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
  HAVING count(*) >= {_PMI_MINP}
), scored AS (
  SELECT x, y, c_xy,
         ln((c_xy * nd.n)::double / (cx1.c * cx2.c)) AS pmi
  FROM cxy
  JOIN cx cx1 ON cxy.x = cx1.term
  JOIN cx cx2 ON cxy.y = cx2.term
  CROSS JOIN nd
)
SELECT x, y, c_xy, round(pmi, 6) + 0.0 AS pmi
FROM scored ORDER BY pmi DESC, x, y LIMIT {_PMI_TOPK}
"""


# ---------------------------------------------------------------------------
# Q65 — exact set-similarity self-join (operators/retrieval.py
# setsim_join_exact): AllPairs/PPJoin prefix filtering — each doc joins
# only on its |s|-ceil(t|s|)+1 RAREST tokens, then exact Jaccard verify.
# The oracle is deliberately a DIFFERENT algorithm (brute-force all-pairs
# Jaccard), so a green row proves the prefix filter is lossless on real
# data, not merely replayed. Threshold 0.5 is exactly representable, so
# ceil(t*L) and the >= t cut cannot diverge on float edges.
# ---------------------------------------------------------------------------

_SETSIM_T = 0.5


def q65_setsim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.retrieval import setsim_join_exact
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    pairs = setsim_join_exact(docs, _tokens("text"), threshold=_SETSIM_T)
    # per-endpoint aggregate rather than the raw pair list: on similarity-
    # dense corpora the TRUE result is quadratic (sf0.1's template docs
    # produce ~9M pairs — nothing any engine should ship through a value
    # gate), and a lost/extra/mis-scored pair still perturbs its
    # endpoint's count and integer jaccard sum, so the brute-force oracle
    # still certifies prefix-filter losslessness pair-for-pair. The sum is
    # an exact INTEGER sum of round(jacc * 1e6) — never a float sum across
    # shuffled rows.
    jfp = F.round(F.col("jacc") * 1e6).cast("long")
    return (
        pairs.groupBy("a")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.max("jacc").alias("max_jacc"),
            F.sum(jfp).alias("sum_jacc_fp"),
        )
        .orderBy("a")
    )


def _q65_sql() -> str:
    return f"""
WITH s AS (
  SELECT doc_id, ts FROM (
    SELECT doc_id, list_distinct({_SQL_WS_TOKS}) AS ts FROM documents
  ) WHERE len(ts) > 0
), pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_intersect(a.ts, b.ts))::bigint AS inter,
         (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)))::bigint
           AS uni
  FROM s a JOIN s b ON a.doc_id < b.doc_id
)
, sim AS (
  SELECT a, b, round(inter::double / uni, 6) + 0.0 AS jacc
  FROM pairs WHERE inter::double / uni >= {_SETSIM_T!r}
)
SELECT a, count(*)::bigint AS n_pairs,
       (max(jacc) + 0.0) AS max_jacc,
       sum(round(jacc * 1e6)::bigint)::bigint AS sum_jacc_fp
FROM sim GROUP BY a ORDER BY a
"""


# ---------------------------------------------------------------------------
# Q66 — fuzzy vocabulary pairs (operators/linking.py fuzzy_join): edit-
# distance self-join of the corpus vocabulary with Ed-Join q-gram prefix
# blocking (rarest q*d+1 grams as join keys; both-short strings fall back
# to length bands). The oracle is brute force WITHOUT blocking, so a
# green row proves the blocking drops no pair. Integer distances —
# nothing to round.
# ---------------------------------------------------------------------------

_FUZZ_D = 2
_FUZZ_MINLEN = 3


def q66_fuzzy_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.linking import fuzzy_vocab_pairs
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    return fuzzy_vocab_pairs(
        docs, _tokens("text"), max_dist=_FUZZ_D, min_len=_FUZZ_MINLEN
    ).orderBy("a", "b")


def _q66_sql() -> str:
    return f"""
WITH v AS (
  SELECT DISTINCT tok FROM (
    SELECT unnest({_SQL_WS_TOKS}) AS tok FROM documents
  ) WHERE length(tok) >= {_FUZZ_MINLEN}
)
SELECT a.tok AS a, b.tok AS b, levenshtein(a.tok, b.tok) AS dist
FROM v a JOIN v b ON a.tok < b.tok
WHERE levenshtein(a.tok, b.tok) <= {_FUZZ_D}
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# Q67 — triangle counting (operators/graph.py triangle_count) on the
# co-purchase graph (parts sharing an order). Spark runs the degree-
# ordered-orientation algorithm (wedge fan-out bounded by oriented
# out-degree — the power-law-safe form); the oracle recounts with an
# INDEPENDENT id-ordered enumeration, so agreement checks the algorithm,
# not a replay. All-integer — hash-exact by construction.
# ---------------------------------------------------------------------------


def q67_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import triangle_count

    li = (
        spark.read.parquet(_t(sf_dir, "lineitem"))
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    edges = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )
    return triangle_count(edges).orderBy("node")


def _q67_sql() -> str:
    return """
WITH lp AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), e AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p
), tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
), nodes AS (
  SELECT unnest([x, y, z]) AS node FROM tri
)
SELECT node, count(*)::bigint AS n_tri FROM nodes GROUP BY node ORDER BY node
"""


# ---------------------------------------------------------------------------
# Q68 — HyperLogLog distinct-count sketch (operators/textstats.py
# hll_registers/hll_estimate): md5-derived registers, dyadic-exact 2^-reg
# harmonic sum (every term a power-of-two double, so the sum is
# order-independent and bit-exact), linear-counting small-range
# correction. The gate emits all 64 registers PLUS the estimate and the
# exact distinct count, so the register maxes, the correction branch, and
# the final value are all hash-checked.
# ---------------------------------------------------------------------------

_HLL_M = 64


def q68_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import (
        _tokens,
        hll_estimate,
        hll_registers,
    )

    docs = _docs(spark, sf_dir)
    # checkpoint: read twice (registers + the exact-count comparison)
    toks = docs.select(
        F.explode(_tokens("text")).alias("tok")
    ).localCheckpoint(eager=True)
    regs = hll_registers(toks, "tok", m=_HLL_M)
    est = hll_estimate(regs, m=_HLL_M)
    exact = toks.agg(F.countDistinct("tok").cast("long").alias("n_exact"))
    return (
        regs.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(exact))
        .select(
            "j",
            "reg",
            (F.round("est", 6) + F.lit(0.0)).alias("est"),
            "n_exact",
        )
        .orderBy("j")
    )


def _q68_sql() -> str:
    m = _HLL_M
    tail = 32 - (m.bit_length() - 1)
    alpha_m2 = (0.7213 / (1.0 + 1.079 / m)) * m * m
    return f"""
WITH toks AS (
  SELECT unnest({_SQL_WS_TOKS}) AS tok FROM documents
), hs AS (
  SELECT {_sql_hex32("'hll:' || tok")} AS h FROM toks
), r0 AS (
  SELECT h % {m} AS j, h // {m} AS w FROM hs
), rho AS (
  SELECT j, CASE WHEN w = 0 THEN {tail + 1}
                 ELSE {tail + 1} - length(bin(w)) END AS rho
  FROM r0
), regs AS (
  SELECT g.j, coalesce(max(rho), 0)::bigint AS reg
  FROM range(0, {m}) g(j) LEFT JOIN rho ON rho.j = g.j GROUP BY g.j
), agg AS (
  SELECT sum(1.0 / (1::bigint << reg)) AS s,
         sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)::bigint AS n_zero
  FROM regs
), est AS (
  SELECT CASE WHEN ({alpha_m2!r} / s) <= {2.5 * m!r} AND n_zero > 0
              THEN {float(m)!r} * ln({float(m)!r} / n_zero)
              ELSE {alpha_m2!r} / s END AS est
  FROM agg
), ex AS (
  SELECT count(DISTINCT tok)::bigint AS n_exact FROM toks
)
SELECT regs.j, regs.reg, round(est.est, 6) + 0.0 AS est, ex.n_exact
FROM regs, est, ex ORDER BY j
"""


# ---------------------------------------------------------------------------
# Q69 — within-doc repeated-n-gram stripping (operators/textstats.py
# strip_repeated_ngrams): tokens starting an n-gram already seen earlier
# in the document are dropped, first occurrence kept. The gate runs on
# text doubled (`text || ' ' || text`) so every document exercises heavy
# repetition — the cleaned text's md5 and the drop count are both
# hash-checked, so the keep/drop decision at every position must agree.
# ---------------------------------------------------------------------------


def q69_strip_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import strip_repeated_ngrams

    docs = _docs(spark, sf_dir).withColumn(
        "dbl", F.concat(F.col("text"), F.lit(" "), F.col("text"))
    )
    out = strip_repeated_ngrams(docs, "dbl", n=3)
    return out.select(
        "doc_id", F.md5("clean_text").alias("clean_md5"), "n_dropped"
    ).orderBy("doc_id")


def _q69_sql() -> str:
    dbl_toks = (
        "list_filter(string_split_regex(lower(text || ' ' || text), "
        "'\\s+'), x -> x <> '')"
    )
    return f"""
WITH t AS (
  SELECT doc_id, {dbl_toks} AS ts FROM documents
), g AS (
  SELECT doc_id, ts,
         CASE WHEN len(ts) >= 3 THEN
           list_transform(generate_series(1, len(ts) - 2),
                          i -> array_to_string(ts[i:i+2], ' '))
         ELSE []::varchar[] END AS grams
  FROM t
), k AS (
  SELECT doc_id, ts,
         list_filter(generate_series(1, len(ts)),
                     i -> (i > len(grams))
                          OR (list_position(grams, grams[i]) = i)) AS kept
  FROM g
)
SELECT doc_id,
       md5(array_to_string(list_transform(kept, i -> ts[i]), ' '))
         AS clean_md5,
       (len(ts) - len(kept))::bigint AS n_dropped
FROM k ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q70 — weighted sampling without replacement (operators/sampling.py
# weighted_sample, Efraimidis-Spirakis A-ES): rank by ln(u)/w with u an
# md5-derived dyadic uniform, take the global top-k. Deterministic and
# partitioning-invariant like the module's hash splits; Spark plans the
# sort-limit as TakeOrderedAndProject (per-partition heaps, no global
# sort). The oracle replays the exact rank-key arithmetic.
# ---------------------------------------------------------------------------

_WS_K = 100


def q70_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.sampling import weighted_sample

    docs = _docs(spark, sf_dir)
    out = weighted_sample(docs, "doc_id", "n_chars", _WS_K)
    return out.select(
        "doc_id", "n_chars", (F.round("skey", 6) + F.lit(0.0)).alias("skey")
    ).orderBy("doc_id")


def _q70_sql() -> str:
    h = _sql_hex32("'wsample:' || doc_id::varchar")
    return f"""
WITH w AS (
  SELECT doc_id, n_chars, {h} AS h
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
), keyed AS (
  SELECT doc_id, n_chars,
         ln((h + 1)::double / 4294967296.0) / n_chars::double AS skey
  FROM w
), top AS (
  SELECT doc_id, n_chars, skey FROM keyed
  ORDER BY skey DESC, doc_id LIMIT {_WS_K}
)
SELECT doc_id, n_chars, round(skey, 6) + 0.0 AS skey FROM top
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q71 — per-language exact token-count percentiles (operators/textstats.py
# grouped_value_percentiles): q45's value-histogram + inverted-CDF method
# grouped by lang — the windows still order only each group's DISTINCT
# values, so state stays domain-sized at any corpus size. Integer ranks,
# integer answers; nothing to round.
# ---------------------------------------------------------------------------


def q71_lang_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import (
        _tokens,
        grouped_value_percentiles,
    )

    docs = _docs(spark, sf_dir).select(
        "lang", F.size(_tokens("text")).cast("long").alias("n_toks")
    )
    return grouped_value_percentiles(
        docs, "lang", "n_toks", qs=(0.5, 0.9, 0.99)
    ).orderBy("lang")


def _q71_sql() -> str:
    def pick(q):
        return (
            f"min(CASE WHEN cum >= floor((n - 1) * {q!r}) + 1 THEN v END)"
        )

    return f"""
WITH c AS (
  SELECT lang, len({_SQL_WS_TOKS})::bigint AS v FROM documents
), h AS (
  SELECT lang, v, count(*)::bigint AS cnt FROM c GROUP BY lang, v
), cum AS (
  SELECT lang, v, sum(cnt) OVER (PARTITION BY lang ORDER BY v) AS cum
  FROM h
), t AS (
  SELECT lang, v, cum, max(cum) OVER (PARTITION BY lang) AS n FROM cum
)
SELECT lang,
       {pick(0.5)} AS p50,
       {pick(0.9)} AS p90,
       {pick(0.99)} AS p99
FROM t GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Q72 — label-propagation communities (operators/graph.py
# label_propagation) over the min-support-2 co-purchase graph (sparse:
# pairs must share >= 2 orders). Deterministic synchronous update (mode
# of neighbor labels, ties -> smallest), so the oracle unrolls the three
# rounds as CTEs with a row_number argmax — the q36/q51/q62 pattern.
# All-integer.
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3
_LPA_MINSUP = 2


def q72_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import label_propagation

    li = (
        spark.read.parquet(_t(sf_dir, "lineitem"))
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    edges = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= _LPA_MINSUP)
        .select("src", "dst")
    )
    return label_propagation(edges, iterations=_LPA_ROUNDS).orderBy("node")


def _q72_sql() -> str:
    ctes = [
        """lp AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), e AS (
  SELECT a.p AS u, b.p AS v
  FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING count(*) >= %d
), adj AS (
  SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e
), l0 AS (
  SELECT DISTINCT node, node AS label FROM adj
)"""
        % _LPA_MINSUP
    ]
    for r in range(_LPA_ROUNDS):
        ctes.append(
            f"""c{r} AS (
  SELECT a.node, l.label, count(*) AS cnt
  FROM adj a JOIN l{r} l ON l.node = a.nbr GROUP BY a.node, l.label
), l{r + 1} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label)
             AS rn
    FROM c{r}
  ) WHERE rn = 1
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, label FROM l{_LPA_ROUNDS} ORDER BY node"
    )


def _sql_lpa_ctes() -> list[str]:
    """The q72 CTE chain (edge derivation + unrolled LPA rounds) as a
    reusable list — shared with the q133 modularity oracle."""
    ctes = [
        """lp AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), e AS (
  SELECT a.p AS u, b.p AS v
  FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING count(*) >= %d
), adj AS (
  SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e
), l0 AS (
  SELECT DISTINCT node, node AS label FROM adj
)"""
        % _LPA_MINSUP
    ]
    for r in range(_LPA_ROUNDS):
        ctes.append(
            f"""c{r} AS (
  SELECT a.node, l.label, count(*) AS cnt
  FROM adj a JOIN l{r} l ON l.node = a.nbr GROUP BY a.node, l.label
), l{r + 1} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label)
             AS rn
    FROM c{r}
  ) WHERE rn = 1
)"""
        )
    return ctes


# ---------------------------------------------------------------------------
# Q73 — BPE encoding (operators/bpe.py bpe_encode): apply q62's learned
# merge table to the corpus vocabulary and report the resulting token
# frequency histogram — the end-to-end tokenizer loop (train -> encode ->
# count). The oracle shares q62's unrolled training CTEs and reads the
# FINAL vocabulary w{_BPE_MERGES}, whose symbol arrays are exactly the
# encoded form — so Spark's re-application of the collected merge list via
# the F.aggregate fold must reproduce DuckDB's training-side fold
# bit-for-bit on every word.
# ---------------------------------------------------------------------------


def q73_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.bpe import bpe_encode, bpe_train
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    # checkpoint the vocabulary: it is read twice (training, which
    # re-checkpoints internally, and the encode below) and the corpus
    # explode+groupBy should not run twice
    words = (
        docs.select(F.explode(_tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    merges = [
        (r["a"], r["b"])
        for r in bpe_train(words, n_merges=_BPE_MERGES)
        .orderBy("round")
        .collect()
    ]
    enc = words.select(
        "n", F.explode(bpe_encode("w", merges)).alias("token")
    )
    return (
        enc.groupBy("token")
        .agg(F.sum("n").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), "token")
    )


def _q73_sql() -> str:
    ctes = _sql_bpe_ctes()
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT t AS token, sum(n)::bigint AS freq
FROM (SELECT n, unnest(s) AS t FROM w{_BPE_MERGES})
GROUP BY t ORDER BY freq DESC, token
"""
    )


# ---------------------------------------------------------------------------
# Q74 — k-core decomposition (operators/graph.py kcore) of the q72
# co-purchase graph: fixed-round peeling (drop nodes with degree < k,
# repeat), each round one degree aggregate + two left-semi joins.
# Deterministic at a fixed round count, so the oracle unrolls the rounds
# as CTEs — the iterative-algorithm discipline (q36/q51/q62/q72). The
# pytest side asserts the fixed-round result has CONVERGED on this graph
# (an extra round changes nothing), so the gate row is the true k-core.
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 3


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q72/q74 input graph: parts co-purchased in >= _LPA_MINSUP
    distinct orders (distinct int keys BEFORE the self-join keeps the
    shuffle narrow; min-support keeps the graph sparse)."""
    li = (
        spark.read.parquet(_t(sf_dir, "lineitem"))
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    return (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= _LPA_MINSUP)
        .select("src", "dst")
    )


_SQL_COPURCHASE = f"""lp AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), e0 AS (
  SELECT a.p AS u, b.p AS v
  FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING count(*) >= {_LPA_MINSUP}
)"""


def q74_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import kcore

    edges = _copurchase_edges(spark, sf_dir)
    return kcore(
        edges, k=_KCORE_K, rounds=_KCORE_ROUNDS
    ).orderBy("node")


def _q74_sql() -> str:
    ctes = [_SQL_COPURCHASE]
    for r in range(_KCORE_ROUNDS):
        ctes.append(
            f"""d{r} AS (
  SELECT node, count(*)::bigint AS deg FROM (
    SELECT u AS node FROM e{r} UNION ALL SELECT v FROM e{r}
  ) GROUP BY node
), k{r} AS (
  SELECT node FROM d{r} WHERE deg >= {_KCORE_K}
), e{r + 1} AS (
  SELECT u, v FROM e{r}
  WHERE u IN (SELECT node FROM k{r}) AND v IN (SELECT node FROM k{r})
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node, count(*)::bigint AS deg FROM (
  SELECT u AS node FROM e{_KCORE_ROUNDS}
  UNION ALL SELECT v FROM e{_KCORE_ROUNDS}
) GROUP BY node ORDER BY node
"""
    )


# ---------------------------------------------------------------------------
# Q75 — cross-document duplicated-span statistics (operators/dedup.py
# duplicated_ngram_spans, ExactSubstr-lite): per doc, how many n-gram
# starts are shared with at least one OTHER document, and how many token
# positions those spans cover (interval union via a (doc, position)
# distinct). The gate runs at n=5 on the raw corpus — the generator's
# shared boilerplate sentences make real cross-doc duplicates at every
# scale. All counts integer.
# ---------------------------------------------------------------------------

_SPAN_N = 5


def q75_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.dedup import duplicated_ngram_spans

    return duplicated_ngram_spans(
        _docs(spark, sf_dir), n=_SPAN_N
    ).orderBy("doc_id")


def _q75_sql() -> str:
    n = _SPAN_N
    return f"""
WITH t AS (
  SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents
), s AS (
  SELECT doc_id, ts,
         unnest(CASE WHEN len(ts) >= {n}
                THEN generate_series(1, len(ts) - {n - 1})
                ELSE []::bigint[] END) AS i
  FROM t
), g AS (
  SELECT doc_id, i, array_to_string(ts[i:i+{n - 1}], ' ') AS gram FROM s
), dg AS (
  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), d AS (
  SELECT g.doc_id, g.i FROM g JOIN dg USING (gram)
), ns AS (
  SELECT doc_id, count(*)::bigint AS n_dup_starts FROM d GROUP BY doc_id
), cov AS (
  SELECT doc_id, count(DISTINCT p)::bigint AS n_dup_tokens FROM (
    SELECT doc_id, unnest(generate_series(i, i + {n - 1})) AS p FROM d
  ) GROUP BY doc_id
)
SELECT t.doc_id, len(ts)::bigint AS n_toks,
       coalesce(n_dup_starts, 0)::bigint AS n_dup_starts,
       coalesce(n_dup_tokens, 0)::bigint AS n_dup_tokens
FROM t LEFT JOIN ns USING (doc_id) LEFT JOIN cov USING (doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q76 — cohort retention (classic web analytics over the events stream):
# each user's cohort is their first active DAY; the retention matrix
# counts distinct users per (cohort_day, day_offset). One user-keyed
# aggregate for the cohort, one join back, one combiner-friendly count
# agg — and the (user, day) distinct collapses the event stream to
# user-days FIRST, so the join input is bounded by users x active days,
# not raw events. DATE-typed throughout (the q49 DATE-vs-TIMESTAMP trunc
# trap), integer offsets and counts.
# ---------------------------------------------------------------------------


def q76_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        spark.read.parquet(_t(sf_dir, "events"))
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("d", "cohort_day").cast("int").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def _q76_sql() -> str:
    return """
WITH d AS (
  SELECT DISTINCT user_id, ts::date AS d FROM events
), f AS (
  SELECT user_id, min(d) AS cohort_day FROM d GROUP BY user_id
)
SELECT cohort_day,
       date_diff('day', cohort_day, d)::int AS day_offset,
       count(DISTINCT user_id)::bigint AS n_users
FROM d JOIN f USING (user_id)
GROUP BY cohort_day, day_offset
ORDER BY cohort_day, day_offset
"""


# ---------------------------------------------------------------------------
# Q77 — model-based quality filtering: a logistic classifier over the
# quality-feature signals with literal weights (the GPT-3/CCNet-style
# curation stage — one calibrated score instead of a threshold stack).
# Map-only column expressions end-to-end; the decision boundary compares the
# ROUNDED logit so it cannot flip on a last-ulp cross-engine difference.
# ---------------------------------------------------------------------------


def q77_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import quality_logit

    docs = _docs(spark, sf_dir)
    return (
        quality_logit(docs)
        .select("doc_id", "n_tokens", "logit", "quality_prob", "keep_doc")
        .orderBy("doc_id")
    )


def _q77_sql() -> str:
    from pathhier_spark.operators.textstats import QUALITY_LOGIT_WEIGHTS as W

    # identical left-to-right sum as the Spark expression; features are
    # ratios of integers (bit-exact doubles), so only exp() can differ and
    # it sits under the same round-6 every other float oracle uses
    logit = (
        f"round({W['bias']} + {W['len_cap']} * least(n_tokens / 100.0, 1.0)"
        f" + {W['distinct_ratio']} * distinct_ratio"
        f" + {W['punct_ratio']} * punct_ratio"
        f" + {W['stopword_ratio']} * stopword_ratio, 6) + 0.0"
    )
    return f"""
WITH t AS (
  SELECT doc_id, text, {_SQL_WS_TOKS} AS toks FROM documents
), feat AS (
  SELECT doc_id, len(toks)::bigint AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks))::double / len(toks)
              ELSE 0 END AS distinct_ratio,
         CASE WHEN len(text) > 0
              THEN (len(text) - len(regexp_replace(text, '[^\\w\\s]', '', 'g')))::double
                   / len(text)
              ELSE 0 END AS punct_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))::double
                   / len(toks)
              ELSE 0 END AS stopword_ratio
  FROM t
), s AS (
  SELECT doc_id, n_tokens, ({logit}) AS logit FROM feat
)
SELECT doc_id, n_tokens, logit,
       (round(1.0 / (1.0 + exp(-logit)), 6) + 0.0) AS quality_prob,
       logit >= 0 AS keep_doc
FROM s ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q78 — multi-source BFS shortest-hops over the co-purchase graph (the G5
# reachability operator upgraded to an oracled query): frontier expansion in
# fixed rounds, each one edge equi-join + an id-only anti-join — the
# Pregel-style iterative primitive next to PageRank (q51) / label
# propagation (q72) / k-core (q74). The oracle unrolls every round as CTEs.
# ---------------------------------------------------------------------------

_BFS_DEPTH = 3


def q78_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import bfs_closure

    li = (
        spark.read.parquet(_t(sf_dir, "lineitem"))
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    # symmetric co-purchase edges: parts sharing an order, both directions
    edges = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    roots = edges.select("src").filter(F.col("src") % 100 == 0).distinct()
    return bfs_closure(
        edges, roots, src="src", dst="dst", max_depth=_BFS_DEPTH
    ).orderBy("node")


def _q78_sql() -> str:
    parts = []
    prev_v, prev_f = "v0", "v0"
    for dpt in range(1, _BFS_DEPTH + 1):
        parts.append(f"""n{dpt} AS (
  SELECT DISTINCT e.v AS node FROM {prev_f} JOIN e ON e.u = {prev_f}.node
  WHERE e.v NOT IN (SELECT node FROM {prev_v})
), v{dpt} AS (
  SELECT node, depth FROM {prev_v}
  UNION ALL SELECT node, {dpt} AS depth FROM n{dpt}
)""")
        prev_v, prev_f = f"v{dpt}", f"n{dpt}"
    rounds = ",\n".join(parts)
    return f"""
WITH lp AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), e AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM lp a JOIN lp b ON a.o = b.o AND a.p <> b.p
), v0 AS (
  SELECT DISTINCT u AS node, 0 AS depth FROM e WHERE u % 100 = 0
),
{rounds}
SELECT node, depth::int AS depth FROM {prev_v} ORDER BY node
"""


# ---------------------------------------------------------------------------
# Q79 — DSIR data selection (Xie et al. 2023): log importance ratio of each
# pool document's unigrams under the target-domain distribution vs the
# pool's own (add-one smoothing over the union vocabulary). Every 20th doc
# plays the curated target sample; positive scores = target-like documents.
# All-integer distribution inputs + the q44 position-ordered fold keep both
# engines bit-identical into the final round.
# ---------------------------------------------------------------------------

_DSIR_MOD = 20


def q79_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import dsir_logratio

    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("doc_id") % _DSIR_MOD == 0)
    pool = docs.filter(F.col("doc_id") % _DSIR_MOD != 0)
    out = dsir_logratio(pool, target).withColumn(
        "dsir_logratio", _rz(F.col("dsir_logratio"), 6)
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "dsir_logratio",
        (F.col("dsir_logratio") >= 0).alias("selected"),
    ).orderBy("doc_id")


def _q79_sql() -> str:
    m = _DSIR_MOD
    return f"""
WITH ptoks AS (
  SELECT doc_id, (i - 1)::int AS pos, ts[i] AS tok
  FROM (
    SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i
    FROM (SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents
          WHERE doc_id % {m} <> 0)
  )
), ttoks AS (
  SELECT unnest(ts) AS tok
  FROM (SELECT {_SQL_WS_TOKS} AS ts FROM documents WHERE doc_id % {m} = 0)
), pf AS (
  SELECT tok, count(*) AS c_r FROM ptoks GROUP BY tok
), tf AS (
  SELECT tok, count(*) AS c_t FROM ttoks GROUP BY tok
), vocab AS (
  SELECT coalesce(pf.tok, tf.tok) AS tok,
         coalesce(c_r, 0) AS c_r, coalesce(c_t, 0) AS c_t
  FROM pf FULL OUTER JOIN tf ON pf.tok = tf.tok
), sc AS (
  SELECT sum(c_r)::bigint AS n_r, sum(c_t)::bigint AS n_t,
         count(*) AS v_sz
  FROM vocab
), per_doc AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         list_sum(list(ln(v.c_t::double + 1.0) - ln(v.c_r::double + 1.0)
                       ORDER BY t.pos)) AS sum_term
  FROM ptoks t JOIN vocab v USING (tok)
  GROUP BY t.doc_id
), scored AS (
  SELECT doc_id, n_tokens,
         (round(sum_term
                + n_tokens * (ln((n_r + v_sz)::double)
                              - ln((n_t + v_sz)::double)), 6) + 0.0)
           AS dsir_logratio
  FROM per_doc, sc
)
SELECT doc_id, n_tokens, dsir_logratio, dsir_logratio >= 0 AS selected
FROM scored ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q80 — SemDeDup (Abbas et al. 2023) semantic dedup over embeddings:
# k-means cells (the exact q36 Lloyd chain, shared SQL prefix), then inside
# each cell drop every member out-ranked by a cosine-near neighbor (keep the
# FARTHEST from the centroid — the paper's policy as a one-pass EXISTS).
# Gate threshold 0.35 because the driver embeddings are near-uniform random
# (no true semantic duplicates exist at a production 0.9+ threshold — zero
# drops would exercise nothing); the clustered-corpus regime is pinned in
# tests/test_similarity.py. cdist_fp is the all-integer quantized L2 rank
# key; ::bigint on the SQL side because DuckDB's list_sum would widen it to
# HUGEINT (the q46 lesson).
# ---------------------------------------------------------------------------

_SDD_T = 0.35


def q80_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.similarity import semantic_dedup

    emb = _tbl(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb,
        id_col="vec_id",
        threshold=_SDD_T,
        n_centroids=_IVF_CENTROIDS,
        kmeans_iters=_IVF_ITERS,
    ).orderBy("vec_id")


def _q80_sql() -> str:
    d = _EMB_DIM
    prefix, final = _sql_lloyd_prefix(with_cv=True)
    cos = (
        f"list_sum(list_transform(generate_series(1, {d}),"
        f" i -> a.ce[i]::double * b.ce[i]::double))"
        f" / (sqrt(list_sum(list_transform(a.ce, x -> x::double * x::double)))"
        f" * sqrt(list_sum(list_transform(b.ce, x -> x::double * x::double))))"
    )
    return f"""{prefix}, dist AS (
  SELECT cc.c_id, cc.ce, cc.cell,
         ({_sql_ivf_dist('cc.cv', 't.cvec')})::bigint AS cdist_fp
  FROM corpus_cells cc JOIN {final} t USING (cell)
), drops AS (
  SELECT DISTINCT a.c_id
  FROM dist a JOIN dist b ON a.cell = b.cell AND (
         b.cdist_fp > a.cdist_fp
         OR (b.cdist_fp = a.cdist_fp AND b.c_id < a.c_id))
  WHERE {cos} >= {_SDD_T}
)
SELECT c_id AS vec_id, cell::int AS cell, cdist_fp,
       c_id IN (SELECT c_id FROM drops) AS is_dropped
FROM dist ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# Q81 — market-basket association rules (operators/baskets.py assoc_rules):
# support/confidence/lift over unordered item pairs, baskets = orders,
# items = brand/size-band (125 items so real co-occurrence exists at every
# SF). min_support=2 prunes the singleton-pair tail BEFORE the item-count
# join — the heavy pair table never carries float columns through a
# shuffle. The KG analogue of the reference's xref co-occurrence pairing
# (pathhier/utils/pathway_utils.py), generalized to the Apriori pair stats.
# ---------------------------------------------------------------------------

_ASSOC_MIN_SUPPORT = 2


def q81_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.baskets import assoc_rules

    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    part = spark.read.parquet(_t(sf_dir, "part"))
    baskets = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).select(
        F.col("l_orderkey").alias("basket_id"),
        F.concat(
            F.col("p_brand"), F.lit("/"), (F.col("p_size") % 5).cast("string")
        ).alias("item"),
    )
    return assoc_rules(
        baskets, min_support=_ASSOC_MIN_SUPPORT
    ).orderBy("ia", "ib")


def _q81_sql() -> str:
    return f"""
WITH lp AS (
  SELECT DISTINCT l_orderkey AS b,
         p_brand || '/' || (p_size % 5)::varchar AS i
  FROM lineitem JOIN part ON p_partkey = l_partkey
), pairs AS (
  SELECT x.i AS ia, y.i AS ib, count(*)::bigint AS c_ab
  FROM lp x JOIN lp y USING (b)
  WHERE x.i < y.i
  GROUP BY 1, 2
  HAVING count(*) >= {_ASSOC_MIN_SUPPORT}
), ic AS (
  SELECT i, count(*)::bigint AS c FROM lp GROUP BY i
), nb AS (
  SELECT count(DISTINCT b)::bigint AS n FROM lp
)
SELECT p.ia, p.ib, p.c_ab, a.c AS c_a, b.c AS c_b,
       p.c_ab::double / a.c AS confidence,
       (nb.n * p.c_ab)::double / (a.c * b.c) AS lift
FROM pairs p
JOIN ic a ON a.i = p.ia
JOIN ic b ON b.i = p.ib
CROSS JOIN nb
ORDER BY p.ia, p.ib
"""


# ---------------------------------------------------------------------------
# Q82 — per-group HyperLogLog sketches (operators/textstats.py
# hll_registers_grouped / hll_estimate_grouped): one dense 64-register
# frame per language, elementwise-max mergeable across shards/days — the
# shape a 100 TB pipeline stores per partition key instead of rescanning
# history. The gate emits every (lang, j, reg) register PLUS the per-lang
# estimate and the exact distinct count, so the grouped max-aggregate, the
# dense frame fill, the dyadic harmonic sum, and the small-range
# correction are all hash-checked per group.
# ---------------------------------------------------------------------------


def q82_hll_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import (
        _tokens,
        hll_estimate_grouped,
        hll_registers_grouped,
    )

    docs = _docs(spark, sf_dir)
    # checkpoint: read twice (registers + the exact-count comparison)
    toks = docs.select(
        "lang", F.explode(_tokens("text")).alias("tok")
    ).localCheckpoint(eager=True)
    regs = hll_registers_grouped(toks, "lang", "tok", m=_HLL_M)
    est = hll_estimate_grouped(regs, "lang", m=_HLL_M)
    exact = toks.groupBy("lang").agg(
        F.countDistinct("tok").cast("long").alias("n_exact")
    )
    return (
        regs.join(
            F.broadcast(est.select("lang", _rz(F.col("est"), 6).alias("est"))),
            "lang",
        )
        .join(F.broadcast(exact), "lang")
        .select("lang", "j", "reg", "est", "n_exact")
        .orderBy("lang", "j")
    )


def _q82_sql() -> str:
    m = _HLL_M
    tail = 32 - (m.bit_length() - 1)
    alpha_m2 = (0.7213 / (1.0 + 1.079 / m)) * m * m
    return f"""
WITH toks AS (
  SELECT lang, unnest({_SQL_WS_TOKS}) AS tok FROM documents
), hs AS (
  SELECT lang, {_sql_hex32("'hll:' || tok")} AS h FROM toks
), rho AS (
  SELECT lang, h % {m} AS j,
         CASE WHEN h // {m} = 0 THEN {tail + 1}
              ELSE {tail + 1} - length(bin(h // {m})) END AS rho
  FROM hs
), frame AS (
  SELECT l.lang, g.j
  FROM (SELECT DISTINCT lang FROM toks) l CROSS JOIN range(0, {m}) g(j)
), regs AS (
  SELECT f.lang, f.j, coalesce(max(rho.rho), 0)::bigint AS reg
  FROM frame f LEFT JOIN rho ON rho.lang = f.lang AND rho.j = f.j
  GROUP BY f.lang, f.j
), agg AS (
  SELECT lang, sum(1.0 / (1::bigint << reg)) AS s,
         sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)::bigint AS n_zero
  FROM regs GROUP BY lang
), est AS (
  SELECT lang,
         round(CASE WHEN ({alpha_m2!r} / s) <= {2.5 * m!r} AND n_zero > 0
                    THEN {float(m)!r} * ln({float(m)!r} / n_zero)
                    ELSE {alpha_m2!r} / s END, 6) + 0.0 AS est
  FROM agg
), ex AS (
  SELECT lang, count(DISTINCT tok)::bigint AS n_exact FROM toks GROUP BY lang
)
SELECT regs.lang, regs.j, regs.reg, est.est, ex.n_exact
FROM regs JOIN est USING (lang) JOIN ex USING (lang)
ORDER BY lang, j
"""


# ---------------------------------------------------------------------------
# Q83 — sequence packing (operators/packing.py pack_sequences): GPT-style
# concat-and-chunk — every document's global token offset and the training
# chunks it spans at capacity 256. Spark computes it via the two-level
# parallel prefix sum (per-block combiner totals -> prefix walk over the
# tiny block table -> within-block parallel windows); the oracle is the
# naive single-window cumsum — block decomposition exactness IS the thing
# being hash-checked. block_size 64 so the gate exercises multiple blocks
# at every SF.
# ---------------------------------------------------------------------------

_PACK_CAP = 256
_PACK_BLOCK = 64


def q83_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.packing import pack_sequences
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(_tokens("text")).cast("long").alias("n_tokens")
    )
    return pack_sequences(
        docs, capacity=_PACK_CAP, block_size=_PACK_BLOCK
    ).orderBy("doc_id")


def _q83_sql() -> str:
    c = _PACK_CAP
    return f"""
WITH t AS (
  SELECT doc_id, len({_SQL_WS_TOKS})::bigint AS n FROM documents
), cum AS (
  SELECT doc_id, n,
         (sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n)::bigint
           AS start_off
  FROM t
)
SELECT doc_id, n, start_off,
       (start_off // {c})::bigint AS first_chunk,
       (CASE WHEN n > 0 THEN (start_off + n - 1) // {c}
             ELSE start_off // {c} END)::bigint AS last_chunk,
       (CASE WHEN n > 0
             THEN (start_off + n - 1) // {c} - start_off // {c} + 1
             ELSE 0 END)::bigint AS n_chunks
FROM cum ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q84 — HITS hubs and authorities (operators/graph.py hits_fixedpoint):
# Kleinberg power iteration in int64 micro-units with exact integer-div
# MAX-normalization per half-step (top hub/authority pinned at exactly
# `scale`), over the q51 customer->supplier trade bipartite. 3 rounds
# unrolled as CTEs — the q51/q62 trick. All arithmetic integer until the
# final fp/scale division (one IEEE op on identical operands, bit-exact on
# both engines — no round() needed).
# ---------------------------------------------------------------------------

_HITS_ITERS = 3
_HITS_SCALE = 1_000_000


def q84_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import hits_fixedpoint

    orders = spark.read.parquet(_t(sf_dir, "orders"))
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    edges = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
    )
    return hits_fixedpoint(
        edges, iterations=_HITS_ITERS, scale=_HITS_SCALE
    ).orderBy("node")


def _q84_sql() -> str:
    s = _HITS_SCALE

    def half(r: int, out: str, prev: str, key_in: str, key_out: str) -> str:
        return f"""{out}{r}_raw AS (
  SELECT e.{key_out} AS node, sum(p.fp) AS raw
  FROM e JOIN {prev} p ON p.node = e.{key_in} GROUP BY e.{key_out}
), {out}{r}_m AS (
  SELECT max(raw) AS m FROM {out}{r}_raw
), {out}{r} AS (
  SELECT n.node,
         (CASE WHEN m > 0 THEN (coalesce(raw, 0) * {s}) // m
               ELSE 0 END)::bigint AS fp
  FROM nodes n LEFT JOIN {out}{r}_raw USING (node) CROSS JOIN {out}{r}_m
)"""

    rounds, prev_h = [], "h0"
    for r in range(1, _HITS_ITERS + 1):
        rounds.append(half(r, "a", prev_h, "s", "d"))
        rounds.append(half(r, "h", f"a{r}", "d", "s"))
        prev_h = f"h{r}"
    chain = ",\n".join(rounds)
    last = _HITS_ITERS
    return f"""
WITH e AS (
  SELECT DISTINCT 'c' || o_custkey::varchar AS s,
         's' || l_suppkey::varchar AS d
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), nodes AS (
  SELECT s AS node FROM e UNION SELECT d FROM e
), h0 AS (
  SELECT node, {s}::bigint AS fp FROM nodes
),
{chain}
SELECT n.node, h{last}.fp AS h_fp, a{last}.fp AS a_fp,
       h{last}.fp::double / {float(s)!r} AS hub,
       a{last}.fp::double / {float(s)!r} AS auth
FROM nodes n JOIN h{last} USING (node) JOIN a{last} USING (node)
ORDER BY n.node
"""


# ---------------------------------------------------------------------------
# Q85 — directional containment join (operators/retrieval.py
# containment_join_exact): C(a->b) = |shingles(a) ∩ shingles(b)| /
# |shingles(a)| >= t over 3-token shingles — quote/subset detection, the
# asymmetric cousin of q65's Jaccard. Spark prunes with the lossless
# prefix filter on the contained side; the oracle is the brute all-pairs
# — so the prefix filter's losslessness is what the hash checks.
# Containment is a single exact-integer IEEE division (no round()).
# ---------------------------------------------------------------------------

_CONT_N = 3
_CONT_T = 0.5


def q85_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.retrieval import containment_join_exact
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    return containment_join_exact(
        docs, _tokens("text"), n=_CONT_N, threshold=_CONT_T
    ).orderBy("a", "b")


def _q85_sql() -> str:
    n = _CONT_N
    gram = " || ' ' || ".join(f"ts[i + {j}]" for j in range(n))
    return f"""
WITH t AS (
  SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, len(ts) - {n - 1}), i -> {gram})) AS ss
  FROM t WHERE len(ts) >= {n}
)
SELECT a.doc_id AS a, b.doc_id AS b,
       len(a.ss)::bigint AS size_a,
       len(list_intersect(a.ss, b.ss))::bigint AS inter,
       len(list_intersect(a.ss, b.ss))::double / len(a.ss) AS containment
FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
WHERE len(list_intersect(a.ss, b.ss))::double / len(a.ss) >= {_CONT_T!r}
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# Q86 — c-TF-IDF distinctive terms per language (operators/textstats.py
# ctfidf_top_terms): the BERTopic labeling statistic — score =
# tf(term, group) * ln(n_groups / group_df), so vocabulary present in
# every group scores exactly 0. Rank key is (round(score, 6) DESC, term
# ASC) — rounded BEFORE ranking so both engines order identically (the
# q06 rounded-ln discipline); tf/group_df all-integer.
# ---------------------------------------------------------------------------

_CTFIDF_K = 10


def q86_ctfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import _tokens, ctfidf_top_terms

    docs = _docs(spark, sf_dir)
    return ctfidf_top_terms(docs, "lang", _tokens("text"), k=_CTFIDF_K).orderBy(
        "lang", "rank"
    )


def _q86_sql() -> str:
    return f"""
WITH gt AS (
  SELECT lang AS g, unnest({_SQL_WS_TOKS}) AS term FROM documents
), tf AS (
  SELECT g, term, count(*)::bigint AS tf FROM gt GROUP BY g, term
), gdf AS (
  SELECT term, count(*)::bigint AS group_df FROM tf GROUP BY term
), ng AS (
  SELECT count(DISTINCT g)::bigint AS n_groups FROM tf
), scored AS (
  SELECT tf.g, tf.term, tf.tf, gdf.group_df,
         round(tf.tf * ln(ng.n_groups::double / gdf.group_df::double), 6)
           + 0.0 AS score
  FROM tf JOIN gdf USING (term) CROSS JOIN ng
), ranked AS (
  SELECT g, term, tf, group_df, score,
         row_number() OVER (PARTITION BY g ORDER BY score DESC, term ASC)
           AS rank
  FROM scored
)
SELECT g AS lang, rank::bigint AS rank, term, tf, group_df, score
FROM ranked WHERE rank <= {_CTFIDF_K} ORDER BY lang, rank
"""


# ---------------------------------------------------------------------------
# Q87 — the COMPOSITE curation funnel: exact dedup + quality/language
# filtering + benchmark decontamination + sequence packing, chained the
# way a production pre-training prep run chains them, with per-stage
# verdict flags for every document (the audit view a data team actually
# ships). Flags are computed on the RAW corpus independently (dup keeper =
# min doc_id per md5; quality/lang = the q35 floor; contamination = the
# q54 5-gram benchmark probe, benchmark = doc_id % 50 == 0) and kept =
# none of them fired; survivors are packed with q83's parallel prefix
# sum. The oracle replays every stage: the q35 quality/lang fragments,
# the q54 gram probe, a group-min dedup, and the naive-window packing —
# one hash checks the whole pipeline composition, not just each stage.
# ---------------------------------------------------------------------------


def q87_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.decontam import decontaminate
    from pathhier_spark.operators.packing import pack_sequences
    from pathhier_spark.operators.textstats import (
        with_lang_id,
        with_quality_features,
    )

    docs = _docs(spark, sf_dir)
    # the scored frame feeds dedup (twice), flags, and the pack branch —
    # checkpoint it ONCE, lazily (the RDD dedups across branches inside
    # the first job, no separate materialization job), carrying the md5
    # instead of the full text so raw text never enters checkpoint storage
    scored = (
        with_lang_id(with_quality_features(docs))
        .select(
            "doc_id",
            F.md5("text").alias("h"),
            "n_tokens",
            "quality_score",
            "lang_pred",
        )
        .localCheckpoint(eager=False)
    )
    keepers = scored.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    dup = (
        scored.select("doc_id", "h")
        .join(keepers, "h")
        .select("doc_id", (F.col("doc_id") != F.col("keeper")).alias("is_dup"))
    )
    bench = docs.filter(F.col("doc_id") % _DECON_BENCH_MOD == 0)
    cont = decontaminate(docs, bench, n=_DECON_N).select(
        "doc_id", "n_contaminated", "contaminated"
    )
    low_q = (F.col("quality_score") < _Q35_QUALITY_FLOOR) | (
        F.col("lang_pred") != "en"
    )
    flags = (
        scored.join(dup, "doc_id")
        .join(cont, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            _rz(F.col("quality_score"), 6).alias("quality_score"),
            "lang_pred",
            "is_dup",
            low_q.alias("low_quality"),
            (F.col("doc_id") % _DECON_BENCH_MOD == 0).alias("in_benchmark"),
            "n_contaminated",
            "contaminated",
            (
                ~F.col("is_dup")
                & ~low_q
                & (F.col("doc_id") % _DECON_BENCH_MOD != 0)
                & ~F.col("contaminated")
            ).alias("kept"),
        )
        .localCheckpoint(eager=False)
    )
    packed = pack_sequences(
        flags.filter(F.col("kept")).select("doc_id", "n_tokens"),
        capacity=_PACK_CAP,
        block_size=_PACK_BLOCK,
    ).select("doc_id", "start_off", "first_chunk", "last_chunk")
    return flags.join(packed, "doc_id", "left").orderBy("doc_id")


def _q87_sql() -> str:
    from pathhier_spark.operators.textstats import LANG_MARKERS

    score_exprs = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        lit = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
        score_exprs.append(
            f"len(list_intersect(dtoks, {lit}))::double / {len(markers)}"
            f" AS score_{lang}"
        )
    langs = sorted(LANG_MARKERS)
    pred = f"'{langs[0]}'"
    best = f"score_{langs[0]}"
    for lang in langs[1:]:
        pred = f"CASE WHEN score_{lang} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"greatest(score_{lang}, {best})"
    cap = _PACK_CAP
    return f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
           AS toks
  FROM documents
), feat AS (
  SELECT doc_id, text, toks,
         list_distinct(toks) AS dtoks,
         len(toks)::bigint AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks))::double / len(toks)
              ELSE 0 END AS distinct_ratio,
         CASE WHEN len(text) > 0
              THEN (len(text) - len(regexp_replace(text, '[^\\w\\s]', '', 'g')))::double / len(text)
              ELSE 0 END AS punct_ratio
  FROM t
), scored AS (
  SELECT doc_id, text, toks, n_tokens, {', '.join(score_exprs)},
         round(0.4 * least(n_tokens / 100.0, 1.0)
             + 0.3 * distinct_ratio
             + 0.3 * (1.0 - least(punct_ratio * 5.0, 1.0)), 6)
           AS quality_score
  FROM feat
), pred AS (
  SELECT doc_id, text, toks, n_tokens, quality_score, {pred} AS lang_pred
  FROM scored
), keepers AS (
  SELECT md5(text) AS h, min(doc_id) AS keeper FROM pred GROUP BY md5(text)
), dup AS (
  SELECT doc_id, doc_id <> keeper AS is_dup
  FROM pred JOIN keepers ON md5(pred.text) = keepers.h
), g AS (
  SELECT doc_id, {_sql_word_ngrams(_DECON_N)} AS grams FROM t
), bg AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g
  WHERE doc_id % {_DECON_BENCH_MOD} = 0
), dg AS (
  SELECT doc_id, unnest(list_distinct(grams)) AS gram FROM g
), hits AS (
  SELECT doc_id, count(*)::bigint AS n FROM dg JOIN bg USING (gram)
  GROUP BY doc_id
), flags AS (
  SELECT p.doc_id, p.n_tokens, p.quality_score, p.lang_pred, d.is_dup,
         (p.quality_score < {_Q35_QUALITY_FLOOR} OR p.lang_pred <> 'en')
           AS low_quality,
         p.doc_id % {_DECON_BENCH_MOD} = 0 AS in_benchmark,
         coalesce(hits.n, 0)::bigint AS n_contaminated,
         coalesce(hits.n, 0) > 0 AS contaminated,
         (NOT d.is_dup
          AND NOT (p.quality_score < {_Q35_QUALITY_FLOOR}
                   OR p.lang_pred <> 'en')
          AND p.doc_id % {_DECON_BENCH_MOD} <> 0
          AND NOT coalesce(hits.n, 0) > 0) AS kept
  FROM pred p JOIN dup d USING (doc_id) LEFT JOIN hits USING (doc_id)
), pk AS (
  SELECT doc_id,
         (sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
          - n_tokens)::bigint AS start_off,
         n_tokens
  FROM flags WHERE kept
), pk2 AS (
  SELECT doc_id, start_off,
         (start_off // {cap})::bigint AS first_chunk,
         ((start_off + n_tokens - 1) // {cap})::bigint AS last_chunk
  FROM pk
)
SELECT f.doc_id, f.n_tokens, f.quality_score, f.lang_pred, f.is_dup,
       f.low_quality, f.in_benchmark, f.n_contaminated, f.contaminated,
       f.kept, pk2.start_off, pk2.first_chunk, pk2.last_chunk
FROM flags f LEFT JOIN pk2 USING (doc_id) ORDER BY f.doc_id
"""



# ---------------------------------------------------------------------------
# Q88 — host-level anchor link graph (operators/urls.anchor_host_edges):
# deterministic HTML pages (body text + absolute/relative/empty anchors
# derived from doc_id) are parsed for href targets with the SAME regex on
# both engines, resolved to hosts, and aggregated into the web-graph edge
# table that PageRank (q51/q57) and HITS (q84) consume. Absolute anchors
# point at a 7-host ring; every 4th page adds a relative (self-host) link;
# every 4k+1 page adds an empty href (dropped) plus a second absolute.
# ---------------------------------------------------------------------------


def q88_anchor_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.urls import anchor_host_edges

    docs = _docs(spark, sf_dir)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/p/"),
        (F.col("doc_id") % 10).cast("string"),
    )
    a1 = F.concat(
        F.lit('<a href="https://h'), (F.col("doc_id") % 7).cast("string"),
        F.lit('.example.org/a">x</a>'),
    )
    extra = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit('<a href="/local">rel</a><a href="//cdn'),
                (F.col("doc_id") % 3).cast("string"),
                F.lit('.example.net:8080/lib.js">c</a>'),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit('<a href="">e</a><a href="https://h'),
                ((F.col("doc_id") * 3) % 7).cast("string"),
                F.lit('.example.org/b">y</a>'),
            ),
        )
        .otherwise(F.lit(""))
    )
    html = F.concat(
        F.lit("<html><body><p>"), F.col("text"), F.lit("</p>"), a1, extra,
        F.lit("</body></html>"),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    return anchor_host_edges(pages).orderBy("src_host", "dst_host")


# DuckDB feature req: regexp_extract_all (core). The oracle PARSES the
# generated html with the same href regex rather than shortcutting to the
# generator arithmetic — extraction parity is the point of the query.
def _q88_sql() -> str:
    return r"""
WITH pages AS (
  SELECT 'https://' || source || '.example.com/p/' || (doc_id % 10)::varchar
           AS url,
         '<html><body><p>' || text || '</p>'
         || '<a href="https://h' || (doc_id % 7)::varchar
         || '.example.org/a">x</a>'
         || CASE WHEN doc_id % 4 = 0 THEN '<a href="/local">rel</a><a href="//cdn'
                      || (doc_id % 3)::varchar || '.example.net:8080/lib.js">c</a>'
                 WHEN doc_id % 4 = 1 THEN '<a href="">e</a><a href="https://h'
                      || ((doc_id * 3) % 7)::varchar || '.example.org/b">y</a>'
                 ELSE '' END
         || '</body></html>' AS html
  FROM documents
), hrefs AS (
  SELECT lower(regexp_extract(regexp_replace(url,
           '^[A-Za-z][A-Za-z0-9+.\-]*://', ''), '^([^:/?#]*)', 1)) AS src_host,
         unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href
  FROM pages
), resolved AS (
  SELECT src_host,
         CASE WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.\-]*://')
              THEN lower(regexp_extract(regexp_replace(href,
                     '^[A-Za-z][A-Za-z0-9+.\-]*://', ''), '^([^:/?#]*)', 1))
              WHEN href LIKE '//%'
              THEN lower(regexp_extract(href, '^//([^:/?#]*)', 1))
              ELSE src_host END AS dst_host
  FROM hrefs WHERE href <> ''
)
SELECT src_host, dst_host, (dst_host = src_host) AS internal,
       count(*) AS n_links
FROM resolved WHERE dst_host <> ''
GROUP BY src_host, dst_host ORDER BY src_host, dst_host
"""


# ---------------------------------------------------------------------------
# Q89 — first-order Markov transition matrix over per-user event streams
# (operators/temporal.transition_matrix): adjacent event pairs in
# (ts, event_id) order, counted per (src, dst) with the row-normalized
# conditional probability. Same total order as q16's sessionizer.
# ---------------------------------------------------------------------------


def q89_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import transition_matrix

    ev = spark.read.parquet(_t(sf_dir, "events"))
    return transition_matrix(ev).orderBy("src_event", "dst_event")


# DuckDB feature req: core only (lead window).
Q89_SQL = """
WITH pairs AS (
  SELECT event_type AS src_event,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst_event
  FROM events
), p AS (
  SELECT * FROM pairs WHERE dst_event IS NOT NULL
), counts AS (
  SELECT src_event, dst_event, count(*) AS n_trans
  FROM p GROUP BY src_event, dst_event
), totals AS (
  SELECT src_event, sum(n_trans)::bigint AS n_src FROM counts GROUP BY src_event
)
SELECT c.src_event, c.dst_event, c.n_trans,
       (round(c.n_trans::double / t.n_src, 6) + 0.0) AS prob
FROM counts c JOIN totals t USING (src_event)
ORDER BY c.src_event, c.dst_event
"""


# ---------------------------------------------------------------------------
# Q90 — overlapping token-window chunking (operators/packing.
# chunk_with_overlap): RAG/retrieval chunks of SIZE tokens every STRIDE
# tokens on the fixed start grid, trailing chunks shrink, empty docs emit
# nothing. Output carries the chunk md5 (content key), not the text.
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24


def q90_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.packing import chunk_with_overlap

    docs = _docs(spark, sf_dir)
    return chunk_with_overlap(
        docs, size=_CHUNK_SIZE, stride=_CHUNK_STRIDE
    ).orderBy("doc_id", "chunk_id")


# DuckDB feature req: core only (generate_series, 1-based inclusive list
# slicing, array_to_string, md5).
def _q90_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, {_SQL_WS_TOKS} AS toks FROM documents
), s AS (
  SELECT doc_id, toks, len(toks) AS n FROM d
), e AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(0, n - 1, {_CHUNK_STRIDE})) AS start_tok
  FROM s WHERE n > 0
)
SELECT doc_id, (start_tok // {_CHUNK_STRIDE})::bigint AS chunk_id,
       start_tok::bigint AS start_tok,
       least({_CHUNK_SIZE}, n - start_tok)::bigint AS chunk_len,
       md5(array_to_string(
         toks[start_tok + 1 : start_tok + {_CHUNK_SIZE}], ' ')) AS chunk_md5
FROM e ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# Q91 — single-pass dataset profile (operators/profile.profile_columns)
# over orders with deterministically injected NULLs (every 7th custkey,
# every 11th orderstatus) so null accounting is actually exercised.
# ---------------------------------------------------------------------------

_PROF_COLS = [
    "o_orderkey", "cust", "status", "o_totalprice", "o_orderpriority",
]


def q91_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import profile_columns

    o = spark.read.parquet(_t(sf_dir, "orders")).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 != 0, F.col("o_custkey")).alias("cust"),
        F.when(F.col("o_orderkey") % 11 != 0, F.col("o_orderstatus")).alias(
            "status"
        ),
        "o_totalprice",
        "o_orderpriority",
    )
    return profile_columns(o, columns=_PROF_COLS).orderBy("col_idx")


# DuckDB feature req: core only (UNION ALL of per-column aggregates;
# "column" quoted — reserved word).
def _q91_sql() -> str:
    specs = [
        ("o_orderkey", "o_orderkey", True),
        ("cust", "CASE WHEN o_orderkey % 7 <> 0 THEN o_custkey END", True),
        ("status",
         "CASE WHEN o_orderkey % 11 <> 0 THEN o_orderstatus END", False),
        ("o_totalprice", "o_totalprice", True),
        ("o_orderpriority", "o_orderpriority", False),
    ]
    parts = []
    for i, (name, expr, numeric) in enumerate(specs):
        if numeric:
            mn = f"(round(min({expr})::double, 6) + 0.0)"
            mx = f"(round(max({expr})::double, 6) + 0.0)"
            ms, xs = "NULL::varchar", "NULL::varchar"
        else:
            mn, mx = "NULL::double", "NULL::double"
            ms, xs = f"min({expr})", f"max({expr})"
        parts.append(f"""
  SELECT {i}::bigint AS col_idx, '{name}' AS "column",
         count(*)::bigint AS n_rows,
         (count(*) - count({expr}))::bigint AS n_nulls,
         count(DISTINCT {expr})::bigint AS n_distinct,
         {mn} AS min_num, {mx} AS max_num,
         {ms} AS min_str, {xs} AS max_str
  FROM orders""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_idx"


# ---------------------------------------------------------------------------
# Q92 — mean conditional bigram surprisal per document (operators/
# textstats.bigram_surprisal): -ln p(w2|w1) under the corpus's own bigram
# counts, folded in POSITION order on both engines exactly like q44.
# Docs with < 2 tokens carry n_bigrams = 0 and a NULL average.
# ---------------------------------------------------------------------------


def q92_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import bigram_surprisal

    docs = _docs(spark, sf_dir)
    return bigram_surprisal(docs).select(
        "doc_id",
        "n_bigrams",
        _rz(F.col("avg_surprisal"), 6).alias("avg_surprisal"),
    ).orderBy("doc_id")


# DuckDB feature req: core only (lead window, list(... ORDER BY) fold —
# the q44 position-order discipline).
def _q92_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, (i - 1)::int AS pos, ts[i] AS tok
  FROM (
    SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i
    FROM (SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents)
  )
), pairs AS (
  SELECT doc_id, pos, tok AS w1,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
), p AS (
  SELECT * FROM pairs WHERE w2 IS NOT NULL
), big AS (
  SELECT w1, w2, count(*) AS c2 FROM p GROUP BY w1, w2
), pre AS (
  SELECT w1, sum(c2)::bigint AS c1 FROM big GROUP BY w1
), per_doc AS (
  SELECT p.doc_id, count(*) AS n_bigrams,
         list_sum(list(ln(c1::double) - ln(c2::double) ORDER BY p.pos))
           AS sum_lnp
  FROM p JOIN big USING (w1, w2) JOIN pre USING (w1)
  GROUP BY p.doc_id
)
SELECT d.doc_id, coalesce(per_doc.n_bigrams, 0)::bigint AS n_bigrams,
       CASE WHEN per_doc.n_bigrams > 0
            THEN round(per_doc.sum_lnp / per_doc.n_bigrams, 6) + 0.0
       END AS avg_surprisal
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN per_doc USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Q93 — reciprocal-rank fusion hybrid retrieval (operators/retrieval.py
# rrf_fuse): the standard two-tower serving shape — a sparse BM25 channel
# (q63's machinery, k=20) and a dense brute-force cosine channel (q12's
# machinery, k=20) over the SAME deterministic query set, fused with
# RRF 1/(60 + rank) and cut to the top 10. Both channel rankings are
# individually bit-reproducible (q63/q12 are gate-green), each RRF term
# is an exact IEEE division of integers, and the fused sum folds in
# channel-name order on both engines — so the fusion is hash-exact.
# Queries: ids divisible by 50 that have BOTH a document (sparse text)
# and an embedding (dense probe).
# ---------------------------------------------------------------------------

_RRF_K0 = 60
_RRF_K = 10
_RRF_CHANNEL_K = 20


def q93_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.retrieval import bm25_topk, rrf_fuse
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    emb = _tbl(spark, sf_dir, "embeddings")
    qids = (
        docs.select(F.col("doc_id").alias("qid"))
        .filter(F.col("qid") % _BM25_QMOD == 0)
        .join(
            emb.select(F.col("vec_id").alias("qid")).distinct(), "qid"
        )
    )

    # sparse channel: q63's deterministic query construction (first
    # _BM25_QLEN first-occurrence tokens of the query doc), k=20.
    # Checkpoint the tokenized corpus once: the query-term derivation
    # and bm25_topk's postings/doc-length/df branches all re-read it,
    # and without the checkpoint each branch re-tokenizes from parquet
    # (the q51 lineage lesson; measured 16s -> ~8s at sf0.1).
    toks = docs.select(
        "doc_id", _tokens("text").alias("ts")
    ).localCheckpoint(eager=True)
    qsrc = (
        toks.join(qids, toks.doc_id == qids.qid)
        .select(
            "qid", F.posexplode("ts").alias("pos", "term")
        )
        .groupBy("qid", "term")
        .agg(F.min("pos").alias("mp"))
    )
    qw = Window.partitionBy("qid").orderBy("mp", "term")
    qterms = (
        qsrc.withColumn("rn", F.row_number().over(qw))
        .filter(F.col("rn") <= _BM25_QLEN)
        .select("qid", "term")
    )
    sparse = bm25_topk(
        toks, qterms, F.col("ts"), k1=_BM25_K1, b=_BM25_B, k=_RRF_CHANNEL_K
    ).select("qid", F.col("doc_id").alias("id"), "rank")

    # dense channel: brute-force cosine (q12's machinery), k=20. The
    # brute form is the verification channel; q24/q36 are the scale
    # paths and slot into rrf_fuse unchanged.
    probes = emb.join(
        qids, emb.vec_id == qids.qid
    ).select(F.col("qid").alias("q_id"), "embedding")
    dense = brute_force_topk(
        probes, emb.select(F.col("vec_id").alias("c_id"), "embedding"),
        k=_RRF_CHANNEL_K,
    ).select(
        F.col("q_id").alias("qid"),
        F.col("c_id").alias("id"),
        F.col("nn_rank").alias("rank"),
    )

    return rrf_fuse(
        {"bm25": sparse, "dense": dense}, k0=_RRF_K0, k=_RRF_K
    ).orderBy("qid", "rank")


# DuckDB feature req: list_transform/list_sum (core) + window functions.
def _q93_sql() -> str:
    k1p1 = _BM25_K1 + 1.0
    omb = 1.0 - _BM25_B
    return f"""
WITH qids AS (
  SELECT d.doc_id AS qid FROM documents d
  JOIN (SELECT DISTINCT vec_id FROM embeddings) e ON e.vec_id = d.doc_id
  WHERE d.doc_id % {_BM25_QMOD} = 0
), tl AS (
  SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents
), dl AS (
  SELECT doc_id, len(ts)::bigint AS dl FROM tl
), stats AS (
  SELECT count(*)::bigint AS n_docs, sum(dl)::double / count(*) AS avgdl
  FROM dl
), toks AS (
  SELECT doc_id, i::bigint AS pos, ts[i] AS term
  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i FROM tl)
), postings AS (
  SELECT doc_id, term, count(*)::bigint AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*)::bigint AS df FROM postings GROUP BY term
), qt0 AS (
  SELECT doc_id AS qid, term, min(pos) AS mp
  FROM toks JOIN qids ON qids.qid = toks.doc_id GROUP BY doc_id, term
), qterms AS (
  SELECT qid, term FROM (
    SELECT qid, term,
           row_number() OVER (PARTITION BY qid ORDER BY mp, term) AS rn
    FROM qt0
  ) WHERE rn <= {_BM25_QLEN}
), scored AS (
  SELECT q.qid, p.doc_id, q.term,
         ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (p.tf * {k1p1!r})
           / (p.tf + {_BM25_K1!r} * ({omb!r} + {_BM25_B!r} * l.dl / s.avgdl))
           AS sc
  FROM qterms q
  JOIN postings p USING (term)
  JOIN dfreq d USING (term)
  JOIN dl l ON l.doc_id = p.doc_id, stats s
), folded AS (
  SELECT qid, doc_id, list_sum(list(sc ORDER BY term)) AS score
  FROM scored GROUP BY qid, doc_id
), bm AS (
  SELECT qid, doc_id AS id, rnk FROM (
    SELECT qid, doc_id, row_number() OVER (
      PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
    FROM folded
  ) WHERE rnk <= {_RRF_CHANNEL_K}
), probes AS (
  SELECT qids.qid, e.embedding AS qv
  FROM qids JOIN embeddings e ON e.vec_id = qids.qid
), cos AS (
  SELECT p.qid, c.vec_id AS id,
         list_sum(list_transform(generate_series(1, len(p.qv)),
                  i -> p.qv[i]::double * c.embedding[i]::double))
         / (sqrt(list_sum(list_transform(p.qv, x -> x::double * x::double)))
            * sqrt(list_sum(list_transform(c.embedding,
                    x -> x::double * x::double)))) AS cs
  FROM probes p, embeddings c
), dn AS (
  SELECT qid, id, rnk FROM (
    SELECT qid, id, row_number() OVER (
      PARTITION BY qid ORDER BY cs DESC, id) AS rnk
    FROM cos
  ) WHERE rnk <= {_RRF_CHANNEL_K}
), fused AS (
  SELECT coalesce(b.qid, d.qid) AS qid, coalesce(b.id, d.id) AS id,
         coalesce(1.0 / ({_RRF_K0} + b.rnk), 0.0)
           + coalesce(1.0 / ({_RRF_K0} + d.rnk), 0.0) AS rrf,
         b.rnk AS bm25_rank, d.rnk AS dense_rank
  FROM bm b FULL OUTER JOIN dn d ON b.qid = d.qid AND b.id = d.id
), ranked AS (
  SELECT qid, id, rrf, bm25_rank, dense_rank,
         row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, id)
           AS "rank"
  FROM fused
)
SELECT qid, "rank", id, round(rrf, 6) + 0.0 AS rrf, bm25_rank, dense_rank
FROM ranked WHERE "rank" <= {_RRF_K} ORDER BY qid, "rank"
"""


# ---------------------------------------------------------------------------
# Q94 — KG predicate constraint profile (operators/extract.py
# predicate_profile): per-predicate functionality / inverse functionality
# (PARIS-style n_endpoints / n_triples over the distinct triple set) and
# the functional-violation count (subjects with >1 distinct object) —
# the quality gate a triple factory runs before shipping edges. All
# counts integer; the two ratios are single IEEE divisions.
# ---------------------------------------------------------------------------


def q94_predicate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.extract import predicate_profile

    docs = _docs(spark, sf_dir)
    triples = extract_token_triples(docs, TRIGGERS)
    return predicate_profile(triples).orderBy("pred")


def _q94_sql() -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in sorted(TRIGGERS.items())
    )
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    return f"""
WITH t AS (
  SELECT DISTINCT t[i-1] AS subj, CASE t[i] {cases} END AS pred,
         t[i+1] AS obj
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] IN {trig_list}
), base AS (
  SELECT pred, count(*)::bigint AS n_triples,
         count(DISTINCT subj)::bigint AS n_subj,
         count(DISTINCT obj)::bigint AS n_obj
  FROM t GROUP BY pred
), multi AS (
  SELECT pred, count(*)::bigint AS n_multi_subj FROM (
    SELECT pred, subj FROM t GROUP BY pred, subj HAVING count(*) > 1
  ) GROUP BY pred
)
SELECT b.pred, b.n_triples, b.n_subj, b.n_obj,
       round(b.n_subj::double / b.n_triples, 6) + 0.0 AS functionality,
       round(b.n_obj::double / b.n_triples, 6) + 0.0 AS inv_functionality,
       coalesce(m.n_multi_subj, 0)::bigint AS n_multi_subj
FROM base b LEFT JOIN multi m USING (pred)
ORDER BY b.pred
"""


# ---------------------------------------------------------------------------
# Q95 — local clustering coefficient (operators/graph.py
# local_clustering) on the KG subject-object graph (q57's edge set).
# Spark runs the degree-ordered-orientation triangle kernel; the oracle
# recounts triangles with an INDEPENDENT id-ordered enumeration (q67's
# discipline), so agreement checks the algorithm, not a replay. lcc =
# 2 * n_tri / (d * (d - 1)) — one IEEE division of exact integers.
# ---------------------------------------------------------------------------


def q95_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import local_clustering

    docs = _docs(spark, sf_dir)
    edges = extract_token_triples(docs, TRIGGERS).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return local_clustering(edges).orderBy("node")


def _q95_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] IN {trig_list}
), e AS (
  SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
  FROM raw WHERE least(s, d) < greatest(s, d)
), deg AS (
  SELECT node, count(*)::bigint AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
  ) GROUP BY node
), tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
), ntri AS (
  SELECT node, count(*)::bigint AS n_tri FROM (
    SELECT unnest([x, y, z]) AS node FROM tri
  ) GROUP BY node
)
SELECT d.node, d.deg, coalesce(t.n_tri, 0)::bigint AS n_tri,
       round((2.0 * coalesce(t.n_tri, 0)) / (d.deg * (d.deg - 1)), 6)
         + 0.0 AS lcc
FROM deg d LEFT JOIN ntri t USING (node)
WHERE d.deg >= 2
ORDER BY d.node
"""


# ---------------------------------------------------------------------------
# Q96 — deterministic random walks (operators/graph.py
# deterministic_walks) over the directed KG subject->object graph: the
# DeepWalk/node2vec corpus generator with the step choice derandomized
# to argmin (md5(walk:step:candidate), candidate) so both engines emit
# identical walks. Seeds = top-50 out-degree hubs. The oracle unrolls
# the 4 steps as CTEs computing the same argmin with row_number —
# a DIFFERENT argmin mechanism (window vs min-struct), so agreement
# checks the choice semantics, not a replay. All string/int — exact.
# ---------------------------------------------------------------------------

_WALK_SEEDS = 50
_WALK_LEN = 4


def q96_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import deterministic_walks

    docs = _docs(spark, sf_dir)
    edges = extract_token_triples(docs, TRIGGERS).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return deterministic_walks(
        edges, n_seeds=_WALK_SEEDS, length=_WALK_LEN
    ).orderBy("walk_id", "step")


def _q96_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    steps = []
    for s in range(1, _WALK_LEN + 1):
        steps.append(f"""w{s} AS (
  SELECT walk_id, {s}::int AS step, d AS node FROM (
    SELECT w.walk_id, e.d,
           row_number() OVER (
             PARTITION BY w.walk_id
             ORDER BY md5(w.walk_id || ':' || '{s}' || ':' || e.d), e.d
           ) AS rn
    FROM w{s - 1} w JOIN e ON e.s = w.node
  ) WHERE rn = 1
)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT * FROM w{s}" for s in range(0, _WALK_LEN + 1)
    )
    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] IN {trig_list}
), e AS (
  SELECT DISTINCT s, d FROM raw
), seeds AS (
  SELECT s AS walk_id FROM (
    SELECT s, count(*) AS od FROM e GROUP BY s
    ORDER BY od DESC, s LIMIT {_WALK_SEEDS}
  )
), w0 AS (
  SELECT walk_id, 0::int AS step, walk_id AS node FROM seeds
), {", ".join(steps)}
{unions}
ORDER BY walk_id, step
"""


# ---------------------------------------------------------------------------
# Q97 — exact trailing-window activity (operators/temporal.py
# sliding_window_distinct): rolling 7-day event counts and EXACT rolling
# distinct active users per day. Distinct counts do not re-aggregate, so
# the kernel collapses the stream to (day, user) pairs once, explodes
# each pair into the <= 7 days it serves (constant map-side fan-out),
# and countDistincts per output day — never a sorted window over raw
# events. All-integer.
# ---------------------------------------------------------------------------

_SWD_DAYS = 7


def q97_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import sliding_window_distinct

    ev = spark.read.parquet(_t(sf_dir, "events"))
    return sliding_window_distinct(
        ev, ts_col="ts", key_col="user_id", window_days=_SWD_DAYS
    ).orderBy("day")


def _q97_sql() -> str:
    w = _SWD_DAYS - 1
    return f"""
WITH pairs AS (
  SELECT DISTINCT ts::date AS day, user_id AS k FROM events
), days AS (
  SELECT DISTINCT day FROM pairs
), u_win AS (
  SELECT d.day, count(DISTINCT p.k)::bigint AS n_users_win
  FROM pairs p JOIN days d ON d.day BETWEEN p.day AND p.day + {w}
  GROUP BY d.day
), daily AS (
  SELECT ts::date AS day, count(*)::bigint AS n_events_day,
         count(DISTINCT user_id)::bigint AS n_users_day
  FROM events GROUP BY 1
), e_win AS (
  SELECT d.day, sum(x.n_events_day)::bigint AS n_events_win
  FROM daily x JOIN days d ON d.day BETWEEN x.day AND x.day + {w}
  GROUP BY d.day
)
SELECT daily.day, n_events_day, n_users_day, n_events_win, n_users_win
FROM daily JOIN u_win USING (day) JOIN e_win USING (day)
ORDER BY daily.day
"""


# ---------------------------------------------------------------------------
# Q98 — 2-hop GNN-style neighborhood aggregation (operators/graph.py
# neighborhood_aggregate) over the directed KG word graph (q57's edge
# set). Feature = out-degree; hop k carries (sum, path-count) of the
# k-hop out-neighborhood with path multiplicity — all int64, so no float
# summation order exists to diverge. The oracle recomputes both hops as
# plain aggregating self-joins (a DIFFERENT evaluation shape than the
# operator's message-frame loop).
# ---------------------------------------------------------------------------


def q98_neighbor_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import neighborhood_aggregate

    docs = _docs(spark, sf_dir)
    # checkpoint: edges feeds FOUR consumers (nodes x2, outdeg, and the
    # hop joins inside neighborhood_aggregate) and feats feeds both the
    # hop-1 message job and the final assembly job — without the eager
    # materialization the tokenize+explode extraction subtree re-executes
    # in every branch of every job (~7 Generates total; the q82
    # "checkpoint: read twice" discipline)
    edges = (
        extract_token_triples(docs, TRIGGERS)
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("feat"))
        .withColumnRenamed("src", "node")
    )
    feats = nodes.join(outdeg, "node", "left").select(
        "node", F.coalesce(F.col("feat"), F.lit(0)).cast("long").alias("feat")
    ).localCheckpoint(eager=True)
    return neighborhood_aggregate(edges, feats, hops=2).orderBy("node")


# DuckDB feature req: core only. Every sum() is wrapped ::bigint — DuckDB
# sums BIGINT into HUGEINT, which pandas-path fetches turn into float64
# and the driver then hash-diverges (q46's r4 lesson).
def _q98_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    return f"""
WITH e AS (
  SELECT DISTINCT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] IN {trig_list}
), nodes AS (
  SELECT s AS node FROM e UNION SELECT d FROM e
), od AS (
  SELECT s AS node, count(*)::bigint AS feat FROM e GROUP BY s
), f AS (
  SELECT n.node, coalesce(od.feat, 0)::bigint AS feat
  FROM nodes n LEFT JOIN od USING (node)
), h1 AS (
  SELECT e.s AS node, sum(f.feat)::bigint AS h1_sum,
         count(*)::bigint AS h1_cnt
  FROM e JOIN f ON f.node = e.d GROUP BY e.s
), h2 AS (
  SELECT e.s AS node, sum(h1.h1_sum)::bigint AS h2_sum,
         sum(h1.h1_cnt)::bigint AS h2_cnt
  FROM e JOIN h1 ON h1.node = e.d GROUP BY e.s
)
SELECT f.node, f.feat,
       coalesce(h1.h1_sum, 0)::bigint AS h1_sum,
       coalesce(h1.h1_cnt, 0)::bigint AS h1_cnt,
       coalesce(h2.h2_sum, 0)::bigint AS h2_sum,
       coalesce(h2.h2_cnt, 0)::bigint AS h2_cnt
FROM f LEFT JOIN h1 USING (node) LEFT JOIN h2 USING (node)
ORDER BY f.node
"""


# ---------------------------------------------------------------------------
# Q99 — common-neighbor / Jaccard link prediction (operators/graph.py
# common_neighbor_links) on the undirected canonical KG: propose the
# non-adjacent node pairs that close >= 2 open wedges, scored
# jaccard = common / (deg_a + deg_b - common). The KG-completion
# candidate generator a curation loop runs after canonicalization. The
# oracle enumerates wedges with NOT EXISTS anti-semantics instead of the
# operator's left_anti join.
# ---------------------------------------------------------------------------

_LP_MIN_COMMON = 2


def q99_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import common_neighbor_links

    docs = _docs(spark, sf_dir)
    edges = extract_token_triples(docs, TRIGGERS).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    r = common_neighbor_links(edges, min_common=_LP_MIN_COMMON)
    return r.select(
        "a", "b", "common", "deg_a", "deg_b",
        _rz(F.col("jaccard"), 6).alias("jaccard"),
    ).orderBy("a", "b")


def _q99_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] IN {trig_list}
), e AS (
  SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
  FROM raw WHERE least(s, d) < greatest(s, d)
), adj AS (
  SELECT u AS w, v AS n FROM e UNION ALL SELECT v AS w, u AS n FROM e
), deg AS (
  SELECT w, count(*)::bigint AS deg FROM adj GROUP BY w
), common AS (
  SELECT x.n AS a, y.n AS b, count(*)::bigint AS common
  FROM adj x JOIN adj y ON x.w = y.w AND x.n < y.n
  GROUP BY x.n, y.n
  HAVING count(*) >= {_LP_MIN_COMMON}
), cand AS (
  SELECT * FROM common c
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = c.a AND e.v = c.b)
)
SELECT c.a, c.b, c.common, da.deg AS deg_a, db.deg AS deg_b,
       round(c.common::double / (da.deg + db.deg - c.common), 6) + 0.0
         AS jaccard
FROM cand c
JOIN deg da ON da.w = c.a
JOIN deg db ON db.w = c.b
ORDER BY c.a, c.b
"""


# ---------------------------------------------------------------------------
# Q100 — ontology subsumption closure (operators/graph.py
# transitive_closure_mindist): all-pairs min hop-distance <= 8 over the
# KG's containment hierarchy (pred = 'component'), computed in 3
# min-plus DOUBLING rounds (log2(diameter) joins, vs the oracle's
# depth-by-depth recursive CTE — two different closure algorithms
# agreeing exactly). The full materialization of what bfs_closure (G5,
# biocyc_ontology.py:45-79) walks from fixed roots.
# ---------------------------------------------------------------------------

_TC_DOUBLINGS = 3  # closes distances <= 2**3 = 8


def q100_subsumption_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import transitive_closure_mindist

    docs = _docs(spark, sf_dir)
    hier = (
        extract_token_triples(docs, TRIGGERS)
        .filter(F.col("pred") == "component")
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    )
    return transitive_closure_mindist(hier, doublings=_TC_DOUBLINGS).orderBy(
        "src", "dst"
    )


# DuckDB feature req: WITH RECURSIVE (core). The UNION (not UNION ALL)
# dedupes (s, d, dist) triples per level so cyclic token graphs terminate
# under the dist < 8 cap.
def _q100_sql() -> str:
    max_dist = 2 ** _TC_DOUBLINGS
    # the 'merge' trigger maps to pred 'component' (TRIGGERS)
    return f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] = 'merge'
), r AS (
  SELECT s, d, 1 AS dist FROM e
  UNION
  SELECT r.s, e.d, r.dist + 1 FROM r JOIN e ON e.s = r.d
  WHERE r.dist < {max_dist}
)
SELECT s AS src, d AS dst, min(dist)::int AS dist
FROM r WHERE s <> d
GROUP BY s, d
ORDER BY src, dst
"""



# ---------------------------------------------------------------------------
# Q101 — Johnson-Lindenstrauss compression + measured distortion
# (operators/embeddings.jl_project): project the 64-dim float embeddings
# onto 16 deterministic md5-derived +-1 sign rows in exact int64, then
# report, for each consecutive-id vector pair, the original vs projected
# cosine and the absolute distortion — the JL guarantee measured instead
# of cited. The projection itself is bit-exact (integer signed sums);
# only the final cosines are floats, rounded-6 on both engines.
# ---------------------------------------------------------------------------

_JL_OUT_DIM = 16


def q101_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.embeddings import jl_project
    from pathhier_spark.operators.similarity import cosine_expr

    emb = _tbl(spark, sf_dir, "embeddings")
    proj = jl_project(
        emb, in_dim=_EMB_DIM, out_dim=_JL_OUT_DIM
    ).localCheckpoint(eager=True)

    # cast to double BEFORE the multiply: Spark's float32*float32 rounds
    # each product to float32 while the oracle's ::double * ::double does
    # not — at ~1000 pairs the 7th-decimal drift lands on round-half
    # boundaries (q12 dodges this only by sampling 10 queries)
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    pairs = (
        emb.select(F.col("vec_id").alias("a"), dbl.alias("va"))
        .filter(F.col("a") % 2 == 0)
        .join(
            emb.select((F.col("vec_id") - 1).alias("a"), dbl.alias("vb")),
            "a",
        )
    )
    ppairs = (
        proj.select(F.col("vec_id").alias("a"), F.col("proj").alias("pa"))
        .join(
            proj.select(
                (F.col("vec_id") - 1).alias("a"), F.col("proj").alias("pb")
            ),
            "a",
        )
    )
    idot = F.aggregate(
        F.zip_with("pa", "pb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )

    def _inorm(c):
        return F.sqrt(
            F.aggregate(
                F.col(c), F.lit(0).cast("long"), lambda acc, x: acc + x * x
            ).cast("double")
        )

    cos_proj = idot.cast("double") / (_inorm("pa") * _inorm("pb"))
    out = pairs.join(ppairs, "a").select(
        "a",
        (F.col("a") + 1).alias("b"),
        _rz(cosine_expr(F.col("va"), F.col("vb")), 6).alias("cos_orig"),
        _rz(cos_proj, 6).alias("cos_proj"),
        # distortion from the ALREADY-ROUNDED cosines: the raw difference
        # sits at round-half boundaries whenever the engines' float32-vs-
        # double multiply diverges in the 7th decimal (observed at
        # sf0.001: 0.438375 vs 0.438376)
        _rz(
            F.abs(
                _rz(cosine_expr(F.col("va"), F.col("vb")), 6)
                - _rz(cos_proj, 6)
            ),
            6,
        ).alias("abs_err"),
    )
    return out.orderBy("a")


# DuckDB feature req: md5() + list higher-order fns (core). The +-1 sign
# matrix is re-derived from the same md5 formula; the projection compares
# as exact int64, the cosines as round-6 doubles (q24's discipline).
def _q101_sql() -> str:
    d, od = _EMB_DIM, _JL_OUT_DIM
    sign_key = "'jl:' || j.j::varchar || ':' || i.i::varchar"
    quant = "list_transform(embedding, x -> floor(x::double * 1000000)::bigint)"
    fdot = (
        "list_sum(list_transform(generate_series(1, {n}),"
        " i -> {a}[i]::double * {b}[i]::double))"
    )
    return f"""
WITH coef AS (
  SELECT j.j AS j, i.i AS i,
         CASE WHEN {_sql_hex32(sign_key)} % 2 = 0 THEN 1 ELSE -1 END AS s
  FROM range(0, {od}) j(j), range(0, {d}) i(i)
), mat AS (
  SELECT j, list(s ORDER BY i) AS ss FROM coef GROUP BY j
), pr AS (
  SELECT vec_id, list(comp ORDER BY j) AS proj FROM (
    SELECT e.vec_id, m.j,
           list_sum(list_transform(generate_series(1, {d}),
             i -> qv[i] * m.ss[i]))::bigint AS comp
    FROM (SELECT vec_id, {quant} AS qv FROM embeddings) e, mat m
  ) GROUP BY vec_id
), pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b, a.embedding AS va, b.embedding AS vb,
         pa.proj AS pa, pb.proj AS pb
  FROM embeddings a
  JOIN embeddings b ON b.vec_id = a.vec_id + 1
  JOIN pr pa ON pa.vec_id = a.vec_id
  JOIN pr pb ON pb.vec_id = b.vec_id
  WHERE a.vec_id % 2 = 0
), scored AS (
  SELECT a, b,
         {fdot.format(n=d, a='va', b='vb')}
           / (sqrt({fdot.format(n=d, a='va', b='va')})
              * sqrt({fdot.format(n=d, a='vb', b='vb')})) AS cos_orig,
         list_sum(list_transform(generate_series(1, {od}),
                                 i -> pa[i] * pb[i]))::double
           / (sqrt(list_sum(list_transform(pa, x -> x * x))::double)
              * sqrt(list_sum(list_transform(pb, x -> x * x))::double))
           AS cos_proj
  FROM pairs
)
SELECT a, b, (round(cos_orig, 6) + 0.0) AS cos_orig,
       (round(cos_proj, 6) + 0.0) AS cos_proj,
       (round(abs(round(cos_orig, 6) - round(cos_proj, 6)), 6) + 0.0)
         AS abs_err
FROM scored ORDER BY a
"""




# ---------------------------------------------------------------------------
# Q102 — corpus distribution drift (PSI) between two snapshots
# (operators/textstats.psi_drift): split documents by doc_id parity into a
# baseline and a current snapshot, bucket by whitespace-token length
# (width-32 buckets, top-capped), and report the per-bucket Population
# Stability Index contribution with Laplace-smoothed exact-int64 counts —
# the drift monitor a continuously-ingesting 100 TB pipeline runs per
# crawl. One combiner groupBy touches corpus-sized data; everything after
# is a 2*n_buckets-row broadcast. Counts compare exact; psi_term is the
# q06 rounded-ln discipline (exact int->double divisions, one ln, round-6).
# ---------------------------------------------------------------------------

_PSI_BUCKETS = 20


def q102_dist_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import psi_drift, with_token_counts

    docs = _docs(spark, sf_dir)
    # bucket width 32 is a power of two: ws/32.0 is an EXACT double (no
    # floor-vs-intdiv divergence against the oracle's // 32)
    bucketed = with_token_counts(docs).select(
        F.least(
            F.floor(F.col("ws_tokens") / F.lit(32)).cast("long"),
            F.lit(_PSI_BUCKETS - 1).cast("long"),
        ).alias("bucket"),
        (F.col("doc_id") % 2).alias("snap"),
    )
    return psi_drift(bucketed, n_buckets=_PSI_BUCKETS).orderBy("bucket")


# DuckDB feature req: core SQL only (string_split_regex, ln, range).
Q102_SQL = f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))::bigint AS ws
  FROM documents
), b AS (
  SELECT least(ws // 32, {_PSI_BUCKETS - 1}) AS bucket, doc_id % 2 AS snap FROM t
), dom AS (
  SELECT d.i AS bucket, s.j AS snap
  FROM range(0, {_PSI_BUCKETS}) d(i), range(0, 2) s(j)
), c AS (
  SELECT dom.bucket, dom.snap, (count(b.bucket) + 1)::bigint AS c
  FROM dom LEFT JOIN b ON b.bucket = dom.bucket AND b.snap = dom.snap
  GROUP BY dom.bucket, dom.snap
), w AS (
  SELECT bucket,
         sum(CASE WHEN snap = 0 THEN c END)::bigint AS c_a,
         sum(CASE WHEN snap = 1 THEN c END)::bigint AS c_b
  FROM c GROUP BY bucket
), tot AS (
  SELECT sum(c_a)::bigint AS n_a, sum(c_b)::bigint AS n_b FROM w
)
SELECT bucket, c_a, c_b,
       (round((c_a::double / n_a::double - c_b::double / n_b::double)
              * ln((c_a::double / c_b::double) * (n_b::double / n_a::double)),
              6) + 0.0) AS psi_term
FROM w, tot
ORDER BY bucket
"""



# ---------------------------------------------------------------------------
# Q103 — exact phrase search over positional postings
# (operators/retrieval.phrase_search): every document containing the
# adjacent-token phrase "table scan", with occurrence count and first
# match offset — the positional-intersection retrieval primitive q63's
# bag-of-words BM25 cannot express. The Spark side intersects per-term
# positional postings with (id, pos-k) equi-joins; the oracle scans each
# doc's token list directly (a genuinely different algorithm), so the
# hash checks the index semantics, not a replay. All-integer output.
# ---------------------------------------------------------------------------

_PHRASE = ["table", "scan"]


def q103_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.retrieval import phrase_search

    docs = _docs(spark, sf_dir)
    return phrase_search(docs, _PHRASE).orderBy("doc_id")


# DuckDB feature req: core list fns only (generate_series, list_filter).
Q103_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         list_filter(generate_series(1, greatest(len(toks) - 1, 0)),
                     i -> toks[i] = 'table' AND toks[i + 1] = 'scan') AS hits
  FROM t
)
SELECT doc_id, len(hits)::bigint AS n_hits, (hits[1] - 1)::bigint AS first_pos
FROM m
WHERE len(hits) > 0
ORDER BY doc_id
"""



# ---------------------------------------------------------------------------
# Q104 — per-source chi-square token-distribution anomaly
# (operators/profile.source_chisq): goodness-of-fit of every source's
# token mix against the corpus — the "which crawl source looks wrong"
# curation score (q102's PSI compares two snapshots; this ranks groups
# within one). All counts exact int64 from one combiner groupBy; the
# per-token statistic squares an EXACT integer residual in double, and
# the per-group sum folds in token order (the q63 discipline), so both
# engines produce the identical double. Output one row per source.
# ---------------------------------------------------------------------------


def q104_source_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import source_chisq

    docs = _docs(spark, sf_dir)
    return source_chisq(docs).orderBy("source")


# DuckDB feature req: core SQL + list(ORDER BY)/list_sum (the q63 fold).
Q104_SQL = """
WITH t AS (
  SELECT source AS grp,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS token
  FROM documents
), obs AS (
  SELECT grp, token, count(*)::bigint AS obs FROM t GROUP BY grp, token
), gt AS (
  SELECT grp, sum(obs)::bigint AS grp_total FROM obs GROUP BY grp
), tt AS (
  SELECT token, sum(obs)::bigint AS tok_total FROM obs GROUP BY token
), c AS (
  SELECT sum(obs)::bigint AS corpus_total FROM obs
), dense AS (
  SELECT gt.grp, tt.token, gt.grp_total, tt.tok_total,
         coalesce(o.obs, 0)::bigint AS obs
  FROM gt CROSS JOIN tt
  LEFT JOIN obs o ON o.grp = gt.grp AND o.token = tt.token
), terms AS (
  SELECT grp, token, grp_total,
         ((obs * corpus_total - tok_total * grp_total)::double
          * (obs * corpus_total - tok_total * grp_total)::double)
         / (corpus_total::double * tok_total::double * grp_total::double) AS trm
  FROM dense, c
)
SELECT grp AS source,
       any_value(grp_total) AS n_tokens,
       (round(list_sum(list(trm ORDER BY token)), 6) + 0.0) AS chi2
FROM terms
GROUP BY grp
ORDER BY source
"""



# ---------------------------------------------------------------------------
# Q105 — Cohen's kappa: declared lang vs predicted lang
# (operators/profile.cohens_kappa over textstats.with_lang_id): the
# chance-corrected scalar summary of q15's confusion matrix — "is the
# lang-ID operator actually agreeing with the declared labels beyond
# chance?". All counts/marginals exact int64 from one combiner groupBy;
# po/pe/kappa are fixed-shape int64->double divisions, round-6.
# ---------------------------------------------------------------------------


def q105_lang_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import cohens_kappa
    from pathhier_spark.operators.textstats import with_lang_id

    docs = _docs(spark, sf_dir)
    return cohens_kappa(with_lang_id(docs), "lang", "lang_pred")


# DuckDB feature req: core SQL; the pred CTE is q15's oracle argmax.
def _q105_sql() -> str:
    import re as _re

    q15 = _q15_sql()
    pred_cte = q15[q15.index("WITH t AS") : q15.index("SELECT lang, lang_pred, count(*)")]
    return f"""
{pred_cte.rstrip()}, cm AS (
  SELECT lang AS ka, lang_pred AS kb, count(*)::bigint AS n FROM pred
  GROUP BY 1, 2
), scalars AS (
  SELECT sum(n)::bigint AS n_total,
         coalesce(sum(n) FILTER (ka = kb), 0)::bigint AS n_agree
  FROM cm
), r AS (SELECT ka, sum(n)::bigint AS ra FROM cm GROUP BY ka),
c AS (SELECT kb, sum(n)::bigint AS cb FROM cm GROUP BY kb),
pe_n AS (
  SELECT coalesce(sum(ra * cb), 0)::bigint AS pe_num
  FROM r JOIN c ON r.ka = c.kb
)
SELECT n_total, n_agree,
       (round(n_agree::double / n_total::double, 6) + 0.0) AS po,
       (round(pe_num::double / (n_total::double * n_total::double), 6) + 0.0) AS pe,
       CASE WHEN pe_num::double / (n_total::double * n_total::double) < 1.0
            THEN (round((n_agree::double / n_total::double
                         - pe_num::double / (n_total::double * n_total::double))
                        / (1.0 - pe_num::double / (n_total::double * n_total::double)),
                        6) + 0.0)
       END AS kappa
FROM scalars, pe_n
"""



# ---------------------------------------------------------------------------
# Q106 — vocabulary coverage curve (operators/textstats.vocab_coverage):
# the smallest most-frequent-first vocabulary reaching 500/900/990
# per-mille of token mass, plus the coverage it actually achieves — the
# tokenizer-sizing statistic that budgets q62's BPE merges. Thresholds
# are integer cross-multiplies (cum*1000 >= p*total, no float CDF); the
# only window runs over the VOCAB-sized count table (the q45 argument).
# ---------------------------------------------------------------------------

_COVERAGE_PERMILLES = [500, 900, 990]


def q106_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import vocab_coverage

    docs = _docs(spark, sf_dir)
    return vocab_coverage(docs, _COVERAGE_PERMILLES)


# DuckDB feature req: core SQL (window, integer arithmetic).
Q106_SQL = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS token
  FROM documents
), counts AS (
  SELECT token, count(*)::bigint AS n FROM tok GROUP BY token
), ranked AS (
  SELECT row_number() OVER (ORDER BY n DESC, token ASC) AS rank,
         sum(n) OVER (ORDER BY n DESC, token ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint AS cum
  FROM counts
), tot AS (
  SELECT sum(n)::bigint AS total FROM counts
), targets AS (
  SELECT unnest([{', '.join(str(p) for p in _COVERAGE_PERMILLES)}])::bigint AS permille
)
SELECT t.permille,
       min(r.rank)::bigint AS vocab_size,
       (round(min_by(r.cum, r.rank)::double / any_value(tot.total)::double, 6) + 0.0) AS coverage
FROM targets t, ranked r, tot
WHERE r.cum * 1000 >= t.permille * tot.total
GROUP BY t.permille
ORDER BY t.permille
"""



# ---------------------------------------------------------------------------
# Q107 — reciprocal best match over the q07 candidate scores
# (operators/align.mutual_best_match): the high-precision alignment rule
# — keep (doc, part) pairs where each is the other's argmax — computed
# as two combiner argmax aggregations + one equi-join (no windows, no
# sequential greedy passes). Scores are rounded BEFORE the argmax so
# ties are decided identically on both engines; the oracle reuses q07's
# full candidate SQL and resolves both argmaxes with row_number windows
# — a different mechanism agreeing exactly.
# ---------------------------------------------------------------------------


def q107_mutual_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.align import mutual_best_match

    cands = q07_candidate_link_parts(spark, sf_dir)
    return mutual_best_match(
        cands, "doc_id", "p_partkey", "cand_score"
    ).orderBy("doc_id")


# DuckDB feature req: core SQL; embeds q07's oracle as a nested-WITH CTE.
def _q107_sql() -> str:
    return f"""
WITH cand AS ({_q07_sql()}),
bl AS (
  SELECT doc_id, p_partkey, cand_score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY cand_score DESC, p_partkey ASC) AS rn
  FROM cand
), br AS (
  SELECT doc_id, p_partkey,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY cand_score DESC, doc_id ASC) AS rn
  FROM cand
)
SELECT bl.doc_id, bl.p_partkey, bl.cand_score
FROM bl JOIN br ON bl.doc_id = br.doc_id AND bl.p_partkey = br.p_partkey
WHERE bl.rn = 1 AND br.rn = 1
ORDER BY bl.doc_id
"""



# ---------------------------------------------------------------------------
# Q108 — KG edge reciprocity (operators/graph.reciprocity): fraction of
# distinct directed subject->object edges whose reverse also exists —
# the network-metrology probe for symmetric-predicate leaks in the
# extracted web KG. All-integer counts (one distinct + one left-semi
# self-join on the checkpointed edge set); the division is the only
# double, round-6.
# ---------------------------------------------------------------------------


def q108_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import reciprocity

    docs = _docs(spark, sf_dir)
    edges = extract_token_triples(docs, TRIGGERS).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return reciprocity(edges)


# DuckDB feature req: core SQL. Edge derivation is q95's raw CTE, kept
# DIRECTED (no least/greatest canonicalization).
def _q108_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] IN {trig_list}
), e AS (
  SELECT DISTINCT s AS u, d AS v FROM raw WHERE s <> d
), n AS (
  SELECT count(*)::bigint AS n_edges FROM e
), r AS (
  SELECT count(*)::bigint AS n_reciprocal
  FROM e WHERE EXISTS (SELECT 1 FROM e e2 WHERE e2.u = e.v AND e2.v = e.u)
)
SELECT n_edges, n_reciprocal,
       (round(n_reciprocal::double / n_edges::double, 6) + 0.0) AS reciprocity
FROM n, r
"""



# ---------------------------------------------------------------------------
# Q109 — KWIC snippets for the q103 phrase
# (operators/retrieval.kwic_snippets): +-3-token context around the
# FIRST "table scan" occurrence per matching doc — the search-preview
# surface composing phrase_search with a broadcast join-back and a pure
# column-expression token slice. The oracle re-derives the first match
# by walking the token list and slices with list_slice — different
# mechanism, same snippet string.
# ---------------------------------------------------------------------------

_KWIC_WINDOW = 3


def q109_kwic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.retrieval import kwic_snippets

    docs = _docs(spark, sf_dir)
    return kwic_snippets(docs, _PHRASE, window=_KWIC_WINDOW).orderBy("doc_id")


# DuckDB feature req: core list fns (list_slice / array_to_string).
Q109_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id, toks,
         list_filter(generate_series(1, greatest(len(toks) - 1, 0)),
                     i -> toks[i] = 'table' AND toks[i + 1] = 'scan') AS hits
  FROM t
)
SELECT doc_id,
       (hits[1] - 1)::bigint AS first_pos,
       len(hits)::bigint AS n_hits,
       array_to_string(
         list_slice(toks, greatest(hits[1] - {_KWIC_WINDOW}, 1),
                    hits[1] + 1 + {_KWIC_WINDOW}), ' ') AS snippet
FROM m
WHERE len(hits) > 0
ORDER BY doc_id
"""



# ---------------------------------------------------------------------------
# Q110 — degree assortativity of the extracted KG
# (operators/graph.degree_assortativity): Pearson r of endpoint degrees
# over the canonical undirected edge set, symmetrized (both
# orientations) — with q95's clustering and q108's reciprocity, the
# one-look structural fingerprint. Six exact-int64 Pearson sums from
# one aggregate; r is a fixed shape of double products, round-6.
# ---------------------------------------------------------------------------


def q110_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import degree_assortativity

    docs = _docs(spark, sf_dir)
    edges = extract_token_triples(docs, TRIGGERS).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return degree_assortativity(edges)


# DuckDB feature req: core SQL. Edge/degree derivation matches q95's e/deg.
def _q110_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] IN {trig_list}
), e AS (
  SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
  FROM raw WHERE least(s, d) < greatest(s, d)
), deg AS (
  SELECT node, count(*)::bigint AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
  ) GROUP BY node
), xy AS (
  SELECT du.deg AS x, dv.deg AS y
  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
), sym AS (
  SELECT x, y FROM xy UNION ALL SELECT y AS x, x AS y FROM xy
), sums AS (
  SELECT count(*)::bigint AS n, sum(x)::bigint AS sx, sum(y)::bigint AS sy,
         sum(x * y)::bigint AS sxy, sum(x * x)::bigint AS sxx,
         sum(y * y)::bigint AS syy
  FROM sym
)
SELECT n AS n_pairs,
       CASE WHEN (n::double * sxx::double - sx::double * sx::double) > 0
             AND (n::double * syy::double - sy::double * sy::double) > 0
            THEN (round((n::double * sxy::double - sx::double * sy::double)
                        / sqrt((n::double * sxx::double - sx::double * sx::double)
                               * (n::double * syy::double - sy::double * sy::double)),
                        6) + 0.0)
       END AS assortativity
FROM sums
"""


# ---------------------------------------------------------------------------
# Q111 — redirect-chain resolution via pointer doubling
# (operators/graph.resolve_chains): every URL of a deterministic redirect
# forest resolves to its terminal in O(log chain-length) self-join
# rounds — the parallel path-compression primitive behind URL
# canonicalization, alias->canonical maps, and symlink forests. The
# synthetic forest (doc_id % 16 != 0 redirects to doc_id - 1) has chain
# lengths 1..15, so convergence takes 4 doubling rounds; the oracle
# re-WALKS the same forest with a recursive CTE (different mechanism,
# same terminals + exact hop counts).
# ---------------------------------------------------------------------------


def q111_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import resolve_chains

    docs = _docs(spark, sf_dir)
    url = lambda c: F.concat(F.lit("https://r.example.com/"), c.cast("string"))  # noqa: E731
    edges = docs.filter(F.col("doc_id") % 16 != 0).select(
        url(F.col("doc_id")).alias("src"),
        url(F.col("doc_id") - 1).alias("dst"),
    )
    return resolve_chains(edges).orderBy("src")


# DuckDB feature req: WITH RECURSIVE (core). The oracle walks the chain
# hop-by-hop — mechanism-independent parity with the doubling operator.
Q111_SQL = """
WITH RECURSIVE edges AS (
  SELECT 'https://r.example.com/' || doc_id::varchar AS src,
         'https://r.example.com/' || (doc_id - 1)::varchar AS dst
  FROM documents WHERE doc_id % 16 <> 0
), walk AS (
  SELECT src, dst AS cur, 1::bigint AS hops FROM edges
  UNION ALL
  SELECT w.src, e.dst, w.hops + 1
  FROM walk w JOIN edges e ON e.src = w.cur
)
SELECT w.src, w.cur AS final, w.hops
FROM walk w
WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = w.cur)
ORDER BY w.src
"""


# ---------------------------------------------------------------------------
# Q112 — TrustRank over the extracted KG
# (operators/graph.trustrank_fixedpoint): seeded-teleport PageRank — the
# web-spam/trust-propagation classic (Gyongyi et al., VLDB 2004). Seeds
# are md5-derived (first hex digit 0 or 1, ~1/8 of nodes) so both
# engines select the identical set with no RNG; the oracle reuses the
# q51/q57 unrolled round chain with the seed predicate threaded through
# r0 and the teleport term.
# ---------------------------------------------------------------------------

_TR_SEED_WHERE = "substr(md5(node), 1, 1) IN ('0', '1')"


def q112_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import trustrank_fixedpoint

    docs = _docs(spark, sf_dir)
    edges = (
        extract_token_triples(docs, TRIGGERS)
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)  # seeds + operator both read it
    )
    seeds = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .filter(F.substring(F.md5(F.col("node")), 1, 1).isin("0", "1"))
    )
    return trustrank_fixedpoint(
        edges, seeds, iterations=_PR_ITERS, damping_pct=_PR_DAMP,
        scale=_PR_SCALE,
    ).select("node", "rank_fp", _rz(F.col("rank"), 6).alias("rank"))


def _q112_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    return _sql_pagerank_chain(
        f"""  SELECT DISTINCT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t FROM documents)
  )
  WHERE t[i] IN {trig_list}""",
        seed_where=_TR_SEED_WHERE,
    )


# ---------------------------------------------------------------------------
# Q113 — co-citation similarity over the extracted KG
# (operators/graph.cocitation_pairs): two objects are similar when the
# same subjects link to both (Small 1973). The hub guard — drop sources
# above max_out_degree BEFORE the per-source pair expansion — is the
# whole scale story: expansion is quadratic in out-degree, and the guard
# bounds it. min_count prunes single-co-citation noise.
# ---------------------------------------------------------------------------

_COCITE_MAX_OUTDEG = 50
_COCITE_MIN_COUNT = 2


def q113_cocitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import cocitation_pairs

    docs = _docs(spark, sf_dir)
    edges = extract_token_triples(docs, TRIGGERS).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return cocitation_pairs(
        edges,
        max_out_degree=_COCITE_MAX_OUTDEG,
        min_count=_COCITE_MIN_COUNT,
    ).orderBy("dst_a", "dst_b")


def _q113_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t FROM documents)
  )
  WHERE t[i] IN {trig_list}
), e AS (
  SELECT DISTINCT s, d FROM raw
), deg AS (
  SELECT s, count(*) AS outdeg FROM e GROUP BY s
), kept AS (
  SELECT e.s, e.d FROM e JOIN deg ON deg.s = e.s
  WHERE deg.outdeg <= {_COCITE_MAX_OUTDEG}
)
SELECT l.d AS dst_a, r.d AS dst_b, count(*)::bigint AS n_cociting
FROM kept l JOIN kept r ON l.s = r.s AND l.d < r.d
GROUP BY l.d, r.d
HAVING count(*) >= {_COCITE_MIN_COUNT}
ORDER BY dst_a, dst_b
"""


# ---------------------------------------------------------------------------
# Q114 — Heaps'-law vocabulary growth curve
# (operators/textstats.heaps_curve): vocabulary size after each decile
# prefix of the corpus in doc_id order — the V(n) ~ K*n^beta curve that
# sizes tokenizer vocabularies and predicts new-vocabulary yield of the
# next crawl tranche. Exact with NO global sort: slice boundaries are
# integer id thresholds, "vocab after prefix" counts tokens by their
# min-doc_id first occurrence, thresholds broadcast onto vocab-sized and
# doc-sized tables.
# ---------------------------------------------------------------------------

_HEAPS_SLICES = 10


def q114_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import heaps_curve

    docs = _docs(spark, sf_dir)
    return heaps_curve(docs, _HEAPS_SLICES).orderBy("slice_idx")


# DuckDB feature req: core SQL (generate_series, list_filter/unnest).
Q114_SQL = f"""
WITH tok AS (
  SELECT doc_id AS id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
), first AS (
  SELECT token, min(id) AS first_id FROM tok GROUP BY token
), per_doc AS (
  SELECT id, count(*)::bigint AS n_tok FROM tok GROUP BY id
), bounds AS (
  SELECT s AS slice_idx,
         ((SELECT max(doc_id) FROM documents) + 1) * s // {_HEAPS_SLICES}
           AS id_threshold
  FROM generate_series(1, {_HEAPS_SLICES}) t(s)
), vocab AS (
  SELECT b.slice_idx, count(*)::bigint AS vocab_size
  FROM bounds b JOIN first f ON f.first_id < b.id_threshold
  GROUP BY b.slice_idx
), dt AS (
  SELECT b.slice_idx, count(*)::bigint AS n_docs,
         sum(p.n_tok)::bigint AS n_tokens
  FROM bounds b JOIN per_doc p ON p.id < b.id_threshold
  GROUP BY b.slice_idx
)
SELECT b.slice_idx, b.id_threshold,
       coalesce(dt.n_docs, 0)::bigint AS n_docs,
       coalesce(dt.n_tokens, 0)::bigint AS n_tokens,
       coalesce(v.vocab_size, 0)::bigint AS vocab_size
FROM bounds b
LEFT JOIN dt ON dt.slice_idx = b.slice_idx
LEFT JOIN vocab v ON v.slice_idx = b.slice_idx
ORDER BY b.slice_idx
"""


# ---------------------------------------------------------------------------
# Q115 — exact neighborhood function of the extracted KG
# (operators/graph.neighborhood_function): ordered reachable pairs
# within h hops, h = 1..3 — the curve whose 90% point is the effective
# diameter (ANF). The exact pair-table form is the verification
# baseline; the production path is hyperball_neighborhood (one HLL
# counter per node, O(|V|*m) state), pinned against this exact curve in
# pytest at <= 5% per-hop relative error.
# ---------------------------------------------------------------------------

_NEIGH_HOPS = 3


def q115_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import neighborhood_function

    docs = _docs(spark, sf_dir)
    edges = extract_token_triples(docs, TRIGGERS).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return neighborhood_function(edges, max_hops=_NEIGH_HOPS).orderBy("hop")


def _q115_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t FROM documents)
  )
  WHERE t[i] IN {trig_list}
), e AS (
  SELECT DISTINCT s, d FROM raw
), r1 AS (
  SELECT s AS u, d AS v FROM e
), r2 AS (
  SELECT DISTINCT u, v FROM (
    SELECT r.u, e.d AS v FROM r1 r JOIN e ON r.v = e.s
    UNION ALL SELECT u, v FROM r1
  )
), r3 AS (
  SELECT DISTINCT u, v FROM (
    SELECT r.u, e.d AS v FROM r2 r JOIN e ON r.v = e.s
    UNION ALL SELECT u, v FROM r2
  )
)
SELECT 1::bigint AS hop, (SELECT count(*) FROM r1)::bigint AS n_pairs
UNION ALL
SELECT 2::bigint, (SELECT count(*) FROM r2)::bigint
UNION ALL
SELECT 3::bigint, (SELECT count(*) FROM r3)::bigint
ORDER BY hop
"""


# ---------------------------------------------------------------------------
# Q116 — component-size distribution of the extracted KG
# (canonicalize.connected_components + one histogram groupBy): the KG
# health scalar set — is the graph one giant blob (over-merged
# canonicalization), confetti (under-linked extraction), or the healthy
# giant-plus-dust shape? Composes the q18 large/small-star CC kernel on
# the UNDIRECTED triple graph; the histogram is two combiner groupBys on
# the node-sized labeling. Oracle: the q18 recursive-CTE min-label
# closure + the same two-level count.
# ---------------------------------------------------------------------------


def q116_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.canonicalize import connected_components

    docs = _docs(spark, sf_dir)
    edges = extract_token_triples(docs, TRIGGERS).select(
        F.col("subj").alias("xref_a"), F.col("obj").alias("xref_b")
    )
    labels = connected_components(edges)
    return (
        labels.groupBy("component")
        .agg(F.count(F.lit(1)).alias("sz"))
        .groupBy(F.col("sz").alias("component_size"))
        .agg(F.count(F.lit(1)).alias("n_components"))
        .orderBy("component_size")
    )


def _q116_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    return f"""
WITH RECURSIVE raw AS (
  SELECT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t FROM documents)
  )
  WHERE t[i] IN {trig_list}
), sym AS (
  SELECT s AS u, d AS v FROM raw UNION SELECT d, s FROM raw
), nodes AS (
  SELECT DISTINCT u AS node FROM sym
), reach(n, m) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT r.n, s.v FROM reach r JOIN sym s ON r.m = s.u
), labels AS (
  SELECT n AS node, min(m) AS component FROM reach GROUP BY n
), sizes AS (
  SELECT component, count(*)::bigint AS sz FROM labels GROUP BY component
)
SELECT sz AS component_size, count(*)::bigint AS n_components
FROM sizes GROUP BY sz ORDER BY component_size
"""


# ---------------------------------------------------------------------------
# Q117 — gap-fill + last-observation-carried-forward
# (operators/temporal.gapfill_locf): densify each event_type's daily
# series and LOCF-fill the holes — the hypertable staple next to q49's
# rollup and q47's as-of join. Gaps are synthesized deterministically
# (days divisible by 3 dropped) since the testdata is dense; values are
# integer cents (the q49 discipline) so the carried-forward fill is
# bit-portable.
# ---------------------------------------------------------------------------


def q117_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import gapfill_locf

    ev = spark.read.parquet(_t(sf_dir, "events"))
    daily = (
        ev.filter(F.dayofmonth("ts") % 3 != 0)
        .groupBy(
            F.col("event_type").alias("series"),
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.sum(F.floor(F.col("value") * 100)).alias("value"))
    )
    return gapfill_locf(daily).orderBy("series", "day")


# DuckDB feature req: last_value(... IGNORE NULLS) window (DuckDB >= 0.9)
# and generate_series over DATE with an INTERVAL step.
Q117_SQL = """
WITH daily AS (
  SELECT event_type AS series, date_trunc('day', ts)::date AS day,
         sum(floor(value * 100))::bigint AS v
  FROM events
  WHERE date_part('day', ts)::bigint % 3 <> 0
  GROUP BY 1, 2
), span AS (
  SELECT series, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY series
), grid AS (
  SELECT s.series, unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY))::date AS day
  FROM span s
)
SELECT g.series, g.day,
       last_value(d.v IGNORE NULLS) OVER (
         PARTITION BY g.series ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )::bigint AS value,
       (CASE WHEN d.v IS NULL THEN 1 ELSE 0 END)::bigint AS is_gap
FROM grid g LEFT JOIN daily d ON d.series = g.series AND d.day = g.day
ORDER BY g.series, g.day
"""


# ---------------------------------------------------------------------------
# Q118 — mergeable quantile sketch via power-of-two bins
# (operators/textstats.quantile_bins_grouped): the quantile member of
# the deterministic sketch family — per-group state is <= 64 integer
# counters (bin = bit_length(value)) that merge by plain addition, the
# t-digest property with zero float arithmetic. Per-source n_chars
# permille bounds; the pytest pins that exact percentiles fall inside
# the reported [2^(b-1), 2^b - 1] bounds.
# ---------------------------------------------------------------------------

_QBIN_PERMILLES = [500, 900, 990]


def q118_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import quantile_bins_grouped

    docs = _docs(spark, sf_dir)
    return quantile_bins_grouped(
        docs, "source", "n_chars", _QBIN_PERMILLES
    ).orderBy("source", "permille")


# DuckDB feature req: bin() over integers (core since 0.8).
def _q118_sql() -> str:
    probes = ", ".join(f"({p})" for p in _QBIN_PERMILLES)
    return f"""
WITH hist AS (
  SELECT source AS g,
         CASE WHEN n_chars <= 0 THEN 0
              ELSE length(bin(n_chars::bigint)) END::bigint AS bin,
         count(*)::bigint AS c
  FROM documents GROUP BY 1, 2
), cum AS (
  SELECT g, bin, c,
         sum(c) OVER (PARTITION BY g ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           ::bigint AS cum,
         sum(c) OVER (PARTITION BY g)::bigint AS n
  FROM hist
), probes(permille) AS (
  VALUES {probes}
), hit AS (
  SELECT cum.g, p.permille::bigint AS permille, min(cum.bin) AS bin,
         min(cum.n) AS n
  FROM cum CROSS JOIN probes p
  WHERE cum.cum >= (p.permille * cum.n + 999) // 1000
  GROUP BY cum.g, p.permille
)
SELECT g AS source, permille, bin,
       (CASE WHEN bin <= 0 THEN 0 ELSE (1::bigint << (bin - 1)) END)::bigint
         AS lo_bound,
       (CASE WHEN bin <= 0 THEN 0
              WHEN bin >= 63 THEN 9223372036854775807
              ELSE (1::bigint << bin) - 1 END)::bigint
         AS hi_bound,
       n
FROM hit
ORDER BY source, permille
"""


# ---------------------------------------------------------------------------
# Q119 — deterministic epoch shuffle / shard assignment
# (operators/sampling.epoch_shuffle): the training-data-loader global
# shuffle without a global sort — order key is md5(salt:epoch:id), shard
# = key % n_shards, position = row_number per shard (window PARTITIONED
# BY SHARD, parallel across shards). The oracle recomputes the identical
# hex32 key and ranks with the same per-shard window.
# ---------------------------------------------------------------------------

_EPOCH_SHARDS = 8
_EPOCH_N = 1


def q119_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.sampling import epoch_shuffle

    docs = _docs(spark, sf_dir)
    return (
        epoch_shuffle(docs, n_shards=_EPOCH_SHARDS, epoch=_EPOCH_N)
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


def _q119_sql() -> str:
    key = _sql_hex32(f"'epoch:{_EPOCH_N}:' || doc_id::varchar")
    return f"""
WITH keyed AS (
  SELECT doc_id, {key} AS ekey FROM documents
), sharded AS (
  SELECT doc_id, ekey, (ekey % {_EPOCH_SHARDS})::bigint AS shard FROM keyed
)
SELECT doc_id, shard,
       row_number() OVER (PARTITION BY shard ORDER BY ekey, doc_id)::bigint
         AS pos
FROM sharded
ORDER BY shard, pos
"""


# ---------------------------------------------------------------------------
# Q120 — join-key skew probe (operators/profile.join_key_skew): the
# numbers that pick a join strategy BEFORE running it (broadcast /
# shuffle / salt — the BENCH/SKEW.md regimes as a queryable operator).
# Key frequencies are one combiner groupBy; the permille frequency uses
# the histogram-of-the-histogram trick so nothing data- or key-sized is
# ever sorted.
# ---------------------------------------------------------------------------


def q120_skew_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import join_key_skew

    ev = spark.read.parquet(_t(sf_dir, "events"))
    return join_key_skew(ev, "user_id", permille=990)


Q120_SQL = """
WITH freqs AS (
  SELECT user_id AS k, count(*)::bigint AS freq FROM events GROUP BY user_id
), hist AS (
  SELECT freq, count(*)::bigint AS nk FROM freqs GROUP BY freq
), tot AS (
  SELECT sum(nk)::bigint AS n_keys, sum(nk * freq)::bigint AS n_rows,
         max(freq)::bigint AS max_freq
  FROM hist
), cum AS (
  SELECT freq,
         sum(nk) OVER (ORDER BY freq
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           ::bigint AS cum
  FROM hist
), p AS (
  SELECT min(freq)::bigint AS p_freq
  FROM cum CROSS JOIN tot
  WHERE cum.cum >= (990 * tot.n_keys + 999) // 1000
)
SELECT t.n_rows, t.n_keys, t.max_freq, p.p_freq AS p990_freq,
       (round(t.max_freq / t.n_rows::double, 6) + 0.0) AS top1_share,
       (round(t.max_freq * t.n_keys / t.n_rows::double, 6) + 0.0)
         AS skew_factor
FROM tot t CROSS JOIN p
"""


# ---------------------------------------------------------------------------
# Q121 — metapath composition counts
# (operators/graph.metapath_counts): how often pred1 composes with pred2
# through a shared middle entity — the schema-induction signal of KG
# construction (rule candidates, path features for link prediction).
# Join key is the MIDDLE entity; the q113-style degree cap bounds the
# in_deg×out_deg fan-out before the join.
# ---------------------------------------------------------------------------

_META_MAX_DEG = 50
_META_MIN_COUNT = 2


def q121_metapaths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import metapath_counts

    docs = _docs(spark, sf_dir)
    triples = extract_token_triples(docs, TRIGGERS)
    return metapath_counts(
        triples, max_mid_degree=_META_MAX_DEG, min_count=_META_MIN_COUNT
    ).orderBy("pred1", "pred2")


def _q121_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    trig_map = ", ".join(
        f"('{k}', '{v}')" for k, v in sorted(TRIGGERS.items())
    )
    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i] AS trig, t[i+1] AS o
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t FROM documents)
  )
  WHERE t[i] IN {trig_list}
), pm(trig, p) AS (
  VALUES {trig_map}
), t AS (
  SELECT DISTINCT raw.s, pm.p, raw.o FROM raw JOIN pm ON pm.trig = raw.trig
), ind AS (
  SELECT o AS m, count(*)::bigint AS in_deg FROM t GROUP BY o
), outd AS (
  SELECT s AS m, count(*)::bigint AS out_deg FROM t GROUP BY s
), mids AS (
  SELECT ind.m FROM ind JOIN outd ON outd.m = ind.m
  WHERE ind.in_deg <= {_META_MAX_DEG} AND outd.out_deg <= {_META_MAX_DEG}
)
SELECT l.p AS pred1, r.p AS pred2, count(*)::bigint AS n_paths,
       count(DISTINCT (l.s, r.o))::bigint AS n_pairs
FROM t l JOIN mids ON mids.m = l.o JOIN t r ON r.s = l.o
GROUP BY l.p, r.p
HAVING count(*) >= {_META_MIN_COUNT}
ORDER BY pred1, pred2
"""


# ---------------------------------------------------------------------------
# Q122 — deterministic negative sampling for KG-embedding training
# (operators/graph.negative_samples): corrupt each triple's object with
# the hash-PREDECESSOR entity — RNG-free, so the training negatives are
# reproducible and both engines derive the identical corruption. The
# predecessor lookup runs as bucketed LOCF windows (never a global
# sort); bucket-head triples wrap to the global max-hash entity.
# ---------------------------------------------------------------------------

_NEG_BUCKETS = 64


def q122_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import negative_samples

    docs = _docs(spark, sf_dir)
    triples = extract_token_triples(docs, TRIGGERS)
    return negative_samples(triples, n_buckets=_NEG_BUCKETS).orderBy(
        "subj", "pred", "obj"
    )


# DuckDB feature req: last_value(IGNORE NULLS) window (>= 0.9), arg_max.
def _q122_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    trig_map = ", ".join(
        f"('{k}', '{v}')" for k, v in sorted(TRIGGERS.items())
    )
    width = (1 << 32) // _NEG_BUCKETS
    ent_h = _sql_hex32("'ent:' || ent")
    tri_h = _sql_hex32("'neg:' || s || ':' || p || ':' || o")
    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i] AS trig, t[i+1] AS o
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t FROM documents)
  )
  WHERE t[i] IN {trig_list}
), pm(trig, p) AS (
  VALUES {trig_map}
), t AS (
  SELECT DISTINCT raw.s, pm.p, raw.o FROM raw JOIN pm ON pm.trig = raw.trig
), ents AS (
  SELECT DISTINCT ent FROM (
    SELECT s AS ent FROM t UNION ALL SELECT o AS ent FROM t
  )
), eh AS (
  SELECT ent, {ent_h} AS h FROM ents
), th AS (
  SELECT s, p, o, {tri_h} AS h FROM t
), u AS (
  SELECT h, 0 AS kind, ent, NULL::varchar AS s, NULL::varchar AS p,
         NULL::varchar AS o
  FROM eh
  UNION ALL
  SELECT h, 1, NULL::varchar, s, p, o FROM th
), pe AS (
  SELECT *,
         last_value(ent IGNORE NULLS) OVER (
           PARTITION BY h // {width} ORDER BY h, kind, ent
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS prev_ent
  FROM u
), g AS (
  SELECT arg_max(ent, h) AS wrap_ent FROM eh
)
SELECT pe.s AS subj, pe.p AS pred, pe.o AS obj,
       coalesce(pe.prev_ent, g.wrap_ent) AS neg_obj
FROM pe CROSS JOIN g
WHERE pe.kind = 1 AND coalesce(pe.prev_ent, g.wrap_ent) <> pe.o
ORDER BY subj, pred, obj
"""


# ---------------------------------------------------------------------------
# Q123 — SCD2 change-point intervalization
# (operators/temporal.change_intervals): collapse each user's
# time-ordered event_type sequence into maximal same-value runs with
# [valid_from, valid_to) validity — the versioned-dimension builder
# (gaps-and-islands, both windows partitioned by key, event_id
# tiebreak for a total order).
# ---------------------------------------------------------------------------


def q123_change_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import change_intervals

    ev = spark.read.parquet(_t(sf_dir, "events"))
    return change_intervals(
        ev.select(
            F.col("user_id").alias("key"), "ts",
            F.col("event_type").alias("value"), "event_id",
        ),
        tiebreak_col="event_id",
    ).orderBy("key", "valid_from", "value")


Q123_SQL = """
WITH flagged AS (
  SELECT user_id AS k, ts AS t, event_id AS tb, event_type AS v,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT *, sum(chg) OVER (PARTITION BY k ORDER BY t, tb
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS run_id
  FROM flagged
), grouped AS (
  SELECT k, run_id, arg_min(v, t) AS value, min(t) AS valid_from,
         count(*)::bigint AS n_events
  FROM runs GROUP BY k, run_id
)
SELECT k AS key, value, valid_from,
       lead(valid_from) OVER (PARTITION BY k ORDER BY run_id) AS valid_to,
       n_events
FROM grouped
ORDER BY key, valid_from, value
"""


# ---------------------------------------------------------------------------
# Q124 — crawl-frontier politeness scheduling
# (operators/urls.frontier_schedule): per-host rate-limited fetch slots —
# same-host fetches exactly `delay` apart, md5 host offsets smear the
# start burst, hosts interleave freely. The window partitions by host
# (the natural crawl unit), so schedule length is max queue depth, not
# corpus size.
# ---------------------------------------------------------------------------

_FRONTIER_DELAY = 16


def q124_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.urls import frontier_schedule

    docs = _docs(spark, sf_dir)
    urls = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    return frontier_schedule(urls, delay=_FRONTIER_DELAY).orderBy(
        "host", "slot"
    )


def _q124_sql() -> str:
    off = _sql_hex32("host")
    return f"""
WITH urls AS (
  SELECT 'https://' || source || '.example.com/p/' || doc_id::varchar AS url,
         source || '.example.com' AS host
  FROM documents
), ranked AS (
  SELECT url, host,
         row_number() OVER (PARTITION BY host ORDER BY url)::bigint AS rank
  FROM urls
)
SELECT url, host,
       (({off} % {_FRONTIER_DELAY}) + (rank - 1) * {_FRONTIER_DELAY})::bigint
         AS slot
FROM ranked
ORDER BY host, slot
"""


# ---------------------------------------------------------------------------
# Q125 — two-sided MinHash LSH join (cross-corpus near-dup)
# (operators/dedup.minhash_cross_join): the dedup-matrix cell q11's
# self-join and q54's broadcast decontaminator both miss — fuzzy
# train-vs-holdout screening where BOTH sides are too large to
# broadcast. Band buckets are the join key (co-located shuffle, no
# corpus crosses whole); the bucket cap applies to the COMBINED
# left+right population. Corpus B is a deterministic mutation of every
# 10th document (one token appended), so every B doc should rejoin its
# source.
# ---------------------------------------------------------------------------

_XJOIN_T = 0.6


def q125_cross_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.dedup import minhash_cross_join

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" benchmark")).alias("text"),
    )
    return minhash_cross_join(
        docs, bench, bands=_LSH_BANDS, rows_per_band=_LSH_ROWS,
        num_hashes=_LSH_BANDS * _LSH_ROWS, threshold=_XJOIN_T,
    ).orderBy("id_l", "id_r")


def _q125_sql() -> str:
    nh = _LSH_BANDS * _LSH_ROWS
    k = _SHINGLE_K
    shingle_expr = f"""
    CASE WHEN len(t) >= {k}
         THEN list_distinct(list_transform(generate_series(1, len(t) - {k - 1}),
                            i -> array_to_string(t[i:i+{k - 1}], ' ')))
         ELSE [array_to_string(t, ' ')] END"""
    return f"""
WITH atoks AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM documents
), btoks AS (
  SELECT doc_id + 1000000 AS doc_id,
         string_split_regex(lower(text || ' benchmark'), '\\s+') AS t
  FROM documents WHERE doc_id % 10 = 0
), ash AS (
  SELECT doc_id, unnest({shingle_expr}) AS sh FROM atoks
), bsh AS (
  SELECT doc_id, unnest({shingle_expr}) AS sh FROM btoks
), amh AS (
  SELECT doc_id, seed, min(md5(seed || ':' || sh)) AS mh
  FROM ash, range(0, {nh}) s(seed) GROUP BY doc_id, seed
), bmh AS (
  SELECT doc_id, seed, min(md5(seed || ':' || sh)) AS mh
  FROM bsh, range(0, {nh}) s(seed) GROUP BY doc_id, seed
), abanded AS (
  SELECT doc_id, seed // {_LSH_ROWS} AS band,
         md5(string_agg(mh, '|' ORDER BY seed)) AS bucket
  FROM amh GROUP BY doc_id, seed // {_LSH_ROWS}
), bbanded AS (
  SELECT doc_id, seed // {_LSH_ROWS} AS band,
         md5(string_agg(mh, '|' ORDER BY seed)) AS bucket
  FROM bmh GROUP BY doc_id, seed // {_LSH_ROWS}
), sized AS (
  SELECT band, bucket FROM (
    SELECT band, bucket FROM abanded
    UNION ALL SELECT band, bucket FROM bbanded
  ) GROUP BY band, bucket HAVING count(*) <= 50
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_l, b.doc_id AS id_r
  FROM abanded a JOIN sized USING (band, bucket)
       JOIN bbanded b USING (band, bucket)
), ashs AS (
  SELECT doc_id, list(DISTINCT sh) AS shset FROM ash GROUP BY doc_id
), bshs AS (
  SELECT doc_id, list(DISTINCT sh) AS shset FROM bsh GROUP BY doc_id
)
SELECT p.id_l, p.id_r,
       (round(len(list_intersect(x.shset, y.shset))::double
             / len(list_distinct(list_concat(x.shset, y.shset))), 6) + 0.0)
         AS jaccard
FROM pairs p JOIN ashs x ON p.id_l = x.doc_id JOIN bshs y ON p.id_r = y.doc_id
WHERE len(list_intersect(x.shset, y.shset))::double
      / len(list_distinct(list_concat(x.shset, y.shset))) >= {_XJOIN_T}
ORDER BY id_l, id_r
"""


# ---------------------------------------------------------------------------
# Q126 — retrieval evaluation: MRR@10 / nDCG@10 of the q63 BM25 ranking
# (operators/retrieval.retrieval_eval): relevance = "document contains
# ALL query terms" (deterministic gold), metrics in the int64 micro-unit
# discipline — every log2 discount / reciprocal / ideal-DCG prefix is a
# precomputed literal, DCG an exact integer sum, so the only float ops
# are two divisions of identical int64 operands on both engines.
# ---------------------------------------------------------------------------


def q126_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.retrieval import bm25_topk, retrieval_eval
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", _tokens("text").alias("ts"))
    qsrc = (
        toks.filter(F.col("doc_id") % _BM25_QMOD == 0)
        .select(
            F.col("doc_id").alias("qid"),
            F.posexplode("ts").alias("pos", "term"),
        )
        .groupBy("qid", "term")
        .agg(F.min("pos").alias("mp"))
    )
    qw = Window.partitionBy("qid").orderBy("mp", "term")
    qterms = (
        qsrc.withColumn("rn", F.row_number().over(qw))
        .filter(F.col("rn") <= _BM25_QLEN)
        .select("qid", "term")
        .localCheckpoint(eager=True)  # feeds ranking AND relevance
    )
    ranking = bm25_topk(
        toks, qterms, F.col("ts"), k1=_BM25_K1, b=_BM25_B, k=_BM25_K
    ).select("qid", "rank", "doc_id")
    qlen = qterms.groupBy("qid").agg(F.count(F.lit(1)).alias("nq"))
    hits = (
        toks.select("doc_id", F.explode(F.array_distinct("ts")).alias("term"))
        .join(qterms, "term")
        .groupBy("qid", "doc_id")
        .agg(F.countDistinct("term").alias("c"))
    )
    relevant = (
        hits.join(F.broadcast(qlen), "qid")
        .filter(F.col("c") == F.col("nq"))
        .select("qid", "doc_id")
    )
    return retrieval_eval(ranking, relevant, k=_BM25_K).orderBy("qid")


# DuckDB feature req: core SQL. Metric constants are int64 micro-unit
# VALUES maps generated from the same Python formulas as the operator.
def _q126_sql() -> str:
    import math

    scale = 10**12
    k = _BM25_K
    w_fp = [int((1.0 / math.log2(i + 1)) * scale) for i in range(1, k + 1)]
    idcg_fp = [sum(w_fp[: i + 1]) for i in range(k)]
    mrr_fp = [scale // i for i in range(1, k + 1)]
    wmap = ", ".join(f"({i + 1}, {v})" for i, v in enumerate(w_fp))
    imap = ", ".join(f"({i + 1}, {v})" for i, v in enumerate(idcg_fp))
    mmap = ", ".join(f"({i + 1}, {v})" for i, v in enumerate(mrr_fp))
    return _sql_bm25_chain() + f""",
topk AS (
  SELECT qid, "rank", doc_id FROM ranked WHERE "rank" <= {k}
), qlen AS (
  SELECT qid, count(*)::bigint AS nq FROM qterms GROUP BY qid
), relv AS (
  SELECT x.qid, x.doc_id FROM (
    SELECT t.qid, p.doc_id, count(DISTINCT p.term) AS c
    FROM qterms t JOIN postings p USING (term)
    GROUP BY t.qid, p.doc_id
  ) x JOIN qlen USING (qid) WHERE x.c = qlen.nq
), nrel AS (
  SELECT qid, count(*)::bigint AS n_rel FROM relv GROUP BY qid
), wmap("rank", w_fp) AS (VALUES {wmap}
), imap(n, idcg_fp) AS (VALUES {imap}
), mmap("rank", m_fp) AS (VALUES {mmap}
), flags AS (
  SELECT t.qid, t."rank",
         CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
  FROM topk t LEFT JOIN relv r ON r.qid = t.qid AND r.doc_id = t.doc_id
), perq AS (
  SELECT f.qid, sum(f.rel * w.w_fp)::bigint AS dcg_fp,
         min(CASE WHEN f.rel = 1 THEN f."rank" END) AS first_rel
  FROM flags f JOIN wmap w ON w."rank" = f."rank"
  GROUP BY f.qid
)
SELECT p.qid,
       coalesce(n.n_rel, 0)::bigint AS n_rel,
       CASE WHEN p.first_rel IS NOT NULL
            THEN round(m.m_fp / 1000000000000.0, 6)
            ELSE 0.0 END AS mrr,
       CASE WHEN coalesce(n.n_rel, 0) > 0
            THEN (round(p.dcg_fp / i.idcg_fp, 6) + 0.0)
            ELSE 0.0 END AS ndcg
FROM perq p
LEFT JOIN nrel n ON n.qid = p.qid
LEFT JOIN mmap m ON m."rank" = p.first_rel
LEFT JOIN imap i ON i.n = least(coalesce(n.n_rel, 0), {k})
ORDER BY p.qid
"""


# ---------------------------------------------------------------------------
# Q127 — inverted-index materialization
# (operators/retrieval.inverted_index): the index behind q63/q07 as a
# writable table — per term df, cf, and the top-5 'doc:tf' postings.
# Emitted for the 200 highest-cf terms (cf desc, term asc) so the gate
# compares a deterministic head, not the whole vocabulary.
# ---------------------------------------------------------------------------

_IDX_TOP_TERMS = 200


def q127_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.retrieval import inverted_index
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", _tokens("text").alias("ts"))
    idx = inverted_index(toks, F.col("ts"))
    return idx.orderBy(F.col("cf").desc(), F.col("term")).limit(
        _IDX_TOP_TERMS
    )


Q127_SQL = f"""
WITH tl AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS ts
  FROM documents
), post AS (
  SELECT term, doc_id AS d, count(*)::bigint AS tf
  FROM (SELECT doc_id, unnest(ts) AS term FROM tl)
  GROUP BY term, doc_id
), stats AS (
  SELECT term, count(*)::bigint AS df, sum(tf)::bigint AS cf
  FROM post GROUP BY term
), ranked AS (
  SELECT term, d, tf,
         row_number() OVER (PARTITION BY term ORDER BY tf DESC, d ASC) AS rn
  FROM post
), head AS (
  SELECT term,
         list(d::varchar || ':' || tf::varchar ORDER BY rn) AS top_postings
  FROM ranked WHERE rn <= 5 GROUP BY term
)
SELECT s.term, s.df, s.cf, h.top_postings
FROM stats s JOIN head h USING (term)
ORDER BY s.cf DESC, s.term LIMIT {_IDX_TOP_TERMS}
"""


# ---------------------------------------------------------------------------
# Q128 — typed mention extraction (operators/extract.typed_mentions):
# the IE input surface — emails/URLs/years/numbers pulled into a
# long-format mention table by pure regexp_extract_all map passes.
# Mentions are injected deterministically (the corpus text carries
# none); extraction parity with the same regexes is the point, per the
# q88 discipline.
# ---------------------------------------------------------------------------


def q128_typed_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.extract import typed_mentions

    docs = _docs(spark, sf_dir)
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit(" u"), F.col("doc_id").cast("string"),
                    F.lit("@mail.example.org"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" https://m.example.net/d/"),
                    F.col("doc_id").cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.lit(" in "),
            (F.lit(1990) + F.col("doc_id") % 30).cast("string"),
        ).alias("text"),
    )
    m = typed_mentions(injected)
    return (
        m.groupBy("mention_type")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("mention").alias("n_distinct"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy("mention_type")
    )


# DuckDB feature req: regexp_extract_all (RE2 \b word boundaries — same
# semantics as Java's for these ASCII patterns).
Q128_SQL = r"""
WITH injected AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 2 = 0
                 THEN ' u' || doc_id::varchar || '@mail.example.org'
                 ELSE '' END
         || CASE WHEN doc_id % 3 = 0
                 THEN ' https://m.example.net/d/' || doc_id::varchar
                 ELSE '' END
         || ' in ' || (1990 + doc_id % 30)::varchar AS text
  FROM documents
), m AS (
  SELECT doc_id, 'email' AS mention_type,
         unnest(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS mention
  FROM injected
  UNION ALL
  SELECT doc_id, 'number',
         unnest(regexp_extract_all(text, '\b\d+(?:\.\d+)?\b'))
  FROM injected
  UNION ALL
  SELECT doc_id, 'url',
         unnest(regexp_extract_all(text, 'https?://[^\s<>"]+'))
  FROM injected
  UNION ALL
  SELECT doc_id, 'year',
         unnest(regexp_extract_all(text, '\b(?:19|20)\d{2}\b'))
  FROM injected
)
SELECT mention_type, count(*)::bigint AS n_mentions,
       count(DISTINCT mention)::bigint AS n_distinct,
       count(DISTINCT doc_id)::bigint AS n_docs
FROM m GROUP BY mention_type ORDER BY mention_type
"""


# ---------------------------------------------------------------------------
# Q129 — robots.txt-style longest-prefix URL filtering
# (operators/urls.url_prefix_filter): per-source disallow rules with a
# longer allow override — longest matching prefix wins (the robots.txt
# precedence rule), unmatched URLs default to allow. Broadcast rule set,
# startswith theta join, one max_by argmax per URL.
# ---------------------------------------------------------------------------


def q129_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.urls import url_prefix_filter

    docs = _docs(spark, sf_dir)
    urls = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    base = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/p/1"))
    rules = (
        docs.select("source").distinct()
        .select(
            F.explode(
                F.array(
                    F.struct(base.alias("prefix"), F.lit(0).alias("allow")),
                    F.struct(
                        F.concat(base, F.lit("2")).alias("prefix"),
                        F.lit(1).alias("allow"),
                    ),
                )
            ).alias("r")
        )
        .select("r.prefix", "r.allow")
    )
    out = url_prefix_filter(urls, rules)
    return (
        out.groupBy("matched_prefix", "allowed")
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .orderBy(
            F.col("matched_prefix").asc_nulls_first(), F.col("allowed")
        )
    )


# DuckDB feature req: starts_with, arg_max over a row() ordering value.
Q129_SQL = """
WITH urls AS (
  SELECT 'https://' || source || '.example.com/p/' || doc_id::varchar AS url
  FROM documents
), rules AS (
  SELECT prefix, allow FROM (
    SELECT 'https://' || source || '.example.com/p/1' AS p1
    FROM (SELECT DISTINCT source FROM documents)
  ), LATERAL (VALUES (p1, 0), (p1 || '2', 1)) t(prefix, allow)
), matched AS (
  -- ordering by the prefix string alone IS longest-prefix-wins: all
  -- prefixes matching one url are prefixes of each other
  SELECT u.url,
         arg_max(r.prefix, r.prefix) AS matched_prefix,
         arg_max(r.allow, r.prefix) AS win_allow
  FROM urls u LEFT JOIN rules r ON starts_with(u.url, r.prefix)
  GROUP BY u.url
)
SELECT matched_prefix, coalesce(win_allow, 1)::bigint AS allowed,
       count(*)::bigint AS n_urls
FROM matched
GROUP BY matched_prefix, win_allow
ORDER BY matched_prefix ASC NULLS FIRST, allowed
"""


# ---------------------------------------------------------------------------
# Q130 — power-law degree exponent (operators/graph.powerlaw_alpha):
# Clauset MLE alpha = 1 + n / Σ ln(deg/xmin) over the degree tail — the
# heavy-tail sanity check of the extracted KG, folded over the
# degree histogram in degree order (the q63 fixed-order fold) so the
# double sum is engine-identical.
# ---------------------------------------------------------------------------

_PL_XMIN = 2


def q130_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import powerlaw_alpha

    docs = _docs(spark, sf_dir)
    edges = extract_token_triples(docs, TRIGGERS).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return powerlaw_alpha(edges, xmin=_PL_XMIN)


def _q130_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t FROM documents)
  )
  WHERE t[i] IN {trig_list}
), e AS (
  SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
  FROM raw WHERE least(s, d) < greatest(s, d)
), deg AS (
  SELECT node, count(*)::bigint AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
  ) GROUP BY node
), hist AS (
  SELECT deg, count(*)::bigint AS nk FROM deg
  WHERE deg >= {_PL_XMIN} GROUP BY deg
), folded AS (
  SELECT sum(nk)::bigint AS n_tail, max(deg)::bigint AS max_deg,
         list_sum(list(nk * ln(deg / {float(_PL_XMIN)!r}) ORDER BY deg))
           AS lnsum
  FROM hist
)
SELECT coalesce(n_tail, 0)::bigint AS n_tail, max_deg,
       CASE WHEN lnsum > 0
            THEN (round(1.0 + n_tail / lnsum, 6) + 0.0)
       END AS alpha
FROM folded
"""


# ---------------------------------------------------------------------------
# Q131 — quality-argmax canonical selection over near-dup clusters:
# the production dedup KEEP RULE — inside each q31 cluster keep the
# HIGHEST-QUALITY member (q14's deterministic composite), not the
# min-id. Argmax is portable-by-construction: per-cluster max score
# (combiner), then min doc_id among the members achieving it — no
# struct-ordered arg_max needed on either engine.
# ---------------------------------------------------------------------------


def q131_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    members = q31_neardup_clusters(spark, sf_dir).select("doc_id", "cluster")
    docs = _docs(spark, sf_dir)
    q = with_quality_features(docs).select("doc_id", "quality_score")
    m = members.join(q, "doc_id")
    mx = m.groupBy("cluster").agg(
        F.max("quality_score").alias("kept_quality"),
        F.count(F.lit(1)).alias("n_members"),
    ).filter(F.col("n_members") >= 2)
    kept = (
        m.join(mx, "cluster")
        .filter(F.col("quality_score") == F.col("kept_quality"))
        .groupBy("cluster", "kept_quality", "n_members")
        .agg(F.min("doc_id").alias("kept_doc_id"))
    )
    return kept.select(
        "cluster", "kept_doc_id",
        (F.round("kept_quality", 6) + F.lit(0.0)).alias("kept_quality"),
        "n_members",
    ).orderBy("cluster")


def _q131_sql() -> str:
    clusters = _q31_sql().strip().rstrip()
    return f"""
WITH clusters AS (
{clusters}
), t2 AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
           AS toks
  FROM documents
), feat AS (
  SELECT doc_id,
         len(toks)::bigint AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks))::double / len(toks)
              ELSE 0 END AS distinct_ratio,
         CASE WHEN len(text) > 0
              THEN (len(text) - len(regexp_replace(text, '[^\\w\\s]', '', 'g')))::double / len(text)
              ELSE 0 END AS punct_ratio
  FROM t2
), quality AS (
  SELECT doc_id,
         round(0.4 * least(n_tokens / 100.0, 1.0)
             + 0.3 * distinct_ratio
             + 0.3 * (1.0 - least(punct_ratio * 5.0, 1.0)), 6)
           AS quality_score
  FROM feat
), m AS (
  SELECT c.cluster, c.doc_id, q.quality_score
  FROM clusters c JOIN quality q USING (doc_id)
), mx AS (
  SELECT cluster, max(quality_score) AS kept_quality,
         count(*)::bigint AS n_members
  FROM m GROUP BY cluster HAVING count(*) >= 2
)
SELECT mx.cluster, min(m.doc_id)::bigint AS kept_doc_id,
       (round(mx.kept_quality, 6) + 0.0) AS kept_quality, mx.n_members
FROM m JOIN mx ON m.cluster = mx.cluster
       AND m.quality_score = mx.kept_quality
GROUP BY mx.cluster, mx.kept_quality, mx.n_members
ORDER BY mx.cluster
"""


# ---------------------------------------------------------------------------
# Q132 — Neyman-optimal stratified sample allocation
# (operators/sampling.neyman_allocation): per-source eval-slice budget
# proportional to N_h * S_h — big AND volatile strata earn more than
# big-but-uniform ones. Exact-int64 moments (the q110 Pearson
# discipline), largest-remainder rounding summing EXACTLY to the budget.
# ---------------------------------------------------------------------------

_NEYMAN_N = 1000


def q132_neyman_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.sampling import neyman_allocation

    docs = _docs(spark, sf_dir)
    return neyman_allocation(
        docs, stratum_col="source", value_col="n_chars",
        sample_size=_NEYMAN_N,
    ).orderBy("stratum")


Q132_SQL = f"""
WITH g AS (
  SELECT source AS stratum, count(*)::bigint AS n,
         sum(n_chars)::bigint AS s,
         sum(n_chars * n_chars)::bigint AS ss
  FROM documents GROUP BY source
), w AS (
  SELECT stratum, n, s, ss,
         n::double * sqrt(greatest(
           (n::double * ss::double - s::double * s::double)
           / (n::double * n::double), 0.0)) AS wgt
  FROM g
), tot AS (
  SELECT sum(wgt) AS wtot FROM w
), raw AS (
  SELECT w.stratum, w.n, w.s, w.ss,
         w.wgt / t.wtot * {_NEYMAN_N} AS raw
  FROM w, tot t
), base AS (
  SELECT stratum, n, s, ss, raw,
         floor(raw)::bigint AS base, raw - floor(raw) AS frac
  FROM raw
), short AS (
  SELECT ({_NEYMAN_N} - sum(base))::bigint AS short FROM base
), ranked AS (
  SELECT b.*, sh.short,
         row_number() OVER (ORDER BY b.frac DESC, b.stratum) AS rk
  FROM base b, short sh
)
SELECT stratum, n AS n_rows,
       (round(s::double / n, 6) + 0.0) AS mean_value,
       (round(sqrt(greatest(
          (n::double * ss::double - s::double * s::double)
          / (n::double * n::double), 0.0)), 6) + 0.0) AS std_value,
       (base + CASE WHEN rk <= short THEN 1 ELSE 0 END)::bigint AS alloc
FROM ranked
ORDER BY stratum
"""


# ---------------------------------------------------------------------------
# Q133 — modularity of the q72 communities
# (operators/graph.modularity): the number that says whether label
# propagation found real structure (Q >> 0) or noise (Q ~ 0). Exact
# integers only until one fixed-shape division: E_in, Σd_c², m — the
# per-community float-sum of the textbook formula never happens.
# ---------------------------------------------------------------------------


def q133_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import label_propagation, modularity

    li = (
        spark.read.parquet(_t(sf_dir, "lineitem"))
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    edges = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= _LPA_MINSUP)
        .select("src", "dst")
        .localCheckpoint(eager=True)  # labels + modularity both read it
    )
    labels = label_propagation(edges, iterations=_LPA_ROUNDS)
    return modularity(edges, labels)


def _q133_sql() -> str:
    ctes = _sql_lpa_ctes()
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
und AS (
  SELECT least(u, v) AS u, greatest(u, v) AS v FROM e
), lab AS (
  SELECT node AS n, label AS lab FROM l{_LPA_ROUNDS}
), tagged AS (
  SELECT lu.lab AS lab_u, lv.lab AS lab_v
  FROM und JOIN lab lu ON lu.n = und.u JOIN lab lv ON lv.n = und.v
), counts AS (
  SELECT count(*)::bigint AS m,
         sum(CASE WHEN lab_u = lab_v THEN 1 ELSE 0 END)::bigint AS e_in
  FROM tagged
), deg AS (
  SELECT n, count(*)::bigint AS d FROM (
    SELECT u AS n FROM und UNION ALL SELECT v FROM und
  ) GROUP BY n
), comm AS (
  SELECT lab, sum(d)::bigint AS dc FROM deg JOIN lab USING (n) GROUP BY lab
), dsq AS (
  SELECT count(*)::bigint AS n_communities,
         sum(dc * dc)::bigint AS d_sq_sum
  FROM comm
)
SELECT d.n_communities, c.m AS m_edges, c.e_in, d.d_sq_sum,
       CASE WHEN c.m > 0
            THEN (round(c.e_in::double / c.m
                        - d.d_sq_sum::double / (4.0 * c.m * c.m), 6) + 0.0)
       END AS modularity
FROM counts c, dsq d
"""
    )


# ---------------------------------------------------------------------------
# Q134 — daily-rate anomaly detection per event series
# (operators/temporal.rate_anomalies): flag days whose event count sits
# more than 2σ_pop from the series' own mean — the ops readout that
# catches crawler stalls, bot floods, and pipeline gaps first. Two
# combiner groupBys (row→day, day→series moments), a broadcast join
# back, and z as one fixed shape of exact-int64 products
# (n·x − Σx)/sqrt(n·Σx² − (Σx)²), round-6 — no shuffled float sums,
# no windows. Zero-variance series emit NULL z and never flag.
# ---------------------------------------------------------------------------


def q134_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import rate_anomalies

    events = spark.read.parquet(_t(sf_dir, "events"))
    return rate_anomalies(events).orderBy("series", "day")


# DuckDB feature req: core SQL only. Same exact-integer moment shape as
# the Spark side; sums cast ::bigint so no HUGEINT leaves the CTE.
Q134_SQL = """
WITH daily AS (
  SELECT event_type AS series,
         date_trunc('day', ts)::date AS day,
         count(*)::bigint AS x
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT series, count(*)::bigint AS n, sum(x)::bigint AS sx,
         sum(x * x)::bigint AS sxx
  FROM daily GROUP BY series
), scored AS (
  SELECT d.series, d.day, d.x,
         CASE WHEN (n::double * sxx::double - sx::double * sx::double) > 0
              THEN round((n::double * d.x::double - sx::double)
                         / sqrt(n::double * sxx::double - sx::double * sx::double),
                         6)
         END AS z
  FROM daily d JOIN stats USING (series)
)
SELECT series, day, x AS n_events, (z + 0.0) AS z,
       (CASE WHEN z IS NOT NULL AND abs(z) > 2.0 THEN 1 ELSE 0 END)::bigint
         AS is_anomaly
FROM scored
ORDER BY series, day
"""


# ---------------------------------------------------------------------------
# Q135 — blocking-quality evaluation: pair completeness + reduction ratio
# (operators/dedup.blocking_quality): the two Christen-style numbers every
# entity-resolution blocking scheme is judged by, computed for the classic
# (length-bucket, first-token) standard-blocking key against q11's
# LSH-verified near-dup pairs as gold. One row out; PC/RR are fixed-shape
# doubles over exact int64 counts. The oracle reuses the shared q11 CTE
# chain (_sql_neardup_ctes) for the gold set.
# ---------------------------------------------------------------------------


def q135_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.dedup import blocking_quality

    docs = _docs(spark, sf_dir)
    sigs = minhash_signatures(
        docs, num_hashes=_LSH_BANDS * _LSH_ROWS, shingle_k=_SHINGLE_K
    )
    cands = lsh_candidate_pairs(
        sigs, bands=_LSH_BANDS, rows_per_band=_LSH_ROWS, max_bucket_size=50
    )
    gold = ngram_jaccard_pairs(
        docs, cands, shingle_k=_SHINGLE_K, threshold=_NEARDUP_T
    ).select("id_a", "id_b")
    return blocking_quality(docs, gold)


# DuckDB feature req: core SQL + list fns (same as q11; shared chain).
def _q135_sql() -> str:
    return _sql_neardup_ctes() + """,
keyed AS (
  SELECT doc_id AS id, (len(t) // 8)::varchar || '|' || t[1] AS bkey
  FROM toks
), bsized AS (
  SELECT bkey FROM keyed GROUP BY bkey HAVING count(*) <= 100
), bsmall AS (
  SELECT k.* FROM keyed k JOIN bsized USING (bkey)
), cand AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM bsmall a JOIN bsmall b USING (bkey)
  WHERE a.id < b.id
), gold AS (
  SELECT id_a, id_b FROM verified
), m AS (
  SELECT (SELECT count(*) FROM documents)::bigint AS n_docs,
         (SELECT count(*) FROM gold)::bigint AS n_gold,
         (SELECT count(*) FROM cand)::bigint AS n_cand,
         (SELECT count(*) FROM cand JOIN gold USING (id_a, id_b))::bigint
           AS n_hit
)
SELECT n_docs, n_gold, n_cand, n_hit,
       CASE WHEN n_gold > 0
            THEN (round(n_hit::double / n_gold::double, 6) + 0.0)
       END AS pair_completeness,
       (round(1.0 - n_cand::double
              / ((n_docs * (n_docs - 1)) // 2)::double, 6) + 0.0)
         AS reduction_ratio
FROM m
"""


# ---------------------------------------------------------------------------
# Q136 — functional-predicate conflict resolution (truth-discovery vote)
# (operators/extract.resolve_functional_conflicts): for every (subj, pred)
# the corpus asserts more than one object for, keep the majority object
# (ties -> lexicographically smallest) with its support/total confidence —
# the knowledge-fusion step between raw triple extraction and KG
# materialization. Only conflicted keys are emitted.
# ---------------------------------------------------------------------------


def q136_conflict_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.extract import resolve_functional_conflicts

    docs = _docs(spark, sf_dir)
    triples = extract_token_triples(docs, TRIGGERS)
    return resolve_functional_conflicts(triples).orderBy("subj", "pred")


# DuckDB feature req: core SQL + window fns. Window sums cast ::bigint so
# no HUGEINT leaves the CTE (the q46 lesson).
def _q136_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    cases = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in sorted(TRIGGERS.items())
    )
    return f"""
WITH raw AS (
  SELECT t[i-1] AS subj, CASE t[i] {cases} END AS pred, t[i+1] AS obj
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] IN {trig_list}
), votes AS (
  SELECT subj, pred, obj, count(*)::bigint AS support
  FROM raw GROUP BY subj, pred, obj
), ranked AS (
  SELECT subj, pred, obj, support,
         row_number() OVER (PARTITION BY subj, pred
                            ORDER BY support DESC, obj) AS rk,
         count(*) OVER (PARTITION BY subj, pred)::bigint AS n_obj,
         sum(support) OVER (PARTITION BY subj, pred)::bigint AS total
  FROM votes
)
SELECT subj, pred, obj AS winner_obj, support, n_obj, total,
       (round(support::double / total::double, 6) + 0.0) AS confidence
FROM ranked
WHERE rk = 1 AND n_obj > 1
ORDER BY subj, pred
"""


# ---------------------------------------------------------------------------
# Q137 — cross-split near-dup leakage audit
# (operators/sampling.split_leakage): near-dup pairs (q11's verified set)
# joined against q55's hash-split assignments, counted per unordered split
# combination — the eval-integrity check that catches held-out
# contamination by near-duplicates before training. is_cross=1 rows are
# the leaks.
# ---------------------------------------------------------------------------


def q137_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )
    from pathhier_spark.operators.sampling import hash_split, split_leakage

    docs = _docs(spark, sf_dir)
    sigs = minhash_signatures(
        docs, num_hashes=_LSH_BANDS * _LSH_ROWS, shingle_k=_SHINGLE_K
    )
    cands = lsh_candidate_pairs(
        sigs, bands=_LSH_BANDS, rows_per_band=_LSH_ROWS, max_bucket_size=50
    )
    pairs = ngram_jaccard_pairs(
        docs, cands, shingle_k=_SHINGLE_K, threshold=_NEARDUP_T
    ).select("id_a", "id_b")
    splits = hash_split(docs).select("doc_id", "split")
    return split_leakage(pairs, splits).orderBy("split_lo", "split_hi")


# DuckDB feature req: same as q11 (shared chain) + md5-hex bucket helper.
def _q137_sql() -> str:
    bucket = f"{_sql_hex32(chr(39) + 'split:' + chr(39) + ' || doc_id::varchar')} % 1000000"
    return _sql_neardup_ctes() + f""",
spl AS (
  SELECT doc_id,
         CASE WHEN b < 900000 THEN 'train'
              WHEN b < 950000 THEN 'val'
              ELSE 'test' END AS s
  FROM (SELECT doc_id, ({bucket})::bigint AS b FROM documents)
)
SELECT least(sa.s, sb.s) AS split_lo, greatest(sa.s, sb.s) AS split_hi,
       count(*)::bigint AS n_pairs,
       (CASE WHEN least(sa.s, sb.s) <> greatest(sa.s, sb.s)
             THEN 1 ELSE 0 END)::bigint AS is_cross
FROM verified v
JOIN spl sa ON sa.doc_id = v.id_a
JOIN spl sb ON sb.doc_id = v.id_b
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q138 — KG referential-integrity profile (operators/graph.kg_integrity):
# per predicate, how many edge endpoints of the extracted KG resolve to
# the broadcast ontology dictionary (part-name tokens) and how many
# dangle — the materialization-gate readout between extraction and the
# warehouse write.
# ---------------------------------------------------------------------------


def q138_kg_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import kg_integrity

    docs = _docs(spark, sf_dir)
    triples = extract_token_triples(docs, TRIGGERS)
    part = spark.read.parquet(_t(sf_dir, "part"))
    dictionary = part.select(
        F.explode(F.split(F.lower(F.col("p_name")), " ")).alias("term")
    )
    return kg_integrity(triples, dictionary).orderBy("pred")


# DuckDB feature req: core SQL. sums cast ::bigint (the q46 lesson).
def _q138_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    cases = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in sorted(TRIGGERS.items())
    )
    return f"""
WITH raw AS (
  SELECT t[i-1] AS subj, CASE t[i] {cases} END AS pred, t[i+1] AS obj
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] IN {trig_list}
), dict AS (
  SELECT DISTINCT unnest(string_split(lower(p_name), ' ')) AS term FROM part
), flagged AS (
  SELECT pred,
         CASE WHEN ds.term IS NOT NULL THEN 1 ELSE 0 END AS sf,
         CASE WHEN dd.term IS NOT NULL THEN 1 ELSE 0 END AS of
  FROM raw
  LEFT JOIN dict ds ON ds.term = raw.subj
  LEFT JOIN dict dd ON dd.term = raw.obj
), agg AS (
  SELECT pred, count(*)::bigint AS n_edges, sum(sf)::bigint AS n_subj_linked,
         sum(of)::bigint AS n_obj_linked, sum(sf * of)::bigint AS n_both_linked
  FROM flagged GROUP BY pred
)
SELECT pred, n_edges, n_subj_linked, n_obj_linked, n_both_linked,
       (round(n_subj_linked::double / n_edges::double, 6) + 0.0) AS subj_rate,
       (round(n_obj_linked::double / n_edges::double, 6) + 0.0) AS obj_rate,
       (round(n_both_linked::double / n_edges::double, 6) + 0.0) AS both_rate
FROM agg
ORDER BY pred
"""


# ---------------------------------------------------------------------------
# Q139 — per-source label-diversity profile
# (operators/profile.source_diversity): Shannon entropy of each source's
# language distribution in nats + effective number of languages (Hill D1)
# + majority label/share — the curation-dashboard diversity row. The one
# float sum folds in label order (q63/q130 fixed-order discipline).
# ---------------------------------------------------------------------------


def q139_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import source_diversity

    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return source_diversity(docs).orderBy("source")


# DuckDB feature req: list(expr ORDER BY ...) + list_sum (same as q130).
Q139_SQL = """
WITH counts AS (
  SELECT source AS grp, lang AS lab, count(*)::bigint AS c
  FROM documents GROUP BY 1, 2
), per AS (
  SELECT grp, sum(c)::bigint AS n_docs, count(*)::bigint AS n_labels,
         max(c)::bigint AS max_c,
         list_sum(list(c::double * ln(c::double) ORDER BY lab)) AS slnl
  FROM counts GROUP BY grp
), top AS (
  SELECT c.grp, min(c.lab) AS top_label
  FROM counts c JOIN per p ON p.grp = c.grp AND c.c = p.max_c
  GROUP BY c.grp
)
SELECT p.grp AS source, p.n_docs, p.n_labels, t.top_label,
       (round(p.max_c::double / p.n_docs::double, 6) + 0.0) AS top_share,
       (round(ln(p.n_docs::double) - p.slnl / p.n_docs::double, 6) + 0.0)
         AS entropy,
       (round(exp(ln(p.n_docs::double) - p.slnl / p.n_docs::double), 6)
        + 0.0) AS effective_labels
FROM per p JOIN top t ON t.grp = p.grp
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Q140 — TextRank keyword extraction (operators/textstats.textrank_keywords):
# PageRank over the undirected adjacent-token co-occurrence graph, top-50
# tokens = the corpus keywords (Mihalcea & Tarau 2004). Rides the shared
# fixed-point kernel + _sql_pagerank_chain oracle (q51/q57/q112 family);
# the only new SQL is the adjacency edge CTE and the top-k wrapper.
# ---------------------------------------------------------------------------

_TEXTRANK_K = 50


def q140_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import textrank_keywords

    docs = _docs(spark, sf_dir)
    return textrank_keywords(docs, k=_TEXTRANK_K).orderBy("kw_rank")


# DuckDB feature req: core SQL (nested WITH in a subquery). Tie-break
# (rank_fp DESC, token) is total, so LIMIT is deterministic.
def _q140_sql() -> str:
    edge_cte = """  SELECT DISTINCT s, d FROM (
    SELECT t[i] AS s, t[i+1] AS d
    FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
          FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
                FROM documents))
    UNION ALL
    SELECT t[i+1] AS s, t[i] AS d
    FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
          FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
                FROM documents))
  ) WHERE s <> d"""
    chain = _sql_pagerank_chain(edge_cte)
    return f"""
SELECT node AS token, rank_fp, rank,
       row_number() OVER (ORDER BY rank_fp DESC, node) AS kw_rank
FROM ({chain})
ORDER BY rank_fp DESC, node
LIMIT {_TEXTRANK_K}
"""


# ---------------------------------------------------------------------------
# Q141 — bounded-depth harmonic centrality over the extracted KG
# (operators/graph.harmonic_centrality): exact labeled multi-source BFS
# for an md5-selected source subset (~1/16 of nodes, the q112 seed trick);
# Σ 1/d in integer micro-units. Complements q115's HyperBall (all-nodes
# approximate) with the exact per-subset readout; oracle re-walks the
# identical rounds with NOT EXISTS dedup per (root, node).
# ---------------------------------------------------------------------------

_HC_DEPTH = 3
_HC_SEED_WHERE = "substr(md5(node), 1, 1) = '0'"


def q141_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import harmonic_centrality

    docs = _docs(spark, sf_dir)
    tr = extract_token_triples(docs, TRIGGERS).select(
        F.least("subj", "obj").alias("u"), F.greatest("subj", "obj").alias("v")
    ).filter(F.col("u") < F.col("v")).distinct()
    sym = tr.union(tr.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sources = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .filter(F.substring(F.md5("node"), 1, 1) == "0")
    )
    return harmonic_centrality(
        sym, sources, src="u", dst="v", max_depth=_HC_DEPTH
    ).orderBy("node")


# DuckDB feature req: core SQL (correlated NOT EXISTS). Same unrolled-round
# discipline as the q78 BFS oracle, with the root label carried through.
def _q141_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    parts = []
    prev_v, prev_f = "v0", "v0"
    for d in range(1, _HC_DEPTH + 1):
        parts.append(f"""n{d} AS (
  SELECT DISTINCT f.root, e.v AS node FROM {prev_f} f JOIN e ON e.u = f.node
  WHERE NOT EXISTS (SELECT 1 FROM {prev_v} p
                    WHERE p.root = f.root AND p.node = e.v)
), v{d} AS (
  SELECT root, node, depth FROM {prev_v}
  UNION ALL SELECT root, node, {d} AS depth FROM n{d}
)""")
        prev_v, prev_f = f"v{d}", f"n{d}"
    rounds = ",\n".join(parts)
    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] IN {trig_list}
), und AS (
  SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
  FROM raw WHERE least(s, d) < greatest(s, d)
), e AS (
  SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
), roots AS (
  SELECT node FROM (SELECT DISTINCT u AS node FROM e)
  WHERE {_HC_SEED_WHERE}
), v0 AS (
  SELECT node AS root, node, 0 AS depth FROM roots
),
{rounds}
SELECT root AS node, count(*)::bigint AS n_reached,
       sum(1000000 // depth)::bigint AS h_fp,
       (round((sum(1000000 // depth)::bigint)::double / 1000000.0, 6) + 0.0)
         AS harmonic
FROM {prev_v}
WHERE depth > 0
GROUP BY root
ORDER BY node
"""


# ---------------------------------------------------------------------------
# Q142 — ontology LCA + path similarity (operators/graph.ontology_lca):
# for an md5-seeded subset of hierarchy nodes (~1/2, the q112 seed trick
# with a wider net — the ontology is dictionary-sized), every a < b pair's
# lowest common ancestor over the q100 subsumption closure, with the
# portable two-phase argmin (dsum, then da, then lexicographic c) and
# 1/(1+dsum) path similarity in integer micro-units. The pairwise
# semantic-similarity readout pathhier's alignment scoring implies over
# its ontology class hierarchy.
# ---------------------------------------------------------------------------

_LCA_SEED_WHERE = (
    "substr(md5(node), 1, 1) IN ('0','1','2','3','4','5','6','7')"
)


def q142_ontology_lca(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import (
        ontology_lca,
        transitive_closure_mindist,
    )

    docs = _docs(spark, sf_dir)
    hier = (
        extract_token_triples(docs, TRIGGERS)
        .filter(F.col("pred") == "component")
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    )
    closure = transitive_closure_mindist(hier, doublings=_TC_DOUBLINGS)
    nodes = (
        hier.select(F.col("src").alias("node"))
        .union(hier.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = nodes.filter(
        F.substring(F.md5("node"), 1, 1).isin(list("01234567"))
    )
    pairs = (
        seeds.select(F.col("node").alias("a"))
        .crossJoin(F.broadcast(seeds.select(F.col("node").alias("b"))))
        .filter(F.col("a") < F.col("b"))
    )
    return ontology_lca(closure, pairs).orderBy("a", "b")


# DuckDB feature req: WITH RECURSIVE (core) + window row_number. The oracle
# replays the argmin as one ordered window (dsum, da, c) — a different
# mechanism from the Spark side's two-phase min-combiner chain, agreeing
# exactly.
def _q142_sql() -> str:
    max_dist = 2 ** _TC_DOUBLINGS
    return f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] = 'merge'
), r AS (
  SELECT s, d, 1 AS dist FROM e
  UNION
  SELECT r.s, e.d, r.dist + 1 FROM r JOIN e ON e.s = r.d
  WHERE r.dist < {max_dist}
), closure AS (
  SELECT s, d, min(dist) AS dist FROM r WHERE s <> d GROUP BY s, d
), nodes AS (
  SELECT DISTINCT s AS node FROM e
  UNION SELECT DISTINCT d AS node FROM e
), seeds AS (
  SELECT node FROM nodes WHERE {_LCA_SEED_WHERE}
), pairs AS (
  SELECT x.node AS a, y.node AS b FROM seeds x JOIN seeds y ON x.node < y.node
), anc AS (
  SELECT s AS node, d AS anc, dist AS dd FROM closure
  UNION ALL
  SELECT node, node AS anc, 0 AS dd
  FROM (SELECT a AS node FROM pairs UNION SELECT b AS node FROM pairs)
), cand AS (
  SELECT p.a, p.b, aa.anc AS c, aa.dd AS da, ab.dd AS db,
         aa.dd + ab.dd AS dsum
  FROM pairs p
  JOIN anc aa ON aa.node = p.a
  JOIN anc ab ON ab.node = p.b AND ab.anc = aa.anc
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY a, b ORDER BY dsum, da, c
  ) AS rn FROM cand
)
SELECT a, b, c AS lca, da::int AS dist_a, db::int AS dist_b,
       dsum::int AS dist_sum,
       (1000000 // (1 + dsum))::bigint AS sim_fp,
       (round(((1000000 // (1 + dsum))::bigint)::double / 1000000.0, 6)
         + 0.0) AS sim
FROM ranked WHERE rn = 1
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# Q143 — per-source template concentration (operators/dedup.
# template_concentration): cluster each source's docs by SimHash shape
# (q22's fingerprint) and report the single-most-common-shape share in
# integer micro-units — the boilerplate-site / mirror-farm detector that
# gates whether a host needs per-page dedup at all. Oracle reuses the
# q22 vote chain with the source carried through the join-back.
# ---------------------------------------------------------------------------


def q143_template_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pathhier_spark.operators.dedup import template_concentration

    return template_concentration(_docs(spark, sf_dir)).orderBy("source")


def _q143_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents
), counted AS (
  SELECT doc_id, tok, count(*) AS w FROM toks GROUP BY doc_id, tok
), hashed AS (
  SELECT doc_id, w, {_sql_hex32('tok')} AS th FROM counted
), votes AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (th >> bit::int) & 1 = 1 THEN w ELSE -w END) AS v
  FROM hashed, range(0, 32) b(bit) GROUP BY doc_id, bit
), sh AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (1::bigint << bit::int) ELSE 0 END)::bigint
           AS simhash
  FROM votes GROUP BY doc_id
), shapes AS (
  SELECT d.source, s.simhash, count(*) AS cnt
  FROM sh s JOIN documents d USING (doc_id)
  GROUP BY d.source, s.simhash
)
SELECT source, sum(cnt)::bigint AS n_docs, count(*)::bigint AS n_shapes,
       max(cnt)::bigint AS top_shape_docs,
       ((1000000 * max(cnt)) // sum(cnt))::bigint AS template_fp,
       (round((((1000000 * max(cnt)) // sum(cnt))::bigint)::double
              / 1000000.0, 6) + 0.0) AS template_share
FROM shapes GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Q144 — temperature-scaled mixture allocation (operators/sampling.
# temperature_allocation): alpha = 0.5 multilingual budget split —
# per-language token mass, engine-exact floor(sqrt(T)·1e3) weights, and
# the q132 largest-remainder integer rounding so allocations sum EXACTLY
# to the budget. The missing half of the sampling story next to q59's
# mixture sampling (q59 draws rows given weights; q144 derives the
# weights from the corpus).
# ---------------------------------------------------------------------------

_TA_BUDGET = 1_000_000


def q144_temperature_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.sampling import temperature_allocation

    return temperature_allocation(
        _docs(spark, sf_dir), budget=_TA_BUDGET
    ).orderBy("lang")


# DuckDB feature req: core SQL + window row_number. sqrt parity: both
# engines convert int64 -> nearest double identically and IEEE sqrt is
# correctly rounded, so floor(sqrt(T)*1000) matches bit-for-bit.
def _q144_sql() -> str:
    return f"""
WITH t AS (
  SELECT lang,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '')) AS nt
  FROM documents
), g AS (
  SELECT lang, sum(nt)::bigint AS n_tokens FROM t GROUP BY lang
), w AS (
  SELECT lang, n_tokens,
         floor(sqrt(n_tokens::double) * 1000)::bigint AS w_fp
  FROM g
), tot AS (
  SELECT sum(w_fp)::bigint AS wtot FROM w
), b AS (
  SELECT lang, n_tokens, w_fp,
         ({_TA_BUDGET}::bigint * w_fp) // wtot AS base,
         ({_TA_BUDGET}::bigint * w_fp) % wtot AS rem
  FROM w, tot
), sh AS (
  SELECT ({_TA_BUDGET} - sum(base))::bigint AS short FROM b
), r AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, lang) AS rk FROM b
)
SELECT lang, n_tokens, w_fp,
       (base + CASE WHEN rk <= short THEN 1 ELSE 0 END)::bigint
         AS alloc_tokens,
       (round((base + CASE WHEN rk <= short THEN 1 ELSE 0 END)::double
              / {_TA_BUDGET}.0, 6) + 0.0) AS share
FROM r, sh ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Q145 — fixed-round k-truss peeling (operators/graph.ktruss): the edge-
# level sibling of q74's k-core — drop edges with triangle support
# < k - 2 each round over the co-purchase graph. Spark enumerates
# triangles with the degree-ordered orientation (power-law safe); the
# oracle re-enumerates them id-ordered in unrolled round CTEs — two
# different enumeration orders, the same triangle set, the same peel.
# ---------------------------------------------------------------------------

_KTRUSS_K = 3
_KTRUSS_ROUNDS = 3


def q145_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import ktruss

    edges = _copurchase_edges(spark, sf_dir)
    return ktruss(
        edges, k=_KTRUSS_K, rounds=_KTRUSS_ROUNDS
    ).orderBy("u", "v")


# DuckDB feature req: AS MATERIALIZED (>= 0.9). Without it DuckDB INLINES
# every CTE reference — the triangle join references e{r} three times per
# round, so the expansion (and the parquet scans it opens) grows 3^rounds
# and the un-materialized form dies with EMFILE before it is slow.
def _q145_sql() -> str:
    thresh = _KTRUSS_K - 2

    def _round(r: int) -> str:
        return f"""tr{r} AS MATERIALIZED (
  SELECT a.u AS x, a.v AS y, b.v AS z
  FROM e{r} a JOIN e{r} b ON b.u = a.v
  JOIN e{r} c ON c.u = a.u AND c.v = b.v
), sup{r} AS MATERIALIZED (
  SELECT u, v, count(*)::bigint AS support FROM (
    SELECT x AS u, y AS v FROM tr{r}
    UNION ALL SELECT x AS u, z AS v FROM tr{r}
    UNION ALL SELECT y AS u, z AS v FROM tr{r}
  ) GROUP BY u, v
)"""

    ctes = [_SQL_COPURCHASE.replace("e0 AS (", "e0 AS MATERIALIZED (")]
    for r in range(_KTRUSS_ROUNDS):
        ctes.append(_round(r))
        ctes.append(
            f"""e{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{r} e
  JOIN sup{r} s ON s.u = e.u AND s.v = e.v
  WHERE s.support >= {thresh}
)"""
        )
    ctes.append(_round(_KTRUSS_ROUNDS))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT e.u, e.v, coalesce(s.support, 0)::bigint AS support
FROM e{_KTRUSS_ROUNDS} e
LEFT JOIN sup{_KTRUSS_ROUNDS} s ON s.u = e.u AND s.v = e.v
ORDER BY e.u, e.v
"""
    )


# ---------------------------------------------------------------------------
# Q146 — tokenizer fertility per language (operators/bpe + one join):
# BPE tokens emitted per whitespace word, the standard "how well does
# this tokenizer fit this language" signal (fertility ~1 = native fit,
# >>1 = the language pays a token tax — the number that motivates q144's
# temperature re-weighting). Encoding runs ONCE per distinct word
# (vocab-sized), never per occurrence; occurrence mass joins back on the
# word key. Same trained merges as q62/q73 (shared oracle CTE chain).
# ---------------------------------------------------------------------------


def q146_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.bpe import bpe_encode, bpe_train
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    # (lang, word) occurrence counts — checkpointed once; the global
    # vocabulary for training and the per-language mass both derive from
    # it without re-exploding the corpus
    lw = (
        docs.select("lang", F.explode(_tokens("text")).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    words = lw.groupBy("w").agg(F.sum("n").alias("n"))
    merges = [
        (r["a"], r["b"])
        for r in bpe_train(words, n_merges=_BPE_MERGES)
        .orderBy("round")
        .collect()
    ]
    enc_len = words.select(
        "w", F.size(bpe_encode("w", merges)).cast("long").alias("k")
    )
    per = (
        lw.join(enc_len, "w")
        .groupBy("lang")
        .agg(
            F.sum("n").cast("long").alias("n_words"),
            F.sum(F.col("n") * F.col("k")).cast("long").alias("n_bpe_tokens"),
        )
    )
    fert_fp = F.expr("(1000000 * n_bpe_tokens) DIV n_words").cast("long")
    return per.select(
        "lang",
        "n_words",
        "n_bpe_tokens",
        fert_fp.alias("fertility_fp"),
        (
            F.round(fert_fp.cast("double") / F.lit(1000000.0), 6) + F.lit(0.0)
        ).alias("fertility"),
    ).orderBy("lang")


def _q146_sql() -> str:
    ctes = _sql_bpe_ctes()
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
lwc AS (
  SELECT lang, w, count(*)::bigint AS n
  FROM (SELECT lang, unnest({_SQL_WS_TOKS}) AS w FROM documents)
  GROUP BY lang, w
), enc AS (
  SELECT w, len(s)::bigint AS k FROM w{_BPE_MERGES}
), per AS (
  SELECT lang, sum(n)::bigint AS n_words, sum(n * k)::bigint AS n_bpe_tokens
  FROM lwc JOIN enc USING (w) GROUP BY lang
)
SELECT lang, n_words, n_bpe_tokens,
       ((1000000 * n_bpe_tokens) // n_words)::bigint AS fertility_fp,
       (round((((1000000 * n_bpe_tokens) // n_words)::bigint)::double
              / 1000000.0, 6) + 0.0) AS fertility
FROM per ORDER BY lang
"""
    )


# ---------------------------------------------------------------------------
# Q147 — double-sweep diameter lower bound (operators/graph.
# double_sweep_diameter) over the q141 symmetric KG graph: BFS from the
# lexicographic-min node, hop to the farthest (max depth, min name) node,
# BFS again — two sweeps instead of the all-pairs closure (Magnien-
# Latapy-Habib). Deterministic start/handoff on both engines; the oracle
# unrolls both sweeps as MATERIALIZED BFS round CTEs.
# ---------------------------------------------------------------------------

_DS_DEPTH = 4


def q147_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import double_sweep_diameter

    docs = _docs(spark, sf_dir)
    tr = extract_token_triples(docs, TRIGGERS).select(
        F.least("subj", "obj").alias("u"), F.greatest("subj", "obj").alias("v")
    ).filter(F.col("u") < F.col("v")).distinct()
    sym = tr.union(tr.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return double_sweep_diameter(sym, src="u", dst="v", max_depth=_DS_DEPTH)


# DuckDB feature req: AS MATERIALIZED (>= 0.9) — the per-round visited
# set is referenced by both the next frontier's join and its NOT EXISTS,
# and sweep 2's chain hangs off sweep 1's result, so inlined expansion
# would be ~2^(2·depth).
def _q147_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"

    def sweep(tag: str, root_cte: str) -> str:
        parts = [
            f"""{tag}v0 AS MATERIALIZED (
  SELECT node, 0 AS depth FROM {root_cte}
)"""
        ]
        prev_v, prev_f = f"{tag}v0", f"{tag}v0"
        for d in range(1, _DS_DEPTH + 1):
            parts.append(f"""{tag}n{d} AS MATERIALIZED (
  SELECT DISTINCT e.v AS node FROM {prev_f} f JOIN e ON e.u = f.node
  WHERE NOT EXISTS (SELECT 1 FROM {prev_v} p WHERE p.node = e.v)
), {tag}v{d} AS MATERIALIZED (
  SELECT node, depth FROM {prev_v}
  UNION ALL SELECT node, {d} AS depth FROM {tag}n{d}
)""")
            prev_v, prev_f = f"{tag}v{d}", f"{tag}n{d}"
        parts.append(f"""{tag}far AS MATERIALIZED (
  SELECT node, depth FROM {prev_v} ORDER BY depth DESC, node LIMIT 1
)""")
        return ",\n".join(parts)

    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] IN {trig_list}
), und AS (
  SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
  FROM raw WHERE least(s, d) < greatest(s, d)
), e AS MATERIALIZED (
  SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
), start AS (
  SELECT min(node) AS node FROM (SELECT u AS node FROM e)
),
{sweep('a', 'start')},
{sweep('b', '(SELECT node FROM afar)')}
SELECT s.node AS start_node, f1.node AS far_node, f1.depth::int AS ecc_start,
       f2.node AS far2_node, f2.depth::int AS diameter_lb
FROM start s, afar f1, bfar f2
"""


# ---------------------------------------------------------------------------
# Q148 — Good-Turing frequency-of-frequencies (operators/textstats.
# good_turing_profile): N_r per count band r <= 10, each band's token-
# mass share, and the adjusted count r* = (r+1)·N_{r+1}/N_r — the r = 1
# row is the unseen-mass estimate. Prices the vocabulary tail that q114
# (Heaps) and q50 (KMV) only count.
# ---------------------------------------------------------------------------

_GT_MAX_R = 10


def q148_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import good_turing_profile

    return good_turing_profile(
        _docs(spark, sf_dir), max_r=_GT_MAX_R
    ).orderBy("r")


def _q148_sql() -> str:
    return f"""
WITH counts AS (
  SELECT tok, count(*)::bigint AS c
  FROM (SELECT unnest({_SQL_WS_TOKS}) AS tok FROM documents)
  GROUP BY tok
), fof AS (
  SELECT c AS r, count(*)::bigint AS n_types FROM counts GROUP BY c
), total AS (
  SELECT sum(r * n_types)::bigint AS n_tokens FROM fof
)
SELECT f.r::bigint AS r, f.n_types,
       ((1000000 * f.r * f.n_types) // t.n_tokens)::bigint AS mass_fp,
       CASE WHEN nx.n_types IS NULL THEN NULL
            ELSE ((1000000 * (f.r + 1) * nx.n_types) // f.n_types)::bigint
       END AS rstar_fp,
       (round((CASE WHEN nx.n_types IS NULL THEN NULL
               ELSE ((1000000 * (f.r + 1) * nx.n_types) // f.n_types)::bigint
               END)::double / 1000000.0, 6) + 0.0) AS rstar
FROM fof f
LEFT JOIN fof nx ON nx.r = f.r + 1
CROSS JOIN total t
WHERE f.r <= {_GT_MAX_R}
ORDER BY r
"""


# ---------------------------------------------------------------------------
# Q149 — snake-balanced shard packing (operators/packing.
# snake_shard_assignment): deal size-DESC-ordered docs across shards
# boustrophedon so per-shard byte totals stay within ~one max-document —
# the anti-straggler output sharding a training-data loader wants, vs
# hash sharding's several-giants-on-one-file failure. Spark ranks via
# the q45 histogram + per-value window (no corpus-sized SinglePartition
# window); the oracle ranks with one global row_number — identical
# tie-free total order.
# ---------------------------------------------------------------------------

_SNAKE_SHARDS = 8


def q149_snake_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.packing import snake_shard_assignment

    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    a = snake_shard_assignment(docs, n_shards=_SNAKE_SHARDS)
    return (
        a.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("shard")
    )


def _q149_sql() -> str:
    k = _SNAKE_SHARDS
    return f"""
WITH r AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS rank0
  FROM documents
), s AS (
  SELECT CASE WHEN (rank0 // {k}) % 2 = 0 THEN rank0 % {k}
              ELSE {k - 1} - (rank0 % {k}) END AS shard,
         n_chars
  FROM r
)
SELECT shard::int AS shard, count(*)::bigint AS n_docs,
       sum(n_chars)::bigint AS total_chars
FROM s GROUP BY shard ORDER BY shard
"""


# ---------------------------------------------------------------------------
# Q150 — Adamic-Adar link prediction (operators/graph.adamic_adar_links):
# q99's rarity-aware refinement — Σ 1/ln(deg(w)) over shared neighbors,
# obscure shared neighbors outscore celebrity hubs. Per-pair sums are
# ORDERED folds over the sorted degree list (the q63/q130 float rule),
# so both engines add identical values in identical order.
# ---------------------------------------------------------------------------


def q150_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import adamic_adar_links

    docs = _docs(spark, sf_dir)
    edges = extract_token_triples(docs, TRIGGERS).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return adamic_adar_links(edges, min_common=_LP_MIN_COMMON).orderBy(
        "a", "b"
    )


# DuckDB feature req: list_reduce + list_prepend (>= 0.9; the q37/q42
# precedent) + list(x ORDER BY x) ordered aggregation.
def _q150_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] IN {trig_list}
), e AS (
  SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
  FROM raw WHERE least(s, d) < greatest(s, d)
), adj AS (
  SELECT u AS w, v AS n FROM e UNION ALL SELECT v AS w, u AS n FROM e
), deg AS (
  SELECT w, count(*)::bigint AS deg FROM adj GROUP BY w
), adjd AS (
  SELECT a.w, a.n, d.deg AS dw FROM adj a JOIN deg d ON d.w = a.w
), p AS (
  SELECT x.n AS a, y.n AS b, count(*)::bigint AS common,
         list(x.dw ORDER BY x.dw) AS ds
  FROM adjd x JOIN adjd y ON x.w = y.w AND x.n < y.n
  GROUP BY x.n, y.n
  HAVING count(*) >= {_LP_MIN_COMMON}
), cand AS (
  SELECT * FROM p c
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = c.a AND e.v = c.b)
)
SELECT a, b, common,
       (round(list_reduce(
          list_prepend(0.0, list_transform(ds, d -> 1.0 / ln(d::double))),
          (acc, x) -> acc + x), 6) + 0.0) AS adamic_adar
FROM cand ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# Q151 — token burstiness (Church-Gale dispersion): variance-to-mean
# ratio of a token's per-document counts over ALL documents (zeros
# included — the closed form (N·Σc² − cf²)/(N·cf) needs only the
# nonzero rows). VMR ~1 = Poisson background prose; VMR >> 1 = bursty
# (topical or spam/template tokens — the per-token refinement of q143's
# per-source template score). Exact int64 end to end, micro-unit DIV.
# ---------------------------------------------------------------------------

_BURST_MIN_CF = 50
_BURST_TOP = 30


def q151_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import token_burstiness

    return token_burstiness(
        _docs(spark, sf_dir), min_cf=_BURST_MIN_CF, top=_BURST_TOP
    )


def _q151_sql() -> str:
    return f"""
WITH dc AS (
  SELECT tok, doc_id, count(*)::bigint AS c
  FROM (SELECT doc_id, unnest({_SQL_WS_TOKS}) AS tok FROM documents)
  GROUP BY tok, doc_id
), per AS (
  SELECT tok, count(*)::bigint AS df, sum(c)::bigint AS cf,
         sum(c * c)::bigint AS sumsq
  FROM dc GROUP BY tok
), n AS (
  SELECT count(*)::bigint AS n_docs FROM documents
)
SELECT tok, df, cf,
       ((1000000 * (n_docs * sumsq - cf * cf)) // (n_docs * cf))::bigint
         AS vmr_fp,
       (round((((1000000 * (n_docs * sumsq - cf * cf))
               // (n_docs * cf))::bigint)::double / 1000000.0, 6) + 0.0)
         AS vmr
FROM per, n
WHERE cf >= {_BURST_MIN_CF}
ORDER BY vmr_fp DESC, tok
LIMIT {_BURST_TOP}
"""


# ---------------------------------------------------------------------------
# Q152 — MinHash sketch calibration (operators/dedup.minhash_calibration):
# per LSH candidate pair, the signature-agreement estimate vs the exact
# shingle Jaccard, bucketed by estimate decile — measures how far the
# 16-permutation sketch is off on THIS corpus (prices q11's verify
# stage). All-integer: micro-unit estimates/exacts, integer-sum DIV
# count means; the q46 lesson applied (every oracle sum cast ::bigint).
# ---------------------------------------------------------------------------


def q152_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.dedup import minhash_calibration

    return minhash_calibration(
        _docs(spark, sf_dir),
        num_hashes=_LSH_BANDS * _LSH_ROWS,
        shingle_k=_SHINGLE_K,
        bands=_LSH_BANDS,
        rows_per_band=_LSH_ROWS,
        max_bucket_size=50,
    )


def _q152_sql() -> str:
    nh = _LSH_BANDS * _LSH_ROWS
    return _sql_shingles().rstrip() + f""",
mh AS (
  SELECT doc_id, seed, min(md5(seed || ':' || sh)) AS mh
  FROM sh, range(0, {nh}) s(seed) GROUP BY doc_id, seed
), banded AS (
  SELECT doc_id, seed // {_LSH_ROWS} AS band,
         md5(string_agg(mh, '|' ORDER BY seed)) AS bucket
  FROM mh GROUP BY doc_id, seed // {_LSH_ROWS}
), sized AS (
  SELECT band, bucket FROM banded GROUP BY band, bucket
  HAVING count(*) <= 50
), small AS (
  SELECT b.* FROM banded b JOIN sized USING (band, bucket)
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM small a JOIN small b USING (band, bucket)
  WHERE a.doc_id < b.doc_id
), agree AS (
  SELECT p.id_a, p.id_b,
         (count(*) FILTER (WHERE a.mh = b.mh))::bigint AS agree
  FROM pairs p
  JOIN mh a ON a.doc_id = p.id_a
  JOIN mh b ON b.doc_id = p.id_b AND b.seed = a.seed
  GROUP BY p.id_a, p.id_b
), shs AS (
  SELECT doc_id, list(DISTINCT sh) AS shset FROM sh GROUP BY doc_id
), per AS (
  SELECT ((1000000 * g.agree) // {nh})::bigint AS est_fp,
         ((1000000 * len(list_intersect(x.shset, y.shset)))
          // len(list_distinct(list_concat(x.shset, y.shset))))::bigint
           AS j_fp
  FROM agree g
  JOIN shs x ON g.id_a = x.doc_id
  JOIN shs y ON g.id_b = y.doc_id
)
SELECT (est_fp // 100000)::int AS bucket, count(*)::bigint AS n_pairs,
       (sum(est_fp) // count(*))::bigint AS mean_est_fp,
       (sum(j_fp) // count(*))::bigint AS mean_jacc_fp,
       (sum(abs(est_fp - j_fp)) // count(*))::bigint AS mean_abs_err_fp
FROM per GROUP BY bucket ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Q153 — two-iteration SimRank for seeded pairs (operators/graph.
# simrank_pairs): "similar if your neighbors are similar", closed in
# exact integer rationals (C = 4/5; s1 from wedge counts, s2 one int64
# Σ + floor DIV) — the q51 fixed-point discipline applied to a pairwise
# structural measure. Pair set = the q142 md5-seeded subset (the cost
# lever: neighbor-pair expansion is Σ d_a·d_b over QUERY pairs only).
# ---------------------------------------------------------------------------


def q153_simrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import simrank_pairs

    docs = _docs(spark, sf_dir)
    tr = extract_token_triples(docs, TRIGGERS).select(
        F.least("subj", "obj").alias("u"), F.greatest("subj", "obj").alias("v")
    ).filter(F.col("u") < F.col("v")).distinct()
    nodes = (
        tr.select(F.col("u").alias("node"))
        .union(tr.select(F.col("v").alias("node")))
        .distinct()
    )
    seeds = nodes.filter(
        F.substring(F.md5("node"), 1, 1).isin(list("01234567"))
    )
    qpairs = (
        seeds.select(F.col("node").alias("a"))
        .crossJoin(F.broadcast(seeds.select(F.col("node").alias("b"))))
        .filter(F.col("a") < F.col("b"))
    )
    return simrank_pairs(tr, qpairs, src="u", dst="v").orderBy("a", "b")


def _q153_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] IN {trig_list}
), e AS (
  SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
  FROM raw WHERE least(s, d) < greatest(s, d)
), adj AS MATERIALIZED (
  SELECT u AS w, v AS n FROM e UNION ALL SELECT v AS w, u AS n FROM e
), deg AS MATERIALIZED (
  SELECT w, count(*)::bigint AS deg FROM adj GROUP BY w
), nodes AS (
  SELECT DISTINCT w AS node FROM adj
), seeds AS (
  SELECT node FROM nodes
  WHERE substr(md5(node), 1, 1) IN ('0','1','2','3','4','5','6','7')
), qp AS (
  SELECT x.node AS a, y.node AS b
  FROM seeds x JOIN seeds y ON x.node < y.node
), common AS MATERIALIZED (
  SELECT p.n AS x, q.n AS y, count(*)::bigint AS cm
  FROM adj p JOIN adj q ON p.w = q.w AND p.n < q.n
  GROUP BY p.n, q.n
), s1 AS (
  SELECT qp.a, qp.b,
         CASE WHEN ai.n = bj.n THEN 1000000::bigint
              ELSE ((4 * 1000000 * coalesce(c.cm, 0))
                    // (5 * dx.deg * dy.deg))::bigint
         END AS s1_fp
  FROM qp
  JOIN adj ai ON ai.w = qp.a
  JOIN adj bj ON bj.w = qp.b
  LEFT JOIN common c
    ON c.x = least(ai.n, bj.n) AND c.y = greatest(ai.n, bj.n)
  JOIN deg dx ON dx.w = least(ai.n, bj.n)
  JOIN deg dy ON dy.w = greatest(ai.n, bj.n)
), sums AS (
  SELECT a, b, sum(s1_fp)::bigint AS s1_sum FROM s1 GROUP BY a, b
)
SELECT s.a, s.b,
       ((4 * s.s1_sum) // (5 * da.deg * db.deg))::bigint AS s2_fp,
       (round((((4 * s.s1_sum) // (5 * da.deg * db.deg))::bigint)::double
              / 1000000.0, 6) + 0.0) AS s2
FROM sums s
JOIN deg da ON da.w = s.a
JOIN deg db ON db.w = s.b
ORDER BY s.a, s.b
"""


# ---------------------------------------------------------------------------
# Q154 — embedding dimension health profile: per-dimension moments of the
# 1e6-quantized components (the q24/q36 _quantized discipline) — exact
# int64 sum/sumsq per dim, then the q110/q132 finish: ONE fixed-shape
# double expression for mean/variance. Flags collapsed dimensions
# (var ~0) and offset dimensions (|mean| >> 0) — the anisotropy that
# breaks cosine ANN before any index does. Bound: Σq² per dim < 2^63
# (|x| <= 1 at 1e6 quantization allows ~9e6 vectors per dim partition;
# shrink the quantization scale for larger corpora).
# ---------------------------------------------------------------------------


def q154_embedding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _tbl(spark, sf_dir, "embeddings")
    q = emb.select(
        F.posexplode(
            F.transform(
                "embedding", lambda x: F.floor(x.cast("double") * 1000000)
            )
        ).alias("dim", "q")
    )
    per = q.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").cast("long").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("ss"),
        F.min("q").cast("long").alias("min_q"),
        F.max("q").cast("long").alias("max_q"),
    )
    n, s, ss = (F.col(c).cast("double") for c in ("n", "s", "ss"))
    return per.select(
        F.col("dim").cast("int").alias("dim"),
        "n",
        (F.round(s / n / F.lit(1000000.0), 6) + F.lit(0.0)).alias("mean_v"),
        (
            F.round(
                (n * ss - s * s) / (n * n) / F.lit(1e12), 6
            )
            + F.lit(0.0)
        ).alias("var_v"),
        "min_q",
        "max_q",
    ).orderBy("dim")


_Q154_SQL = """
SELECT (i - 1)::int AS dim, count(*)::bigint AS n,
       (round(sum(q)::double / count(*)::double / 1000000.0, 6) + 0.0)
         AS mean_v,
       (round((count(*)::double * sum(q * q)::double
               - sum(q)::double * sum(q)::double)
              / (count(*)::double * count(*)::double) / 1e12, 6) + 0.0)
         AS var_v,
       min(q)::bigint AS min_q, max(q)::bigint AS max_q
FROM (
  SELECT floor(unnest(embedding)::double * 1000000)::bigint AS q,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
)
GROUP BY i ORDER BY dim
"""


# ---------------------------------------------------------------------------
# Q155 — per-document character entropy: the Gopher-family gibberish /
# binary-noise / repeated-char-spam signal at the CHARACTER level
# (complements q14's token-level quality features and q38's phrase-level
# repetition). Map-only higher-order column expressions — no explode, no
# shuffle; the Σ c·ln(c) term folds in sorted-character order from a 0.0
# seed on both engines (q44/q92 ordered-fold discipline), round-6 finish,
# NULL on empty text. Oracle needs list_transform/list_filter/list_reduce
# (DuckDB >= 0.8; list_prepend seeds the fold identically to Spark's
# aggregate(…, 0.0)).
# ---------------------------------------------------------------------------


def q155_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return char_entropy_profile(docs).orderBy("doc_id")


_Q155_SQL = """
WITH c AS (
  SELECT doc_id, length(text)::bigint AS n_chars,
         CASE WHEN length(text) > 0 THEN
           list_transform(generate_series(1, length(text)),
                          i -> substr(text, i, 1))
         ELSE []::varchar[] END AS chars
  FROM documents
), d AS (
  SELECT doc_id, n_chars, chars,
         list_sort(list_distinct(chars)) AS ds
  FROM c
), e AS (
  SELECT doc_id, n_chars, len(ds)::int AS n_distinct,
         list_transform(ds, d2 ->
           len(list_filter(chars, x -> x = d2))::double) AS cnts
  FROM d
)
SELECT doc_id, n_chars, n_distinct,
       CASE WHEN n_chars > 0 THEN
         (round(ln(n_chars::double)
                - list_reduce(
                    list_prepend(0.0::double,
                                 list_transform(cnts, cc -> cc * ln(cc))),
                    (a, b) -> a + b) / n_chars::double, 6) + 0.0)
       ELSE NULL END AS char_entropy
FROM e
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q156 — anchor-text dictionary (operators/urls.anchor_text_dictionary):
# top external anchor phrases per target host, the web-KG naming signal
# ("what the rest of the web calls this entity") that feeds the linking
# dictionary as crawl-mined alias rows. Deterministic pages extend q88's
# generator with VARYING anchor texts: a per-doc "Widget  N" phrase
# (doubled space exercises whitespace collapse; mixed case exercises
# lowering), every 3rd doc adds a "Click HERE" repeat phrase, every
# 4k+1 doc an internal anchor (excluded), every 5k+2 doc an empty-text
# anchor (dropped). The oracle re-parses the html with the same anchor
# regex — extraction, normalization, external-only filter, and the
# per-host (n_refs DESC, phrase ASC) row_number top-k are all replayed.
# DuckDB feature req: regexp_extract_all with group 0 + regexp_replace
# 'g' flag (core; Spark's regexp_replace is global by default).
# ---------------------------------------------------------------------------


def q156_anchor_text_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.urls import anchor_text_dictionary

    docs = _docs(spark, sf_dir)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/p/"),
        (F.col("doc_id") % 10).cast("string"),
    )
    a1 = F.concat(
        F.lit('<a href="https://h'), (F.col("doc_id") % 7).cast("string"),
        F.lit('.example.org/item" class="x">Widget  '),
        (F.col("doc_id") % 5).cast("string"), F.lit("</a>"),
    )
    extra = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('<a href="https://h'),
                (F.col("doc_id") % 7).cast("string"),
                F.lit('.example.org/item">Click HERE</a>'),
            ),
        )
        .when(F.col("doc_id") % 4 == 1, F.lit('<a href="/self">Self Nav</a>'))
        .when(
            F.col("doc_id") % 5 == 2,
            F.concat(
                F.lit('<a href="https://h'),
                ((F.col("doc_id") * 2) % 7).cast("string"),
                F.lit('.example.org/x"></a>'),
            ),
        )
        .otherwise(F.lit(""))
    )
    html = F.concat(
        F.lit("<html><body><p>"), F.col("text"), F.lit("</p>"), a1, extra,
        F.lit("</body></html>"),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    return anchor_text_dictionary(pages, top=5).orderBy("dst_host", "rnk")


def _q156_sql() -> str:
    anchor_re = r'<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>'
    return r"""
WITH pages AS (
  SELECT 'https://' || source || '.example.com/p/' || (doc_id % 10)::varchar
           AS url,
         '<html><body><p>' || text || '</p>'
         || '<a href="https://h' || (doc_id % 7)::varchar
         || '.example.org/item" class="x">Widget  '
         || (doc_id % 5)::varchar || '</a>'
         || CASE WHEN doc_id % 3 = 0 THEN '<a href="https://h'
                      || (doc_id % 7)::varchar
                      || '.example.org/item">Click HERE</a>'
                 WHEN doc_id % 4 = 1 THEN '<a href="/self">Self Nav</a>'
                 WHEN doc_id % 5 = 2 THEN '<a href="https://h'
                      || ((doc_id * 2) % 7)::varchar
                      || '.example.org/x"></a>'
                 ELSE '' END
         || '</body></html>' AS html
  FROM documents
), anchors AS (
  SELECT lower(regexp_extract(regexp_replace(url,
           '^[A-Za-z][A-Za-z0-9+.\-]*://', ''), '^([^:/?#]*)', 1)) AS src_host,
         unnest(regexp_extract_all(html, '{A_RE}', 0)) AS m
  FROM pages
), parsed AS (
  SELECT src_host,
         regexp_extract(m, '{A_RE}', 1) AS href,
         trim(lower(regexp_replace(regexp_extract(m, '{A_RE}', 2),
                                   '\s+', ' ', 'g'))) AS phrase
  FROM anchors
), resolved AS (
  SELECT CASE WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.\-]*://')
              THEN lower(regexp_extract(regexp_replace(href,
                     '^[A-Za-z][A-Za-z0-9+.\-]*://', ''), '^([^:/?#]*)', 1))
              WHEN href LIKE '//%'
              THEN lower(regexp_extract(href, '^//([^:/?#]*)', 1))
              ELSE src_host END AS dst_host,
         src_host, phrase
  FROM parsed WHERE href <> '' AND phrase <> ''
), counts AS (
  SELECT dst_host, phrase, count(*) AS n_refs
  FROM resolved WHERE dst_host <> '' AND dst_host <> src_host
  GROUP BY dst_host, phrase
), ranked AS (
  SELECT dst_host, phrase, n_refs,
         row_number() OVER (PARTITION BY dst_host
                            ORDER BY n_refs DESC, phrase ASC)::int AS rnk
  FROM counts
)
SELECT dst_host, phrase, n_refs, rnk FROM ranked WHERE rnk <= 5
ORDER BY dst_host, rnk
""".replace("{A_RE}", anchor_re)


# ---------------------------------------------------------------------------
# Q157 — strongly connected components (operators/graph.scc_colored):
# the web-graph bow-tie primitive (Broder et al. 2000) — redirect loops,
# template rings, and mutually-linking host cliques are SCCs, and the
# IN/SCC/OUT decomposition is the standard crawl-graph health readout
# that the undirected CC kernel (q18) cannot express. The Spark side is
# fixed-round FW-BW-Trim coloring (trim source/sink singletons, forward
# min-label coloring run to an ASSERTED fixpoint, backward reach-to-
# pivot within each color class); the oracle computes mutual
# reachability with a recursive CTE — two entirely different SCC
# algorithms agreeing row-for-row, the q47 two-algorithm discipline.
# The directed graph is deterministic from documents: nodes doc_id%120,
# a functional edge n -> (7n+3)%120 for every doc plus a chord
# n -> (5n+11)%120 for every 3rd doc — cyclic by construction (36 SCCs,
# sizes 1-4, plus tendrils), identical at every SF since doc_id 0..499
# saturates the (mod 120, mod 3) residue grid.
# DuckDB feature req: WITH RECURSIVE (core); UNION (not ALL) dedupes
# reach pairs per level so the cyclic graph terminates.
# ---------------------------------------------------------------------------


def q157_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import scc_colored

    docs = _docs(spark, sf_dir)
    n = F.col("doc_id") % 120
    e1 = docs.select(n.alias("src"), ((n * 7 + 3) % 120).alias("dst"))
    e2 = docs.filter(F.col("doc_id") % 3 == 0).select(
        n.alias("src"), ((n * 5 + 11) % 120).alias("dst")
    )
    return scc_colored(e1.union(e2)).orderBy("node")


_Q157_SQL = """
WITH RECURSIVE base AS (
  SELECT (doc_id % 120)::bigint AS n, doc_id % 3 AS m3 FROM documents
), e AS (
  SELECT DISTINCT s, d FROM (
    SELECT n AS s, ((n * 7 + 3) % 120)::bigint AS d FROM base
    UNION
    SELECT n, ((n * 5 + 11) % 120)::bigint FROM base WHERE m3 = 0
  ) WHERE s <> d
), reach AS (
  SELECT s AS a, d AS b FROM e
  UNION
  SELECT r.a, e.d FROM reach r JOIN e ON e.s = r.b
), nodes AS (
  -- subquery-DISTINCT, not `a UNION b`: under WITH RECURSIVE DuckDB
  -- gives union-shaped CTEs recursive union-table semantics (here the
  -- downstream GROUP BY node would mask it, but don't rely on that)
  SELECT DISTINCT node FROM (
    SELECT s AS node FROM e UNION ALL SELECT d FROM e
  )
), mutual AS (
  SELECT r1.a AS node, r1.b AS m
  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
), scc AS (
  SELECT n.node,
         least(n.node, coalesce(min(mu.m), n.node))::bigint AS scc_id
  FROM nodes n LEFT JOIN mutual mu ON mu.node = n.node
  GROUP BY n.node
), sized AS (
  SELECT scc_id, count(*)::bigint AS scc_size FROM scc GROUP BY scc_id
)
SELECT s.node, s.scc_id, z.scc_size
FROM scc s JOIN sized z USING (scc_id)
ORDER BY s.node
"""


# ---------------------------------------------------------------------------
# Q158 — ROUGE-N pair evaluation (operators/textstats.rouge_pairs): the
# summarization/paraphrase eval scorer (Lin 2004) as a data operator —
# clipped n-gram overlap precision/recall/F1 per (candidate, reference)
# pair, the metric a distillation pipeline runs over millions of
# (generated, gold) pairs. Pairs are deterministic: doc i as candidate
# vs doc i+1 as reference. F1 computes as 2*match/(cand+ref) — a single
# exact integer-ratio division, never the p*r/(p+r) float composition.
# Grams join on a 0x1f-joined token key so multi-token grams cannot
# collide across token boundaries.
# DuckDB feature req: core only (list slicing, array_to_string, chr).
# ---------------------------------------------------------------------------


def q158_rouge_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import rouge_pairs

    docs = _docs(spark, sf_dir)
    a = docs.select(F.col("doc_id").alias("pair_id"), F.col("text").alias("cand"))
    b = docs.select((F.col("doc_id") - 1).alias("pair_id"), F.col("text").alias("ref"))
    pairs = a.join(b, "pair_id")
    return rouge_pairs(pairs).orderBy("pair_id", "n")


def _q158_sql() -> str:
    def gram_list(side: str, n: int) -> str:
        if n == 1:
            return side
        return (
            f"CASE WHEN len({side}) >= {n} THEN "
            f"list_transform(generate_series(1, len({side}) - {n - 1}), "
            f"i -> array_to_string({side}[i : i + {n - 1}], chr(31))) "
            f"ELSE []::varchar[] END"
        )

    per_n = []
    for n in (1, 2):
        per_n.append(f"""
  SELECT pair_id, {n} AS n, {gram_list('tc', n)} AS gc,
         {gram_list('tr', n)} AS gr
  FROM p""")
    union = " UNION ALL ".join(per_n)
    return f"""
WITH d AS (
  SELECT doc_id, {_SQL_WS_TOKS} AS toks FROM documents
), p AS (
  SELECT a.doc_id AS pair_id, a.toks AS tc, b.toks AS tr
  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
), g AS ({union}
), cc AS (
  SELECT pair_id, n, g2 AS g, count(*) AS nc
  FROM (SELECT pair_id, n, unnest(gc) AS g2 FROM g)
  GROUP BY pair_id, n, g2
), rc AS (
  SELECT pair_id, n, g2 AS g, count(*) AS nr
  FROM (SELECT pair_id, n, unnest(gr) AS g2 FROM g)
  GROUP BY pair_id, n, g2
), m AS (
  SELECT pair_id, n, sum(least(nc, nr))::bigint AS match_n
  FROM cc JOIN rc USING (pair_id, n, g)
  GROUP BY pair_id, n
), t AS (
  SELECT pair_id, n, len(gc)::bigint AS cand_total,
         len(gr)::bigint AS ref_total
  FROM g
)
SELECT t.pair_id, t.n::int AS n,
       coalesce(m.match_n, 0)::bigint AS match_n,
       t.cand_total, t.ref_total,
       CASE WHEN t.cand_total > 0 THEN
         round(coalesce(m.match_n, 0)::double / t.cand_total::double, 6)
           + 0.0 END AS rouge_p,
       CASE WHEN t.ref_total > 0 THEN
         round(coalesce(m.match_n, 0)::double / t.ref_total::double, 6)
           + 0.0 END AS rouge_r,
       CASE WHEN t.cand_total + t.ref_total > 0 THEN
         round((2 * coalesce(m.match_n, 0))::double
               / (t.cand_total + t.ref_total)::double, 6) + 0.0
       END AS rouge_f1
FROM t LEFT JOIN m USING (pair_id, n)
ORDER BY t.pair_id, t.n
"""


# ---------------------------------------------------------------------------
# Q159 — trigram stupid-backoff surprisal (operators/textstats.
# trigram_backoff_surprisal): the order-3 LM quality signal (Brants et
# al. 2007) completing the q44 (unigram) / q92 (bigram) ladder. The LM
# trains on the even-id half and scores ALL docs — a same-corpus
# trigram LM never backs off (every probe trigram has count >= 1), so
# held-out scoring is what makes the backoff tiers real. Tier hit
# counts are exact int64 gate columns; ln-terms fold in position order;
# the -ln(alpha) weights are PYTHON-computed double literals injected
# identically into both engines (never ln(0.4) under two libms).
# DuckDB feature req: core only (lead windows, list(... ORDER BY) fold).
# ---------------------------------------------------------------------------


def q159_trigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import trigram_backoff_surprisal

    docs = _docs(spark, sf_dir)
    return trigram_backoff_surprisal(docs).orderBy("doc_id")


def _q159_sql() -> str:
    import math

    nla = repr(-math.log(0.4))
    nla2 = repr(-2.0 * math.log(0.4))
    return f"""
WITH toks AS (
  SELECT doc_id, (i - 1)::int AS pos, ts[i] AS w1
  FROM (
    SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i
    FROM (SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents)
  )
), tri_rows AS (
  SELECT * FROM (
    SELECT doc_id, pos, w1,
           lead(w1, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
           lead(w1, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
    FROM toks
  ) WHERE w3 IS NOT NULL
), tri AS (
  SELECT w1, w2, w3, count(*) AS c3 FROM tri_rows
  WHERE doc_id % 2 = 0 GROUP BY w1, w2, w3
), trip AS (
  SELECT w1, w2, sum(c3)::bigint AS c3p FROM tri GROUP BY w1, w2
), pair_rows AS (
  SELECT * FROM (
    SELECT doc_id, w1,
           lead(w1, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS wb
    FROM toks WHERE doc_id % 2 = 0
  ) WHERE wb IS NOT NULL
), bi AS (
  SELECT w1 AS bw1, wb AS bw2, count(*) AS c2 FROM pair_rows
  GROUP BY w1, wb
), bip AS (
  SELECT bw1 AS pw, sum(c2)::bigint AS c2p FROM bi GROUP BY bw1
), uni AS (
  SELECT w1 AS uw, count(*) AS c1 FROM toks WHERE doc_id % 2 = 0
  GROUP BY w1
), scal AS (
  SELECT sum(c1)::bigint AS n_tok, count(*)::bigint AS n_vocab FROM uni
), probe AS (
  SELECT tr.doc_id, tr.pos,
         CASE WHEN t.c3 IS NOT NULL
              THEN ln(tp.c3p::double) - ln(t.c3::double)
              WHEN b.c2 IS NOT NULL
              THEN {nla} + ln(bp.c2p::double) - ln(b.c2::double)
              ELSE {nla2} + ln((s.n_tok + s.n_vocab + 1)::double)
                   - ln((coalesce(u.c1, 0) + 1)::double)
         END AS lnp,
         CASE WHEN t.c3 IS NOT NULL THEN 1 ELSE 0 END AS t_tri,
         CASE WHEN t.c3 IS NULL AND b.c2 IS NOT NULL THEN 1 ELSE 0 END
           AS t_bi,
         CASE WHEN t.c3 IS NULL AND b.c2 IS NULL THEN 1 ELSE 0 END
           AS t_uni
  FROM tri_rows tr
  LEFT JOIN tri t USING (w1, w2, w3)
  LEFT JOIN trip tp USING (w1, w2)
  LEFT JOIN bi b ON b.bw1 = tr.w2 AND b.bw2 = tr.w3
  LEFT JOIN bip bp ON bp.pw = tr.w2
  LEFT JOIN uni u ON u.uw = tr.w3
  CROSS JOIN scal s
), per_doc AS (
  SELECT doc_id, count(*) AS n_scored,
         sum(t_tri)::bigint AS n_tri, sum(t_bi)::bigint AS n_bi,
         sum(t_uni)::bigint AS n_uni,
         list_sum(list(lnp ORDER BY pos)) AS sum_lnp
  FROM probe GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_scored, 0)::bigint AS n_scored,
       coalesce(p.n_tri, 0)::bigint AS n_tri,
       coalesce(p.n_bi, 0)::bigint AS n_bi,
       coalesce(p.n_uni, 0)::bigint AS n_uni,
       CASE WHEN p.n_scored > 0
            THEN round(p.sum_lnp / p.n_scored, 6) + 0.0 END
         AS avg_surprisal
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Q160 — dictionary augmentation (operators/linking.dictionary_augment):
# the q156 anchor-dictionary loop closed — link mined candidate phrases
# against the ontology name dictionary by token-set Jaccard (bipartite
# AllPairs prefix filtering, shared global token order, lossless
# candidate generation) and emit each phrase's best class via the
# portable two-phase argmax, flagging non-verbatim winners as new alias
# rows. Probe phrases are deterministic mutations of every 31st part
# name (drop the head token for key%3==0, append an OOV token for
# key%5==0) so exact hits, partial hits, below-threshold, and
# empty-phrase rows all occur. The oracle scores the FULL cross product
# — prefix-filter losslessness itself is what the hash verifies (the
# q85 discipline).
# DuckDB feature req: list_intersect/list_distinct (core list fns).
# ---------------------------------------------------------------------------

_DICTAUG_MOD = 31
_DICTAUG_T = 0.5


def q160_dict_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.linking import dictionary_augment

    part = spark.read.parquet(_t(sf_dir, "part"))
    lower = F.lower(F.col("p_name"))
    mutated = F.when(
        F.col("p_partkey") % 3 == 0,
        F.regexp_replace(lower, r"^\S+\s*", ""),
    ).otherwise(lower)
    phrase = F.trim(
        F.concat(
            mutated,
            F.when(F.col("p_partkey") % 5 == 0, F.lit(" zzglorp")).otherwise(
                F.lit("")
            ),
        )
    )
    probe = part.filter(F.col("p_partkey") % _DICTAUG_MOD == 0).select(
        F.col("p_partkey").alias("phrase_id"), phrase.alias("phrase")
    )
    dic = part.select(
        F.col("p_partkey").alias("cls_id"), lower.alias("cls_name")
    )
    return dictionary_augment(
        probe, dic, threshold=_DICTAUG_T
    ).orderBy("phrase_id")


_Q160_SQL = f"""
WITH probe AS (
  SELECT p_partkey AS phrase_id,
         trim(
           CASE WHEN p_partkey % 3 = 0
                THEN regexp_replace(lower(p_name), '^\\S+\\s*', '')
                ELSE lower(p_name) END
           || CASE WHEN p_partkey % 5 = 0 THEN ' zzglorp' ELSE '' END
         ) AS phrase
  FROM part WHERE p_partkey % {_DICTAUG_MOD} = 0
), pp AS (
  SELECT phrase_id, phrase,
         list_distinct(list_filter(
           string_split_regex(phrase, '\\s+'), x -> x <> '')) AS pts
  FROM probe
), d AS (
  SELECT p_partkey AS cls_id, lower(p_name) AS cls_name,
         list_distinct(list_filter(
           string_split_regex(lower(p_name), '\\s+'), x -> x <> '')) AS cts
  FROM part
), scored AS (
  SELECT pp.phrase_id, d.cls_id,
         (1000000 * len(list_intersect(pts, cts)))
           // (len(pts) + len(cts) - len(list_intersect(pts, cts)))
           AS jacc_fp
  FROM pp CROSS JOIN d
), qual AS (
  SELECT * FROM scored WHERE jacc_fp >= {int(_DICTAUG_T * 1000000)}
), best AS (
  SELECT phrase_id, max(jacc_fp) AS best_fp FROM qual GROUP BY phrase_id
), win AS (
  SELECT q.phrase_id, q.jacc_fp, min(q.cls_id) AS cls_id
  FROM qual q JOIN best b
    ON q.phrase_id = b.phrase_id AND q.jacc_fp = b.best_fp
  GROUP BY q.phrase_id, q.jacc_fp
)
SELECT pp.phrase_id, pp.phrase, w.cls_id, d2.cls_name, w.jacc_fp,
       CASE WHEN w.jacc_fp IS NOT NULL THEN w.jacc_fp < 1000000 END
         AS is_new
FROM pp
LEFT JOIN win w USING (phrase_id)
LEFT JOIN d d2 ON d2.cls_id = w.cls_id
ORDER BY pp.phrase_id
"""


# ---------------------------------------------------------------------------
# Q161 — DAG longest-path layering (operators/graph.dag_longest_paths):
# ontology leveling — depth(v) = longest path ending at v (the level
# index that stratifies an is-a hierarchy for per-level processing)
# plus n_ancestors (reach-in size, the over-generality probe). Max-plus
# doubling closes the DAG in log2(depth) self-joins with two honest
# guards: a (v,v) closure pair raises (cycle — max-plus would silently
# compute longest WALK), and a closure dist that saturates 2^doublings
# raises (strictly-below-cap proves convergence, since a longer path
# would register its cap-length prefix exactly). The DAG is
# deterministic from documents: nodes doc_id%240 with strictly
# increasing edges n -> n+1+(n%7) and n -> n+13 for doc%4==0 (acyclic
# by construction; max depth 103 < 128; doc%4 = (doc%240)%4 so the edge
# set is identical at every SF). Oracle: recursive-CTE longest path —
# frontier recursion vs doubling, two different algorithms agreeing.
# DuckDB feature req: WITH RECURSIVE (core); UNION dedup terminates
# because path lengths in a DAG are bounded.
# ---------------------------------------------------------------------------


def q161_dag_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import dag_longest_paths

    docs = _docs(spark, sf_dir)
    n = F.col("doc_id") % 240
    e1 = docs.select(
        n.alias("src"), (n + 1 + (n % 7)).alias("dst")
    ).filter(F.col("dst") < 240)
    e2 = (
        docs.filter(F.col("doc_id") % 4 == 0)
        .select(n.alias("src"), (n + 13).alias("dst"))
        .filter(F.col("dst") < 240)
    )
    return dag_longest_paths(e1.union(e2)).orderBy("node")


_Q161_SQL = """
WITH RECURSIVE base AS (
  SELECT (doc_id % 240)::bigint AS n, doc_id % 4 AS m4 FROM documents
), e AS (
  SELECT DISTINCT s, d FROM (
    SELECT n AS s, (n + 1 + (n % 7))::bigint AS d FROM base
    UNION
    SELECT n, (n + 13)::bigint FROM base WHERE m4 = 0
  ) WHERE d < 240
), r AS (
  SELECT s, d, 1 AS dist FROM e
  UNION
  SELECT r.s, e.d, r.dist + 1 FROM r JOIN e ON e.s = r.d
), nodes AS (
  -- NOT `a UNION b` at top level: under WITH RECURSIVE DuckDB gives any
  -- union-shaped CTE recursive union-table semantics (arms accumulate
  -- without cross-arm dedup)
  SELECT DISTINCT node FROM (
    SELECT s AS node FROM e UNION ALL SELECT d FROM e
  )
), per_dst AS (
  SELECT d AS node, max(dist)::bigint AS depth,
         count(DISTINCT s)::bigint AS n_ancestors
  FROM r GROUP BY d
)
SELECT n.node, coalesce(p.depth, 0)::bigint AS depth,
       coalesce(p.n_ancestors, 0)::bigint AS n_ancestors
FROM nodes n LEFT JOIN per_dst p USING (node)
ORDER BY n.node
"""


# ---------------------------------------------------------------------------
# Q162 — cluster-safe splits: the FIX for what q137 audits. Assigning
# train/val/test by hashing the DOCUMENT id lets near-duplicate pairs
# straddle splits (test contamination); hashing the near-dup CLUSTER id
# instead (q31's connected components, labeled by min member) gives the
# GroupShuffleSplit guarantee by construction — every member of a
# cluster inherits one split, so no verified near-dup pair can ever be
# a cross-split leak (asserted via split_leakage in pytest). Same
# bucket arithmetic as q55/q137 (md5 'split:' salt, integer bucket
# boundaries), so the only change vs q55 is WHICH id is hashed —
# exactly the right minimal diff for a production split migration.
# DuckDB feature req: same as q31 (shared recursive-CTE chain) +
# md5-hex bucket helper.
# ---------------------------------------------------------------------------


def q162_cluster_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.sampling import hash_split

    # the q131 reuse pattern: SAME clusters as q31 by construction, so
    # any LSH/threshold/pad change stays in one place
    comp = q31_neardup_clusters(spark, sf_dir).select("doc_id", "cluster")
    return hash_split(comp, id_col="cluster").orderBy("doc_id")


def _q162_sql() -> str:
    bucket = _sql_hex32(chr(39) + "split:" + chr(39) + " || cluster::varchar")
    return _q31_sql().rsplit("SELECT n::bigint", 1)[0] + f""", comp AS (
  SELECT n::bigint AS doc_id, min(m)::bigint AS cluster
  FROM reach GROUP BY n
)
SELECT doc_id, cluster, ({bucket} % 1000000)::bigint AS split_bucket,
       CASE WHEN ({bucket} % 1000000) < 900000 THEN 'train'
            WHEN ({bucket} % 1000000) < 950000 THEN 'val'
            ELSE 'test' END AS split
FROM comp ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q163 — minimum spanning forest (operators/graph.boruvka_msf): the
# single-linkage clustering backbone — the MSF of a similarity graph IS
# the single-linkage dendrogram (cut at weight t = the t-threshold flat
# clusters), the hierarchy q31's flat CC cannot express. Spark side is
# Borůvka (per-component argmin edge, hooking + pointer jumping —
# log-round, fully data-parallel, the distributed-MST algorithm);
# the oracle uses the CYCLE PROPERTY instead: under globally distinct
# weights (md5-derived, verified distinct; the operator raises on
# ties), an edge is in the unique MSF iff its weight EQUALS the
# minimax bottleneck distance between its endpoints, computed by
# min-max-semiring doubling in unrolled MATERIALIZED CTEs — two
# entirely different MST characterizations agreeing edge-for-edge.
# Graph: nodes doc_id%150 with chords n->(13n+7)%150 and, for even
# docs, n->(29n+3)%150 (two components — the forest case is real);
# doc%2 = (doc%150)%2 so the edge set is SF-invariant.
# DuckDB feature req: MATERIALIZED CTEs (inlining is 3^rounds
# otherwise, the q145 lesson); md5-hex helper.
# ---------------------------------------------------------------------------

_MSF_ROUNDS = 8


def q163_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import boruvka_msf

    docs = _docs(spark, sf_dir)
    n = F.col("doc_id") % 150
    e1 = docs.select(n.alias("u"), ((n * 13 + 7) % 150).alias("v"))
    e2 = docs.filter(F.col("doc_id") % 2 == 0).select(
        n.alias("u"), ((n * 29 + 3) % 150).alias("v")
    )
    raw = e1.union(e2).select(
        F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst")
    ).filter(F.col("src") != F.col("dst")).distinct()
    w = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("mst:"),
                    F.col("src").cast("string"),
                    F.lit(":"),
                    F.col("dst").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    weighted = raw.select("src", "dst", w.alias("w"))
    return boruvka_msf(weighted).orderBy("a", "b")


def _q163_sql() -> str:
    wexpr = _sql_hex32(
        chr(39) + "mst:" + chr(39) + " || a::varchar || ':' || b::varchar"
    )
    rounds = []
    prev = "b0"
    for r in range(1, _MSF_ROUNDS + 1):
        cur = f"b{r}"
        rounds.append(f""", {cur} AS MATERIALIZED (
  SELECT u, v, min(bt) AS bt FROM (
    SELECT u, v, bt FROM {prev}
    UNION ALL
    SELECT p.u, q.v, greatest(p.bt, q.bt) AS bt
    FROM {prev} p JOIN {prev} q ON p.v = q.u
  ) GROUP BY u, v
)""")
        prev = cur
    return f"""
WITH base AS (
  SELECT (doc_id % 150)::bigint AS n, doc_id % 2 AS m2 FROM documents
), raw AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM (
    SELECT n AS u, ((n * 13 + 7) % 150)::bigint AS v FROM base
    UNION ALL
    SELECT n, ((n * 29 + 3) % 150)::bigint FROM base WHERE m2 = 0
  ) WHERE u <> v
), e AS MATERIALIZED (
  SELECT a, b, ({wexpr})::bigint AS w FROM raw
), b0 AS MATERIALIZED (
  SELECT u, v, min(w) AS bt FROM (
    SELECT a AS u, b AS v, w FROM e
    UNION ALL
    SELECT b, a, w FROM e
  ) GROUP BY u, v
){''.join(rounds)}
SELECT e.a, e.b, e.w
FROM e JOIN {prev} f ON f.u = e.a AND f.v = e.b
WHERE f.bt = e.w
ORDER BY e.a, e.b
"""


# ---------------------------------------------------------------------------
# Q164 — ordered conversion funnel (operators/temporal.ordered_funnel):
# signup -> view -> purchase with a 7-day deadline from the first
# signup; first-event semantics per stage make the result a pure
# function of the event set (replays/late data cannot flip it). Each
# stage is one filtered combiner groupBy + a user-sized equi-join; the
# final rollup windows over the 3-row step domain only. Conversions
# are exact micro-unit integer ratios.
# DuckDB feature req: core only (INTERVAL arithmetic, lag window).
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ("signup", "view", "purchase")
_FUNNEL_DAYS = 7


def q164_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import ordered_funnel

    ev = spark.read.parquet(_t(sf_dir, "events"))
    return ordered_funnel(
        ev, steps=_FUNNEL_STEPS, window_days=_FUNNEL_DAYS
    )


def _q164_sql() -> str:
    s1, s2, s3 = _FUNNEL_STEPS
    return f"""
WITH ev AS (
  SELECT user_id AS u, event_type AS et, ts AS t FROM events
), g1 AS (
  SELECT u, min(t) AS tk FROM ev WHERE et = '{s1}' GROUP BY u
), st1 AS (
  SELECT u, tk, tk + INTERVAL {_FUNNEL_DAYS} DAY AS deadline FROM g1
), st2 AS (
  SELECT e.u, min(e.t) AS tk, min(s.deadline) AS deadline
  FROM ev e JOIN st1 s ON e.u = s.u
  WHERE e.et = '{s2}' AND e.t > s.tk AND e.t <= s.deadline
  GROUP BY e.u
), st3 AS (
  SELECT e.u, min(e.t) AS tk
  FROM ev e JOIN st2 s ON e.u = s.u
  WHERE e.et = '{s3}' AND e.t > s.tk AND e.t <= s.deadline
  GROUP BY e.u
), counts AS (
  SELECT 1 AS step, '{s1}' AS step_name, count(*)::bigint AS n_users
  FROM st1
  UNION ALL
  SELECT 2, '{s2}', count(*)::bigint FROM st2
  UNION ALL
  SELECT 3, '{s3}', count(*)::bigint FROM st3
), rolled AS (
  SELECT step, step_name, n_users,
         lag(n_users) OVER (ORDER BY step) AS n_prev,
         first_value(n_users) OVER (ORDER BY step) AS n_start
  FROM counts
)
SELECT step::int AS step, step_name, n_users,
       CASE WHEN n_prev IS NULL THEN 1000000
            WHEN n_prev = 0 THEN NULL
            ELSE (1000000 * n_users) // n_prev END::bigint AS conv_prev_fp,
       CASE WHEN n_start = 0 THEN NULL
            ELSE (1000000 * n_users) // n_start END::bigint
         AS conv_start_fp
FROM rolled ORDER BY step
"""


# ---------------------------------------------------------------------------
# Q165 — HLL set-intersection estimate: how much of crawl snapshot B is
# already in snapshot A, WITHOUT a join — the sketch-mergeability payoff
# (q68's registers, elementwise-max union, inclusion-exclusion
# inter = (A + B) - U). The sketched element is the CONTENT HASH
# md5(text) — cross-snapshot exact-content overlap, the dedup-planning
# scalar (token sets would be degenerate here: a shared vocabulary
# makes A = B = U and the inclusion-exclusion untestable). Snapshots:
# even docs vs every-3rd docs, so the true overlap (%6 docs + cross-
# half exact dups) is a strict subset of either side. Estimates are
# bit-reproducible (dyadic 2^-reg terms, md5 registers), so the oracle
# value-checks the ESTIMATES; the exact intersection rides along for
# the honesty comparison.
# DuckDB feature req: core only (shared q68 register arithmetic).
# ---------------------------------------------------------------------------


def q165_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import (
        hll_estimate,
        hll_registers,
    )

    docs = _docs(spark, sf_dir)
    ta = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.md5(F.col("text")).alias("tok")
    ).localCheckpoint(eager=False)
    tb = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.md5(F.col("text")).alias("tok")
    ).localCheckpoint(eager=False)
    ra = hll_registers(ta, "tok", m=_HLL_M)
    rb = hll_registers(tb, "tok", m=_HLL_M)
    ru = (
        ra.select("j", F.col("reg").alias("rega"))
        .join(rb.select("j", F.col("reg").alias("regb")), "j")
        .select("j", F.greatest("rega", "regb").alias("reg"))
    )
    ea = hll_estimate(ra, m=_HLL_M).select(F.col("est").alias("est_a"))
    eb = hll_estimate(rb, m=_HLL_M).select(F.col("est").alias("est_b"))
    eu = hll_estimate(ru, m=_HLL_M).select(F.col("est").alias("est_u"))
    exact = (
        ta.distinct()
        .join(tb.distinct(), "tok", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact_inter"))
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .crossJoin(F.broadcast(exact))
        .select(
            (F.round("est_a", 6) + F.lit(0.0)).alias("est_a"),
            (F.round("est_b", 6) + F.lit(0.0)).alias("est_b"),
            (F.round("est_u", 6) + F.lit(0.0)).alias("est_union"),
            (
                F.round(
                    (F.col("est_a") + F.col("est_b")) - F.col("est_u"), 6
                )
                + F.lit(0.0)
            ).alias("est_inter"),
            "n_exact_inter",
        )
    )


def _q165_sql() -> str:
    m = _HLL_M
    tail = 32 - (m.bit_length() - 1)
    alpha_m2 = (0.7213 / (1.0 + 1.079 / m)) * m * m

    def chain(name: str, src: str) -> str:
        return f"""
{name}_rho AS (
  SELECT h % {m} AS j,
         CASE WHEN (h // {m}) = 0 THEN {tail + 1}
              ELSE {tail + 1} - length(bin(h // {m})) END AS rho
  FROM (SELECT {_sql_hex32("'hll:' || tok")} AS h FROM {src})
), {name}_regs AS (
  SELECT g.j, coalesce(max(rho), 0)::bigint AS reg
  FROM range(0, {m}) g(j) LEFT JOIN {name}_rho r ON r.j = g.j GROUP BY g.j
), {name}_est AS (
  SELECT CASE WHEN ({alpha_m2!r} / s) <= {2.5 * m!r} AND n_zero > 0
              THEN {float(m)!r} * ln({float(m)!r} / n_zero)
              ELSE {alpha_m2!r} / s END AS est
  FROM (
    SELECT sum(1.0 / (1::bigint << reg)) AS s,
           sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)::bigint AS n_zero
    FROM {name}_regs
  )
)"""

    return f"""
WITH ta AS (
  SELECT md5(text) AS tok FROM documents WHERE doc_id % 2 = 0
), tb AS (
  SELECT md5(text) AS tok FROM documents WHERE doc_id % 3 = 0
),{chain('a', 'ta')},{chain('b', 'tb')},
u_regs AS (
  SELECT a_regs.j, greatest(a_regs.reg, b_regs.reg) AS reg
  FROM a_regs JOIN b_regs USING (j)
), u_est AS (
  SELECT CASE WHEN ({alpha_m2!r} / s) <= {2.5 * m!r} AND n_zero > 0
              THEN {float(m)!r} * ln({float(m)!r} / n_zero)
              ELSE {alpha_m2!r} / s END AS est
  FROM (
    SELECT sum(1.0 / (1::bigint << reg)) AS s,
           sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)::bigint AS n_zero
    FROM u_regs
  )
), ex AS (
  SELECT count(*)::bigint AS n_exact_inter FROM (
    SELECT DISTINCT tok FROM ta INTERSECT SELECT DISTINCT tok FROM tb
  )
)
SELECT round(a_est.est, 6) + 0.0 AS est_a,
       round(b_est.est, 6) + 0.0 AS est_b,
       round(u_est.est, 6) + 0.0 AS est_union,
       round((a_est.est + b_est.est) - u_est.est, 6) + 0.0 AS est_inter,
       ex.n_exact_inter
FROM a_est, b_est, u_est, ex
"""


# ---------------------------------------------------------------------------
# Q166 — robust per-group outliers (operators/profile.mad_outliers):
# low-median + MAD + |x-med| > 3*MAD counts over integer event-value
# cents — the outlier detector a single wild value cannot poison,
# complementing q134's z-scores. All-int64; median/MAD by the q45/q71
# value-histogram + inverted-CDF walk (windows over the value DOMAIN,
# never rows).
# DuckDB feature req: core only (windowed cumulative sums) — native
# median() is deliberately NOT used (interpolation conventions differ;
# the low-median rank walk is replayed instead).
# ---------------------------------------------------------------------------


def q166_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import mad_outliers

    ev = spark.read.parquet(_t(sf_dir, "events")).select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return mad_outliers(
        ev, group_col="event_type", cents_col="cents"
    ).orderBy("event_type")


_Q166_SQL = """
WITH base AS (
  SELECT event_type AS g, floor(value * 100)::bigint AS v FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), h1 AS (
  SELECT g, v, count(*)::bigint AS cnt FROM base GROUP BY g, v
), c1 AS (
  SELECT g, v, cnt,
         sum(cnt) OVER (PARTITION BY g ORDER BY v) AS cum,
         sum(cnt) OVER (PARTITION BY g) AS n
  FROM h1
), med AS (
  SELECT g, min(v) AS med, min(n)::bigint AS n
  FROM c1 WHERE cum >= (n + 1) // 2 GROUP BY g
), dev AS (
  SELECT b.g, abs(b.v - m.med) AS d FROM base b JOIN med m USING (g)
), h2 AS (
  SELECT g, d, count(*)::bigint AS cnt FROM dev GROUP BY g, d
), c2 AS (
  SELECT g, d, cnt,
         sum(cnt) OVER (PARTITION BY g ORDER BY d) AS cum,
         sum(cnt) OVER (PARTITION BY g) AS n
  FROM h2
), mad AS (
  SELECT g, min(d) AS mad FROM c2 WHERE cum >= (n + 1) // 2 GROUP BY g
)
SELECT b.g AS event_type, m.n, m.med AS med_cents, a.mad AS mad_cents,
       sum(CASE WHEN abs(b.v - m.med) > 3 * a.mad THEN 1 ELSE 0 END)::bigint
         AS n_outliers
FROM base b JOIN med m USING (g) JOIN mad a USING (g)
GROUP BY b.g, m.n, m.med, a.mad
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Q167 — bow-tie decomposition (operators/graph.bowtie_decomposition):
# the Broder et al. 2000 macro-structure of a crawl graph — CORE
# (largest SCC, ties to the smallest scc_id), IN (reaches the core),
# OUT (reached from it), OTHER (tendrils/tubes/disconnected) — the
# composition payoff of q157's SCC kernel plus two frontier BFS
# closures from the core set. IN and OUT are provably disjoint (a node
# in both would be in the core SCC). The oracle extends q157's
# recursive reach CTE chain: core from the mutual-reach SCCs, IN/OUT
# as one semi-join each against the reach pairs — again a different
# algorithm on both sides.
# DuckDB feature req: same as q157 (WITH RECURSIVE chain).
# ---------------------------------------------------------------------------


def q167_bowtie(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import bowtie_decomposition

    docs = _docs(spark, sf_dir)
    # NOT q157's graph: x -> 7x+3 is a BIJECTION mod 120 (gcd(7,120)=1),
    # a permutation has no in-trees and its bow-tie has an empty IN
    # class. 2x+5 is 2-to-1 (gcd(2,120)=2), so basins/tendrils exist:
    # this graph measures core=4 / in=28 / out=10 / other=78 — all four
    # classes real. doc%3 = (doc%120)%3, so the edge set is SF-invariant.
    n = F.col("doc_id") % 120
    e1 = docs.select(n.alias("src"), ((n * 2 + 5) % 120).alias("dst"))
    e2 = docs.filter(F.col("doc_id") % 3 == 0).select(
        n.alias("src"), ((n * 9 + 1) % 120).alias("dst")
    )
    return bowtie_decomposition(e1.union(e2)).orderBy("node")


_Q167_CHAIN = """
WITH RECURSIVE base AS (
  SELECT (doc_id % 120)::bigint AS n, doc_id % 3 AS m3 FROM documents
), e AS (
  SELECT DISTINCT s, d FROM (
    SELECT n AS s, ((n * 2 + 5) % 120)::bigint AS d FROM base
    UNION
    SELECT n, ((n * 9 + 1) % 120)::bigint FROM base WHERE m3 = 0
  ) WHERE s <> d
), reach AS (
  SELECT s AS a, d AS b FROM e
  UNION
  SELECT r.a, e.d FROM reach r JOIN e ON e.s = r.b
), nodes AS (
  SELECT DISTINCT node FROM (
    SELECT s AS node FROM e UNION ALL SELECT d FROM e
  )
), mutual AS (
  SELECT r1.a AS node, r1.b AS m
  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
), scc AS (
  SELECT n.node,
         least(n.node, coalesce(min(mu.m), n.node))::bigint AS scc_id
  FROM nodes n LEFT JOIN mutual mu ON mu.node = n.node
  GROUP BY n.node
), sized AS (
  SELECT scc_id, count(*)::bigint AS scc_size FROM scc GROUP BY scc_id
)"""


def _q167_sql() -> str:
    return _Q167_CHAIN + """, core AS (
  SELECT min(scc_id) AS core_id FROM sized
  WHERE scc_size = (SELECT max(scc_size) FROM sized)
), cset AS (
  SELECT s.node FROM scc s, core WHERE s.scc_id = core.core_id
), outs AS (
  SELECT DISTINCT r.b AS node FROM reach r JOIN cset c ON r.a = c.node
), ins AS (
  SELECT DISTINCT r.a AS node FROM reach r JOIN cset c ON r.b = c.node
)
SELECT s.node, s.scc_id,
       CASE WHEN cs.node IS NOT NULL THEN 'core'
            WHEN i.node IS NOT NULL THEN 'in'
            WHEN o.node IS NOT NULL THEN 'out'
            ELSE 'other' END AS cls
FROM scc s
LEFT JOIN cset cs ON cs.node = s.node
LEFT JOIN ins i ON i.node = s.node
LEFT JOIN outs o ON o.node = s.node
ORDER BY s.node
"""


# ---------------------------------------------------------------------------
# Q168 — entity-resolution funnel (operators/er.er_resolve): the
# record-linkage chain END TO END — multi-pass blocking (two
# complementary keys; a true pair needs only one), Levenshtein<=1
# verify on candidates only, CC clustering so transitive matches
# resolve, min-id canonicalization — composing what q135 (blocking
# quality), q66 (fuzzy join), and q31 (clusters) measure piecewise.
# Records: every part name suffixed with p_partkey%97 (diversifies the
# tiny name vocabulary) plus a dirty copy of every 4th part with the
# first token's last char dropped — so the funnel must recover each
# mutant's original through the typo. The oracle replays blocking +
# levenshtein + a recursive reach CC.
# DuckDB feature req: levenshtein() (core), WITH RECURSIVE.
# ---------------------------------------------------------------------------


def q168_er_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.er import er_resolve

    part = _tbl(spark, sf_dir, "part")
    name = F.concat(
        F.lower(F.col("p_name")),
        F.lit(" "),
        (F.col("p_partkey") % 97).cast("string"),
    )
    originals = part.select(F.col("p_partkey").alias("rec_id"), name.alias("name"))
    mutants = part.filter(F.col("p_partkey") % 4 == 0).select(
        (F.col("p_partkey") + 1000000).alias("rec_id"),
        F.concat(
            F.regexp_replace(F.lower(F.col("p_name")), r"^(\S*)\S ", "$1 "),
            F.lit(" "),
            (F.col("p_partkey") % 97).cast("string"),
        ).alias("name"),
    )
    out = er_resolve(originals.union(mutants))
    return out.select(
        "rec_id",
        "entity_id",
        "cluster_size",
        "is_canonical",
        (F.col("rec_id") >= 1000000).alias("is_mutant"),
    ).orderBy("rec_id")


_Q168_SQL = r"""
WITH RECURSIVE recs AS (
  SELECT p_partkey AS rec_id,
         lower(p_name) || ' ' || (p_partkey % 97)::varchar AS name
  FROM part
  UNION ALL
  SELECT 1000000 + p_partkey,
         regexp_replace(lower(p_name), '^(\S*)\S ', '\1 ')
           || ' ' || (p_partkey % 97)::varchar
  FROM part WHERE p_partkey % 4 = 0
), keyed AS (
  SELECT rec_id, name,
         list_filter(string_split_regex(name, '[ \t\n\f\r]+'),
                     x -> x <> '') AS toks
  FROM recs
), kall AS (
  SELECT rec_id, name, toks[-1] || ':' || substr(toks[1], 1, 1) AS k
  FROM keyed WHERE len(toks) > 0
  UNION ALL
  SELECT rec_id, name, toks[1] || ':' || toks[-1] AS k
  FROM keyed WHERE len(toks) > 0
), cands AS (
  SELECT DISTINCT a.rec_id AS ra, b.rec_id AS rb, a.name AS na,
                  b.name AS nb
  FROM kall a JOIN kall b USING (k) WHERE a.rec_id < b.rec_id
), matched AS (
  SELECT ra, rb FROM cands WHERE levenshtein(na, nb) <= 1
), sym AS (
  SELECT ra AS u, rb AS v FROM matched
  UNION SELECT rb, ra FROM matched
), reach(n, m) AS (
  SELECT rec_id, rec_id FROM recs
  UNION
  SELECT r.n, s.v FROM reach r JOIN sym s ON r.m = s.u
), ent AS (
  SELECT n::bigint AS rec_id, min(m)::bigint AS entity_id
  FROM reach GROUP BY n
), sized AS (
  SELECT entity_id, count(*)::bigint AS cluster_size
  FROM ent GROUP BY entity_id
)
SELECT e.rec_id, e.entity_id, z.cluster_size,
       (e.rec_id = e.entity_id) AS is_canonical,
       (e.rec_id >= 1000000) AS is_mutant
FROM ent e JOIN sized z USING (entity_id)
ORDER BY e.rec_id
"""


# ---------------------------------------------------------------------------
# Q169 — frequent event sequences (operators/temporal.
# frequent_sequences): sequential-pattern mining — the contiguous
# k-gram core of PrefixSpan/GSP, which is what clickstream funnels
# actually consume: which ORDERINGS of actions recur, with support as
# DISTINCT USERS (a user looping one path contributes once). One
# window per user (leads over the (ts, event_id) total order), k-gram
# patterns, a (k, pattern, user)-distinct combiner groupBy; the
# support threshold is an exact micro-unit integer comparison.
# DuckDB feature req: core only (lead windows).
# ---------------------------------------------------------------------------

_SEQ_MIN_SUP_FP = 200_000


def q169_frequent_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import frequent_sequences

    ev = spark.read.parquet(_t(sf_dir, "events"))
    return frequent_sequences(ev, min_support_fp=_SEQ_MIN_SUP_FP)


_Q169_SQL = f"""
WITH seq AS (
  SELECT user_id AS u, event_type AS w1,
         lead(event_type, 1) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS w2,
         lead(event_type, 2) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS w3
  FROM events
), nu AS (
  SELECT count(DISTINCT user_id)::bigint AS n_users FROM events
), g AS (
  SELECT 2 AS k, u, w1 || '>' || w2 AS pattern FROM seq
  WHERE w1 IS NOT NULL AND w2 IS NOT NULL
  UNION ALL
  SELECT 3, u, w1 || '>' || w2 || '>' || w3 FROM seq
  WHERE w1 IS NOT NULL AND w2 IS NOT NULL AND w3 IS NOT NULL
), sup AS (
  SELECT k, pattern, count(DISTINCT u)::bigint AS support
  FROM g GROUP BY k, pattern
)
SELECT s.k::int AS k, s.pattern, s.support,
       ((1000000 * s.support) // nu.n_users)::bigint AS support_fp
FROM sup s, nu
WHERE (1000000 * s.support) // nu.n_users >= {_SEQ_MIN_SUP_FP}
ORDER BY s.k, s.support DESC, s.pattern
"""


# ---------------------------------------------------------------------------
# Q170 — TextTiling topic segmentation (operators/textstats.
# text_tiling): Hearst's block-comparison core — adjacent fixed-size
# token blocks scored by distinct-token Jaccard; low-cohesion gaps are
# topic boundaries. The segmentation signal q90's fixed-grid chunking
# lacks (tile first, chunk within tiles). Entirely map-only: one
# explode over the gap index, array slices, exact micro-unit Jaccard,
# threshold flag — no shuffle anywhere.
# DuckDB feature req: core only (list slicing + list set fns).
# ---------------------------------------------------------------------------

_TILE_B = 10
_TILE_T = 100_000


def q170_text_tiling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import text_tiling

    docs = _docs(spark, sf_dir)
    return text_tiling(
        docs, block_tokens=_TILE_B, boundary_fp=_TILE_T
    ).orderBy("doc_id", "gap_idx")


_Q170_SQL = f"""
WITH d AS (
  SELECT doc_id, {_SQL_WS_TOKS} AS toks FROM documents
), s AS (
  SELECT doc_id, toks,
         (len(toks) + {_TILE_B - 1}) // {_TILE_B} AS nblocks
  FROM d
), g AS (
  SELECT doc_id, toks, unnest(generate_series(0, nblocks - 2)) AS gap
  FROM s WHERE nblocks >= 2
), blocks AS (
  SELECT doc_id, gap,
         list_distinct(
           toks[gap * {_TILE_B} + 1 : gap * {_TILE_B} + {_TILE_B}]
         ) AS ba,
         list_distinct(
           toks[(gap + 1) * {_TILE_B} + 1
                : (gap + 1) * {_TILE_B} + {_TILE_B}]
         ) AS bb
  FROM g
)
SELECT doc_id, gap::int AS gap_idx,
       ((1000000 * len(list_intersect(ba, bb)))
        // len(list_distinct(list_concat(ba, bb))))::bigint AS jacc_fp,
       (((1000000 * len(list_intersect(ba, bb)))
        // len(list_distinct(list_concat(ba, bb)))) < {_TILE_T})
         AS is_boundary
FROM blocks ORDER BY doc_id, gap_idx
"""


# ---------------------------------------------------------------------------
# Q171 — winnowing overlap pairs (operators/textstats.winnowing_matches):
# TRUE Schleimer/Wilkerson/Aiken winnowing — per sliding window of _WIN_W
# consecutive k-gram hashes select the minimum, so any shared token run of
# length >= _WIN_W + _WIN_K - 1 is GUARANTEED to contribute a shared
# fingerprint to both docs (the local-overlap promise q23's global
# bottom-16 sketch cannot make). Pairs sharing >= _WIN_MIN selected
# fingerprints. Map-only selection, one fp-keyed equi-join.
# DuckDB feature req: core only (md5 + list fns + generate_series).
# ---------------------------------------------------------------------------

_WIN_K = 4
_WIN_W = 5
_WIN_MIN = 2


def q171_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import winnowing_matches

    docs = _docs(spark, sf_dir)
    return winnowing_matches(
        docs, k=_WIN_K, w=_WIN_W, min_shared=_WIN_MIN
    ).orderBy("a", "b")


_Q171_SQL = f"""
WITH t AS (
  SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents
), g AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(ts) - {_WIN_K - 1}),
                        i -> md5(array_to_string(ts[i : i + {_WIN_K - 1}], ' '))) AS h
  FROM t WHERE len(ts) >= {_WIN_K}
), sel AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(h) >= {_WIN_W}
           THEN list_transform(generate_series(1, len(h) - {_WIN_W - 1}),
                               j -> list_aggregate(h[j : j + {_WIN_W - 1}], 'min'))
           ELSE [list_aggregate(h, 'min')] END) AS fps
  FROM g
), e AS (
  SELECT doc_id, unnest(fps) AS fp FROM sel
)
SELECT a.doc_id AS a, b.doc_id AS b, count(*)::bigint AS shared
FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= {_WIN_MIN}
ORDER BY a, b
"""


def _stopword_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared q172/q174/q182 input: micro-unit stopword-ratio score
    ((1e6 * n_stop) // n_tokens of exact counts — the q170 idiom) with
    the predict-English label; empty docs dropped on both engines."""
    docs = _docs(spark, sf_dir)
    toks = _tokens_q("text")
    stop_lit = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_lit, t)))
    scored = docs.select(
        F.size(toks).alias("n_tok"),
        n_stop.alias("n_stop"),
        (F.col("lang") == "en").alias("is_pos"),
    ).filter(F.col("n_tok") > 0)
    return scored.select(
        F.floor(F.lit(1_000_000) * F.col("n_stop") / F.col("n_tok")).alias(
            "score_fp"
        ),
        "is_pos",
    )


# ---------------------------------------------------------------------------
# Q172 — precision/recall threshold calibration (operators/profile.
# pr_curve): sweep every distinct value of the micro-unit stopword-ratio
# score as a "predict English" threshold and emit exact tp/fpos/fneg plus
# prec/rec/f1 — the table a curation pipeline reads to PICK its filter
# threshold instead of hard-coding one. Score is exact integer fixed
# point ((1e6 * n_stop) // n_tokens — the q170 idiom); the curve window
# runs over the score HISTOGRAM (q45 discipline), never the corpus;
# prec/rec/f1 are each one IEEE division of exact integers.
# DuckDB feature req: core only (window cumulative sums).
# ---------------------------------------------------------------------------


def q172_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import pr_curve

    return pr_curve(_stopword_scored(spark, sf_dir))


_Q172_SQL = f"""
WITH t AS (
  SELECT (1000000 * len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))))
           // len(toks) AS score_fp,
         (lang = 'en')::int AS y
  FROM (SELECT {_SQL_WS_TOKS} AS toks, lang FROM documents)
  WHERE len(toks) > 0
), h AS (
  SELECT score_fp, count(*)::bigint AS n,
         coalesce(sum(y), 0)::bigint AS npos
  FROM t GROUP BY score_fp
), c AS (
  SELECT score_fp,
         (sum(n) OVER w)::bigint AS pp,
         (sum(npos) OVER w)::bigint AS tp
  FROM h
  WINDOW w AS (ORDER BY score_fp DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), tot AS (
  SELECT sum(npos)::bigint AS total_pos FROM h
)
SELECT score_fp, tp,
       (pp - tp)::bigint AS fpos,
       ((SELECT total_pos FROM tot) - tp)::bigint AS fneg,
       tp::double / pp AS prec,
       CASE WHEN (SELECT total_pos FROM tot) > 0
            THEN tp::double / (SELECT total_pos FROM tot) END AS rec,
       CASE WHEN (SELECT total_pos FROM tot) > 0
            THEN (2 * tp)::double / (pp + (SELECT total_pos FROM tot)) END
         AS f1
FROM c ORDER BY score_fp DESC
"""



# ---------------------------------------------------------------------------
# Q173 — seeded betweenness centrality (operators/graph.
# betweenness_seeded): bounded-depth Brandes over the q141 token-triple
# graph from the same md5-seeded source subset — which nodes shortest
# paths ROUTE THROUGH, the centrality axis flow (q51/q84/q112) and
# distance (q141) both miss. Forward BFS carries exact int64 sigma path
# counts; backward dependency accumulation is integer micro-units with
# per-edge (sigma_u * (scale + delta_w)) DIV sigma_w — the oracle
# replays both phases level-by-level as unrolled CTEs.
# DuckDB feature req: core SQL (correlated NOT EXISTS).
# ---------------------------------------------------------------------------

_BC_DEPTH = 3


def q173_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import betweenness_seeded

    docs = _docs(spark, sf_dir)
    tr = extract_token_triples(docs, TRIGGERS).select(
        F.least("subj", "obj").alias("u"), F.greatest("subj", "obj").alias("v")
    ).filter(F.col("u") < F.col("v")).distinct()
    sym = tr.union(tr.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sources = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .filter(F.substring(F.md5("node"), 1, 1) == "0")
    )
    return betweenness_seeded(
        sym, sources, src="u", dst="v", max_depth=_BC_DEPTH
    ).orderBy("node")


def _q173_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    D = _BC_DEPTH
    fwd = []
    prev_v, prev_f = "v0", "v0"
    for d in range(1, D + 1):
        fwd.append(f"""n{d} AS (
  SELECT f.root, e.v AS node, sum(f.sigma)::bigint AS sigma
  FROM {prev_f} f JOIN e ON e.u = f.node
  WHERE NOT EXISTS (SELECT 1 FROM {prev_v} p
                    WHERE p.root = f.root AND p.node = e.v)
  GROUP BY f.root, e.v
), v{d} AS (
  SELECT root, node, depth, sigma FROM {prev_v}
  UNION ALL SELECT root, node, {d} AS depth, sigma FROM n{d}
)""")
        prev_v, prev_f = f"v{d}", f"n{d}"
    bwd = [f"""del{D} AS (
  SELECT root, node, sigma, 0::bigint AS delta
  FROM {prev_v} WHERE depth = {D}
)"""]
    for d in range(D - 1, 0, -1):
        bwd.append(f"""del{d} AS (
  SELECT vd.root, vd.node, vd.sigma, coalesce(x.dsum, 0)::bigint AS delta
  FROM (SELECT root, node, sigma FROM {prev_v} WHERE depth = {d}) vd
  LEFT JOIN (
    SELECT u.root, u.node,
           sum((u.sigma * (1000000 + w.delta)) // w.sigma)::bigint AS dsum
    FROM (SELECT root, node, sigma FROM {prev_v} WHERE depth = {d}) u
    JOIN e ON e.u = u.node
    JOIN del{d + 1} w ON w.root = u.root AND w.node = e.v
    GROUP BY u.root, u.node
  ) x ON x.root = vd.root AND x.node = vd.node
)""")
    interior_union = "\n  UNION ALL ".join(
        f"SELECT node, delta FROM del{d}" for d in range(1, D)
    )
    rounds = ",\n".join(fwd + bwd)
    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] IN {trig_list}
), und AS (
  SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
  FROM raw WHERE least(s, d) < greatest(s, d)
), e AS (
  SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
), roots AS (
  SELECT node FROM (SELECT DISTINCT u AS node FROM e)
  WHERE {_HC_SEED_WHERE}
), v0 AS (
  SELECT node AS root, node, 0 AS depth, 1::bigint AS sigma FROM roots
),
{rounds}
SELECT node, sum(delta)::bigint AS bc_fp,
       (round((sum(delta)::bigint)::double / 1000000.0, 6) + 0.0) AS bc
FROM ({interior_union})
GROUP BY node
HAVING sum(delta) > 0
ORDER BY node
"""



# ---------------------------------------------------------------------------
# Q174 — exact ROC AUC (operators/profile.auc_exact): the Mann-Whitney
# pair probability with half-credit ties, computed from the q172 score
# histogram without ever ranking rows or materializing pairs — wins
# via an EXCLUSIVE cumulative window, ties via npos*nneg per score,
# auc = (2*wins + ties) / (2*npos*nneg) as ONE exact-int division.
# Same predict-English calibration input as q172.
# DuckDB feature req: core only (window cumulative sums).
# ---------------------------------------------------------------------------


def q174_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import auc_exact

    return auc_exact(_stopword_scored(spark, sf_dir))


_Q174_SQL = f"""
WITH t AS (
  SELECT (1000000 * len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))))
           // len(toks) AS score_fp,
         (lang = 'en')::int AS y
  FROM (SELECT {_SQL_WS_TOKS} AS toks, lang FROM documents)
  WHERE len(toks) > 0
), h AS (
  SELECT score_fp,
         coalesce(sum(y), 0)::bigint AS npos,
         coalesce(sum(CASE WHEN y IS NOT NULL THEN 1 - y END), 0)::bigint
           AS nneg
  FROM t GROUP BY score_fp
), c AS (
  SELECT npos, nneg,
         coalesce((sum(nneg) OVER (ORDER BY score_fp ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))::bigint, 0)
           AS nneg_below
  FROM h
), agg AS (
  SELECT sum(npos)::bigint AS n_pos, sum(nneg)::bigint AS n_neg,
         sum(npos * (2 * nneg_below + nneg))::bigint AS wins2
  FROM c
)
SELECT n_pos, n_neg, wins2,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN wins2::double / (2 * n_pos * n_neg) END AS auc
FROM agg
"""


# ---------------------------------------------------------------------------
# Q175 — greedy k-center diversity selection (operators/sampling.
# kcenter_select): Gonzalez farthest-point over the embeddings table —
# the training-data coreset picker, 2-approximation to the k-center
# optimum. md5-seeded start, all-integer quantized L2 (q36 discipline),
# per-round argmax with min-id tie-break, incremental min-distance
# updates. The oracle unrolls every greedy round as CTEs with the same
# m > 0 early-stop guard.
# DuckDB feature req: core only (list fns + generate_series).
# ---------------------------------------------------------------------------

_KC_K = 8


def q175_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.sampling import kcenter_select

    emb = _tbl(spark, sf_dir, "embeddings")
    return kcenter_select(emb, k=_KC_K).orderBy("sel")


def _q175_sql() -> str:
    k = _KC_K
    dist = _sql_ivf_dist
    # every round CTE is MATERIALIZED (the q163 discipline): DuckDB
    # inlines plain CTEs, so the m{k} chain would otherwise expand into
    # an exponential tree of parquet re-scans ("too many open files")
    parts = [f"""q AS MATERIALIZED (
  SELECT vec_id, {_SQL_IVF_QUANT} AS qv FROM embeddings
), c0 AS MATERIALIZED (
  SELECT vec_id, qv FROM q
  ORDER BY md5('kc:' || vec_id::varchar), vec_id LIMIT 1
), m0 AS MATERIALIZED (
  SELECT p.vec_id, p.qv, {dist('p.qv', 'c.qv')}::bigint AS mind
  FROM q p, c0 c
)"""]
    for r in range(1, k):
        parts.append(f"""s{r} AS MATERIALIZED (
  SELECT max(mind) AS m FROM m{r - 1}
), c{r} AS MATERIALIZED (
  SELECT vec_id, qv, mind FROM m{r - 1}
  WHERE mind = (SELECT m FROM s{r}) AND (SELECT m FROM s{r}) > 0
  ORDER BY vec_id LIMIT 1
), m{r} AS MATERIALIZED (
  SELECT p.vec_id, p.qv,
         least(p.mind, {dist('p.qv', 'c.qv')}::bigint) AS mind
  FROM m{r - 1} p, c{r} c
)""")
    sel_union = "\n  UNION ALL ".join(
        ["SELECT 0 AS sel, vec_id, 0::bigint AS dist_fp FROM c0"]
        + [
            f"SELECT {r} AS sel, vec_id, mind::bigint AS dist_fp FROM c{r}"
            for r in range(1, k)
        ]
    )
    joined = ",\n".join(parts)
    return (
        f"WITH {joined}\n"
        f"SELECT sel, vec_id, dist_fp FROM ({sel_union}) ORDER BY sel"
    )



# ---------------------------------------------------------------------------
# Q176 — rendezvous shard movement audit (operators/packing.
# rendezvous_shard): highest-random-weight assignment at N=8 and N=9
# shards side by side — per old shard, how many rows move when the
# fleet grows. Rendezvous guarantees every mover lands on the NEW
# shard (survivors keep their relative hash order), expected movement
# 1/(N+1) vs modulo's ~N/(N+1); the per-shard audit is the proof read.
# Map-only struct-array argmax on the Spark side; the oracle replays
# the argmax with a (hash DESC, shard DESC) window.
# DuckDB feature req: core only (generate_series table fn + windows).
# ---------------------------------------------------------------------------

_RDV_N = 8


def q176_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.packing import rendezvous_shard

    docs = _docs(spark, sf_dir).select("doc_id")
    a8 = rendezvous_shard(docs, n_shards=_RDV_N, out_col="shard8")
    both = rendezvous_shard(a8, n_shards=_RDV_N + 1, out_col="shard9")
    return (
        both.groupBy("shard8")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("shard9") != F.col("shard8")).cast("long")
            ).alias("n_moved"),
        )
        .orderBy("shard8")
    )


_Q176_SQL = f"""
WITH a AS (
  SELECT doc_id, s,
         md5('rdv:' || doc_id::varchar || ':' || s::varchar) AS h
  FROM documents CROSS JOIN generate_series(0, {_RDV_N}) t(s)
), a8 AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY h DESC, s DESC) AS rn
    FROM a WHERE s < {_RDV_N}
  ) WHERE rn = 1
), a9 AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY h DESC, s DESC) AS rn
    FROM a
  ) WHERE rn = 1
)
SELECT a8.s::int AS shard8, count(*)::bigint AS n_docs,
       sum((a9.s <> a8.s)::int)::bigint AS n_moved
FROM a8 JOIN a9 USING (doc_id)
GROUP BY a8.s ORDER BY shard8
"""


# ---------------------------------------------------------------------------
# Q177 — per-type daily-volume trend (operators/profile.group_trend):
# OLS slope of each event type's daily count series from five exact
# int64 moments and ONE final division — q102 says whether the
# distribution drifted; this says which direction and how fast each
# stream's volume is moving. x is the day index from the group's own
# first day; slope_num/slope_den ship alongside the double so the
# exactness is auditable.
# DuckDB feature req: core only (date_diff + combiner aggregates).
# ---------------------------------------------------------------------------


def q177_volume_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import group_trend

    ev = spark.read.parquet(_t(sf_dir, "events")).select(
        "event_type", F.to_date("ts").alias("day"), F.lit(1).alias("n")
    )
    return group_trend(
        ev, group_col="event_type", day_col="day", count_col="n"
    ).orderBy("event_type")


_Q177_SQL = """
WITH daily AS (
  SELECT event_type AS g, ts::date AS d, count(*)::bigint AS y
  FROM events GROUP BY 1, 2
), f AS (
  SELECT g, min(d) AS d0 FROM daily GROUP BY g
), m AS (
  SELECT daily.g, count(*)::bigint AS n_days,
         sum(date_diff('day', d0, d))::bigint AS sx,
         sum(y)::bigint AS sy,
         sum(date_diff('day', d0, d) * y)::bigint AS sxy,
         sum(date_diff('day', d0, d) * date_diff('day', d0, d))::bigint
           AS sxx
  FROM daily JOIN f USING (g) GROUP BY daily.g
)
SELECT g AS event_type, n_days,
       (n_days * sxy - sx * sy)::bigint AS slope_num,
       (n_days * sxx - sx * sx)::bigint AS slope_den,
       CASE WHEN n_days * sxx - sx * sx > 0
            THEN (n_days * sxy - sx * sy)::double
                 / (n_days * sxx - sx * sx) END AS slope
FROM m ORDER BY event_type
"""



# ---------------------------------------------------------------------------
# Q178 — bounded-hop cheapest paths (operators/graph.bellman_bounded):
# weighted Bellman-Ford rounds over the q78 co-purchase part graph with
# integer-cents bundle weights — the MIN-PLUS path semiring next to
# q78's hop counts and q161's max-plus layers. Each round is the
# FUNCTIONAL relaxation d_r(v) = min(d_{r-1}(v), min (u,v) d_{r-1}(u)+w),
# so the oracle's unrolled MATERIALIZED rounds and Spark's
# delta-frontier schedule provably produce identical tables.
# DuckDB feature req: core only (MATERIALIZED CTEs).
# ---------------------------------------------------------------------------

_BF_HOPS = 3


def q178_cheapest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import bellman_bounded

    li = spark.read.parquet(_t(sf_dir, "lineitem")).select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").alias("pk"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    # pre-partition by the self-join key: the single-file scan would
    # otherwise feed BOTH join legs from one-task shuffle writes; hashed
    # on "ok" the exchange is built once, reused by both sides (guide
    # §2.4 — two operations keyed the same way share one exchange), and
    # a real pre-bucketed table skips it via the same file-count guard
    if len(li.inputFiles()) < spark.sparkContext.defaultParallelism:
        li = li.repartition(spark.sparkContext.defaultParallelism, "ok")
    edges = (
        li.alias("a")
        .join(li.alias("b"), "ok")
        .filter(F.col("a.pk") != F.col("b.pk"))
        .select(
            F.col("a.pk").alias("src"),
            F.col("b.pk").alias("dst"),
            (F.col("a.cents") + F.col("b.cents")).alias("w"),
        )
    )
    # FIXED-SIZE seed panel (<= 20 roots at any scale): the co-purchase
    # graph is dense (an order contributes a clique), so per-root balls
    # approach the whole graph by depth 3 — seeding a fixed panel keeps
    # the demonstrated cost scale-INDEPENDENT where a percentage seed
    # made bench cost grow with corpus size (27s at sf0.1). A production
    # run picks the roots it actually needs; the operator is per-root
    # linear either way.
    roots = edges.select("src").filter(
        (F.col("src") % 100 == 0) & (F.col("src") <= 2000)
    ).distinct()
    return bellman_bounded(
        edges, roots, max_hops=_BF_HOPS
    ).orderBy("root", "node")


def _q178_sql() -> str:
    rounds = []
    for r in range(1, _BF_HOPS + 1):
        rounds.append(f"""d{r} AS MATERIALIZED (
  SELECT root, node, min(d)::bigint AS d FROM (
    SELECT root, node, d FROM d{r - 1}
    UNION ALL
    SELECT p.root, e.v AS node, p.d + e.w AS d
    FROM d{r - 1} p JOIN e ON e.u = p.node
  ) GROUP BY root, node
)""")
    joined = ",\n".join(rounds)
    return f"""
WITH li AS MATERIALIZED (
  SELECT l_orderkey AS ok, l_partkey AS pk,
         floor(l_extendedprice * 100)::bigint AS cents
  FROM lineitem
), e AS MATERIALIZED (
  SELECT a.pk AS u, b.pk AS v, min(a.cents + b.cents)::bigint AS w
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
  GROUP BY a.pk, b.pk
), d0 AS MATERIALIZED (
  SELECT DISTINCT u AS root, u AS node, 0::bigint AS d
  FROM e WHERE u % 100 = 0 AND u <= 2000
),
{joined}
SELECT root, node, d AS dist FROM d{_BF_HOPS} ORDER BY root, node
"""


# ---------------------------------------------------------------------------
# Q179 — exact 1-Wasserstein drift (operators/profile.wasserstein1):
# earth-mover distance between the even/odd-snapshot token-count
# distributions — unlike PSI (q102) it respects the ORDER of the value
# domain (mass moved two buckets costs twice one). Closed form
# ∫|CDF_A - CDF_B| dx as exact int64 under the common denominator
# nA*nB, finished by ONE division; the windows run over the
# value-domain histogram only (q45 discipline).
# DuckDB feature req: core only (window cumulative sums + lead).
# ---------------------------------------------------------------------------


def q179_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import wasserstein1
    from pathhier_spark.operators.textstats import with_token_counts

    docs = _docs(spark, sf_dir)
    b = with_token_counts(docs).select(
        F.col("ws_tokens").alias("v"), (F.col("doc_id") % 2).alias("snap")
    )
    return wasserstein1(b, value_col="v", group_col="snap")


_Q179_SQL = f"""
WITH t AS (
  SELECT len({_SQL_WS_TOKS})::bigint AS x, (doc_id % 2) AS g
  FROM documents
), h AS (
  SELECT x, sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)::bigint AS na,
            sum(CASE WHEN g <> 0 THEN 1 ELSE 0 END)::bigint AS nb
  FROM t GROUP BY x
), c AS (
  SELECT x, na, nb,
         (sum(na) OVER w)::bigint AS cuma,
         (sum(nb) OVER w)::bigint AS cumb,
         lead(x) OVER (ORDER BY x) AS xnext
  FROM h
  WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
), tot AS (
  SELECT coalesce(sum(na), 0)::bigint AS n_a,
         coalesce(sum(nb), 0)::bigint AS n_b FROM h
), num AS (
  SELECT coalesce(sum(abs(cuma * (SELECT n_b FROM tot)
                          - cumb * (SELECT n_a FROM tot))
                      * (xnext - x)), 0)::bigint AS w1_num
  FROM c WHERE xnext IS NOT NULL
)
SELECT n_a, n_b, w1_num,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN w1_num::double / (n_a * n_b) END AS w1
FROM tot, num
"""



# ---------------------------------------------------------------------------
# Q180 — quality-signal correlation matrix (operators/profile.
# signal_correlations): pairwise Pearson between the q14-family count
# signals (n_chars / n_distinct / n_stop / n_tokens) — which signals
# are redundant before weighting a quality blend. ONE aggregate pass
# computes every moment; exact int64 numerator/denominators ship in the
# output; the corr finish is the fixed-shape cast-divide-sqrt-divide.
# DuckDB feature req: core only (sums + sqrt).
# ---------------------------------------------------------------------------

_CORR_SIGS = ["n_chars", "n_distinct", "n_stop", "n_tokens"]


def q180_signal_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import signal_correlations
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    toks = _tokens("text")
    stop_lit = F.array(*[F.lit(w) for w in STOPWORDS])
    feats = docs.select(
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.size(
            F.filter(toks, lambda t: F.array_contains(stop_lit, t))
        ).cast("long").alias("n_stop"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    return signal_correlations(feats, cols=_CORR_SIGS)


def _q180_sql() -> str:
    cs = sorted(_CORR_SIGS)
    sums = ["count(*)::bigint AS n"]
    for c in cs:
        sums.append(f"sum({c})::bigint AS s_{c}")
        sums.append(f"sum({c} * {c})::bigint AS ss_{c}")
    pairs = []
    for i, a in enumerate(cs):
        for b in cs[i + 1 :]:
            sums.append(f"sum({a} * {b})::bigint AS sp_{a}_{b}")
            pairs.append((a, b))
    rows = []
    for a, b in pairs:
        num = f"(n * sp_{a}_{b} - s_{a} * s_{b})"
        da = f"(n * ss_{a} - s_{a} * s_{a})"
        db = f"(n * ss_{b} - s_{b} * s_{b})"
        rows.append(f"""SELECT '{a}' AS sig_a, '{b}' AS sig_b, n,
       {num}::bigint AS corr_num,
       {da}::bigint AS den_a, {db}::bigint AS den_b,
       CASE WHEN {da} > 0 AND {db} > 0 THEN
         {num}::double / sqrt({da}::double) / sqrt({db}::double)
       END AS corr
FROM m""")
    union = "\nUNION ALL\n".join(rows)
    return f"""
WITH feats AS (
  SELECT length(text)::bigint AS n_chars,
         len(list_distinct(toks))::bigint AS n_distinct,
         len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))::bigint
           AS n_stop,
         len(toks)::bigint AS n_tokens
  FROM (SELECT text, {_SQL_WS_TOKS} AS toks FROM documents)
), m AS MATERIALIZED (
  SELECT {", ".join(sums)} FROM feats
)
SELECT * FROM ({union}) ORDER BY sig_a, sig_b
"""



# ---------------------------------------------------------------------------
# Q181 — lang × source mutual information (operators/profile.
# mutual_information): how many nats knowing the crawl source tells you
# about language — the association scalar next to chi-square (q104) and
# kappa (q105), comparable across pairs and bounded by min entropy.
# Exact int64 cell counts, one-division ln arguments, (x, y)-ordered
# fold from 0.0 (the q104 float-sum discipline).
# DuckDB feature req: core SQL + list(ORDER BY)/list_sum (the q63 fold).
# ---------------------------------------------------------------------------


def q181_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import mutual_information

    docs = _docs(spark, sf_dir)
    return mutual_information(docs, x_col="lang", y_col="source")


_Q181_SQL = """
WITH cells AS (
  SELECT lang AS x, source AS y, count(*)::bigint AS nij
  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
  GROUP BY 1, 2
), rx AS (
  SELECT x, sum(nij)::bigint AS rx FROM cells GROUP BY x
), cy AS (
  SELECT y, sum(nij)::bigint AS cy FROM cells GROUP BY y
), tot AS (
  SELECT sum(nij)::bigint AS n FROM cells
), terms AS (
  SELECT x, y,
         (nij::double / n) * ln((nij * n)::double / (rx * cy)::double) AS t
  FROM cells JOIN rx USING (x) JOIN cy USING (y), tot
)
SELECT (SELECT n FROM tot) AS n, count(*)::bigint AS n_cells,
       (round(coalesce(list_sum(list(t ORDER BY x, y)), 0.0), 6) + 0.0) AS mi
FROM terms
"""


# ---------------------------------------------------------------------------
# Q182 — calibration reliability bins (operators/profile.
# calibration_bins): does the stopword score MEAN what it says — per
# score decile, positive fraction vs mean score, each ONE exact-int
# division; the third member of the eval family (q172 threshold sweep,
# q174 ranking AUC). Same shared scored input as q172/q174.
# DuckDB feature req: core only.
# ---------------------------------------------------------------------------

_CAL_BINS = 10


def q182_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import calibration_bins

    return calibration_bins(
        _stopword_scored(spark, sf_dir), n_bins=_CAL_BINS
    )


_Q182_SQL = f"""
WITH t AS (
  SELECT (1000000 * len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))))
           // len(toks) AS score_fp,
         (lang = 'en')::int AS y
  FROM (SELECT {_SQL_WS_TOKS} AS toks, lang FROM documents)
  WHERE len(toks) > 0
), b AS (
  SELECT least((score_fp * {_CAL_BINS}) // 1000000, {_CAL_BINS - 1})
           AS bin,
         score_fp, y
  FROM t
)
SELECT bin, count(*)::bigint AS n,
       coalesce(sum(y), 0)::bigint AS n_pos,
       coalesce(sum(y), 0)::double / count(*) AS frac_pos,
       sum(score_fp)::double / count(*) AS mean_score_fp
FROM b GROUP BY bin ORDER BY bin
"""



# ---------------------------------------------------------------------------
# Q183 — corpus-quantile normalization per source (operators/profile.
# corpus_quantile_bins): place every doc's stopword score at its
# corpus-wide quantile, histogram each source over those bins — the
# cross-source normalization that survives per-source score drift
# (q71 answers the inverse: per-group cut points). Exact integer
# ranks: below-counts from an exclusive window over the score
# HISTOGRAM, qbin = (below * 10) DIV n — no interpolation.
# DuckDB feature req: core only (window cumulative sums).
# ---------------------------------------------------------------------------

_QN_BINS = 10


def q183_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import corpus_quantile_bins
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    toks = _tokens("text")
    stop_lit = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_lit, t)))
    scored = docs.select(
        "source",
        F.size(toks).alias("n_tok"),
        n_stop.alias("n_stop"),
    ).filter(F.col("n_tok") > 0)
    scored = scored.select(
        "source",
        F.floor(F.lit(1_000_000) * F.col("n_stop") / F.col("n_tok")).alias(
            "score_fp"
        ),
    )
    return corpus_quantile_bins(scored, n_bins=_QN_BINS)


_Q183_SQL = f"""
WITH t AS (
  SELECT source,
         (1000000 * len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))))
           // len(toks) AS s
  FROM (SELECT source, {_SQL_WS_TOKS} AS toks FROM documents)
  WHERE len(toks) > 0
), h AS (
  SELECT s, count(*)::bigint AS ns FROM t GROUP BY s
), qmap AS (
  SELECT s, coalesce((sum(ns) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))::bigint, 0)
           AS below
  FROM h
), tot AS (
  SELECT sum(ns)::bigint AS n FROM h
)
SELECT t.source, ((qmap.below * {_QN_BINS}) // (SELECT n FROM tot))::bigint
         AS qbin,
       count(*)::bigint AS n_rows
FROM t JOIN qmap USING (s)
GROUP BY t.source, qbin
ORDER BY source, qbin
"""


# ---------------------------------------------------------------------------
# Q184 — KMV join-cardinality estimate (operators/textstats.
# kmv_key_overlap): the planner statistic behind "will this join
# explode" — union-sketch |A∪B|, in-both fraction as exact-int
# Jaccard, their product as the key-overlap estimate, with the EXACT
# intersection and join row count in the same row so the sketch error
# is auditable. orders.o_custkey vs customer.c_custkey.
# DuckDB feature req: core only (md5 + hex parse — the q50 idiom).
# ---------------------------------------------------------------------------

_JE_K = 256


def q184_join_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import kmv_key_overlap

    orders = spark.read.parquet(_t(sf_dir, "orders"))
    cust = spark.read.parquet(_t(sf_dir, "customer"))
    return kmv_key_overlap(
        orders, cust, key_a="o_custkey", key_b="c_custkey", k=_JE_K
    )


def _q184_sql() -> str:
    k = _JE_K
    return f"""
WITH ha AS (
  SELECT DISTINCT {_sql_hex32('o_custkey::varchar')} AS h FROM orders
), hb AS (
  SELECT DISTINCT {_sql_hex32('c_custkey::varchar')} AS h FROM customer
), mina AS (SELECT h FROM ha ORDER BY h LIMIT {k}),
minb AS (SELECT h FROM hb ORDER BY h LIMIT {k}),
u AS (
  SELECT h, coalesce(a.in_a, 0) AS in_a, coalesce(b.in_b, 0) AS in_b
  FROM (SELECT h, 1 AS in_a FROM mina) a
  FULL JOIN (SELECT h, 1 AS in_b FROM minb) b USING (h)
  ORDER BY h LIMIT {k}
), sk AS (
  SELECT count(*)::bigint AS k_used, max(h) AS kth,
         sum(in_a * in_b)::bigint AS n_both
  FROM u
), ex AS (
  SELECT count(*)::bigint AS exact_inter FROM (
    SELECT DISTINCT o_custkey FROM orders
  ) a JOIN (SELECT DISTINCT c_custkey FROM customer) b
    ON a.o_custkey = b.c_custkey
), er AS (
  SELECT count(*)::bigint AS exact_join_rows
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT k_used, n_both,
       (round(CASE WHEN k_used < {k} THEN k_used::double
              ELSE {k - 1}.0 / (kth::double / 4294967296.0) END, 4) + 0.0)
         AS est_union,
       n_both::double / k_used AS est_jaccard,
       (round((n_both::double / k_used)
              * (CASE WHEN k_used < {k} THEN k_used::double
                 ELSE {k - 1}.0 / (kth::double / 4294967296.0) END), 4)
        + 0.0) AS est_inter,
       exact_inter, exact_join_rows
FROM sk, ex, er
"""



# ---------------------------------------------------------------------------
# Q185 — incremental connected components (operators/canonicalize.
# cc_incremental): the q18 graph split 90/10 into history + delta; the
# Spark side labels the history with full CC, then folds the delta in
# via cc_incremental (only touched components re-cluster, prior labels
# reused as depth-1 stars). The oracle is FULL-GRAPH recursive-CTE CC —
# so "incremental equals from-scratch" is the hash claim itself.
# DuckDB feature req: recursive CTE (the q18 oracle).
# ---------------------------------------------------------------------------


def q185_cc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.canonicalize import (
        cc_incremental,
        connected_components,
    )

    c = spark.read.parquet(_t(sf_dir, "customer"))
    pad = lambda col: F.lpad(col.cast("string"), 20, "0")  # noqa: E731
    a = c.select(
        F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("n")
    )
    b = c.select(
        (F.col("c_custkey") - 1).alias("k"), F.col("c_nationkey").alias("n2"),
        F.col("c_custkey").alias("k2"),
    )
    e = a.join(b, ["k"]).filter(F.col("n") == F.col("n2")).select(
        "k", "k2"
    )
    old = e.filter(F.col("k") % 10 != 0).select(
        pad(F.col("k")).alias("xref_a"), pad(F.col("k2")).alias("xref_b")
    )
    new = e.filter(F.col("k") % 10 == 0).select(
        pad(F.col("k")).alias("xref_a"), pad(F.col("k2")).alias("xref_b")
    )
    nodes_all = c.select(pad(F.col("c_custkey")).alias("xref_a")).select(
        "xref_a", F.col("xref_a").alias("xref_b")
    )
    history = connected_components(old.union(nodes_all))
    merged = cc_incremental(history, new)
    return merged.select(
        F.col("node").cast("bigint").alias("c_custkey"),
        F.col("component").cast("bigint").alias("component"),
    ).orderBy("c_custkey")


# deliberately the q18 oracle verbatim: the gate claim IS that the
# incremental path reproduces from-scratch full-graph CC bit-for-bit
_Q185_SQL = Q18_SQL



# ---------------------------------------------------------------------------
# Q186 — greedy set-cover corpus selection (operators/sampling.
# set_cover_select): the submodular maximum-coverage pick — each round
# the document covering the most not-yet-covered vocabulary, the
# (1 − 1/e) classic for training-data selection, kcenter's (q175)
# discrete-vocabulary companion. Exact distinct-token gains, two-phase
# argmax (max gain, min id), early stop at zero gain; the oracle
# unrolls every greedy round as MATERIALIZED CTEs with NOT EXISTS
# anti-joins.
# DuckDB feature req: core SQL (MATERIALIZED CTEs + NOT EXISTS).
# ---------------------------------------------------------------------------

_SC_K = 5


def q186_set_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.sampling import set_cover_select

    # cover token BIGRAMS, not unigrams: the driver corpus has ~31
    # distinct tokens, so unigram cover degenerates to one pick; the
    # ~900-bigram vocabulary exercises a real multi-round greedy trace
    toks = _tokens_q("text")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    docs = _docs(spark, sf_dir).select("doc_id", grams.alias("toks"))
    return set_cover_select(docs, k=_SC_K).orderBy("sel")


def _q186_sql() -> str:
    k = _SC_K
    parts = [f"""toks AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(ts) - 1),
                               i -> ts[i] || ' ' || ts[i + 1])) AS tok
  FROM (SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents)
  WHERE len(ts) >= 2
)"""]
    prev_cov = None
    selects = []
    for r in range(1, k + 1):
        if prev_cov is None:
            pool = "toks t"
            where = ""
        else:
            pool = "toks t"
            where = (f"WHERE NOT EXISTS (SELECT 1 FROM {prev_cov} c "
                     f"WHERE c.tok = t.tok)")
        parts.append(f"""g{r} AS MATERIALIZED (
  SELECT t.doc_id, count(*)::bigint AS gain FROM {pool} {where}
  GROUP BY t.doc_id
), c{r} AS MATERIALIZED (
  SELECT doc_id, gain FROM g{r}
  WHERE gain = (SELECT max(gain) FROM g{r})
    AND (SELECT max(gain) FROM g{r}) > 0
  ORDER BY doc_id LIMIT 1
), cov{r} AS MATERIALIZED (
  {"SELECT tok FROM " + prev_cov + " UNION " if prev_cov else ""}
  SELECT t.tok FROM toks t JOIN c{r} USING (doc_id)
)""")
        selects.append(
            f"SELECT {r - 1} AS sel, doc_id, gain, "
            f"(SELECT count(*) FROM cov{r})::bigint AS n_covered FROM c{r}"
        )
        prev_cov = f"cov{r}"
    union = "\nUNION ALL\n".join(selects)
    joined = ",\n".join(parts)
    return f"WITH {joined}\nSELECT * FROM ({union}) ORDER BY sel"



# ---------------------------------------------------------------------------
# Q187 — exact-integer readability (operators/textstats.
# with_readability): the Flesch formula in micro-units from exact
# sentence/word/vowel-group counts — the "is it HARD text" knob the
# q14 quality family lacks. Every step integer (two DIVs, two
# multiplies, two subtracts), map-only, no clamping (negative scores
# are real Flesch behavior).
# DuckDB feature req: core only (regexp splits + list fold).
# ---------------------------------------------------------------------------


def q187_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import with_readability

    docs = _docs(spark, sf_dir)
    return with_readability(docs).select(
        "doc_id", "n_sentences", "n_words", "n_syllables", "flesch_fp"
    ).orderBy("doc_id")


_Q187_SQL = f"""
WITH t AS (
  SELECT doc_id,
         greatest(len(list_filter(string_split_regex(text, '[.!?]+'),
                                  s -> trim(s) <> '')), 1)::bigint
           AS n_sentences,
         {_SQL_WS_TOKS} AS toks
  FROM documents
), c AS (
  SELECT doc_id, n_sentences,
         len(toks)::bigint AS n_words,
         list_sum(list_transform(toks, w -> greatest(
           len(list_filter(string_split_regex(w, '[^aeiouy]+'),
                           s -> s <> '')), 1)))::bigint AS n_syllables
  FROM t
)
SELECT doc_id, n_sentences, n_words,
       coalesce(n_syllables, 0)::bigint AS n_syllables,
       CASE WHEN n_words > 0 THEN
         (206835000
          - 1015 * ((1000 * n_words) // n_sentences)
          - 84600 * ((1000 * coalesce(n_syllables, 0)) // n_words))::bigint
       END AS flesch_fp
FROM c ORDER BY doc_id
"""



# ---------------------------------------------------------------------------
# Q188 — seeded EDGE betweenness (operators/graph.
# edge_betweenness_seeded): the Girvan-Newman primitive — which EDGES
# shortest paths route through, q173's per-edge dual (same forward
# sigma-BFS; the backward pass emits each DAG edge's Brandes credit
# and runs down to depth 0, since edges out of a root carry real
# credit). Same graph and seeds as q173; the oracle unrolls forward
# sigma rounds, per-level term tables, and node-delta rounds as CTEs.
# DuckDB feature req: core SQL (correlated NOT EXISTS).
# ---------------------------------------------------------------------------


def q188_edge_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import edge_betweenness_seeded

    docs = _docs(spark, sf_dir)
    tr = extract_token_triples(docs, TRIGGERS).select(
        F.least("subj", "obj").alias("u"), F.greatest("subj", "obj").alias("v")
    ).filter(F.col("u") < F.col("v")).distinct()
    sym = tr.union(tr.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sources = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .filter(F.substring(F.md5("node"), 1, 1) == "0")
    )
    return edge_betweenness_seeded(
        sym, sources, src="u", dst="v", max_depth=_BC_DEPTH
    ).orderBy("u", "v")


def _q188_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    D = _BC_DEPTH
    fwd = []
    prev_v, prev_f = "v0", "v0"
    for d in range(1, D + 1):
        fwd.append(f"""n{d} AS (
  SELECT f.root, e.v AS node, sum(f.sigma)::bigint AS sigma
  FROM {prev_f} f JOIN e ON e.u = f.node
  WHERE NOT EXISTS (SELECT 1 FROM {prev_v} p
                    WHERE p.root = f.root AND p.node = e.v)
  GROUP BY f.root, e.v
), v{d} AS (
  SELECT root, node, depth, sigma FROM {prev_v}
  UNION ALL SELECT root, node, {d} AS depth, sigma FROM n{d}
)"""
        )
        prev_v, prev_f = f"v{d}", f"n{d}"
    bwd = [f"""del{D} AS (
  SELECT root, node, sigma, 0::bigint AS delta
  FROM {prev_v} WHERE depth = {D}
)"""]
    for d in range(D - 1, -1, -1):
        bwd.append(f"""t{d} AS (
  SELECT u.root, u.node AS un, w.node AS wn,
         ((u.sigma * (1000000 + w.delta)) // w.sigma)::bigint AS term
  FROM (SELECT root, node, sigma FROM {prev_v} WHERE depth = {d}) u
  JOIN e ON e.u = u.node
  JOIN del{d + 1} w ON w.root = u.root AND w.node = e.v
)""")
        if d > 0:
            bwd.append(f"""del{d} AS (
  SELECT vd.root, vd.node, vd.sigma, coalesce(x.dsum, 0)::bigint AS delta
  FROM (SELECT root, node, sigma FROM {prev_v} WHERE depth = {d}) vd
  LEFT JOIN (
    SELECT root, un, sum(term)::bigint AS dsum FROM t{d} GROUP BY root, un
  ) x ON x.root = vd.root AND x.un = vd.node
)""")
    term_union = "\n  UNION ALL ".join(
        f"SELECT un, wn, term FROM t{d}" for d in range(D - 1, -1, -1)
    )
    rounds = ",\n".join(fwd + bwd)
    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] IN {trig_list}
), und AS (
  SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
  FROM raw WHERE least(s, d) < greatest(s, d)
), e AS (
  SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
), roots AS (
  SELECT node FROM (SELECT DISTINCT u AS node FROM e)
  WHERE {_HC_SEED_WHERE}
), v0 AS (
  SELECT node AS root, node, 0 AS depth, 1::bigint AS sigma FROM roots
),
{rounds}
SELECT un AS u, wn AS v, sum(term)::bigint AS eb_fp,
       (round((sum(term)::bigint)::double / 1000000.0, 6) + 0.0) AS eb
FROM ({term_union})
GROUP BY un, wn
ORDER BY u, v
"""



# ---------------------------------------------------------------------------
# Q189 — Spearman rank correlation (operators/profile.spearman_rho):
# do n_chars and token count move together MONOTONICALLY — the
# rank-based companion to q180's Pearson, robust to the skew that
# makes linear correlation lie on heavy-tailed signals. Doubled
# average ranks (2·below + n_v + 1, exact ints — q174's doubling
# applied to midranks), deviations against the exact mean n+1, one
# fused moment aggregate, fixed-shape sqrt finish.
# DuckDB feature req: core only (window cumulative sums).
# ---------------------------------------------------------------------------


def q189_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import spearman_rho

    docs = _docs(spark, sf_dir)
    feats = docs.select(
        F.length("text").cast("long").alias("n_chars"),
        F.size(_tokens_q("text")).cast("long").alias("n_tokens"),
    )
    return spearman_rho(feats, x_col="n_chars", y_col="n_tokens")


_Q189_SQL = f"""
WITH rows_ AS (
  SELECT length(text)::bigint AS x,
         len({_SQL_WS_TOKS})::bigint AS y
  FROM documents
  WHERE text IS NOT NULL
), hx AS (
  SELECT x, count(*)::bigint AS nv FROM rows_ GROUP BY x
), rx AS (
  SELECT x,
         (2 * coalesce((sum(nv) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))::bigint, 0)
          + nv + 1) AS r2x
  FROM hx
), hy AS (
  SELECT y, count(*)::bigint AS nv FROM rows_ GROUP BY y
), ry AS (
  SELECT y,
         (2 * coalesce((sum(nv) OVER (ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))::bigint, 0)
          + nv + 1) AS r2y
  FROM hy
), tot AS (
  SELECT count(*)::bigint AS n FROM rows_
), d AS (
  SELECT (SELECT n FROM tot) AS n,
         r2x - ((SELECT n FROM tot) + 1) AS dx,
         r2y - ((SELECT n FROM tot) + 1) AS dy
  FROM rows_ JOIN rx USING (x) JOIN ry USING (y)
), m AS (
  SELECT max(n)::bigint AS n,
         coalesce(sum(dx * dy), 0)::bigint AS sum_dxdy,
         coalesce(sum(dx * dx), 0)::bigint AS sum_dx2,
         coalesce(sum(dy * dy), 0)::bigint AS sum_dy2
  FROM d
)
SELECT n, sum_dxdy, sum_dx2, sum_dy2,
       CASE WHEN sum_dx2 > 0 AND sum_dy2 > 0 THEN
         sum_dxdy::double / sqrt(sum_dx2::double) / sqrt(sum_dy2::double)
       END AS rho
FROM m
"""



# ---------------------------------------------------------------------------
# Q190 — jackknife error bar on the corpus token mean (operators/
# profile.jackknife_mean_se): the delete-one-shard SE that turns every
# monitoring scalar into a testable claim — md5 shards (RNG-free,
# engine-portable), exact int64 shard sums, one exact-int division per
# leave-one-out mean, shard-ordered 0.0-seed folds for the variance
# (the q104 float-sum discipline).
# DuckDB feature req: core SQL + list(ORDER BY)/list fns (q63 fold).
# ---------------------------------------------------------------------------

_JK_SHARDS = 10


def q190_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import jackknife_mean_se

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(_tokens_q("text")).cast("long").alias("v")
    )
    return jackknife_mean_se(docs, n_shards=_JK_SHARDS)


def _q190_sql() -> str:
    s = _JK_SHARDS
    return f"""
WITH rows_ AS (
  SELECT {_sql_hex32("'jk:' || doc_id::varchar")} % {s} AS sh,
         len({_SQL_WS_TOKS})::bigint AS v
  FROM documents
), per AS (
  SELECT sh, count(*)::bigint AS ni, sum(v)::bigint AS ti
  FROM rows_ WHERE v IS NOT NULL GROUP BY sh
), tot AS (
  SELECT sum(ni)::bigint AS n, sum(ti)::bigint AS t FROM per
), loo AS (
  SELECT sh, (t - ti)::double / (n - ni) AS m
  FROM per, tot WHERE n > ni
), agg AS (
  SELECT (SELECT n FROM tot) AS n, (SELECT t FROM tot) AS t,
         count(*)::bigint AS s_used,
         list(m ORDER BY sh) AS ms
  FROM loo
), mb AS (
  SELECT n, t, s_used, ms, list_sum(ms) / s_used AS mbar FROM agg
)
SELECT n, s_used AS n_shards_used,
       t::double / n AS mean,
       (round(sqrt(list_sum(list_transform(ms, z -> (z - mbar) * (z - mbar)))
                   * (s_used - 1) / s_used), 6) + 0.0) AS jk_se
FROM mb
"""



# ---------------------------------------------------------------------------
# Q191 — Weisfeiler-Leman structural fingerprint (operators/graph.
# wl_fingerprint) over the q188 triple graph: round-0 degree labels,
# each round relabels a node with hex32(own label : sorted neighbor
# labels); the final label HISTOGRAM is the snapshot fingerprint —
# two KG snapshots whose histograms differ are provably
# non-isomorphic, so diffing this row set is the structural drift
# alarm (far stronger than node/edge counts, no pairwise work). The
# oracle unrolls the same refinement as string_agg(ORDER BY label)
# CTE rounds over the identical md5 relabel hash.
# DuckDB feature req: core SQL + string_agg(ORDER BY) + md5 (hex32).
# ---------------------------------------------------------------------------

_WL_ROUNDS = 2


def q191_wl_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import wl_fingerprint

    docs = _docs(spark, sf_dir)
    tr = (
        extract_token_triples(docs, TRIGGERS)
        .select(
            F.least("subj", "obj").alias("u"),
            F.greatest("subj", "obj").alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    return (
        wl_fingerprint(tr, src="u", dst="v", rounds=_WL_ROUNDS)
        .groupBy("wl_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy("wl_label")
    )


def _q191_sql() -> str:
    trig_list = "(" + ", ".join(f"'{k}'" for k in sorted(TRIGGERS)) + ")"
    rounds = []
    for r in range(1, _WL_ROUNDS + 1):
        relabel = _sql_hex32(f"p.lbl::varchar || ':' || a.ns")
        rounds.append(f"""a{r} AS (
  SELECT e.v AS node, string_agg(l.lbl::varchar, ',' ORDER BY l.lbl) AS ns
  FROM e JOIN l{r - 1} l ON l.node = e.u
  GROUP BY e.v
), l{r} AS (
  SELECT p.node, {relabel} AS lbl
  FROM l{r - 1} p JOIN a{r} a ON a.node = p.node
)""")
    body = ",\n".join(rounds)
    return f"""
WITH raw AS (
  SELECT t[i-1] AS s, t[i+1] AS d
  FROM (
    SELECT t, unnest(generate_series(2, len(t) - 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
  WHERE t[i] IN {trig_list}
), und AS (
  SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
  FROM raw WHERE least(s, d) < greatest(s, d)
), e AS (
  SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
), l0 AS (
  SELECT u AS node, count(*)::bigint AS lbl FROM e GROUP BY u
),
{body}
SELECT lbl AS wl_label, count(*)::bigint AS n_nodes
FROM l{_WL_ROUNDS}
GROUP BY lbl
ORDER BY wl_label
"""


# ---------------------------------------------------------------------------
# Q192 — interpolated Kneser-Ney bigram surprisal (operators/textstats.
# kneser_ney_surprisal): the continuation-count smoothing the
# stupid-backoff family (q92/q159) cannot express — the fallback asks
# "in how many distinct contexts does w2 appear?", not "how often",
# so a frequent-but-bound word (Francisco after San) stops looking
# plausible everywhere. Discount D = 3/4 exactly; scaling by 4 makes
# p(w2|w1) a ratio of two exact int64s (num/den, M = B + U + 1), so
# lnp = ln(den) - ln(num) is computed from identical integers on both
# engines. Trains on even doc ids, scores all docs (the q159 held-out
# design — it is what makes the discount and continuation tiers fire);
# per-doc sums fold in POSITION order.
# DuckDB feature req: core SQL + list(ORDER BY)/list_sum.
# ---------------------------------------------------------------------------


def q192_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import kneser_ney_surprisal

    docs = _docs(spark, sf_dir)
    return kneser_ney_surprisal(docs).orderBy("doc_id")


_Q192_SQL = f"""
WITH toks AS (
  SELECT doc_id, (i - 1)::int AS pos, ts[i] AS w1
  FROM (
    SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i
    FROM (SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents)
  )
), pairs AS (
  SELECT * FROM (
    SELECT doc_id, pos, w1,
           lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM toks
  ) WHERE w2 IS NOT NULL
), bi AS (
  SELECT w1, w2, count(*)::bigint AS c2 FROM pairs
  WHERE doc_id % 2 = 0 GROUP BY w1, w2
), pre AS (
  SELECT w1, sum(c2)::bigint AS c1p, count(*)::bigint AS n1f
  FROM bi GROUP BY w1
), bwd AS (
  SELECT w2 AS bw, count(*)::bigint AS n1b FROM bi GROUP BY w2
), scal AS (
  SELECT ((SELECT count(*) FROM bi)
          + (SELECT count(DISTINCT w1) FROM toks WHERE doc_id % 2 = 0)
          + 1)::bigint AS m
), probe AS (
  SELECT pr.doc_id, pr.pos,
         CASE WHEN p.c1p IS NOT NULL THEN
           ln((4 * p.c1p * s.m)::double)
           - ln((greatest(4 * coalesce(b.c2, 0) - 3, 0) * s.m
                 + 3 * p.n1f * (coalesce(g.n1b, 0) + 1))::double)
         ELSE
           ln(s.m::double) - ln((coalesce(g.n1b, 0) + 1)::double)
         END AS lnp,
         CASE WHEN b.c2 IS NOT NULL THEN 1 ELSE 0 END AS t_seen,
         CASE WHEN b.c2 IS NULL AND p.c1p IS NOT NULL THEN 1 ELSE 0 END
           AS t_disc,
         CASE WHEN p.c1p IS NULL THEN 1 ELSE 0 END AS t_oov
  FROM pairs pr
  LEFT JOIN bi b USING (w1, w2)
  LEFT JOIN pre p USING (w1)
  LEFT JOIN bwd g ON g.bw = pr.w2
  CROSS JOIN scal s
), per_doc AS (
  SELECT doc_id, count(*) AS n_scored,
         sum(t_seen)::bigint AS n_seen, sum(t_disc)::bigint AS n_disc,
         sum(t_oov)::bigint AS n_oovctx,
         list_sum(list(lnp ORDER BY pos)) AS sum_lnp
  FROM probe GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_scored, 0)::bigint AS n_scored,
       coalesce(p.n_seen, 0)::bigint AS n_seen,
       coalesce(p.n_disc, 0)::bigint AS n_disc,
       coalesce(p.n_oovctx, 0)::bigint AS n_oovctx,
       CASE WHEN p.n_scored > 0
            THEN round(p.sum_lnp / p.n_scored, 6) + 0.0 END
         AS avg_surprisal
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Q193 — exact two-sample Kolmogorov-Smirnov drift (operators/profile.
# ks_two_sample): the sup-norm sibling of q179's Wasserstein — W1
# integrates |CDF_A - CDF_B|, KS takes its MAXIMUM, the right alarm
# when one narrow band moved (a new source injecting only very short
# docs barely moves W1 but spikes KS). Even/odd doc-id snapshots over
# the char-length signal; D's numerator is max|cumA*nB - cumB*nA| as
# exact int64 (shipped), ks_d one division, ks_stat the fixed-shape
# sqrt(cast-divide)*divide asymptotic scale. Windows run over the
# value-domain histogram only (q45 discipline).
# DuckDB feature req: core only (window cumulative sums).
# ---------------------------------------------------------------------------


def q193_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import ks_two_sample

    docs = _docs(spark, sf_dir)
    b = docs.select(
        F.length("text").cast("long").alias("v"),
        (F.col("doc_id") % 2).alias("snap"),
    )
    return ks_two_sample(b, value_col="v", group_col="snap")


_Q193_SQL = """
WITH t AS (
  SELECT length(text)::bigint AS x, (doc_id % 2) AS g
  FROM documents
), h AS (
  SELECT x, sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)::bigint AS na,
            sum(CASE WHEN g <> 0 THEN 1 ELSE 0 END)::bigint AS nb
  FROM t GROUP BY x
), c AS (
  SELECT (sum(na) OVER w)::bigint AS cuma,
         (sum(nb) OVER w)::bigint AS cumb
  FROM h
  WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
), tot AS (
  SELECT coalesce(sum(na), 0)::bigint AS n_a,
         coalesce(sum(nb), 0)::bigint AS n_b FROM h
), num AS (
  SELECT coalesce(max(abs(cuma * (SELECT n_b FROM tot)
                          - cumb * (SELECT n_a FROM tot))), 0)::bigint
           AS d_num
  FROM c
)
SELECT n_a, n_b, d_num,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN round(d_num::double / (n_a * n_b), 6) + 0.0 END AS ks_d,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN round(sqrt((n_a * n_b)::double / (n_a + n_b))
                       * (d_num::double / (n_a * n_b)), 6) + 0.0 END
         AS ks_stat
FROM tot, num
"""


# ---------------------------------------------------------------------------
# Q194 — Dirichlet query-likelihood top-k retrieval (operators/
# retrieval.dirichlet_ql_topk): the other classic lexical ranker next
# to BM25 (q63) — p(w|d) = (tf + mu*ctf/C)/(dl + mu), Bayesian
# smoothing toward the corpus LM by mu pseudo-tokens; decomposed as
# matching-term lifts plus a query-length multiple of the per-doc
# normalizer so evaluation is index-driven. Integer mu makes every ln
# argument an exact int64 on both engines. Queries: every 70th doc's
# first three first-occurrence tokens (the q63 derivation, offset so
# the two rankers' query sets differ); candidates are >= 1-match docs;
# fold in term order; ranking on the unrounded score, doc_id
# tie-break.
# DuckDB feature req: core SQL + list(ORDER BY)/list_sum.
# ---------------------------------------------------------------------------

_QL_MU = 2000
_QL_K = 10
_QL_QMOD = 70
_QL_QLEN = 3


def q194_dirichlet_ql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.retrieval import dirichlet_ql_topk
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", _tokens("text").alias("ts"))
    qsrc = (
        toks.filter(F.col("doc_id") % _QL_QMOD == 0)
        .select(
            F.col("doc_id").alias("qid"),
            F.posexplode("ts").alias("pos", "term"),
        )
        .groupBy("qid", "term")
        .agg(F.min("pos").alias("mp"))
    )
    qw = Window.partitionBy("qid").orderBy("mp", "term")
    qterms = (
        qsrc.withColumn("rn", F.row_number().over(qw))
        .filter(F.col("rn") <= _QL_QLEN)
        .select("qid", "term")
    )
    out = dirichlet_ql_topk(
        toks, qterms, F.col("ts"), mu=_QL_MU, k=_QL_K
    )
    return out.select(
        "qid",
        "rank",
        "doc_id",
        "n_match",
        (F.round("score", 6) + F.lit(0.0)).alias("score"),
    ).orderBy("qid", "rank")


_Q194_SQL = f"""
WITH tl AS (
  SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents
), dl AS (
  SELECT doc_id, len(ts)::bigint AS dl FROM tl
), ctot AS (
  SELECT sum(dl)::bigint AS c_tot FROM dl
), toks AS (
  SELECT doc_id, i::bigint AS pos, ts[i] AS term
  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i FROM tl)
), postings AS (
  SELECT doc_id, term, count(*)::bigint AS tf FROM toks GROUP BY doc_id, term
), ctf AS (
  SELECT term, sum(tf)::bigint AS ctf FROM postings GROUP BY term
), qt0 AS (
  SELECT doc_id AS qid, term, min(pos) AS mp
  FROM toks WHERE doc_id % {_QL_QMOD} = 0 GROUP BY doc_id, term
), qterms AS (
  SELECT qid, term FROM (
    SELECT qid, term,
           row_number() OVER (PARTITION BY qid ORDER BY mp, term) AS rn
    FROM qt0
  ) WHERE rn <= {_QL_QLEN}
), qv AS (
  SELECT q.qid, q.term, c.ctf FROM qterms q JOIN ctf c USING (term)
), nq AS (
  SELECT qid, count(*)::bigint AS nq FROM qv GROUP BY qid
), scored AS (
  SELECT q.qid, p.doc_id, q.term,
         ln((p.tf * s.c_tot + {_QL_MU} * q.ctf)::double)
           - ln(({_QL_MU} * q.ctf)::double) AS sc
  FROM qv q
  JOIN postings p USING (term), ctot s
), folded AS (
  SELECT qid, doc_id, count(*)::bigint AS n_match,
         list_sum(list(sc ORDER BY term)) AS lift
  FROM scored GROUP BY qid, doc_id
), full_sc AS (
  SELECT f.qid, f.doc_id, f.n_match,
         f.lift + n.nq::double
           * (ln({float(_QL_MU)!r}) - ln((l.dl + {_QL_MU})::double))
           AS score
  FROM folded f
  JOIN nq n USING (qid)
  JOIN dl l USING (doc_id)
), ranked AS (
  SELECT qid, doc_id, n_match, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)
           AS "rank"
  FROM full_sc
)
SELECT qid, "rank", doc_id, n_match, round(score, 6) + 0.0 AS score
FROM ranked WHERE "rank" <= {_QL_K} ORDER BY qid, "rank"
"""


# ---------------------------------------------------------------------------
# Q195 — 2-D Pareto frontier selection (operators/sampling.
# pareto_frontier2d): the documents no other document beats on BOTH
# token count and distinct-token count — the multi-criteria dual of
# the scalar keep/drop thresholds, and the threshold-free skyline the
# curation sweeps read. The Spark side avoids the textbook global sort
# (a SinglePartition window): frontier iff y = ymax(x) AND y > strict-
# suffix-max(x), both computed on the x-VALUE-DOMAIN histogram (q45
# discipline) and broadcast back — corpus rows are decided map-side.
# The oracle is the OTHER algorithm: a quadratic NOT EXISTS dominance
# anti-join (the q47 two-algorithms-agree pattern).
# DuckDB feature req: core only (NOT EXISTS).
# ---------------------------------------------------------------------------


def q195_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.sampling import pareto_frontier2d
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    toks = _tokens("text")
    sig = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )
    return pareto_frontier2d(
        sig, id_col="doc_id", x_col="n_tokens", y_col="n_distinct"
    ).orderBy("doc_id")


_Q195_SQL = f"""
WITH sig AS (
  SELECT doc_id, len(ts)::bigint AS n_tokens,
         len(list_distinct(ts))::bigint AS n_distinct
  FROM (SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents)
)
SELECT doc_id, n_tokens, n_distinct
FROM sig a
WHERE NOT EXISTS (
  SELECT 1 FROM sig b
  WHERE b.n_tokens >= a.n_tokens AND b.n_distinct >= a.n_distinct
    AND (b.n_tokens > a.n_tokens OR b.n_distinct > a.n_distinct)
)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q196 — exact butterfly counting (operators/graph.butterfly_count):
# bipartite 4-cycles over the customer→part co-purchase graph — the
# bipartite triangle, the smallest unit of co-engagement cohesion the
# KG's entity-mention bipartite shares. Wedges = Σ_part C(deg, 2);
# butterflies = Σ_{cust pairs} C(codeg, 2); the pair join's fan-out IS
# the wedge count, with the literature-standard degree cap (max_df)
# available and its drop count REPORTED (no silent caps). All counts
# exact int64; bfly_per_wedge is the one fixed-shape division.
# DuckDB feature req: core only.
# ---------------------------------------------------------------------------


def q196_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import butterfly_count

    orders = spark.read.parquet(_t(sf_dir, "orders"))
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")
        )
    )
    return butterfly_count(edges, src="cust", dst="part")


_Q196_SQL = """
WITH e AS (
  SELECT DISTINCT o.o_custkey AS s, l.l_partkey AS d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), ne AS (
  SELECT count(*)::bigint AS n_edges, 0::bigint AS n_dropped_dst FROM e
), degd AS (
  SELECT d, count(*)::bigint AS dd FROM e GROUP BY d
), w AS (
  SELECT coalesce(sum(dd * (dd - 1) // 2), 0)::bigint AS wedges FROM degd
), pairs AS (
  SELECT a.s AS s1, b.s AS s2, count(*)::bigint AS codeg
  FROM e a JOIN e b ON a.d = b.d AND a.s < b.s
  GROUP BY a.s, b.s
), bf AS (
  SELECT coalesce(sum(codeg * (codeg - 1) // 2), 0)::bigint AS butterflies
  FROM pairs
)
SELECT n_edges, n_dropped_dst, wedges, butterflies,
       CASE WHEN wedges > 0
            THEN round(butterflies / wedges::double, 6) + 0.0 END
         AS bfly_per_wedge
FROM ne, w, bf
"""


# ---------------------------------------------------------------------------
# Q197 — per-user interval-union coverage (operators/temporal.
# interval_coverage): the classic merge-overlapping-intervals sweep —
# how much wall-clock a user's activity intervals actually cover,
# counting overlaps ONCE — which sessionize (q16) cannot answer:
# gap-sessions count bursts, coverage measures the union length.
# Intervals are derived deterministically from the point events:
# start = unix_micros(ts), duration = floor(value*100) deci-seconds —
# identical IEEE double→floor→int64 arithmetic on both engines, so
# typical minutes-apart events overlap heavily within a user. The sweep
# is ONE window partitioned BY USER (never SinglePartition): reach =
# running max of PRIOR ends; each interval contributes
# max(0, e - max(reach, s)) and opens a block iff s > reach. All
# arithmetic int64 microseconds — no float time math.
# DuckDB feature req: core window functions only.
# ---------------------------------------------------------------------------


def q197_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import interval_coverage

    ev = spark.read.parquet(_t(sf_dir, "events"))
    iv = ev.where(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("start"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.floor(F.col("value") * F.lit(100.0)).cast("long")
            * F.lit(100000)
        ).alias("end"),
    )
    return interval_coverage(
        iv, key_col="user_id", start_col="start", end_col="end"
    ).orderBy("user_id")


_Q197_SQL = """
WITH iv AS (
  SELECT user_id AS k,
         epoch_us(ts) AS s,
         epoch_us(ts) + floor(value * 100)::bigint * 100000 AS e
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
), ok AS (
  SELECT k, s, e FROM iv WHERE e > s
), swept AS (
  SELECT k, s, e,
         coalesce(
           max(e) OVER (PARTITION BY k ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           -4611686018427387904) AS reach
  FROM ok
)
SELECT k AS user_id,
       count(*)::bigint AS n_intervals,
       sum(greatest(e - greatest(reach, s), 0))::bigint AS covered,
       sum(CASE WHEN s > reach THEN 1 ELSE 0 END)::bigint AS n_blocks
FROM swept
GROUP BY k
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Q198 — Katz centrality (operators/graph.katz_fixedpoint) over the
# two-layer typed trade graph customer→supplier (traded-with) ∪
# supplier→nation (located-in): the path-counting centrality PageRank
# is not — no out-degree normalization, so nations accumulate raw
# attenuated 1- and 2-hop in-path counts. Attenuation alpha_pct /
# (100 * max-in-degree) makes the truncated series both convergent
# (alpha < 1/lambda_max since lambda_max <= dmax) and int64-safe at ANY
# hub degree; all-integer rounds replay as unrolled CTEs (q51's trick).
# DuckDB feature req: core only (integer // division).
# ---------------------------------------------------------------------------

_KATZ_ITERS = 4
_KATZ_ALPHA_PCT = 20
_KATZ_SCALE = 1_000_000


def q198_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import katz_fixedpoint

    orders = spark.read.parquet(_t(sf_dir, "orders"))
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    supplier = spark.read.parquet(_t(sf_dir, "supplier"))
    trade = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )
    loc = supplier.select(
        F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("n"), F.col("s_nationkey").cast("string")).alias("dst"),
    )
    return katz_fixedpoint(
        trade.union(loc),
        iterations=_KATZ_ITERS,
        alpha_pct=_KATZ_ALPHA_PCT,
        scale=_KATZ_SCALE,
    ).select(
        "node", "katz_fp", _rz(F.col("katz"), 6).alias("katz")
    ).orderBy("node")


def _q198_sql() -> str:
    def rnd(prev, c, cur):
        return f"""{c} AS (
  SELECT e.d AS node,
         sum((r.katz_fp * {_KATZ_ALPHA_PCT}) // (100 * dmax.m)) AS in_sum
  FROM e JOIN {prev} r ON e.s = r.node, dmax
  GROUP BY e.d
), {cur} AS (
  SELECT n.node,
         ({_KATZ_SCALE} + coalesce(c.in_sum, 0))::bigint AS katz_fp
  FROM nodes n LEFT JOIN {c} c ON n.node = c.node
)"""

    rounds = ",\n".join(
        rnd(f"x{i}", f"c{i + 1}", f"x{i + 1}") for i in range(_KATZ_ITERS)
    )
    return f"""
WITH e AS (
  SELECT DISTINCT 'c' || o_custkey::varchar AS s,
                  's' || l_suppkey::varchar AS d
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  UNION ALL
  SELECT DISTINCT 's' || s_suppkey::varchar, 'n' || s_nationkey::varchar
  FROM supplier
), nodes AS (
  SELECT DISTINCT node FROM (
    SELECT s AS node FROM e UNION ALL SELECT d AS node FROM e
  )
), dmax AS (
  SELECT max(c)::bigint AS m FROM (
    SELECT d, count(*)::bigint AS c FROM e GROUP BY d
  )
), x0 AS (
  SELECT node, {_KATZ_SCALE}::bigint AS katz_fp FROM nodes
),
{rounds}
SELECT node, katz_fp,
       (round(katz_fp::double / {_KATZ_SCALE}.0, 6) + 0.0) AS katz
FROM x{_KATZ_ITERS}
ORDER BY node
"""


# ---------------------------------------------------------------------------
# Q199 — Allen interval-relation census (operators/temporal.
# allen_relation_counts): per-user counts of WHICH of Allen's 7
# canonical relations (precedes/meets/overlaps/starts/contains/
# finished_by/equals) hold between pairs of the user's activity
# intervals — the temporal texture interval_coverage (q197) collapses.
# Same deterministic interval derivation as q197 (unix micros +
# floor(value*100) deci-seconds). The pairwise join is equi on user
# only; the quadratic per-user fan-out is bounded by max_per_key=50
# (first-by-time via one row_number window) with the per-user drop
# count REPORTED in n_dropped — at sf0.001/sf0.01 the busiest users
# have 86-88 events, so the cap path is exercised by the gate itself.
# DuckDB feature req: core window + join only.
# ---------------------------------------------------------------------------

_ALLEN_CAP = 50


def q199_allen_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import allen_relation_counts

    ev = spark.read.parquet(_t(sf_dir, "events"))
    iv = ev.where(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("start"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.floor(F.col("value") * F.lit(100.0)).cast("long")
            * F.lit(100000)
        ).alias("end"),
    )
    return allen_relation_counts(
        iv,
        key_col="user_id",
        start_col="start",
        end_col="end",
        id_col="event_id",
        max_per_key=_ALLEN_CAP,
    ).orderBy("user_id", "relation")


_Q199_SQL = f"""
WITH iv AS (
  SELECT user_id AS k, event_id AS i,
         epoch_us(ts) AS s,
         epoch_us(ts) + floor(value * 100)::bigint * 100000 AS e
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
), ok AS (
  SELECT k, i, s, e FROM iv WHERE e > s
), ranked AS (
  SELECT k, i, s, e,
         row_number() OVER (PARTITION BY k ORDER BY s, e, i) AS rn
  FROM ok
), kept AS (
  SELECT k, i, s, e FROM ranked WHERE rn <= {_ALLEN_CAP}
), drops AS (
  SELECT k, count(*)::bigint AS n_dropped
  FROM ranked WHERE rn > {_ALLEN_CAP} GROUP BY k
), pairs AS (
  SELECT a.k,
         CASE WHEN a.e < b.s THEN 'precedes'
              WHEN a.e = b.s THEN 'meets'
              WHEN a.s = b.s AND a.e = b.e THEN 'equals'
              WHEN a.s = b.s AND a.e < b.e THEN 'starts'
              WHEN a.e < b.e THEN 'overlaps'
              WHEN a.e = b.e THEN 'finished_by'
              ELSE 'contains' END AS relation
  FROM kept a JOIN kept b ON a.k = b.k AND (
       a.s < b.s
       OR (a.s = b.s AND a.e < b.e)
       OR (a.s = b.s AND a.e = b.e AND a.i < b.i))
)
SELECT p.k AS user_id, p.relation, count(*)::bigint AS n_pairs,
       coalesce(min(d.n_dropped), 0)::bigint AS n_dropped
FROM pairs p LEFT JOIN drops d ON p.k = d.k
GROUP BY p.k, p.relation
ORDER BY user_id, relation
"""


# ---------------------------------------------------------------------------
# Q200 — half-life-decayed engagement (operators/temporal.
# decayed_engagement): freshness-weighted per-user/type activity —
# each event contributes floor(value_cents / 2^age), age = whole
# 7-day half-lives before the corpus max-ts anchor (one scalar
# collect). Exact end-to-end: int64 floor-division for age, and the
# power-of-two division is exact in doubles below 2^53, so floor
# equals integer shifting on both engines. Shape: per-row map + ONE
# combiner groupBy — the cheapest distributed form there is.
# DuckDB feature req: core only (pow + integer //).
# ---------------------------------------------------------------------------


def q200_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import decayed_engagement

    ev = spark.read.parquet(_t(sf_dir, "events"))
    return decayed_engagement(ev).orderBy("user_id", "event_type")


_Q200_SQL = """
WITH mx AS (
  SELECT max(epoch_us(ts)) AS m FROM events
), e AS (
  SELECT user_id, event_type,
         floor(value * 100)::bigint AS cents,
         least(greatest((mx.m - epoch_us(ts)) // 604800000000, 0),
               40)::bigint AS age
  FROM events, mx
  WHERE ts IS NOT NULL AND value IS NOT NULL
)
SELECT user_id, event_type,
       count(*)::bigint AS n_events,
       sum(cents)::bigint AS raw_cents,
       sum(floor(cents / pow(2.0, age))::bigint)::bigint AS decayed_cents
FROM e
GROUP BY user_id, event_type
ORDER BY user_id, event_type
"""


# ---------------------------------------------------------------------------
# Q201 — Kaplan-Meier churn curve (operators/temporal.kaplan_meier):
# product-limit survival over user lifetimes (last − first event,
# whole hours) with real right-censoring — users whose last event is
# within 6 hours of the study end (the testdata's median last-event
# gap is ~7h, so both fates are populated at every sf) leave the risk
# set without counting as deaths. The survival product is int64
# fixed-point stepped over
# death times on the DOMAIN-bounded lifetime histogram (q45's
# histogram-walk discipline — distinct whole-hour lifetimes, not
# users); the oracle replays the identical floor-product recurrence
# as a recursive CTE (the q18/q31 oracle tool).
# DuckDB feature req: WITH RECURSIVE (also used by q18/q31 oracles).
# ---------------------------------------------------------------------------


def q201_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import kaplan_meier

    ev = spark.read.parquet(_t(sf_dir, "events"))
    return kaplan_meier(ev, censor_margin_us=6 * 3600 * 1_000_000).select(
        "t_hours", "n_at_risk", "n_deaths", "surv_fp",
        _rz(F.col("surv"), 6).alias("surv"),
    ).orderBy("t_hours")


_Q201_SQL = """
WITH RECURSIVE lives AS (
  SELECT user_id, min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY user_id
), study AS (
  SELECT max(t1) AS e FROM lives
), obs AS (
  SELECT (t1 - t0) // 3600000000 AS t_hours,
         CASE WHEN study.e - t1 < 21600000000 THEN 0 ELSE 1 END AS is_death
  FROM lives, study
), hist AS (
  SELECT t_hours, sum(is_death)::bigint AS d, count(*)::bigint AS c
  FROM obs GROUP BY t_hours
), risk AS (
  SELECT t_hours, d, sum(c) OVER (ORDER BY t_hours DESC)::bigint AS n
  FROM hist
), deaths AS (
  SELECT t_hours, n, d,
         row_number() OVER (ORDER BY t_hours)::bigint AS idx
  FROM risk WHERE d > 0
), rec AS (
  SELECT 0::bigint AS idx, 1000000::bigint AS s_fp
  UNION ALL
  SELECT d.idx, ((r.s_fp * (d.n - d.d)) // d.n)::bigint
  FROM rec r JOIN deaths d ON d.idx = r.idx + 1
)
SELECT d.t_hours, d.n AS n_at_risk, d.d AS n_deaths, r.s_fp AS surv_fp,
       (round(r.s_fp::double / 1000000.0, 6) + 0.0) AS surv
FROM deaths d JOIN rec r ON d.idx = r.idx
ORDER BY t_hours
"""


# ---------------------------------------------------------------------------
# Q202 — Dunning log-likelihood (G²) collocations (operators/textstats.
# g2_collocations) over adjacent token bigrams — the
# frequency-weighted association PMI (q64) is not (PMI rewards rare
# exclusivity; G² weights evidence), and a different grain (surface
# adjacency vs document co-occurrence). All contingency cells exact
# int64; each term is o·ln(o·N / (rowsum·colsum)) — ln of the same
# rational on both engines (q64's bit-parity argument) — folded in one
# fixed scalar expression; the top-50 cut orders on the UNROUNDED g2.
# DuckDB feature req: core only.
# ---------------------------------------------------------------------------

_G2_MINC = 5
_G2_TOPK = 50


def q202_g2_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import g2_collocations

    docs = _docs(spark, sf_dir)
    out = g2_collocations(docs, min_count=_G2_MINC)
    return (
        out.orderBy(F.desc("g2"), "x", "y")
        .limit(_G2_TOPK)
        .select("x", "y", "c_xy", _rz(F.col("g2"), 6).alias("g2"))
    )


def _q202_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM (
    SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i
    FROM (SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents)
  )
), big AS (
  SELECT w1 AS x, w2 AS y, count(*)::bigint AS a FROM toks GROUP BY w1, w2
), rowm AS (
  SELECT x, sum(a)::bigint AS rs FROM big GROUP BY x
), colm AS (
  SELECT y, sum(a)::bigint AS cs FROM big GROUP BY y
), nn AS (
  SELECT sum(a)::bigint AS n FROM big
), scored AS (
  SELECT b.x, b.y, b.a AS c_xy,
    2.0 * (
      CASE WHEN b.a > 0 THEN b.a::double
           * ln((b.a::double * n) / (rs::double * cs::double))
           ELSE 0.0 END
    + CASE WHEN rs - b.a > 0 THEN (rs - b.a)::double
           * ln(((rs - b.a)::double * n) / (rs::double * (n - cs)::double))
           ELSE 0.0 END
    + CASE WHEN cs - b.a > 0 THEN (cs - b.a)::double
           * ln(((cs - b.a)::double * n) / ((n - rs)::double * cs::double))
           ELSE 0.0 END
    + CASE WHEN n - rs - cs + b.a > 0 THEN (n - rs - cs + b.a)::double
           * ln(((n - rs - cs + b.a)::double * n)
                / ((n - rs)::double * (n - cs)::double))
           ELSE 0.0 END
    ) AS g2_raw
  FROM big b JOIN rowm ON b.x = rowm.x JOIN colm ON b.y = colm.y, nn
  WHERE b.a >= {_G2_MINC}
)
SELECT x, y, c_xy, (round(g2_raw, 6) + 0.0) AS g2
FROM scored
ORDER BY g2_raw DESC, x, y
LIMIT {_G2_TOPK}
"""


# ---------------------------------------------------------------------------
# Q203 — exact per-label medoid (operators/similarity.label_medoids):
# the cluster EXEMPLAR — the member minimizing summed squared L2 to its
# label-mates — vs q13's centroid (an average no document equals) and
# q131's keep-best (external quality). All-integer: quantized vectors
# (floor(x·1e6)) + the _sqdist_l2 fold, argmin ties on lower id; the
# pairwise join is equi ON LABEL (quadratic per label, the honest
# exact-medoid cost — run per near-dup component at web scale).
# DuckDB feature req: list_transform/list_sum (q32/q36 precedent).
# ---------------------------------------------------------------------------


def q203_label_medoids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.similarity import label_medoids

    emb = _tbl(spark, sf_dir, "embeddings")
    return label_medoids(emb).orderBy("label")


_Q203_SQL = """
WITH base AS (
  SELECT label AS l, vec_id AS i,
         list_transform(embedding,
                        x -> floor(x::double * 1000000)::bigint) AS qv
  FROM embeddings
  WHERE vec_id IS NOT NULL AND label IS NOT NULL AND embedding IS NOT NULL
), sums AS (
  SELECT a.l, a.i,
         sum(list_sum(list_transform(generate_series(1, len(a.qv)),
             j -> (a.qv[j] - b.qv[j]) * (a.qv[j] - b.qv[j]))))::bigint
           AS total
  FROM base a JOIN base b ON a.l = b.l AND a.i <> b.i
  GROUP BY a.l, a.i
), scored AS (
  SELECT base.l, base.i, coalesce(s.total, 0)::bigint AS total
  FROM base LEFT JOIN sums s ON base.l = s.l AND base.i = s.i
), best AS (
  SELECT l, i, total,
         row_number() OVER (PARTITION BY l ORDER BY total, i) AS rn
  FROM scored
), members AS (
  SELECT l, count(*)::bigint AS n_members FROM base GROUP BY l
)
SELECT b.l AS label, b.i AS medoid_id, m.n_members,
       b.total AS total_sqdist
FROM best b JOIN members m ON b.l = m.l
WHERE rn = 1
ORDER BY label
"""


# ---------------------------------------------------------------------------
# Q204 — exact Kendall tau-b (operators/profile.kendall_tau) between
# doc length and distinct-token count — the third correlation question
# after Pearson (q180, linear) and Spearman (q189, monotone ranks):
# pairwise ORDER AGREEMENT with the tie-corrected b denominator, the
# right statistic for coarse integer signals where ties dominate. The
# pair census runs on the JOINT value-cell histogram (q189's domain
# discipline one dimension up) — never row pairs; ties come in closed
# form from the marginals. All counts int64; one fixed-shape
# sqrt·sqrt divide finish.
# DuckDB feature req: core only.
# ---------------------------------------------------------------------------


def q204_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import kendall_tau
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    toks = _tokens("text")
    feats = docs.where(F.col("text").isNotNull()).select(
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )
    out = kendall_tau(feats, x_col="n_tokens", y_col="n_distinct")
    return out.select(
        "n", "concordant", "discordant", "ties_x", "ties_y",
        _rz(F.col("tau_b"), 6).alias("tau_b"),
    )


_Q204_SQL = f"""
WITH rows_ AS (
  SELECT len(ts)::bigint AS x, len(list_distinct(ts))::bigint AS y
  FROM (SELECT {_SQL_WS_TOKS} AS ts FROM documents WHERE text IS NOT NULL)
), cells AS (
  SELECT x, y, count(*)::bigint AS h FROM rows_ GROUP BY x, y
), pairagg AS (
  SELECT coalesce(sum(CASE WHEN a.x < b.x AND a.y < b.y
                           THEN a.h * b.h ELSE 0 END), 0)::bigint
           AS concordant,
         coalesce(sum(CASE WHEN a.x < b.x AND a.y > b.y
                           THEN a.h * b.h ELSE 0 END), 0)::bigint
           AS discordant
  FROM cells a JOIN cells b
    ON (a.x < b.x OR (a.x = b.x AND a.y < b.y))
), tx AS (
  SELECT coalesce(sum(t * (t - 1) // 2), 0)::bigint AS ties_x,
         coalesce(sum(t), 0)::bigint AS n
  FROM (SELECT sum(h)::bigint AS t FROM cells GROUP BY x)
), ty AS (
  SELECT coalesce(sum(t * (t - 1) // 2), 0)::bigint AS ties_y
  FROM (SELECT sum(h)::bigint AS t FROM cells GROUP BY y)
)
SELECT n, concordant, discordant, ties_x, ties_y,
       CASE WHEN (n * (n - 1) // 2) > ties_x
             AND (n * (n - 1) // 2) > ties_y THEN
         round((concordant - discordant)::double
               / (sqrt(((n * (n - 1) // 2) - ties_x)::double)
                  * sqrt(((n * (n - 1) // 2) - ties_y)::double)), 6) + 0.0
       END AS tau_b
FROM pairagg, tx, ty
"""


# ---------------------------------------------------------------------------
# Q205 — chained pairwise BLEU-2 (operators/textstats.pairwise_bleu):
# each doc scored against its same-lang successor with clipped modified
# n-gram precision + brevity penalty — the PRECISION eval metric
# (ROUGE q158 is the recall one), doubling as a template-similarity
# probe. Geometric mean computed as sqrt(p1·p2) (IEEE-exact on both
# engines), exp only inside the brevity penalty under round-6 (q77
# precedent); all clip counts int64 via shared-gram inner joins.
# DuckDB feature req: core only.
# ---------------------------------------------------------------------------


def q205_pairwise_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import pairwise_bleu

    docs = _docs(spark, sf_dir)
    out = pairwise_bleu(docs)
    return out.select(
        "cand_id", "ref_id", "c_len", "r_len", "m1", "m2",
        _rz(F.col("bleu"), 6).alias("bleu"),
    ).orderBy("cand_id")


_Q205_SQL = f"""
WITH toks AS (
  SELECT lang AS g, doc_id AS i, {_SQL_WS_TOKS} AS ts
  FROM documents WHERE text IS NOT NULL
), pairs AS (
  SELECT i, r FROM (
    SELECT i, lead(i) OVER (PARTITION BY g ORDER BY i) AS r FROM toks
  ) WHERE r IS NOT NULL
), lens AS (
  SELECT i, len(ts)::bigint AS n FROM toks
), uni AS (
  SELECT i, gram, count(*)::bigint AS c FROM (
    SELECT i, unnest(ts) AS gram FROM toks
  ) GROUP BY i, gram
), big AS (
  SELECT i, gram, count(*)::bigint AS c FROM (
    SELECT i, ts[j] || ' ' || ts[j + 1] AS gram
    FROM (SELECT i, ts, unnest(generate_series(1, len(ts) - 1)) AS j
          FROM toks)
  ) GROUP BY i, gram
), mm1 AS (
  SELECT p.i AS pi, sum(least(ca.c, ra.c))::bigint AS m
  FROM pairs p
  JOIN uni ca ON p.i = ca.i
  JOIN uni ra ON p.r = ra.i AND ca.gram = ra.gram
  GROUP BY p.i
), mm2 AS (
  SELECT p.i AS pi, sum(least(ca.c, ra.c))::bigint AS m
  FROM pairs p
  JOIN big ca ON p.i = ca.i
  JOIN big ra ON p.r = ra.i AND ca.gram = ra.gram
  GROUP BY p.i
), base AS (
  SELECT p.i AS cand_id, p.r AS ref_id, lc.n AS c_len, lr.n AS r_len,
         coalesce(mm1.m, 0)::bigint AS m1, coalesce(mm2.m, 0)::bigint AS m2
  FROM pairs p
  JOIN lens lc ON p.i = lc.i
  JOIN lens lr ON p.r = lr.i
  LEFT JOIN mm1 ON p.i = mm1.pi
  LEFT JOIN mm2 ON p.i = mm2.pi
)
SELECT cand_id, ref_id, c_len, r_len, m1, m2,
       round(CASE WHEN m1 > 0 AND m2 > 0 AND c_len >= 2 THEN
         (CASE WHEN c_len >= r_len THEN 1.0
               ELSE exp(1.0 - r_len::double / c_len::double) END)
         * sqrt((m1::double / c_len::double)
                * (m2::double / (c_len::double - 1.0)))
       ELSE 0.0 END, 6) + 0.0 AS bleu
FROM base
ORDER BY cand_id
"""


# ---------------------------------------------------------------------------
# Q206 — two-sided CUSUM changepoint scan (operators/temporal.
# cusum_changepoints) over daily event volume: sustained small shifts
# ACCUMULATE into S+/S- where a pointwise z-threshold (rate-anomaly
# family) stays silent. Reference mean, allowance k and threshold h
# are integer-derived from the data; the whole statistic is int64 —
# no floats anywhere. Sequential, but over the DAY domain
# (study-window-bounded, corpus-size-independent — the q45/q201 walk):
# combiner groupBy to daily counts, driver fold, recursive-CTE oracle.
# DuckDB feature req: WITH RECURSIVE.
# ---------------------------------------------------------------------------


def q206_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import cusum_changepoints

    ev = spark.read.parquet(_t(sf_dir, "events"))
    return cusum_changepoints(ev)


_Q206_SQL = """
WITH RECURSIVE daily AS (
  SELECT ts::date AS day, count(*)::bigint AS x
  FROM events WHERE ts IS NOT NULL GROUP BY ts::date
), params AS (
  SELECT (sum(x)::bigint // count(*)::bigint) AS mean,
         greatest(1, (sum(x)::bigint // count(*)::bigint) // 20) AS k
  FROM daily
), seq AS (
  SELECT day, x, row_number() OVER (ORDER BY day)::bigint AS idx FROM daily
), rec AS (
  SELECT 0::bigint AS idx, 0::bigint AS sp, 0::bigint AS sn
  UNION ALL
  SELECT s.idx,
         greatest(0, r.sp + s.x - p.mean - p.k)::bigint,
         greatest(0, r.sn + p.mean - s.x - p.k)::bigint
  FROM rec r JOIN seq s ON s.idx = r.idx + 1, params p
)
SELECT s.day, s.x, r.sp AS s_pos, r.sn AS s_neg,
       (r.sp >= 8 * p.k OR r.sn >= 8 * p.k) AS alarm
FROM seq s JOIN rec r ON s.idx = r.idx, params p
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Q207 — exact DBSCAN (operators/similarity.dbscan_2d) over the first
# two embedding dims: density clustering with an explicit noise class —
# shapes k-means (q36) and threshold-CC near-dup (q31) cannot find.
# The Spark plan is a GRID-BUCKETED radius join (cell side = eps, 9
# probe cells, exact int64 dx²+dy² post-filter — q48's bin-bucketing in
# 2-D); clusters = CC over core-core edges (reusing canonicalize CC on
# zero-padded ids); border points take the MIN-labeled core neighbor
# (the deterministic refinement of textbook first-found assignment —
# divergence documented). The oracle is THE OTHER ALGORITHM: quadratic
# pairwise + recursive-CTE CC (the q47/q195 two-algorithms-agree
# pattern). DuckDB feature req: WITH RECURSIVE.
# ---------------------------------------------------------------------------

_DBSCAN_EPS_Q = 20_000
_DBSCAN_MINPTS = 4


def q207_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.similarity import dbscan_2d

    emb = _tbl(spark, sf_dir, "embeddings")
    return dbscan_2d(
        emb, eps_q=_DBSCAN_EPS_Q, min_pts=_DBSCAN_MINPTS
    ).orderBy("vec_id")


def _q207_sql() -> str:
    return f"""
WITH RECURSIVE p AS (
  SELECT vec_id AS i,
         floor(embedding[1]::double * 1000000)::bigint AS qx,
         floor(embedding[2]::double * 1000000)::bigint AS qy
  FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
), near AS (
  SELECT a.i AS ai, b.i AS bi FROM p a JOIN p b
  ON (a.qx - b.qx) * (a.qx - b.qx) + (a.qy - b.qy) * (a.qy - b.qy)
     <= {_DBSCAN_EPS_Q * _DBSCAN_EPS_Q}
), core AS (
  SELECT ai AS i FROM near GROUP BY ai HAVING count(*) >= {_DBSCAN_MINPTS}
), ce AS (
  SELECT n.ai, n.bi FROM near n
  JOIN core ca ON n.ai = ca.i JOIN core cb ON n.bi = cb.i
), reach AS (
  SELECT i, i AS lab FROM core
  UNION
  SELECT e.bi AS i, r.lab FROM reach r JOIN ce e ON e.ai = r.i
), comp AS (
  SELECT i, min(lab)::bigint AS cluster FROM reach GROUP BY i
), bord AS (
  SELECT n.ai AS i, min(c.cluster)::bigint AS cluster
  FROM near n JOIN comp c ON n.bi = c.i
  WHERE n.ai NOT IN (SELECT i FROM core)
  GROUP BY n.ai
)
SELECT i AS vec_id, 'core' AS role, cluster FROM comp
UNION ALL
SELECT i, 'border', cluster FROM bord
UNION ALL
SELECT p.i, 'noise', NULL::bigint FROM p
WHERE p.i NOT IN (SELECT i FROM comp) AND p.i NOT IN (SELECT i FROM bord)
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# Q208 — multinomial Naive Bayes language confusion (operators/
# textstats.naive_bayes_lang_confusion): the GENERATIVE classifier next
# to the discriminative LR (q27/q77), trained and scored on the corpus
# itself; its confusion vs the stored label upgrades q15's heuristic
# langid disagreement to a learned-model signal. Laplace-smoothed
# ln-likelihoods are each the ln of one rational from int64 counts,
# folded per (doc, lang) in POSITION order (the q44 discipline);
# argmax on the bit-identical unrounded score, lang tie-break.
# DuckDB feature req: list(... ORDER BY) + list_sum (q44 precedent).
# ---------------------------------------------------------------------------


def q208_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import naive_bayes_lang_confusion

    docs = _docs(spark, sf_dir)
    return naive_bayes_lang_confusion(docs).orderBy("true_lang", "pred_lang")


def _q208_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id AS d, lang AS truth, (i - 1)::int AS pos, ts[i] AS tok
  FROM (
    SELECT doc_id, lang, ts, unnest(generate_series(1, len(ts))) AS i
    FROM (SELECT doc_id, lang, {_SQL_WS_TOKS} AS ts FROM documents
          WHERE text IS NOT NULL AND lang IS NOT NULL)
  )
), ctl AS (
  SELECT truth AS l, tok, count(*)::bigint AS c FROM toks GROUP BY truth, tok
), totl AS (
  SELECT l, sum(c)::bigint AS tot FROM ctl GROUP BY l
), priors AS (
  SELECT truth AS l, count(*)::bigint AS nd
  FROM (SELECT DISTINCT d, truth FROM toks) GROUP BY truth
), vv AS (
  SELECT count(DISTINCT tok)::bigint AS v FROM ctl
), nn AS (
  SELECT count(DISTINCT d)::bigint AS n FROM toks
), langdim AS (
  SELECT p.l, p.nd, t.tot FROM priors p JOIN totl t ON p.l = t.l
), rows_ AS (
  SELECT t.d, t.truth, ld.l, t.pos, ld.nd,
         ln((coalesce(c.c, 0) + 1)::double / (ld.tot + vv.v)::double) AS lnp
  FROM toks t
  CROSS JOIN langdim ld
  LEFT JOIN ctl c ON c.l = ld.l AND c.tok = t.tok
  CROSS JOIN vv
), scored AS (
  SELECT r.d, r.truth, r.l,
         ln(min(r.nd)::double / min(nn.n)::double)
         + list_sum(list(r.lnp ORDER BY r.pos)) AS score
  FROM rows_ r, nn
  GROUP BY r.d, r.truth, r.l
), pred AS (
  SELECT d, truth, l,
         row_number() OVER (PARTITION BY d ORDER BY score DESC, l) AS rn
  FROM scored
)
SELECT truth AS true_lang, l AS pred_lang, count(*)::bigint AS n_docs
FROM pred WHERE rn = 1
GROUP BY truth, l
ORDER BY true_lang, pred_lang
"""


# ---------------------------------------------------------------------------
# Q209 — Holt linear-trend forecast backtest (operators/temporal.
# holt_forecast): the FORECASTING family — recursive level+trend
# smoothing with one-step-ahead predictions and per-day backtest
# errors, where the OLS trend (q177) fits one global line after the
# fact. Exact fixed-point at alpha=beta=1/2: every update is a floored
# integer half in scale-1000 units — no float smoothing anywhere.
# Python // floors and DuckDB // truncates, so the oracle spells
# floor(x/2.0) explicitly (the q207 lesson). Day-domain driver fold +
# recursive-CTE oracle (q206's shape, two state variables).
# DuckDB feature req: WITH RECURSIVE.
# ---------------------------------------------------------------------------


def q209_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import holt_forecast

    ev = spark.read.parquet(_t(sf_dir, "events"))
    return holt_forecast(ev)


_Q209_SQL = """
WITH RECURSIVE daily AS (
  SELECT ts::date AS day, count(*)::bigint AS x
  FROM events WHERE ts IS NOT NULL GROUP BY ts::date
), seq AS (
  SELECT day, x, row_number() OVER (ORDER BY day)::bigint AS idx FROM daily
), rec AS (
  SELECT 1::bigint AS idx,
         s1.x * 1000 AS lev,
         (s2.x - s1.x) * 1000 AS tr,
         0::bigint AS fc
  FROM seq s1, seq s2 WHERE s1.idx = 1 AND s2.idx = 2
  UNION ALL
  SELECT s.idx,
         floor((s.x * 1000 + r.lev + r.tr) / 2.0)::bigint,
         floor((r.tr + floor((s.x * 1000 + r.lev + r.tr) / 2.0)::bigint
                - r.lev) / 2.0)::bigint,
         (r.lev + r.tr)::bigint
  FROM rec r JOIN seq s ON s.idx = r.idx + 1
)
SELECT s.day, s.x, r.fc AS forecast_fp,
       abs(s.x * 1000 - r.fc)::bigint AS abs_err_fp
FROM rec r JOIN seq s ON s.idx = r.idx
WHERE r.idx >= 2
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Q210 — Theil-Sen robust trend (operators/temporal.theil_sen_trend):
# median pairwise slope + median-residual intercept over daily volume —
# the ~29%-breakdown robust complement to the OLS trend (q177). All
# medians sort the DOMAIN-bounded pair table (C(30,2)=435 rows — the
# q45 exemption), slopes are identical IEEE divisions of integer
# (dy, dx) on both engines, sorted (slope, i, j) so the median element
# choice is bit-portable; even counts average the two middles.
# DuckDB feature req: core window only.
# ---------------------------------------------------------------------------


def q210_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import theil_sen_trend

    ev = spark.read.parquet(_t(sf_dir, "events"))
    out = theil_sen_trend(ev)
    return out.select(
        "n_days", "n_pairs",
        _rz(F.col("slope"), 6).alias("slope"),
        _rz(F.col("intercept"), 6).alias("intercept"),
    )


_Q210_SQL = """
WITH daily AS (
  SELECT ts::date AS day, count(*)::bigint AS y
  FROM events WHERE ts IS NOT NULL GROUP BY ts::date
), pts AS (
  SELECT row_number() OVER (ORDER BY day)::bigint AS i, y FROM daily
), pairs AS (
  SELECT a.i AS i, b.i AS j,
         (b.y - a.y)::double / (b.i - a.i)::double AS slope
  FROM pts a JOIN pts b ON a.i < b.i
), np AS (
  SELECT count(*)::bigint AS n_pairs FROM pairs
), ms AS (
  SELECT avg(slope) AS slope FROM (
    SELECT slope, row_number() OVER (ORDER BY slope, i, j)::bigint AS rn
    FROM pairs
  ), np
  WHERE rn = (np.n_pairs + 1) // 2 OR rn = (np.n_pairs + 2) // 2
), nd AS (
  SELECT count(*)::bigint AS n_days FROM pts
), res AS (
  SELECT p.i, p.y::double - ms.slope * p.i::double AS b
  FROM pts p, ms
), mi AS (
  SELECT avg(b) AS intercept FROM (
    SELECT b, row_number() OVER (ORDER BY b, i)::bigint AS rn FROM res
  ), nd
  WHERE rn = (nd.n_days + 1) // 2 OR rn = (nd.n_days + 2) // 2
)
SELECT nd.n_days, np.n_pairs,
       (round(ms.slope, 6) + 0.0) AS slope,
       (round(mi.intercept, 6) + 0.0) AS intercept
FROM nd, np, ms, mi
"""


# ---------------------------------------------------------------------------
# Q211 — abbreviation mining (operators/textstats.mine_abbreviations):
# the synonym-dictionary grower for entity linking — validated
# (long form, SF) pairs are new alias edges for the broadcast ontology
# dictionary. Exact-initialism validation (simplified Schwartz-Hearst;
# divergence documented, rejects REPORTED with valid=false). The
# corpus text has no parentheticals, so the query synthesizes them
# deterministically (the q88 synthetic-anchor precedent): docs with
# doc_id%3==0 get ' <first-3-words> (<INITIALS>)' appended — and
# doc_id%6==0 gets a corrupted SF so the reject path is exercised by
# the gate itself. Map-only; DuckDB feature req: regexp_extract_all +
# string_split_regex + list ops (q88/q37 precedent).
# ---------------------------------------------------------------------------


def q211_mine_abbreviations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import mine_abbreviations

    docs = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    lf = F.array_join(F.slice(words, 1, 3), " ")
    initials = F.upper(
        F.array_join(
            F.transform(F.slice(words, 1, 3), lambda w: F.substring(w, 1, 1)),
            "",
        )
    )
    sf = F.when(F.col("doc_id") % 6 == 0, F.concat(initials, F.lit("X"))).otherwise(
        initials
    )
    annotated = docs.where(
        F.col("text").isNotNull() & (F.size(words) >= 3)
    ).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"), F.lit(" "), lf, F.lit(" ("), sf, F.lit(")")
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return mine_abbreviations(annotated).orderBy("doc_id", "abbr")


def _q211_sql() -> str:
    pat = r"\(([A-Za-z][A-Za-z0-9]{1,9})\)"
    return f"""
WITH ann AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN
           text || ' ' || array_to_string(ws[1:3], ' ') || ' (' ||
           upper(array_to_string(list_transform(ws[1:3], w -> w[1]), ''))
           || (CASE WHEN doc_id % 6 = 0 THEN 'X' ELSE '' END) || ')'
         ELSE text END AS text
  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
        WHERE text IS NOT NULL)
  WHERE len(ws) >= 3
), m AS (
  SELECT doc_id,
         string_split_regex(text, '{pat}') AS segs,
         regexp_extract_all(text, '{pat}', 1) AS abbrs
  FROM ann
), x AS (
  SELECT doc_id, segs[k] AS seg, abbrs[k] AS ab
  FROM (SELECT doc_id, segs, abbrs,
               unnest(generate_series(1, len(abbrs))) AS k FROM m)
), t AS (
  SELECT doc_id, ab,
         list_filter(string_split_regex(trim(seg), ' +'),
                     y -> y <> '') AS toks,
         length(ab)::int AS l
  FROM x
), w AS (
  SELECT doc_id, ab,
         toks[greatest(len(toks) - l + 1, 1):len(toks)] AS win, l
  FROM t
)
SELECT doc_id, ab AS abbr,
       array_to_string(win, ' ') AS long_form,
       (len(win) = l AND
        lower(array_to_string(list_transform(win, y -> y[1]), ''))
          = lower(ab)) AS valid
FROM w
ORDER BY doc_id, abbr
"""


# ---------------------------------------------------------------------------
# Q212 — optimal single changepoint by SSE (operators/temporal.
# best_sse_split): WHERE the level changed, retrospectively — the
# offline complement to q206's online CUSUM. Int64 prefix sums over
# the day domain; each candidate split's SSE is one fixed scalar
# expression (identical bits both engines); argmin by (sse, idx).
# DuckDB feature req: core window only.
# ---------------------------------------------------------------------------


def q212_sse_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import best_sse_split

    ev = spark.read.parquet(_t(sf_dir, "events"))
    out = best_sse_split(ev)
    return out.select(
        "n_days", "split_idx", "split_day",
        _rz(F.col("sse_one"), 6).alias("sse_one"),
        _rz(F.col("sse_two"), 6).alias("sse_two"),
    )


_Q212_SQL = """
WITH daily AS (
  SELECT ts::date AS day, count(*)::bigint AS y
  FROM events WHERE ts IS NOT NULL GROUP BY ts::date
), pts AS (
  SELECT day,
         row_number() OVER (ORDER BY day)::bigint AS i,
         sum(y) OVER (ORDER BY day)::bigint AS cy,
         sum(y * y) OVER (ORDER BY day)::bigint AS cy2
  FROM daily
), tot AS (
  SELECT max(i)::bigint AS n, max(cy)::bigint AS ty,
         max(cy2)::bigint AS ty2
  FROM pts
), cand AS (
  SELECT p.day, p.i, t.n, t.ty, t.ty2,
         (p.cy2::double - p.cy::double * p.cy::double / p.i::double)
         + ((t.ty2 - p.cy2)::double
            - (t.ty - p.cy)::double * (t.ty - p.cy)::double
              / (t.n - p.i)::double) AS sse_two
  FROM pts p, tot t WHERE p.i < t.n
), best AS (
  SELECT day, i, n, ty, ty2, sse_two,
         row_number() OVER (ORDER BY sse_two, i) AS rn
  FROM cand
)
SELECT n AS n_days, i AS split_idx, day AS split_day,
       (round(ty2::double - ty::double * ty::double / n::double, 6) + 0.0)
         AS sse_one,
       (round(sse_two, 6) + 0.0) AS sse_two
FROM best WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Q213 — schema-constraint discovery (operators/profile.
# constraint_profile): which functional dependencies and inclusion
# dependencies (FK candidates) actually HOLD in the data — the
# profiler behind aggregation pushdown, dimension collapsing, and
# referential bucketing decisions. The audit list mixes true and false
# constraints so BOTH verdicts are exercised; violations are REPORTED
# as exact counts (surplus (X,Y) pairs / missing FK values), never a
# bare boolean. Each check is one combiner-friendly distinct pass.
# DuckDB feature req: core only.
# ---------------------------------------------------------------------------

_Q213_FDS = [
    ("nation", "n_nationkey", "n_name"),
    ("nation", "n_regionkey", "n_name"),
    ("orders", "o_orderkey", "o_custkey"),
    ("lineitem", "l_orderkey", "l_suppkey"),
]
_Q213_INDS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("supplier", "s_suppkey", "orders", "o_custkey"),
]


def q213_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import constraint_profile

    tables = {
        t: spark.read.parquet(_t(sf_dir, t))
        for t in ("nation", "region", "orders", "lineitem", "customer",
                  "supplier")
    }
    return constraint_profile(
        tables, fds=_Q213_FDS, inds=_Q213_INDS
    ).orderBy("kind", "cname")


def _q213_sql() -> str:
    parts = []
    for t, lhs, rhs in _Q213_FDS:
        parts.append(f"""
SELECT 'fd' AS kind, '{t}.{lhs} -> {t}.{rhs}' AS cname,
       (SELECT count(DISTINCT {lhs}) FROM {t})::bigint AS n_lhs,
       (SELECT count(*) FROM (SELECT DISTINCT {lhs}, {rhs} FROM {t}))::bigint
         AS n_check,
       (SELECT count(DISTINCT {lhs}) FROM {t})
         = (SELECT count(*) FROM (SELECT DISTINCT {lhs}, {rhs} FROM {t}))
         AS holds""")
    for t1, c1, t2, c2 in _Q213_INDS:
        parts.append(f"""
SELECT 'ind', '{t1}.{c1} subset-of {t2}.{c2}',
       (SELECT count(DISTINCT {c1}) FROM {t1})::bigint,
       (SELECT count(*) FROM
          (SELECT DISTINCT {c1} AS v FROM {t1}
           EXCEPT SELECT DISTINCT {c2} FROM {t2}))::bigint,
       (SELECT count(*) FROM
          (SELECT DISTINCT {c1} AS v FROM {t1}
           EXCEPT SELECT DISTINCT {c2} FROM {t2})) = 0""")
    return (
        "SELECT * FROM (" + "\nUNION ALL".join(parts)
        + ") ORDER BY kind, cname"
    )


# ---------------------------------------------------------------------------
# Q214 — Markov removal-effect attribution (operators/temporal.
# markov_attribution): the counterfactual the funnel views (q164/q168)
# cannot ask — how much does START→conversion probability drop when a
# channel is deleted from the journey graph? Absorbing-chain values in
# int64 fixed-point, each round one integer dot product + one exact
# floor division per state (Σ_j c_sj = c_s), truncated at 12 rounds —
# truncation IS the semantics, so the oracle replays identical
# integers as unrolled per-scenario round CTEs (q51's trick with a
# scenario dimension). Journey windows partition BY USER; the chain
# walks the ≤(channels+2)² DOMAIN-bounded transition table.
# DuckDB feature req: core only (unrolled CTEs).
# ---------------------------------------------------------------------------

_MK_ITERS = 12
_MK_SCALE = 1_000_000
_MK_CHANNELS = ("click", "error", "signup", "view")


def q214_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import markov_attribution

    ev = spark.read.parquet(_t(sf_dir, "events"))
    out = markov_attribution(
        ev, channels=_MK_CHANNELS, iterations=_MK_ITERS, scale=_MK_SCALE
    )
    return out.select(
        "channel", "conv_base_fp", "conv_removed_fp",
        _rz(F.col("removal_effect"), 6).alias("removal_effect"),
        _rz(F.col("share"), 6).alias("share"),
    )


def _q214_sql() -> str:
    chans = ", ".join(f"'{c}'" for c in _MK_CHANNELS)

    def rnd(prev, cur):
        return f"""{cur} AS MATERIALIZED (
  SELECT p.rm, p.st,
         (CASE WHEN p.st = p.rm OR min(ot.tot) IS NULL THEN 0
               ELSE coalesce(sum(tc.c * CASE
                      WHEN tc.d = 'purchase' THEN {_MK_SCALE}
                      WHEN tc.d = 'NULL' OR tc.d = p.rm THEN 0
                      ELSE coalesce(pv.v, 0) END), 0) // min(ot.tot)
          END)::bigint AS v
  FROM {prev} p
  LEFT JOIN ot ON ot.s = p.st
  LEFT JOIN tc ON tc.s = p.st
  LEFT JOIN {prev} pv ON pv.rm = p.rm AND pv.st = tc.d
  GROUP BY p.rm, p.st
)"""

    rounds = ",\n".join(rnd(f"v{i}", f"v{i + 1}") for i in range(_MK_ITERS))
    return f"""
WITH ev AS (
  SELECT user_id AS u, ts, event_id AS eid, event_type AS t FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
), ranked AS (
  SELECT u, t, row_number() OVER (PARTITION BY u ORDER BY ts, eid) AS rn
  FROM ev
), firstc AS (
  SELECT u, min(rn) AS crn FROM ranked WHERE t = 'purchase' GROUP BY u
), kept AS MATERIALIZED (
  SELECT r.u, r.t, r.rn FROM ranked r LEFT JOIN firstc f ON r.u = f.u
  WHERE f.crn IS NULL OR r.rn <= f.crn
), hops AS MATERIALIZED (
  SELECT u, t, rn, lead(t) OVER (PARTITION BY u ORDER BY rn) AS nxt
  FROM kept
), edges AS MATERIALIZED (
  SELECT 'START' AS s, t AS d FROM hops WHERE rn = 1
  UNION ALL SELECT t, nxt FROM hops WHERE nxt IS NOT NULL
  UNION ALL SELECT t, 'NULL' FROM hops WHERE nxt IS NULL AND t <> 'purchase'
), tc AS MATERIALIZED (
  SELECT s, d, count(*)::bigint AS c FROM edges GROUP BY s, d
), ot AS MATERIALIZED (
  SELECT s, sum(c)::bigint AS tot FROM tc GROUP BY s
), scen AS (
  SELECT unnest(['base', {chans}]) AS rm
), states AS (
  SELECT unnest(['START', {chans}]) AS st
), v0 AS MATERIALIZED (
  SELECT rm, st, 0::bigint AS v FROM scen, states
),
{rounds},
base AS (
  SELECT v FROM v{_MK_ITERS} WHERE rm = 'base' AND st = 'START'
), rem AS (
  SELECT rm AS channel, v FROM v{_MK_ITERS}
  WHERE rm <> 'base' AND st = 'START'
), toteff AS (
  SELECT sum(b.v - r.v)::bigint AS te FROM rem r, base b
)
SELECT r.channel, b.v AS conv_base_fp, r.v AS conv_removed_fp,
       CASE WHEN b.v > 0
            THEN round((b.v - r.v)::double / b.v::double, 6) + 0.0 END
         AS removal_effect,
       CASE WHEN t.te > 0
            THEN round((b.v - r.v)::double / t.te::double, 6) + 0.0 END
         AS share
FROM rem r, base b, toteff t
ORDER BY channel
"""


# ---------------------------------------------------------------------------
# Q215 — proximity (slop) search (operators/retrieval.
# proximity_search): docs where 'join' and 'merge' occur within 3
# tokens of each other, either order — the middle ground between
# bag-of-words BM25 (q63, no positions) and exact phrase search
# (q103, slop 0 + order). Two postings filters off one posexplode; the
# distance check is an equi-join ON DOC with per-doc fan-out bounded
# by the two term frequencies. All-integer output.
# DuckDB feature req: core only.
# ---------------------------------------------------------------------------

_PROX_A, _PROX_B, _PROX_SLOP = "join", "merge", 3


def q215_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.retrieval import proximity_search

    docs = _docs(spark, sf_dir)
    return proximity_search(
        docs, _PROX_A, _PROX_B, slop=_PROX_SLOP
    ).orderBy("doc_id")


def _q215_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, (i - 1)::bigint AS pos, ts[i] AS tok
  FROM (
    SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i
    FROM (SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents
          WHERE text IS NOT NULL)
  )
), pa AS (
  SELECT doc_id, pos AS p1 FROM toks WHERE tok = '{_PROX_A}'
), pb AS (
  SELECT doc_id, pos AS p2 FROM toks WHERE tok = '{_PROX_B}'
), d AS (
  SELECT pa.doc_id, abs(p1 - p2)::bigint AS d
  FROM pa JOIN pb ON pa.doc_id = pb.doc_id
)
SELECT doc_id,
       sum(CASE WHEN d <= {_PROX_SLOP} THEN 1 ELSE 0 END)::bigint
         AS n_pairs_within,
       min(d)::bigint AS min_dist
FROM d
GROUP BY doc_id
HAVING min(d) <= {_PROX_SLOP}
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q216 — Burrows' Delta stylometry (operators/profile.burrows_delta):
# pairwise STYLE distance between sources over top-20 marker-word
# rates — template farms cluster at tiny Delta even across topics; a
# styled source stands out (the complement to content drift:
# chi-square q104, KS q193, Wasserstein q179). One corpus groupBy;
# every cross-source float fold runs on the sources×markers DOMAIN in
# fixed sort order (q44 discipline); marker cut at the deterministic
# (count DESC, token ASC) total order; zero cells densified.
# DuckDB feature req: list(... ORDER BY) + list_sum (q44 precedent).
# ---------------------------------------------------------------------------

_DELTA_TOPK = 20


def q216_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import burrows_delta

    docs = _docs(spark, sf_dir)
    out = burrows_delta(docs, top_k=_DELTA_TOPK)
    return out.select(
        "src_a", "src_b", "n_markers", _rz(F.col("delta"), 6).alias("delta")
    ).orderBy("src_a", "src_b")


def _q216_sql() -> str:
    return f"""
WITH counts AS (
  SELECT source AS g, tok, count(*)::bigint AS c FROM (
    SELECT source, unnest({_SQL_WS_TOKS}) AS tok FROM documents
    WHERE text IS NOT NULL AND source IS NOT NULL
  )
  GROUP BY g, tok
), markers AS (
  SELECT tok FROM (
    SELECT tok, sum(c)::bigint AS tc FROM counts GROUP BY tok
  ) ORDER BY tc DESC, tok LIMIT {_DELTA_TOPK}
), tots AS (
  SELECT g, sum(c)::bigint AS tot FROM counts GROUP BY g
), ns AS (
  SELECT count(*)::bigint AS n FROM tots
), dense AS (
  SELECT t.g, m.tok,
         (coalesce(c.c, 0) * 1000000)::double / t.tot::double AS rate
  FROM tots t CROSS JOIN markers m
  LEFT JOIN counts c ON c.g = t.g AND c.tok = m.tok
), mu AS (
  SELECT tok, list_sum(list(rate ORDER BY g)) / ns.n::double AS mu
  FROM dense, ns GROUP BY tok, ns.n
), dev AS (
  SELECT d.g, d.tok, d.rate, mu.mu,
         (d.rate - mu.mu) * (d.rate - mu.mu) AS sq
  FROM dense d JOIN mu ON d.tok = mu.tok
), sig AS (
  SELECT tok, sqrt(list_sum(list(sq ORDER BY g)) / ns.n::double) AS sigma
  FROM dev, ns GROUP BY tok, ns.n
), z AS (
  SELECT d.g, d.tok,
         CASE WHEN s.sigma > 0 THEN (d.rate - m.mu) / s.sigma
              ELSE 0.0 END AS z
  FROM dense d JOIN mu m ON d.tok = m.tok JOIN sig s ON d.tok = s.tok
), pair AS (
  SELECT a.g AS src_a, b.g AS src_b, a.tok, abs(a.z - b.z) AS az
  FROM z a JOIN z b ON a.tok = b.tok AND a.g < b.g
)
SELECT src_a, src_b, count(*)::bigint AS n_markers,
       (round(list_sum(list(az ORDER BY tok)) / count(*)::double, 6) + 0.0)
         AS delta
FROM pair GROUP BY src_a, src_b
ORDER BY src_a, src_b
"""


# ---------------------------------------------------------------------------
# Q217 — Hearst-pattern hypernym mining (operators/extract.
# hearst_hypernyms): IS-A candidate edges for the ontology ('X such as
# Y and Z' → (X,Y),(X,Z); 'Y and other X' → (X,Y)) — the taxonomy
# complement to q211's alias edges, feeding the subsumption closure
# (q100). Corpus text has no such sentences, so the query appends them
# deterministically (q88/q211 precedent): %4==0 docs get a such-as
# sentence, %4==1 docs an and-other sentence. Map-only.
# DuckDB feature req: regexp_extract_all with group index.
# ---------------------------------------------------------------------------


def q217_hearst_hypernyms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.extract import hearst_hypernyms

    docs = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")
    w1, w2, w3 = (F.element_at(w, i) for i in (1, 2, 3))
    annotated = docs.where(
        F.col("text").isNotNull() & (F.size(w) >= 3)
    ).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat_ws(
                " ", F.col("text"), w1, F.lit("such as"), w2, F.lit("and"), w3
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat_ws(" ", F.col("text"), w2, F.lit("and other"), w1),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return hearst_hypernyms(annotated).orderBy(
        "doc_id", "pattern", "hypernym", "hyponym"
    )


def _q217_sql() -> str:
    p1 = r"(\w+) such as (\w+) and (\w+)"
    p2 = r"(\w+) and other (\w+)"
    return f"""
WITH ann AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN
                text || ' ' || ws[1] || ' such as ' || ws[2]
                     || ' and ' || ws[3]
              WHEN doc_id % 4 = 1 THEN
                text || ' ' || ws[2] || ' and other ' || ws[1]
              ELSE text END AS text
  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
        WHERE text IS NOT NULL)
  WHERE len(ws) >= 3
), p1 AS (
  SELECT doc_id,
         regexp_extract_all(text, '{p1}', 1) AS g1,
         regexp_extract_all(text, '{p1}', 2) AS g2,
         regexp_extract_all(text, '{p1}', 3) AS g3
  FROM ann
), p2 AS (
  SELECT doc_id,
         regexp_extract_all(text, '{p2}', 1) AS g1,
         regexp_extract_all(text, '{p2}', 2) AS g2
  FROM ann
)
SELECT * FROM (
  SELECT doc_id, g1[k] AS hypernym, g2[k] AS hyponym,
         'such_as' AS pattern
  FROM (SELECT doc_id, g1, g2,
               unnest(generate_series(1, len(g1))) AS k FROM p1)
  UNION ALL
  SELECT doc_id, g1[k], g3[k], 'such_as'
  FROM (SELECT doc_id, g1, g3,
               unnest(generate_series(1, len(g1))) AS k FROM p1)
  UNION ALL
  SELECT doc_id, g2[k], g1[k], 'and_other'
  FROM (SELECT doc_id, g1, g2,
               unnest(generate_series(1, len(g1))) AS k FROM p2)
)
ORDER BY doc_id, pattern, hypernym, hyponym
"""


# ---------------------------------------------------------------------------
# Q218 — HTML table extraction (operators/extract.extract_html_tables):
# the structured-data source channel of web-KG construction — infobox
# tables to long-format (row, col, cell, is_header) rows, the
# highest-precision attribute triples a page carries. Cell bodies use
# [^<]* so Java regex and RE2 agree exactly; rows use non-greedy
# (.*?), identical in both. Pages are synthesized deterministically
# (q88 precedent) with a variable-length row so ragged tables are
# exercised. Map-only. DuckDB feature req: regexp_extract_all.
# ---------------------------------------------------------------------------


def q218_html_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.extract import extract_html_tables

    docs = _docs(spark, sf_dir)
    html = F.concat(
        F.lit("<table><tr><th>field</th><th>value</th></tr>"),
        F.lit("<tr><td>source</td><td>"), F.col("source"),
        F.lit("</td></tr><tr><td>lang</td><td>"), F.col("lang"),
        F.lit("</td></tr>"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit("<tr><td>bucket</td><td>b"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit("</td></tr>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</table>"),
    )
    pages = docs.select("doc_id", html.alias("html"))
    return extract_html_tables(pages).orderBy("doc_id", "row_idx", "col_idx")


_Q218_SQL = r"""
WITH pages AS (
  SELECT doc_id,
         '<table><tr><th>field</th><th>value</th></tr>'
         || '<tr><td>source</td><td>' || source
         || '</td></tr><tr><td>lang</td><td>' || lang || '</td></tr>'
         || (CASE WHEN doc_id % 5 = 0
                  THEN '<tr><td>bucket</td><td>b' || (doc_id % 7)::varchar
                       || '</td></tr>'
                  ELSE '' END)
         || '</table>' AS html
  FROM documents
), rows_ AS (
  SELECT doc_id, (r - 1)::int AS row_idx, rh[r] AS row_html
  FROM (
    SELECT doc_id, regexp_extract_all(html, '<tr>(.*?)</tr>', 1) AS rh,
           unnest(generate_series(1,
             len(regexp_extract_all(html, '<tr>(.*?)</tr>', 1)))) AS r
    FROM pages
  )
)
SELECT doc_id, row_idx, (k - 1)::int AS col_idx, cells[k] AS cell,
       (row_html LIKE '%<th%') AS is_header
FROM (
  SELECT doc_id, row_idx, row_html,
         regexp_extract_all(row_html, '<t[dh][^>]*>([^<]*)</t[dh]>', 1)
           AS cells,
         unnest(generate_series(1,
           len(regexp_extract_all(row_html,
               '<t[dh][^>]*>([^<]*)</t[dh]>', 1)))) AS k
  FROM rows_
)
ORDER BY doc_id, row_idx, col_idx
"""


# ---------------------------------------------------------------------------
# Q219 — content-defined chunking dedup (operators/dedup.
# cdc_chunk_dedup): rsync/FastCDC boundaries at token granularity —
# md5-gated splits (1/8 of tokens), so an insertion shifts ONE chunk
# where q34's fixed segments all slide and stop matching. One per-doc
# window for chunk ids, position-ordered reassembly (q41 discipline),
# md5 chunk keys, combiner-friendly dedup aggregate; top-50 on the
# total order (n_occurrences DESC, md5).
# DuckDB feature req: string_agg(ORDER BY) (q41 precedent).
# ---------------------------------------------------------------------------


def q219_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.dedup import cdc_chunk_dedup

    docs = _docs(spark, sf_dir)
    return cdc_chunk_dedup(docs)


def _q219_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id AS d, (i - 1)::bigint AS pos, ts[i] AS tok
  FROM (
    SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i
    FROM (SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents
          WHERE text IS NOT NULL)
  )
), marked AS (
  SELECT d, pos, tok,
         sum(CASE WHEN substr(md5(tok), 1, 1) IN ('0', '8')
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY d ORDER BY pos) AS cid
  FROM toks
), chunks AS (
  SELECT d, cid, count(*)::bigint AS n_tokens,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
  FROM marked GROUP BY d, cid
), agg AS (
  SELECT chunk_md5, min(n_tokens)::bigint AS n_tokens,
         count(*)::bigint AS n_occurrences,
         count(DISTINCT d)::bigint AS n_docs
  FROM chunks GROUP BY chunk_md5
)
SELECT chunk_md5, n_tokens, n_occurrences, n_docs
FROM agg WHERE n_occurrences >= 2
ORDER BY n_occurrences DESC, chunk_md5
LIMIT 50
"""


# ---------------------------------------------------------------------------
# Q220 — k-anonymity + l-diversity audit (operators/profile.
# k_anonymity_audit) over event quasi-identifiers (type, day,
# value-hundreds bucket) with user_id as the sensitive attribute — the
# release-side privacy check PII scrubbing cannot give: small QI
# classes re-identify by outside join; homogeneous classes leak the
# sensitive value at any size. One combiner groupBy; violations
# REPORTED per class with exact counts.
# DuckDB feature req: core only.
# ---------------------------------------------------------------------------


def q220_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import k_anonymity_audit

    ev = spark.read.parquet(_t(sf_dir, "events"))
    qi = ev.where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "event_type",
        F.to_date(F.col("ts")).alias("day"),
        F.floor(F.col("value") / 100).cast("long").alias("vbucket"),
        "user_id",
    )
    return k_anonymity_audit(
        qi,
        qi_cols=["event_type", "day", "vbucket"],
        sensitive_col="user_id",
        k=5,
        l_div=2,
    ).orderBy("event_type", "day", "vbucket")


_Q220_SQL = """
WITH qi AS (
  SELECT event_type, ts::date AS day,
         floor(value / 100)::bigint AS vbucket, user_id
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
)
SELECT event_type, day, vbucket,
       count(*)::bigint AS class_size,
       count(DISTINCT user_id)::bigint AS n_sensitive,
       (count(*) < 5) AS k_violation,
       (count(DISTINCT user_id) < 2) AS l_violation
FROM qi
GROUP BY event_type, day, vbucket
ORDER BY event_type, day, vbucket
"""


# ---------------------------------------------------------------------------
# Q221 — Shapley channel attribution (operators/temporal.
# shapley_attribution): the axiomatic credit split next to q214's
# single counterfactual — marginal contribution averaged over all 2^4
# coalitions with |S|!(n−1−|S|)!/n! weights, unique under
# efficiency+symmetry+dummy. v(S) is the q214 fixed-point chain with
# non-coalition channels deleted; phi is carried as an EXACT integer
# numerator (denominator n! = 24 applied only in the reported double).
# Oracle: 16 coalition chains × 12 unrolled MATERIALIZED rounds with a
# bitmask scenario dimension. Exponential in CHANNELS, never in data.
# DuckDB feature req: integer bit ops (>>, &) + AS MATERIALIZED.
# ---------------------------------------------------------------------------


def q221_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import shapley_attribution

    ev = spark.read.parquet(_t(sf_dir, "events"))
    out = shapley_attribution(
        ev, channels=_MK_CHANNELS, iterations=_MK_ITERS, scale=_MK_SCALE
    )
    return out.select(
        "channel", "phi_num", _rz(F.col("phi"), 6).alias("phi"),
        "v_all_fp", "v_none_fp",
    )


def _q221_sql() -> str:
    chans = ", ".join(f"'{c}'" for c in _MK_CHANNELS)
    bits = ", ".join(str(i) for i in range(len(_MK_CHANNELS)))

    def rnd(prev, cur):
        return f"""{cur} AS MATERIALIZED (
  SELECT p.mask, p.st, p.bit,
         (CASE WHEN (p.bit IS NOT NULL AND ((p.mask >> p.bit) & 1) = 0)
                    OR min(ot.tot) IS NULL THEN 0
               ELSE coalesce(sum(tc.c * CASE
                      WHEN tc.d = 'purchase' THEN {_MK_SCALE}
                      WHEN tc.d = 'NULL' THEN 0
                      WHEN db.bit IS NOT NULL
                           AND ((p.mask >> db.bit) & 1) = 0 THEN 0
                      ELSE coalesce(pv.v, 0) END), 0) // min(ot.tot)
          END)::bigint AS v
  FROM {prev} p
  LEFT JOIN ot ON ot.s = p.st
  LEFT JOIN tc ON tc.s = p.st
  LEFT JOIN statebits db ON db.st = tc.d
  LEFT JOIN {prev} pv ON pv.mask = p.mask AND pv.st = tc.d
  GROUP BY p.mask, p.st, p.bit
)"""

    rounds = ",\n".join(rnd(f"s{i}", f"s{i + 1}") for i in range(_MK_ITERS))
    return f"""
WITH ev AS (
  SELECT user_id AS u, ts, event_id AS eid, event_type AS t FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
), ranked AS (
  SELECT u, t, row_number() OVER (PARTITION BY u ORDER BY ts, eid) AS rn
  FROM ev
), firstc AS (
  SELECT u, min(rn) AS crn FROM ranked WHERE t = 'purchase' GROUP BY u
), kept AS MATERIALIZED (
  SELECT r.u, r.t, r.rn FROM ranked r LEFT JOIN firstc f ON r.u = f.u
  WHERE f.crn IS NULL OR r.rn <= f.crn
), hops AS MATERIALIZED (
  SELECT u, t, rn, lead(t) OVER (PARTITION BY u ORDER BY rn) AS nxt
  FROM kept
), edges AS MATERIALIZED (
  SELECT 'START' AS s, t AS d FROM hops WHERE rn = 1
  UNION ALL SELECT t, nxt FROM hops WHERE nxt IS NOT NULL
  UNION ALL SELECT t, 'NULL' FROM hops WHERE nxt IS NULL AND t <> 'purchase'
), tc AS MATERIALIZED (
  SELECT s, d, count(*)::bigint AS c FROM edges GROUP BY s, d
), ot AS MATERIALIZED (
  SELECT s, sum(c)::bigint AS tot FROM tc GROUP BY s
), scen AS (
  SELECT unnest(generate_series(0, {(1 << len(_MK_CHANNELS)) - 1})) AS mask
), statebits AS MATERIALIZED (
  SELECT unnest(['START', {chans}]) AS st,
         unnest([NULL::int, {bits}]) AS bit
), s0 AS MATERIALIZED (
  SELECT mask, st, bit, 0::bigint AS v FROM scen, statebits
),
{rounds},
chan AS (
  SELECT unnest([{chans}]) AS ch, unnest([{bits}]) AS bit
), masks AS (
  SELECT mask,
         ((mask >> 0) & 1) + ((mask >> 1) & 1)
         + ((mask >> 2) & 1) + ((mask >> 3) & 1) AS pc
  FROM scen
), phi AS (
  SELECT c.ch AS channel,
         sum((CASE m.pc WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
              ELSE 6 END) * (vw.v - vo.v))::bigint AS phi_num
  FROM chan c
  JOIN masks m ON ((m.mask >> c.bit) & 1) = 0
  JOIN s{_MK_ITERS} vo ON vo.mask = m.mask AND vo.st = 'START'
  JOIN s{_MK_ITERS} vw ON vw.mask = (m.mask | (1 << c.bit))
                      AND vw.st = 'START'
  GROUP BY c.ch
)
SELECT p.channel, p.phi_num,
       (round(p.phi_num::double / 24.0, 6) + 0.0) AS phi,
       (SELECT v FROM s{_MK_ITERS}
        WHERE mask = {(1 << len(_MK_CHANNELS)) - 1} AND st = 'START')::bigint
         AS v_all_fp,
       (SELECT v FROM s{_MK_ITERS}
        WHERE mask = 0 AND st = 'START')::bigint AS v_none_fp
FROM phi p
ORDER BY channel
"""


# ---------------------------------------------------------------------------
# Q222 — Benford first-digit test (operators/profile.
# benford_digit_test) over event value cents: the forensic
# plausibility check beside structural profiling (q91/q213) — per-digit
# observed vs log10(1+1/d) expectation with chi-square terms, the
# 9-term total folded in DIGIT order. One combiner groupBy; everything
# else is the fixed 9-row digit domain.
# DuckDB feature req: list(... ORDER BY) + list_sum (q44 precedent).
# ---------------------------------------------------------------------------


def q222_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import benford_digit_test

    ev = spark.read.parquet(_t(sf_dir, "events"))
    out = benford_digit_test(ev)
    return out.select(
        "digit", "observed",
        _rz(F.col("expected"), 6).alias("expected"),
        _rz(F.col("chi2_term"), 6).alias("chi2_term"),
        _rz(F.col("chi2_total"), 6).alias("chi2_total"),
    ).orderBy("digit")


_Q222_SQL = """
WITH cents AS (
  SELECT floor(value * 100)::bigint AS c FROM events
  WHERE value IS NOT NULL
), obs AS (
  SELECT substr(c::varchar, 1, 1)::int AS digit, count(*)::bigint AS observed
  FROM cents WHERE c >= 1 GROUP BY digit
), nn AS (
  SELECT coalesce(sum(observed), 0)::bigint AS n FROM obs
), dense AS (
  SELECT d.digit, coalesce(o.observed, 0)::bigint AS observed
  FROM (SELECT unnest(generate_series(1, 9))::int AS digit) d
  LEFT JOIN obs o ON d.digit = o.digit
), scored AS (
  SELECT digit, observed,
         nn.n::double * log10(1.0 + 1.0 / digit::double) AS expected,
         (observed::double - nn.n::double * log10(1.0 + 1.0 / digit::double))
         * (observed::double - nn.n::double * log10(1.0 + 1.0 / digit::double))
         / (nn.n::double * log10(1.0 + 1.0 / digit::double)) AS chi2_term
  FROM dense, nn
), tot AS (
  SELECT list_sum(list(chi2_term ORDER BY digit)) AS chi2_total FROM scored
)
SELECT digit, observed,
       (round(expected, 6) + 0.0) AS expected,
       (round(chi2_term, 6) + 0.0) AS chi2_term,
       (round(tot.chi2_total, 6) + 0.0) AS chi2_total
FROM scored, tot
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# Q223 — deterministic maximal matching (operators/graph.
# hash_priority_matching) over the part–supplier bipartite graph: the
# graph-COARSENING primitive (disjoint merge pairs — no entity merges
# twice in one pass). Randomized parallel matching's coin is replaced
# by an md5 edge priority: per round an edge matches iff it is the max
# at BOTH endpoints (two groupBy-max equi-joins); fixed 4 rounds with
# the unmatched remainder REPORTED in n_left. Unrolled MATERIALIZED
# oracle. DuckDB feature req: AS MATERIALIZED.
# ---------------------------------------------------------------------------

_MATCH_ROUNDS = 4


def q223_maximal_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import hash_priority_matching

    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    edges = li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    return hash_priority_matching(edges, rounds=_MATCH_ROUNDS).orderBy(
        "src", "dst"
    )


def _q223_sql() -> str:
    parts = [
        """e1 AS MATERIALIZED (
  SELECT s, d, md5('m:' || s || ':' || d) AS p FROM (
    SELECT DISTINCT 'p' || l_partkey::varchar AS s,
                    's' || l_suppkey::varchar AS d
    FROM lineitem)
)"""
    ]
    for r in range(1, _MATCH_ROUNDS + 1):
        parts.append(f"""nmax{r} AS MATERIALIZED (
  SELECT node, max(p) AS mp FROM (
    SELECT s AS node, p FROM e{r}
    UNION ALL SELECT d AS node, p FROM e{r}
  ) GROUP BY node
)""")
        parts.append(f"""m{r} AS MATERIALIZED (
  SELECT e.s, e.d, {r} AS round FROM e{r} e
  JOIN nmax{r} a ON e.s = a.node AND e.p = a.mp
  JOIN nmax{r} b ON e.d = b.node AND e.p = b.mp
)""")
        parts.append(f"""e{r + 1} AS MATERIALIZED (
  SELECT e.s, e.d, e.p FROM e{r} e
  WHERE e.s NOT IN (SELECT s FROM m{r} UNION ALL SELECT d FROM m{r})
    AND e.d NOT IN (SELECT s FROM m{r} UNION ALL SELECT d FROM m{r})
)""")
    allm = " UNION ALL ".join(
        f"SELECT * FROM m{r}" for r in range(1, _MATCH_ROUNDS + 1)
    )
    return f"""
WITH {", ".join(parts)},
nl AS (SELECT count(*)::bigint AS n FROM e{_MATCH_ROUNDS + 1})
SELECT m.s AS src, m.d AS dst, m.round, nl.n AS n_left
FROM ({allm}) m, nl
ORDER BY src, dst
"""


# ---------------------------------------------------------------------------
# Q224 — RAKE keyphrases (operators/textstats.rake_keyphrases):
# stopword-run candidates scored by Σ deg(w)/freq(w) — the
# no-iteration keyphrase miner beside TextRank's converged walk
# (q140), and it emits PHRASES. Segmentation is a cumulative
# stopword-boundary window (q219's shape); word scores one exact
# division; per-phrase folds in position order; top-40 on
# (score DESC, phrase). DuckDB feature req: list_contains +
# string_agg(ORDER BY) + list(ORDER BY) (established precedents).
# ---------------------------------------------------------------------------

_RAKE_TOPK = 40


def q224_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import rake_keyphrases

    docs = _docs(spark, sf_dir)
    out = rake_keyphrases(docs, top_k=_RAKE_TOPK)
    return out.select(
        "phrase", "n_words", "n_occurrences",
        _rz(F.col("score"), 6).alias("score"),
    )


def _q224_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id AS doc, (i - 1)::bigint AS pos, ts[i] AS tok
  FROM (
    SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i
    FROM (SELECT doc_id, {_SQL_WS_TOKS} AS ts FROM documents
          WHERE text IS NOT NULL)
  )
), marked AS (
  SELECT doc, pos, tok,
         sum(CASE WHEN list_contains({_STOP_SQL}, tok)
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc ORDER BY pos) AS pid,
         list_contains({_STOP_SQL}, tok) AS is_stop
  FROM toks
), words AS (
  SELECT doc, pid, pos, tok FROM marked WHERE NOT is_stop
), plen AS (
  SELECT doc, pid, count(*)::bigint AS n_words
  FROM words GROUP BY doc, pid
), occs AS (
  SELECT w.doc, w.pid, w.pos, w.tok, p.n_words
  FROM words w JOIN plen p ON w.doc = p.doc AND w.pid = p.pid
), wstats AS (
  SELECT tok, count(*)::bigint AS freq, sum(n_words)::bigint AS deg
  FROM occs GROUP BY tok
), sw AS (
  SELECT o.doc, o.pid, o.pos, o.tok,
         ws.deg::double / ws.freq::double AS ws
  FROM occs o JOIN wstats ws ON o.tok = ws.tok
), ph AS (
  SELECT doc, pid, string_agg(tok, ' ' ORDER BY pos) AS phrase,
         count(*)::bigint AS n_words,
         list_sum(list(ws ORDER BY pos)) AS score_raw
  FROM sw GROUP BY doc, pid
), agg AS (
  SELECT phrase, min(n_words)::bigint AS n_words,
         count(*)::bigint AS n_occurrences, min(score_raw) AS score_raw
  FROM ph GROUP BY phrase
)
SELECT phrase, n_words, n_occurrences,
       (round(score_raw, 6) + 0.0) AS score
FROM agg
ORDER BY score_raw DESC, phrase
LIMIT {_RAKE_TOPK}
"""


# ---------------------------------------------------------------------------
# Q225 — v-optimal histogram (operators/profile.v_optimal_histogram)
# over l_quantity's 50-value domain, k=4: the optimizer-statistics
# histogram that provably minimizes equality-selectivity error —
# equi-depth (q118) is the approximation, this is the exact optimum
# via layered DP on the DOMAIN-bounded frequency vector (int64 prefix
# sums, fixed scalar SSE expressions, lexicographic (cost, split)
# argmins, driver backtrack over k scalars). The CBO capstone of the
# q91/q213 profiling family.
# DuckDB feature req: AS MATERIALIZED.
# ---------------------------------------------------------------------------

_VOPT_K = 4


def q225_v_optimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import v_optimal_histogram

    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    q = li.select(F.col("l_quantity").cast("long").alias("q"))
    out = v_optimal_histogram(q, value_col="q", n_buckets=_VOPT_K)
    return out.select(
        "bucket", "lo", "hi", "n_values", "total_freq",
        _rz(F.col("sse"), 6).alias("sse"),
    )


def _q225_sql() -> str:
    def layer(prev, cur):
        return f"""{cur} AS MATERIALIZED (
  SELECT e, tc AS cost, s AS split FROM (
    SELECT seg.e, p.cost + seg.c AS tc, seg.s,
           row_number() OVER (PARTITION BY seg.e
                              ORDER BY (p.cost + seg.c), seg.s) AS rn
    FROM {prev} p JOIN seg ON seg.s = p.e
  ) WHERE rn = 1
)"""

    layers = ",\n".join(layer(f"l{j}", f"l{j + 1}") for j in range(1, _VOPT_K))
    return f"""
WITH freq AS (
  SELECT l_quantity::bigint AS v, count(*)::bigint AS f
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY v
), pts AS MATERIALIZED (
  SELECT v, f, row_number() OVER (ORDER BY v)::bigint AS i,
         sum(f) OVER (ORDER BY v)::bigint AS cf,
         sum(f * f) OVER (ORDER BY v)::bigint AS cf2
  FROM freq
), pref AS MATERIALIZED (
  SELECT i, cf, cf2 FROM pts
  UNION ALL SELECT 0::bigint, 0::bigint, 0::bigint
), seg AS MATERIALIZED (
  SELECT a.i AS s, b.i AS e,
         (b.cf2 - a.cf2)::double
         - (b.cf - a.cf)::double * (b.cf - a.cf)::double
           / (b.i - a.i)::double AS c
  FROM pref a JOIN pts b ON a.i < b.i
), l1 AS MATERIALIZED (
  SELECT e, c AS cost, 0::bigint AS split FROM seg WHERE s = 0
),
{layers},
nmax AS (SELECT max(i)::bigint AS n FROM pts),
b4 AS (SELECT l4.e, l4.split FROM l4, nmax WHERE l4.e = nmax.n),
b3 AS (SELECT l3.e, l3.split FROM l3, b4 WHERE l3.e = b4.split),
b2 AS (SELECT l2.e, l2.split FROM l2, b3 WHERE l2.e = b3.split),
b1 AS (SELECT l1.e FROM l1, b2 WHERE l1.e = b2.split),
cuts AS (
  SELECT 1 AS bucket, 0::bigint AS s, e FROM b1
  UNION ALL SELECT 2, b1.e, b2.e FROM b1, b2
  UNION ALL SELECT 3, b2.e, b3.e FROM b2, b3
  UNION ALL SELECT 4, b3.e, b4.e FROM b3, b4
)
SELECT c.bucket,
       plo.v AS lo, phi.v AS hi,
       (c.e - c.s)::bigint AS n_values,
       (pe.cf - ps.cf)::bigint AS total_freq,
       (round(seg.c, 6) + 0.0) AS sse
FROM cuts c
JOIN seg ON seg.s = c.s AND seg.e = c.e
JOIN pts plo ON plo.i = c.s + 1
JOIN pts phi ON phi.i = c.e
JOIN pref ps ON ps.i = c.s
JOIN pref pe ON pe.i = c.e
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Q226 — pseudo-relevance-feedback BM25 (operators/retrieval.
# prf_bm25_topk): the Rocchio two-pass recall play completing the IR
# stack (BM25 q63, QL q194, RRF q93, proximity q215, phrase q103) —
# feedback from the top-5 first-pass docs mines the 2 strongest
# non-query terms (Σtf·idf, term tie-break), which rejoin the query at
# weight 0.5 for the rescore. The weighted score is w·(shared BM25
# term expression) with the parenthesization mirrored verbatim (float
# multiplication is not associative — the grouping is part of the
# cross-engine contract). Reuses q63's SQL chain.
# DuckDB feature req: list(... ORDER BY) + list_sum (q63 precedent).
# ---------------------------------------------------------------------------

_PRF_FB = 5
_PRF_EXP = 2
_PRF_W = 0.5


def q226_prf_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.retrieval import prf_bm25_topk
    from pathhier_spark.operators.textstats import _tokens

    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", _tokens("text").alias("ts"))
    qsrc = (
        toks.filter(F.col("doc_id") % _BM25_QMOD == 0)
        .select(
            F.col("doc_id").alias("qid"),
            F.posexplode("ts").alias("pos", "term"),
        )
        .groupBy("qid", "term")
        .agg(F.min("pos").alias("mp"))
    )
    qw = Window.partitionBy("qid").orderBy("mp", "term")
    qterms = (
        qsrc.withColumn("rn", F.row_number().over(qw))
        .filter(F.col("rn") <= _BM25_QLEN)
        .select("qid", "term")
    )
    out = prf_bm25_topk(
        toks, qterms, F.col("ts"),
        fb_docs=_PRF_FB, exp_terms=_PRF_EXP, exp_weight=_PRF_W,
        k1=_BM25_K1, b=_BM25_B, k=_BM25_K,
    )
    return out.select(
        "qid", "rank", "doc_id", _rz(F.col("score"), 6).alias("score")
    ).orderBy("qid", "rank")


def _q226_sql() -> str:
    k1p1 = _BM25_K1 + 1.0
    omb = 1.0 - _BM25_B
    return _sql_bm25_chain() + f""",
fb AS (
  SELECT qid, doc_id FROM ranked WHERE "rank" <= {_PRF_FB}
), expd AS (
  SELECT f.qid, p.term, sum(p.tf)::bigint AS tfs
  FROM fb f JOIN postings p ON p.doc_id = f.doc_id
  WHERE NOT EXISTS (SELECT 1 FROM qterms q
                    WHERE q.qid = f.qid AND q.term = p.term)
  GROUP BY f.qid, p.term
), exps AS (
  SELECT qid, term FROM (
    SELECT e.qid, e.term,
           row_number() OVER (PARTITION BY e.qid ORDER BY
             (e.tfs::double * ln((s.n_docs - d.df + 0.5) / (d.df + 0.5)
                                 + 1.0)) DESC, e.term) AS rn
    FROM expd e JOIN dfreq d USING (term), stats s
  ) WHERE rn <= {_PRF_EXP}
), wq AS (
  SELECT qid, term, 1.0 AS w FROM qterms
  UNION ALL SELECT qid, term, {_PRF_W!r} FROM exps
), scored2 AS (
  SELECT q.qid, p.doc_id, q.term,
         q.w * (ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                * (p.tf * {k1p1!r})
                / (p.tf + {_BM25_K1!r}
                   * ({omb!r} + {_BM25_B!r} * l.dl / s.avgdl))) AS sc
  FROM wq q
  JOIN postings p USING (term)
  JOIN dfreq d USING (term)
  JOIN dl l ON l.doc_id = p.doc_id, stats s
), folded2 AS (
  SELECT qid, doc_id, list_sum(list(sc ORDER BY term)) AS score
  FROM scored2 GROUP BY qid, doc_id
), ranked2 AS (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id) AS "rank"
  FROM folded2
)
SELECT qid, "rank", doc_id, round(score, 6) + 0.0 AS score
FROM ranked2 WHERE "rank" <= {_BM25_K}
ORDER BY qid, "rank"
"""


# ---------------------------------------------------------------------------
# Q227 — seasonal decomposition (operators/temporal.
# seasonal_decompose_daily): STL-lite trend / weekly-seasonal /
# remainder split of daily volume — the "is Monday always low or is
# THIS week anomalous" question none of q206/q209/q212 can answer
# alone. Integer-exact by SCALING (trend carried as the 7-day sum,
# detrended = 7x − sum, floor-mean seasonal index); weekday = epoch
# day % 7, immune to the engines' dayofweek-origin mismatch. All
# windows on the day domain. DuckDB feature req: core windows.
# ---------------------------------------------------------------------------


def q227_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import seasonal_decompose_daily

    ev = spark.read.parquet(_t(sf_dir, "events"))
    out = seasonal_decompose_daily(ev)
    return out.select(
        "day", "x", "trend_sum", _rz(F.col("trend"), 6).alias("trend"),
        "dow", "seasonal_fp", "remainder_fp",
    )


_Q227_SQL = """
WITH daily AS (
  SELECT ts::date AS day, count(*)::bigint AS x
  FROM events WHERE ts IS NOT NULL GROUP BY ts::date
), trended AS (
  SELECT day, x,
         sum(x) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND
                      3 FOLLOWING)::bigint AS trend_sum,
         count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND
                        3 FOLLOWING) AS wn,
         ((day - DATE '1970-01-01') % 7)::int AS dow
  FROM daily
), detr AS (
  SELECT day, x, trend_sum, dow, 7 * x - trend_sum AS r
  FROM trended WHERE wn = 7
), seas AS (
  SELECT dow, floor(sum(r)::double / count(*))::bigint AS seasonal_fp
  FROM detr GROUP BY dow
)
SELECT d.day, d.x, d.trend_sum,
       (round(d.trend_sum::double / 7.0, 6) + 0.0) AS trend,
       d.dow, s.seasonal_fp,
       (d.r - s.seasonal_fp)::bigint AS remainder_fp
FROM detr d JOIN seas s ON d.dow = s.dow
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Q228 — priority sampling for subset sums (operators/sampling.
# priority_sample_sums): the DLT weighted counterpart of the distinct
# sketches (KMV q50, HLL q68) — one k-item sample answers every
# posterior group-by-sum question via Σ max(w, τ). RNG-free: u is an
# exact dyadic rational from the item md5 (the q22 hex32 idiom), so
# priorities, the (q DESC, id) order, the sample and τ are
# bit-reproducible; per-group estimate folds in ID order. Exact sums
# ship alongside for auditability.
# DuckDB feature req: list(... ORDER BY) + list_sum.
# ---------------------------------------------------------------------------

_PRIO_K = 100


def q228_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.sampling import priority_sample_sums

    ev = spark.read.parquet(_t(sf_dir, "events"))
    items = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * F.lit(100.0)).cast("long").alias("w"),
    )
    out = priority_sample_sums(
        items, id_col="event_id", weight_col="w",
        group_col="event_type", k=_PRIO_K,
    )
    return out.select(
        "event_type", "n_items", "exact_sum", "n_sampled",
        _rz(F.col("est_sum"), 6).alias("est_sum"),
    ).orderBy("event_type")


def _q228_sql() -> str:
    hex32 = _sql_hex32("i::varchar")
    return f"""
WITH items AS (
  SELECT event_type AS g, event_id AS i, floor(value * 100)::bigint AS w
  FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL
), pos AS (
  SELECT g, i, w FROM items WHERE w > 0
), pri AS (
  SELECT g, i, w,
         w::double / (({hex32} + 1)::double / 4294967296.0) AS q
  FROM pos
), ranked AS (
  SELECT g, i, w, q, row_number() OVER (ORDER BY q DESC, i) AS rn
  FROM pri
), tau AS (
  SELECT max(CASE WHEN rn = {_PRIO_K + 1} THEN q END) AS tau FROM ranked
), est AS (
  SELECT s.g, count(*)::bigint AS n_sampled,
         list_sum(list(greatest(s.w::double, coalesce(t.tau, 0.0))
                       ORDER BY s.i)) AS est_sum
  FROM (SELECT g, i, w FROM ranked WHERE rn <= {_PRIO_K}) s, tau t
  GROUP BY s.g
), exact AS (
  SELECT g, count(*)::bigint AS n_items, sum(w)::bigint AS exact_sum
  FROM pos GROUP BY g
)
SELECT e.g AS event_type, e.n_items, e.exact_sum,
       coalesce(est.n_sampled, 0)::bigint AS n_sampled,
       (round(coalesce(est.est_sum, 0.0), 6) + 0.0) AS est_sum
FROM exact e LEFT JOIN est ON e.g = est.g
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Q229 — error-bounded PLA segmentation (operators/temporal.
# pla_segments): the swing/slope-cone filter of time-series
# compression — a segment extends while some line from its anchor
# stays within ±eps of every point; the cone narrows per point and the
# segment closes when it empties. Segment count IS the compression
# ratio; changepoints are where new segments start. Bit-reproducible:
# cone bounds are divisions of exact integers, identical double ops
# both engines, ±1e308 literal sentinels; day-domain driver fold +
# recursive-CTE oracle carrying the cone in the state row.
# DuckDB feature req: WITH RECURSIVE.
# ---------------------------------------------------------------------------

_PLA_EPS = 10


def q229_pla_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.temporal import pla_segments

    ev = spark.read.parquet(_t(sf_dir, "events"))
    return pla_segments(ev, eps=_PLA_EPS)


def _q229_sql() -> str:
    e = _PLA_EPS
    return f"""
WITH RECURSIVE daily AS (
  SELECT ts::date AS day, count(*)::bigint AS x
  FROM events WHERE ts IS NOT NULL GROUP BY ts::date
), seq AS (
  SELECT row_number() OVER (ORDER BY day)::bigint AS idx, x AS y
  FROM daily
), rec AS (
  SELECT 1::bigint AS idx, 1::bigint AS seg, 1::bigint AS ta,
         y AS ya, -1e308 AS lo, 1e308 AS hi
  FROM seq WHERE idx = 1
  UNION ALL
  SELECT s.idx,
         CASE WHEN greatest(r.lo, (s.y - {e} - r.ya)::double
                                  / (s.idx - r.ta)::double)
                   > least(r.hi, (s.y + {e} - r.ya)::double
                                 / (s.idx - r.ta)::double)
              THEN r.seg + 1 ELSE r.seg END,
         CASE WHEN greatest(r.lo, (s.y - {e} - r.ya)::double
                                  / (s.idx - r.ta)::double)
                   > least(r.hi, (s.y + {e} - r.ya)::double
                                 / (s.idx - r.ta)::double)
              THEN p.idx ELSE r.ta END,
         CASE WHEN greatest(r.lo, (s.y - {e} - r.ya)::double
                                  / (s.idx - r.ta)::double)
                   > least(r.hi, (s.y + {e} - r.ya)::double
                                 / (s.idx - r.ta)::double)
              THEN p.y ELSE r.ya END,
         CASE WHEN greatest(r.lo, (s.y - {e} - r.ya)::double
                                  / (s.idx - r.ta)::double)
                   > least(r.hi, (s.y + {e} - r.ya)::double
                                 / (s.idx - r.ta)::double)
              THEN (s.y - {e} - p.y)::double / (s.idx - p.idx)::double
              ELSE greatest(r.lo, (s.y - {e} - r.ya)::double
                                  / (s.idx - r.ta)::double) END,
         CASE WHEN greatest(r.lo, (s.y - {e} - r.ya)::double
                                  / (s.idx - r.ta)::double)
                   > least(r.hi, (s.y + {e} - r.ya)::double
                                 / (s.idx - r.ta)::double)
              THEN (s.y + {e} - p.y)::double / (s.idx - p.idx)::double
              ELSE least(r.hi, (s.y + {e} - r.ya)::double
                               / (s.idx - r.ta)::double) END
  FROM rec r
  JOIN seq s ON s.idx = r.idx + 1
  JOIN seq p ON p.idx = r.idx
), segrows AS (
  SELECT seg, min(ta)::bigint AS t_start FROM rec GROUP BY seg
), nn AS (
  SELECT max(idx)::bigint AS n FROM seq
), segs AS (
  SELECT s.seg, s.t_start,
         coalesce(nx.t_start, nn.n)::bigint AS t_end
  FROM segrows s LEFT JOIN segrows nx ON nx.seg = s.seg + 1, nn
)
SELECT g.seg, g.t_start, g.t_end,
       (g.t_end - g.t_start + 1)::bigint AS n_points,
       ys.y AS y_start, ye.y AS y_end
FROM segs g
JOIN seq ys ON ys.idx = g.t_start
JOIN seq ye ON ye.idx = g.t_end
ORDER BY seg
"""


# ---------------------------------------------------------------------------
# Q230 — densest-subgraph peeling (operators/graph.
# densest_subgraph_peel) over the part–supplier graph: Charikar's
# 2-approx dense-core miner — peel all min-degree vertices per round,
# densest prefix wins — the spam-farm / bot-ring / template-cluster
# detector. Best round chosen by CROSS-MULTIPLIED integer density
# (never a float argmax), earliest round on ties; rows emit only while
# the graph survives. Unrolled MATERIALIZED oracle with a NOT EXISTS
# argmax mirror. DuckDB feature req: AS MATERIALIZED.
# ---------------------------------------------------------------------------

_PEEL_ROUNDS = 12


def q230_densest_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.graph import densest_subgraph_peel

    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    edges = li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    out = densest_subgraph_peel(edges, rounds=_PEEL_ROUNDS)
    return out.select(
        "round", "n_nodes", "n_edges", "min_deg",
        _rz(F.col("density"), 6).alias("density"), "is_best",
    )


def _q230_sql() -> str:
    parts = [
        """e0 AS MATERIALIZED (
  SELECT DISTINCT 'p' || l_partkey::varchar AS s,
                  's' || l_suppkey::varchar AS d
  FROM lineitem
)"""
    ]
    for r in range(_PEEL_ROUNDS + 1):
        parts.append(f"""deg{r} AS MATERIALIZED (
  SELECT node, count(*)::bigint AS deg FROM (
    SELECT s AS node FROM e{r} UNION ALL SELECT d FROM e{r}
  ) GROUP BY node
)""")
        if r < _PEEL_ROUNDS:
            parts.append(f"""e{r + 1} AS MATERIALIZED (
  SELECT e.s, e.d FROM e{r} e
  JOIN deg{r} a ON e.s = a.node
  JOIN deg{r} b ON e.d = b.node
  WHERE a.deg > (SELECT min(deg) FROM deg{r})
    AND b.deg > (SELECT min(deg) FROM deg{r})
)""")
    stat_rows = "\n  UNION ALL ".join(
        f"""SELECT {r} AS round,
         (SELECT count(*)::bigint FROM deg{r}) AS n_nodes,
         (SELECT count(*)::bigint FROM e{r}) AS n_edges,
         (SELECT min(deg)::bigint FROM deg{r}) AS min_deg"""
        for r in range(_PEEL_ROUNDS + 1)
    )
    return f"""
WITH {", ".join(parts)},
stats AS (
  SELECT * FROM (
  {stat_rows}
  ) WHERE n_nodes > 0
), best AS (
  SELECT s.round FROM stats s WHERE NOT EXISTS (
    SELECT 1 FROM stats t
    WHERE t.n_edges * s.n_nodes > s.n_edges * t.n_nodes
       OR (t.n_edges * s.n_nodes = s.n_edges * t.n_nodes
           AND t.round < s.round)
  )
)
SELECT st.round, st.n_nodes, st.n_edges, st.min_deg,
       (round(st.n_edges::double / st.n_nodes::double, 6) + 0.0)
         AS density,
       (st.round = b.round) AS is_best
FROM stats st, best b
ORDER BY st.round
"""


# ---------------------------------------------------------------------------
# Q231 — SymSpell spelling correction (operators/textstats.
# symspell_correct): the deletes-index lookup that replaces a brute
# levenshtein scan — vocab indexed under itself + all 1-deletes,
# queries probe with theirs, key collisions verified by the exact JVM
# levenshtein. Queries are synthesized deterministically: the top-30
# corpus terms with their 2nd char dropped (real misspellings), five
# exact terms (identity path), and one nonsense probe (REPORTED with a
# NULL correction). DuckDB feature req: levenshtein (q66 precedent).
# ---------------------------------------------------------------------------

_SYM_MISS = 30
_SYM_EXACT = 5


def q231_symspell(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import _tokens, symspell_correct

    docs = _docs(spark, sf_dir)
    vocab = (
        docs.select(F.explode(_tokens("text")).alias("term"))
        .where(F.length("term") >= 4)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    wv = Window.orderBy(F.desc("freq"), "term")
    ranked = vocab.withColumn("rn", F.row_number().over(wv))
    missp = ranked.where(F.col("rn") <= _SYM_MISS).select(
        F.concat(
            F.substring("term", 1, 1),
            F.col("term").substr(F.lit(3), F.lit(1 << 20)),
        ).alias("query")
    )
    exact = ranked.where(
        (F.col("rn") > _SYM_MISS)
        & (F.col("rn") <= _SYM_MISS + _SYM_EXACT)
    ).select(F.col("term").alias("query"))
    nonsense = spark.createDataFrame([("zzzzqq",)], "query string")
    qs = missp.union(exact).union(nonsense)
    return symspell_correct(vocab, qs).orderBy("query")


def _q231_sql() -> str:
    dele = (
        "list_distinct(list_prepend({c}, "
        "list_transform(generate_series(1, len({c})), "
        "i -> substr({c}, 1, i - 1) || substr({c}, i + 1))))"
    )
    return f"""
WITH vocab AS (
  SELECT term, count(*)::bigint AS freq FROM (
    SELECT unnest({_SQL_WS_TOKS}) AS term FROM documents
  ) WHERE length(term) >= 4 GROUP BY term
), ranked AS (
  SELECT term, freq,
         row_number() OVER (ORDER BY freq DESC, term) AS rn
  FROM vocab
), qs AS (
  SELECT DISTINCT query FROM (
    SELECT substr(term, 1, 1) || substr(term, 3) AS query
    FROM ranked WHERE rn <= {_SYM_MISS}
    UNION ALL
    SELECT term FROM ranked
    WHERE rn > {_SYM_MISS} AND rn <= {_SYM_MISS + _SYM_EXACT}
    UNION ALL SELECT 'zzzzqq'
  )
), vkeys AS (
  SELECT DISTINCT term AS t, freq AS f, key FROM (
    SELECT term, freq, unnest({dele.format(c="term")}) AS key FROM vocab
  )
), qkeys AS (
  SELECT DISTINCT query AS q, key FROM (
    SELECT query, unnest({dele.format(c="query")}) AS key FROM qs
  )
), cand AS (
  SELECT DISTINCT q, t, f FROM qkeys JOIN vkeys USING (key)
), verified AS (
  SELECT q, t, f, levenshtein(q, t)::bigint AS distance
  FROM cand WHERE levenshtein(q, t) <= 1
), best AS (
  SELECT q, t, distance, f FROM (
    SELECT q, t, distance, f,
           row_number() OVER (PARTITION BY q
                              ORDER BY distance, f DESC, t) AS rn
    FROM verified
  ) WHERE rn = 1
)
SELECT qs.query, b.t AS corrected, b.distance, b.f AS freq
FROM qs LEFT JOIN best b ON qs.query = b.q
ORDER BY query
"""


# ---------------------------------------------------------------------------
# Q232 — FD mode repair (operators/profile.fd_mode_repair): the
# HoloClean-lite rule-repair step downstream of q213's discovery — for
# the almost-FD source→lang, each source's majority lang is the repair
# target and disagreeing rows are REPORTED as an audit table (never
# silently rewritten; application is the caller's policy, the q220
# discipline). One combiner groupBy + a per-class argmax with
# deterministic (count DESC, value ASC) ties.
# DuckDB feature req: core only.
# ---------------------------------------------------------------------------


def q232_fd_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.profile import fd_mode_repair

    docs = _docs(spark, sf_dir)
    return fd_mode_repair(
        docs, lhs_col="source", rhs_col="lang"
    ).orderBy("source")


_Q232_SQL = """
WITH cells AS (
  SELECT source AS l, lang AS r, count(*)::bigint AS c
  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
  GROUP BY source, lang
), per_l AS (
  SELECT l, sum(c)::bigint AS n_rows, count(*)::bigint AS n_values
  FROM cells GROUP BY l
), maj AS (
  SELECT l, r AS majority_rhs, c AS mc FROM (
    SELECT l, r, c, row_number() OVER (PARTITION BY l
                                       ORDER BY c DESC, r) AS rn
    FROM cells
  ) WHERE rn = 1
)
SELECT p.l AS source, m.majority_rhs, p.n_rows, p.n_values,
       (p.n_rows - m.mc)::bigint AS n_repaired
FROM per_l p JOIN maj m ON p.l = m.l
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Q233 — hard-negative mining (operators/similarity.hard_negatives):
# each labeled vector's NEAREST different-label neighbor — the
# contrastive-training signal q122's hash-corruption negatives cannot
# give (random negatives are easy; the closest wrong-label point is
# what the model confuses), and q203's per-anchor dual. All-integer
# quantized sqdist argmin on (d, id); exact quadratic form scoped to
# in-cell verification at web scale (q24/q36 blocking).
# DuckDB feature req: list ops (q203 precedent).
# ---------------------------------------------------------------------------


def q233_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.similarity import hard_negatives

    emb = _tbl(spark, sf_dir, "embeddings")
    return hard_negatives(emb).orderBy("vec_id")


_Q233_SQL = """
WITH base AS (
  SELECT vec_id AS i, label AS l,
         list_transform(embedding,
                        x -> floor(x::double * 1000000)::bigint) AS qv
  FROM embeddings
  WHERE vec_id IS NOT NULL AND label IS NOT NULL AND embedding IS NOT NULL
), pairs AS (
  SELECT a.i, a.l, b.i AS ni, b.l AS nl,
         list_sum(list_transform(generate_series(1, len(a.qv)),
             j -> (a.qv[j] - b.qv[j]) * (a.qv[j] - b.qv[j])))::bigint AS d
  FROM base a JOIN base b ON a.l <> b.l
), best AS (
  SELECT i, ni, nl, d FROM (
    SELECT i, ni, nl, d,
           row_number() OVER (PARTITION BY i ORDER BY d, ni) AS rn
    FROM pairs
  ) WHERE rn = 1
)
SELECT base.i AS vec_id, base.l AS label,
       b.ni AS neg_id, b.nl AS neg_label, b.d AS sqdist
FROM base LEFT JOIN best b ON base.i = b.i
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# Q234 — token-frequency Gini (operators/textstats.token_gini): the
# canonical inequality scalar over vocabulary concentration — the one
# number that summarizes what q130's power-law fit models, computed
# WITHOUT the textbook global vocabulary rank: tied frequency blocks
# contribute v·m·(2b+m−n) exactly on the frequency-VALUE histogram
# (q45 discipline), int64 end-to-end, one final rounded division.
# DuckDB feature req: core windows.
# ---------------------------------------------------------------------------


def q234_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathhier_spark.operators.textstats import token_gini

    docs = _docs(spark, sf_dir)
    out = token_gini(docs)
    return out.select(
        "n_tokens_distinct", "total_count", _rz(F.col("gini"), 6).alias("gini")
    )


_Q234_SQL = f"""
WITH freqs AS (
  SELECT tok, count(*)::bigint AS f FROM (
    SELECT unnest({_SQL_WS_TOKS}) AS tok FROM documents
    WHERE text IS NOT NULL
  ) GROUP BY tok
), hist AS (
  SELECT f, count(*)::bigint AS m FROM freqs GROUP BY f
), tot AS (
  SELECT sum(m)::bigint AS n, sum(f * m)::bigint AS s FROM hist
), terms AS (
  SELECT f, m,
         coalesce(sum(m) OVER (ORDER BY f
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0)::bigint AS b
  FROM hist
)
SELECT tot.n AS n_tokens_distinct, tot.s AS total_count,
       CASE WHEN tot.n > 0 AND tot.s > 0 THEN
         round(sum(f * m * (2 * b + m - tot.n))::bigint::double
               / (tot.n::double * tot.s::double), 6) + 0.0
       END AS gini
FROM terms, tot
GROUP BY tot.n, tot.s
"""


def queries():
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_top_orders_per_customer": q02_top_orders_per_customer,
        "q03_customers_without_orders": q03_customers_without_orders,
        "q04_revenue_by_nation": q04_revenue_by_nation,
        "q05_channel_fusion": q05_channel_fusion,
        "q06_token_idf": q06_token_idf,
        "q07_candidate_link_parts": q07_candidate_link_parts,
        "q08_bow_link_part_names": q08_bow_link_part_names,
        "q09_dedup_exact": q09_dedup_exact,
        "q10_minhash": q10_minhash,
        "q11_neardup_pairs": q11_neardup_pairs,
        "q12_cosine_topk": q12_cosine_topk,
        "q13_label_centroids": q13_label_centroids,
        "q14_text_quality": q14_text_quality,
        "q15_lang_confusion": q15_lang_confusion,
        "q16_sessionize": q16_sessionize,
        "q17_extract_triples": q17_extract_triples,
        "q18_connected_components": q18_connected_components,
        "q19_grouped_collect": q19_grouped_collect,
        "q20_pivot_returnflag": q20_pivot_returnflag,
        "q21_token_counts": q21_token_counts,
        "q22_simhash": q22_simhash,
        "q23_fingerprint": q23_fingerprint,
        "q24_lsh_topk": q24_lsh_topk,
        "q25_media_features": q25_media_features,
        "q26_rollup_revenue": q26_rollup_revenue,
        "q27_lr_link_part_names": q27_lr_link_part_names,
        "q28_rule_tier_scores": q28_rule_tier_scores,
        "q29_pathway_pair_scores": q29_pathway_pair_scores,
        "q30_bow_embeddings": q30_bow_embeddings,
        "q31_neardup_clusters": q31_neardup_clusters,
        "q32_embedding_neardup": q32_embedding_neardup,
        "q33_fused_alignment_cells": q33_fused_alignment_cells,
        "q34_segment_dedup": q34_segment_dedup,
        "q35_training_corpus": q35_training_corpus,
        "q36_ivf_topk": q36_ivf_topk,
        "q37_pii_scrub": q37_pii_scrub,
        "q38_ngram_repetition": q38_ngram_repetition,
        "q39_boilerplate_ngrams": q39_boilerplate_ngrams,
        "q40_strip_boilerplate": q40_strip_boilerplate,
        "q41_line_dedup": q41_line_dedup,
        "q42_pii_phone_cc": q42_pii_phone_cc,
        "q43_url_dedup": q43_url_dedup,
        "q44_unigram_surprisal": q44_unigram_surprisal,
        "q45_token_percentiles": q45_token_percentiles,
        "q46_json_props": q46_json_props,
        "q47_asof_enrich": q47_asof_enrich,
        "q48_click_attribution": q48_click_attribution,
        "q49_daily_rollup": q49_daily_rollup,
        "q50_vocab_kmv": q50_vocab_kmv,
        "q51_pagerank": q51_pagerank,
        "q52_embedding_neardup_bucketed": q52_embedding_neardup_bucketed,
        "q53_domain_stats": q53_domain_stats,
        "q54_decontaminate": q54_decontaminate,
        "q55_corpus_split": q55_corpus_split,
        "q56_media_resize": q56_media_resize,
        "q57_pagerank_kg": q57_pagerank_kg,
        "q58_frame_sample": q58_frame_sample,
        "q59_mixture_sample": q59_mixture_sample,
        "q60_countmin_freqs": q60_countmin_freqs,
        "q61_bloom_membership": q61_bloom_membership,
        "q62_bpe_merges": q62_bpe_merges,
        "q63_bm25_topk": q63_bm25_topk,
        "q64_pmi_pairs": q64_pmi_pairs,
        "q65_setsim_join": q65_setsim_join,
        "q66_fuzzy_vocab": q66_fuzzy_vocab,
        "q67_triangle_count": q67_triangle_count,
        "q68_hll_distinct": q68_hll_distinct,
        "q69_strip_repeats": q69_strip_repeats,
        "q70_weighted_sample": q70_weighted_sample,
        "q71_lang_percentiles": q71_lang_percentiles,
        "q72_label_prop": q72_label_prop,
        "q73_bpe_encode": q73_bpe_encode,
        "q74_kcore": q74_kcore,
        "q75_dup_spans": q75_dup_spans,
        "q76_cohort_retention": q76_cohort_retention,
        "q77_quality_logreg": q77_quality_logreg,
        "q78_bfs_hops": q78_bfs_hops,
        "q79_dsir_select": q79_dsir_select,
        "q80_semantic_dedup": q80_semantic_dedup,
        "q81_assoc_rules": q81_assoc_rules,
        "q82_hll_grouped": q82_hll_grouped,
        "q83_pack_sequences": q83_pack_sequences,
        "q84_hits": q84_hits,
        "q85_containment_join": q85_containment_join,
        "q86_ctfidf_terms": q86_ctfidf_terms,
        "q87_curation_funnel": q87_curation_funnel,
        "q88_anchor_graph": q88_anchor_graph,
        "q89_event_transitions": q89_event_transitions,
        "q90_chunk_overlap": q90_chunk_overlap,
        "q91_profile_orders": q91_profile_orders,
        "q92_bigram_surprisal": q92_bigram_surprisal,
        "q93_rrf_fusion": q93_rrf_fusion,
        "q94_predicate_profile": q94_predicate_profile,
        "q95_local_clustering": q95_local_clustering,
        "q96_random_walks": q96_random_walks,
        "q97_sliding_window": q97_sliding_window,
        "q98_neighbor_agg": q98_neighbor_agg,
        "q99_link_predict": q99_link_predict,
        "q100_subsumption_closure": q100_subsumption_closure,
        "q101_jl_distortion": q101_jl_distortion,
        "q102_dist_drift": q102_dist_drift,
        "q103_phrase_search": q103_phrase_search,
        "q104_source_chisq": q104_source_chisq,
        "q105_lang_kappa": q105_lang_kappa,
        "q106_vocab_coverage": q106_vocab_coverage,
        "q107_mutual_best": q107_mutual_best,
        "q108_reciprocity": q108_reciprocity,
        "q109_kwic": q109_kwic,
        "q110_assortativity": q110_assortativity,
        "q111_redirect_resolve": q111_redirect_resolve,
        "q112_trustrank": q112_trustrank,
        "q113_cocitation": q113_cocitation,
        "q114_heaps_curve": q114_heaps_curve,
        "q115_neighborhood": q115_neighborhood,
        "q116_component_sizes": q116_component_sizes,
        "q117_gapfill": q117_gapfill,
        "q118_quantile_bins": q118_quantile_bins,
        "q119_epoch_shuffle": q119_epoch_shuffle,
        "q120_skew_probe": q120_skew_probe,
        "q121_metapaths": q121_metapaths,
        "q122_negative_samples": q122_negative_samples,
        "q123_change_intervals": q123_change_intervals,
        "q124_frontier_schedule": q124_frontier_schedule,
        "q125_cross_neardup": q125_cross_neardup,
        "q126_retrieval_eval": q126_retrieval_eval,
        "q127_inverted_index": q127_inverted_index,
        "q128_typed_mentions": q128_typed_mentions,
        "q129_url_filter": q129_url_filter,
        "q130_powerlaw": q130_powerlaw,
        "q131_keep_best": q131_keep_best,
        "q132_neyman_alloc": q132_neyman_alloc,
        "q133_modularity": q133_modularity,
        "q134_rate_anomalies": q134_rate_anomalies,
        "q135_blocking_quality": q135_blocking_quality,
        "q136_conflict_resolution": q136_conflict_resolution,
        "q137_split_leakage": q137_split_leakage,
        "q138_kg_integrity": q138_kg_integrity,
        "q139_source_diversity": q139_source_diversity,
        "q140_textrank": q140_textrank,
        "q141_harmonic_centrality": q141_harmonic_centrality,
        "q142_ontology_lca": q142_ontology_lca,
        "q143_template_concentration": q143_template_concentration,
        "q144_temperature_alloc": q144_temperature_alloc,
        "q145_ktruss": q145_ktruss,
        "q146_fertility": q146_fertility,
        "q147_diameter": q147_diameter,
        "q148_good_turing": q148_good_turing,
        "q149_snake_shards": q149_snake_shards,
        "q150_adamic_adar": q150_adamic_adar,
        "q151_burstiness": q151_burstiness,
        "q152_minhash_calibration": q152_minhash_calibration,
        "q153_simrank": q153_simrank,
        "q154_embedding_profile": q154_embedding_profile,
        "q155_char_entropy": q155_char_entropy,
        "q156_anchor_text_dict": q156_anchor_text_dict,
        "q157_scc": q157_scc,
        "q158_rouge_eval": q158_rouge_eval,
        "q159_trigram_backoff": q159_trigram_backoff,
        "q160_dict_augment": q160_dict_augment,
        "q161_dag_layers": q161_dag_layers,
        "q162_cluster_safe_splits": q162_cluster_safe_splits,
        "q163_msf": q163_msf,
        "q164_funnel": q164_funnel,
        "q165_hll_intersection": q165_hll_intersection,
        "q166_mad_outliers": q166_mad_outliers,
        "q167_bowtie": q167_bowtie,
        "q168_er_funnel": q168_er_funnel,
        "q169_frequent_sequences": q169_frequent_sequences,
        "q170_text_tiling": q170_text_tiling,
        "q171_winnowing": q171_winnowing,
        "q172_pr_curve": q172_pr_curve,
        "q173_betweenness": q173_betweenness,
        "q174_auc": q174_auc,
        "q175_kcenter": q175_kcenter,
        "q176_rendezvous": q176_rendezvous,
        "q177_volume_trend": q177_volume_trend,
        "q178_cheapest_paths": q178_cheapest_paths,
        "q179_wasserstein": q179_wasserstein,
        "q180_signal_corr": q180_signal_corr,
        "q181_mutual_info": q181_mutual_info,
        "q182_calibration": q182_calibration,
        "q183_quantile_norm": q183_quantile_norm,
        "q184_join_estimate": q184_join_estimate,
        "q185_cc_incremental": q185_cc_incremental,
        "q186_set_cover": q186_set_cover,
        "q187_readability": q187_readability,
        "q188_edge_betweenness": q188_edge_betweenness,
        "q189_spearman": q189_spearman,
        "q190_jackknife": q190_jackknife,
        "q191_wl_fingerprint": q191_wl_fingerprint,
        "q192_kneser_ney": q192_kneser_ney,
        "q193_ks_drift": q193_ks_drift,
        "q194_dirichlet_ql": q194_dirichlet_ql,
        "q195_pareto_frontier": q195_pareto_frontier,
        "q196_butterflies": q196_butterflies,
        "q197_interval_coverage": q197_interval_coverage,
        "q198_katz": q198_katz,
        "q199_allen_census": q199_allen_census,
        "q200_decayed_engagement": q200_decayed_engagement,
        "q201_kaplan_meier": q201_kaplan_meier,
        "q202_g2_collocations": q202_g2_collocations,
        "q203_label_medoids": q203_label_medoids,
        "q204_kendall_tau": q204_kendall_tau,
        "q205_pairwise_bleu": q205_pairwise_bleu,
        "q206_cusum": q206_cusum,
        "q207_dbscan": q207_dbscan,
        "q208_nb_confusion": q208_nb_confusion,
        "q209_holt_forecast": q209_holt_forecast,
        "q210_theil_sen": q210_theil_sen,
        "q211_mine_abbreviations": q211_mine_abbreviations,
        "q212_sse_split": q212_sse_split,
        "q213_constraints": q213_constraints,
        "q214_markov_attribution": q214_markov_attribution,
        "q215_proximity_search": q215_proximity_search,
        "q216_burrows_delta": q216_burrows_delta,
        "q217_hearst_hypernyms": q217_hearst_hypernyms,
        "q218_html_tables": q218_html_tables,
        "q219_cdc_chunks": q219_cdc_chunks,
        "q220_k_anonymity": q220_k_anonymity,
        "q221_shapley_attribution": q221_shapley_attribution,
        "q222_benford": q222_benford,
        "q223_maximal_matching": q223_maximal_matching,
        "q224_rake_keyphrases": q224_rake_keyphrases,
        "q225_v_optimal": q225_v_optimal,
        "q226_prf_bm25": q226_prf_bm25,
        "q227_seasonal_decompose": q227_seasonal_decompose,
        "q228_priority_sample": q228_priority_sample,
        "q229_pla_segments": q229_pla_segments,
        "q230_densest_subgraph": q230_densest_subgraph,
        "q231_symspell": q231_symspell,
        "q232_fd_repair": q232_fd_repair,
        "q233_hard_negatives": q233_hard_negatives,
        "q234_token_gini": q234_token_gini,
    }


def oracle_sql():
    return {
        "q01_pricing_summary": Q01_SQL,
        "q02_top_orders_per_customer": Q02_SQL,
        "q03_customers_without_orders": Q03_SQL,
        "q04_revenue_by_nation": Q04_SQL,
        "q05_channel_fusion": Q05_SQL,
        "q06_token_idf": _q06_sql(),
        "q07_candidate_link_parts": _q07_sql(),
        "q08_bow_link_part_names": _q08_sql(),
        "q09_dedup_exact": Q09_SQL,
        "q10_minhash": _q10_sql(),
        "q11_neardup_pairs": _q11_sql(),
        "q12_cosine_topk": Q12_SQL,
        "q13_label_centroids": Q13_SQL,
        "q14_text_quality": _q14_sql(),
        "q15_lang_confusion": _q15_sql(),
        "q16_sessionize": Q16_SQL,
        "q17_extract_triples": _q17_sql(),
        "q18_connected_components": Q18_SQL,
        "q19_grouped_collect": Q19_SQL,
        "q20_pivot_returnflag": Q20_SQL,
        "q21_token_counts": Q21_SQL,
        "q22_simhash": _q22_sql(),
        "q23_fingerprint": _q23_sql(),
        "q24_lsh_topk": _q24_sql(),
        "q25_media_features": Q25_SQL,
        "q26_rollup_revenue": Q26_SQL,
        "q27_lr_link_part_names": _q27_sql(),
        "q28_rule_tier_scores": _q28_sql(),
        "q29_pathway_pair_scores": _q29_sql(),
        "q30_bow_embeddings": _q30_sql(),
        "q31_neardup_clusters": _q31_sql(),
        "q32_embedding_neardup": Q32_SQL,
        "q33_fused_alignment_cells": _q33_sql(),
        "q34_segment_dedup": _q34_sql(),
        "q35_training_corpus": _q35_sql(),
        "q36_ivf_topk": _q36_sql(),
        "q37_pii_scrub": _q37_sql(),
        "q38_ngram_repetition": _q38_sql(),
        "q39_boilerplate_ngrams": _q39_sql(),
        "q40_strip_boilerplate": _q40_sql(),
        "q41_line_dedup": _q41_sql(),
        "q42_pii_phone_cc": _q42_sql(),
        "q43_url_dedup": _q43_sql(),
        "q44_unigram_surprisal": _q44_sql(),
        "q45_token_percentiles": _q45_sql(),
        "q46_json_props": Q46_SQL,
        "q47_asof_enrich": Q47_SQL,
        "q48_click_attribution": Q48_SQL,
        "q49_daily_rollup": Q49_SQL,
        "q50_vocab_kmv": _q50_sql(),
        "q51_pagerank": _q51_sql(),
        "q52_embedding_neardup_bucketed": _q52_sql(),
        "q53_domain_stats": _q53_sql(),
        "q54_decontaminate": _q54_sql(),
        "q55_corpus_split": _q55_sql(),
        "q56_media_resize": _q56_sql(),
        "q57_pagerank_kg": _q57_sql(),
        "q58_frame_sample": _q58_sql(),
        "q59_mixture_sample": _q59_sql(),
        "q60_countmin_freqs": _q60_sql(),
        "q61_bloom_membership": _q61_sql(),
        "q62_bpe_merges": _q62_sql(),
        "q63_bm25_topk": _q63_sql(),
        "q64_pmi_pairs": _q64_sql(),
        "q65_setsim_join": _q65_sql(),
        "q66_fuzzy_vocab": _q66_sql(),
        "q67_triangle_count": _q67_sql(),
        "q68_hll_distinct": _q68_sql(),
        "q69_strip_repeats": _q69_sql(),
        "q70_weighted_sample": _q70_sql(),
        "q71_lang_percentiles": _q71_sql(),
        "q72_label_prop": _q72_sql(),
        "q73_bpe_encode": _q73_sql(),
        "q74_kcore": _q74_sql(),
        "q75_dup_spans": _q75_sql(),
        "q76_cohort_retention": _q76_sql(),
        "q77_quality_logreg": _q77_sql(),
        "q78_bfs_hops": _q78_sql(),
        "q79_dsir_select": _q79_sql(),
        "q80_semantic_dedup": _q80_sql(),
        "q81_assoc_rules": _q81_sql(),
        "q82_hll_grouped": _q82_sql(),
        "q83_pack_sequences": _q83_sql(),
        "q84_hits": _q84_sql(),
        "q85_containment_join": _q85_sql(),
        "q86_ctfidf_terms": _q86_sql(),
        "q87_curation_funnel": _q87_sql(),
        "q88_anchor_graph": _q88_sql(),
        "q89_event_transitions": Q89_SQL,
        "q90_chunk_overlap": _q90_sql(),
        "q91_profile_orders": _q91_sql(),
        "q92_bigram_surprisal": _q92_sql(),
        "q93_rrf_fusion": _q93_sql(),
        "q94_predicate_profile": _q94_sql(),
        "q95_local_clustering": _q95_sql(),
        "q96_random_walks": _q96_sql(),
        "q97_sliding_window": _q97_sql(),
        "q98_neighbor_agg": _q98_sql(),
        "q99_link_predict": _q99_sql(),
        "q100_subsumption_closure": _q100_sql(),
        "q101_jl_distortion": _q101_sql(),
        "q102_dist_drift": Q102_SQL,
        "q103_phrase_search": Q103_SQL,
        "q104_source_chisq": Q104_SQL,
        "q105_lang_kappa": _q105_sql(),
        "q106_vocab_coverage": Q106_SQL,
        "q107_mutual_best": _q107_sql(),
        "q108_reciprocity": _q108_sql(),
        "q109_kwic": Q109_SQL,
        "q110_assortativity": _q110_sql(),
        "q111_redirect_resolve": Q111_SQL,
        "q112_trustrank": _q112_sql(),
        "q113_cocitation": _q113_sql(),
        "q114_heaps_curve": Q114_SQL,
        "q115_neighborhood": _q115_sql(),
        "q116_component_sizes": _q116_sql(),
        "q117_gapfill": Q117_SQL,
        "q118_quantile_bins": _q118_sql(),
        "q119_epoch_shuffle": _q119_sql(),
        "q120_skew_probe": Q120_SQL,
        "q121_metapaths": _q121_sql(),
        "q122_negative_samples": _q122_sql(),
        "q123_change_intervals": Q123_SQL,
        "q124_frontier_schedule": _q124_sql(),
        "q125_cross_neardup": _q125_sql(),
        "q126_retrieval_eval": _q126_sql(),
        "q127_inverted_index": Q127_SQL,
        "q128_typed_mentions": Q128_SQL,
        "q129_url_filter": Q129_SQL,
        "q130_powerlaw": _q130_sql(),
        "q131_keep_best": _q131_sql(),
        "q132_neyman_alloc": Q132_SQL,
        "q133_modularity": _q133_sql(),
        "q134_rate_anomalies": Q134_SQL,
        "q135_blocking_quality": _q135_sql(),
        "q136_conflict_resolution": _q136_sql(),
        "q137_split_leakage": _q137_sql(),
        "q138_kg_integrity": _q138_sql(),
        "q139_source_diversity": Q139_SQL,
        "q140_textrank": _q140_sql(),
        "q141_harmonic_centrality": _q141_sql(),
        "q142_ontology_lca": _q142_sql(),
        "q143_template_concentration": _q143_sql(),
        "q144_temperature_alloc": _q144_sql(),
        "q145_ktruss": _q145_sql(),
        "q146_fertility": _q146_sql(),
        "q147_diameter": _q147_sql(),
        "q148_good_turing": _q148_sql(),
        "q149_snake_shards": _q149_sql(),
        "q150_adamic_adar": _q150_sql(),
        "q151_burstiness": _q151_sql(),
        "q152_minhash_calibration": _q152_sql(),
        "q153_simrank": _q153_sql(),
        "q154_embedding_profile": _Q154_SQL,
        "q155_char_entropy": _Q155_SQL,
        "q156_anchor_text_dict": _q156_sql(),
        "q157_scc": _Q157_SQL,
        "q158_rouge_eval": _q158_sql(),
        "q159_trigram_backoff": _q159_sql(),
        "q160_dict_augment": _Q160_SQL,
        "q161_dag_layers": _Q161_SQL,
        "q162_cluster_safe_splits": _q162_sql(),
        "q163_msf": _q163_sql(),
        "q164_funnel": _q164_sql(),
        "q165_hll_intersection": _q165_sql(),
        "q166_mad_outliers": _Q166_SQL,
        "q167_bowtie": _q167_sql(),
        "q168_er_funnel": _Q168_SQL,
        "q169_frequent_sequences": _Q169_SQL,
        "q170_text_tiling": _Q170_SQL,
        "q171_winnowing": _Q171_SQL,
        "q172_pr_curve": _Q172_SQL,
        "q173_betweenness": _q173_sql(),
        "q174_auc": _Q174_SQL,
        "q175_kcenter": _q175_sql(),
        "q176_rendezvous": _Q176_SQL,
        "q177_volume_trend": _Q177_SQL,
        "q178_cheapest_paths": _q178_sql(),
        "q179_wasserstein": _Q179_SQL,
        "q180_signal_corr": _q180_sql(),
        "q181_mutual_info": _Q181_SQL,
        "q182_calibration": _Q182_SQL,
        "q183_quantile_norm": _Q183_SQL,
        "q184_join_estimate": _q184_sql(),
        "q185_cc_incremental": _Q185_SQL,
        "q186_set_cover": _q186_sql(),
        "q187_readability": _Q187_SQL,
        "q188_edge_betweenness": _q188_sql(),
        "q189_spearman": _Q189_SQL,
        "q190_jackknife": _q190_sql(),
        "q191_wl_fingerprint": _q191_sql(),
        "q192_kneser_ney": _Q192_SQL,
        "q193_ks_drift": _Q193_SQL,
        "q194_dirichlet_ql": _Q194_SQL,
        "q195_pareto_frontier": _Q195_SQL,
        "q196_butterflies": _Q196_SQL,
        "q197_interval_coverage": _Q197_SQL,
        "q198_katz": _q198_sql(),
        "q199_allen_census": _Q199_SQL,
        "q200_decayed_engagement": _Q200_SQL,
        "q201_kaplan_meier": _Q201_SQL,
        "q202_g2_collocations": _q202_sql(),
        "q203_label_medoids": _Q203_SQL,
        "q204_kendall_tau": _Q204_SQL,
        "q205_pairwise_bleu": _Q205_SQL,
        "q206_cusum": _Q206_SQL,
        "q207_dbscan": _q207_sql(),
        "q208_nb_confusion": _q208_sql(),
        "q209_holt_forecast": _Q209_SQL,
        "q210_theil_sen": _Q210_SQL,
        "q211_mine_abbreviations": _q211_sql(),
        "q212_sse_split": _Q212_SQL,
        "q213_constraints": _q213_sql(),
        "q214_markov_attribution": _q214_sql(),
        "q215_proximity_search": _q215_sql(),
        "q216_burrows_delta": _q216_sql(),
        "q217_hearst_hypernyms": _q217_sql(),
        "q218_html_tables": _Q218_SQL,
        "q219_cdc_chunks": _q219_sql(),
        "q220_k_anonymity": _Q220_SQL,
        "q221_shapley_attribution": _q221_sql(),
        "q222_benford": _Q222_SQL,
        "q223_maximal_matching": _q223_sql(),
        "q224_rake_keyphrases": _q224_sql(),
        "q225_v_optimal": _q225_sql(),
        "q226_prf_bm25": _q226_sql(),
        "q227_seasonal_decompose": _Q227_SQL,
        "q228_priority_sample": _q228_sql(),
        "q229_pla_segments": _q229_sql(),
        "q230_densest_subgraph": _q230_sql(),
        "q231_symspell": _q231_sql(),
        "q232_fd_repair": _Q232_SQL,
        "q233_hard_negatives": _Q233_SQL,
        "q234_token_gini": _Q234_SQL,
    }
