"""Training-data pipeline operators over engine-decoded tables.

Each op runs on the OUTPUT of the engine scan (encode -> prune -> decode),
so the correctness gate simultaneously re-checks round-trip identity and
the op itself against a raw-parquet DuckDB oracle. All ops are pure
Spark SQL / built-in functions — JVM-side, whole-stage-codegen, zero
Python in the row path (the north rule's "no per-row Python" applies to
these first-class pipeline components too).

Dual-dialect SQL: one template per op, rendered for Spark and for DuckDB.
Differences are confined to the _DIALECT table (size/len, split/
string_split, global-flag regexp_replace, inclusive sequence).

Ops (the large-scale training-pipeline set):
  text_token_count      whitespace token counting
  text_quality          length / punctuation / stopword-ratio scoring
  text_lang_guess       stopword-list n-gram language heuristic
  text_fingerprint      normalized-content rolling fingerprint (md5)
  dedup_exact           exact dedup via content-hash groupBy
  dedup_ngram_jaccard   3-gram shingle Jaccard near-dup pairs
  dedup_minhash_lsh     minhash (md5-salted) + banded LSH candidate pairs
  dedup_simhash         16-bit simhash clusters (Spark-only, rows-only gate)
  ann_dot_topk          brute-force inner-product top-k neighbors
  ann_lsh_buckets       random-hyperplane LSH bucketing (Spark-only)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

STOP = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "und", "das", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "une"),
    "es": ("el", "los", "y", "en", "que", "una"),
}


def _in_list(vals) -> str:
    return ", ".join(f"'{v}'" for v in vals)


_DIALECTS = {
    "spark": {
        "SIZE": "size",
        "SPLIT": lambda c, sep: f"split({c}, '{sep}')",
        "RE_ALL": lambda c, pat, rep: f"regexp_replace({c}, '{pat}', '{rep}')",
        "SEQ1": lambda n: f"CASE WHEN ({n}) < 1 THEN array() ELSE sequence(1, {n}) END",
        "AT": lambda arr, i: f"element_at({arr}, {i})",
        "DOUBLE_ARR": lambda c: f"transform({c}, x -> CAST(x AS DOUBLE))",
        "DOT": lambda a, b: f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)",
    },
    "duckdb": {
        "SIZE": "len",
        "SPLIT": lambda c, sep: f"string_split({c}, '{sep}')",
        "RE_ALL": lambda c, pat, rep: f"regexp_replace({c}, '{pat}', '{rep}', 'g')",
        "SEQ1": lambda n: f"range(1, greatest(({n}), 0) + 1)",
        "AT": lambda arr, i: f"list_extract({arr}, {i})",
        "DOUBLE_ARR": lambda c: f"CAST({c} AS DOUBLE[])",
        "DOT": lambda a, b: f"list_dot_product({a}, {b})",
    },
}


def _render(template, dialect: str) -> str:
    return template(_DIALECTS[dialect])


# --------------------------------------------------------------------------
# templates: functions dialect-dict -> SQL over view `documents`/`embeddings`
# --------------------------------------------------------------------------


def _t_token_count(d) -> str:
    words = d["SPLIT"]("text", " ")
    return f"SELECT doc_id, {d['SIZE']}({words}) AS n_words FROM documents"


def _t_quality(d) -> str:
    words = d["SPLIT"]("text", " ")
    nopunct = d["RE_ALL"]("text", "[.,!?;:]", "")
    stops = _in_list(sorted(set().union(*STOP.values())))
    return f"""
SELECT doc_id,
       {d['SIZE']}({words}) AS n_words,
       length(text) - length({nopunct}) AS n_punct,
       CAST(length(text) - length({nopunct}) AS DOUBLE)
         / CAST(length(text) AS DOUBLE) AS punct_ratio,
       CAST({d['SIZE']}(filter({words}, w -> w IN ({stops}))) AS DOUBLE)
         / CAST({d['SIZE']}({words}) AS DOUBLE) AS stop_ratio,
       CAST(n_chars AS DOUBLE) / CAST({d['SIZE']}({words}) AS DOUBLE)
         AS avg_word_len
FROM documents
"""


def _t_lang_guess(d) -> str:
    words = d["SPLIT"]("text", " ")
    hits = {
        lang: f"{d['SIZE']}(filter({words}, w -> w IN ({_in_list(sw)})))"
        for lang, sw in STOP.items()
    }
    return f"""
SELECT doc_id, lang,
  CASE
    WHEN {hits['en']} >= {hits['de']} AND {hits['en']} >= {hits['fr']}
     AND {hits['en']} >= {hits['es']} AND {hits['en']} > 0 THEN 'en'
    WHEN {hits['de']} >= {hits['fr']} AND {hits['de']} >= {hits['es']}
     AND {hits['de']} > 0 THEN 'de'
    WHEN {hits['fr']} >= {hits['es']} AND {hits['fr']} > 0 THEN 'fr'
    WHEN {hits['es']} > 0 THEN 'es'
    ELSE 'other'
  END AS lang_guess
FROM documents
"""


def _t_fingerprint(d) -> str:
    norm = d["RE_ALL"]("lower(text)", "\\\\s+", " ")
    return f"SELECT doc_id, md5({norm}) AS fingerprint FROM documents"


def _t_dedup_exact(d) -> str:
    norm = d["RE_ALL"]("lower(text)", "\\\\s+", " ")
    return f"""
SELECT fingerprint, count(*) AS n_copies, min(doc_id) AS keeper_doc_id
FROM (SELECT doc_id, md5({norm}) AS fingerprint FROM documents) t
GROUP BY fingerprint
"""


def _shingle_select(d, dialect_name: str) -> str:
    """SELECT doc_id, shingle (3-word shingles, with duplicates)."""
    words = d["SPLIT"]("text", " ")
    n = f"{d['SIZE']}({words}) - 2"
    idx = d["SEQ1"](n)
    sh_expr = (
        f"concat_ws(' ', {d['AT']('w', 'i')}, {d['AT']('w', 'i + 1')}, "
        f"{d['AT']('w', 'i + 2')})"
    )
    if dialect_name == "spark":
        return f"""
SELECT doc_id, shingle FROM (
  SELECT doc_id, {words} AS w, {idx} AS ii FROM documents
) LATERAL VIEW explode(transform(ii, i -> {sh_expr})) AS shingle"""
    return f"""
SELECT doc_id, {sh_expr} AS shingle FROM (
  SELECT doc_id, {words} AS w, unnest({idx}) AS i FROM documents
) t"""


def _t_ngram_jaccard(d, dialect_name: str) -> str:
    explode = _shingle_select(d, dialect_name)
    return f"""
WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({explode}) raw),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE)
         AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.12
"""


_MINHASH_H = 6
_BANDS = 3  # rows-per-band = 2


def _t_minhash_lsh(d, dialect_name: str) -> str:
    explode_cte = (
        f"SELECT DISTINCT doc_id, shingle FROM ({_shingle_select(d, dialect_name)}) raw"
    )
    mins = ", ".join(
        f"min(md5(shingle || '#{i}')) AS h{i}" for i in range(_MINHASH_H)
    )
    band_keys = []
    for b in range(_BANDS):
        cols = " || ':' || ".join(f"h{b * 2 + j}" for j in range(2))
        band_keys.append(f"SELECT doc_id, {b} AS band, {cols} AS bkey FROM sig")
    bands_sql = " UNION ALL ".join(band_keys)
    return f"""
WITH sh AS ({explode_cte}),
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS ({bands_sql})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
"""


def _t_ann_dot_topk(d) -> str:
    qe = d["DOUBLE_ARR"]("q.embedding")
    ce = d["DOUBLE_ARR"]("c.embedding")
    dot = d["DOT"]("qe2", "ce2")
    return f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {qe} AS qe2, {ce} AS ce2
  FROM embeddings q JOIN embeddings c ON q.vec_id < 4 AND c.vec_id <> q.vec_id
),
scored AS (
  SELECT query_id, neighbor_id, {dot} AS score FROM pairs
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, rnk FROM ranked WHERE rnk <= 5
"""


# --------------------------------------------------------------------------
# Spark-only ops (rows-only correctness gate)
# --------------------------------------------------------------------------


def simhash_clusters(spark: SparkSession) -> DataFrame:
    """16-bit simhash per document from 3-gram shingles (xxhash64 bit
    majority), grouped into clusters — classic near-dup bucketing.
    Built-ins only: explode -> bit tests -> signed sums -> bit reassembly."""
    return spark.sql(
        """
WITH sh AS (
  SELECT doc_id, shingle, xxhash64(shingle) AS h FROM (
    SELECT doc_id, explode(transform(
      CASE WHEN size(split(text,' ')) - 2 < 1 THEN array()
           ELSE sequence(1, size(split(text,' ')) - 2) END,
      i -> concat_ws(' ', element_at(split(text,' '), i),
                     element_at(split(text,' '), i + 1),
                     element_at(split(text,' '), i + 2)))) AS shingle
    FROM documents) raw
),
bits AS (
  SELECT doc_id,
    """
        + ",\n    ".join(
            f"sum(CASE WHEN (shiftright(h, {i}) & 1) = 1 THEN 1 ELSE -1 END) AS b{i}"
            for i in range(16)
        )
        + """
  FROM sh GROUP BY doc_id
),
sig AS (
  SELECT doc_id, """
        + " + ".join(f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16))
        + """ AS simhash
  FROM bits
)
SELECT simhash, count(*) AS n_docs, min(doc_id) AS keeper_doc_id,
       collect_list(doc_id) AS doc_ids
FROM sig GROUP BY simhash HAVING count(*) >= 1
"""
    ).selectExpr("simhash", "n_docs", "keeper_doc_id", "sort_array(doc_ids) AS doc_ids")


def ann_lsh_buckets(spark: SparkSession, n_planes: int = 8, dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH over embeddings: bucket id = sign-bit string of
    dot products against seeded deterministic hyperplanes (the IVF/LSH scale
    path next to brute force). Planes are literal arrays — pure JVM math."""
    import numpy as np

    rng = np.random.default_rng(1234)
    planes = rng.standard_normal((n_planes, dim))
    bits = []
    for p, plane in enumerate(planes):
        arr = "array(" + ", ".join(f"{x:.6f}D" for x in plane) + ")"
        bits.append(
            f"(CASE WHEN aggregate(zip_with(transform(embedding, x -> CAST(x AS DOUBLE)), {arr}, (x, y) -> x * y), 0.0D, (a, v) -> a + v) > 0 THEN {1 << p} ELSE 0 END)"
        )
    bucket = " + ".join(bits)
    return spark.sql(
        f"""
SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
FROM (SELECT vec_id, {bucket} AS bucket FROM embeddings) t
GROUP BY bucket
"""
    )


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------


def _sql_op(template, needs_dialect_name: bool = False):
    def spark_sql(dialect="spark"):
        return (
            template(_DIALECTS[dialect], dialect)
            if needs_dialect_name
            else template(_DIALECTS[dialect])
        )

    return spark_sql


# name -> (view, spark_sql_fn, duck_sql or None, spark_only_fn or None)
DATAOPS: dict[str, tuple] = {
    "text_token_count": ("documents", _sql_op(_t_token_count), True, None),
    "text_quality": ("documents", _sql_op(_t_quality), True, None),
    "text_lang_guess": ("documents", _sql_op(_t_lang_guess), True, None),
    "text_fingerprint": ("documents", _sql_op(_t_fingerprint), True, None),
    "dedup_exact": ("documents", _sql_op(_t_dedup_exact), True, None),
    "dedup_ngram_jaccard": (
        "documents", _sql_op(_t_ngram_jaccard, True), True, None,
    ),
    "dedup_minhash_lsh": (
        "documents", _sql_op(_t_minhash_lsh, True), True, None,
    ),
    "dedup_simhash": ("documents", None, False, simhash_clusters),
    "ann_dot_topk": ("embeddings", _sql_op(_t_ann_dot_topk), True, None),
    "ann_lsh_buckets": ("embeddings", None, False, ann_lsh_buckets),
}
