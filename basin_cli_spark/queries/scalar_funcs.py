"""Scalar function families (SURVEY.md §2.B "Scalar functions").

One query per family (string / datetime / math / array / JSON / hash /
conditional), each exercising several functions with DuckDB-identical
semantics.  Libm-dependent functions (exp/log) are rounded to 9 decimals on
both sides; everything else is exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from basin_cli_spark.queries import register
from basin_cli_spark.sources import load_table


@register(
    "q_string_funcs",
    """
SELECT doc_id,
       UPPER(lang) AS lang_up,
       LOWER(source) AS source_lo,
       LENGTH(text) AS text_len,
       SUBSTRING(text, 1, 20) AS prefix,
       CONCAT(lang, ':', source) AS lang_source,
       TRIM(CONCAT(' ', lang, ' ')) AS trimmed,
       LPAD(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
       REPLACE(source, 'src', 'source_') AS source_renamed,
       LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
       REGEXP_REPLACE(text, '[aeiou]', '_', 'g') AS devoweled_20,
       CONTAINS(text, 'spark') AS has_spark,
       STRPOS(text, 'data') AS data_pos
FROM documents
WHERE doc_id < 100
""",
)
def q_string_funcs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_up"),
        F.lower("source").alias("source_lo"),
        F.length("text").cast("long").alias("text_len"),
        F.substring("text", 1, 20).alias("prefix"),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("lang_source"),
        F.trim(F.concat(F.lit(" "), F.col("lang"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.replace(F.col("source"), F.lit("src"), F.lit("source_")).alias("source_renamed"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled_20"),
        F.col("text").contains("spark").alias("has_spark"),
        F.instr("text", "data").cast("long").alias("data_pos"),
    )


@register(
    "q_fuzzy_prefix_match",
    """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(SUBSTRING(a.text, 1, 30), SUBSTRING(b.text, 1, 30)) AS edit_dist
FROM documents a JOIN documents b
  ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE a.doc_id < 100 AND b.doc_id < 100
  AND levenshtein(SUBSTRING(a.text, 1, 30), SUBSTRING(b.text, 1, 30)) <= 15
""",
)
def q_fuzzy_prefix_match(spark, sf_dir):
    """Fuzzy matching by edit distance with language BLOCKING: the
    self-join is keyed on lang (a real fuzzy-match pipeline always blocks
    — levenshtein over unblocked corpus^2 is not a plan), then the
    JVM-builtin levenshtein filters 30-char prefixes.  Both engines
    implement standard Levenshtein, so distances agree exactly."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    a = d.select(F.col("doc_id").alias("doc_a"), "lang",
                 F.substring("text", 1, 30).alias("p_a"))
    b = d.select(F.col("doc_id").alias("doc_b"),
                 F.col("lang").alias("lang_b"),
                 F.substring("text", 1, 30).alias("p_b"))
    dist = F.levenshtein("p_a", "p_b")
    return (
        a.join(b, (F.col("lang") == F.col("lang_b"))
               & (F.col("doc_a") < F.col("doc_b")))
        .where(dist <= 15)
        .select("doc_a", "doc_b", dist.cast("long").alias("edit_dist"))
    )


@register(
    "q_datetime_funcs",
    """
SELECT event_id,
       CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day_start,
       CAST(DATE_TRUNC('month', ts) AS TIMESTAMP) AS month_start,
       YEAR(ts) AS y, MONTH(ts) AS mo, DAY(ts) AS d,
       HOUR(ts) AS h, MINUTE(ts) AS mi, SECOND(ts) AS s,
       CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
       CAST(CAST(ts AS DATE) + 7 AS VARCHAR) AS week_later,
       DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since_jan1
FROM events
WHERE user_id < 30
""",
)
def q_datetime_funcs(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    return ev.select(
        "event_id",
        F.date_trunc("day", "ts").alias("day_start"),
        F.date_trunc("month", "ts").alias("month_start"),
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("mo"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.minute("ts").cast("long").alias("mi"),
        F.second("ts").cast("long").alias("s"),
        # dates surface as ISO strings: engines/pandas disagree on whether a
        # DATE cell is a date object or a midnight datetime64, strings don't.
        F.to_date("ts").cast("string").alias("event_date"),
        F.date_add(F.to_date("ts"), 7).cast("string").alias("week_later"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("days_since_jan1"),
    )


@register(
    "q_math_funcs",
    """
SELECT l_orderkey, l_linenumber,
       ABS(l_discount - 0.05) AS abs_diff,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
       SQRT(l_quantity) AS qty_sqrt,
       POWER(l_quantity, 2) AS qty_sq,
       l_orderkey % 7 AS key_mod,
       CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       ROUND(EXP(l_discount), 9) AS exp_disc,
       ROUND(LN(l_quantity), 9) AS ln_qty,
       GREATEST(l_quantity, 25.0) AS qty_hi,
       LEAST(l_quantity, 25.0) AS qty_lo
FROM lineitem
WHERE l_orderkey < 600
""",
)
def q_math_funcs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 600)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_diff"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.pow("l_quantity", 2).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.round(F.exp("l_discount"), 9).alias("exp_disc"),
        F.round(F.log("l_quantity"), 9).alias("ln_qty"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_hi"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_lo"),
    )


@register(
    "q_array_funcs",
    """
SELECT doc_id,
       ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(LOWER(text), ' '))), ',') AS vocab,
       LEN(LIST_DISTINCT(STRING_SPLIT(LOWER(text), ' '))) AS vocab_size,
       LIST_CONTAINS(STRING_SPLIT(LOWER(text), ' '), 'spark') AS has_spark,
       STRING_SPLIT(LOWER(text), ' ')[1] AS first_token,
       LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), t -> LENGTH(t) > 4)) AS n_long_tokens
FROM documents
WHERE doc_id < 100
""",
)
def q_array_funcs(spark, sf_dir):
    """Array ops + higher-order functions over tokenized text.  Mirrors the
    reference's 1-D array support (reference internal/app/type_converter.go:260-285)
    on the analytics surface."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = F.split(F.lower("text"), " ")
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(toks)), ",").alias("vocab"),
        F.size(F.array_distinct(toks)).cast("long").alias("vocab_size"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(toks, 1).alias("first_token"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4))
        .cast("long")
        .alias("n_long_tokens"),
    )


@register(
    "q_array_hof_fold",
    """
SELECT vec_id,
       LIST_REDUCE(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)), (a, b) -> a + b) AS vec_sum,
       LIST_REDUCE(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) AS norm_sq,
       LEN(embedding) AS dim,
       CAST(LIST_MAX(embedding) AS DOUBLE) AS vec_max,
       CAST(LIST_MIN(embedding) AS DOUBLE) AS vec_min
FROM embeddings
WHERE vec_id < 100
""",
)
def q_array_hof_fold(spark, sf_dir):
    """Sequential left-fold over arrays: Spark F.aggregate and DuckDB
    list_reduce apply additions in identical order, so double results are
    bit-equal (float32 elements are widened exactly to double first)."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    as_dbl = F.transform("embedding", lambda x: x.cast("double"))
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, b: a + b)  # noqa: E731
    return e.select(
        "vec_id",
        fold(as_dbl).alias("vec_sum"),
        fold(sq).alias("norm_sq"),
        F.size("embedding").cast("long").alias("dim"),
        F.array_max("embedding").cast("double").alias("vec_max"),
        F.array_min("embedding").cast("double").alias("vec_min"),
    )


@register(
    "q_json_funcs",
    """
SELECT event_id,
       JSON_EXTRACT_STRING(props, '$.k') AS k_str,
       CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_num,
       CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 10 AS k_mod,
       JSON_EXTRACT_STRING(props, '$.missing') AS missing_field
FROM events
WHERE user_id < 50
""",
)
def q_json_funcs(spark, sf_dir):
    """JSON kept as string at rest (the reference maps json/jsonb -> varchar,
    reference internal/app/type_converter.go:246-247) and queried on demand."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_num"),
        (k.cast("bigint") % 10).alias("k_mod"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
    )


@register(
    "q_hash_funcs",
    """
SELECT doc_id,
       MD5(text) AS text_md5,
       SHA256(text) AS text_sha256,
       MD5(CONCAT(lang, ':', text)) AS keyed_md5,
       UPPER(HEX(ENCODE(SUBSTRING(text, 1, 8)))) AS prefix_hex,
       OCTET_LENGTH(ENCODE(text)) AS n_bytes
FROM documents
WHERE doc_id < 100
""",
)
def q_hash_funcs(spark, sf_dir):
    """Hash/binary functions — the engine-side analogue of the reference's
    content hashing (keccak256 lives in functions/hashing.py with golden
    tests; md5/sha2 are the oracle-checkable surface)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(F.concat(F.col("lang"), F.lit(":"), F.col("text"))).alias("keyed_md5"),
        F.upper(F.hex(F.encode(F.substring("text", 1, 8), "UTF-8"))).alias("prefix_hex"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


@register(
    "q_conditional_null",
    """
SELECT c_nationkey,
       COUNT(*) AS n,
       COUNT(NULLIF(c_mktsegment, 'BUILDING')) AS n_not_building,
       CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
       COUNT(*) - COUNT(NULLIF(c_mktsegment, 'BUILDING')) AS n_building,
       MIN(COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'NONE')) AS min_seg
FROM customer
GROUP BY c_nationkey
""",
)
def q_conditional_null(spark, sf_dir):
    """NULL passthrough semantics (the reference forwards JSON null through
    every transform, reference internal/app/type_converter.go:30-33)."""
    c = load_table(spark, sf_dir, "customer")
    seg_or_null = F.nullif("c_mktsegment", F.lit("BUILDING"))
    return c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(seg_or_null).alias("n_not_building"),
        F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0)).alias("n_negative"),
        (F.count(F.lit(1)) - F.count(seg_or_null)).alias("n_building"),
        F.min(F.coalesce(seg_or_null, F.lit("NONE"))).alias("min_seg"),
    )


@register(
    "q_explode_posexplode",
    """
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS tokens
  FROM documents WHERE doc_id < 30
),
z AS (SELECT doc_id, UNNEST(LIST_ZIP(tokens, RANGE(0, LEN(tokens)))) AS zz FROM toks)
SELECT doc_id, CAST(zz[2] AS INT) AS pos, zz[1] AS tok FROM z
""",
)
def q_explode_posexplode(spark, sf_dir):
    """UDTF-style explode with position — the Spark shape of the
    reference's tx->records unnesting where intra-tx order matters
    (reference pkg/pgrepl/replicator_test.go:62)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 30)
    return d.select(
        "doc_id", F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "tok")
    )


@register(
    "q_map_funcs",
    """
WITH base AS (
  SELECT n_nationkey,
         MAP(['name', 'region'], [n_name, CAST(n_regionkey AS VARCHAR)]) AS m
  FROM nation
)
SELECT n_nationkey,
       ARRAY_TO_STRING(LIST_SORT(map_keys(m)), ',') AS keys_sorted,
       m['name'][1] AS name_val,
       CAST(CARDINALITY(m) AS INT) AS n_entries,
       e.key AS entry_key,
       e.value AS entry_value
FROM (SELECT *, UNNEST(map_entries(m)) AS e FROM base)
""",
)
def q_map_funcs(spark, sf_dir):
    """Map family: create_map, map_keys, element_at, size, explode(map)
    (SURVEY.md §2.B scalar functions / Map row)."""
    n = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    return n.select(
        "n_nationkey",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, F.lit("name")).alias("name_val"),
        F.size(m).alias("n_entries"),
        F.explode(m).alias("entry_key", "entry_value"),
    )


@register(
    "q_interval_arith",
    """
SELECT event_id,
       ts + INTERVAL '90 minutes' AS plus_90m,
       ts - INTERVAL '1 day' AS minus_1d,
       CAST(CAST(CAST(ts AS DATE) + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus_3mo,
       ts + INTERVAL '2 hours 30 minutes' AS plus_dt
FROM events WHERE event_id < 500
""",
)
def q_interval_arith(spark, sf_dir):
    """Interval arithmetic (SURVEY.md §1.2 interval notes): timestamp +/-
    day-time intervals, month addition with end-of-month clamping (both
    engines clamp Jan 31 + 1 month to Feb 28)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 500)
    return ev.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 90 MINUTE")).alias("plus_90m"),
        (F.col("ts") - F.expr("INTERVAL 1 DAY")).alias("minus_1d"),
        F.add_months(F.col("ts").cast("date"), 3).cast("string").alias("plus_3mo"),
        (
            F.col("ts")
            + F.make_dt_interval(F.lit(0), F.lit(2), F.lit(30), F.lit(0))
        ).alias("plus_dt"),
    )


@register(
    "q_uuid_canonical",
    """
WITH h AS (SELECT doc_id, MD5(text) AS hx FROM documents WHERE doc_id < 200)
SELECT doc_id,
       SUBSTRING(hx, 1, 8) || '-' || SUBSTRING(hx, 9, 4) || '-' ||
       SUBSTRING(hx, 13, 4) || '-' || SUBSTRING(hx, 17, 4) || '-' ||
       SUBSTRING(hx, 21, 12) AS doc_uuid,
       LENGTH(SUBSTRING(hx, 1, 8) || '-' || SUBSTRING(hx, 9, 4) || '-' ||
              SUBSTRING(hx, 13, 4) || '-' || SUBSTRING(hx, 17, 4) || '-' ||
              SUBSTRING(hx, 21, 12)) = 36 AS is_canonical_len
FROM h
""",
)
def q_uuid_canonical(spark, sf_dir):
    """UUID canonical form (SURVEY.md §1.2: uuid -> lowercase-hex string).
    Content-derived deterministic UUIDs (v4-shaped from md5) — the
    generator `F.uuid()` itself is nondeterministic by definition, so the
    oracle-checkable surface is the canonical 8-4-4-4-12 formatting."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    hx = F.md5("text")
    uuid_col = F.concat_ws(
        "-",
        F.substring(hx, 1, 8),
        F.substring(hx, 9, 4),
        F.substring(hx, 13, 4),
        F.substring(hx, 17, 4),
        F.substring(hx, 21, 12),
    )
    return d.select(
        "doc_id",
        uuid_col.alias("doc_uuid"),
        (F.length(uuid_col) == 36).alias("is_canonical_len"),
    )


_REGEX_EXTRACT_ORACLE = """
SELECT doc_id,
       COALESCE(ARRAY_TO_STRING(regexp_extract_all(text, '[0-9]+'), ','), '')
         AS numbers,
       LEN(regexp_extract_all(text, '[a-z]+')) AS n_words,
       regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word
FROM documents WHERE doc_id < 100
"""


@register("q_regexp_extract", _REGEX_EXTRACT_ORACLE)
def q_regexp_extract(spark, sf_dir):
    """Regex extraction surface: all-matches array, match count, and a
    capture-group pull — identical PCRE-ish semantics in both engines for
    these character-class patterns.  The match array surfaces joined to a
    string (match order preserved) per the registry's no-raw-container
    output rule."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.array_join(
            F.regexp_extract_all("text", F.lit("[0-9]+"), 0), ","
        ).alias("numbers"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0))
        .cast("long")
        .alias("n_words"),
        F.regexp_extract("text", "([a-z]+) ([a-z]+)", 2).alias("second_word"),
    )
