"""Group C — scalar function surface (SURVEY.md §2 Group C).

One declared query per family, each exercising several functions. All
expressions stay JVM-side (pyspark.sql.functions / expr) so they live
inside whole-stage codegen — no Python in these paths.

Cross-engine authoring rules applied here (SURVEY.md §7.4):
  * ceil/floor: Spark returns BIGINT for double input, DuckDB DOUBLE →
    cast both to BIGINT explicitly.
  * round: only applied to irrational-valued expressions (sqrt/ln/exp)
    where decimal-tie inputs can't occur; half-up vs half-even then
    never diverges. Exact .5-tie values are never rounded.
  * transcendentals (exp/ln/log10): libm results may differ in the
    last ulp between JVM and C — round to 4 dp (boundary-collision
    probability ~1e-11 per row). sqrt is IEEE-exact: no rounding.
  * double→int casts: Spark truncates, DuckDB rounds → floor first.
  * day-of-week: ISO formulation in both engines (1=Mon..7=Sun).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from glaciersgee_spark.registry import query
from glaciersgee_spark.tables import load_table


@query(
    "q_c_string",
    oracle="""
    SELECT doc_id,
           upper(substring(text, 1, 12)) AS head_u,
           length(text) AS n_chars,
           concat_ws('|', lang, source) AS lang_src,
           replace(substring(text, 1, 40), 'data', 'DATA') AS replaced,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(strpos(text, 'join') AS BIGINT) AS join_pos,
           (text LIKE '%window%') AS has_window,
           regexp_extract(text, '([a-z]{6,})', 1) AS first_long_word,
           trim(concat('  ', lang, '  ')) AS trimmed
    FROM documents WHERE doc_id % 4 = 0
    """,
)
def q_c_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case/substring/length/concat/replace/pad/split/
    position/LIKE/regexp (common Java↔RE2 regex subset only)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 4 == 0)
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("head_u"),
        F.length("text").cast("long").alias("n_chars"),
        F.concat_ws("|", "lang", "source").alias("lang_src"),
        F.expr("replace(substring(text, 1, 40), 'data', 'DATA')").alias("replaced"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.instr("text", "join").cast("long").alias("join_pos"),
        F.col("text").like("%window%").alias("has_window"),
        F.regexp_extract("text", r"([a-z]{6,})", 1).alias("first_long_word"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit("  "))).alias("trimmed"),
    )


@query(
    "q_c_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mon,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
             AS days_since_epoch0,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1)
             AS first_of_month
    FROM orders WHERE o_orderkey % 8 = 0
    """,
)
def q_c_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family. ISO day-of-week is derived from Spark's
    1=Sunday dayofweek to match DuckDB's isodow (1=Mon..7=Sun)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 8 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mon"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.dayofyear(d).cast("long").alias("doy"),
        (((F.dayofweek(d) + 5) % 7) + 1).cast("long").alias("iso_dow"),
        F.date_trunc("month", d).cast("timestamp_ntz").alias("month_start"),
        F.date_add(d.cast("date"), 30).alias("plus30"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch0"),
        F.unix_timestamp(d.cast("timestamp")).alias("epoch_s"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("first_of_month"),
    )


@query(
    "q_c_math",
    oracle="""
    SELECT c_custkey,
           abs(c_acctbal) AS abs_bal,
           CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
           CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
           sqrt(abs(c_acctbal)) AS sqrt_bal,
           round(ln(abs(c_acctbal) + 1.0), 4) AS ln_bal4,
           round(exp(-abs(c_acctbal) / 10000.0), 4) AS exp_bal4,
           round(log10(abs(c_acctbal) + 1.0), 4) AS log10_bal4,
           pow(2.0, CAST(c_nationkey % 8 AS DOUBLE)) AS pow2,
           ((c_custkey % 7) + 7) % 7 AS pmod7,
           CAST(sign(c_acctbal) AS BIGINT) AS sgn,
           greatest(c_acctbal, 0.0) AS pos_bal,
           least(c_acctbal, 0.0) AS neg_bal
    FROM customer
    """,
)
def q_c_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. sqrt is IEEE correctly-rounded (bit-identical);
    ln/exp/log10 are rounded to 4 dp against libm last-ulp drift;
    pow limited to exact powers of two."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.abs(bal).alias("abs_bal"),
        F.ceil(bal).cast("long").alias("ceil_bal"),
        F.floor(bal).cast("long").alias("floor_bal"),
        F.sqrt(F.abs(bal)).alias("sqrt_bal"),
        F.round(F.log(F.abs(bal) + 1.0), 4).alias("ln_bal4"),
        F.round(F.exp(-F.abs(bal) / 10000.0), 4).alias("exp_bal4"),
        F.round(F.log10(F.abs(bal) + 1.0), 4).alias("log10_bal4"),
        F.pow(F.lit(2.0), (F.col("c_nationkey") % 8).cast("double")).alias("pow2"),
        (((F.col("c_custkey") % 7) + 7) % 7).alias("pmod7"),
        F.signum(bal).cast("long").alias("sgn"),
        F.greatest(bal, F.lit(0.0)).alias("pos_bal"),
        F.least(bal, F.lit(0.0)).alias("neg_bal"),
    )


@query(
    "q_c_cond",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'expedite'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'normal'
                ELSE 'relaxed' END AS urgency,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
           CASE WHEN o_totalprice > 200000.0 THEN 'big' ELSE 'small' END AS size_class,
           COALESCE(NULLIF(o_orderpriority, '5-LOW'), NULLIF(o_orderstatus, 'F'), 'fallback')
             AS first_defined
    FROM orders WHERE o_orderkey % 6 = 0
    """,
)
def q_c_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE WHEN / coalesce / nullif / if."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 6 == 0)
    pr = F.col("o_orderpriority")
    return o.select(
        "o_orderkey",
        F.when(pr.isin("1-URGENT", "2-HIGH"), "expedite")
        .when(pr == "3-MEDIUM", "normal")
        .otherwise("relaxed")
        .alias("urgency"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.when(F.col("o_totalprice") > 200000.0, "big").otherwise("small").alias("size_class"),
        F.coalesce(
            F.nullif(pr, F.lit("5-LOW")),
            F.nullif("o_orderstatus", F.lit("F")),
            F.lit("fallback"),
        ).alias("first_defined"),
    )


@query(
    "q_c_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS okey_str,
           TRY_CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS okey_back,
           TRY_CAST(o_orderpriority AS BIGINT) AS bad_cast,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
           CAST(CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || ' 06:30:00' AS TIMESTAMP)
             AS parsed_ts,
           CAST(o_orderkey % 2 = 0 AS BOOLEAN) AS is_even
    FROM orders WHERE o_orderkey % 9 = 0
    """,
)
def q_c_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family incl. try_cast of unparseable strings → NULL (ANSI
    mode makes plain cast throw — exactly why try_cast exists).
    Double→int goes through floor(): Spark truncates, DuckDB rounds."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 9 == 0)
    date_str = F.col("o_orderdate").cast("date").cast("string")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("okey_str"),
        F.expr("TRY_CAST(CAST(o_orderkey AS STRING) AS BIGINT)").alias("okey_back"),
        F.expr("TRY_CAST(o_orderpriority AS BIGINT)").alias("bad_cast"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        date_str.alias("date_str"),
        F.concat(date_str, F.lit(" 06:30:00")).cast("timestamp_ntz").alias("parsed_ts"),
        (F.col("o_orderkey") % 2 == 0).cast("boolean").alias("is_even"),
    )


@query(
    "q_c_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           array_to_string(list_transform(embedding[1:4],
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)), ',') AS first4,
           CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.0)) AS BIGINT)
             AS n_pos,
           (len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.3)) > 0) AS any_gt03,
           array_to_string(list_sort(list_transform(embedding[1:4],
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))), ',') AS sorted4,
           array_to_string(list_transform(generate_series(1, 1 + vec_id % 3),
             x -> x * 10), ',') AS seq10
    FROM embeddings WHERE vec_id % 20 = 0
    """,
)
def q_c_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family with higher-order functions (transform / filter /
    exists / sort / sequence). Array outputs are emitted as ','-joined
    strings of exact integers (floor(x·1e6): float→double is exact,
    floor of an integral double casts exactly in both engines — double
    string-formatting differs across engines, so raw doubles are never
    joined) to stay hashable by array-blind canonicalizers."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 20 == 0)
    first4i = F.expr(
        "transform(slice(embedding, 1, 4),"
        " x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.array_join(first4i, ",").alias("first4"),
        F.expr("size(filter(embedding, x -> CAST(x AS DOUBLE) > 0.0d))")
        .cast("long")
        .alias("n_pos"),
        F.expr("exists(embedding, x -> CAST(x AS DOUBLE) > 0.3d)").alias("any_gt03"),
        F.array_join(F.array_sort(first4i), ",").alias("sorted4"),
        F.array_join(
            F.expr("transform(sequence(1L, 1L + vec_id % 3), x -> x * 10)"), ","
        ).alias("seq10"),
    )


@query(
    "q_c_map",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
           list_contains(json_keys(props), 'k') AS has_k
    FROM events WHERE event_id % 11 = 0
    """,
)
def q_c_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family over schema-on-read JSON props (the GEE dynamic
    properties-dict idiom, SURVEY.md §1.2)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") % 11 == 0)
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
        F.array_contains(F.map_keys(m), "k").alias("has_k"),
    )


@query(
    "q_c_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
           (json_extract(props, '$.k') IS NOT NULL) AS has_k,
           (json_extract(props, '$.missing') IS NULL) AS missing_is_null
    FROM events WHERE event_id % 13 = 0
    """,
)
def q_c_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: path extraction (string + typed) and null paths."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") % 13 == 0)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_num"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )


@query(
    "q_c_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS and_lo,
           o_orderkey | 4096 AS or_hi,
           xor(o_orderkey, 1365) AS xor_k,
           o_orderkey << 3 AS shl3,
           o_orderkey >> 2 AS shr2,
           CAST(bit_count(o_orderkey) AS INT) AS popcnt,
           ~o_orderkey AS not_k
    FROM orders WHERE o_orderkey % 5 = 0
    """,
)
def q_c_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: AND/OR/XOR/NOT, shifts, popcount — the
    bit-twiddling surface the SimHash/banding operators build on
    (q_e_dedup_simhash uses xor + bit_count as its Hamming kernel)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 5 == 0)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("and_lo"),
        k.bitwiseOR(F.lit(4096)).alias("or_hi"),
        k.bitwiseXOR(F.lit(1365)).alias("xor_k"),
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        F.bit_count(k).cast("int").alias("popcnt"),
        F.bitwise_not(k).alias("not_k"),
    )


@query(
    "q_c_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           CAST(length(md5(text)) AS BIGINT) AS md5_len
    FROM documents WHERE doc_id % 5 = 0
    """,
)
def q_c_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family (content addressing for dedup). md5/sha256 are
    standardized → SQL oracle; engine-specific xxhash64 is deliberately
    excluded from hashed outputs (the dedup pipelines use the
    md5-derived cross-engine family for exactly this reason)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.length(F.md5("text")).cast("long").alias("md5_len"),
    )


@query(
    "q_c_struct",
    oracle="""
    SELECT o_orderkey,
           s.status AS st,
           s.bucket AS bk,
           CAST(s.price_c AS DOUBLE) AS price_back,
           (s.bucket * 10 + CAST(length(s.status) AS INT)) AS derived
    FROM (
      SELECT o_orderkey,
             {'status': o_orderstatus,
              'bucket': CAST(o_orderkey % 7 AS INT),
              'price_c': o_totalprice} AS s
      FROM orders WHERE o_orderkey % 9 = 0
    )
    """,
)
def q_c_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family: build a nested struct column, access its fields,
    and compute over them — the nested-type surface of SURVEY.md §1.2
    (scene properties as typed structs). Output is flattened to scalars
    so the oracle hash stays type-exact."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 9 == 0)
    s = F.struct(
        F.col("o_orderstatus").alias("status"),
        (F.col("o_orderkey") % 7).cast("int").alias("bucket"),
        F.col("o_totalprice").alias("price_c"),
    )
    nested = o.select("o_orderkey", s.alias("s"))
    return nested.select(
        "o_orderkey",
        F.col("s.status").alias("st"),
        F.col("s.bucket").alias("bk"),
        F.col("s.price_c").cast("double").alias("price_back"),
        (F.col("s.bucket") * 10 + F.length("s.status").cast("int")).alias("derived"),
    )


@query(
    "q_c_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_long,
           CAST(json_extract(props, '$.k') AS DOUBLE) / 10.0 AS k_scaled,
           json_extract(props, '$.missing') IS NULL AS missing_is_null
    FROM events WHERE event_id % 11 = 0
    """,
)
def q_c_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT family (new in Spark 4): parse_json → VariantType →
    typed variant_get path extraction — the semi-structured column
    type that replaces string-JSON re-parsing per access. The oracle
    reads the same paths with DuckDB's JSON extraction; a missing path
    is NULL in both. At scale VARIANT's binary encoding is
    shredded/pushed down by the parquet reader, where get_json_object
    re-parses text per expression (q_c_json shows that spelling).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_id") % 11 == 0).select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k_long"),
        (
            F.expr("variant_get(parse_json(props), '$.k', 'double')") / 10.0
        ).alias("k_scaled"),
        F.expr("variant_get(parse_json(props), '$.missing', 'string')")
        .isNull()
        .alias("missing_is_null"),
    )


@query(
    "q_c_url",
    oracle="""
    WITH u AS (
      SELECT p_partkey,
             'https://mirror-' || CAST(p_partkey % 4 AS VARCHAR)
               || '.example.com/l2/scene_' || CAST(p_partkey AS VARCHAR)
               || '.tif?band=B' || CAST(p_partkey % 8 AS VARCHAR)
               || '&rev=' || CAST(p_size % 5 AS VARCHAR) AS url
      FROM part WHERE p_partkey % 13 = 0
    )
    SELECT p_partkey,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+([^?]*)', 1) AS path,
           regexp_extract(url, '[?&]band=([^&]*)', 1) AS band,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM u
    """,
)
def q_c_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family: `parse_url` HOST/PATH/QUERY-parameter/
    PROTOCOL extraction over deterministic mirror URLs — the
    normalization surface URL-dedup and source-attribution stages
    need. The oracle mirrors each component with an equivalent regexp
    (DuckDB has no URL functions), kept in the shared RE2∩Java
    dialect subset (§7.4).
    """
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") % 13 == 0)
    url = F.concat(
        F.lit("https://mirror-"),
        (F.col("p_partkey") % 4).cast("string"),
        F.lit(".example.com/l2/scene_"),
        F.col("p_partkey").cast("string"),
        F.lit(".tif?band=B"),
        (F.col("p_partkey") % 8).cast("string"),
        F.lit("&rev="),
        (F.col("p_size") % 5).cast("string"),
    )
    u = p.select("p_partkey", url.alias("url"))
    return u.select(
        "p_partkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("band")).alias("band"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "q_c_regex",
    oracle="""
    WITH blob AS (
      SELECT doc_id,
             lang || '_' || source || ' ' || substring(text, 1, 60)
               || repeat(' v' || CAST(doc_id % 5 AS VARCHAR),
                         CAST(doc_id % 4 AS INTEGER) + 1) AS b
      FROM documents WHERE doc_id % 9 = 0
    )
    SELECT doc_id,
           regexp_extract(b, '([a-z]+)_([a-z]+[0-9]+)', 1) AS first_stem,
           regexp_extract(b, '([a-z]+)_([a-z]+[0-9]+)', 2) AS first_suffix,
           CAST(len(regexp_extract_all(b, '[a-z]+[0-9]+')) AS INT)
             AS n_alnum_runs,
           CAST(regexp_matches(b, '^[a-z]+_') AS BOOLEAN) AS starts_compound,
           CAST(len(string_split_regex(b, '[ _]+')) AS INT) AS n_units
    FROM blob
    """,
)
def q_c_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family on one surface: group extraction (1st and
    2nd capture), match counting via extract-all, boolean match, and
    regex split, over a constructed lang_source-prefixed blob (the raw
    corpus text has no compound tokens, so the probe string guarantees
    every branch fires, with doc-varying counts). Patterns stay in the RE2∩Java common subset
    (SURVEY.md §7.4 regex trap: no backrefs, no lookaround, no lazy
    quantifiers) so both engines see identical semantics. All JVM-side
    codegen, zero shuffles."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 9 == 0)
    b = F.concat_ws(
        "", F.col("lang"), F.lit("_"), F.col("source"), F.lit(" "),
        F.substring("text", 1, 60),
        F.repeat(
            F.concat(F.lit(" v"), (F.col("doc_id") % 5).cast("string")),
            (F.col("doc_id") % 4 + 1).cast("int"),
        ),
    )
    blob = d.select("doc_id", b.alias("b"))
    pat = r"([a-z]+)_([a-z]+[0-9]+)"
    return blob.select(
        "doc_id",
        F.regexp_extract("b", pat, 1).alias("first_stem"),
        F.regexp_extract("b", pat, 2).alias("first_suffix"),
        F.size(F.regexp_extract_all("b", F.lit(r"[a-z]+[0-9]+"), F.lit(0)))
        .cast("int")
        .alias("n_alnum_runs"),
        F.col("b").rlike("^[a-z]+_").alias("starts_compound"),
        F.size(F.split("b", "[ _]+")).cast("int").alias("n_units"),
    )


@query(
    "q_c_null",
    oracle="""
    WITH n AS (
      SELECT o_orderkey,
             NULLIF(o_orderkey % 7, 0) AS a,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL
                  ELSE o_totalprice END AS b
      FROM orders WHERE o_orderkey % 4 = 0
    )
    SELECT o_orderkey,
           COALESCE(a, -1) AS a_or_neg1,
           a IS NULL AS a_null,
           CAST(COALESCE(b, 0.0) AS DOUBLE) AS b_or_zero,
           CASE WHEN a IS NULL THEN 'missing' ELSE 'present' END AS a_tag,
           COALESCE(CAST(a AS DOUBLE), b, -99.0) AS first_present,
           (a IS NOT DISTINCT FROM NULLIF(o_orderkey % 7, 0)) AS nullsafe_eq
    FROM n
    """,
)
def q_c_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling scalar family: NULLIF to manufacture NULLs
    deterministically, COALESCE chains (mixed-type with casts), IS
    NULL predicates, CASE tagging, and null-safe equality (`<=>` ≡
    IS NOT DISTINCT FROM) — the ANSI null toolkit every cleaning
    pipeline leans on. All JVM codegen, zero shuffles; the corpus has
    no natural NULLs so the probe column builds them. The row filter
    (%4) is chosen coprime-ish to both null rules (%7, %3) so every
    branch fires on a real mix of null AND non-null rows."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 4 == 0)
    a = F.nullif(F.col("o_orderkey") % 7, F.lit(0))
    b = F.when(F.col("o_orderkey") % 3 == 0, F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    n = o.select("o_orderkey", a.alias("a"), b.alias("b"))
    return n.select(
        "o_orderkey",
        F.coalesce(F.col("a"), F.lit(-1)).alias("a_or_neg1"),
        F.col("a").isNull().alias("a_null"),
        F.coalesce(F.col("b"), F.lit(0.0)).cast("double").alias("b_or_zero"),
        F.when(F.col("a").isNull(), "missing").otherwise("present").alias("a_tag"),
        F.coalesce(F.col("a").cast("double"), F.col("b"), F.lit(-99.0)).alias(
            "first_present"
        ),
        F.col("a").eqNullSafe(F.nullif(F.col("o_orderkey") % 7, F.lit(0))).alias(
            "nullsafe_eq"
        ),
    )


@query(
    "q_c_interval",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
           last_day(CAST(o_orderdate AS DATE)) AS eom,
           CAST(o_orderdate AS DATE)
             + CAST(CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7
                         ELSE (8 - isodow(o_orderdate)) % 7 END AS INTEGER)
             AS next_monday,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
           CAST((year(o_orderdate) * 12 + month(o_orderdate))
                - (1995 * 12 + 6) AS BIGINT) AS months_from_jun95
    FROM orders WHERE o_orderkey % 9 = 1
    """,
)
def q_c_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval family (round 3): quarter, add_months with
    end-of-month clamping (both engines clamp Jan 31 + 1 mo → Feb 28),
    last_day, next-weekday, ISO week start, and integer month
    distance. Spark's next_day('Mon') is reproduced in the oracle with
    isodow arithmetic (strictly-later next Monday)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 9 == 1)
    d = F.col("o_orderdate")
    dd = d.cast("date")
    return o.select(
        "o_orderkey",
        F.quarter(d).cast("long").alias("qtr"),
        F.add_months(dd, 3).alias("plus3m"),
        F.last_day(dd).alias("eom"),
        F.next_day(dd, "Mon").alias("next_monday"),
        F.date_trunc("week", d).cast("date").alias("week_start"),
        (F.year(d) * 12 + F.month(d) - (1995 * 12 + 6))
        .cast("long")
        .alias("months_from_jun95"),
    )


@query(
    "q_c_try",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE o_totalprice / (o_orderkey % 7) END AS safe_div,
           CASE WHEN o_orderkey % 100 <= 7
                THEN 9223372036854775800 + o_orderkey % 100
                ELSE NULL END AS safe_add,
           CASE WHEN o_orderkey % 5 + 1 <= 3
                THEN (o_orderkey % 5 + 1) * 10
                ELSE NULL END AS safe_elem
    FROM orders WHERE o_orderkey % 11 = 0
    """,
)
def q_c_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safe function family (round 5): Spark 4 runs ANSI
    mode, where division by zero, BIGINT overflow, and out-of-bounds
    element access THROW — `try_divide` / `try_add` / `try_element_at`
    are the sanctioned NULL-on-error escape hatches a long-running
    pipeline uses so one poison row cannot kill a 100 TB job.
    Completes the family next to q_c_cast's try_cast. The oracle
    states the semantics as explicit CASE guards, which is also the
    portable spelling (DuckDB throws on the same conditions).

    All three columns exercise the error path on data-derived
    conditions: divisor hits zero every 7th key, the addend overflows
    int64 for every residue above 7, and the array index walks out of
    bounds on residues 3 and 4 (indexes are 1-based; index 0 is
    invalid even for the try_ form, so the derivation starts at 1). Scan-side codegen, zero shuffles.
    """
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 11 == 0)
    return o.select(
        "o_orderkey",
        F.expr("try_divide(o_totalprice, o_orderkey % 7)").alias("safe_div"),
        F.expr("try_add(9223372036854775800L, o_orderkey % 100)").alias(
            "safe_add"
        ),
        F.expr(
            "try_element_at(array(10L, 20L, 30L),"
            " CAST(o_orderkey % 5 + 1 AS INT))"
        ).alias("safe_elem"),
    )


# ---------------------------------------------------------------------------
# q_c_collation (round 7)
# ---------------------------------------------------------------------------


@query(
    "q_c_collation",
    oracle="""
    WITH m AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END
               AS sb
      FROM documents
    )
    SELECT lower(sb) AS source_ci,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT sb) AS n_case_variants,
           MIN(sb) AS first_variant
    FROM m GROUP BY lower(sb) ORDER BY source_ci
    """,
)
def q_c_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collated string semantics (round 7 — Spark 4's collation
    surface, the scalar family's newest member): group a case-mangled
    source column under UTF8_LCASE collation so 'src0' and 'SRC0'
    land in ONE group, count the binary-distinct case variants inside
    each, and normalize the emitted key with lower() (the group
    representative under a case-insensitive collation is whichever
    variant arrived first — never emit it raw). DuckDB has no column
    collations in this form, so the oracle spells the equivalent
    lower()-key grouping — which is exactly the pre-collation
    workaround the feature replaces (and why the op exists: the
    collated form keeps comparisons/joins/aggregations case-
    insensitive WITHOUT rewriting every expression through lower()).

    Scale: one scan, one combinable groupBy; collation comparison is
    JVM-side codegen like any string compare."""
    d = load_table(spark, sf_dir, "documents")
    m = d.select(
        F.when(F.col("doc_id") % 3 == 0, F.upper("source"))
        .otherwise(F.col("source"))
        .alias("sb")
    )
    g = (
        m.withColumn("sc", F.expr("collate(sb, 'UTF8_LCASE')"))
        .groupBy("sc")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.expr("collate(sb, 'UTF8_BINARY')")).alias(
                "n_case_variants"
            ),
            F.min(F.expr("collate(sb, 'UTF8_BINARY')")).alias("first_variant"),
        )
    )
    return g.select(
        F.expr("collate(lower(sc), 'UTF8_BINARY')").alias("source_ci"),
        "n_docs",
        "n_case_variants",
        "first_variant",
    ).orderBy("source_ci")


@query(
    "q_c_binary",
    oracle="""
    SELECT p_partkey,
           to_base64(encode(p_name)) AS b64,
           lower(hex(encode(p_name))) AS hx,
           decode(unhex(lower(hex(encode(p_name))))) AS roundtrip,
           CAST(octet_length(encode(p_name)) AS BIGINT) AS n_bytes,
           CAST(length(p_name) AS BIGINT) AS n_chars
    FROM part WHERE p_partkey % 40 = 0
    """,
)
def q_c_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/encoding scalar family (round 8): string→bytes
    (`encode` UTF-8), base64 and hex renderings, the hex→bytes→string
    round-trip, and byte-vs-char length — the byte-level surface the
    multimodal BinaryType columns (q_b_scan_binary, q_e_mm_*) and
    the content-hash family sit on. Dialect notes pinned here: Spark
    `base64(binary)` ≡ DuckDB `to_base64(blob)`; Spark `hex` emits
    uppercase and DuckDB lowercase, so both sides normalize through
    `lower()`; `decode(…, 'UTF-8')` ≡ DuckDB `decode(blob)`. Pure
    scan-side codegen over a `% 40` key sample; zero shuffles."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") % 40 == 0)
    b = F.encode(F.col("p_name"), "UTF-8")
    hx = F.lower(F.hex(b))
    return p.select(
        "p_partkey",
        F.base64(b).alias("b64"),
        hx.alias("hx"),
        F.decode(F.unhex(hx), "UTF-8").alias("roundtrip"),
        F.octet_length(b).cast("long").alias("n_bytes"),
        F.length("p_name").cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# q_c_printf (round 8)
# ---------------------------------------------------------------------------


@query(
    "q_c_printf",
    oracle="""
    SELECT doc_id,
           printf('%s-%06d', upper(lang), doc_id) AS scene_id,
           printf('%d scenes in %s (%s)', n_chars, source, lang)
             AS summary,
           printf('%x', doc_id * 255) AS hex_id,
           printf('%5d|', n_chars) AS right_aligned,
           printf('%-5d|', CAST(doc_id % 1000 AS BIGINT)) AS left_aligned,
           printf('%s%%', CAST(doc_id % 100 AS VARCHAR)) AS pct_label
    FROM documents WHERE doc_id % 5 = 0
    """,
)
def q_c_printf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting family (round 8): the template surface
    every export/manifest/report pipeline leans on — zero-padded
    composite IDs, human-readable summaries, hex rendering, fixed
    right/left field alignment, and literal-%% escaping. Spark's
    `format_string` (java.util.Formatter) and DuckDB's `printf`
    (fmtlib) agree on the INTEGER/STRING subset used here
    (%s, %d, %06d, %5d, %-5d, %x, %%); float format specifiers are
    deliberately excluded — the two runtimes' float rendering
    differs and the engine's convention for numeric text is explicit
    round()/CAST chains instead (§7.4). Scan-side codegen, zero
    shuffles, no UDF."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    return d.select(
        "doc_id",
        F.format_string("%s-%06d", F.upper("lang"), "doc_id").alias(
            "scene_id"
        ),
        F.format_string(
            "%d scenes in %s (%s)", "n_chars", "source", "lang"
        ).alias("summary"),
        F.format_string("%x", F.col("doc_id") * 255).alias("hex_id"),
        F.format_string("%5d|", "n_chars").alias("right_aligned"),
        F.format_string(
            "%-5d|", (F.col("doc_id") % 1000).cast("long")
        ).alias("left_aligned"),
        F.format_string(
            "%s%%", (F.col("doc_id") % 100).cast("long").cast("string")
        ).alias("pct_label"),
    )


# ---------------------------------------------------------------------------
# q_c_uuid (round 8)
# ---------------------------------------------------------------------------

# Name-based UUID from the md5 digest (RFC 4122 version-3 layout):
# 8-4-4-4-12 hex groups with the version nibble forced to '3' and the
# variant nibble to '8' — identical string surgery in both engines.
_UUID_EXPR = (
    "concat(substring(h, 1, 8), '-', substring(h, 9, 4), '-', '3',"
    " substring(h, 14, 3), '-', '8', substring(h, 18, 3), '-',"
    " substring(h, 21, 12))"
)


@query(
    "q_c_uuid",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             md5(concat('ggee:doc:', CAST(doc_id AS VARCHAR))) AS h
      FROM documents WHERE doc_id % 7 = 0
    )
    SELECT doc_id,
           {_UUID_EXPR} AS doc_uuid,
           substring({_UUID_EXPR}, 15, 1) AS version_nibble,
           length({_UUID_EXPR}) AS uuid_len
    FROM h ORDER BY doc_id
    """,
)
def q_c_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic name-based UUID minting (round 8): RFC 4122
    version-3 (md5-of-namespace:name) identifiers for every document
    — the ID-assignment op a pipeline needs when downstream systems
    demand UUIDs but reprocessing must mint the SAME id every run
    (Spark's built-in uuid() is random per row per execution — a
    determinism landmine this op exists to replace). The namespace
    prefix makes ids collision-isolated across entity types.

    Pure string surgery over the md5 hex digest (8-4-4-4-12 grouping
    with version/variant nibbles forced), scan-side codegen in both
    engines, zero shuffles; the version-nibble and length columns pin
    the layout contract."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    h = d.select(
        "doc_id",
        F.md5(F.concat(F.lit("ggee:doc:"), F.col("doc_id").cast("string"))).alias(
            "h"
        ),
    )
    return h.select(
        "doc_id",
        F.expr(_UUID_EXPR).alias("doc_uuid"),
        F.expr(f"substring({_UUID_EXPR}, 15, 1)").alias("version_nibble"),
        F.expr(f"length({_UUID_EXPR})").cast("long").alias("uuid_len"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q_c_reduce (round 9)
# ---------------------------------------------------------------------------


@query(
    "q_c_reduce",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                         AS BIGINT)) AS qv
      FROM embeddings WHERE vec_id % 25 = 0)
    SELECT vec_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT), qv),
                       (acc, x) -> acc + x) AS qsum,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
                         list_transform(range(1, 1 + len(qv)),
                                        i -> qv[i] * qv[len(qv) + 1 - i])),
                       (acc, x) -> acc + x) AS rev_dot,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
                         list_transform(qv, x -> GREATEST(x, 0))),
                       (acc, x) -> acc + x) AS relu_sum,
           list_reduce(qv, (acc, x) -> GREATEST(acc, x)) AS qmax
    FROM q ORDER BY vec_id
    """,
)
def q_c_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIGHER-ORDER FOLD family (round 9) — aggregate()/reduce and
    zip_with, the two array HOFs q_c_array left out: a sequential
    fold with an initial accumulator (Spark `aggregate`, DuckDB
    `list_reduce` seeded via list_prepend — semantically aligned by
    construction), an element-wise binary combine (Spark `zip_with`
    against the reversed array; DuckDB spells it as an indexed
    transform — zip_with has no direct DuckDB twin, which is itself
    the documentation point), a map-then-fold chain, and a no-seed
    running max. All on the micro-quantized integer lattice
    (floor(x·1e6 + 0.5)) so every fold step is exact int64 — fold
    ORDER is engine-defined only up to float non-associativity,
    which integers make moot.

    Scale: pure scan-side codegen per row, zero shuffles; the HOF
    interpreter overhead note in similarity.py's header is exactly
    why the HOT-path kernels are Arrow UDFs and THIS op is the
    declared surface exhibit on a pruned panel."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 25 == 0)
    qv = (
        "transform(embedding,"
        " x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))"
    )
    return e.select(
        "vec_id",
        F.expr(f"aggregate({qv}, 0L, (acc, x) -> acc + x)").alias("qsum"),
        F.expr(
            f"aggregate(zip_with({qv}, reverse({qv}), (a, b) -> a * b),"
            " 0L, (acc, x) -> acc + x)"
        ).alias("rev_dot"),
        F.expr(
            f"aggregate(transform({qv}, x -> GREATEST(x, 0L)),"
            " 0L, (acc, x) -> acc + x)"
        ).alias("relu_sum"),
        F.expr(
            f"aggregate({qv}, -9223372036854775808L,"
            " (acc, x) -> GREATEST(acc, x))"
        ).alias("qmax"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# q_c_levenshtein (round 9)
# ---------------------------------------------------------------------------


@query(
    "q_c_levenshtein",
    oracle="""
    WITH pairs AS (
      SELECT a.n_name AS name_a, b.n_name AS name_b
      FROM nation a JOIN nation b ON a.n_name < b.n_name
    ),
    d AS (
      SELECT name_a, name_b,
             CAST(levenshtein(name_a, name_b) AS INT) AS dist,
             CAST(GREATEST(length(name_a), length(name_b)) AS INT)
               AS max_len
      FROM pairs
    )
    SELECT name_a, name_b, dist,
           CASE WHEN dist > 8 THEN -1 ELSE dist END AS dist_thresh8,
           CAST((max_len - dist) * 1000000 // max_len AS BIGINT)
             AS sim_ppm
    FROM d
    WHERE dist <= 12
    ORDER BY dist, name_a, name_b
    """,
)
def q_c_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDIT-DISTANCE function family (round 9) — `levenshtein`, the
    one string-distance primitive both engines ship with identical
    Wagner-Fischer semantics (probed: ('kitten','sitting')=3,
    ('ab','')=2, ('','')=0 — insert/delete/substitute all cost 1, no
    transposition). Three spellings over the bounded nation-name pair
    grid (25×24/2 pairs — a function exhibit, not a dedup engine):
    the raw distance; Spark 3.5's THRESHOLD form `levenshtein(a,b,k)`
    which early-exits the DP and returns −1 past k (the oracle spells
    the portable `CASE WHEN dist > k THEN -1` — this op pins that the
    two agree); and the normalized similarity (max_len − dist)/max_len
    as exact integer ppm, the ratio fuzzy matchers actually threshold
    on. Scale warning label: levenshtein is O(|a|·|b|) PER PAIR with
    no pushdown — at corpus scale it belongs strictly AFTER blocking
    (q_e_dedup_edit is that composition; this exhibit is the kernel
    contract it relies on)."""
    n = load_table(spark, sf_dir, "nation")
    a = n.select(F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_name").alias("name_b"))
    pairs = a.join(b, F.col("name_a") < F.col("name_b"))
    d = pairs.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
        # Spark threshold form: -1 beyond k (pinned against the CASE
        # spelling in tests; the returned column uses the builtin).
        F.levenshtein(F.col("name_a"), F.col("name_b"), 8)
        .cast("int")
        .alias("dist_thresh8"),
        F.greatest(F.length("name_a"), F.length("name_b"))
        .cast("int")
        .alias("max_len"),
    )
    return (
        d.where(F.col("dist") <= 12)
        .selectExpr(
            "name_a",
            "name_b",
            "dist",
            "dist_thresh8",
            "CAST((max_len - dist) * 1000000 DIV max_len AS BIGINT)"
            " AS sim_ppm",
        )
        .orderBy("dist", "name_a", "name_b")
    )
