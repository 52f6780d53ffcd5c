"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship profile over sf0.001 documents.
``queries()`` — one entry per implemented operator (SURVEY.md §2);
``oracle_sql()`` — matching ANSI SQL for DuckDB cross-check. Column
aliases match exactly on both sides; floats are rounded identically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from data_profiler_spark.operators import profiler as P
from data_profiler_spark.operators import validators as V


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Profile the documents table (SURVEY.md §7.1 M1 flagship): per-column
    exact distinct/null counts + cardinality ratio in one pass."""
    df = _t(spark, "/root/testdata/sf0.001", "documents")
    return P.distinct_report(df, ["doc_id", "text", "lang", "source", "n_chars"])


# ---------------------------------------------------------------------------
# queries (spark side)
# ---------------------------------------------------------------------------

def q_profile_nchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4: exact numeric profile (Welford stats + exact percentiles)."""
    df = _t(spark, sf_dir, "documents")
    q = F.percentile("n_chars", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return df.agg(
        F.count("n_chars").alias("cnt"),
        (F.count(F.lit(1)) - F.count("n_chars")).alias("null_cnt"),
        F.min("n_chars").alias("min_v"),
        F.max("n_chars").alias("max_v"),
        F.round(F.avg("n_chars"), 6).alias("mean_v"),
        F.round(F.stddev_samp("n_chars"), 6).alias("stddev_v"),
        F.round(q[0], 6).alias("p25"),
        F.round(q[1], 6).alias("p50"),
        F.round(q[2], 6).alias("p75"),
    )


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A17: exact per-column distinct + null counts (melted semantics)."""
    df = _t(spark, sf_dir, "documents")
    parts = []
    for c in ["lang", "source", "text"]:
        sc = F.trim(F.col(c).cast("string"))
        parts.append(
            df.agg(
                F.lit(c).alias("column_name"),
                F.count_distinct(F.when(sc.isNotNull() & (sc != ""), sc)).alias("distinct_cnt"),
                F.sum((F.col(c).isNull() | (sc == "")).cast("long")).alias("null_cnt"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q_top10_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: exact top-10 frequencies, pinned tiebreak (cnt desc, value asc)."""
    df = _t(spark, sf_dir, "documents")
    return (
        P.top_n_values(df, ["lang"], 10)
        .select(F.col("value").alias("lang"), F.col("cnt"), F.col("rank"))
    )


def q_top10_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "documents")
    return (
        P.top_n_values(df, ["source"], 10)
        .select(F.col("value").alias("source"), F.col("cnt"), F.col("rank"))
    )


def q_hist_nchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: exact 10-bin histogram, max folded into last bin."""
    df = _t(spark, sf_dir, "documents")
    return P.histogram(df, "n_chars", 10).select("bin", "cnt", "bin_lo", "bin_hi")


def q_string_stats_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10/P9: string length stats + char-class flags."""
    df = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return df.agg(
        F.min(F.length(c)).alias("min_len"),
        F.max(F.length(c)).alias("max_len"),
        F.round(F.avg(F.length(c)), 6).alias("avg_len"),
        F.max(c.rlike("[^\\x00-\\x7F]").cast("int")).alias("has_non_ascii"),
        F.max(c.rlike("[0-9]").cast("int")).alias("has_digit"),
    )


def _money_col():
    base = F.format_string("%.2f", F.col("l_extendedprice"))
    m = F.pmod(F.col("l_orderkey"), F.lit(6))
    return (
        F.when(m == 0, base)
        .when(m == 1, F.concat(F.lit("$"), base))
        .when(m == 2, F.concat(F.lit("("), base, F.lit(")")))
        .when(m == 3, F.format_string("%.3f", F.col("l_extendedprice")))
        .when(m == 4, F.concat(F.lit("1,"), base))
        .otherwise(F.concat(F.lit(" "), base))
    )


def q_money_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11/P3: strict money validity + categorized violation counts."""
    df = _t(spark, sf_dir, "lineitem").withColumn("amount", _money_col())
    c = F.col("amount")
    valid = V.is_money(c)
    return df.agg(
        F.sum(valid.cast("long")).alias("valid_cnt"),
        F.sum((~valid).cast("long")).alias("invalid_cnt"),
        F.sum(c.contains("$").cast("long")).alias("dollar_cnt"),
        F.sum(c.contains(",").cast("long")).alias("comma_cnt"),
        F.sum((c.contains("(") | c.contains(")")).cast("long")).alias("paren_cnt"),
        F.sum((c.rlike("^[0-9]+(\\.[0-9]*)?$") & ~c.rlike("^[0-9]+\\.[0-9]{2}$")).cast("long")).alias("wrong_dec_cnt"),
        F.min(F.when(valid, c.cast("decimal(18,2)"))).cast("double").alias("min_valid"),
        F.max(F.when(valid, c.cast("decimal(18,2)"))).cast("double").alias("max_valid"),
    )


def _date_col():
    d = F.col("o_orderdate").cast("date")
    m = F.pmod(F.col("o_orderkey"), F.lit(4))
    return (
        F.when(F.pmod(F.col("o_orderkey"), F.lit(50)) == 0, F.concat(F.lit("1899"), F.date_format(d, "MMdd")))
        .when(m == 0, F.date_format(d, "yyyyMMdd"))
        .when(m == 1, F.date_format(d, "yyyy-MM-dd"))
        .when(m == 2, F.date_format(d, "MM/dd/yyyy"))
        .otherwise(F.date_format(d, "MM-dd-yyyy"))
    )


def q_date_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12/A14: per-format parse counts + out-of-range years (<1900)."""
    df = _t(spark, sf_dir, "orders").withColumn("ds", _date_col())
    c = F.col("ds")
    fmts = dict((n, (p, s)) for n, p, s in V.DATE_FORMATS)
    ymd = V.parsed_date(c, *fmts["YYYYMMDD"])
    iso = V.parsed_date(c, *fmts["YYYY-MM-DD"])
    mdy = V.parsed_date(c, *fmts["MM/DD/YYYY"])
    mdy2 = V.parsed_date(c, *fmts["MM-DD-YYYY"])
    return df.agg(
        F.sum(ymd.isNotNull().cast("long")).alias("fmt_yyyymmdd"),
        F.sum(iso.isNotNull().cast("long")).alias("fmt_iso"),
        F.sum(mdy.isNotNull().cast("long")).alias("fmt_mdy_slash"),
        F.sum(mdy2.isNotNull().cast("long")).alias("fmt_mdy_dash"),
        F.sum((ymd.isNotNull() & ~V.is_date_in_range(ymd)).cast("long")).alias("out_of_range"),
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary agg (grouped exact aggregates, map-side partials)."""
    df = _t(spark, sf_dir, "lineitem")
    return (
        df.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


def q_top10_customers_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3-style join + top-k: broadcast the small dim, TakeOrderedAndProject."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    rev = orders.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"))
    return (
        rev.join(F.broadcast(cust), rev.o_custkey == cust.c_custkey)
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"), "revenue")
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(10)
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed exact agg (A13 analog on event time)."""
    df = _t(spark, sf_dir, "events")
    return (
        df.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


_WS = "[ \\t\\n\\x0B\\f\\r]+"


def q_token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: whitespace token counts per lang (engine tokenizer)."""
    df = _t(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), _WS), lambda w: w != "")
    return (
        df.groupBy("lang")
        .agg(
            F.round(F.avg(F.size(words)), 6).alias("avg_tokens"),
            F.sum(F.size(words)).alias("total_tokens"),
            F.max(F.size(words)).alias("max_tokens"),
        )
    )


def q_stopword_hits_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-signal parity: distinct-stopword hits aggregated by source."""
    from data_profiler_spark import rules

    df = _t(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), _WS), lambda w: w != "")
    hits = F.size(F.array_intersect(F.array(*[F.lit(s) for s in rules.STOPWORDS]), F.transform(words, F.lower)))
    return df.groupBy("source").agg(
        F.round(F.avg(hits), 6).alias("avg_stopword_hits"),
        F.sum((hits >= 2).cast("long")).alias("docs_with_evidence"),
    )


_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"


def q_pii_email_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection counts (counts-not-values discipline) per source."""
    df = _t(spark, sf_dir, "documents")
    return df.groupBy("source").agg(
        F.sum(F.col("text").rlike(_EMAIL_RE).cast("long")).alias("docs_with_email"),
        F.sum(F.regexp_count("text", F.lit(_EMAIL_RE))).alias("email_matches"),
    )


def _fingerprint():
    words = F.filter(F.split(F.col("text"), _WS), lambda w: w != "")
    return F.concat_ws(" ", F.slice(words, 1, 5))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep min doc_id per 5-word-prefix fingerprint."""
    df = _t(spark, sf_dir, "documents").withColumn("fp", _fingerprint())
    return df.groupBy("fp").agg(F.min("doc_id").alias("kept_doc_id")).select("kept_doc_id")


def q_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20: duplicate groups (count > 1) on the fingerprint key, top 10."""
    df = _t(spark, sf_dir, "documents").withColumn("fp", _fingerprint())
    return (
        df.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("dup_cnt"), F.min("doc_id").alias("first_doc_id"))
        .filter(F.col("dup_cnt") > 1)
        .orderBy(F.desc("dup_cnt"), F.asc("fp"))
        .limit(10)
        .select(F.md5("fp").alias("fp_hash"), "dup_cnt", "first_doc_id")
    )


def q_ann_cosine_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search: brute-force exact cosine top-10 vs vec_id=0."""
    df = _t(spark, sf_dir, "embeddings")
    qv = df.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    qcol = F.array(*[F.lit(float(x)) for x in qv])
    a = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(a, qcol, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nq = float(sum(float(x) * float(x) for x in qv) ** 0.5)
    sim = dot / (na * F.lit(nq))
    return (
        df.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(sim, 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


def q_candidate_key_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19 inputs: distinct/total ratio per customer column + a 2-col compound."""
    df = _t(spark, sf_dir, "customer")
    total = F.count(F.lit(1))
    return df.agg(
        F.round(F.count_distinct("c_custkey") / total, 6).alias("r_custkey"),
        F.round(F.count_distinct("c_name") / total, 6).alias("r_name"),
        F.round(F.count_distinct("c_nationkey") / total, 6).alias("r_nationkey"),
        F.round(F.count_distinct(F.struct("c_nationkey", "c_name")) / total, 6).alias("r_nation_name"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "profile_nchars": q_profile_nchars,
        "distinct_counts": q_distinct_counts,
        "top10_lang": q_top10_lang,
        "top10_source": q_top10_source,
        "hist_nchars": q_hist_nchars,
        "string_stats_text": q_string_stats_text,
        "money_validation": q_money_validation,
        "date_formats": q_date_formats,
        "tpch_q1": q_tpch_q1,
        "top10_customers_revenue": q_top10_customers_revenue,
        "events_hourly": q_events_hourly,
        "token_stats_by_lang": q_token_stats_by_lang,
        "stopword_hits_by_source": q_stopword_hits_by_source,
        "pii_email_scan": q_pii_email_scan,
        "dedup_exact": q_dedup_exact,
        "dup_groups": q_dup_groups,
        "ann_cosine_top10": q_ann_cosine_top10,
        "candidate_key_ratios": q_candidate_key_ratios,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB)
# ---------------------------------------------------------------------------

_ORACLE: dict[str, str] = {
    "profile_nchars": """
        SELECT count(n_chars) AS cnt,
               count(*) - count(n_chars) AS null_cnt,
               min(n_chars) AS min_v,
               max(n_chars) AS max_v,
               round(avg(n_chars), 6) AS mean_v,
               round(stddev_samp(n_chars), 6) AS stddev_v,
               round(quantile_cont(n_chars::DOUBLE, 0.25), 6) AS p25,
               round(quantile_cont(n_chars::DOUBLE, 0.5), 6) AS p50,
               round(quantile_cont(n_chars::DOUBLE, 0.75), 6) AS p75
        FROM documents
    """,
    "distinct_counts": """
        SELECT 'lang' AS column_name,
               count(DISTINCT CASE WHEN trim(lang) <> '' THEN trim(lang) END) AS distinct_cnt,
               sum(CASE WHEN lang IS NULL OR trim(lang) = '' THEN 1 ELSE 0 END)::BIGINT AS null_cnt
        FROM documents
        UNION ALL
        SELECT 'source',
               count(DISTINCT CASE WHEN trim(source) <> '' THEN trim(source) END),
               sum(CASE WHEN source IS NULL OR trim(source) = '' THEN 1 ELSE 0 END)::BIGINT
        FROM documents
        UNION ALL
        SELECT 'text',
               count(DISTINCT CASE WHEN trim(text) <> '' THEN trim(text) END),
               sum(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END)::BIGINT
        FROM documents
    """,
    "top10_lang": """
        SELECT trim(lang) AS lang, count(*) AS cnt,
               row_number() OVER (ORDER BY count(*) DESC, trim(lang) ASC) AS rank
        FROM documents WHERE lang IS NOT NULL AND trim(lang) <> ''
        GROUP BY trim(lang)
        ORDER BY cnt DESC, lang ASC LIMIT 10
    """,
    "top10_source": """
        SELECT trim(source) AS source, count(*) AS cnt,
               row_number() OVER (ORDER BY count(*) DESC, trim(source) ASC) AS rank
        FROM documents WHERE source IS NOT NULL AND trim(source) <> ''
        GROUP BY trim(source)
        ORDER BY cnt DESC, source ASC LIMIT 10
    """,
    "hist_nchars": """
        WITH b AS (SELECT min(n_chars)::DOUBLE AS mn, max(n_chars)::DOUBLE AS mx FROM documents),
        w AS (SELECT mn, CASE WHEN mx > mn THEN (mx - mn) / 10 ELSE 1.0 END AS width FROM b)
        SELECT least(floor((n_chars - w.mn) / w.width), 9)::INT AS bin,
               count(*) AS cnt,
               round(w.mn + least(floor((n_chars - w.mn) / w.width), 9) * w.width, 6) AS bin_lo,
               round(w.mn + (least(floor((n_chars - w.mn) / w.width), 9) + 1) * w.width, 6) AS bin_hi
        FROM documents, w WHERE n_chars IS NOT NULL
        GROUP BY 1, 3, 4 ORDER BY 1
    """,
    "string_stats_text": """
        SELECT min(length(text)) AS min_len,
               max(length(text)) AS max_len,
               round(avg(length(text)), 6) AS avg_len,
               max(CASE WHEN regexp_matches(text, '[^\\x00-\\x7F]') THEN 1 ELSE 0 END) AS has_non_ascii,
               max(CASE WHEN regexp_matches(text, '[0-9]') THEN 1 ELSE 0 END) AS has_digit
        FROM documents
    """,
    "money_validation": """
        WITH m AS (
          SELECT CASE l_orderkey % 6
                   WHEN 0 THEN printf('%.2f', l_extendedprice)
                   WHEN 1 THEN '$' || printf('%.2f', l_extendedprice)
                   WHEN 2 THEN '(' || printf('%.2f', l_extendedprice) || ')'
                   WHEN 3 THEN printf('%.3f', l_extendedprice)
                   WHEN 4 THEN '1,' || printf('%.2f', l_extendedprice)
                   ELSE ' ' || printf('%.2f', l_extendedprice)
                 END AS amount
          FROM lineitem
        )
        SELECT sum(CASE WHEN regexp_matches(amount, '^[0-9]+\\.[0-9]{2}$') THEN 1 ELSE 0 END)::BIGINT AS valid_cnt,
               sum(CASE WHEN regexp_matches(amount, '^[0-9]+\\.[0-9]{2}$') THEN 0 ELSE 1 END)::BIGINT AS invalid_cnt,
               sum(CASE WHEN contains(amount, '$') THEN 1 ELSE 0 END)::BIGINT AS dollar_cnt,
               sum(CASE WHEN contains(amount, ',') THEN 1 ELSE 0 END)::BIGINT AS comma_cnt,
               sum(CASE WHEN contains(amount, '(') OR contains(amount, ')') THEN 1 ELSE 0 END)::BIGINT AS paren_cnt,
               sum(CASE WHEN regexp_matches(amount, '^[0-9]+(\\.[0-9]*)?$')
                         AND NOT regexp_matches(amount, '^[0-9]+\\.[0-9]{2}$') THEN 1 ELSE 0 END)::BIGINT AS wrong_dec_cnt,
               min(CASE WHEN regexp_matches(amount, '^[0-9]+\\.[0-9]{2}$') THEN amount::DECIMAL(18,2) END)::DOUBLE AS min_valid,
               max(CASE WHEN regexp_matches(amount, '^[0-9]+\\.[0-9]{2}$') THEN amount::DECIMAL(18,2) END)::DOUBLE AS max_valid
        FROM m
    """,
    "date_formats": """
        WITH d AS (
          SELECT CASE
                   WHEN o_orderkey % 50 = 0 THEN '1899' || strftime(o_orderdate, '%m%d')
                   WHEN o_orderkey % 4 = 0 THEN strftime(o_orderdate, '%Y%m%d')
                   WHEN o_orderkey % 4 = 1 THEN strftime(o_orderdate, '%Y-%m-%d')
                   WHEN o_orderkey % 4 = 2 THEN strftime(o_orderdate, '%m/%d/%Y')
                   ELSE strftime(o_orderdate, '%m-%d-%Y')
                 END AS ds
          FROM orders
        )
        SELECT sum(CASE WHEN regexp_matches(ds, '^[0-9]{8}$') AND try_strptime(ds, '%Y%m%d') IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS fmt_yyyymmdd,
               sum(CASE WHEN regexp_matches(ds, '^[0-9]{4}-[0-9]{2}-[0-9]{2}$') AND try_strptime(ds, '%Y-%m-%d') IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS fmt_iso,
               sum(CASE WHEN regexp_matches(ds, '^[0-9]{2}/[0-9]{2}/[0-9]{4}$') AND try_strptime(ds, '%m/%d/%Y') IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS fmt_mdy_slash,
               sum(CASE WHEN regexp_matches(ds, '^[0-9]{2}-[0-9]{2}-[0-9]{4}$') AND try_strptime(ds, '%m-%d-%Y') IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS fmt_mdy_dash,
               sum(CASE WHEN regexp_matches(ds, '^[0-9]{8}$') AND try_strptime(ds, '%Y%m%d') IS NOT NULL
                         AND year(try_strptime(ds, '%Y%m%d')) < 1900 THEN 1 ELSE 0 END)::BIGINT AS out_of_range
        FROM d
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity)::DOUBLE AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS cnt
        FROM lineitem
        WHERE l_shipdate <= '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "top10_customers_revenue": """
        SELECT c_custkey AS custkey, c_name AS name, round(sum(o_totalprice), 4) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, custkey ASC LIMIT 10
    """,
    "events_hourly": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
               event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "token_stats_by_lang": """
        SELECT lang,
               round(avg(len(list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> ''))), 6) AS avg_tokens,
               sum(len(list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')))::BIGINT AS total_tokens,
               max(len(list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> ''))) AS max_tokens
        FROM documents GROUP BY lang
    """,
    "stopword_hits_by_source": """
        WITH t AS (
          SELECT source,
                 len(list_intersect(['the','be','to','of','and','that','have','with','a','in'],
                     list_transform(list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> ''), x -> lower(x)))) AS hits
          FROM documents
        )
        SELECT source, round(avg(hits), 6) AS avg_stopword_hits,
               sum(CASE WHEN hits >= 2 THEN 1 ELSE 0 END)::BIGINT AS docs_with_evidence
        FROM t GROUP BY source
    """,
    "pii_email_scan": """
        SELECT source,
               sum(CASE WHEN regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}') THEN 1 ELSE 0 END)::BIGINT AS docs_with_email,
               sum(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')))::BIGINT AS email_matches
        FROM documents GROUP BY source
    """,
    "dedup_exact": """
        SELECT min(doc_id) AS kept_doc_id
        FROM (SELECT doc_id,
                     array_to_string(list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')[1:5], ' ') AS fp
              FROM documents)
        GROUP BY fp
    """,
    "dup_groups": """
        WITH f AS (
          SELECT doc_id,
                 array_to_string(list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')[1:5], ' ') AS fp
          FROM documents
        )
        SELECT md5(fp) AS fp_hash, count(*) AS dup_cnt, min(doc_id) AS first_doc_id
        FROM f GROUP BY fp HAVING count(*) > 1
        ORDER BY dup_cnt DESC, fp ASC LIMIT 10
    """,
    "ann_cosine_top10": """
        WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_cosine_similarity(embedding::DOUBLE[], q.qe), 4) AS cosine
        FROM embeddings, q WHERE vec_id <> 0
        ORDER BY list_cosine_similarity(embedding::DOUBLE[], q.qe) DESC, vec_id ASC
        LIMIT 10
    """,
    "candidate_key_ratios": """
        SELECT round(count(DISTINCT c_custkey)::DOUBLE / count(*), 6) AS r_custkey,
               round(count(DISTINCT c_name)::DOUBLE / count(*), 6) AS r_name,
               round(count(DISTINCT c_nationkey)::DOUBLE / count(*), 6) AS r_nationkey,
               round(count(DISTINCT (c_nationkey, c_name))::DOUBLE / count(*), 6) AS r_nation_name
        FROM customer
    """,
}


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)
