package graft.ops

import org.apache.spark.sql.functions._
import graft.ops.T._

/** Group F (scalar function surface) — SURVEY.md §2b.
  *
  * The reference has no SQL scalar-function surface (NumPy ufuncs play that
  * role, e.g. the -log/clip arithmetic in flexcalc/process.py::preprocess,
  * R4); this group establishes the Spark built-in surface the north star
  * requires. Everything here stays inside WholeStageCodegen — no UDFs.
  *
  * Cross-engine type parity (schema gate): DuckDB length/levenshtein/year/
  * floor return wider types than Spark → explicit casts on BOTH engines;
  * DuckDB regexp_replace needs 'g' to match Spark's replace-all; DuckDB
  * double→int cast rounds while Spark truncates → trunc() spelled out in
  * the oracle; DuckDB sum(BIGINT) is HUGEINT → cast back to BIGINT.
  */
object Functions {

  val queries: Map[String, Q] = Map(
    "f_string" -> ((s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          substring(col("p_name"), 1, 5).as("sub"),
          trim(concat(lit(" "), col("p_name"), lit(" "))).as("tr"),
          lpad(col("p_brand"), 12, "*").as("lp"),
          regexp_replace(col("p_name"), "[aeiou]", "*").as("devowel"),
          translate(col("p_name"), " ", "_").as("underscored"),
          concat_ws("-", col("p_brand"), col("p_type")).as("cw"),
          length(col("p_name")).cast("int").as("len"),
          col("p_name").startsWith("c").as("sw"),
          element_at(split(col("p_name"), " "), 1).as("tok1"),
          size(split(col("p_name"), " ")).cast("int").as("ntok"),
          regexp_extract(col("p_name"), "[a-z]+$", 0).as("last_word"))
        .orderBy("p_partkey")),

    "f_string_distance" -> ((s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"),
          levenshtein(col("p_name"), col("p_type")).cast("int").as("lev"),
          (levenshtein(col("p_name"), col("p_type")).cast("int") / lit(5))
            .cast("int").as("lev_bucket"))
        .orderBy("p_partkey")),

    // REGEX function surface (extract / extract-all / replace / match)
    // — the text-wrangling quartet every cleaning pipeline leans on,
    // graded cross-engine on the lookaround-free character-class
    // subset java.util.regex and DuckDB's RE2 agree on (the same class
    // t_pattern_match relies on; backrefs/lookarounds diverge between
    // the engines and stay out of graded SQL). All four are row-local
    // codegen'd expressions — scan-shaped at any scale.
    "f_regex" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
            .cast("bigint").as("n_words"),
          regexp_extract(col("text"), "[0-9]+", 0).as("first_num"),
          length(regexp_replace(lower(col("text")), "[aeiou]", ""))
            .cast("bigint").as("len_novowel"),
          coalesce(col("text").rlike("data"), lit(false)).as("has_data"))
        .orderBy("doc_id")),

    // Cross-engine-identical hex digests — the basis for dedup/minhash (X).
    "f_hash" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          md5(col("text").cast("binary")).as("md5_hex"),
          sha2(col("text").cast("binary"), 256).as("sha_hex"))
        .orderBy("doc_id")),

    "f_date" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("od", col("o_orderdate").cast("date"))
        .select(
          col("o_orderkey"),
          year(col("od")).cast("int").as("yr"),
          month(col("od")).cast("int").as("mo"),
          dayofmonth(col("od")).cast("int").as("dy"),
          quarter(col("od")).cast("int").as("qtr"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("mon_start"),
          // DATE columns emit as TIMESTAMP_NTZ (§7.3 R6 sibling rule):
          // pandas loads parquet DATE as dtype=object but TIMESTAMP as
          // datetime64 — NTZ keeps both engines' dtypes identical under
          // any hash-based comparator.
          date_add(col("od"), 30).cast("timestamp_ntz").as("d_plus30"),
          datediff(col("od"), lit("1995-01-01").cast("date")).cast("int").as("days_since"),
          last_day(col("od")).cast("timestamp_ntz").as("ld"),
          date_format(col("od"), "E").as("dow"))
        .orderBy("o_orderkey")),

    // Same single-row-group parallelization note as f_cast_try below:
    // without the exchange, 600 k rows × 12 transcendental/rounding
    // columns compute on ONE core before the sort's range exchange
    // (Catalyst keeps the projection below the sort, on the scan tasks).
    "f_math" -> ((s, d) =>
      t(s, d, "lineitem")
        .repartition(col("l_orderkey"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("rnd"),
          floor(col("l_extendedprice")).cast("bigint").as("flr"),
          ceil(col("l_extendedprice")).cast("bigint").as("cl"),
          abs(col("l_discount") - 0.05).as("ab"),
          round(pow(col("l_quantity"), 2), 6).as("pw"),
          round(sqrt(col("l_extendedprice")), 6).as("sq"),
          round(log(col("l_extendedprice")), 6).as("lg"),
          round(log10(col("l_extendedprice")), 6).as("l10"),
          round(exp(col("l_discount")), 6).as("ex"),
          signum(col("l_discount") - 0.05).cast("int").as("sg"),
          pmod(col("l_orderkey"), lit(7)).cast("bigint").as("pm"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
          least(col("l_quantity"), col("l_discount") * 100).as("le"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Truncation-toward-zero semantics pinned on both engines (DuckDB's
    // double→int cast rounds, so the oracle spells trunc()).
    // repartition before the 8-cast projection: the fixture parquet is
    // one row group (unsplittable), so without the exchange 600 k rows
    // of decimal/string/timestamp materialization serialize onto one
    // core; at 100 TB the scan has thousands of splits and the same
    // plan parallelizes without it (the x_text_repetition rationale).
    "f_cast_try" -> ((s, d) =>
      t(s, d, "lineitem")
        .repartition(col("l_orderkey"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_linenumber").cast("double").as("ln_dbl"),
          col("l_quantity").cast("int").as("qty_int"),
          // decimal cast exercised, then emitted as double (§7.3 R6)
          dec(col("l_quantity")).cast("double").as("qty_dec"),
          col("l_linenumber").cast("string").as("ln_str"),
          lit("2024-03-05 12:00:00").cast("timestamp_ntz").as("fixed_ts"),
          expr("try_cast(concat('1', l_returnflag) as int)").as("bad_int"),
          expr("try_cast(l_linenumber as int)").as("ok_int"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Array functions exercised in full; every array-typed result is
    // emitted as a canonical fixed-scale string (§7.3 R6 — the comparator
    // can't hash array cells, and engines disagree on float JSON repr).
    "f_array" -> ((s, d) =>
      t(s, d, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).cast("int").as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("first_val"),
          numArrStr(slice(col("embedding"), 1, 3)).as("first3"),
          array_contains(col("embedding"), element_at(col("embedding"), 1)).as("has_first"),
          numArrStr(sort_array(array_distinct(col("embedding")))).as("distinct_sorted"),
          numArrStr(expr("transform(embedding, x -> cast(x as double) * 2.0)")).as("doubled"),
          numArrStr(expr("filter(embedding, x -> x > 0)")).as("positives"),
          round(expr("aggregate(embedding, cast(0.0 as double), (a, x) -> a + cast(x as double))"), 6)
            .as("emb_sum"))
        .orderBy("vec_id")),

    // Map functions exercised (map_from_entries over sorted entries);
    // emitted as canonical "k:v|k:v" / joined strings (§7.3 R6).
    "f_map" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("lang")
        .agg(map_from_entries(array_sort(collect_list(struct(col("source"), col("cnt")))))
            .as("m"),
          sort_array(collect_list(col("source"))).as("srcs_arr"))
        .select(col("lang"),
          mapStr(col("m")).as("src_counts"),
          strArrStr(col("srcs_arr")).as("srcs"))
        .orderBy("lang")),

    "f_json" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(col("k")).cast("bigint").as("sum_k"),
          count(col("k")).as("n_k"))
        .orderBy("event_type")),

    "f_struct_json" -> ((s, d) =>
      t(s, d, "nation")
        .select(col("n_nationkey"),
          to_json(struct(col("n_nationkey").as("k"), col("n_name").as("name")))
            .as("packed"))
        .orderBy("n_nationkey")),

    // Bit-manipulation surface — per-row &, ^, shifts, popcount feeding
    // the bit_or/bit_and/bit_xor AGGREGATES (the bitmap/bloom/flag-word
    // primitives x_dedup_bloom and x_sample_split build on). All-integer
    // arithmetic — exact on both engines; one narrow scan-side
    // projection into a tiny 3-group aggregate.
    "f_bitwise" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_returnflag"),
          col("l_orderkey").bitwiseAND(lit(255L)).as("band"),
          col("l_orderkey").bitwiseXOR(col("l_linenumber").cast("bigint"))
            .as("bxor"),
          shiftleft(col("l_linenumber"), 3).as("shl"),
          shiftright(col("l_orderkey"), 2).as("shr"),
          bit_count(col("l_orderkey")).as("bcnt"))
        .groupBy("l_returnflag")
        .agg(bit_or(col("band")).as("or_band"),
          bit_and(col("band")).as("and_band"),
          bit_xor(col("bxor")).as("xor_all"),
          sum(col("bcnt").cast("bigint")).as("sum_popcnt"),
          max(col("shl")).as("max_shl"),
          min(col("shr")).as("min_shr"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"))
  )

  val oracleSql: Map[String, String] = Map(
    "f_regex" ->
      ("SELECT doc_id, " +
        "CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_words, " +
        "regexp_extract(text, '[0-9]+') AS first_num, " +
        "CAST(length(regexp_replace(lower(text), '[aeiou]', '', 'g')) AS BIGINT) AS len_novowel, " +
        "coalesce(regexp_matches(text, 'data'), false) AS has_data " +
        "FROM documents ORDER BY doc_id"),
    "f_string" ->
      ("SELECT p_partkey, upper(p_name) AS up, substring(p_name, 1, 5) AS sub, " +
        "trim(' ' || p_name || ' ') AS tr, lpad(p_brand, 12, '*') AS lp, " +
        "regexp_replace(p_name, '[aeiou]', '*', 'g') AS devowel, " +
        "replace(p_name, ' ', '_') AS underscored, " +
        "concat_ws('-', p_brand, p_type) AS cw, " +
        "CAST(length(p_name) AS INTEGER) AS len, " +
        "starts_with(p_name, 'c') AS sw, " +
        "string_split(p_name, ' ')[1] AS tok1, " +
        "CAST(len(string_split(p_name, ' ')) AS INTEGER) AS ntok, " +
        "regexp_extract(p_name, '[a-z]+$', 0) AS last_word " +
        "FROM part ORDER BY p_partkey"),
    "f_string_distance" ->
      ("SELECT p_partkey, CAST(levenshtein(p_name, p_type) AS INTEGER) AS lev, " +
        "CAST(trunc(CAST(levenshtein(p_name, p_type) AS INTEGER) / 5) AS INTEGER) AS lev_bucket " +
        "FROM part ORDER BY p_partkey"),
    "f_hash" ->
      ("SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha_hex " +
        "FROM documents ORDER BY doc_id"),
    "f_date" ->
      ("SELECT o_orderkey, CAST(year(od) AS INTEGER) AS yr, CAST(month(od) AS INTEGER) AS mo, " +
        "CAST(day(od) AS INTEGER) AS dy, CAST(quarter(od) AS INTEGER) AS qtr, " +
        "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start, " +
        "CAST(od + 30 AS TIMESTAMP) AS d_plus30, " +
        "CAST(od - DATE '1995-01-01' AS INTEGER) AS days_since, " +
        "CAST(last_day(od) AS TIMESTAMP) AS ld, " +
        "strftime(od, '%a') AS dow " +
        "FROM (SELECT *, CAST(o_orderdate AS DATE) AS od FROM orders) ORDER BY o_orderkey"),
    "f_math" ->
      ("SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS rnd, " +
        "CAST(floor(l_extendedprice) AS BIGINT) AS flr, " +
        "CAST(ceil(l_extendedprice) AS BIGINT) AS cl, " +
        "abs(l_discount - 0.05) AS ab, round(pow(l_quantity, 2), 6) AS pw, " +
        "round(sqrt(l_extendedprice), 6) AS sq, round(ln(l_extendedprice), 6) AS lg, " +
        "round(log10(l_extendedprice), 6) AS l10, round(exp(l_discount), 6) AS ex, " +
        "CAST(sign(l_discount - 0.05) AS INTEGER) AS sg, " +
        "CAST(l_orderkey % 7 AS BIGINT) AS pm, " +
        "greatest(l_quantity, l_discount * 100) AS gr, " +
        "least(l_quantity, l_discount * 100) AS le " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "f_cast_try" ->
      ("SELECT l_orderkey, l_linenumber, CAST(l_linenumber AS DOUBLE) AS ln_dbl, " +
        "CAST(trunc(l_quantity) AS INTEGER) AS qty_int, " +
        "CAST(CAST(l_quantity AS DECIMAL(38,6)) AS DOUBLE) AS qty_dec, " +
        "CAST(l_linenumber AS VARCHAR) AS ln_str, " +
        "TIMESTAMP '2024-03-05 12:00:00' AS fixed_ts, " +
        "TRY_CAST('1' || l_returnflag AS INTEGER) AS bad_int, " +
        "TRY_CAST(l_linenumber AS INTEGER) AS ok_int " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "f_array" ->
      ("SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim, " +
        "round(CAST(embedding[1] AS DOUBLE), 6) AS first_val, " +
        "coalesce(list_aggregate(list_transform(embedding[1:3], " +
        "x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,6)) AS VARCHAR)), 'string_agg', ','), '') AS first3, " +
        "list_contains(embedding, embedding[1]) AS has_first, " +
        "coalesce(list_aggregate(list_transform(list_sort(list_distinct(embedding)), " +
        "x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,6)) AS VARCHAR)), 'string_agg', ','), '') AS distinct_sorted, " +
        "coalesce(list_aggregate(list_transform(embedding, " +
        "x -> CAST(CAST(CAST(x AS DOUBLE) * 2.0 AS DECIMAL(28,6)) AS VARCHAR)), 'string_agg', ','), '') AS doubled, " +
        "coalesce(list_aggregate(list_transform(list_filter(embedding, x -> x > 0), " +
        "x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,6)) AS VARCHAR)), 'string_agg', ','), '') AS positives, " +
        "round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 6) AS emb_sum " +
        "FROM embeddings ORDER BY vec_id"),
    "f_map" ->
      ("SELECT lang, coalesce(string_agg(source || ':' || CAST(cnt AS VARCHAR), '|' ORDER BY source), '') AS src_counts, " +
        "coalesce(string_agg(source, ',' ORDER BY source), '') AS srcs FROM " +
        "(SELECT lang, source, count(*) AS cnt FROM documents GROUP BY lang, source) " +
        "GROUP BY lang ORDER BY lang"),
    "f_json" ->
      ("SELECT event_type, min(k) AS min_k, max(k) AS max_k, " +
        "CAST(sum(k) AS BIGINT) AS sum_k, count(k) AS n_k FROM " +
        "(SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) " +
        "GROUP BY event_type ORDER BY event_type"),
    "f_struct_json" ->
      ("SELECT n_nationkey, CAST(to_json(struct_pack(k := n_nationkey, name := n_name)) AS VARCHAR) AS packed " +
        "FROM nation ORDER BY n_nationkey"),
    // DuckDB: xor() is the function form; bit_count returns TINYINT →
    // cast; << / >> and & match Spark's two's-complement semantics on
    // BIGINT. Aggregate bit_or/bit_and/bit_xor exist on both engines.
    "f_bitwise" ->
      ("WITH b AS (SELECT l_returnflag, " +
        "l_orderkey & 255 AS band, " +
        "xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS bxor, " +
        "l_linenumber << 3 AS shl, " +
        "l_orderkey >> 2 AS shr, " +
        "CAST(bit_count(l_orderkey) AS INTEGER) AS bcnt FROM lineitem) " +
        "SELECT l_returnflag, bit_or(band) AS or_band, bit_and(band) AS and_band, " +
        "bit_xor(bxor) AS xor_all, CAST(sum(bcnt) AS BIGINT) AS sum_popcnt, " +
        "max(shl) AS max_shl, min(shr) AS min_shr, count(*) AS n " +
        "FROM b GROUP BY l_returnflag ORDER BY l_returnflag")
  )
}
