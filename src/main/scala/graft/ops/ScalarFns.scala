package graft.ops

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function families — the MySQL built-in surface reachable
  * through the reference's passthrough (/root/reference/main.go:106),
  * mapped family-by-family per SURVEY.md §2.2.
  *
  * Everything here is `org.apache.spark.sql.functions._` — codegen'd
  * Catalyst expressions that stay inside whole-stage codegen, never Scala
  * UDFs. That's the 100 TB posture: a scalar projection should add zero
  * boundary-crossings to the scan pipeline.
  *
  * Dialect notes baked into the oracles: DuckDB `regexp_replace` needs
  * the 'g' flag to match Spark's replace-all; DuckDB `ceil/floor` return
  * DOUBLE (Spark: BIGINT) so the oracle casts; DuckDB `sign` returns INT
  * (Spark signum: DOUBLE); DuckDB CAST(double AS INT) rounds where Spark
  * truncates, so double→int goes through trunc().
  */
object ScalarFns {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // String family: CONCAT/SUBSTRING/UPPER/LOWER/TRIM/REPLACE/LENGTH/
    // LPAD/INSTR (main.go has none of these — all delegated).
    "q50_string_fns" -> ((s, d) =>
      T.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          lower(col("p_brand")).as("lo_brand"),
          substring(col("p_type"), 1, 5).as("type_pre"),
          length(col("p_name")).as("name_len"),
          trim(col("p_name")).as("trimmed"),
          regexp_replace(col("p_name"), " ", "_").as("snake"),
          lpad(col("p_size").cast("string"), 5, "0").as("size_pad"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          instr(col("p_name"), "a").as("first_a"))
        .orderBy(col("p_partkey"))),

    // Regex family: REGEXP/RLIKE surface.
    "q51_regex_fns" -> ((s, d) =>
      T.part(s, d)
        .select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "*").as("no_vowels"),
          col("p_name").rlike("^[a-m]").as("starts_low"))
        .orderBy(col("p_partkey"))),

    // Date/time family on real temporals — a deliberate fidelity upgrade
    // over the reference, which stringifies all temporals
    // (/root/reference/main.go:138-140).
    "q52_date_fns" -> ((s, d) =>
      T.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          datediff(to_date(lit("2002-01-01")), to_date(col("o_orderdate"))).as("days_to_2002"),
          date_add(to_date(col("o_orderdate")), 30).as("plus_30d"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy(col("o_orderkey"))),

    // Math family.
    "q53_math_fns" -> ((s, d) =>
      T.lineitem(s, d)
        .filter(col("l_suppkey") <= 10)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          abs(col("l_discount") - 0.05).as("abs_d"),
          // ×2 keeps 2-decimal inputs exact; a ×0.1 would land on .xx5
          // rounding boundaries where engines disagree on binary doubles.
          round(col("l_extendedprice") * 2, 2).as("double_p"),
          ceil(col("l_extendedprice")).as("ceil_p"),
          floor(col("l_extendedprice")).as("floor_p"),
          (col("l_orderkey") % 7).as("mod7"),
          round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
          round(sqrt(col("l_extendedprice")), 4).as("sqrt_p"),
          round(log(col("l_extendedprice")), 6).as("ln_p"),
          signum(col("l_discount") - 0.05).as("sign_d"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))),

    // Conditional / null family: IF/IFNULL/NULLIF/COALESCE/GREATEST/LEAST.
    "q54_conditional" -> ((s, d) =>
      T.customer(s, d)
        .select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "overdrawn").otherwise("ok").as("status"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("SUPPRESSED")).as("seg"),
          round(greatest(col("c_acctbal"), lit(0.0)), 2).as("bal_floor0"),
          round(least(col("c_acctbal"), lit(1000.0)), 2).as("bal_cap1k"))
        .orderBy(col("c_custkey"))),

    // Cast/convert family. The reference's only "type system" is the
    // cast-everything-to-string switch (/root/reference/main.go:131-148);
    // here casts are explicit and lossless unless asked.
    "q55_cast" -> ((s, d) =>
      T.lineitem(s, d)
        .filter(col("l_suppkey") <= 5)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_orderkey").cast("string").as("key_str"),
          col("l_extendedprice").cast("int").as("price_int"),
          col("l_linenumber").cast("double").as("ln_dbl"),
          col("l_quantity").cast("string").as("qty_str"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))),

    // JSON family on events.props (MySQL 5.7 JSON_EXTRACT/JSON_UNQUOTE
    // surface). Spark side uses real JSON parsing (get_json_object); the
    // oracle extracts the same scalar via regex to stay engine-neutral.
    "q56_json_fns" -> ((s, d) =>
      T.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"),
          get_json_object(col("props"), "$.missing").as("k_missing"))
        .orderBy(col("event_id"))),

    // JSON_TABLE analog (MySQL 8.0.4): shred a JSON ARRAY document into
    // rows with ordinality and typed columns. The array document is
    // derived from the real events table (to_json over each user's
    // ordered events — the serialize half), then shredded back with
    // from_json(schema) + posexplode (the JSON_TABLE half), so the
    // query exercises the full round-trip through real JSON machinery.
    // The oracle states the SEMANTICS relationally (ordinality = dense
    // order by event_id) — mechanism-independent, as an oracle should
    // be. Shapes: one user-keyed agg, then a projection explode.
    "q103_json_table" -> ((s, d) => {
      val docJson = T.events(s, d)
        .groupBy(col("user_id"))
        .agg(to_json(sort_array(collect_list(struct(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))))).as("j"))
      docJson
        .select(col("user_id"),
          posexplode(from_json(col("j"),
            lit("array<struct<event_id:bigint,k:int>>"))).as(Seq("ord", "e")))
        .select(col("user_id"), col("ord"),
          col("e.event_id").as("event_id"), col("e.k").as("k"))
        .orderBy(col("user_id"), col("ord"))
    }),

    // Array/map higher-order functions on the embeddings table — absent
    // from the MySQL scalar surface, required by the north-star vector
    // ops (SURVEY.md §2.2 array/map row). All higher-order: no UDFs.
    "q57_array_fns" -> ((s, d) =>
      T.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("e1"),
          round(aggregate(col("embedding"), lit(0.0),
                          (acc, x) => acc + x.cast("double")), 4).as("vec_sum"),
          round(array_max(col("embedding")).cast("double"), 6).as("vmax"),
          size(filter(col("embedding"), x => x > 0)).as("n_pos"))
        .orderBy(col("vec_id"))),

    // MapType surface: JSON → map<string,int>, element access, key
    // introspection, transform_values — all higher-order built-ins.
    // (MySQL has no map type; this is the SURVEY §2.2 array/map
    // extension row.)
    "q79_map_fns" -> ((s, d) =>
      T.events(s, d)
        .withColumn("m", from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.IntegerType)))
        .select(
          col("event_id"),
          element_at(col("m"), "k").as("k_int"),
          size(map_keys(col("m"))).as("n_keys"),
          element_at(transform_values(col("m"), (_, v) => v * 2), "k").as("k_doubled"))
        .orderBy(col("event_id"))),

    // Bit functions (MySQL & | ^ << >> BIT_COUNT HEX surface). DuckDB
    // traps: '^' is POWER there (xor() is the function); bit_count
    // returns TINYINT (cast).
    "q58_bit_fns" -> ((s, d) =>
      T.orders(s, d)
        .select(col("o_orderkey"),
          col("o_orderkey").bitwiseAND(lit(255L)).as("band"),
          col("o_orderkey").bitwiseOR(lit(16L)).as("bor"),
          col("o_orderkey").bitwiseXOR(col("o_custkey")).as("bxor"),
          shiftleft(col("o_orderkey") % 1024, 2).as("shl"),
          shiftright(col("o_orderkey"), 3).as("shr"),
          bit_count(col("o_orderkey")).as("nbits"),
          hex(col("o_orderkey")).as("okey_hex"))
        .orderBy(col("o_orderkey")))
  )

  val oracle: Map[String, String] = Map(
    "q50_string_fns" ->
      """SELECT p_partkey,
        | upper(p_name) AS up_name,
        | lower(p_brand) AS lo_brand,
        | substr(p_type, 1, 5) AS type_pre,
        | CAST(length(p_name) AS INTEGER) AS name_len,
        | trim(p_name) AS trimmed,
        | replace(p_name, ' ', '_') AS snake,
        | lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_pad,
        | p_brand || ':' || p_type AS brand_type,
        | CAST(instr(p_name, 'a') AS INTEGER) AS first_a
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q51_regex_fns" ->
      """SELECT p_partkey,
        | regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        | regexp_replace(p_name, '[aeiou]', '*', 'g') AS no_vowels,
        | regexp_matches(p_name, '^[a-m]') AS starts_low
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q52_date_fns" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INTEGER) AS yr,
        | CAST(month(o_orderdate) AS INTEGER) AS mo,
        | CAST(day(o_orderdate) AS INTEGER) AS dom,
        | CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        | strftime(o_orderdate, '%Y-%m') AS ym,
        | CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
        | CAST(o_orderdate AS DATE) + 30 AS plus_30d,
        | CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q53_math_fns" ->
      """SELECT l_orderkey, l_linenumber, l_partkey,
        | abs(l_discount - 0.05) AS abs_d,
        | round(l_extendedprice * 2, 2) AS double_p,
        | CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
        | CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
        | l_orderkey % 7 AS mod7,
        | round(power(l_quantity, 2), 2) AS qty_sq,
        | round(sqrt(l_extendedprice), 4) AS sqrt_p,
        | round(ln(l_extendedprice), 6) AS ln_p,
        | CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_d
        |FROM lineitem WHERE l_suppkey <= 10
        |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin,

    "q54_conditional" ->
      """SELECT c_custkey,
        | CASE WHEN c_acctbal < 0 THEN 'overdrawn' ELSE 'ok' END AS status,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS seg,
        | round(greatest(c_acctbal, 0.0), 2) AS bal_floor0,
        | round(least(c_acctbal, 1000.0), 2) AS bal_cap1k
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q55_cast" ->
      """SELECT l_orderkey, l_linenumber, l_partkey,
        | CAST(l_orderkey AS VARCHAR) AS key_str,
        | CAST(trunc(l_extendedprice) AS INTEGER) AS price_int,
        | CAST(l_linenumber AS DOUBLE) AS ln_dbl,
        | CAST(l_quantity AS VARCHAR) AS qty_str
        |FROM lineitem WHERE l_suppkey <= 5
        |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin,

    "q56_json_fns" ->
      """SELECT event_id,
        | regexp_extract(props, '"k": ([0-9]+)', 1) AS k_str,
        | CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k_int,
        | CAST(NULL AS VARCHAR) AS k_missing
        |FROM events ORDER BY event_id""".stripMargin,

    "q103_json_table" ->
      """WITH o AS (
        |  SELECT user_id, event_id,
        |         CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k
        |  FROM events
        |)
        |SELECT user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INT) AS ord,
        |       event_id, k
        |FROM o ORDER BY user_id, ord""".stripMargin,

    "q57_array_fns" ->
      """SELECT vec_id,
        | CAST(len(embedding) AS INTEGER) AS dim,
        | round(CAST(embedding[1] AS DOUBLE), 6) AS e1,
        | round(list_reduce(CAST(embedding AS DOUBLE[]), (a, b) -> a + b), 4) AS vec_sum,
        | round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS vmax,
        | CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q79_map_fns" ->
      """SELECT event_id,
        | CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k_int,
        | CAST(1 AS INTEGER) AS n_keys,
        | CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) * 2 AS k_doubled
        |FROM events ORDER BY event_id""".stripMargin,

    "q58_bit_fns" ->
      """SELECT o_orderkey,
        | o_orderkey & 255 AS band,
        | o_orderkey | 16 AS bor,
        | xor(o_orderkey, o_custkey) AS bxor,
        | (o_orderkey % 1024) << 2 AS shl,
        | o_orderkey >> 3 AS shr,
        | CAST(bit_count(o_orderkey) AS INTEGER) AS nbits,
        | to_hex(o_orderkey) AS okey_hex
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
