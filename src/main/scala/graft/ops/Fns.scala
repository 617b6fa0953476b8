package graft.ops

import graft.{Spec, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SURVEY.md §2 category H — scalar-function families.
  *
  * This category carries the highest oracle-dialect risk (SURVEY.md §7 M2);
  * every dialect divergence found by probing DuckDB 1.0 is noted inline:
  * regexp_replace needs 'g' in DuckDB, DuckDB `log` is log10 (`ln` on both
  * sides), DuckDB casts double→int by ROUNDING (Spark truncates → always
  * floor first), DuckDB length/size returns BIGINT (cast Spark's INT up),
  * libm `ln`/`pow` are not correctly-rounded (round those outputs; `sqrt`
  * IS IEEE-exact — emitted raw).
  *
  * Scale: all element-wise codegen'd expressions — no shuffle except the
  * presentation sort; generators (explode) are narrow fan-outs.
  */
object Fns {
  import Tables._

  val all: Seq[Spec] = Seq(
    Spec("fn_string",
      (s, d) => t(s, d, "customer")
        .select(
          col("c_custkey"),
          concat(col("c_name"), lit("/"), col("c_mktsegment")).as("tagged"),
          substring(col("c_name"), 10, 5).as("sub"),
          upper(col("c_mktsegment")).as("up"),
          lower(col("c_name")).as("lo"),
          lpad(col("c_name"), 25, "*").as("padded"),
          trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"),
          length(col("c_name")).cast("long").as("nlen"),
          expr("replace(c_name, 'Customer', 'C')").as("repl"),
          element_at(split(col("c_name"), "#"), 2).as("num_part"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
                c_name || '/' || c_mktsegment AS tagged,
                substring(c_name, 10, 5) AS sub,
                upper(c_mktsegment) AS up,
                lower(c_name) AS lo,
                lpad(c_name, 25, '*') AS padded,
                trim('  ' || c_mktsegment || '  ') AS trimmed,
                CAST(length(c_name) AS BIGINT) AS nlen,
                replace(c_name, 'Customer', 'C') AS repl,
                split_part(c_name, '#', 2) AS num_part
              FROM customer ORDER BY c_custkey""")),

    // Second string tranche — the positional/codepoint family both
    // engines share exactly (initcap and overlay exist only on the Spark
    // side, so they stay out of the oracle surface): translate, repeat,
    // reverse, 1-based instr/strpos, left/right, ascii, chr. All
    // codegen'd element-wise expressions, zero shuffle.
    Spec("fn_string2",
      (s, d) => t(s, d, "nation")
        .select(
          col("n_nationkey"),
          translate(col("n_name"), "AEIOU", "aeiou").as("tr"),
          expr("repeat(n_name, 2)").as("rep"),
          reverse(col("n_name")).as("rev"),
          instr(col("n_name"), "AN").cast("long").as("pos_an"),
          expr("left(n_name, 3)").as("l3"),
          expr("right(n_name, 3)").as("r3"),
          ascii(col("n_name")).cast("long").as("first_code"),
          expr("char(n_nationkey + 65)").as("key_char"))
        .orderBy("n_nationkey"),
      Some("""SELECT n_nationkey,
                translate(n_name, 'AEIOU', 'aeiou') AS tr,
                repeat(n_name, 2) AS rep,
                reverse(n_name) AS rev,
                CAST(strpos(n_name, 'AN') AS BIGINT) AS pos_an,
                left(n_name, 3) AS l3,
                right(n_name, 3) AS r3,
                CAST(ascii(n_name) AS BIGINT) AS first_code,
                chr(n_nationkey + 65) AS key_char
              FROM nation ORDER BY n_nationkey""")),

    Spec("fn_regex",
      (s, d) => t(s, d, "part")
        .where(col("p_type").rlike("^(PROMO|SMALL)"))
        .select(
          col("p_partkey"),
          regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).cast("long").as("brand_num"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          col("p_type"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS BIGINT) AS brand_num,
                regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
                p_type
              FROM part WHERE regexp_matches(p_type, '^(PROMO|SMALL)')
              ORDER BY p_partkey""")),

    Spec("fn_date",
      (s, d) => t(s, d, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dy"),
          date_trunc("month", col("o_orderdate")).cast("date").cast("string").as("month_start"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
          date_add(col("o_orderdate").cast("date"), 30).cast("string").as("plus30"),
          last_day(col("o_orderdate").cast("date")).cast("string").as("eom"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                CAST(year(o_orderdate) AS BIGINT) AS y,
                CAST(month(o_orderdate) AS BIGINT) AS mo,
                CAST(day(o_orderdate) AS BIGINT) AS dy,
                CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
                CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
                CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus30,
                CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS eom
              FROM orders ORDER BY o_orderkey""")),

    Spec("fn_timestamp",
      (s, d) => t(s, d, "events")
        .select(
          col("event_id"),
          unix_timestamp(col("ts")).as("epoch_s"),
          hour(col("ts")).cast("long").as("h"),
          minute(col("ts")).cast("long").as("mi"),
          unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
                CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
                CAST(hour(ts) AS BIGINT) AS h,
                CAST(minute(ts) AS BIGINT) AS mi,
                epoch_us(date_trunc('hour', ts)) AS hour_us
              FROM events ORDER BY event_id""")),

    // INTERVAL literal arithmetic — timestamp + sub-day interval, date +
    // calendar-month interval (both engines CLAMP the day-of-month:
    // Jan 31 + 1 month = Feb 28/29 — asserted by value equality over all
    // orders), and day-difference to a fixed horizon. DuckDB's
    // date+month yields a TIMESTAMP while Spark yields DATE, so both
    // sides cast the result to DATE before the string projection — the
    // semantic (clamped calendar month) is what's compared, not the
    // engine's return type.
    Spec("fn_interval",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          expr("CAST(o_orderdate + INTERVAL '90' MINUTE AS STRING)").as("plus_90m"),
          expr("CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL '1' MONTH AS DATE) AS STRING)")
            .as("plus_1mo"),
          expr("CAST(datediff(DATE '2001-12-31', CAST(o_orderdate AS DATE)) AS BIGINT)")
            .as("days_to_end"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                CAST(o_orderdate + INTERVAL 90 MINUTE AS VARCHAR) AS plus_90m,
                CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS plus_1mo,
                CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-12-31') AS BIGINT) AS days_to_end
              FROM orders ORDER BY o_orderkey""")),

    // DECIMAL scale-propagation arithmetic — the exact-money algebra
    // behind msum, surfaced as its own operator: DECIMAL(12,2) ×
    // DECIMAL(12,2) widens to an exact product type, (1 - discount) at
    // scale 3 multiplies into scale 5, and each group's sum is EXACT
    // (order-free) until the single final cast to double — the pattern a
    // revenue pipeline must use at 100 TB where a double sum drifts with
    // partitioning.
    Spec("fn_decimal_exact",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            col("l_quantity").cast("decimal(12,2)"))
            .cast("double").as("sum_prod"),
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(BigDecimal(1.0)).cast("decimal(3,2)") -
              col("l_discount").cast("decimal(4,3)")))
            .cast("double").as("sum_disc"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                         CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_prod,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                         (CAST(1.0 AS DECIMAL(3,2)) -
                          CAST(l_discount AS DECIMAL(4,3)))) AS DOUBLE) AS sum_disc
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Spec("fn_math",
      (s, d) => t(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
          abs(col("l_discount") - 0.05).as("absd"),
          ceil(col("l_extendedprice") / 1000.0).cast("long").as("ceil_k"),
          floor(col("l_extendedprice") / 1000.0).cast("long").as("floor_k"),
          round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
          sqrt(col("l_quantity")).as("qty_sqrt"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          (col("l_orderkey") % 7).as("okey_mod7"),
          signum(col("l_discount") - 0.05).cast("long").as("disc_sign"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "absd", "disc_sign"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                abs(l_discount - 0.05) AS absd,
                CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS ceil_k,
                CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS floor_k,
                round(pow(l_quantity, 2), 2) AS qty_sq,
                sqrt(l_quantity) AS qty_sqrt,
                round(ln(l_extendedprice), 6) AS ln_price,
                l_orderkey % 7 AS okey_mod7,
                CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign
              FROM lineitem
              ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, absd, disc_sign""")),

    // Second math tranche — trig/inverse-trig/log bases both engines
    // share (sinh/cosh/tanh are Spark-only, left out of the oracle
    // surface). Inputs are exact doubles by construction (quarter-step
    // multiples, exact /8 divisions), every libm output rounded to 6
    // places per the Fns convention (libm sin/cos/atan are not
    // correctly-rounded; 1-ulp variance is real across platforms).
    // factorial is exact integer on both sides (DuckDB widens to
    // HUGEINT — cast back). Element-wise codegen, zero shuffle.
    Spec("fn_math2",
      (s, d) => {
        val x = col("n_nationkey") * lit(0.25) - lit(3.0)
        t(s, d, "nation")
          .select(col("n_nationkey"),
            round(sin(x), 6).as("sin_x"),
            round(cos(x), 6).as("cos_x"),
            round(tan(x), 6).as("tan_x"),
            round(atan(x), 6).as("atan_x"),
            round(atan2(x, lit(2.0)), 6).as("atan2_x"),
            round(asin(x / 8), 6).as("asin_x8"),
            round(acos(x / 8), 6).as("acos_x8"),
            round(degrees(x), 6).as("deg_x"),
            round(radians(col("n_nationkey")), 6).as("rad_k"),
            round(cbrt(x + 4), 6).as("cbrt_x4"),
            factorial(col("n_nationkey") % 10).as("fact_k"),
            round(log2(col("n_nationkey") + 1), 6).as("log2_k"),
            round(log10(col("n_nationkey") + 1), 6).as("log10_k"))
          .orderBy("n_nationkey")
      },
      Some("""SELECT n_nationkey,
                round(sin(n_nationkey * 0.25 - 3.0), 6) AS sin_x,
                round(cos(n_nationkey * 0.25 - 3.0), 6) AS cos_x,
                round(tan(n_nationkey * 0.25 - 3.0), 6) AS tan_x,
                round(atan(n_nationkey * 0.25 - 3.0), 6) AS atan_x,
                round(atan2(n_nationkey * 0.25 - 3.0, 2.0), 6) AS atan2_x,
                round(asin((n_nationkey * 0.25 - 3.0) / 8), 6) AS asin_x8,
                round(acos((n_nationkey * 0.25 - 3.0) / 8), 6) AS acos_x8,
                round(degrees(n_nationkey * 0.25 - 3.0), 6) AS deg_x,
                round(radians(n_nationkey), 6) AS rad_k,
                round(cbrt(n_nationkey * 0.25 + 1.0), 6) AS cbrt_x4,
                CAST(factorial(n_nationkey % 10) AS BIGINT) AS fact_k,
                round(log2(n_nationkey + 1), 6) AS log2_k,
                round(log10(n_nationkey + 1), 6) AS log10_k
              FROM nation ORDER BY n_nationkey""")),

    Spec("fn_conditional",
      (s, d) => t(s, d, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high").as("band"),
          coalesce(expr("nullif(o_orderstatus, 'P')"), lit("PENDING")).as("status_x"),
          least(col("o_totalprice"), lit(100000.0)).as("capped"),
          greatest(col("o_totalprice"), lit(100000.0)).as("floored"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                CASE WHEN o_totalprice < 50000 THEN 'low'
                     WHEN o_totalprice < 150000 THEN 'mid'
                     ELSE 'high' END AS band,
                coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_x,
                least(o_totalprice, 100000.0) AS capped,
                greatest(o_totalprice, 100000.0) AS floored
              FROM orders ORDER BY o_orderkey""")),

    // Bitwise ops — hash-bucket / bitmap arithmetic parity. Shifts keep
    // non-negative operands so arithmetic-vs-logical shift never differs.
    Spec("fn_bitwise",
      (s, d) => t(s, d, "events")
        .select(col("event_id"),
          (col("event_id").bitwiseAND(255L)).as("low8"),
          (col("event_id").bitwiseOR(lit(4096L))).as("with_flag"),
          (col("event_id").bitwiseXOR(col("user_id"))).as("xored"),
          shiftright(col("event_id"), 4).as("shr4"),
          shiftleft(col("event_id").bitwiseAND(15L), 2).as("shl2"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
                event_id & 255 AS low8,
                event_id | 4096 AS with_flag,
                xor(event_id, user_id) AS xored,
                event_id >> 4 AS shr4,
                (event_id & 15) << 2 AS shl2
              FROM events ORDER BY event_id""")),

    // Cryptographic digests — content-addressing / dedup keys at corpus
    // scale. Both engines emit lowercase hex for md5 and sha-256.
    Spec("fn_hash_digest",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), md5(col("text")).as("md5_hex"),
          sha2(col("text"), 256).as("sha256_hex"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
              FROM documents ORDER BY doc_id""")),

    // Clean-value casts only; double→int goes through floor (DuckDB's direct
    // cast rounds, Spark's truncates).
    Spec("fn_cast",
      (s, d) => t(s, d, "orders")
        .select(
          col("o_orderkey"),
          col("o_orderkey").cast("string").as("key_str"),
          col("o_orderkey").cast("string").cast("long").as("key_rt"),
          floor(col("o_totalprice")).cast("long").as("price_floor"),
          (lit("3.5").cast("double") + col("o_totalprice")).as("price_plus"),
          col("o_orderdate").cast("date").cast("string").as("date_str"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                CAST(o_orderkey AS VARCHAR) AS key_str,
                CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_rt,
                CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
                CAST('3.5' AS DOUBLE) + o_totalprice AS price_plus,
                CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
              FROM orders ORDER BY o_orderkey""")),

    // float32 elements cast to double (exact) before any arithmetic/output.
    // Array-valued intermediates (slice, sort_array) are exercised, but the
    // OUTPUT projects scalars / joined strings — array-typed output columns
    // break the driver's pandas hash compare. Integer arrays render
    // identically under array_join/array_to_string; doubles come out as
    // scalar columns h1..h3 (element_at over the sliced array).
    Spec("fn_array",
      (s, d) => {
        val head3 = transform(slice(col("embedding"), 1, 3), x => x.cast("double"))
        t(s, d, "embeddings")
          .select(
            col("vec_id"),
            size(col("embedding")).cast("long").as("dim"),
            element_at(col("embedding"), 1).cast("double").as("first_d"),
            element_at(col("embedding"), 64).cast("double").as("last_d"),
            element_at(head3, 1).as("h1"),
            element_at(head3, 2).as("h2"),
            element_at(head3, 3).as("h3"),
            array_join(sort_array(array(lit(3), lit(1), lit(2))), ",").as("arr_sorted"),
            array_position(array(lit(3), lit(1), lit(2)), 2).cast("long").as("pos_of_2"))
          .orderBy("vec_id")
      },
      Some("""SELECT vec_id,
                CAST(len(embedding) AS BIGINT) AS dim,
                CAST(embedding[1] AS DOUBLE) AS first_d,
                CAST(embedding[64] AS DOUBLE) AS last_d,
                list_transform(list_slice(embedding, 1, 3), x -> CAST(x AS DOUBLE))[1] AS h1,
                list_transform(list_slice(embedding, 1, 3), x -> CAST(x AS DOUBLE))[2] AS h2,
                list_transform(list_slice(embedding, 1, 3), x -> CAST(x AS DOUBLE))[3] AS h3,
                array_to_string(list_sort([3, 1, 2]), ',') AS arr_sorted,
                CAST(list_position([3, 1, 2], 2) AS BIGINT) AS pos_of_2
              FROM embeddings ORDER BY vec_id""")),

    // Higher-order functions. Both engines fold sequentially left-to-right;
    // init 0.0 + x1 ≡ x1, so Spark's aggregate == DuckDB's list_reduce.
    // round(6) as insurance against non-correctly-rounded libm abs-sums.
    Spec("fn_array_lambda",
      (s, d) => t(s, d, "embeddings")
        .select(
          col("vec_id"),
          round(aggregate(
            transform(col("embedding"), x => abs(x.cast("double"))),
            lit(0.0), (acc, x) => acc + x), 6).as("l1_norm"),
          size(filter(col("embedding"), x => x > 0)).cast("long").as("n_pos"),
          element_at(transform(col("embedding"), x => x.cast("double") * 2.0), 1).as("first_x2"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id,
                round(list_reduce(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                  (a, b) -> a + b), 6) AS l1_norm,
                CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
                CAST(embedding[1] AS DOUBLE) * 2.0 AS first_x2
              FROM embeddings ORDER BY vec_id""")),

    // Array tranche 2: structural ops (slice/reverse/flatten/repeat) and
    // SET ops (distinct/intersect). Set-op OUTPUT ORDER is engine-defined
    // on both sides, so every set result is array_sort-ed before the
    // string join — the same canonical-form discipline as fn_map's
    // sorted entries. Spark slice(arr, start, LENGTH) vs DuckDB
    // list_slice(arr, begin, END-inclusive) is the off-by-one to watch:
    // slice(w,3,6) ≡ list_slice(w,3,8).
    Spec("fn_array2",
      (s, d) => {
        val w = split(col("text"), " ")
        t(s, d, "documents")
          .select(col("doc_id"),
            array_join(slice(w, 1, 5), ",").as("first5"),
            array_join(reverse(slice(w, 1, 3)), ",").as("rev3"),
            size(flatten(array(slice(w, 1, 4), array(lit("x")))))
              .cast("long").as("flat_len"),
            array_join(array_sort(array_distinct(slice(w, 1, 8))), ",")
              .as("dist8"),
            array_join(array_repeat(col("lang"), 2), ",").as("lang2"),
            array_min(array(col("doc_id") % 7, col("doc_id") % 13,
              col("doc_id") % 5)).as("amin"),
            array_max(array(col("doc_id") % 7, col("doc_id") % 13,
              col("doc_id") % 5)).as("amax"),
            array_join(array_sort(array_intersect(slice(w, 1, 6),
              slice(w, 3, 6))), ",").as("inter"))
          .orderBy("doc_id")
      },
      Some("""WITH ws AS (
                SELECT doc_id, lang, string_split(text, ' ') AS w
                FROM documents)
              SELECT doc_id,
                array_to_string(list_slice(w, 1, 5), ',') AS first5,
                array_to_string(list_reverse(list_slice(w, 1, 3)), ',') AS rev3,
                CAST(len(flatten([list_slice(w, 1, 4), ['x']])) AS BIGINT)
                  AS flat_len,
                array_to_string(list_sort(list_distinct(list_slice(w, 1, 8))), ',')
                  AS dist8,
                array_to_string([lang, lang], ',') AS lang2,
                CAST(list_min([doc_id % 7, doc_id % 13, doc_id % 5]) AS BIGINT)
                  AS amin,
                CAST(list_max([doc_id % 7, doc_id % 13, doc_id % 5]) AS BIGINT)
                  AS amax,
                array_to_string(list_sort(list_distinct(
                  list_intersect(list_slice(w, 1, 6), list_slice(w, 3, 8)))), ',')
                  AS inter
              FROM ws ORDER BY doc_id""")),

    // Delimited-field extraction: split_part is the SAME function on both
    // engines (1-based, empty string past the end); substring_index has
    // no DuckDB twin, so the oracle states its slice-join desugaring —
    // the k-prefix semantics, not the name, is what's checked.
    Spec("fn_split_part",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          expr("split_part(text, ' ', 2)").as("second_tok"),
          expr("split_part(text, ' ', 9999)").as("past_end"),
          substring_index(col("text"), " ", 3).as("first3"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                split_part(text, ' ', 2) AS second_tok,
                split_part(text, ' ', 9999) AS past_end,
                array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ')
                  AS first3
              FROM documents ORDER BY doc_id""")),

    // Quantifier HOFs — exists / forall over token arrays. DuckDB has no
    // direct exists/forall; the oracle states the equivalent
    // list_contains / filtered-length forms, which is exactly how the
    // quantifiers desugar. All outputs boolean/integer — nothing float.
    Spec("fn_exists_forall",
      (s, d) => {
        val w = split(col("text"), " ")
        t(s, d, "documents")
          .select(col("doc_id"),
            exists(w, t => t === "spark").as("has_spark"),
            forall(w, t => length(t) > 3).as("all_long"),
            size(filter(w, t => t.startsWith("s"))).cast("long").as("n_s"))
          .orderBy("doc_id")
      },
      Some("""WITH ws AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents)
              SELECT doc_id,
                list_contains(w, 'spark') AS has_spark,
                len(list_filter(w, t -> length(t) > 3)) = len(w) AS all_long,
                CAST(len(list_filter(w, t -> t LIKE 's%')) AS BIGINT) AS n_s
              FROM ws ORDER BY doc_id""")),

    // Real map functions on the Spark side (map_from_entries / element_at /
    // explode of a sorted-entry map); the oracle computes the same relation
    // without map types (map output encoding is a cross-engine hash trap).
    Spec("fn_map",
      (s, d) => {
        val counts = t(s, d, "events")
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
        counts.groupBy("user_id")
          .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n"))))).as("m"))
          .select(col("user_id"),
            coalesce(element_at(col("m"), "click"), lit(0L)).as("n_click"),
            explode(col("m")).as(Seq("etype", "n")))
          .select("user_id", "etype", "n", "n_click")
          .orderBy("user_id", "etype")
      },
      Some("""WITH c AS (
                SELECT user_id, event_type AS etype, count(*) AS n
                FROM events GROUP BY user_id, event_type)
              SELECT user_id, etype, n,
                CAST(coalesce(sum(CASE WHEN etype = 'click' THEN n END)
                  OVER (PARTITION BY user_id), 0) AS BIGINT) AS n_click
              FROM c ORDER BY user_id, etype""")),

    Spec("fn_json",
      (s, d) => t(s, d, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_path"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k_struct"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
                CAST(props->>'$.k' AS BIGINT) AS k_path,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct
              FROM events ORDER BY event_id""")),

    // Generator / UDTF surface: posexplode ≡ unnest-with-index (DuckDB has
    // no WITH ORDINALITY; an indexed list_transform lambda supplies it).
    Spec("fn_explode_udtf",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("token"))
        .orderBy("doc_id", "pos"),
      Some("""SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.token
              FROM (SELECT doc_id,
                      unnest(list_transform(string_split(text, ' '),
                        (x, i) -> {'pos': i - 1, 'token': x})) AS u
                    FROM documents)
              ORDER BY doc_id, pos""")),

    // The Spark 4 VARIANT type: parse_json → a binary semi-structured
    // value with typed path extraction (variant_get) — the modern
    // replacement for string-JSON re-parsing on every access; at scale the
    // parse happens once at ingest and every downstream extraction is a
    // cheap binary traversal. try_variant_get covers the missing-path NULL
    // contract. Extracted primitives (never the opaque VARIANT itself) are
    // the output, so the oracle states the same values via DuckDB's JSON
    // operators.
    Spec("fn_variant",
      (s, d) => t(s, d, "events")
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k_variant"),
          expr("try_variant_get(parse_json(props), '$.missing', 'bigint')")
            .as("k_missing"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
                CAST(props->>'$.k' AS BIGINT) AS k_variant,
                CAST(json_extract_string(props, '$.missing') AS BIGINT)
                  AS k_missing
              FROM events ORDER BY event_id""")),

    // stack() — the wide→long generator (n fixed attribute rows per input
    // row), the remaining UDTF form next to explode/posexplode. Pure
    // per-row expansion, no shuffle before the presentation sort; the
    // oracle states the same relation as the UNION ALL it desugars to.
    Spec("fn_stack",
      (s, d) => t(s, d, "customer")
        .selectExpr("c_custkey",
          "stack(2, 'name', c_name, 'segment', c_mktsegment) AS (attr, val)")
        .orderBy("c_custkey", "attr"),
      Some("""SELECT c_custkey, 'name' AS attr, c_name AS val FROM customer
              UNION ALL
              SELECT c_custkey, 'segment' AS attr, c_mktsegment AS val
              FROM customer
              ORDER BY c_custkey, attr""")),

    // Scala UDF surface: a registered deterministic UDF (the 31-ary rolling
    // hash — pure integer arithmetic, same result as the SQL fold). UDFs
    // are the escape hatch of last resort (no codegen, JVM call per row);
    // declared once to cover the surface, with the codegen'd alternative
    // (aggregate HOF / custom Expression) used everywhere else.
    Spec("fn_udf_scala",
      (s, d) => {
        val rollHash = udf { text: String =>
          var acc = 0L
          var i = 0
          while (i < text.length) { acc = (acc * 31 + text.charAt(i).toLong) % 1073741824L; i += 1 }
          acc
        }
        s.udf.register("roll_hash", rollHash)
        t(s, d, "documents")
          .select(col("doc_id"), rollHash(col("text")).as("fp_udf"),
            expr("roll_hash(substring(text, 1, 16))").as("fp_prefix_udf"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(list_filter(string_split_regex(text, ''), ch -> ch <> ''),
                    ch -> CAST(ord(ch) AS BIGINT))),
                  (a, b) -> (a * 31 + b) % 1073741824) AS fp_udf,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(list_filter(string_split_regex(substring(text, 1, 16), ''), ch -> ch <> ''),
                    ch -> CAST(ord(ch) AS BIGINT))),
                  (a, b) -> (a * 31 + b) % 1073741824) AS fp_prefix_udf
              FROM documents ORDER BY doc_id""")),

    Spec("fn_struct_nested",
      (s, d) => t(s, d, "documents")
        .withColumn("s", struct(col("lang").as("lang"), col("n_chars").as("n")))
        .where(col("s.lang") === "en")
        .select(col("doc_id"), col("s.lang").as("slang"), col("s.n").as("sn"))
        .orderBy("doc_id"),
      Some("""WITH tt AS (
                SELECT doc_id, struct_pack(lang := lang, n := n_chars) AS s
                FROM documents)
              SELECT doc_id, s.lang AS slang, s.n AS sn
              FROM tt WHERE s.lang = 'en' ORDER BY doc_id""")),

    // C-style string formatting (Spark format_string ≡ DuckDB printf —
    // both delegate to printf-convention formatters): zero-padded ints,
    // fixed-width floats, hex. The float operands are exactly
    // representable multiples of 0.5, so %8.2f never hits the
    // half-way-rounding divergence between Java's HALF_UP Formatter and
    // C's shortest-representation printf. Per-row codegen'd projection,
    // embarrassingly parallel.
    Spec("fn_printf",
      (s, d) => t(s, d, "nation")
        .select(col("n_nationkey"),
          format_string("%s|%04d|%8.2f|%x",
            col("n_name"), col("n_nationkey"),
            col("n_nationkey") * lit(1.5), col("n_nationkey")).as("formatted"))
        .orderBy("n_nationkey"),
      Some("""SELECT n_nationkey,
                printf('%s|%04d|%8.2f|%x', n_name, n_nationkey,
                  n_nationkey * 1.5, n_nationkey) AS formatted
              FROM nation ORDER BY n_nationkey""")),

    // URL parsing — the web-corpus ingest primitive (host for per-domain
    // dedup/sampling, path/query for boilerplate filters). The URL is
    // CONSTRUCTED from table columns so the oracle can state each parsed
    // component as the ground-truth column it came from: parse_url must
    // invert our own concat, making the check exact with zero dialect
    // risk (DuckDB has no parse_url). url_encode follows java.net
    // URLEncoder ('+' for space, %XX uppercase) — asserted against its
    // literal expansion. All codegen'd expressions, zero shuffle.
    Spec("fn_url",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          concat(lit("https://"), col("source"), lit(".example.org/docs/"),
            col("doc_id"), lit("?lang="), col("lang"), lit("&v=2")).as("url"))
        .select(col("doc_id"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'lang')").as("q_lang"),
          expr("url_encode('a b&c=d')").as("enc"),
          expr("url_decode(url_encode(lang))").as("roundtrip"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                source || '.example.org' AS host,
                '/docs/' || CAST(doc_id AS VARCHAR) AS path,
                lang AS q_lang,
                'a+b%26c%3Dd' AS enc,
                lang AS roundtrip
              FROM documents ORDER BY doc_id""")),

    // XML surface (Spark 4 built-in): from_xml schema-projected parse +
    // the xpath_* scalar family. Same construct-then-parse design as
    // fn_url — the XML is built from table columns (lang/source are
    // alphanumeric, no escaping needed), so the oracle is the identity
    // on the source columns and any parser deviation is a hash miss.
    // DuckDB has no XML functions; the ground-truth-construction oracle
    // sidesteps the dialect gap entirely. Element-wise, zero shuffle.
    Spec("fn_xml",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          concat(lit("<r><id>"), col("doc_id"), lit("</id><lang>"),
            col("lang"), lit("</lang><n>"), col("n_chars"),
            lit("</n></r>")).as("x"))
        .select(col("doc_id"),
          expr("from_xml(x, 'id BIGINT, lang STRING, n BIGINT')").getField("id")
            .as("xid"),
          expr("xpath_string(x, '/r/lang')").as("xlang"),
          expr("xpath_long(x, 'sum(/r/n)')").as("xn"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, doc_id AS xid, lang AS xlang, n_chars AS xn
              FROM documents ORDER BY doc_id"""))
  )
}
