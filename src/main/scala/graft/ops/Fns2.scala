package graft.ops

import graft.{Spec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2 category H (round 8) — Spark-4 surfaces with no earlier
  * row: collation-aware comparison semantics and the try_* ANSI-safe
  * arithmetic family (the session runs ANSI mode, Spark 4's default, so
  * un-guarded division/indexing THROWS — try_* is the idiomatic
  * null-on-error escape).
  */
object Fns2 {
  import Tables._

  val all: Seq[Spec] = Seq(
    // Collation semantics (Spark 4 `collate`): the same mixed-case string
    // column counted distinct under UTF8_BINARY vs UTF8_LCASE. The
    // mixed-case input is constructed deterministically (even partkeys
    // upper-cased), and the LCASE distinct equals the count of
    // case-insensitive equivalence classes — which is what the oracle
    // states with count(DISTINCT lower(s)), no DuckDB collation needed.
    // Collation changes the COMPARISON, not the bytes, so the hash agg
    // plan is unchanged — one shuffle at the (type) grain.
    Spec("fn_collation",
      (s, d) => {
        val p = t(s, d, "part").select(col("p_type"),
          when(col("p_partkey") % 2 === 0, upper(col("p_name")))
            .otherwise(col("p_name")).as("s"))
        p.groupBy(col("p_type"))
          .agg(countDistinct(col("s")).as("n_binary"),
            countDistinct(expr("collate(s, 'UTF8_LCASE')")).as("n_lcase"))
          .orderBy("p_type")
      },
      Some("""SELECT p_type,
                count(DISTINCT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name)
                                    ELSE p_name END) AS n_binary,
                count(DISTINCT lower(CASE WHEN p_partkey % 2 = 0 THEN upper(p_name)
                                          ELSE p_name END)) AS n_lcase
              FROM part GROUP BY p_type ORDER BY p_type""")),

    // try_* ANSI-safe arithmetic: try_divide nulls out the qty=25 rows
    // (where the divisor hits zero — plain `/` throws under ANSI), and
    // try_element_at nulls out-of-bounds array indexes (l_linenumber > 3).
    // The audit aggregates the null counts exactly and sums the defined
    // quotients floor-scaled to BIGINT ten-thousandths: floor has no tie
    // case, so unlike round() — whose half-way behavior on doubles
    // differs between Spark (decimal-repr HALF_UP) and DuckDB (binary
    // rounding) — the scaled sum is exact and bit-identical.
    Spec("fn_try_arith",
      (s, d) => t(s, d, "lineitem")
        .select(
          try_divide(col("l_extendedprice"), col("l_quantity") - 25).as("q"),
          try_element_at(array(lit("a"), lit("b"), lit("c")),
            col("l_linenumber")).as("e"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("q").isNull, 1L).otherwise(0L)).as("n_div_null"),
          sum(floor(col("q") * 10000)).as("sum_quotient_scaled"),
          sum(when(col("e").isNull, 1L).otherwise(0L)).as("n_elem_null")),
      Some("""SELECT count(*) AS n_rows,
                CAST(sum(CASE WHEN l_quantity = 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
                CAST(sum(CASE WHEN l_quantity = 25 THEN NULL
                         ELSE CAST(floor(l_extendedprice / (l_quantity - 25) * 10000) AS BIGINT)
                         END) AS BIGINT) AS sum_quotient_scaled,
                CAST(sum(CASE WHEN l_linenumber > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_elem_null
              FROM lineitem""")),

    // AES-GCM encrypt/decrypt round trip — the column-level-encryption
    // primitive (PII vaulting, envelope encryption). GCM picks a random
    // IV per call, so the CIPHERTEXT is non-deterministic and never
    // emitted; what IS deterministic — and what the oracle pins — is the
    // inverse property (decrypt ∘ encrypt = id, checked per row) and the
    // ciphertext LENGTH (12-byte IV + payload + 16-byte tag). DuckDB has
    // no AES surface, so the oracle states the algebraic expectation
    // directly: ok = true, ct_len = octet_length(text) + 28 — BYTE
    // length, because Spark's length() on the BINARY ciphertext counts
    // bytes; a non-ASCII fixture regen (lang includes 'zh') keeps parity
    // where a char-count expectation would silently break (r8 advice).
    // Pure per-row codegen'd work — no shuffle, scan-bound at any scale.
    Spec("fn_aes_roundtrip",
      (s, d) => t(s, d, "documents")
        .withColumn("ct",
          expr("aes_encrypt(text, '0123456789abcdef', 'GCM')"))
        .select(col("doc_id"),
          (expr("cast(aes_decrypt(ct, '0123456789abcdef', 'GCM') as string)")
            === col("text")).as("ok"),
          length(col("ct")).cast("long").as("ct_len"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, true AS ok,
                CAST(octet_length(CAST(text AS BLOB)) + 28 AS BIGINT) AS ct_len
              FROM documents ORDER BY doc_id""")),

    // Spark `mask()` — the built-in data-redaction scalar (upper→X,
    // lower→x, digit→n, other kept). The fixture text is lowercase words
    // + spaces, and a digit-bearing variant is synthesized per row, so
    // both character classes are exercised; DuckDB has no mask(), so the
    // oracle states the class-by-class regexp_replace desugaring, plus a
    // custom-replacement variant (mask(s, '#', '*', '0')). Pure per-row
    // codegen'd work.
    Spec("fn_mask",
      (s, d) => t(s, d, "documents")
        .withColumn("tagged", concat(col("text"), lit(" id"), col("doc_id")))
        .select(col("doc_id"),
          expr("mask(tagged)").as("masked_default"),
          expr("mask(tagged, '#', '*', '0')").as("masked_custom"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(
                  text || ' id' || doc_id,
                  '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
                  AS masked_default,
                regexp_replace(regexp_replace(regexp_replace(
                  text || ' id' || doc_id,
                  '[A-Z]', '#', 'g'), '[a-z]', '*', 'g'), '[0-9]', '0', 'g')
                  AS masked_custom
              FROM documents ORDER BY doc_id""")))
}
