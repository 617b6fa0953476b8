package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the NORMALIZED schema of every driver testdata table, as seen
  * through [[Tables.t]].
  *
  * Why this exists (round-8 lesson): the driver regenerated testdata
  * between rounds 6 and 7, switching `events.ts` from nanosecond parquet
  * to tz-less microseconds. Nothing in the repo noticed until the bench
  * reported 72 opaque per-query failures. Physical encodings may drift
  * again; this spec makes the drift fail HERE, with a message naming the
  * table and column, so the fix (extend the normalization seam in
  * Tables.scala) is a one-file change instead of a forensic session.
  *
  * The pin is on the post-normalization Spark schema — the contract every
  * query in the repo compiles against — not on the parquet physical type,
  * which [[Tables.events]] is explicitly allowed to vary over.
  */
class SchemaDriftSpec extends AnyFunSuite {
  private val expected: Map[String, String] = Map(
    "region" -> "r_regionkey:int,r_name:string",
    "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
    "customer" -> ("c_custkey:bigint,c_name:string,c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string"),
    "supplier" -> ("s_suppkey:bigint,s_name:string,s_nationkey:int," +
      "s_acctbal:double"),
    "part" -> ("p_partkey:bigint,p_name:string,p_brand:string," +
      "p_type:string,p_size:int,p_retailprice:double"),
    "orders" -> ("o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string," +
      "o_totalprice:double,o_orderdate:timestamp_ntz," +
      "o_orderpriority:string"),
    "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint," +
      "l_linenumber:int,l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_tax:double,l_returnflag:string," +
      "l_linestatus:string,l_shipdate:timestamp_ntz"),
    // `ts` must be TIMESTAMP (LTZ, session pinned UTC) regardless of the
    // parquet generation's physical encoding — that is Tables.events's job.
    "events" -> ("event_id:bigint,ts:timestamp,user_id:bigint," +
      "event_type:string,value:double,props:string"),
    "documents" -> ("doc_id:bigint,text:string,lang:string,source:string," +
      "n_chars:bigint"),
    "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int")

  private def render(name: String): String =
    Tables.t(TestSpark.spark, TestSpark.sf, name)
      .schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")

  for (name <- Tables.names)
    test(s"$name normalized schema is pinned") {
      val got = render(name)
      assert(got == expected(name),
        s"\nTestdata schema drift in '$name'.\n  expected ${expected(name)}\n  got      $got\n" +
          "The driver likely regenerated /root/testdata with a new physical " +
          "encoding. Extend the normalization seam in Tables.scala (see " +
          "Tables.events) so downstream queries keep seeing this schema, " +
          "then update this pin only if the LOGICAL schema truly changed.")
    }

  test("every table is non-empty at the smoke scale factor") {
    for (name <- Tables.names)
      assert(Tables.t(TestSpark.spark, TestSpark.sf, name).limit(1).count() == 1L,
        s"table '$name' read empty from ${TestSpark.sf}")
  }

  test("fixture density pin: at most 18 lineitems per order") {
    // agg_compound_product folds Π(100 + d) into DECIMAL(38,0): 111^18
    // ≈ 6.6e36 fits, 19 factors can overflow to an ANSI error rather
    // than degrade. The generator has produced ≤17 lines per order every
    // round; if a regen crosses 18 this pin makes the failure
    // diagnosable (r8 advice) — rework that query's accumulator before
    // raising the bound.
    import org.apache.spark.sql.functions._
    val mx = Tables.t(TestSpark.spark, TestSpark.sf, "lineitem")
      .groupBy("l_orderkey").count().agg(max("count")).head().getLong(0)
    assert(mx <= 18L,
      s"testdata regen produced an order with $mx lineitems — " +
        "agg_compound_product's DECIMAL(38,0) numerator can overflow; " +
        "see its scaladoc for the headroom analysis")
  }
}
