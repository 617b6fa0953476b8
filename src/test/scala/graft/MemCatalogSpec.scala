package graft

import org.scalatest.funsuite.AnyFunSuite

/** V2 TableCatalog plugin: SQL DDL/DML and DataFrameWriterV2 round-trips
  * through catalog identifiers.
  */
class MemCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.graftcat", "graft.sources.MemCatalog")
    s
  }

  test("CREATE / INSERT / SELECT / SHOW / DROP round-trip via SQL") {
    spark.sql("DROP TABLE IF EXISTS graftcat.ns1.t1")
    spark.sql("CREATE TABLE graftcat.ns1.t1 (id BIGINT, name STRING) USING mem")
    spark.sql("INSERT INTO graftcat.ns1.t1 VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val out = spark.sql("SELECT id, name FROM graftcat.ns1.t1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (2L, "b"), (3L, "c")))

    val shown = spark.sql("SHOW TABLES IN graftcat.ns1")
      .collect().map(_.getString(1)).toSeq
    assert(shown.contains("t1"))

    spark.sql("INSERT OVERWRITE graftcat.ns1.t1 VALUES (9, 'z')")
    assert(spark.sql("SELECT count(*) FROM graftcat.ns1.t1").head.getLong(0) == 1)

    spark.sql("DROP TABLE graftcat.ns1.t1")
    intercept[Exception](spark.sql("SELECT * FROM graftcat.ns1.t1").collect())
  }

  test("DataFrameWriterV2 append/overwrite against a catalog table") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graftcat.ns2.n")
    spark.sql("CREATE TABLE graftcat.ns2.n (v BIGINT) USING mem")
    spark.range(0, 100).toDF("v").writeTo("graftcat.ns2.n").append()
    spark.range(0, 50).toDF("v").writeTo("graftcat.ns2.n").append()
    assert(spark.table("graftcat.ns2.n").count() == 150)
    // joins with regular tables work like any relation
    val j = spark.table("graftcat.ns2.n").as("a")
      .join(spark.range(0, 10).toDF("v").as("b"), "v")
    assert(j.count() == 20) // 10 from each append
    spark.sql("DROP TABLE graftcat.ns2.n")
  }

  test("duplicate CREATE fails; RENAME moves data") {
    spark.sql("DROP TABLE IF EXISTS graftcat.ns3.a")
    spark.sql("DROP TABLE IF EXISTS graftcat.ns3.b")
    spark.sql("CREATE TABLE graftcat.ns3.a (v BIGINT) USING mem")
    intercept[Exception](
      spark.sql("CREATE TABLE graftcat.ns3.a (v BIGINT) USING mem"))
    spark.sql("INSERT INTO graftcat.ns3.a VALUES (7)")
    // the TO identifier is catalog-relative (same catalog as the source)
    spark.sql("ALTER TABLE graftcat.ns3.a RENAME TO ns3.b")
    assert(spark.sql("SELECT v FROM graftcat.ns3.b").head.getLong(0) == 7)
    spark.sql("DROP TABLE graftcat.ns3.b")
  }

  test("RENAME to an existing table fails and destroys nothing") {
    spark.sql("DROP TABLE IF EXISTS graftcat.ns4.src")
    spark.sql("DROP TABLE IF EXISTS graftcat.ns4.dst")
    spark.sql("CREATE TABLE graftcat.ns4.src (v BIGINT) USING mem")
    spark.sql("CREATE TABLE graftcat.ns4.dst (v BIGINT) USING mem")
    spark.sql("INSERT INTO graftcat.ns4.src VALUES (1)")
    spark.sql("INSERT INTO graftcat.ns4.dst VALUES (2), (3)")
    intercept[Exception](
      spark.sql("ALTER TABLE graftcat.ns4.src RENAME TO ns4.dst"))
    // both tables intact: no silent overwrite, source not half-moved
    assert(spark.sql("SELECT count(*) FROM graftcat.ns4.dst").head.getLong(0) == 2)
    assert(spark.sql("SELECT v FROM graftcat.ns4.src").head.getLong(0) == 1)
    spark.sql("DROP TABLE graftcat.ns4.src")
    spark.sql("DROP TABLE graftcat.ns4.dst")
  }

  test("namespace listing dedups structurally") {
    spark.sql("DROP TABLE IF EXISTS graftcat.ns5.x")
    spark.sql("DROP TABLE IF EXISTS graftcat.ns5.y")
    spark.sql("CREATE TABLE graftcat.ns5.x (v BIGINT) USING mem")
    spark.sql("CREATE TABLE graftcat.ns5.y (v BIGINT) USING mem")
    val ns = spark.sql("SHOW NAMESPACES IN graftcat")
      .collect().map(_.getString(0)).toSeq
    assert(ns.count(_ == "ns5") == 1, s"duplicate namespace rows: $ns")
    spark.sql("DROP TABLE graftcat.ns5.x")
    spark.sql("DROP TABLE graftcat.ns5.y")
  }
}
