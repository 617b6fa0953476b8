package graft.ops

import graft.{Spec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2 categories A (scans) and B (projection / filter).
  *
  * Scale notes: every query here is a single parquet scan with the filter
  * and projection pushed into the scan (verify `PushedFilters`/`ReadSchema`
  * in explain) — at 100 TB these stay embarrassingly parallel, no shuffle
  * except the final presentation sort required by the oracle hash.
  */
object Rel {
  import Tables._

  /** events rewritten once PER SF as a hive-style `event_type=.../`
    * partition layout — the directory structure a 100 TB deployment uses
    * (date/tenant dirs) so that partition values prune at PLANNING time,
    * before any file is opened.
    *
    * Unlike StreamRunner's per-session temp batches (whose content varies
    * per cacheKey), this is a deterministic function of the sf input, so
    * it persists as a CROSS-JVM fixture at a path derived from the sf dir:
    * exactly one copy per sf ever exists (no per-run /tmp growth), and
    * later JVMs (the bench run in particular) reuse it instead of paying
    * the rewrite inside a timed query. Written to a staging dir + atomic
    * rename so a concurrent first-writer race yields one winner.
    */
  private def partitionedEvents(s: SparkSession, d: String): DataFrame = {
    val dest = new java.io.File(
      s"/tmp/graft_evpart_${Integer.toHexString(d.hashCode)}")
    if (!new java.io.File(dest, "_SUCCESS").exists()) {
      val stage = java.nio.file.Files.createTempDirectory("graft_evpart_stage_").toFile
      t(s, d, "events").write.mode("overwrite")
        .partitionBy("event_type").parquet(stage.getPath)
      try java.nio.file.Files.move(stage.toPath, dest.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { // lost the race: a concurrent writer already populated dest
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException |
             _: java.nio.file.AccessDeniedException =>
          org.apache.commons.io.FileUtils.deleteQuietly(stage)
      }
    }
    s.read.parquet(dest.getPath)
  }

  /** Tiny event_type dimension (5 rows), written once as a parquet fixture
    * so the dim side of scan_dpp is a real file scan: a literal
    * `Seq(...).toDF` would be folded to a LocalRelation before the
    * PartitionPruning rule runs, and its selective-filter detection only
    * fires on a Filter that survives optimization. Same cross-JVM
    * stage-plus-atomic-rename protocol as [[partitionedEvents]].
    */
  private def eventTypeDim(s: SparkSession): DataFrame = {
    val dest = new java.io.File("/tmp/graft_evdim")
    if (!new java.io.File(dest, "_SUCCESS").exists()) {
      val stage = java.nio.file.Files.createTempDirectory("graft_evdim_stage_").toFile
      import s.implicits._
      Seq(("click", "engagement"), ("view", "engagement"),
          ("purchase", "conversion"), ("signup", "conversion"),
          ("error", "ops")).toDF("et", "category")
        .coalesce(1).write.mode("overwrite").parquet(stage.getPath)
      try java.nio.file.Files.move(stage.toPath, dest.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException |
             _: java.nio.file.AccessDeniedException =>
          org.apache.commons.io.FileUtils.deleteQuietly(stage)
      }
    }
    s.read.parquet(dest.getPath)
  }

  val all: Seq[Spec] = Seq(
    // -------------------------------------------------- A. scans
    Spec("scan_full",
      (s, d) => t(s, d, "region").orderBy("r_regionkey"),
      Some("SELECT * FROM region ORDER BY r_regionkey")),

    // Column pruning: 3 of 11 lineitem columns; ReadSchema must shrink.
    // (l_orderkey, l_linenumber) is NOT unique in this data — every
    // lineitem-grain query orders by ALL output columns so ties are full
    // duplicates and the hash is order-insensitive.
    Spec("scan_prune",
      (s, d) => t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
              ORDER BY l_orderkey, l_linenumber, l_quantity""")),

    // Predicate pushdown to parquet row groups.
    Spec("scan_pushdown",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") < 5)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
              FROM lineitem WHERE l_quantity < 5
              ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""")),

    // Partition-DIRECTORY pruning (the planning-time analogue of row-group
    // pushdown): the scan of the event_type=... layout plans only the two
    // matching directories — PartitionFilters in explain, asserted in
    // PartitionPruneSpec. At 100 TB this is the difference between
    // listing/opening every file and touching only the requested
    // partitions. Oracle reads the original unpartitioned table: same relation.
    Spec("scan_partition_prune",
      (s, d) => partitionedEvents(s, d)
        .where(col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), msum(col("value")).as("sum_value"))
        .orderBy("event_type"),
      Some(s"""SELECT event_type, count(*) AS n, ${msumSql("value")} AS sum_value
               FROM events WHERE event_type IN ('click', 'purchase')
               GROUP BY event_type ORDER BY event_type""")),

    // DYNAMIC partition pruning — the star-schema scan feature that
    // matters at 100 TB: the fact's pruned partition set is not knowable
    // at planning time (the filter is on the DIM's category column, not
    // the partition column), so Catalyst injects a
    // DynamicPruningExpression into the fact scan's PartitionFilters,
    // fed by the dim's reused broadcast at runtime. Only the
    // conversion-category partitions (purchase, signup) are ever read.
    // Asserted in PartitionPruneSpec alongside the static case.
    Spec("scan_dpp",
      (s, d) => partitionedEvents(s, d)
        .join(eventTypeDim(s).where(col("category") === "conversion"),
          col("event_type") === col("et"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), msum(col("value")).as("sum_value"))
        .orderBy("event_type"),
      Some(s"""SELECT event_type, count(*) AS n, ${msumSql("value")} AS sum_value
               FROM events
               JOIN (VALUES ('click','engagement'), ('view','engagement'),
                     ('purchase','conversion'), ('signup','conversion'),
                     ('error','ops')) AS dim(et, category)
                 ON event_type = dim.et
               WHERE dim.category = 'conversion'
               GROUP BY event_type ORDER BY event_type""")),

    // -------------------------------------------------- B. project / filter
    // Computed columns: identical IEEE double arithmetic on both engines →
    // bit-identical per-row results, no rounding needed.
    Spec("project_expr",
      (s, d) => t(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("charge"),
          concat(col("l_orderkey").cast("string"), lit("-"), col("l_linenumber").cast("string")).as("line_id"))
        .orderBy("l_orderkey", "l_linenumber", "revenue", "charge"),
      Some("""SELECT l_orderkey, l_linenumber,
                l_extendedprice * (1.0 - l_discount) AS revenue,
                l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge,
                CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS line_id
              FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, charge""")),

    Spec("filter_compound",
      (s, d) => t(s, d, "orders")
        .where((col("o_orderstatus").isin("F", "P") &&
                col("o_totalprice").between(50000, 200000)) ||
               (!col("o_orderpriority").isin("5-LOW", "4-NOT SPECIFIED") &&
                col("o_orderstatus") === "O" &&
                col("o_totalprice") < 20000))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
              FROM orders
              WHERE (o_orderstatus IN ('F','P') AND o_totalprice BETWEEN 50000 AND 200000)
                 OR (NOT o_orderpriority IN ('5-LOW','4-NOT SPECIFIED')
                     AND o_orderstatus = 'O' AND o_totalprice < 20000)
              ORDER BY o_orderkey""")),

    Spec("filter_like",
      (s, d) => t(s, d, "part")
        .where(col("p_type").like("PROMO%") ||
               (col("p_name").like("%bolt") && col("p_brand").like("Brand#1%")))
        .select("p_partkey", "p_name", "p_brand", "p_type")
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name, p_brand, p_type FROM part
              WHERE p_type LIKE 'PROMO%'
                 OR (p_name LIKE '%bolt' AND p_brand LIKE 'Brand#1%')
              ORDER BY p_partkey""")),

    // Null semantics over a derived nullable column (nullif).
    Spec("filter_null_semantics",
      (s, d) => t(s, d, "orders")
        .withColumn("st", expr("nullif(o_orderstatus, 'P')"))
        .select(
          col("o_orderkey"), col("st"),
          col("st").isNull.as("is_null"),
          col("st").isNotNull.as("is_not_null"),
          (col("st") <=> lit("F")).as("nsafe_f"),
          (col("st") <=> lit(null).cast("string")).as("nsafe_null"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st,
                (nullif(o_orderstatus, 'P') IS NULL) AS is_null,
                (nullif(o_orderstatus, 'P') IS NOT NULL) AS is_not_null,
                (nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F') AS nsafe_f,
                (nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL) AS nsafe_null
              FROM orders ORDER BY o_orderkey""")),

    // Hidden file-metadata columns (`_metadata.file_name` / `file_size`) —
    // the scan surface lineage/debugging tooling leans on ("which file did
    // this row come from"). Reading them is free (constant per split, no
    // extra I/O). The oracle cannot name the engine-specific path, so the
    // checkable output is the structural invariant: all rows of this
    // single-file fixture carry ONE distinct (file_name, file_size) pair,
    // plus row stats proving the data rode along intact.
    Spec("scan_metadata_cols",
      (s, d) => s.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"),
          col("_metadata.file_name").as("fname"),
          col("_metadata.file_size").as("fsize"))
        .agg(
          countDistinct(col("fname"), col("fsize")).as("n_files"),
          count(lit(1)).as("n_rows"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc")),
      Some("""SELECT CAST(1 AS BIGINT) AS n_files, count(*) AS n_rows,
                min(doc_id) AS min_doc, max(doc_id) AS max_doc
              FROM documents"""))
  )
}
