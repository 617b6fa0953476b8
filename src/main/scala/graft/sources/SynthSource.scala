package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector: a deterministic synthetic events table —
  * `spark.read.format("graft.sources.SynthSource").option("rows", n)...`.
  *
  * The point is the CONNECTOR surface, the seam a real 100 TB source
  * (object store, message log, feature service) would implement:
  *
  *  - `planInputPartitions`: N independent splits, read in parallel by
  *    executors — no driver materialization anywhere.
  *  - `SupportsPushDownRequiredColumns`: column pruning reaches the
  *    reader, which GENERATES only the pruned columns (visible as
  *    `ReadSchema` in explain, like parquet).
  *  - `SupportsPushDownFilters`: `event_id` range predicates are consumed
  *    at PLANNING time — splits wholly outside the range are never
  *    created (the DSv2 analogue of partition pruning; visible as
  *    `PushedFilters` + a smaller scan RDD). Other filters are left to
  *    Spark as post-scan filters.
  *
  * Rows are pure functions of (seed, event_id) via splitmix64, so any
  * subset, split count, or re-read yields identical data — the property
  * the repo's determinism gate needs.
  */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SynthTable(new CaseInsensitiveStringMap(properties))
  override def supportsExternalMetadata(): Boolean = false
}

object SynthSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val eventTypes: Array[UTF8String] =
    Array("click", "view", "purchase", "signup", "error").map(UTF8String.fromString)

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** The row at `id` (column values in schema order), shared by reader and
    * tests — the source of truth for parity checks. */
  def userId(seed: Long, id: Long): Long = Math.floorMod(splitmix64(seed ^ id), 1000L)
  def eventTypeIdx(seed: Long, id: Long): Int =
    Math.floorMod(splitmix64(seed ^ id ^ 0x5bf03635L), eventTypes.length.toLong).toInt
  def value(seed: Long, id: Long): Double =
    Math.floorMod(splitmix64(seed ^ id ^ 0x9e3779b9L), 100000L) / 1000.0
}

class SynthTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft_synth_events"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(opts)
    new SynthScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

class SynthScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private val rows = options.getLong("rows", 100000L)
  private val numPartitions = options.getInt("numPartitions", 8)
  private val seed = options.getLong("seed", 42L)

  private var requiredSchema: StructType = SynthSource.schema
  private var lo = 0L // inclusive event_id bound
  private var hi = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var hadResidual = false
  private var aggResult: Option[(StructType, Seq[Any])] = None

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  // LIMIT n without ORDER BY may return ANY n rows, and this source is a
  // deterministic id range — truncating the range is a complete pushdown
  // (return true: Spark can drop its own Limit for the scan's rows).
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit)
    true
  }

  // saturating +1 so Long.MaxValue bounds can't wrap to MinValue (a wrap
  // would silently widen a consumed — never re-checked — filter)
  private def incr(v: Long): Long = if (v == Long.MaxValue) v else v + 1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (consumed, residual) = filters.partition {
      case sources.GreaterThan("event_id", v: Long) => lo = math.max(lo, incr(v)); true
      case sources.GreaterThanOrEqual("event_id", v: Long) => lo = math.max(lo, v); true
      case sources.LessThan("event_id", v: Long) => hi = math.min(hi, v); true
      case sources.LessThanOrEqual("event_id", v: Long) => hi = math.min(hi, incr(v)); true
      case sources.EqualTo("event_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, incr(v)); true
      case _ => false
    }
    pushed = consumed
    hadResidual = residual.nonEmpty
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  // Aggregate pushdown — the statistics short-circuit a warehouse source
  // implements: because this source is a closed-form id range [lo, hi),
  // COUNT(*), COUNT(col) (no column is nullable), COUNT(DISTINCT
  // event_id), and MIN/MAX(event_id) are answerable AT PLANNING TIME
  // with zero rows generated — the scan returns ONE pre-aggregated row.
  // `supportCompletePushDown` returns true only for shapes this holds
  // for: no GROUP BY, no residual (post-scan) filter — a residual would
  // make the closed form wrong, and Spark only skips its own aggregate
  // when the pushdown is declared complete. Anything else (min/max of a
  // generated column, grouped aggs) is declined and executes as a normal
  // scan + Spark aggregate.
  private def closedForm(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Seq[Any])] = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (hadResidual || agg.groupByExpressions().nonEmpty) return None
    val n = math.max(0L, math.max(lo, hi) - lo)
    def isEventId(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case f: NamedReference => f.fieldNames.toSeq == Seq("event_id")
        case _ => false
      }
    def isAnyField(e: org.apache.spark.sql.connector.expressions.Expression) =
      e.isInstanceOf[NamedReference]
    val resolved: Seq[Option[(StructField, Any)]] =
      agg.aggregateExpressions().toSeq.zipWithIndex.map {
        case (_: CountStar, i) =>
          Some(StructField(s"agg_$i", LongType, nullable = false) -> n)
        case (c: Count, i) if isAnyField(c.column) &&
            (!c.isDistinct || isEventId(c.column)) =>
          // every generated column is non-null, so COUNT(col) = n; the id
          // column is additionally unique, so its DISTINCT count = n too
          Some(StructField(s"agg_$i", LongType, nullable = false) -> n)
        case (m: Min, i) if isEventId(m.column) =>
          Some(StructField(s"agg_$i", LongType, nullable = true) ->
            (if (n > 0) lo else null))
        case (m: Max, i) if isEventId(m.column) =>
          Some(StructField(s"agg_$i", LongType, nullable = true) ->
            (if (n > 0) math.max(lo, hi) - 1 else null))
        case _ => None
      }
    if (resolved.exists(_.isEmpty)) None
    else Some((StructType(resolved.flatten.map(_._1)), resolved.flatten.map(_._2)))
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    closedForm(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    closedForm(agg) match {
      case some @ Some(_) => aggResult = some; true
      case None => false
    }
  }

  override def build(): Scan = aggResult match {
    case Some((schema, row)) => new SynthAggScan(schema, row)
    case None =>
      new SynthScan(rows, numPartitions, seed, requiredSchema, lo, math.max(lo, hi))
  }
}

/** The one-row pre-aggregated scan produced by a complete aggregate
  * pushdown: no generator loop runs — the row was computed in closed form
  * on the driver at planning time and is replayed by a single split.
  */
class SynthAggScan(schema: StructType, row: Seq[Any]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_synth AGG-PUSHED ${schema.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthAggPartition(row))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow =
            InternalRow.fromSeq(p.asInstanceOf[SynthAggPartition].values)
          override def close(): Unit = ()
        }
    }
}

case class SynthAggPartition(values: Seq[Any]) extends InputPartition

case class SynthInputPartition(start: Long, end: Long, seed: Long) extends InputPartition

class SynthScan(rows: Long, numPartitions: Int, seed: Long,
                required: StructType, lo: Long, hi: Long)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_synth rows=$rows range=[$lo,$hi) partitions=$numPartitions"

  // post-pushdown stats: lets Catalyst/AQE size-plan joins over this
  // source (broadcast the synth side when the pruned range is small)
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo)
    private val rowBytes = required.fields.map(_.dataType.defaultSize + 1L).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * rowBytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(n)
  }

  // split the FULL id space evenly, then plan only splits intersecting
  // the pushed range — split skipping, the partition-pruning analogue
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + numPartitions - 1) / numPartitions)
    (0 until numPartitions).iterator
      .map(i => (i * per, math.min(rows, (i + 1) * per)))
      .filter { case (s, e) => s < e && e > lo && s < hi }
      .map { case (s, e) => SynthInputPartition(math.max(s, lo), math.min(e, hi), seed) }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
}

class SynthReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SynthInputPartition]
    // generate ONLY the pruned columns, in the required order
    val gens: Array[Long => Any] = required.fields.map { f =>
      f.name match {
        case "event_id" => (id: Long) => id
        case "user_id" => (id: Long) => SynthSource.userId(sp.seed, id)
        case "event_type" =>
          (id: Long) => SynthSource.eventTypes(SynthSource.eventTypeIdx(sp.seed, id))
        case "value" => (id: Long) => SynthSource.value(sp.seed, id)
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
    }
    new PartitionReader[InternalRow] {
      private var id = sp.start - 1
      override def next(): Boolean = { id += 1; id < sp.end }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(_(id)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }

  // Vectorized path: fill OnHeapColumnVectors 4096 rows at a time, one
  // tight loop PER COLUMN (not per row) — the plan then shows the same
  // Columnar->Row boundary (codegen'd) as the parquet reader, and
  // downstream whole-stage codegen consumes the batch without per-row
  // InternalRow allocation. This is the throughput shape a real 100 TB
  // source implements; the row reader above remains as the
  // protocol-required fallback.
  override def supportColumnarReads(p: InputPartition): Boolean = true

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val sp = p.asInstanceOf[SynthInputPartition]
    val typeBytes = SynthSource.eventTypes.map(_.getBytes)
    new PartitionReader[ColumnarBatch] {
      private val cap = 4096
      private val vectors = required.fields.map(f =>
        new org.apache.spark.sql.execution.vectorized.OnHeapColumnVector(cap, f.dataType))
      private val batch = new ColumnarBatch(
        vectors.toArray[org.apache.spark.sql.vectorized.ColumnVector])
      private var id = sp.start
      override def next(): Boolean = {
        if (id >= sp.end) return false
        val n = math.min(cap.toLong, sp.end - id).toInt
        vectors.zip(required.fields).foreach { case (v, f) =>
          v.reset()
          f.name match {
            case "event_id" =>
              var j = 0; while (j < n) { v.putLong(j, id + j); j += 1 }
            case "user_id" =>
              var j = 0; while (j < n) { v.putLong(j, SynthSource.userId(sp.seed, id + j)); j += 1 }
            case "event_type" =>
              var j = 0
              while (j < n) {
                val b = typeBytes(SynthSource.eventTypeIdx(sp.seed, id + j))
                v.putByteArray(j, b, 0, b.length); j += 1
              }
            case "value" =>
              var j = 0; while (j < n) { v.putDouble(j, SynthSource.value(sp.seed, id + j)); j += 1 }
            case other => throw new IllegalArgumentException(s"unknown column $other")
          }
        }
        batch.setNumRows(n)
        id += n
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }
}
