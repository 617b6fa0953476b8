package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE connector — the sink half of the connector surface
  * ([[SynthSource]] covers the read half):
  * `df.write.format("graft.sources.MemSink").option("name", t).mode(m).save()`.
  *
  * Exercises the full V2 write protocol: `WriteBuilder` (+
  * `SupportsTruncate` for overwrite mode), `BatchWrite`,
  * `DataWriterFactory` fanned out to one `DataWriter` per task, task-level
  * `commit()` messages, and the driver-side all-or-nothing
  * `commit/abort(messages)` — a failed job leaves the table untouched
  * (asserted in MemSinkSpec).
  *
  * Scale honesty: this test sink routes the rows themselves through
  * `WriterCommitMessage`s, which is only valid for bounded results (it is
  * exactly how Spark's own V2 memory sink works). A production sink
  * writes data to external storage inside each task and sends only
  * METADATA (file paths / commit ids) through the messages; the protocol
  * surface exercised here is identical.
  */
class MemSink extends TableProvider {
  // write-only source: the schema always comes from the DataFrame
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft.sources.MemSink is write-only; schema comes from the DataFrame")
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MemSinkTable(
      new CaseInsensitiveStringMap(properties).getOrDefault("name", "default"),
      schema)
}

object MemSink {
  /** Driver-side committed tables: name -> (schema, rows as external Scala values). */
  private val store =
    new java.util.concurrent.ConcurrentHashMap[String, (StructType, Vector[Seq[Any]])]()
  /** Committed stream epochs per (table, streaming queryId) — re-delivery
    * of an epoch (driver failure recovery, checkpoint restart re-commit)
    * is a no-op: the exactly-once guarantee a streaming sink must provide.
    * Scoped by queryId (stable across restarts of the SAME checkpoint,
    * fresh for a new query) so a table name reused by an independent
    * query — whose epochIds restart at 0 — is not silently discarded.
    */
  private val epochs =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.Set[java.lang.Long]]()

  def rows(name: String): Vector[Seq[Any]] =
    Option(store.get(name)).map(_._2).getOrElse(Vector.empty)
  def schemaOf(name: String): Option[StructType] = Option(store.get(name)).map(_._1)
  def clear(name: String): Unit = { store.remove(name); epochs.remove(name) }

  private[sources] def commitRows(name: String, schema: StructType,
      batches: Seq[Vector[Seq[Any]]], truncate: Boolean): Unit =
    store.compute(name, (_, prev) => {
      val base = if (truncate || prev == null) Vector.empty else prev._2
      (schema, base ++ batches.flatten)
    })

  private[graft] def commitEpoch(name: String, queryId: String, schema: StructType,
      epochId: Long, batches: Seq[Vector[Seq[Any]]], truncate: Boolean): Unit = {
    val seen = epochs.computeIfAbsent(s"$name|$queryId",
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]())
    if (seen.add(epochId)) commitRows(name, schema, batches, truncate)
  }
}

class MemSinkTable(name: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_mem_sink_$name"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MemBatchWrite(name, info.schema(), doTruncate)
        // epoch-based streaming commits; duplicate epochs are no-ops
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new MemStreamingWrite(name, info.queryId(), info.schema(), doTruncate)
      }
    }
}

class MemStreamingWrite(name: String, queryId: String, schema: StructType,
    truncate: Boolean)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    MemStreamWriterFactory(schema) // standalone: factories ship to executors
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    MemSink.commitEpoch(name, queryId, schema, epochId,
      messages.toIndexedSeq.map(_.asInstanceOf[MemSinkCommit].rows), truncate)
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

/** One per-task buffer travels back as the commit message; the driver
  * appends all task buffers atomically in `commit` (never on `abort`).
  */
case class MemSinkCommit(rows: Vector[Seq[Any]]) extends WriterCommitMessage

class MemBatchWrite(name: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    MemSink.commitRows(name, schema,
      messages.toIndexedSeq.map(_.asInstanceOf[MemSinkCommit].rows), truncate)
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class MemStreamWriterFactory(schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new MemWriterFactory(schema).createWriter(partitionId, taskId)
}

class MemWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val toScala = CatalystTypeConverters.createToScalaConverter(schema)
      private val buf = Vector.newBuilder[Seq[Any]]
      override def write(row: InternalRow): Unit =
        buf += toScala(row).asInstanceOf[org.apache.spark.sql.Row].toSeq
      override def commit(): WriterCommitMessage = MemSinkCommit(buf.result())
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
