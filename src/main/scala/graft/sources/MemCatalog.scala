package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** V2 `TableCatalog` plugin — the CATALOG third of the connector surface
  * (SynthSource: read, MemSink: write). Registered per session as
  * `spark.sql.catalog.<name>=graft.sources.MemCatalog`, after which plain
  * SQL DDL/DML round-trips through identifiers:
  *
  * {{{
  *   CREATE TABLE <name>.ns.t (id BIGINT, s STRING) USING mem
  *   INSERT INTO <name>.ns.t ... / df.writeTo("<name>.ns.t").append()
  *   SELECT ... FROM <name>.ns.t
  *   SHOW TABLES IN <name>.ns / DROP TABLE <name>.ns.t
  * }}}
  *
  * Tables are driver-memory relations (rows travel through commit
  * messages on write and inside `InputPartition`s on read — bounded-size
  * test semantics, same caveat [[MemSink]] documents; the PROTOCOL
  * exercised — createTable/loadTable/listTables/drop/rename, scan builder,
  * write builder with truncate — is exactly what a production catalog
  * implements against external metadata + storage). Namespaces are
  * permissive: any single-level namespace exists implicitly, like a
  * path-based catalog.
  */
class MemCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private def nameParts(ident: Identifier): Seq[String] =
    (ident.namespace() :+ ident.name()).toSeq

  override def listTables(namespace: Array[String]): Array[Identifier] =
    MemCatalog.tables.keySet().asScala.toArray
      .filter(_._1 == catalogName).map(_._2)
      .filter(_.namespace().sameElements(namespace))

  override def loadTable(ident: Identifier): Table = {
    val t = MemCatalog.tables.get((catalogName, ident))
    if (t == null) throw new NoSuchTableException(nameParts(ident))
    t
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty, "MemCatalog does not support partitioned tables")
    val t = new MemCatTable(ident, schema)
    if (MemCatalog.tables.putIfAbsent((catalogName, ident), t) != null)
      throw new TableAlreadyExistsException(nameParts(ident))
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("MemCatalog.alterTable")

  override def dropTable(ident: Identifier): Boolean =
    MemCatalog.tables.remove((catalogName, ident)) != null

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val src = MemCatalog.tables.get((catalogName, oldIdent))
    if (src == null) throw new NoSuchTableException(nameParts(oldIdent))
    val moved = new MemCatTable(newIdent, src.schema(), src.snapshot)
    // destination must not exist (TableCatalog contract: no silent overwrite)
    if (MemCatalog.tables.putIfAbsent((catalogName, newIdent), moved) != null)
      throw new TableAlreadyExistsException(nameParts(newIdent))
    MemCatalog.tables.remove((catalogName, oldIdent))
  }

  // --- permissive namespaces (any single-level namespace implicitly exists)
  override def listNamespaces(): Array[Array[String]] =
    MemCatalog.tables.keySet().asScala.toArray
      .filter(_._1 == catalogName).map(_._2.namespace().toSeq)
      .distinct.map(_.toArray) // structural dedup (Array compares by reference)
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespace.length == 1) Array.empty // implicit namespaces have no children
    else throw new NoSuchNamespaceException(namespace.toSeq)
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespace.length <= 1) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace.toSeq)
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = ()
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("MemCatalog.alterNamespace")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = false
}

object MemCatalog {
  /** (catalog name, identifier) -> table. Global so every catalog instance
    * of the same name (across sessions) sees one store.
    */
  private[sources] val tables =
    new java.util.concurrent.ConcurrentHashMap[(String, Identifier), MemCatTable]()
}

class MemCatTable(ident: Identifier, tableSchema: StructType,
    initial: Vector[Row] = Vector.empty) extends Table
    with SupportsRead with SupportsWrite {

  @volatile private var rows: Vector[Row] = initial
  def snapshot: Vector[Row] = rows
  private[sources] def commit(batches: Seq[Vector[Row]], truncate: Boolean): Unit =
    synchronized {
      rows = (if (truncate) Vector.empty else rows) ++ batches.flatten
    }

  override def name(): String = (ident.namespace() :+ ident.name()).mkString(".")
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  // ---- read: snapshot rows ride in the InputPartition
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        private val snap = snapshot
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(MemCatPartition(snap))
        override def createReaderFactory(): PartitionReaderFactory =
          new MemCatReaderFactory(tableSchema)
      }
    }

  // ---- write: same commit-message pattern as MemSink
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(p: PhysicalWriteInfo): DataWriterFactory =
            new MemCatWriterFactory(tableSchema)
          override def commit(messages: Array[WriterCommitMessage]): Unit =
            MemCatTable.this.commit(
              messages.toIndexedSeq.map(_.asInstanceOf[MemCatCommit].rows), doTruncate)
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

case class MemCatPartition(rows: Vector[Row]) extends InputPartition
case class MemCatCommit(rows: Vector[Row]) extends WriterCommitMessage

class MemCatReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rows = p.asInstanceOf[MemCatPartition].rows
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = toCatalyst(rows(i)).asInstanceOf[InternalRow]
      override def close(): Unit = ()
    }
  }
}

class MemCatWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val toScala = CatalystTypeConverters.createToScalaConverter(schema)
      private val buf = Vector.newBuilder[Row]
      override def write(row: InternalRow): Unit =
        buf += toScala(row).asInstanceOf[Row]
      override def commit(): WriterCommitMessage = MemCatCommit(buf.result())
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
