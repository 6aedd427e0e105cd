package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.GeoParquet

/** Delta-based (merge-on-read) SQL mutations for bin layouts:
  * `UPDATE`, `MERGE INTO`, and any `DELETE FROM` whose condition the
  * metadata path cannot translate, all through plain `spark.sql`.
  *
  * Spark's row-level rewrite reads the matched rows WITH their row
  * addresses (the scan's `_gfile`/`_gpos` metadata columns — manifest
  * file pruning applies, so a 0.1%-of-corpus mutation opens the files
  * that might match, not the corpus), then hands each executor its
  * share of deletes and replacement rows.  Executors stage both as
  * flat parquet parts (the same parquet-mr record API the SQL-face
  * reader uses, in reverse); the driver commit re-reads the staged
  * parts as distributed DataFrames and routes them through
  * [[GeoParquet.commitDelta]] — positional tombstones staged, inserts
  * appended with manifest maintenance, all under the layout's
  * CommitLock, atomically visible exactly as the API's
  * `upsertPositional` is.  No data file is rewritten; row counts the
  * mutation didn't touch cost nothing.
  *
  * After the commit the layout has PENDING positional deletes, and
  * every read path is merge-on-read: API reads and SQL scans both
  * subtract them on the fly (read-your-writes with no compaction in
  * between — chained mutations compose), and `CALL
  * <cat>.system.compact` reclaims them physically when scheduled.
  *
  * Concurrency: each commit serializes under the CommitLock, so files
  * and manifests stay consistent under contention; two mutations
  * matching the SAME row are last-write-duplicates (no
  * serializable-conflict validation), as with two concurrent API
  * merges.
  */
final class GraftRowLevelOperation(path: String, dataSchema: StructType,
                                   cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"GraftDelta($cmd, $path)"

  /** The row-level read is the ordinary SQL-face scan — Spark asks it
    * for the row-address metadata columns via column pruning.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path, dataSchema)

  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(GraftSource.FileMetaCol),
    Expressions.column(GraftSource.PosMetaCol))

  /** Updates arrive as delete + reinsert pairs — exactly the
    * positional-tombstone + append commit this store has.
    */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new GraftDeltaWrite(path, info.schema())
    }
}

/** The delta write: resolves the layout's bin size at build time
  * (refusing non-bin layouts before any task runs) and stages under
  * `_rlo_staging/<uuid>` — an underscore sidecar, invisible to every
  * reader.
  */
final class GraftDeltaWrite(path: String, rowSchema: StructType)
    extends DeltaWrite {
  override def toBatch: DeltaBatchWrite = {
    val spark = SparkSession.active
    // KEYED layouts (writeKeyed / DDL 'key' tables) mutate through
    // the SQL face with no spatial geometry anywhere: their delta
    // commit routes to appendCurve, which mirrors the recorded data
    // key — the bin size below is a dead parameter on that path.
    // Pure spatial-curve layouts still refuse: recomputing their
    // cell key on re-inserted rows is an API-owned lifecycle.
    val delta =
      if (GeoParquet.keyColsOf(spark, path).nonEmpty) 1.0
      else GeoParquet.deltaOf(spark, path)
        .filter(_ => !GeoParquet.isCurveLayout(spark, path))
        .getOrElse(throw new UnsupportedOperationException(
          s"SQL row-level mutations need a bin or key-clustered " +
            s"layout at $path — spatial curve layouts mutate via the API"))
    val staging = s"$path/_rlo_staging/" +
      java.util.UUID.randomUUID().toString.take(8)
    new GraftDeltaBatchWrite(path, staging, rowSchema.json, delta,
      new SerConf(spark.sparkContext.hadoopConfiguration))
  }
}

/** One staged part-pair per task attempt; only files named in COMMIT
  * messages are adopted, so a lost task's orphans die with the
  * staging directory.
  */
final case class GraftDeltaMessage(deleteFile: Option[String],
                                   insertFile: Option[String],
                                   deleted: Long, inserted: Long)
    extends WriterCommitMessage

final class GraftDeltaBatchWrite(path: String, staging: String,
                                 rowSchemaJson: String, delta: Double,
                                 ser: SerConf)
    extends DeltaBatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory =
    new GraftDeltaWriterFactory(staging, rowSchemaJson, ser)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val msgs = messages.collect { case m: GraftDeltaMessage => m }
    try GeoParquet.commitDelta(spark, path,
      msgs.flatMap(_.deleteFile).toSeq, msgs.flatMap(_.insertFile).toSeq,
      delta)
    finally dropStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    dropStaging()

  private def dropStaging(): Unit = {
    val p = new org.apache.hadoop.fs.Path(staging)
    val fs = p.getFileSystem(ser.conf)
    if (fs.exists(p)) fs.delete(p, true)
  }
}

final class GraftDeltaWriterFactory(staging: String, rowSchemaJson: String,
                                    ser: SerConf)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(staging, s"p$partitionId-t$taskId",
      DataType.fromJson(rowSchemaJson).asInstanceOf[StructType], ser)
}

/** Executor-side stager: deletes become (file, pos) rows, inserts
  * become data rows, each in its own flat parquet part streamed
  * through Spark's InternalRow-native write support ([[VecWrite]] —
  * the write mirror of the columnar read path).  Parts open lazily —
  * a delete-only task stages no insert file at all — and stay O(1)
  * memory: rows stream through the parquet writer's own column
  * buffers.
  */
final class GraftDeltaWriter(staging: String, suffix: String,
                             rowSchema: StructType, ser: SerConf)
    extends DeltaWriter[InternalRow] {
  import org.apache.parquet.hadoop.ParquetWriter

  // reinserted rows may carry preserved metadata columns — data
  // fields are what lands in the layout
  private val dataFields: Array[(StructField, Int)] =
    rowSchema.fields.zipWithIndex
      .filterNot { case (f, _) => GraftSource.MetaCols.contains(f.name) }

  // the layout surface stays restricted to the flat primitive types
  // every graft reader decodes — refuse anything else with the same
  // message the Group writer raised
  dataFields.foreach { case (f, _) => f.dataType match {
    case LongType | IntegerType | DoubleType | FloatType | BooleanType |
         StringType | BinaryType => ()
    case other => throw new UnsupportedOperationException(
      s"graft SQL mutations: unsupported column type " +
        s"${other.simpleString} for ${f.name} — mutate via the API")
  }}

  private val deleteSchema = StructType(Seq(
    StructField("file", StringType), StructField("pos", LongType)))
  private val insertSchema = StructType(dataFields.map(_._1))
  private var delPath: Option[String] = None
  private var insPath: Option[String] = None
  private var delWriter: ParquetWriter[InternalRow] = _
  private var insWriter: ParquetWriter[InternalRow] = _
  private val delRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
  private val insRow = new OrdinalMapRow(dataFields.map(_._2))
  private var nDel = 0L
  private var nIns = 0L

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    if (delWriter == null) {
      val f = s"$staging/del-$suffix.parquet"
      delWriter = VecWrite.open(f, ser, deleteSchema)
      delPath = Some(f)
    }
    delRow.update(0, id.getUTF8String(0))
    delRow.update(1, id.getLong(1))
    delWriter.write(delRow)
    nDel += 1
  }

  override def insert(row: InternalRow): Unit = {
    if (insWriter == null) {
      val f = s"$staging/ins-$suffix.parquet"
      insWriter = VecWrite.open(f, ser, insertSchema)
      insPath = Some(f)
    }
    insWriter.write(insRow.set(row))
    nIns += 1
  }

  override def update(metadata: InternalRow, id: InternalRow,
                      row: InternalRow): Unit = {
    // unreachable with representUpdateAsDeleteAndInsert = true, but
    // the decomposition is the same commit either way
    delete(metadata, id)
    insert(row)
  }

  override def commit(): WriterCommitMessage = {
    closeWriters()
    GraftDeltaMessage(delPath, insPath, nDel, nIns)
  }

  override def abort(): Unit = {
    closeWriters()
    val fs = new org.apache.hadoop.fs.Path(staging).getFileSystem(ser.conf)
    (delPath ++ insPath).foreach { f =>
      fs.delete(new org.apache.hadoop.fs.Path(f), false)
    }
  }

  override def close(): Unit = closeWriters()

  private def closeWriters(): Unit = {
    if (delWriter != null) { delWriter.close(); delWriter = null }
    if (insWriter != null) { insWriter.close(); insWriter = null }
  }
}
