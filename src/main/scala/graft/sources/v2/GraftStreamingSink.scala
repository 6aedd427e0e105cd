package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

import graft.sources.GeoParquet

/** Native streaming SINK — `df.writeStream.format("graft").start(path)`
  * (and `.toTable` through the catalog): every micro-batch becomes one
  * locked manifest commit, so the layout stays continuously queryable
  * with pruning while data streams in.
  *
  * Shape: executors stage each batch's rows as FLAT parquet parts
  * through parquet-mr (the delta writers' stager, insert arm only —
  * O(1) writer memory, no driver data movement), and the driver's
  * epoch commit re-reads the staged parts as a distributed frame into
  * the layout's own append verb — [[GeoParquet.appendWithManifest]]
  * for bin layouts, [[GeoParquet.appendCurve]] for curve-clustered
  * ones — the exact locked commit a batch writer takes, so streaming
  * and batch writers and compactors all serialize on the same
  * CommitLock.
  *
  * Restart semantics: Spark replays an uncommitted epoch after a
  * crash, so the sink records each landed epoch under
  * `_batches/stream-<queryId>-<epoch>` and a replayed commit is a
  * no-op.  The marker is NOT a second filesystem step after the
  * append: it is stamped INSIDE the append's locked commit
  * ([[GeoParquet.appendWithManifest]]/[[GeoParquet.appendCurve]]
  * `commitMarker`), journaled by an atomic `.intent` file before the
  * first staged rename — so a replay after a crash at ANY point
  * either re-runs a commit that left nothing visible, no-ops a
  * commit whose marker landed, or rolls a half-renamed commit
  * FORWARD ([[GeoParquet.healMarkedCommit]]) and then no-ops:
  * exactly-once through the crash, with at worst a stale manifest
  * (correct unpruned reads) until the next writeManifest.  Staged
  * parts from dead attempts live under the dot-prefixed
  * `.staging-stream-*` dirs (invisible to every reader) and are swept
  * by [[GeoParquet.vacuum]] once older than the commit lease.
  */
final class GraftStreamingWrite(path: String, info: LogicalWriteInfo)
    extends StreamingWrite {

  private val queryId = info.queryId()
  private val schemaJson = info.schema().json

  override def createStreamingWriterFactory(
      pinfo: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val spark = SparkSession.active
    new GraftStreamWriterFactory(s"$path/.staging-stream-$queryId",
      schemaJson, new SerConf(spark.sparkContext.hadoopConfiguration))
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = messages.collect {
      case GraftStreamMessage(Some(f), n) if n > 0 => f
    }
    def dropStaged(): Unit = files.foreach { f =>
      try fs.delete(new org.apache.hadoop.fs.Path(f), false)
      catch { case _: java.io.IOException => () }
    }
    val marker = s"$path/_batches/stream-$queryId-$epochId"
    // replayed epoch (or a crash-interrupted one, healed forward): no-op
    if (GeoParquet.healMarkedCommit(spark, path, marker)) {
      dropStaged(); return
    }
    if (files.nonEmpty) {
      val df = spark.read
        .schema(DataType.fromJson(schemaJson).asInstanceOf[StructType])
        .parquet(files.toIndexedSeq: _*)
      // keyed layouts mirror their recorded data key — no bin size
      lazy val delta = Option(info.options.get("delta")).map(_.toDouble)
        .orElse(GeoParquet.deltaOf(spark, path))
        .getOrElse(throw new IllegalArgumentException(
          s"$path records no bin size — pass .option(\"delta\", <binSize>)"))
      // the marker lands inside the append's locked commit — replay
      // detection is atomic with the data (class note)
      if (GeoParquet.isCurveLayout(spark, path))
        GeoParquet.appendCurve(df, path,
          if (GeoParquet.keyColsOf(spark, path).nonEmpty) 1.0 else delta,
          nFiles = GeoParquet.nFilesOf(spark, path).getOrElse(1),
          commitMarker = Some(marker))
      else
        GeoParquet.appendWithManifest(df, path, delta,
          commitMarker = Some(marker))
    } else {
      // an empty batch lands no data; the bare marker suffices
      val mp = new org.apache.hadoop.fs.Path(marker)
      fs.mkdirs(mp.getParent)
      fs.create(mp, true).close()
    }
    dropStaged()
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.foreach {
      case GraftStreamMessage(Some(f), _) =>
        try fs.delete(new org.apache.hadoop.fs.Path(f), false)
        catch { case _: java.io.IOException => () }
      case _ => ()
    }
  }
}

private[v2] final case class GraftStreamMessage(file: Option[String],
                                                n: Long)
    extends WriterCommitMessage

private[v2] final class GraftStreamWriterFactory(staging: String,
                                                 schemaJson: String,
                                                 ser: SerConf)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftStreamWriter(staging,
      s"e$epochId-p$partitionId-t$taskId-" +
        java.util.UUID.randomUUID().toString.take(8),
      DataType.fromJson(schemaJson).asInstanceOf[StructType], ser)
}

/** Executor-side stager for one task's slice of a micro-batch: rows
  * stream into one flat parquet part through Spark's
  * InternalRow-native write support ([[VecWrite]], opened lazily —
  * an empty task stages nothing), the write mirror of the columnar
  * read path and the insert arm of [[GraftDeltaWriter]].
  */
private[v2] final class GraftStreamWriter(staging: String, suffix: String,
                                          schema: StructType, ser: SerConf)
    extends DataWriter[InternalRow] {
  import org.apache.parquet.hadoop.ParquetWriter

  // the layout surface stays restricted to the flat primitive types
  // every graft reader decodes
  schema.fields.foreach { f => f.dataType match {
    case LongType | IntegerType | DoubleType | FloatType | BooleanType |
         StringType | BinaryType => ()
    case other => throw new UnsupportedOperationException(
      s"graft streaming sink: unsupported column type " +
        s"${other.simpleString} for ${f.name}")
  }}

  private var out: ParquetWriter[InternalRow] = _
  private var file: Option[String] = None
  private var n = 0L

  override def write(row: InternalRow): Unit = {
    if (out == null) {
      val f = s"$staging/ins-$suffix.parquet"
      out = VecWrite.open(f, ser, schema)
      file = Some(f)
    }
    out.write(row)
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    GraftStreamMessage(file, n)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    val fs = new org.apache.hadoop.fs.Path(staging).getFileSystem(ser.conf)
    file.foreach(f =>
      try fs.delete(new org.apache.hadoop.fs.Path(f), false)
      catch { case _: java.io.IOException => () })
  }

  override def close(): Unit = if (out != null) out.close()
}
