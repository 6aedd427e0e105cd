package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Columnar decode for the CDC changelog read (the vectorized twins
  * of [[GroupChangeInsertReader]]/[[GroupChangeDeleteReader]]): the
  * insert arm is a bounded file read whose rows additionally carry
  * ("insert", commit epoch); the delete arm re-opens a doomed file
  * and emits ONLY the positions its batch's tombstone parts name,
  * tagged ("delete", that tombstone's commit epoch).  Semantics are
  * unchanged — positions physical (no predicate on the delete arm),
  * pushed exact filters apply to both arms (a filtered CDC stream
  * retracts only what it would have delivered).
  */
private[v2] object VecChange {

  /** Per-row exact-filter gate: compiled ordinal-bound predicate
    * when the tree is inside the compiled surface, interpreted
    * [[ExactFilters.eval]] otherwise.
    */
  final class ExactGate(exact: Seq[Filter], schema: StructType) {
    private val idx: Map[String, (Int, DataType)] =
      schema.fields.zipWithIndex.map { case (f, i) =>
        f.name -> (i, f.dataType)
      }.toMap
    private val compiled: InternalRow => Boolean =
      if (exact.isEmpty) null
      else VecReaders.compilePredicate(exact, schema).orNull
    def pass(row: InternalRow): Boolean =
      exact.isEmpty || {
        if (compiled != null) compiled(row)
        else {
          val lookup: String => Any = { name =>
            val (i, dt) = idx(name)
            if (row.isNullAt(i)) null else row.get(i, dt)
          }
          exact.forall(f => ExactFilters.eval(f, lookup).contains(true))
        }
      }
  }

  def tryCreateInsert(file: String, ser: SerConf, dataSchema: StructType,
                      required: StructType, exact: Seq[Filter],
                      bounds: Seq[(String, Double, Double)], epoch: Long)
      : PartitionReader[InternalRow] = {
    val batchSchema = VecReaders.changeBatchSchema(dataSchema, required,
      exact).getOrElse(return null)
    try {
      val r = new VecChangeInsertReader(file, ser, batchSchema, required,
        exact, bounds, epoch)
      VecReaders.created.incrementAndGet()
      r
    } catch { case e: Exception =>
      if (sys.env.contains("GRAFT_VEC_DEBUG")) e.printStackTrace()
      VecReaders.fellBack.incrementAndGet(); null
    }
  }

  def tryCreateDelete(relFile: String, file: String, ser: SerConf,
                      dataSchema: StructType, required: StructType,
                      exact: Seq[Filter], deleteParts: Seq[(String, Long)])
      : PartitionReader[InternalRow] = {
    val batchSchema = VecReaders.changeBatchSchema(dataSchema, required,
      exact).getOrElse(return null)
    try {
      val r = new VecChangeDeleteReader(relFile, file, ser, batchSchema,
        required, exact, deleteParts)
      VecReaders.created.incrementAndGet()
      r
    } catch { case e: Exception =>
      if (sys.env.contains("GRAFT_VEC_DEBUG")) e.printStackTrace()
      VecReaders.fellBack.incrementAndGet(); null
    }
  }
}

private[v2] final class VecChangeInsertReader(file: String, ser: SerConf,
    batchSchema: StructType, required: StructType, exact: Seq[Filter],
    bounds: Seq[(String, Double, Double)], epoch: Long)
    extends PartitionReader[InternalRow] {
  private val reader =
    VecReaders.openVectorized(file, ser, batchSchema, bounds)
  private val gate = new VecChange.ExactGate(exact, batchSchema)
  private val view = new SpliceView(required, batchSchema,
    GraftSource.ChangeTypeCol, UTF8String.fromString("insert"),
    GraftSource.ChangeEpochCol)
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (reader.nextKeyValue()) {
      row = reader.getCurrentValue.asInstanceOf[InternalRow]
      if (gate.pass(row)) return true
    }
    false
  }
  override def get(): InternalRow = { view.set(row, epoch); view }
  override def close(): Unit = reader.close()
}

private[v2] final class VecChangeDeleteReader(relFile: String,
    file: String, ser: SerConf, batchSchema: StructType,
    required: StructType, exact: Seq[Filter],
    deleteParts: Seq[(String, Long)])
    extends PartitionReader[InternalRow] {
  // positions are physical row indexes: no predicate may skip a row
  // group, so none is pushed (bounds empty)
  private val reader =
    VecReaders.openVectorized(file, ser, batchSchema, Seq.empty)
  private val gate = new VecChange.ExactGate(exact, batchSchema)
  private val view = new SpliceView(required, batchSchema,
    GraftSource.ChangeTypeCol, UTF8String.fromString("delete"),
    GraftSource.ChangeEpochCol)

  /** pos → delete epoch for THIS file (ascending epoch order: were a
    * position ever doomed twice, the later commit wins).
    */
  private val doomed: java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    deleteParts.foreach { case (pf, ep) =>
      DoomedPositions.load(relFile, Seq(pf), ser)
        .forEach(pos => m.put(pos, ep))
    }
    m
  }

  private var row: InternalRow = _
  private var pos: Long = -1L

  override def next(): Boolean = {
    while (reader.nextKeyValue()) {
      pos += 1
      row = reader.getCurrentValue.asInstanceOf[InternalRow]
      if (doomed.containsKey(pos) && gate.pass(row)) return true
    }
    false
  }
  override def get(): InternalRow = {
    view.set(row, doomed.get(pos).longValue()); view
  }
  override def close(): Unit = reader.close()
}
