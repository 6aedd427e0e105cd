package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, Reducer, ReducibleFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The one v2 function the graft catalog exposes: `bucket(n, key)` —
  * the hash-bucket id a [[graft.sources.GeoParquet.writeBucketed]]
  * layout distributes on, `pmod(murmur3(key), n)` with Spark's own
  * HashPartitioning seed (42), so the function IS the write-side
  * shuffle's partition index.
  *
  * Why a catalog function at all: Spark's storage-partitioned-join
  * machinery resolves the `bucket` transform both scans report (via
  * [[org.apache.spark.sql.connector.read.SupportsReportPartitioning]])
  * through the table's FunctionCatalog, and proves the two sides
  * co-partitioned by [[BoundFunction.canonicalName]] equality — two
  * graft tables bucketed the same way then join with ZERO shuffle.
  * The bound form also evaluates ([[ScalarFunction.produceResult]]),
  * which Spark's partially-clustered handling may invoke.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(nBuckets INT, key) -> INT: graft hash-bucket id, " +
      "pmod(murmur3(key), nBuckets)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (nBuckets INT, key); got ${inputType.simpleString}")
    val kt = inputType.fields(1).dataType
    kt match {
      case ByteType | ShortType | IntegerType | LongType | StringType => ()
      case other => throw new UnsupportedOperationException(
        s"bucket: unsupported key type ${other.simpleString} — bucketed " +
          "layouts cluster on integral or string keys")
    }
    new Bound(kt)
  }

  /** The shared bucket formula.  `v` is the CATALYST form of the key
    * (UTF8String for strings) in the column's own type — murmur3 is
    * type-sensitive, so callers widen literals first.  A null key
    * hashes to the untouched seed, exactly as the write shuffle's
    * HashExpression leaves it.
    */
  private[v2] def bucketId(v: Any, dt: DataType, n: Int): Int = {
    val h =
      if (v == null) 42
      else org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(v, dt, 42L).toInt
    ((h % n) + n) % n
  }

  private final class Bound(kt: DataType) extends ScalarFunction[Integer]
      with ReducibleFunction[Integer, Integer] {
    private[GraftBucketFunction] def keyType: DataType = kt
    override def inputTypes(): Array[DataType] = Array(IntegerType, kt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket(${kt.catalogString})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val v = if (input.isNullAt(1)) null else input.get(1, kt)
      Integer.valueOf(bucketId(v, kt, n))
    }

    /** COMPATIBLE bucket counts (one divides the other) still join
      * shuffle-free: because the bucket id is `pmod(murmur3(key), n)`,
      * the coarser grouping is a pure function of the finer one —
      * `pmod(h, m) == pmod(pmod(h, n), m)` whenever m divides n — so
      * the FINER side reduces its partition keys with `% m` and Spark
      * zips the groups (enable
      * spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled).
      * Returns null when this side is the coarser/equal one (the other
      * side reduces) or the functions/key types differ.
      */
    override def reducer(thisNumBuckets: Int,
                         other: ReducibleFunction[_, _],
                         otherNumBuckets: Int): Reducer[Integer, Integer] =
      other match {
        case b: Bound if b.keyType == kt &&
            thisNumBuckets > otherNumBuckets &&
            thisNumBuckets % otherNumBuckets == 0 =>
          new ModReducer(otherNumBuckets)
        case _ => null
      }
  }

  private final class ModReducer(m: Int)
      extends Reducer[Integer, Integer] with Serializable {
    // bucket values are pmod outputs (non-negative): plain % is exact
    override def reduce(v: Integer): Integer = Integer.valueOf(v.intValue() % m)
  }
}
