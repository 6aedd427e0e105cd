package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Persisted IVF vector index — the embedding-space sibling of
  * [[GeoParquet]]: the directory layout IS the index.
  *
  * `write` learns centroids (deterministic seeded k-means pass),
  * assigns every vector to its nearest list, and persists the corpus
  * `partitionBy(cent)` with the centroid table as a sidecar.  A
  * query then reads ONLY its `nprobe` nearest centroid partitions —
  * planning-time PartitionFilters, the same pruning story as the
  * spatial layout, which at 100 TB is the difference between
  * scanning 2/64ths of the corpus and scanning it all.
  */
object VectorIndex {

  /** Build the index.
    *
    * CONTRACT — zero-norm vectors are EXCLUDED: cosine distance is
    * undefined for the zero vector, so `ivfAssign` drops rows with
    * `norm == 0` and the persisted index is the input minus those
    * rows.  Such ids can never be returned by [[search]].  Callers
    * that must keep every row should filter/repair zero vectors
    * before indexing (the exclusion is deliberate, not lossage:
    * returning a zero vector from a cosine top-k would mean
    * comparing against a NaN similarity).
    */
  def write(emb: DataFrame, path: String, ncent: Int): Unit = {
    val spark = emb.sparkSession
    val cents = Similarity.ivfCentroids(emb, ncent)
    Similarity.ivfAssign(emb, cents)
      .select(col("vec_id"), col("v"), col("norm"), col("cent"))
      .repartition(col("cent"))
      .write.mode("overwrite").partitionBy("cent").parquet(s"$path/data")
    import spark.implicits._
    cents.zipWithIndex.map { case (c, j) => (j.toLong, c.toSeq) }
      .toDF("cent", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Append a batch into an existing index: assign against the
    * PERSISTED centroids (never re-learned — retraining would silently
    * re-shuffle old vectors' list membership) and append to the
    * centroid partitions.  With [[graft.streaming.EventStream]]-style
    * foreachBatch this is the streaming ingest path of the ANN index;
    * like GeoParquet streaming ingest, periodic compaction of small
    * files applies.  Zero-norm vectors are excluded — same contract
    * as [[write]].
    */
  def append(emb: DataFrame, path: String): Unit = {
    val cents = centroids(emb.sparkSession, path)
    Similarity.ivfAssign(emb, cents)
      .select(col("vec_id"), col("v"), col("norm"), col("cent"))
      .write.mode("append").partitionBy("cent").parquet(s"$path/data")
  }

  /** Delete vectors by id WITHOUT rebuilding the index — the ANN face
    * of merge-on-read deletes: a near-dup purge or right-to-be-
    * forgotten request tombstones the ids, [[search]] subtracts them
    * AFTER its partition pruning and BEFORE the top-k cut (a deleted
    * vector must not eat a result slot), and the next compaction
    * applies them physically.  The centroid model is untouched —
    * deleting members never moves a list.
    */
  def deleteVectors(ids: DataFrame, path: String): Unit = {
    require(ids.columns.length == 1,
      s"vector tombstones must be a single id column, got ${ids.columns.toSeq}")
    if (!ids.isEmpty)
      ids.toDF("vec_id").write.mode("append").parquet(s"$path/_tombstones")
  }

  /** Pending vector tombstones, if any. */
  def pendingDeleted(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  private def minusDeleted(spark: SparkSession, path: String,
                           df: DataFrame): DataFrame =
    pendingDeleted(spark, path) match {
      case Some(ts) => df.join(ts, Seq("vec_id"), "left_anti")
      case None     => df
    }

  /** Compact the index's `cent=` partitions in place — streaming
    * [[append]]s leave one small file per touched centroid list per
    * micro-batch, exactly the GeoParquet small-file story; the
    * centroid sidecar (the model) is untouched.  `maxFilesPerCent`
    * gates the rewrite so a scheduler can call this after every batch
    * without continuously rewriting the corpus.  Pending vector
    * tombstones count as pressure and are applied by the rewrite.
    *
    * @return true iff compaction ran.
    */
  def compactIfNeeded(spark: SparkSession, path: String,
                      maxFilesPerCent: Int = 4): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataDir = new org.apache.hadoop.fs.Path(s"$path/data")
    val pressure = pendingDeleted(spark, path).nonEmpty ||
      fs.listStatus(dataDir).exists { st =>
        st.isDirectory && st.getPath.getName.startsWith("cent=") &&
          fs.listStatus(st.getPath)
            .count(_.getPath.getName.endsWith(".parquet")) > maxFilesPerCent
      }
    if (pressure) {
      val tmp = s"$path/data.compact"
      minusDeleted(spark, path, spark.read.parquet(s"$path/data"))
        .repartition(col("cent"))
        .write.mode("overwrite").partitionBy("cent").parquet(tmp)
      // preserve-aside swap: the live corpus is renamed out of the
      // way, never deleted before its replacement is in place — a
      // crash leaves every byte on disk (worst case `data` is briefly
      // absent and recovery is renaming `data.pre-compact` back)
      val aside = new org.apache.hadoop.fs.Path(s"$path/data.pre-compact")
      fs.delete(aside, true) // leftover from an older compaction
      require(fs.rename(dataDir, aside), s"old-aside rename failed for $path")
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dataDir),
        s"compaction swap failed for $path — intact data is at $aside")
      fs.delete(aside, true)
      // the rewrite applied the tombstones — retire the sidecar (only
      // after the swap landed; a crash before this point leaves them
      // pending, which is correct)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/_tombstones"), true)
    }
    pressure
  }

  def centroids(spark: SparkSession, path: String): IndexedSeq[Array[Double]] =
    spark.read.parquet(s"$path/centroids")
      .orderBy("cent")
      .collect()
      .map(r => r.getSeq[Double](1).toArray)
      .toIndexedSeq

  /** Top-k cosine neighbors of `qvec` reading only the `nprobe`
    * nearest centroid partitions.  nprobe = ncent degenerates to an
    * exact full scan.
    */
  def search(spark: SparkSession, path: String, qvec: Array[Double],
             nprobe: Int, k: Int): DataFrame = {
    val cents = centroids(spark, path)
    def dist(c: Array[Double]): Double = {
      var qq = 0.0; var qc = 0.0; var cc = 0.0
      var i = 0
      while (i < qvec.length) {
        qq += qvec(i) * qvec(i); qc += qvec(i) * c(i); cc += c(i) * c(i); i += 1
      }
      qq - 2.0 * qc + cc
    }
    val probes = cents.indices.sortBy(j => (dist(cents(j)), j)).take(nprobe).map(_.toLong)
    val qn = math.sqrt(qvec.foldLeft(0.0)((a, x) => a + x * x))
    val probed = spark.read.parquet(s"$path/data")
      // partition-column filter → planning-time directory pruning
      .filter(col("cent").isInCollection(probes))
    // subtract pending deletes AFTER pruning, BEFORE the top-k cut —
    // a deleted vector must not eat a result slot
    minusDeleted(spark, path, probed)
      .withColumn("cos",
        graft.functions.VectorExprs.dotp(col("v"), typedlit(qvec.toSeq)) /
          (col("norm") * qn))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select("vec_id", "cent", "cos")
  }
}
