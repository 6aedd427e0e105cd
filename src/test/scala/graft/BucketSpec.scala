package graft

import org.apache.spark.sql.functions._

import graft.sources.GeoParquet
import graft.sources.v2.{GraftCatalog, GraftSource}

/** Hash-bucketed layouts ([[GeoParquet.writeBucketed]]): bucket id =
  * pmod(murmur3(key), n) = the write shuffle's partition index, so
  * part-file names certify bucket membership.  What that buys:
  * point-lookup pruning that never erodes with appends, and
  * storage-partitioned joins — two same-bucketed graft tables join on
  * the key with ZERO shuffle (the scan reports KeyGroupedPartitioning
  * resolved through the catalog's v2 `bucket` function).
  */
class BucketSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("bucketwh").toString
    spark.conf.set("spark.sql.catalog.bkt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bkt.warehouse", w)
    w
  }

  private def rows(from: Int, until: Int, vMul: Double) =
    (from until until).map { i =>
      (i.toLong, i * vMul, s"t${i % 7}")
    }.toDF("id", "v", "tag")

  private def mkBucketed(ns: String, tbl: String, n: Int,
                         nBuckets: Int, vMul: Double = 1.0): String = {
    val dir = s"$warehouse/$ns/$tbl"
    GeoParquet.writeBucketed(rows(0, n, vMul), dir, "id", nBuckets)
    dir
  }

  /** STAGE-AWARE shuffle count (graft.core.PlanWalk): these asserts
    * run AFTER collect(), when the AQE plan is result stages whose
    * interiors a naive collect never visits — a plain traversal reads
    * 0 for ANY join and the zero-shuffle assertions would be vacuous.
    */
  private def shuffles(q: org.apache.spark.sql.DataFrame): Int =
    graft.core.PlanWalk.shuffles(q.queryExecution.executedPlan)

  /** Self-check that `shuffles` can actually SEE a shuffle: a plain
    * aggregate over a fresh non-bucketed frame must count ≥ 1 after
    * execution, or every zero assertion in this suite proves nothing.
    */
  private def assertCounterBites(): Unit = {
    val df = spark.range(1000).toDF("k")
      .groupBy((col("k") % 7).as("g")).count()
    df.collect()
    assert(graft.core.PlanWalk.shuffles(df.queryExecution.executedPlan) >= 1,
      "plan walker cannot see shuffles inside executed query stages")
  }

  private def withConfs[T](kvs: (String, String)*)(body: => T): T = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def spjConfs[T](body: => T): T = withConfs(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")(body)

  test("writeBucketed: every file's rows hash to its part index") {
    val nBuckets = 8
    val dir = mkBucketed("unit", "certify", 3000, nBuckets)
    // round trip
    val back = spark.read.format("graft").load(dir)
    assert(back.count() == 3000)
    assert(back.select("id", "v", "tag")
      .exceptAll(rows(0, 3000, 1.0)).count() == 0)
    // per-file: parsed part index == pmod(murmur3(id), n) of every row
    val files = spark.read.parquet(dir).inputFiles
    assert(files.nonEmpty)
    files.foreach { f =>
      val base = f.substring(f.lastIndexOf('/') + 1)
      val idx = "^part-(\\d+)-.*".r.findFirstMatchIn(base).get.group(1).toInt
      val got = spark.read.parquet(f)
        .select(pmod(hash(col("id")), lit(nBuckets)).as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq
      assert(got == Seq(idx),
        s"file $base holds buckets $got, name certifies $idx")
    }
  }

  test("bucket point-lookup prunes to the key's bucket, exact answer") {
    val dir = mkBucketed("unit", "probe", 4000, 16)
    spark.read.format("graft").load(dir).createOrReplaceTempView("bprobe")
    val one = spark.sql("SELECT id, v FROM bprobe WHERE id = 1234")
    assert(one.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1234L, 1234.0)))
    val planned = GraftSource.lastPlannedFiles.get(dir).size
    val total = spark.read.parquet(dir).inputFiles.length
    assert(planned < total, s"no bucket prune: $planned of $total")
    // IN over two keys: union of their buckets, still pruned
    val two = spark.sql("SELECT sum(id) AS s FROM bprobe WHERE id IN (7, 99)")
    assert(two.collect()(0).getLong(0) == 106L)
    assert(GraftSource.lastPlannedFiles.get(dir).size <= 2 * (total / 16 + 1))
  }

  test("storage-partitioned join: same buckets, zero shuffle") {
    assertCounterBites()
    mkBucketed("spj", "ta", 2500, 8, 1.0)
    mkBucketed("spj", "tb", 2500, 8, 3.0)
    spjConfs {
      val q = spark.sql(
        """SELECT a.id, a.v AS va, b.v AS vb
          |FROM bkt.spj.ta a JOIN bkt.spj.tb b ON a.id = b.id""".stripMargin)
      val got = q.collect()
      assert(got.length == 2500)
      assert(got.forall(r => r.getDouble(2) == 3.0 * r.getDouble(1)))
      assert(shuffles(q) == 0,
        "expected a storage-partitioned join with zero shuffles:\n" +
          q.queryExecution.executedPlan)
    }
  }

  test("SPJ survives appends (several files per bucket group)") {
    val ta = s"$warehouse/grow/ta"
    val tb = s"$warehouse/grow/tb"
    GeoParquet.writeBucketed(rows(0, 1500, 1.0), ta, "id", 4)
    GeoParquet.writeBucketed(rows(0, 2000, 2.0), tb, "id", 4)
    GeoParquet.appendCurve(rows(1500, 2000, 1.0), ta, 1.0)
    spjConfs {
      val q = spark.sql(
        """SELECT a.id, a.v AS va, b.v AS vb
          |FROM bkt.grow.ta a JOIN bkt.grow.tb b ON a.id = b.id""".stripMargin)
      val got = q.collect()
      assert(got.length == 2000)
      assert(got.forall(r => r.getDouble(2) == 2.0 * r.getDouble(1)))
      assert(shuffles(q) == 0,
        "appended bucketed layout lost its SPJ:\n" +
          q.queryExecution.executedPlan)
    }
    // and the appended table still round-trips exactly
    assert(spark.sql("SELECT count(*) AS n FROM bkt.grow.ta")
      .collect()(0).getLong(0) == 2000)
  }

  test("aggregation on the bucket key needs no shuffle either") {
    mkBucketed("agg", "t", 3000, 8)
    spjConfs {
      val q = spark.sql(
        "SELECT id, sum(v) AS sv FROM bkt.agg.t GROUP BY id")
      assert(q.count() == 3000)
      assert(shuffles(q) == 0,
        "bucket-key aggregation should ride the reported partitioning:\n" +
          q.queryExecution.executedPlan)
    }
  }

  test("mismatched bucket counts: correct with a shuffle") {
    mkBucketed("mix", "t8", 1000, 8, 1.0)
    mkBucketed("mix", "t4", 1000, 4, 5.0)
    spjConfs {
      val q = spark.sql(
        """SELECT a.id, b.v FROM bkt.mix.t8 a JOIN bkt.mix.t4 b
          |ON a.id = b.id WHERE a.id < 10""".stripMargin)
      val got = q.collect()
      assert(got.length == 10)
      assert(got.forall(r => r.getDouble(1) == 5.0 * r.getLong(0)))
      // 8 and 4 buckets are INCOMPATIBLE without the reducible-
      // transforms conf: the join must have shuffled — and the
      // counter must see it (the positive control for every
      // zero-shuffle assertion in this suite)
      assert(shuffles(q) >= 1,
        "mismatched bucket counts joined without a visible shuffle:\n" +
          q.queryExecution.executedPlan)
    }
  }

  test("SQL UPDATE composes: certificate intact, probe pruned + fresh") {
    val dir = mkBucketed("mut", "t", 2000, 8)
    spark.sql("UPDATE bkt.mut.t SET v = v + 0.5 WHERE id = 77")
    val got = spark.sql("SELECT v FROM bkt.mut.t WHERE id = 77").collect()
    assert(got.map(_.getDouble(0)).toSeq == Seq(77.5))
    // the re-inserted row landed in a bucket-certified file: the
    // point probe still plans a strict subset
    val planned = GraftSource.lastPlannedFiles.get(dir).size
    val total = spark.read.parquet(dir).inputFiles.length
    assert(planned < total, s"bucket prune lost after UPDATE: $planned/$total")
    // whole table still exact under merge-on-read
    assert(spark.sql("SELECT count(*) AS n FROM bkt.mut.t")
      .collect()(0).getLong(0) == 2000)
  }

  test("upsertKeyed on a bucketed target opens only the batch's buckets") {
    val dir = s"$warehouse/merge/t"
    GeoParquet.writeBucketed(rows(0, 4000, 1.0), dir, "id", 16)
    GeoParquet.upsertKeyed(
      Seq((77L, -1.0, "x"), (78L, -2.0, "y")).toDF("id", "v", "tag"),
      dir, "id")
    // the doomed-address lookup opened at most the two keys' buckets
    // — on a bucketed target the [k0,k1] range prune matches nearly
    // every file (hash-spread ranges), the bucket set is exact
    val looked = GeoParquet.lastMergeLookup.get(dir)
    val total = spark.read.parquet(dir).inputFiles.length
    assert(looked.nonEmpty && looked.size <= 2,
      s"merge lookup opened ${looked.size} of $total files")
    // merge semantics intact: exactly the latest copy per key
    GeoParquet.writeBucketed(rows(0, 4000, 2.0), s"$warehouse/merge/u",
      "id", 16)
    spjConfs {
      val q = spark.sql(
        "SELECT a.id, a.v, b.v AS bv FROM bkt.merge.t a " +
          "JOIN bkt.merge.u b ON a.id = b.id")
      val got = q.collect()
      assert(got.length == 4000)
      val m = got.map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(m(77L) == -1.0 && m(78L) == -2.0 && m(100L) == 100.0)
      // SPJ composes with the merge's pending positional deletes:
      // still zero shuffles, and the doomed copies stay subtracted
      assert(shuffles(q) == 0,
        "post-merge bucketed join lost its SPJ:\n" +
          q.queryExecution.executedPlan)
    }
  }

  test("pure-SQL bucketed CDC table: CREATE('key','buckets') → INSERT → SPJ") {
    spark.sql(
      """CREATE TABLE bkt.ddl.t (id BIGINT, v DOUBLE)
        |TBLPROPERTIES('key'='id','buckets'='4')""".stripMargin)
    spark.sql(
      "INSERT INTO bkt.ddl.t SELECT id, CAST(id AS DOUBLE) FROM range(1000)")
    spark.sql(
      "INSERT INTO bkt.ddl.t SELECT id + 1000, CAST(id + 1000 AS DOUBLE) " +
        "FROM range(500)")
    val dir = s"$warehouse/ddl/t"
    // bucket-certified from the FIRST batch: a point probe prunes
    spark.sql("SELECT v FROM bkt.ddl.t WHERE id = 42").collect()
    val planned = GraftSource.lastPlannedFiles.get(dir).size
    val total = spark.read.parquet(dir).inputFiles.length
    assert(planned < total, s"DDL bucket prune: $planned/$total")
    // and the table joins shuffle-free against a same-n writeBucketed one
    GeoParquet.writeBucketed(rows(0, 1500, 7.0), s"$warehouse/ddl/u", "id", 4)
    spjConfs {
      val q = spark.sql(
        "SELECT a.id, a.v, b.v AS bv FROM bkt.ddl.t a JOIN bkt.ddl.u b " +
          "ON a.id = b.id")
      val got = q.collect()
      assert(got.length == 1500)
      assert(got.forall(r => r.getDouble(2) == 7.0 * r.getLong(0)))
      assert(shuffles(q) == 0,
        "DDL bucketed table did not storage-partition its join:\n" +
          q.queryExecution.executedPlan)
    }
    // refusals: buckets without a key; buckets on a composite key
    intercept[Exception](spark.sql(
      "CREATE TABLE bkt.ddl.bad (id BIGINT) TBLPROPERTIES('buckets'='4')"))
    intercept[Exception](spark.sql(
      """CREATE TABLE bkt.ddl.bad2 (a BIGINT, b BIGINT)
        |TBLPROPERTIES('key'='a,b','buckets'='4')""".stripMargin))
  }

  test("COUNT pushdown bucket-prunes: a point count touches one bucket") {
    val dir = mkBucketed("aggp", "t", 4000, 16)
    spark.read.format("graft").load(dir).createOrReplaceTempView("baggp")
    val n = spark.sql("SELECT count(*) AS n FROM baggp WHERE id = 1234")
      .collect()(0).getLong(0)
    assert(n == 1)
    // off-bucket files were dropped from BOTH the stats and scan
    // sides of the pushdown split — the point count touched a bucket,
    // not the corpus
    val (answered, scanned) = GraftSource.lastAggPlan.get(dir)
    val total = spark.read.parquet(dir).inputFiles.length
    assert(answered + scanned < total,
      s"agg bucket prune: answered=$answered scanned=$scanned of $total")
    // a band predicate has no usable equality conjunct: unpruned, exact
    assert(spark.sql(
      "SELECT count(*) AS n FROM baggp WHERE id >= 0 AND id < 100")
      .collect()(0).getLong(0) == 100)
  }

  test("CALL system.compact re-buckets: certificate survives maintenance") {
    val dir = mkBucketed("comp", "t", 2000, 8)
    spark.sql("UPDATE bkt.comp.t SET v = -v WHERE id = 55")
    spark.sql("CALL bkt.system.compact('comp.t')").collect()
    // compaction applied the pending delete physically AND re-bucketed:
    // every file still certifies its bucket, the probe still prunes,
    // and the mutation survived the rewrite
    val got = spark.sql("SELECT v FROM bkt.comp.t WHERE id = 55").collect()
    assert(got.map(_.getDouble(0)).toSeq == Seq(-55.0))
    val planned = GraftSource.lastPlannedFiles.get(dir).size
    val total = spark.read.parquet(dir).inputFiles.length
    assert(planned < total, s"post-compact bucket prune: $planned/$total")
    assert(spark.sql("SELECT count(*) AS n FROM bkt.comp.t")
      .collect()(0).getLong(0) == 2000)
  }

  test("rebucket evolves the count: certificate swaps atomically, SPJ and prunes hold") {
    val ta = mkBucketed("rebkt", "ta", 2400, 8, 1.0)
    GeoParquet.appendCurve(rows(2400, 3000, 1.0), ta, 1.0)
    val tb = mkBucketed("rebkt", "tb", 3000, 16, 4.0)
    // 8 vs 16 without reducible transforms: must shuffle (control)
    spjConfs {
      val pre = spark.sql(
        """SELECT a.id, b.v FROM bkt.rebkt.ta a JOIN bkt.rebkt.tb b
          |ON a.id = b.id""".stripMargin)
      pre.collect()
      assert(shuffles(pre) >= 1, "control: 8 vs 16 joined shuffle-free?")
    }
    GeoParquet.rebucket(spark, ta, 16)
    // the evolved certificate: sidecar says 16 and EVERY file's rows
    // hash to its (new) part index
    val files = spark.read.parquet(ta).inputFiles
    files.foreach { f =>
      val base = f.substring(f.lastIndexOf('/') + 1)
      val idx = "^part-(\\d+)-.*".r.findFirstMatchIn(base).get.group(1).toInt
      val got = spark.read.parquet(f)
        .select(pmod(hash(col("id")), lit(16)).as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq
      assert(got == Seq(idx), s"file $base holds rows of buckets $got")
    }
    // rows survived the evolution exactly
    val back = spark.read.format("graft").load(ta)
    assert(back.count() == 3000 &&
      back.select("id", "v", "tag").exceptAll(rows(0, 3000, 1.0)).count() == 0)
    spjConfs {
      // now SPJ against the 16-bucket peer: zero shuffle
      val q = spark.sql(
        """SELECT a.id, a.v AS va, b.v AS vb
          |FROM bkt.rebkt.ta a JOIN bkt.rebkt.tb b ON a.id = b.id"""
          .stripMargin)
      val got = q.collect()
      assert(got.length == 3000)
      assert(got.forall(r => r.getDouble(2) == 4.0 * r.getDouble(1)))
      assert(shuffles(q) == 0,
        "rebucketed table lost its SPJ against a same-count peer:\n" +
          q.queryExecution.executedPlan)
    }
    // point probe prunes under the NEW certificate
    val probe = spark.sql("SELECT v FROM bkt.rebkt.ta WHERE id = 77")
    assert(probe.collect().map(_.getDouble(0)).toSeq == Seq(77.0))
    assert(GraftSource.lastPlannedFiles.get(ta).size < files.length,
      "post-rebucket point probe did not prune")
    // the SQL verb: a same-count call is a no-op, a changed count runs
    spark.sql("CALL bkt.system.rebucket('rebkt.ta', 16)").collect()
    spark.sql("CALL bkt.system.rebucket('rebkt.ta', 8)").collect()
    val back8 = spark.read.format("graft").load(ta)
    assert(back8.count() == 3000, "SQL rebucket lost rows")
    spjConfs {
      // 8 now zips the 16-bucket peer via ReducibleFunction when
      // compatible transforms are on (16 reduces onto 8)
      withConfs(
        "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled"
          -> "true",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true") {
        val q = spark.sql(
          """SELECT a.id, b.v FROM bkt.rebkt.ta a JOIN bkt.rebkt.tb b
            |ON a.id = b.id""".stripMargin)
        assert(q.count() == 3000)
        assert(shuffles(q) == 0,
          "8-bucket rebucketed table should zip the 16-bucket peer:\n" +
            q.queryExecution.executedPlan)
      }
    }
  }

  test("compatible bucket counts (8 vs 4) join shuffle-free when enabled") {
    mkBucketed("compat", "t8", 1200, 8, 1.0)
    mkBucketed("compat", "t4", 1200, 4, 5.0)
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled"
        -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // pmod(h, 4) == pmod(pmod(h, 8), 4): the finer side reduces its
      // partition keys with % 4 (ReducibleFunction) and the groups zip
      val q = spark.sql(
        "SELECT a.id, a.v, b.v AS bv FROM bkt.compat.t8 a " +
          "JOIN bkt.compat.t4 b ON a.id = b.id")
      val got = q.collect()
      assert(got.length == 1200)
      assert(got.forall(r => r.getDouble(2) == 5.0 * r.getDouble(1)))
      assert(shuffles(q) == 0,
        "divisible bucket counts should zip without a shuffle:\n" +
          q.queryExecution.executedPlan)
    }
  }

  test("writeStream into a bucketed DDL table keeps the certificate") {
    implicit val sqlCtx = spark.sqlContext
    spark.sql(
      """CREATE TABLE bkt.strm.t (id BIGINT, v DOUBLE)
        |TBLPROPERTIES('key'='id','buckets'='4')""".stripMargin)
    val dir = s"$warehouse/strm/t"
    val ckpt = java.nio.file.Files.createTempDirectory("bktsinkck").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("id", "v")
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .start(dir)
    try {
      mem.addData((0 until 300).map(i => (i.toLong, i * 2.0)): _*)
      q.processAllAvailable()
      mem.addData((300 until 500).map(i => (i.toLong, i * 2.0)): _*)
      q.processAllAvailable()
    } finally q.stop()
    // both micro-batches re-bucketed through the sink's appendCurve
    // dispatch: a point probe still prunes, values exact
    val got = spark.sql("SELECT v FROM bkt.strm.t WHERE id = 431").collect()
    assert(got.map(_.getDouble(0)).toSeq == Seq(862.0))
    val planned = GraftSource.lastPlannedFiles.get(dir).size
    val total = spark.read.parquet(dir).inputFiles.length
    assert(planned < total, s"streamed bucket prune: $planned/$total")
    assert(spark.sql("SELECT count(*) AS n FROM bkt.strm.t")
      .collect()(0).getLong(0) == 500)
  }

  test("compactBucketedIfNeeded gates on files-per-bucket, not overlap") {
    val dir = s"$warehouse/gate/t"
    GeoParquet.writeBucketed(rows(0, 800, 1.0), dir, "id", 4)
    // one append: range-overlap depth is already ~2 everywhere (each
    // bucket file spans most of the key space), but files-per-bucket
    // is 2 — no pressure yet at the default threshold
    GeoParquet.appendCurve(rows(800, 1200, 1.0), dir, 1.0)
    assert(!GeoParquet.compactCurveIfNeeded(spark, dir, nFiles = 1),
      "bucketed gate fired under files-per-bucket 2 <= 4")
    // four more appends: 6 files per touched bucket > 4 — pressure
    (0 until 4).foreach(i =>
      GeoParquet.appendCurve(rows(1200 + i * 100, 1300 + i * 100, 1.0),
        dir, 1.0))
    assert(GeoParquet.compactCurveIfNeeded(spark, dir, nFiles = 1),
      "bucketed gate failed to fire at files-per-bucket > 4")
    // the re-bucketing rewrite restored one file per bucket, kept the
    // certificate, and lost nothing
    assert(spark.read.parquet(dir).inputFiles.length <= 4)
    spark.sql("SELECT v FROM bkt.gate.t WHERE id = 1234").collect()
    assert(GraftSource.lastPlannedFiles.get(dir).size == 1)
    assert(spark.sql("SELECT count(*) AS n FROM bkt.gate.t")
      .collect()(0).getLong(0) == 1600)
  }

  test("a broadcast-dim join bucket-prunes the fact side at runtime") {
    val dir = s"$warehouse/rtf/t"
    GeoParquet.writeBucketed(rows(0, 4000, 1.0), dir, "id", 16)
    spark.read.format("graft").load(dir).createOrReplaceTempView("brtf")
    // a tiny PARQUET dim with a selective predicate on a non-join
    // column — the shape dynamic pruning requires before it injects
    // the runtime In(id, keys) this test exercises (a bare local
    // relation never passes the pruning-has-benefit heuristic)
    val dimDir = java.nio.file.Files.createTempDirectory("brtfdim").toString
    Seq((42L, 1), (77L, 1), (9L, 0)).toDF("id", "pick")
      .write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("brtf_dim")
    val q = spark.sql(
      "SELECT f.id, f.v FROM brtf f JOIN brtf_dim d ON f.id = d.id " +
        "WHERE d.pick = 1")
    val got = q.collect()
    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      Set((42L, 42.0), (77L, 77.0)))
    val planned = GraftSource.lastPlannedFiles.get(dir).size
    val total = spark.read.parquet(dir).inputFiles.length
    assert(planned <= 2 && planned < total,
      s"runtime bucket prune opened $planned of $total files")
  }

  test("one-file-per-bucket layouts join with zero shuffles AND zero sorts") {
    // a fresh writeBucketed IS one key-sorted file per bucket, so the
    // scan reports per-partition key order and the merge join skips
    // its Sort too; after appends stack files the ordering report
    // withdraws (concatenated sorted files are not sorted)
    mkBucketed("ord", "ta", 1500, 4, 1.0)
    mkBucketed("ord", "tb", 1500, 4, 9.0)
    def sorts(q: org.apache.spark.sql.DataFrame): Int =
      graft.core.PlanWalk.nodes(q.queryExecution.executedPlan).count {
        case _: org.apache.spark.sql.execution.SortExec => true
        case _ => false
      }
    spjConfs {
      val q = spark.sql(
        "SELECT a.id, a.v, b.v AS bv FROM bkt.ord.ta a " +
          "JOIN bkt.ord.tb b ON a.id = b.id")
      val got = q.collect()
      assert(got.length == 1500)
      assert(got.forall(r => r.getDouble(2) == 9.0 * r.getDouble(1)))
      assert(shuffles(q) == 0, "ordered join shuffled:\n" +
        q.queryExecution.executedPlan)
      assert(sorts(q) == 0,
        "one-file-per-bucket join did not skip its sorts:\n" +
          q.queryExecution.executedPlan)
    }
    // append → two files in some bucket → ordering withdraws, the
    // join sorts again, results stay exact
    GeoParquet.appendCurve(rows(1500, 1600, 1.0), s"$warehouse/ord/ta", 1.0)
    spjConfs {
      val q2 = spark.sql(
        "SELECT a.id, a.v, b.v AS bv FROM bkt.ord.ta a " +
          "JOIN bkt.ord.tb b ON a.id = b.id")
      assert(q2.collect().length == 1500)
      assert(shuffles(q2) == 0)
      assert(sorts(q2) >= 1,
        "multi-file buckets must not claim per-partition order:\n" +
          q2.queryExecution.executedPlan)
    }
  }

  test("DESCRIBE EXTENDED surfaces the bucket geometry") {
    mkBucketed("descb", "t", 500, 4)
    val out = spark.sql("DESCRIBE TABLE EXTENDED bkt.descb.t")
      .collect().map(_.toString).mkString("\n")
    assert(out.contains("buckets=4") && out.contains("key=id"), out)
  }

  test("a foreign (uncertified) file disables bucket pruning, not reads") {
    val dir = mkBucketed("alien", "t", 1000, 8)
    // hand-copy one data file under a non-part name and rebuild
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val src = spark.read.parquet(dir).inputFiles.head
      .stripPrefix("file:")
    val dst = new org.apache.hadoop.fs.Path(dir, "alien-copy.parquet")
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(src), fs, dst, false,
      spark.sparkContext.hadoopConfiguration)
    GeoParquet.writeManifest(spark, dir)
    spark.read.format("graft").load(dir).createOrReplaceTempView("talien")
    // the duplicated file's rows appear (it IS data now)
    val n = spark.sql("SELECT count(*) AS n FROM talien").collect()(0).getLong(0)
    val dupRows = spark.read.parquet(s"file:$src").count()
    assert(n == 1000 + dupRows)
    // the REAL pin: a key living in the uncertified file must come
    // back TWICE (original + duplicate).  A bucket prune that still
    // fired would drop the unparseable file and lose the duplicate.
    // (The range [k0,k1] prune may legitimately narrow the plan —
    // the alien file covers its own keys, so it always survives it.)
    val aKey = spark.read.parquet(s"file:$src").select("id").head().getLong(0)
    val got = spark.sql(s"SELECT id FROM talien WHERE id = $aKey").collect()
    assert(got.length == 2,
      s"duplicate row lost — bucket prune mis-fired on an uncertified " +
        s"file (got ${got.length} rows for id=$aKey)")
  }
}
