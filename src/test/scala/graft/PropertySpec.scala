package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests pinning the subtle semantics against brute-force
  * Scala references on seeded random inputs (plain ScalaCheck Gen —
  * scalatestplus isn't on the classpath).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  /** The reference's pt_blockmedian selection (pt_blockmedian.py:37-57)
    * on one cell, straight from the numpy index arithmetic.
    */
  private def refBlockmedian(zs: Seq[Double]): Double = {
    val s = zs.sorted
    val n = s.length
    val iM = math.max(n / 2.0 - 1, 0)
    if (iM == math.floor(iM) && n > 1) (s(iM.toInt) + s(iM.toInt + 1)) / 2.0
    else s(math.floor(iM).toInt)
  }

  test("property: rank-window blockmedian = reference index arithmetic") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-1000.0, 1000.0))
    for (zs <- samples(gen, 25); distinct = zs.distinct if distinct.nonEmpty) {
      val df = distinct.zipWithIndex
        .map { case (z, i) => (i.toLong, z) }.toDF("id", "z")
      val w = Window.partitionBy(lit(1))
      val got = df
        .withColumn("rnk", row_number().over(w.orderBy("z", "id")))
        .withColumn("n", count("*").over(w))
        .filter(
          (col("n") % 2 === 0 && (col("rnk") === col("n") / 2 || col("rnk") === col("n") / 2 + 1)) ||
          (col("n") % 2 === 1 && col("rnk") === greatest((col("n") - 1) / 2, lit(1.0))))
        .agg(avg("z")).as[Double].head()
      assert(got == refBlockmedian(distinct), s"cell=$distinct")
    }
  }

  /** Exact parametric 2-segment intersection (xover_search.py:23-40). */
  private def refXPoint(a1: (Double, Double), a2: (Double, Double),
                        b1: (Double, Double), b2: (Double, Double)): Option[(Double, Double)] = {
    val (dxa, dya) = (a2._1 - a1._1, a2._2 - a1._2)
    val (dxb, dyb) = (b2._1 - b1._1, b2._2 - b1._2)
    val det = dxa * dyb - dya * dxb
    if (det == 0.0) None
    else {
      val ex = b1._1 - a1._1; val ey = b1._2 - a1._2
      val sa = (ex * dyb - ey * dxb) / det
      val sb = (ex * dya - ey * dxa) / det
      if (sa >= 0 && sa <= 1 && sb >= 0 && sb <= 1)
        Some((a1._1 + sa * dxa, a1._2 + sa * dya))
      else None
    }
  }

  test("property: crossover intersection lies on both segments") {
    val coord = Gen.chooseNum(-100.0, 100.0)
    val seg = for { x1 <- coord; y1 <- coord; x2 <- coord; y2 <- coord }
      yield ((x1, y1), (x2, y2))
    val pair = for { a <- seg; b <- seg } yield (a, b)
    var hits = 0
    for (((a1, a2), (b1, b2)) <- samples(pair, 300)) {
      refXPoint(a1, a2, b1, b2).foreach { case (xc, yc) =>
        hits += 1
        def inBox(p: (Double, Double), q: (Double, Double)): Boolean =
          xc >= math.min(p._1, q._1) - 1e-9 && xc <= math.max(p._1, q._1) + 1e-9 &&
          yc >= math.min(p._2, q._2) - 1e-9 && yc <= math.max(p._2, q._2) + 1e-9
        assert(inBox(a1, a2) && inBox(b1, b2))
        def cross(p: (Double, Double), q: (Double, Double)): Double =
          (q._1 - p._1) * (yc - p._2) - (q._2 - p._2) * (xc - p._1)
        val tol = 1e-6 * (1.0 + math.abs(xc) + math.abs(yc)) * 200.0
        assert(math.abs(cross(a1, a2)) < tol && math.abs(cross(b1, b2)) < tol)
      }
    }
    assert(hits > 10) // the generator produces a healthy crossing rate
  }

  test("property: Spark shingle jaccard = brute-force set jaccard") {
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f")
    val doc = Gen.listOfN(12, word).map(_.mkString(" "))
    val pairGen = for { a <- doc; b <- doc } yield (a, b)
    val pairs = samples(pairGen, 12)
    val docsDf = pairs.zipWithIndex.flatMap { case ((t1, t2), i) =>
      Seq((i * 2L, t1), (i * 2L + 1, t2))
    }.toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .jaccardOf(graft.operators.Dedup.shinglesOf(docsDf))
      .filter(col("d2") === col("d1") + 1 && col("d1") % 2 === 0) // in-pair rows only
      .select("d1", "jaccard").as[(Long, Double)].collect().toMap
    def sh(t: String): Set[String] =
      t.split(" ").sliding(5).map(_.mkString(" ")).toSet
    pairs.zipWithIndex.foreach { case ((t1, t2), i) =>
      val (s1, s2) = (sh(t1), sh(t2))
      val inter = (s1 & s2).size
      if (inter == 0) assert(!got.contains(i * 2L))
      else assert(got(i * 2L) == inter.toDouble / (s1.size + s2.size - inter),
        s"pair $i: $t1 | $t2")
    }
  }

  test("property: asofJoin = brute-force latest-at-or-before scan") {
    val rowGen = for {
      k <- Gen.chooseNum(0L, 3L)     // few keys → dense collisions
      t <- Gen.chooseNum(0L, 50L)    // small range → many exact ties
    } yield (k, t)
    val tables = Gen.listOfN(30, rowGen)
    for (seed <- 0 until 8) {
      val ls = samples(tables, 1).head.zipWithIndex
        .map { case ((k, t), i) => (k, t, 1000L + i) }
      val rs = samples(tables, 1).headOption.toList
        .flatMap(_.map { case (k, t) => (k, t) })
        .zipWithIndex.map { case ((k, t), i) => (k, (t * (seed + 1)) % 53, 2000L + i, i * 1.5) }
      val left = ls.toDF("k", "t", "id")
      val right = rs.toDF("k", "t", "id", "v")
      val got = graft.operators.TemporalJoins.asofJoin(left, right, "k", "t", "id")
        .select($"id", $"r_id").as[(Long, Option[Long])].collect().toMap
      ls.foreach { case (k, t, id) =>
        // latest right row at-or-before; ties at the same time → max id
        val want = rs.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
        assert(got(id) == want, s"seed $seed left ($k,$t,$id)")
      }
    }
  }

  test("property: connectedComponents = driver-side union-find") {
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 19L); b <- Gen.chooseNum(0L, 19L)
    } yield (a, b)
    for (i <- 0 until 6) {
      val edges = samples(Gen.listOfN(15, edgeGen), 1).head
        .map { case (a, b) => (a + i, b + i) } // shift per round for variety
      val got = graft.operators.Components
        .connectedComponents(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      // union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        if (a != b) { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      }
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }
        .filter(n => edges.exists { case (a, b) => a != b && (a == n || b == n) })
        .distinct
      val want = nodes.map(n => n -> find(n)).toMap
      assert(got == want, s"round $i: $edges")
    }
  }

  test("property: chained upsertKeyed merges = a driver-side Map") {
    import graft.sources.GeoParquet
    // random seed table + 3 random update batches (overlapping keys,
    // inserts and replacements mixed) — the layout must end exactly
    // at the Map the same batches fold to
    val kv = for {
      k <- Gen.chooseNum(0L, 40L) // few keys → dense replacement
      v <- Gen.chooseNum(-1000.0, 1000.0).map(math.rint)
    } yield (k, v)
    (0 until 3).foreach { round =>
      val seed = samples(Gen.listOfN(25, kv), 1).head
        .groupBy(_._1).map(_._2.head).toSeq // unique keys in the seed
      val batches = (1 to 3).map(b =>
        samples(Gen.listOfN(10, kv), 1).map(_.map {
          case (k, v) => (k, v + b * 10000.0 + round) // batch-distinct values
        }).head.groupBy(_._1).map(_._2.head).toSeq)
      val dir = java.nio.file.Files.createTempDirectory(s"upsprop$round").toString
      GeoParquet.writeKeyed(seed.toDF("id", "z"), dir, "id", nFiles = 4)
      batches.foreach(b => GeoParquet.upsertKeyed(b.toDF("id", "z"), dir, "id"))
      val got = GeoParquet.readMerged(spark, dir)
        .select("id", "z").as[(Long, Double)].collect().toMap
      val want = batches.foldLeft(seed.toMap)((m, b) => m ++ b.toMap)
      assert(got == want, s"round $round")
    }
  }
}
