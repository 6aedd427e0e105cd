package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextOps, Relational, DateOps}

class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup partitions the corpus") {
    val d = Dedup.dedupExact(spark, sf)
    val docs = graft.core.Tables.t(spark, sf, "documents").count()
    assert(d.agg(sum("n_copies")).as[Long].head() == docs)
  }

  test("jaccard pairs are symmetric-free and bounded in [0,1]") {
    val j = Dedup.jaccard(spark, sf)
    assert(j.filter($"d1" >= $"d2").count() == 0)
    assert(j.filter($"jaccard" < 0 || $"jaccard" > 1).count() == 0)
  }

  test("prefix filtering shrinks the candidate space without losing a pair") {
    import org.apache.spark.sql.expressions.Window
    val sh = graft.operators.Dedup.dfCapped(
      graft.operators.Dedup.shinglesOf(graft.core.Tables.t(spark, sf, "documents"))).cache()
    val anyShare = sh.as("a").join(sh.as("b"),
        $"a.gh" === $"b.gh" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct().count()
    val sizes = sh.groupBy("doc_id").agg(count("*").as("sz"))
    val w = Window.partitionBy("doc_id").orderBy("gh")
    val prefix = sh.join(sizes, "doc_id")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= floor(lit(0.5) * $"sz") + 1)
      .select("doc_id", "gh")
    val prefixShare = prefix.as("a").join(prefix.as("b"),
        $"a.gh" === $"b.gh" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct().count()
    // strictly smaller candidate set...
    assert(prefixShare < anyShare, s"$prefixShare !< $anyShare")
    // ...with identical final output (already hash-proven vs the
    // unpruned oracle; re-assert in-engine against the plain join)
    val pruned = graft.operators.Dedup.jaccardPrefix(spark, sf)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val plain = graft.operators.Dedup.jaccard(spark, sf)
      .filter($"jaccard" >= 0.5).select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pruned == plain)
    // thresholds whose complement is NOT exactly representable
    // (1 − 0.9 rounds below 0.1 — the formula that undersized the
    // prefix) must still lose nothing
    for (t <- Seq(0.9, 0.7, 0.95)) {
      val p = graft.operators.Dedup.jaccardPrefix(spark, sf, minJ = t)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      val q = graft.operators.Dedup.jaccard(spark, sf)
        .filter($"jaccard" >= t).select("d1", "d2").as[(Long, Long)].collect().toSet
      assert(p == q, s"threshold $t: ${q -- p} lost, ${p -- q} extra")
    }
    sh.unpersist()
  }

  test("approx df cap: drops every truly-hot shingle, keeps nearly all others") {
    val sh = Dedup.shinglesOf(graft.core.Tables.t(spark, sf, "documents"))
      .cache()
    val cap = 10
    val exact = Dedup.dfCapped(sh, cap).cache()
    val approx = Dedup.dfCappedApprox(sh, cap).cache()
    // CMS never undercounts => the approx stop set is a superset of the
    // exact one => the approx-capped frame is a SUBSET of the exact
    assert(approx.exceptAll(exact).count() == 0)
    // and the collision overshoot is small: ≥90% of the exact frame kept
    val kept = approx.count().toDouble / exact.count()
    assert(kept >= 0.9, s"approx cap kept only ${kept * 100}% of the exact frame")
    // the skew contract itself: no surviving shingle exceeds the cap
    assert(approx.groupBy("gh").count().filter($"count" > cap).count() == 0)
    sh.unpersist(); exact.unpersist(); approx.unpersist()
  }

  test("minhash est_sim upper-bounds nothing below 0 and at most 1") {
    val m = Dedup.minhashLsh(spark, sf)
    assert(m.filter($"est_sim" < 0 || $"est_sim" > 1).count() == 0)
  }

  test("jaccard df cap drops stop shingles from the candidate join input") {
    // 20 docs all sharing one hot prefix phrase (df=20); docs 0/1 also
    // share a rare tail phrase (df=2)
    val hot = "the quick brown fox jumps over the lazy dog again"
    val docsDf = (0 until 20).map { i =>
      val tail = if (i < 2) "rare shared tail phrase unique pair marker"
                 else s"filler $i text $i pad $i pad pad pad pad"
      (i.toLong, s"$hot $tail")
    }.toDF("doc_id", "text")
    val sh = graft.operators.Dedup.shinglesOf(docsDf)
    val capped = graft.operators.Dedup.dfCapped(sh, dfCap = 5)
    // no shingle above the cap survives
    assert(capped.groupBy("gh").count().filter($"count" > 5).count() == 0)
    // pairs connected only through the hot phrase are gone; the
    // rare-tail pair (0,1) survives
    val pairs = graft.operators.Dedup.jaccardOf(sh, dfCap = 5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.forall { case (a, b) => Set(a, b).subsetOf(Set(0L, 1L)) },
      s"hot-shingle-only pairs leaked: $pairs")
  }

  test("multi-probe banding finds EVERY pair within hamming 7 (exhaustive)") {
    // brute-force all-pairs hamming over the 60-bit signatures, then
    // assert the banded multi-probe candidate generation missed none
    // with d <= 7 — the pigeonhole guarantee, checked empirically
    val sigs = Dedup.simhash60(spark, sf).persist()
    val brute = sigs.as("a").join(sigs.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
        graft.functions.VectorExprs.hamming($"a.h", $"b.h").as("hm"))
      .filter($"hm" <= 7)
      .select("d1", "d2")
    val found = Dedup.simhashPairs(spark, sf).select("d1", "d2")
    assert(brute.count() > 0, "test corpus has no close pairs — vacuous")
    assert(brute.exceptAll(found).count() == 0,
      "a hamming<=7 pair escaped the multi-probe banding")
    sigs.unpersist()
  }

  test("banded simhash pair search honors its hamming contract") {
    val p = Dedup.simhashPairs(spark, sf)
    assert(p.filter($"hamming" > 8 || $"hamming" < 0).count() == 0)
    assert(p.filter($"d1" >= $"d2").count() == 0)
    // identical docs (hamming 0) are always candidates — every band
    // matches, the pigeonhole guarantee of the 4×15-bit banding; the
    // corpus contains exact duplicates by construction
    val dups = Dedup.dedupExact(spark, sf).filter($"n_copies" > 1).count()
    if (dups > 0) assert(p.filter($"hamming" === 0).count() > 0)
  }

  test("simhash signatures fit in 32 bits") {
    val sh = Dedup.simhash(spark, sf)
    assert(sh.filter($"simhash32" < 0 || $"simhash32" > ((1L << 32) - 1)).count() == 0)
    assert(sh.count() == graft.core.Tables.t(spark, sf, "documents").count())
  }

  test("IVF centroids are learned and the assignment is balanced") {
    val base = Similarity.emb(spark, sf)
      .withColumn("vv", graft.functions.VectorExprs.dotp($"v", $"v"))
      .withColumn("norm", sqrt($"vv"))
      .filter($"norm" > 0.0)
    val cents = Similarity.refinedCentroids(base)
    assert(cents.length == 8)
    // learning moved every centroid off its formula seed
    (0 until 8).foreach { j =>
      assert(!cents(j).sameElements(Similarity.centroidArr(j)),
        s"centroid $j did not move")
    }
    // assignment balance: the refined argmin leaves no empty cluster
    // and no cluster swallows the corpus
    val asg = Similarity.annIvf(spark, sf).groupBy("cent").count()
      .as[(Long, Long)].collect().toMap
    val n = asg.values.sum.toDouble
    assert(asg.nonEmpty && asg.values.max / n <= 0.9,
      s"degenerate assignment: $asg")
  }

  test("parameterized IVF: probing every list is exactly brute force") {
    val e = Similarity.emb(spark, sf)
    val cents = Similarity.ivfCentroids(e, 8)
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    // nprobe = ncent ⇒ every candidate scored ⇒ identical to the
    // exact brute-force ranking
    val full = Similarity.ivfSearch(e, qids, cents, nprobe = 8, k = 10)
      .select("qid", "rnk", "vid", "cos")
    val brute = Similarity.cosineTopk(spark, sf)
      .select("qid", "rnk", "vid", "cos")
    assert(full.exceptAll(brute).count() == 0 && brute.exceptAll(full).count() == 0)
    // narrow probing returns at most k per query and overlaps the truth
    val two = Similarity.ivfSearch(e, qids, cents, nprobe = 2, k = 10)
    val perQ = two.groupBy("qid").count()
    assert(perQ.filter($"count" > 10).count() == 0)
    assert(two.select("qid", "vid").intersect(brute.select("qid", "vid")).count() > 0)
  }

  test("parameterized LSH: zero planes is exactly brute force") {
    val e = Similarity.emb(spark, sf)
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val zero = Similarity.lshSearch(e, qids, nplanes = 0, k = 10)
      .select("qid", "rnk", "vid", "cos")
    val brute = Similarity.cosineTopk(spark, sf)
      .select("qid", "rnk", "vid", "cos")
    assert(zero.exceptAll(brute).count() == 0 && brute.exceptAll(zero).count() == 0)
    // more planes ⇒ fewer candidates per bucket, results stay bounded
    val eight = Similarity.lshSearch(e, qids, nplanes = 8, k = 10)
    assert(eight.groupBy("qid").count().filter($"count" > 10).count() == 0)
  }

  test("cosine top-k returns k ranked neighbors per query") {
    val c = Similarity.cosineTopk(spark, sf)
    val perQ = c.groupBy("qid").agg(count("*").as("n"), max("rnk").as("mr"))
    assert(perQ.filter($"n" =!= 10 || $"mr" =!= 10).count() == 0)
    assert(c.filter($"cos" < -1.0 || $"cos" > 1.0).count() == 0)
    // ranks strictly ordered by cosine desc within query
    val viol = c.as("a").join(c.as("b"),
      $"a.qid" === $"b.qid" && $"a.rnk" < $"b.rnk" && $"a.cos" < $"b.cos").count()
    assert(viol == 0)
  }

  test("ann lsh candidates share the query's bucket") {
    val a = Similarity.annLsh(spark, sf)
    assert(a.count() > 0)
    assert(a.filter($"cos" < -1.0 || $"cos" > 1.0).count() == 0)
  }

  test("token counts are consistent with text length") {
    val t = TextOps.tokenCount(spark, sf)
    assert(t.filter($"n_tokens" < 1).count() == 0)
    assert(t.filter($"avg_tok_len" <= 0).count() == 0)
  }

  test("language id always predicts a language from the candidate set") {
    val l = TextOps.langId(spark, sf)
    assert(l.filter(!$"lang_pred".isin("en", "de", "es")).count() == 0)
  }

  test("sessionization: session counts sum to event count") {
    val s = Relational.sessionize(spark, sf)
    val events = graft.core.Tables.t(spark, sf, "events").count()
    assert(s.agg(sum("n_events")).as[Long].head() == events)
    assert(s.filter($"t_end" < $"t_start").count() == 0)
  }

  test("json_nested: parsed aggregates reconcile with the base columns") {
    val r = Relational.jsonNested(spark, sf).cache()
    val e = graft.core.Tables.t(spark, sf, "events")
    // every (seg, t) bucket: 7 segs × 2 item types, all events represented
    assert(r.count() == 14)
    assert(r.agg(sum("n_events")).as[Long].head() == 2 * e.count())
    // the parsed sum round-trips the modular arithmetic the JSON carried
    val wantA = e.agg(sum(col("event_id") % 5)).as[Long].head()
    val wantB = e.agg(sum(col("event_id") % 3)).as[Long].head()
    assert(r.filter($"t" === "a").agg(sum("sum_n")).as[Long].head() == wantA)
    assert(r.filter($"t" === "b").agg(sum("sum_n")).as[Long].head() == wantB)
    assert(r.filter($"max_n" > 4 || ($"t" === "b" && $"max_n" > 2)).count() == 0)
    r.unpersist()
  }

  test("dem_anomaly: cells confined to the box, medians inside per-cell extremes") {
    val a = DateOps.demAnomaly(spark, sf).cache()
    assert(a.count() > 0)
    // δ=50 cells of a [-800,600)×[-700,700) box
    assert(a.filter($"cx" < -16 || $"cx" > 11 || $"cy" < -14 || $"cy" > 13).count() == 0)
    // the anomaly of a cell-mean DEM is bounded by the global z spread
    val Array(zmin, zmax) = graft.core.Tables.eventsPoints(spark, sf)
      .agg(min("z"), max("z")).as[(Double, Double)].head().productIterator
      .map(_.asInstanceOf[Double]).toArray
    val spread = zmax - zmin
    assert(a.filter(abs($"dzm") > spread).count() == 0)
    a.unpersist()
  }

  test("grid interpolation stays within the grid's z range") {
    val g = DateOps.gridInterp(spark, sf)
    assert(g.count() > 0)
    val zmax = graft.core.Tables.eventsPoints(spark, sf).agg(max("z")).as[Double].head()
    assert(g.filter($"z_interp" < 0 - 1e-6 || $"z_interp" > zmax + 1e-6).count() == 0)
  }

  test("wv_date year matches the embedded yyyy") {
    val w = DateOps.wvDate(spark, sf)
    assert(w.filter(floor($"wv_year") =!= $"yy" && floor($"wv_year") =!= $"yy" + 1).count() == 0)
  }
}
