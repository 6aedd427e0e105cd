package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetition: ratios bounded and consistent on the corpus") {
    val r = CorpusOps.repetition(spark, sf)
    val bad = r.filter($"dup4_ratio" < 0 || $"dup4_ratio" > 1 ||
      $"top2_frac" <= 0 || $"top2_frac" > 1 ||
      $"n4_distinct" > $"n4" || $"top2_n" > $"n2")
    assert(bad.count() == 0)
    // a corpus drawn from a 31-word vocabulary MUST repeat 2-grams
    assert(r.filter($"top2_n" > 1).count() > 0)
  }

  test("WordGramStats matches the composed array-expression form") {
    val probe = Seq(
      (1L, "a b a b a b"),            // 2-grams: ab ba ab ba ab → top 3
      (2L, "x"),                      // fewer tokens than k: one truncated gram
      (3L, ""),                       // empty string → one empty token
      (4L, "w w w w w w w w"),        // maximal repetition
      (5L, "q r s t u v w x y z"))    // no repetition
      .toDF("doc_id", "text")
    def grams(k: Int) =
      s"transform(sequence(1, greatest(size(split(text, ' ')) - ${k - 1}, 1)), i -> array_join(slice(split(text, ' '), i, $k), ' '))"
    val want = probe.selectExpr("doc_id",
        s"cast(size(${grams(2)}) as bigint) as n",
        s"cast(size(array_distinct(${grams(2)})) as bigint) as n_distinct",
        s"cast(array_max(transform(array_distinct(${grams(2)}), g -> size(filter(${grams(2)}, x -> x = g)))) as bigint) as top_n")
      .as[(Long, Long, Long, Long)].collect().toSet
    val got = probe.select(col("doc_id"),
        graft.functions.WordGramStats.of(col("text"), 2).as("s"))
      .select($"doc_id", $"s.n", $"s.n_distinct", $"s.top_n")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.find(_._1 == 1L).get == ((1L, 5L, 2L, 3L)))
    // SQL registration surface
    graft.GraftExtensions.register(spark)
    probe.createOrReplaceTempView("wgs_probe")
    val viaSql = spark.sql(
      "SELECT doc_id, word_gram_stats(text, 2).top_n AS t FROM wgs_probe WHERE doc_id = 1")
      .as[(Long, Long)].head()
    assert(viaSql == ((1L, 3L)))
  }

  test("tfidf: exact rational score, per-doc top-3 contract") {
    val r = CorpusOps.tfidf(spark, sf).cache()
    // at most 3 rows per doc, ranks are 1..3, scores non-increasing
    val perDoc = r.groupBy("doc_id").agg(
      count("*").as("k"), max("rnk").as("rmax"), min("rnk").as("rmin"))
    assert(perDoc.filter($"k" > 3 || $"rmax" > 3 || $"rmin" < 1).count() == 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("rnk")
    assert(r.withColumn("prev", lag("score", 1).over(w))
      .filter($"prev".isNotNull && $"prev" < $"score").count() == 0)
    // the score IS tf*(N-df)/df for the corpus N
    val n = graft.core.Tables.t(spark, sf, "documents").count()
    assert(r.filter(
      $"score" =!= ($"tf" * (lit(n) - $"df")).cast("double") / $"df").count() == 0)
    // a term can never appear in more docs than the corpus has
    assert(r.filter($"df" < 1 || $"df" > n || $"tf" < 1).count() == 0)
    r.unpersist()
  }

  test("count-min sketch: never undercounts, overcount within bound, merge law") {
    import graft.operators.Sketches
    val (d, w) = (4, 512)
    val toks = graft.core.Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val n = toks.count()
    val truth = toks.groupBy("tok").agg(count("*").as("true_cnt"))
    val sk = Sketches.cmsBuild(toks, "tok", d, w).cache()
    // sketch state is bounded by d*w regardless of corpus size
    assert(sk.count() <= d.toLong * w)
    val est = Sketches.cmsEstimate(sk, toks, "tok", d, w).join(truth, "tok").cache()
    // CMS never undercounts
    assert(est.filter($"est" < $"true_cnt").count() == 0)
    // and overcounts by at most ~eps*N (fixed seeds => deterministic;
    // 5x headroom over the single-row expectation N/w)
    val bound = 5.0 * n / w
    val worst = est.agg(max($"est" - $"true_cnt")).as[Long].head()
    assert(worst <= bound, s"worst CMS overcount $worst > bound $bound")
    // merging per-half sketches equals sketching the whole corpus
    // (split by token hash so both halves are genuine sub-corpora)
    val a = toks.filter(abs(hash($"tok")) % 2 === 0)
    val b = toks.filter(abs(hash($"tok")) % 2 =!= 0)
    val merged = Sketches.cmsMerge(Seq(
      Sketches.cmsBuild(a, "tok", d, w), Sketches.cmsBuild(b, "tok", d, w)))
    val direct = sk.withColumnRenamed("cnt", "cnt_d")
    assert(merged.join(direct, Seq("h_row", "slot"), "full")
      .filter($"cnt".isNull || $"cnt_d".isNull || $"cnt" =!= $"cnt_d")
      .count() == 0)
    sk.unpersist(); est.unpersist()
  }

  test("contamination: overlap bounded, flag consistent, benchmark docs excluded") {
    val c = CorpusOps.contamination(spark, sf).cache()
    assert(c.filter($"doc_id" % 19 === 0).count() == 0)
    assert(c.filter($"n_shared" > $"n_shingles" || $"overlap" <= 0 || $"overlap" > 1)
      .count() == 0)
    assert(c.filter(($"overlap" >= 0.5) =!= ($"contaminated" === 1L)).count() == 0)
    c.unpersist()
  }

  test("profile: counts reconcile with the table, bounds ordered") {
    val p = graft.operators.Relational.profile(spark, sf).cache()
    val rows = graft.core.Tables.t(spark, sf, "lineitem").count()
    assert(p.count() == 3)
    assert(p.filter($"n" + $"n_null" =!= rows).count() == 0)
    assert(p.filter($"vmin" > $"vmax" || $"n_distinct" > $"n").count() == 0)
    p.unpersist()
  }

  test("quantiles: nearest-rank values are monotone group members") {
    val q = graft.operators.Relational.quantiles(spark, sf).cache()
    assert(q.filter($"p25" > $"p50" || $"p50" > $"p75" || $"p75" > $"p95").count() == 0)
    // every reported quantile is an actual value of its group
    val li = graft.core.Tables.t(spark, sf, "lineitem")
      .select($"l_returnflag", $"l_extendedprice")
    for (c <- Seq("p25", "p50", "p75", "p95"))
      assert(q.select($"l_returnflag", col(c).as("l_extendedprice"))
        .except(li).count() == 0, s"$c not a member value")
    q.unpersist()
  }

  test("approx_percentile sketch lands within its rank-error bound of exact quantiles") {
    // the sketch path a 100 TB profiler actually uses (one pass, no
    // per-group sort) validated against the exact nearest-rank
    // operator: with accuracy a, rank error is bounded by n/a
    val li = graft.core.Tables.t(spark, sf, "lineitem")
      .select($"l_returnflag", $"l_extendedprice")
    val acc = 1000
    val approx = li.groupBy("l_returnflag")
      .agg(expr(s"approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95), $acc)")
        .as("ap"))
      .select($"l_returnflag", $"ap"(0).as("a25"), $"ap"(1).as("a50"),
        $"ap"(2).as("a75"), $"ap"(3).as("a95"))
    val exact = graft.operators.Relational.quantiles(spark, sf)
    val joined = approx.join(exact, "l_returnflag").cache()
    // convert value error to rank error per group and bound it
    for ((a, e, qf) <- Seq(("a25", "p25", 0.25), ("a50", "p50", 0.5),
        ("a75", "p75", 0.75), ("a95", "p95", 0.95))) {
      val bad = joined.select($"l_returnflag", col(a), col(e), $"n").collect().filter { r =>
        val flag = r.getString(0); val av = r.getDouble(1); val n = r.getLong(3)
        val rankOfApprox = li.filter($"l_returnflag" === flag &&
          $"l_extendedprice" <= av).count()
        math.abs(rankOfApprox - qf * n) > n.toDouble / acc + 1
      }
      assert(bad.isEmpty, s"$a rank error beyond n/$acc: ${bad.mkString}")
    }
    joined.unpersist()
  }

  test("domain mix: rates clamp at 1, kept token shares approach targets") {
    val m = CorpusOps.domainMix(spark, sf).cache()
    assert(m.filter($"rate" > 1.0 || $"rate" <= 0.0).count() == 0)
    val kept = m.groupBy("lang").agg(sum("n_tokens").as("kt"))
      .as[(String, Long)].collect().toMap
    val total = kept.values.sum.toDouble
    // targets: en 40%, others 15% of a half-corpus budget; hash-bucket
    // granularity (percent buckets) leaves ±10pp noise at spec scale
    val enShare = kept("en") / total
    assert(enShare > 0.25 && enShare < 0.55, s"en share $enShare")
    m.unpersist()
  }

  test("stratified sample: deterministic, rate-respecting, language-stratified") {
    val docs = graft.core.Tables.t(spark, sf, "documents")
    val s1 = CorpusOps.stratifiedSample(docs, Map("en" -> 50), 20)
      .select("doc_id").as[Long].collect().toSet
    val s2 = CorpusOps.stratifiedSample(docs, Map("en" -> 50), 20)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2)                       // no RNG state: reruns identical
    val out = CorpusOps.sample(spark, sf)
    assert(out.filter($"bucket" >= $"rate").count() == 0)
    // en sampled at 50%, rest at 20% — empirical rates within ±15pp
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val enRate = byLang("en").toDouble / totals("en")
    val deRate = byLang.getOrElse("de", 0L).toDouble / totals("de")
    assert(enRate > 0.35 && enRate < 0.65 && deRate < 0.35)
  }
}
