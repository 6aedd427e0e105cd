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

  test("contamination: overlap bounded, flag consistent, benchmark docs excluded") {
    val c = CorpusOps.contamination(spark, sf).cache()
    assert(c.filter($"doc_id" % 19 === 0).count() == 0)
    assert(c.filter($"n_shared" > $"n_shingles" || $"overlap" <= 0 || $"overlap" > 1)
      .count() == 0)
    assert(c.filter(($"overlap" >= 0.5) =!= ($"contaminated" === 1L)).count() == 0)
    c.unpersist()
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
