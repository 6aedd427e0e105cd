package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{CacheBag, Tables}

/** Deduplication operators for the training-data pipeline: exact
  * (hash groupBy), shingle-set Jaccard, MinHash+LSH, SimHash.
  *
  * Scale notes: exact dedup is one shuffle on the content hash.
  * Near-dup candidate generation keys on word 5-gram *shingles*, not
  * tokens — with a natural-language vocabulary the document frequency
  * of a shingle is orders of magnitude below a token's, so the
  * candidate join stays proportional to true near-duplicate density
  * instead of the O(n²) pair space (the 31-word test vocabulary makes
  * a token join explode to ~4.5·10⁸ intermediate rows at sf0.1;
  * 5-gram shingles: ~2.8·10⁵).  MinHash banding is 4 bands × 8 rows:
  * the baseline inter-document similarity of a small vocabulary is
  * ~0.5, and 8-row bands push the false-candidate rate to 0.5⁸≈0.4%
  * while still catching J≥0.9 near-dups with P≈0.9.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String) = Tables.t(s, dir, "documents")

  // --- 26. exact dedup (content-hash groupBy, keep-first) ---
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(md5(col("text")).as("content_md5"))
      .agg(min("doc_id").as("keeper_id"), count("*").as("n_copies"))
      .orderBy("content_md5")

  val dedupExactSql: String =
    """SELECT md5(text) AS content_md5, min(doc_id) AS keeper_id,
      |  count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  // --- 26b. dedup apply: materialize the keep-first corpus ---
  /** The second half of exact dedup: keep only each content group's
    * lowest doc_id (a self-contained groupBy + semi-join — no window
    * over the full corpus needed).
    */
  def dedupApply(s: SparkSession, dir: String): DataFrame = {
    val keepers = docs(s, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    docs(s, dir)
      .join(keepers, Seq("doc_id"), "leftsemi")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  val dedupApplySql: String =
    """SELECT doc_id, lang, n_chars FROM documents
      |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
      |ORDER BY doc_id""".stripMargin

  /** Distinct (doc_id, token-hash) pairs — for per-document
    * signatures.  The native [[graft.functions.WordShingleHashes]]
    * (k = 1) dedupes tokens inside the row, so no distinct exchange
    * ever happens — the explode output is already set-semantic.
    */
  private def tokHashes(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      explode(graft.functions.WordShingleHashes.of(col("text"), 1)).as("th"))

  private val toksSql =
    "SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents"

  /** Distinct word 5-gram shingles per document, identified by their
    * md5-derived 60-bit hash — long join/shuffle keys instead of
    * strings, and the identical hash on the oracle side keeps results
    * bit-equal even in the (≈2⁻⁴⁰) collision case.
    */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    shinglesOf(docs(s, dir))

  /** Shingle extraction over any (doc_id, text) frame — native
    * one-pass hashing with in-row dedup (no distinct exchange; see
    * [[graft.functions.WordShingleHashes]]).
    */
  def shinglesOf(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      explode(graft.functions.WordShingleHashes.of(col("text"), 5)).as("gh"))

  private val shinglesSql =
    s"""SELECT DISTINCT doc_id,
       |  ${TextOps.md5longSqlFmt.format("array_to_string((string_split(text,' '))[i:i+4], ' ')")} AS gh
       |FROM documents,
       |  LATERAL (SELECT unnest(generate_series(1, greatest(len(string_split(text,' ')) - 4, 1))) AS i) t""".stripMargin

  // --- 31. shingle-set Jaccard near-dup pairs ---
  /** Candidates = pairs sharing ≥1 shingle; similarity = exact Jaccard
    * over the df-capped shingle sets of each candidate pair.
    */
  def jaccard(s: SparkSession, dir: String): DataFrame =
    jaccardOf(shinglesOf(docs(s, dir)))

  /** Document-frequency cap: shingles appearing in more than `dfCap`
    * documents are "stop shingles" — one such shingle shared by k docs
    * fans the candidate self-join out to k² rows, the classic skew
    * bomb of near-dup joins at corpus scale.  Dropping them bounds
    * every join key's fan-in at dfCap² while near-duplicates (which
    * share *rare* shingles by definition) are unaffected.
    *
    * Shape: the hot-shingle list is found with a map-side-combinable
    * count (the shuffle carries one row per distinct shingle per
    * partition) and is by construction tiny (≤ |shingles|/dfCap
    * rows), so removing it is a broadcast anti-join — the big shingle
    * frame is never repartitioned or sorted for the cap (a window
    * count would shuffle+sort the whole frame).
    */
  val DfCap = 50

  def dfCapped(shingleFrame: DataFrame, dfCap: Int = DfCap): DataFrame = {
    val hot = shingleFrame.groupBy("gh").agg(count("*").as("df"))
      .filter(col("df") > dfCap)
      .select("gh")
    shingleFrame.join(broadcast(hot), Seq("gh"), "left_anti")
  }

  /** [[dfCapped]] with the document frequencies estimated by a
    * count-min sketch instead of the exact per-shingle count.  The
    * CMS never undercounts, so `est > dfCap` flags a SUPERSET of the
    * truly-hot shingles: the skew bound (no join key fans out beyond
    * dfCap²) holds unconditionally, and the only cost is a few
    * rare-but-collision-inflated shingles dropped with the stop set
    * — the safe direction for a candidate filter.
    *
    * Why a sketch when the exact count is one map-side-combined
    * shuffle?  The sketch is d·w rows REGARDLESS of vocabulary and
    * ADDITIVE: under streaming/multi-batch dedup the corpus-wide df
    * stats are maintained by merging per-batch sketches
    * (Sketches.cmsMerge) — no re-scan of the accumulated corpus per
    * batch, which an exact hot list needs.
    */
  def dfCappedApprox(shingleFrame: DataFrame, dfCap: Int = DfCap,
                     d: Int = 4, w: Int = 8192): DataFrame = {
    import graft.operators.Sketches
    val sk = Sketches.cmsBuild(shingleFrame, "gh", d, w)
    val hot = Sketches.cmsEstimate(sk, shingleFrame, "gh", d, w)
      .filter(col("est") > dfCap)
      .select("gh")
    shingleFrame.join(broadcast(hot), Seq("gh"), "left_anti")
  }

  /** Shingle-set Jaccard over any (doc_id, gh) shingle frame. */
  def jaccardOf(shingleFrame: DataFrame, dfCap: Int = DfCap): DataFrame = {
    // raw persisted first: the md5-heavy shingle extraction must run
    // once, not once for the hot-list aggregate and again for the
    // anti-join input; capped persisted too — it feeds both sides of
    // the candidate self-join + the size aggregate
    val raw   = CacheBag.register(shingleFrame)
    val sh    = CacheBag.register(dfCapped(raw, dfCap))
    val sizes = sh.groupBy("doc_id").agg(count("*").as("sz"))
    sh.as("t1")
      .join(sh.as("t2"),
        col("t1.gh") === col("t2.gh") && col("t1.doc_id") < col("t2.doc_id"))
      .groupBy(col("t1.doc_id").as("d1"), col("t2.doc_id").as("d2"))
      .agg(count("*").as("inter"))
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("s1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("s2")), "d2")
      .select(col("d1"), col("d2"), col("inter"),
        (col("inter").cast("double") / (col("s1") + col("s2") - col("inter")))
          .as("jaccard"))
      .orderBy("d1", "d2")
  }

  val jaccardSql: String =
    s"""WITH sh0 AS ($shinglesSql),
       |sh AS (SELECT * FROM sh0 QUALIFY count(*) OVER (PARTITION BY gh) <= $DfCap),
       |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT t1.doc_id AS d1, t2.doc_id AS d2, count(*) AS inter
       |  FROM sh t1 JOIN sh t2 ON t1.gh = t2.gh AND t1.doc_id < t2.doc_id
       |  GROUP BY 1, 2)
       |SELECT d1, d2, inter,
       |  CAST(inter AS DOUBLE)/(s1.sz + s2.sz - inter) AS jaccard
       |FROM inter JOIN sz s1 ON s1.doc_id = d1 JOIN sz s2 ON s2.doc_id = d2
       |ORDER BY d1, d2""".stripMargin

  // --- 31b. prefix-filtered similarity self-join (PPJoin-lite) ---
  /** All pairs with jaccard ≥ `minJ`, found via PREFIX FILTERING: for
    * threshold t, two sets with J ≥ t must share an element among the
    * first ⌊(1−t)·|s|⌋+1 of each set under ANY global element order
    * (pigeonhole: missing all of either prefix caps the overlap below
    * t).  Indexing only prefixes shrinks the candidate join by ~t per
    * side versus the share-any-shingle join — THE standard scale
    * technique for similarity self-joins — while staying EXACT: the
    * oracle is the plain threshold query over all sharing pairs, and
    * the hash match proves the pruned plan loses nothing.  Element
    * order = the shingle hash itself (rarity-uncorrelated, and both
    * engines sort identically on int64).
    */
  def jaccardPrefix(s: SparkSession, dir: String, minJ: Double = 0.5): DataFrame = {
    val raw = CacheBag.register(shinglesOf(docs(s, dir)))
    val sh = CacheBag.register(dfCapped(raw))
    val sizes = sh.groupBy("doc_id").agg(count("*").as("sz"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("gh")
    // prefix length n − floor(t·n) + 1 (≥ the required n − ⌈t·n⌉ + 1
    // under any 1-ulp product rounding; the naive floor((1−t)·n)+1
    // UNDERSIZES it when 1−t rounds down, e.g. t = 0.9 → 0.0999…98,
    // silently dropping qualifying pairs)
    val prefix = CacheBag.register(
      sh.join(sizes, "doc_id")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= col("sz") - floor(lit(minJ) * col("sz")) + 1)
        .select("doc_id", "gh"))
    // candidates share a PREFIX shingle on at least one side; then
    // verify with the exact intersection over the FULL shingle sets
    val cand = prefix.as("p1")
      .join(prefix.as("p2"),
        col("p1.gh") === col("p2.gh") && col("p1.doc_id") < col("p2.doc_id"))
      .select(col("p1.doc_id").as("d1"), col("p2.doc_id").as("d2"))
      .distinct()
    val inter = cand
      .join(sh.select(col("doc_id").as("d1"), col("gh")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("gh")), Seq("d2", "gh"))
      .groupBy("d1", "d2").agg(count("*").as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("s1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("s2")), "d2")
      .select(col("d1"), col("d2"), col("inter"),
        (col("inter").cast("double") / (col("s1") + col("s2") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= minJ)
      .orderBy("d1", "d2")
  }

  /** Oracle: the UNPRUNED threshold query (a thin wrapper over
    * [[jaccardSql]], not a copy) — hash equality proves the prefix
    * filter exact.
    */
  val jaccardPrefixSql: String =
    s"""SELECT * FROM (${jaccardSql.replace("ORDER BY d1, d2", "")})
       |WHERE jaccard >= 0.5 ORDER BY d1, d2""".stripMargin

  // --- 31c. edit-distance verification of near-dup candidates ---
  /** Exact Levenshtein distance over the jaccard candidate pairs —
    * the character-level confirmation pass of fuzzy dedup (shingle
    * overlap is word-order-insensitive; edit distance catches
    * reorderings that jaccard misses).  Candidates only: the O(len²)
    * DP runs on the near-dup frame, never the corpus pair space.
    * Both engines implement standard integer Levenshtein, so results
    * hash-match exactly.
    */
  def editVerify(s: SparkSession, dir: String): DataFrame = {
    val pairs = jaccardOf(shinglesOf(docs(s, dir)))
      .filter(col("jaccard") >= 0.5).select("d1", "d2", "jaccard")
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    pairs
      .join(d.select(col("doc_id").as("d1"), col("text").as("t1")), "d1")
      .join(d.select(col("doc_id").as("d2"), col("text").as("t2")), "d2")
      .select(col("d1"), col("d2"), col("jaccard"),
        levenshtein(col("t1"), col("t2")).cast("long").as("edit_dist"),
        greatest(length(col("t1")), length(col("t2"))).cast("long").as("max_len"))
      .withColumn("edit_sim",
        lit(1.0) - col("edit_dist").cast("double") / col("max_len"))
      .orderBy("d1", "d2")
  }

  val editVerifySql: String =
    s"""WITH jac AS (${"%s"}),
       |p AS (SELECT d1, d2, jaccard FROM jac WHERE jaccard >= 0.5)
       |SELECT d1, d2, jaccard,
       |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
       |  CAST(greatest(length(a.text), length(b.text)) AS BIGINT) AS max_len,
       |  1.0::DOUBLE - CAST(levenshtein(a.text, b.text) AS DOUBLE)
       |    / greatest(length(a.text), length(b.text)) AS edit_sim
       |FROM p JOIN documents a ON a.doc_id = p.d1
       |       JOIN documents b ON b.doc_id = p.d2
       |ORDER BY d1, d2""".stripMargin
      .format(jaccardSql.replace("ORDER BY d1, d2", ""))

  // --- 32. MinHash + LSH near-dup candidates ---
  /** 32 minhashes h_j = min over shingles of (a_j·H(g)+b_j mod p),
    * p = 2^31−1, H = md5-derived 60-bit hash mod p; 4 bands × 8 rows;
    * candidates share a band signature; est_sim = matching sig
    * fraction.
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val P = 2147483647L
    // single-pass wide aggregation: 32 min() columns in one shuffle on
    // doc_id — no 32× row explosion (the naive seed cross-join costs
    // 32·|shingles| shuffled rows; this costs |shingles|)
    val th = shingles(s, dir).withColumn("th", pmod(col("gh"), lit(P)))
    val sigAggs = (0 until 32).map { j =>
      min(pmod(col("th") * (2 * j + 1) + (j.toLong * j + 7919), lit(P))).as(s"h$j")
    }
    val sig = th.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
    // band rows carry the full 32-slot signature: the candidate join
    // yields the match count directly, deleting the two post-hoc
    // signature join-backs of the round-1 plan (each a shuffle of the
    // signature table).  Band keys are plain 8-long structs — a
    // struct-equality shuffle key, no md5 digest needed.  Persisted:
    // both sides of the self-join.
    val bands = CacheBag.register(sig.select(
      col("doc_id"),
      array((0 until 32).map(j => col(s"h$j")): _*).as("sig"),
      posexplode(array((0 until 4).map(b =>
        struct((0 until 8).map(i => col(s"h${8 * b + i}").as(s"r$i")): _*)): _*))
        .as(Seq("band", "bk"))))
    val matches = (0 until 32)
      .map(j => when(col("s1").getItem(j) === col("s2").getItem(j), 1L).otherwise(0L))
      .reduce(_ + _)
    bands.select(col("doc_id").as("d1"), col("sig").as("s1"), col("band"), col("bk"))
      .join(bands.select(col("doc_id").as("d2"), col("sig").as("s2"), col("band"), col("bk")),
        Seq("band", "bk"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), matches.as("matches"))
      .distinct() // a pair agreeing on >1 band is one candidate
      .withColumn("est_sim", col("matches") / lit(32.0))
      .orderBy("d1", "d2")
  }

  val minhashLshSql: String = {
    s"""WITH sh AS ($shinglesSql),
       |seeds AS (SELECT j, 2*j + 1 AS a, j*j + 7919 AS b
       |          FROM (SELECT unnest(generate_series(0, 31)) AS j)),
       |th AS (SELECT doc_id, gh % 2147483647 AS th FROM sh),
       |minh AS (
       |  SELECT doc_id, j, CAST(min((a*th + b) % 2147483647) AS BIGINT) AS minh
       |  FROM th, seeds GROUP BY 1, 2),
       |bands AS (
       |  SELECT doc_id, j//8 AS band,
       |    md5(string_agg(CAST(minh AS VARCHAR), ',' ORDER BY j)) AS bk
       |  FROM minh GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT b1.doc_id AS d1, b2.doc_id AS d2
       |  FROM bands b1 JOIN bands b2
       |    ON b1.band = b2.band AND b1.bk = b2.bk AND b1.doc_id < b2.doc_id)
       |SELECT d1, d2,
       |  CAST(sum(CASE WHEN m1.minh = m2.minh THEN 1 ELSE 0 END) AS BIGINT) AS matches,
       |  sum(CASE WHEN m1.minh = m2.minh THEN 1 ELSE 0 END)/32.0 AS est_sim
       |FROM cand
       |JOIN minh m1 ON m1.doc_id = cand.d1
       |JOIN minh m2 ON m2.doc_id = cand.d2 AND m2.j = m1.j
       |GROUP BY d1, d2 ORDER BY d1, d2""".stripMargin
  }

  // --- 33. SimHash signatures ---
  /** 32-bit simhash over distinct tokens: bit b of H(tok) votes ±1;
    * sig bit = vote sum > 0.
    */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    // single-pass: vote_b = 2·Σ bit_b(H(tok)) − n_toks, sig bit = vote>0;
    // 32 sum() columns in one shuffle instead of a 32× bit explode
    val th = tokHashes(s, dir)
    val aggs = count("*").as("n") +:
      (0 until 32).map(b => sum(expr(s"shiftright(th, $b) % 2")).as(s"s$b"))
    val votes = th.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val sig = (0 until 32)
      .map(b => when(col(s"s$b") * 2 - col("n") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    votes.select(col("doc_id"), sig.as("simhash32")).orderBy("doc_id")
  }

  val simhashSql: String = {
    val H = TextOps.md5longSqlFmt.format("tok")
    s"""WITH tk AS ($toksSql),
       |th AS (SELECT doc_id, $H AS th FROM tk),
       |votes AS (
       |  SELECT doc_id, bit, sum((th >> bit) % 2 * 2 - 1) AS vote
       |  FROM th, (SELECT unnest(generate_series(0, 31)) AS bit) bits
       |  GROUP BY 1, 2)
       |SELECT doc_id,
       |  CAST(sum(CASE WHEN vote > 0 THEN 1::BIGINT << bit ELSE 0 END) AS BIGINT) AS simhash32
       |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // --- 33b. SimHash near-dup pair search (banded, multi-probe) ---
  /** Pairs within Hamming distance ≤ 8 of each other's 60-bit simhash.
    *
    * Candidates come from 4 bands of 15 bits with single-bit
    * multi-probe: one side of the self-join also probes every
    * 1-bit-flipped variant of each band key (16 keys per band), so a
    * pair is a candidate iff some band differs by ≤1 bit.  Pigeonhole:
    * d ≤ 7 ⇒ some band has ≤ ⌊7/4⌋ = 1 differing bits ⇒ guaranteed
    * candidate — recall is exact for d ≤ 7 and only the 2+2+2+2 split
    * of d = 8 can escape.  (Round 1's single `simhash >> 24` bucketing
    * was both a scale killer — 256 fixed buckets ⇒ O(n²/256) fan-in —
    * and a recall bug: any pair differing in the top byte was never a
    * candidate.)  Probing multiplies one side's band table ×16, the
    * classic multi-probe trade of compute for memory; the verify step
    * is the native codegen'd [[graft.functions.HammingDistance]].
    */
  /** The 60-bit simhash signature table (doc_id, h). */
  private[graft] def simhash60(s: SparkSession, dir: String): DataFrame = {
    val th = tokHashes(s, dir)
    val aggs = count("*").as("n") +:
      (0 until 60).map(b => sum(expr(s"shiftright(th, $b) % 2")).as(s"s$b"))
    val votes = th.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val sigExpr = (0 until 60)
      .map(b => when(col(s"s$b") * 2 - col("n") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    votes.select(col("doc_id"), sigExpr.as("h"))
  }

  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = simhash60(s, dir)
    // persisted: the exact side and the (derived) probe side of the
    // candidate self-join
    val bands = CacheBag.register(sig.select(col("doc_id"), col("h"),
      posexplode(array((0 until 4).map(b =>
        expr(s"shiftright(h, ${15 * b}) % 32768")): _*)).as(Seq("band", "bk"))))
    // probe side: the exact key plus its 15 single-bit flips
    val probes = bands.select(col("doc_id").as("d1"), col("h").as("h1"), col("band"),
      explode(array(col("bk") +:
        (0 until 15).map(f => col("bk").bitwiseXOR(lit(1L << f))): _*)).as("bk"))
    probes
      .join(bands.select(col("doc_id").as("d2"), col("h").as("h2"), col("band"), col("bk")),
        Seq("band", "bk"))
      .filter(col("d1") < col("d2"))
      .withColumn("hamming", graft.functions.VectorExprs.hamming(col("h1"), col("h2")))
      .filter(col("hamming") <= 8)
      .select("d1", "d2", "hamming")
      .distinct() // a pair matching via >1 (band, probe) is one pair
      .orderBy("d1", "d2")
  }

  val simhashPairsSql: String = {
    val H = TextOps.md5longSqlFmt.format("tok")
    s"""WITH tk AS ($toksSql),
       |th AS (SELECT doc_id, $H AS th FROM tk),
       |votes AS (
       |  SELECT doc_id, bit, sum((th >> bit) % 2 * 2 - 1) AS vote
       |  FROM th, (SELECT unnest(generate_series(0, 59)) AS bit) bits
       |  GROUP BY 1, 2),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN vote > 0 THEN 1::BIGINT << bit ELSE 0 END) AS BIGINT) AS h
       |  FROM votes GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, h, band, (h >> (15*band)) % 32768 AS bk
       |  FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) bs),
       |probes AS (
       |  SELECT doc_id, h, band,
       |    CASE WHEN f = 0 THEN bk ELSE xor(bk, 1::BIGINT << (f-1)) END AS bk
       |  FROM bands, (SELECT unnest(generate_series(0, 15)) AS f) fs)
       |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |  CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
       |FROM probes a JOIN bands b
       |  ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.h, b.h)) <= 8
       |ORDER BY d1, d2""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_edit_verify" -> (editVerify _),
    "q_jaccard_prefix" -> ((s, d) => jaccardPrefix(s, d)),
    "q_simhash_pairs" -> (simhashPairs _),
    "q_dedup_exact" -> (dedupExact _),
    "q_dedup_apply" -> (dedupApply _),
    "q_jaccard"     -> (jaccard _),
    "q_minhash_lsh" -> (minhashLsh _),
    "q_simhash"     -> (simhash _))

  val oracles: Map[String, String] = Map(
    "q_edit_verify" -> editVerifySql,
    "q_jaccard_prefix" -> jaccardPrefixSql,
    "q_simhash_pairs" -> simhashPairsSql,
    "q_dedup_exact" -> dedupExactSql,
    "q_dedup_apply" -> dedupApplySql,
    "q_jaccard"     -> jaccardSql,
    "q_minhash_lsh" -> minhashLshSql,
    "q_simhash"     -> simhashSql)
}
