package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.txt

/** SURVEY.md §2.10 deduplication operators over `documents`.
  *
  * Scale notes:
  *  - Exact dedup is a single hash-aggregate on the dedup key: one shuffle,
  *    map-side partial aggregation, no collect.
  *  - MinHash/LSH avoids the O(n²) pair space entirely: candidate pairs come
  *    from an equi-join on (band, bucket), so the shuffle is keyed and the
  *    cost is proportional to bucket collisions, not n².
  *  - SimHash reduces each document to one 64-bit signature; near-dup pairs
  *    come from banding the signature (4 × 16-bit bands → equi-join).
  */
object Dedup {

  /** [Q-dedup-exact] exact dedup keyed on a 128-bit content digest: canonical
    * survivor (min id) + multiplicity. One hash-aggregate shuffle whose key is
    * 32 hex chars — at 100 TB the shuffle moves digests, not the corpus
    * (grouping by raw text would shuffle every byte of every document).
    * md5 is used (not xxhash64) because DuckDB has the identical function, so
    * the digest itself is oracle-matched; 128 bits makes collisions
    * negligible (~1e-18 at 10^10 docs). */
  def q_dedup_exact(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")
      .groupBy(md5(col("text").cast("binary")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("text_md5"), col("keep_id"), col("n_copies"))

  /** [Q-dedup-norm] exact dedup on CANONICALIZED text (TextOps.normExpr:
    * lowercase, punctuation→space, whitespace collapse) — catches the
    * formatting-only near-dups exact byte dedup misses while staying one
    * hash aggregate keyed on a 128-bit digest (the same 100 TB shape as
    * [Q-dedup-exact]: the shuffle moves 32-byte keys, never documents). */
  def q_dedup_norm(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")
      .groupBy(md5(TextOps.normExpr).as("norm_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("norm_md5"), col("keep_id"), col("n_copies"))

  /** MinHash signatures: `perms` hash permutations in `bands` bands.
    * One shingle row carries all `perms` hashes as SEPARATE min-aggregate
    * columns, so the whole signature reduces in a SINGLE hash-aggregate
    * keyed by doc_id — map-side partial min combines per partition, and the
    * only shuffle moves one 64-column row per (doc, partition), not the
    * (doc, shingle, perm) explosion (64× fewer rows than a posexplode
    * pipeline, which cost a second shuffle on (doc, perm) besides).
    * Everything is codegen'd built-ins; no UDF/UDAF.
    * Returns (doc_id, band, bucket); bucket = hash of the band's signature
    * slice. */
  def minhashSignatures(docs: DataFrame, perms: Int = 64, bands: Int = 16): DataFrame = {
    val rows = perms / bands
    // the whole signature computes ROW-LOCALLY: native ShingleHashes (one
    // tokenize+hash loop) feeds native MinHashSig (all `perms` permutation
    // minima in one pass over the shingle array) — a map-only projection,
    // where the aggregate formulation explodes the corpus to one row per
    // shingle and shuffles it into a 64-column min-aggregate
    // ([[minhashSigAgg]], kept as the bit-equality baseline).
    docs.select(col("doc_id"),
        txt.minhash_sig(txt.shingle_hashes(col("text"), 3), perms).as("sig"))
      .select(col("doc_id"),
        posexplode(expr(s"transform(sequence(0, ${bands - 1}), " +
          s"b -> hash(slice(sig, b * $rows + 1, $rows)))")).as(Seq("band", "bucket")))
  }

  /** Aggregate MinHash signature (the declared semantics MinHashSig
    * replicates): permutation p re-hashes the ONE base xxhash64 of the
    * shingle — min(xxhash64(h, p)) per doc over exploded shingle rows.
    * Kept as the cross-check baseline. */
  private[graft] def minhashSigAgg(docs: DataFrame, perms: Int = 64): DataFrame = {
    val minAggs = (0 until perms).map(p =>
      min(xxhash64(col("h"), lit(p))).as(s"h$p"))
    docs.select(col("doc_id"), explode(txt.shingle_hashes(col("text"), 3)).as("h"))
      .groupBy("doc_id")
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"),
        array((0 until perms).map(p => col(s"h$p")): _*).as("sig"))
  }

  /** Candidate pairs from LSH banding, verified with exact shingle Jaccard.
    * The verify join only touches colliding pairs. */
  def minhashDupPairs(docs: DataFrame, threshold: Double = 0.5,
                      perms: Int = 64, bands: Int = 16): DataFrame = {
    val sig = minhashSignatures(docs, perms, bands)
    // merge hint: both sides are the corpus-sized banded index — never
    // broadcast (same rationale as q_dedup_ngram)
    val cand = sig.as("x").hint("merge").join(sig.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    // verify over HASHED shingle arrays: the join ships 8-byte longs
    // instead of ~20-char strings and array_intersect compares longs;
    // distinctness is preserved so Jaccard is unchanged (collision odds
    // ~2^-64 per shingle pair — immaterial)
    val sh = docs.select(col("doc_id"), txt.shingle_hashes(col("text"), 3).as("sh"))
    cand
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sha")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("shb")), "b_id")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jacc", col("inter").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("inter")))
      .filter(col("jacc") >= threshold)
      .select(col("a_id"), col("b_id"), col("jacc"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** [Q-dedup-minhash] near-dup pairs via MinHash+LSH (self-consistency
    * checked in ScalaTest; engine-specific hashes → no DuckDB oracle). */
  def q_dedup_minhash(s: SparkSession, d: String): DataFrame =
    minhashDupPairs(Tables(s, d, "documents"))

  /** [Q-dedup-minhash-sig] the LSH index itself (doc → band buckets). */
  def q_dedup_minhash_sig(s: SparkSession, d: String): DataFrame =
    minhashSignatures(Tables(s, d, "documents")).orderBy(col("doc_id"), col("band"))

  /** Incremental near-dup dedup: an arriving BATCH checked against a
    * persisted historical index — the production shape at 100 TB, where the
    * history is signed ONCE (its banded index `(doc_id, band, bucket)` and
    * hashed shingle arrays `(doc_id, sh)` live as parquet) and each new
    * batch joins only its own signatures against that index instead of
    * re-signing the corpus. Compose with [[minhashDupPairs]] on the batch
    * alone for intra-batch duplicates; the union of the two pair sets is
    * exactly [[minhashDupPairs]] of history∪batch minus history-internal
    * pairs (DedupSpec pins the cross-pair equality).
    *
    * Scale shape: the batch signature is a map-only projection; candidates
    * come from the (band, bucket) equi-join against the index — AQE
    * broadcasts the batch side when it is small (the daily-increment case,
    * leaving the corpus-sized index entirely un-shuffled map-side), and
    * falls back to a keyed shuffle join when the batch is itself huge.
    * Verification touches only colliding pairs and ships hashed shingles
    * (8-byte longs), never text.
    *
    * @param histIndex    persisted `(doc_id, band, bucket)` — the output of
    *                     [[minhashSignatures]] over the history
    * @param histShingles persisted `(doc_id, sh: array<long>)` — hashed
    *                     3-shingles of the history (txt.shingle_hashes)
    * @return (new_id, hist_id, jacc) verified cross pairs, Jaccard ≥
    *         `threshold`
    */
  def minhashIncremental(batch: DataFrame, histIndex: DataFrame,
                         histShingles: DataFrame, threshold: Double = 0.5,
                         perms: Int = 64, bands: Int = 16): DataFrame = {
    val newSig = minhashSignatures(batch, perms, bands)
      .select(col("doc_id").as("new_id"), col("band"), col("bucket"))
    val cand = histIndex
      .join(newSig, Seq("band", "bucket"))
      .filter(col("doc_id") =!= col("new_id"))
      .select(col("new_id"), col("doc_id").as("hist_id"))
      .distinct()
    val newSh = batch.select(col("doc_id").as("new_id"),
      txt.shingle_hashes(col("text"), 3).as("sha"))
    cand
      .join(newSh, "new_id")
      .join(histShingles.select(col("doc_id").as("hist_id"), col("sh").as("shb")),
        "hist_id")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jacc", col("inter").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("inter")))
      .filter(col("jacc") >= threshold)
      .select(col("new_id"), col("hist_id"), col("jacc"))
  }

  /** [Q-dedup-incremental] the incremental shape over the gate fixture:
    * odd doc_ids arrive as the batch, even doc_ids are the indexed history
    * (index + shingles derived in-query — at deployment both are persisted
    * parquet). Engine-specific hashes → no DuckDB oracle; DedupSpec pins
    * the output equal to the cross-(odd,even) slice of [[minhashDupPairs]]
    * over the full corpus, plus planted-dup recall. */
  def q_dedup_incremental(s: SparkSession, d: String): DataFrame = {
    val docs = Tables(s, d, "documents")
    val hist = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val histShingles = hist.select(col("doc_id"),
      txt.shingle_hashes(col("text"), 3).as("sh"))
    minhashIncremental(batch, minhashSignatures(hist), histShingles)
      .orderBy(col("new_id"), col("hist_id"))
  }

  /** 64-bit SimHash per document — ROW-LOCAL via the native SimHash64
    * expression (graft.functions.SimHash64): the whole signature computes
    * inside the projection, so simhashing a corpus is a map-only pass with
    * NO shuffle at all. Bit-equal to [[simhashAgg]] (asserted in
    * FunctionsSpec), which shuffles the corpus twice. */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), txt.simhash64(col("text")).as("simhash"))

  /** The aggregate SimHash formulation (the declared semantics the native
    * expression replicates): token hash bits weighted by term frequency,
    * sign-aggregated per bit position — 64 SEPARATE sum aggregates over the
    * (doc, token, count) rows. Kept as the cross-check baseline. */
  private[graft] def simhashAgg(docs: DataFrame): DataFrame = {
    val bitSums = (0 until 64).map { j =>
      sum(when(expr(s"shiftright(h, $j) & 1") === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"w$j")
    }
    val packed = (0 until 64).map(j =>
      when(col(s"w$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("tok")))
      .groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
  }

  /** [Q-dedup-simhash] per-doc SimHash (rows-only check: engine hash). */
  def q_dedup_simhash(s: SparkSession, d: String): DataFrame =
    simhash(Tables(s, d, "documents")).orderBy("doc_id")

  /** SimHash near-dup pairs via signature banding: the 64-bit signature
    * splits into 4 × 16-bit bands; a pair within Hamming distance 3 agrees
    * exactly on ≥1 band (pigeonhole), so candidates come from an EQUI-join
    * on (band, 16-bit value) and only candidates pay the bit_count verify.
    * Keyed shuffle ∝ band collisions — the standard SimHash index, never
    * all-pairs. */
  def simhashDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = simhash(docs)
    val banded = sig.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> shiftright(simhash, b * 16) & 65535)"))
        .as(Seq("band", "bv")))
    // merge hint: both sides are the corpus-sized banded index — never
    // broadcast (same rationale as q_dedup_ngram)
    banded.as("x").hint("merge").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** [Q-dedup-simhash-pairs] banded SimHash near-dup pairs (rows-only;
    * planted-duplicate recovery asserted in DedupSpec). */
  def q_dedup_simhash_pairs(s: SparkSession, d: String): DataFrame =
    simhashDupPairs(Tables(s, d, "documents"))

  /** All pairs with exact 3-gram Jaccard ≥ threshold (shingle-keyed
    * equi-join candidates + count-based Jaccard — same shape as
    * q_dedup_ngram without the top-k).
    *
    * `maxDocFreq`: hot-shingle cap. A shingle appearing in `df` docs emits
    * O(df²) candidate pairs out of the equi-join — one boilerplate phrase
    * shared by 1M docs is 10¹² pairs, the classic shingle-skew scale-killer —
    * while carrying essentially no dedup signal (it's a stop-phrase). With
    * the cap set, shingles whose document frequency exceeds it are dropped
    * BEFORE the pair join (one keyed count aggregate), and per-doc shingle
    * counts are recomputed over the survivors so Jaccard stays coherent on
    * the filtered shingle universe. */
  def ngramPairs(docs: DataFrame, threshold: Double,
                 maxDocFreq: Option[Long] = None): DataFrame = {
    // join on the 64-bit shingle hash, not the shingle string: the equi-join
    // shuffles 8-byte longs instead of ~20-char strings and compares in one
    // instruction (collision odds ~2^-64 per shingle pair — immaterial)
    val exploded = docs
      .select(col("doc_id"), txt.shingle_hashes(col("text"), 3).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("nsh"), explode(col("sh")).as("g"))
    val ex = maxDocFreq.fold(exploded) { cap =>
      // shingles are distinct per doc, so count(g) IS document frequency.
      // Filter via the COMPLEMENT: the over-cap (hot) set is the tiny
      // zipfian tail — broadcasting it turns the filter into a map-side
      // anti-join, where joining against the (corpus-sized) surviving set
      // would shuffle the whole exploded stream a second time.
      val hot = exploded.groupBy("g").agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select("g")
      exploded.drop("nsh").join(broadcast(hot), Seq("g"), "left_anti")
        .withColumn("nsh", count(lit(1))
          .over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    }
    // merge hint: never broadcast the corpus-sized exploded side (same
    // rationale as q_dedup_ngram)
    ex.as("a").hint("merge").join(ex.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.nsh").as("na"), col("b.nsh").as("nb"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"), max(col("na")).as("na"), max(col("nb")).as("nb"))
      .select(col("a_id"), col("b_id"), (col("inter").cast("double") /
        (col("na") + col("nb") - col("inter"))).as("jacc"))
      .filter(col("jacc") >= threshold)
  }

  /** [Q-dedup-ngram-capped] the hot-shingle-capped Jaccard pair query as a
    * declared, oracle-matched query: shingles in more than 100 docs (of the
    * fixture's 500 at sf0.01 — true boilerplate) are excluded from both the
    * candidate join and the per-doc sizes. This is the shape that holds at
    * corpus scale: candidate fan-out per shingle is bounded by cap², and the
    * cap itself is ONE keyed count aggregate. DuckDB-oracle-matched. */
  def q_dedup_ngram_capped(s: SparkSession, d: String): DataFrame =
    ngramPairs(Tables(s, d, "documents"), threshold = 0.2, maxDocFreq = Some(100L))
      .orderBy(col("jacc").desc, col("a_id"), col("b_id"))
      .limit(100)

  /** EVALUATION variant (not declared): pair generation by per-shingle
    * group-collect + in-row expansion instead of the two-sided self-join —
    * one shuffle (groupBy g) instead of shuffling the exploded stream into
    * both sides of a merge join; the cost moves into HOF list² expansion
    * per shingle group. Same output as [[ngramPairs]] uncapped. */
  private[graft] def ngramPairsGrouped(docs: DataFrame, threshold: Double): DataFrame = {
    val ex = docs
      .select(col("doc_id"), txt.shingle_hashes(col("text"), 3).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("nsh"), explode(col("sh")).as("g"))
    ex.groupBy("g")
      .agg(collect_list(struct(col("doc_id"), col("nsh"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(expr(
        """flatten(transform(ds, a ->
          |  filter(transform(ds, b -> IF(a.doc_id < b.doc_id,
          |    struct(a.doc_id AS a_id, b.doc_id AS b_id, a.nsh AS na, b.nsh AS nb),
          |    CAST(NULL AS struct<a_id:bigint,b_id:bigint,na:int,nb:int>))),
          |  p -> p IS NOT NULL)))""".stripMargin)).as("p"))
      .select(col("p.a_id"), col("p.b_id"), col("p.na"), col("p.nb"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"), max(col("na")).as("na"), max(col("nb")).as("nb"))
      .select(col("a_id"), col("b_id"), (col("inter").cast("double") /
        (col("na") + col("nb") - col("inter"))).as("jacc"))
      .filter(col("jacc") >= threshold)
  }

  /** Connected components over an undirected pair list by iterative
    * min-label propagation: each round every vertex takes the min label in
    * its neighborhood (one keyed join + one min-aggregate — both
    * partial-agg-friendly keyed shuffles), until fixpoint. Converges in
    * O(component diameter) rounds; near-dup components are dense (LSH/
    * Jaccard cliques), so diameter is tiny. Lineage is truncated per round
    * so plan size stays O(1) across iterations: by default with
    * localCheckpoint (executor-local blocks — fast, but lineage is LOST if
    * an executor dies, aborting the job); pass `checkpointDir` (a reliable
    * shared location — HDFS/object store) on a real cluster to trade one
    * write per round for fault tolerance. The result is deterministic:
    * label = min doc_id reachable. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20,
                          checkpointDir: Option[String] = None): DataFrame = {
    val persist: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        val sc = edges.sparkSession.sparkContext
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df => df.checkpoint(eager = true)
      case None => df => df.localCheckpoint(eager = true)
    }
    // materialize the edge list ONCE — it is referenced every round, and
    // without this the (potentially expensive) edge-producing plan would
    // re-execute per iteration
    val sym = persist(edges.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(edges.select(col("b_id").as("src"), col("a_id").as("dst"))))
    // seed labels with min(self, neighbors) — one aggregate that also
    // dedups the vertex set, saving the separate distinct AND the first
    // propagation round (dup components are mostly cliques, which converge
    // immediately from this seed)
    var labels = persist(sym.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), col("src")).as("lbl")))
    // labels are monotonically non-increasing under min-propagation, so the
    // exact (decimal — no long overflow at 10^10 ids) label sum is a
    // fixpoint signal: unchanged sum ⇔ no label moved. One aggregate per
    // round instead of a full old-vs-new join.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var done = false
    var i = 0
    while (!done && i < maxIter) {
      val viaNeighbor = sym.join(labels, col("dst") === col("id"))
        .select(col("src").as("id"), col("lbl"))
      val next = persist(labels.union(viaNeighbor)
        .groupBy("id").agg(min(col("lbl")).as("lbl")))
      val s = labelSum(next)
      done = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      i += 1
    }
    // silently-unconverged labels would be WRONG clusters (possible when a
    // component's diameter exceeds maxIter — chain-shaped graphs, not the
    // dense near-dup cliques this targets). Fail loudly; the caller can
    // raise maxIter (rounds needed = O(max component diameter)).
    if (!done) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds; " +
        "raise maxIter (rounds needed ~ max component diameter)")
    labels
  }

  /** [Q-dedup-cluster] near-duplicate CLUSTER formation + survivor
    * selection: docs sharing 3-gram Jaccard ≥ 0.5 are edges, clusters are
    * connected components, the cluster id is the min doc_id and is also the
    * kept survivor — the step that turns pairwise dedup signals into "keep
    * this row, drop those". Singleton docs form their own cluster.
    * DuckDB-oracle-matched (recursive-CTE transitive closure). */
  def q_dedup_cluster(s: SparkSession, d: String): DataFrame = {
    val docs = Tables(s, d, "documents")
    val labels = connectedComponents(ngramPairs(docs, 0.5))
    docs.select(col("doc_id"))
      .join(labels, col("doc_id") === col("id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster_id"))
      .withColumn("is_keeper", col("doc_id") === col("cluster_id"))
  }

  /** [Q-dedup-ngram] exact 3-gram Jaccard, top-100 pairs on a total order.
    * Candidate generation is a shingle-keyed EQUI-join: explode each doc's
    * distinct shingles, join on the shingle, distinct the colliding (a,b)
    * pairs, then compute exact Jaccard only for candidates. A pair shares a
    * shingle iff its Jaccard > 0, so under `ORDER BY jacc DESC LIMIT 100`
    * this is exact whenever ≥100 pairs overlap at all (sf0.01: thousands do).
    * Scale: shuffle is keyed on the shingle — cost ∝ shingle collisions, not
    * n²; no broadcast, no nested-loop. Hot-shingle skew is the residual
    * risk: on a real corpus, boilerplate shingles fan the join out O(df²),
    * so THE DEPLOYMENT DEFAULT IS [[q_dedup_ngram_capped]] (a doc-frequency
    * cap bounds fan-out at cap² via one keyed count aggregate; AQE skew-join
    * only smooths moderate cases). This uncapped form is the exact-recall
    * twin for oracle scale factors — DedupSpec asserts the two agree
    * wherever no shingle exceeds the cap. DuckDB-oracle-matched. */
  def q_dedup_ngram(s: SparkSession, d: String): DataFrame = {
    // Shingles are DISTINCT per doc (TextOps.shingleExpr), so the number of
    // equi-join matches for a pair IS |A ∩ B| — counting matches in the
    // pair-group aggregate replaces the old distinct() + two array joins +
    // array_intersect with one keyed join and one count shuffle. The per-doc
    // shingle count rides along as two ints instead of re-joined arrays.
    val ex = Tables(s, d, "documents")
      .select(col("doc_id"), txt.shingle_hashes(col("text"), 3).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("nsh"), explode(col("sh")).as("g"))
    // merge-hint the self-join: the EXPLODED side is ~|corpus| rows, so a
    // size-estimate-driven broadcast of it (what AQE picked here) ships and
    // rebuilds the whole shingle table per executor — the keyed shuffle is
    // both cheaper now (2.3x on the bench fixture) and the only shape that
    // survives scale. (Measured alternative: localCheckpoint-ing the
    // exploded table to share it across the two sides costs more than the
    // recompute it saves — the pipeline is scan-cheap, join-bound.)
    ex.as("a").hint("merge").join(ex.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.nsh").as("na"), col("b.nsh").as("nb"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"), max(col("na")).as("na"), max(col("nb")).as("nb"))
      .select(col("a_id"), col("b_id"), (col("inter").cast("double") /
        (col("na") + col("nb") - col("inter"))).as("jacc"))
      .orderBy(col("jacc").desc, col("a_id"), col("b_id"))
      .limit(100)
  }
}
