package graft.plans

import org.apache.spark.sql.SparkSession

/** Engine-level session defaults (r18 optimization round).
  *
  * Strategy-only settings — none of them can change what a query computes,
  * only which physical operator computes it — applied uniformly to the
  * contract surfaces (Bench / Verify / CLI) and the measurement tools, so
  * the plans the bench times are the plans the gate verifies.
  *
  * `preferSortMergeJoin=false` + the AQE shuffled-hash rewrite threshold
  * implement the optimization guide's join preference order (§3.1: "often
  * faster than sort-merge when one side is moderately small per partition";
  * §9 ships exactly this pair as the reasonable baseline). Measured r18 on
  * the join-heavy subset (sf0.1, local[32], warm medians of 5): q64
  * 3.63→3.04 s, q23 1.78→1.42, q23b 2.16→1.64, q14 2.26→1.74; every other
  * subset query within noise (OPTIMIZATION_r18.md §config). The win is the
  * removed per-partition sorts on fact⋈fact joins — which also holds at
  * scale, where those sorts spill.
  *
  * OOM posture at 100 TB (the guide's stated risk for shuffled-hash): the
  * engine keys every fact shuffle at ≤128 MiB of compressed input per
  * partition ([[ShuffleScale]], partitions ∝ data), so a build-side
  * partition is bounded a few × that uncompressed; the AQE local-map
  * threshold is set to the same 128 MiB budget, AQE skew-join splitting
  * applies to shuffled-hash joins exactly as to sort-merge, and the static
  * planner only picks the hash build when its size conditions
  * (canBuildLocalHashMap + muchSmaller) hold. A deployment that still
  * prefers sort-merge's graceful-spill guarantee flips the conf back — a
  * system property `-Dspark.sql.join.preferSortMergeJoin=true` (or any
  * explicit setting of a key below) wins over these defaults.
  *
  * Queries whose DECLARED identity is a specific join strategy pin it
  * explicitly and are immune to session defaults: q_join_bcast broadcasts,
  * q_join_sm carries hint("merge"), the dedup/simhash self-joins carry
  * hint("merge") (a corpus-sized side must never hash-build).
  */
object SessionDefaults {
  val defaults: Seq[(String, String)] = Seq(
    // pin ANSI mode (Spark 4's default) explicitly: the long-cents sum
    // rewrites (Tpcds.centsL) document "an overflow throws loudly" as
    // their failure mode, which is only true under ANSI — with it off a
    // long overflow wraps silently. The conf-injection seam
    // (SPARK_GRAFT_CONF / -D overrides) could otherwise flip it; centsL
    // additionally asserts it at query-construction time (r19, ADVICE).
    "spark.sql.ansi.enabled" -> "true",
    // allow shuffled-hash join when the planner's size conditions hold
    // (guide §3.1/§9) — removes the per-partition sorts of sort-merge
    "spark.sql.join.preferSortMergeJoin" -> "false",
    // AQE runtime SMJ→SHJ rewrite when every post-shuffle partition is
    // under the ShuffleScale per-partition budget (default 0 = off)
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" ->
      String.valueOf(ShuffleScale.targetBytesPerPartition))

  /** Apply [[defaults]] to a session builder. A key already present as a
    * system property (the SPARK_GRAFT_CONF A/B harness, or an operator's
    * explicit -D override) is left to that value — defaults never shadow a
    * deliberate setting. */
  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    defaults.foldLeft(b) { case (bb, (k, v)) =>
      if (sys.props.contains(k)) bb else bb.config(k, v)
    }
}
