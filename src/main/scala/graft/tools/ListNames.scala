package graft.tools

/** Print declared-query name lists for shell orchestration (the sf100
  * sweep script) — derived from the entry maps themselves so the script
  * never keeps a hand-copied list that drifts (r17 verdict #7).
  *
  *   tpcds-generated — every q_tpcds_* declared query that runs against
  *     the GENERATED cache (i.e. minus the sf1-pinned *_pub proof twins,
  *     which Bench and the scale sweeps exclude by design);
  *   tpchfull — the q_tpch_* queries whose oracle pins the TpchFull
  *     generated cache (exactly TpchFull.queries' key set).
  *
  * No SparkSession is created — this is a pure map listing.
  */
object ListNames {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("") match {
      case "tpcds-generated" =>
        graft.SparkEntry.queries.keys.filter(_.startsWith("q_tpcds_"))
          .filterNot(graft.SparkEntry.pinnedScaleProofs).toSeq.sorted
      case "tpchfull" =>
        graft.ops.TpchFull.queries.keys.toSeq.sorted
      case other =>
        System.err.println(s"usage: ListNames <tpcds-generated|tpchfull> (got '$other')")
        sys.exit(2)
    }
    println(names.mkString(" "))
  }
}
