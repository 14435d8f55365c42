package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq(0.01, 0.1)) {
      val dir = s"/tmp/graft_tpcds/gen${graft.gen.TpcdsGen.genVersion}/sf$sf"
      def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
      val dd = t("date_dim").filter(col("d_year") === 2000).select("d_date_sk")
      val cd = t("customer_demographics").select("cd_demo_sk", "cd_marital_status", "cd_education_status")
      val hd = t("household_demographics").select("hd_demo_sk", "hd_dep_count")
      val addr = t("customer_address").select("ca_address_sk", "ca_state")
      def demo(ms: String, ed: String, lo: Int, hi: Int, dep: Int) =
        col("cd_marital_status") === ms && col("cd_education_status") === ed &&
          col("ss_sales_price").between(lo, hi) && col("hd_dep_count") === dep
      def geo(states: Seq[String], lo: Int, hi: Int) =
        col("ca_state").isin(states: _*) && col("ss_net_profit").between(lo, hi)
      val base = t("store_sales")
        .join(dd, col("ss_sold_date_sk") === col("d_date_sk"))
        .join(cd, col("ss_cdemo_sk") === col("cd_demo_sk"))
        .join(hd, col("ss_hdemo_sk") === col("hd_demo_sk"))
        .join(addr, col("ss_addr_sk") === col("ca_address_sk"))
      val pubDemo = demo("M", "Advanced Degree", 100, 150, 3) ||
        demo("S", "College", 50, 100, 1) || demo("W", "2 yr Degree", 150, 200, 1)
      val pubGeo = geo(Seq("TX", "OH"), 100, 200) ||
        geo(Seq("OR", "NM", "KY"), 150, 300) || geo(Seq("VA", "TX", "MS"), 50, 250)
      val demoOnly = base.filter(pubDemo).count()
      val demoNoPrice = base.filter(
        (col("cd_marital_status") === "M" && col("cd_education_status") === "Advanced Degree" && col("hd_dep_count") === 3) ||
        (col("cd_marital_status") === "S" && col("cd_education_status") === "College" && col("hd_dep_count") === 1) ||
        (col("cd_marital_status") === "W" && col("cd_education_status") === "2 yr Degree" && col("hd_dep_count") === 1)).count()
      val geoOnly = base.filter(pubGeo).count()
      val joint = base.filter(pubDemo && pubGeo).count()
      println(s"[q13probe] sf=$sf demoNoPrice=$demoNoPrice demoWithPubPrice=$demoOnly geoPub=$geoOnly JOINT=$joint")
    }
    spark.stop()
  }
}
