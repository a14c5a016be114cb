package graft
import org.apache.spark.sql.SparkSession
object FixedCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val name = args.headOption.getOrElse("q_o1_limit")
    val q = SparkEntry.registry.find(_.name == name).get
    q.run(spark, dir).count() // warm up
    def ns[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e6, r)
    }
    for (i <- 1 to 5) {
      val (tBuild, df) = ns(q.run(spark, dir))
      val (tPlan, _) = ns(df.queryExecution.executedPlan)
      val (tExec, n) = ns(df.count())
      println(f"iter$i build=$tBuild%7.1fms optimize+plan=$tPlan%7.1fms execute=$tExec%7.1fms rows=$n")
    }
    spark.stop()
  }
}
