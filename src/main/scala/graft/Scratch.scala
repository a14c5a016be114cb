package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary profiling harness — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    import graft.functions.VectorFns
    val e = Tables.load(spark, dir, "embeddings").filter(col("label") === 0)
      .withColumn("qv", VectorFns.quantize(col("embedding")))
      .withColumn("bucket", VectorFns.lshBucketQ(col("qv"), 8))
      .withColumn("norm", sqrt(VectorFns.dotQDouble(col("qv"), col("qv"))))
    val a = e.select(col("vec_id").as("a_id"), col("qv").as("ae"),
                     col("norm").as("an"), col("bucket"))
    val b = e.select(col("vec_id").as("b_id"), col("qv").as("be"),
                     col("norm").as("bn"), col("bucket"))
    val pairs = a.join(b, Seq("bucket")).filter(col("a_id") < col("b_id"))
      .withColumn("cos", VectorFns.dotQDouble(col("ae"), col("be")) / (col("an") * col("bn")))
      .filter(round(col("cos"), 6) >= 0.2)
      .select(col("a_id"), col("b_id"))

    time("pairs count")(println("pairs = " + pairs.count()))
    val comp = time("components build+run") {
      graft.operators.Components.connectedComponents(pairs, "a_id", "b_id")
    }
    time("collect result")(println("nodes = " + comp.orderBy(col("node")).count()))
    // second run, warm
    time("pairs count 2")(println("pairs = " + pairs.count()))
    val comp2 = time("components run 2") {
      graft.operators.Components.connectedComponents(pairs, "a_id", "b_id")
    }
    time("collect result 2")(println("nodes = " + comp2.orderBy(col("node")).count()))
    spark.stop()
  }
}
