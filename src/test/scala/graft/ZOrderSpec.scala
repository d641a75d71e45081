package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import graft.sources.ZOrderLayout

import scala.jdk.CollectionConverters._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave in plain Scala. */
  private def zRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= (x & (1L << i)) << i
      z |= (y & (1L << i)) << (i + 1)
    }
    z
  }

  test("zValue matches the reference interleave, monotone in box locality") {
    val pts = for (x <- 0L to 40L; y <- 0L to 40L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrderLayout.zValue(col("x"), col("y"), 20).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == zRef(x, y, 20), s"($x,$y)") }
    // canonical small cases: (1,0)->1, (0,1)->2, (1,1)->3, (2,2)->12
    assert(zRef(1, 0, 20) == 1L && zRef(0, 1, 20) == 2L &&
      zRef(1, 1, 20) == 3L && zRef(2, 2, 20) == 12L)
  }

  /** Row groups whose [min,max] stats intersect the box on BOTH
    * columns — the groups a stats-pruning reader must actually read. */
  private def boxRowGroups(dir: String, xCol: String, yCol: String,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): (Int, Int) = {
    val conf = new Configuration()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    var total = 0
    var hit = 0
    files.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        reader.getFooter.getBlocks.asScala.foreach { block =>
          total += 1
          val cols = block.getColumns.asScala
            .map(c => c.getPath.toDotString -> c.getStatistics).toMap
          def overlaps(colName: String, lo: Long, hi: Long): Boolean = {
            val st = cols(colName)
            val mn = st.genericGetMin.asInstanceOf[Number].longValue()
            val mx = st.genericGetMax.asInstanceOf[Number].longValue()
            mx >= lo && mn <= hi
          }
          if (overlaps(xCol, xLo, xHi) && overlaps(yCol, yLo, yHi)) hit += 1
        }
      } finally reader.close()
    }
    (hit, total)
  }

  test("z-ordered layout prunes more row groups for a 2-D box than a linear sort") {
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    // tiny row groups: the curve only prunes when a group's z-span is
    // narrower than the scattered key's range (suppkey is 0..99 at
    // sf0.01, so ~300 rows/group ⇒ 32-wide suppkey windows)
    val opts = Map("parquet.block.size" -> "2048", "parquet.page.size" -> "512")
    ZOrderLayout.writeZOrdered(li, s"$base/z", "l_partkey", "l_suppkey",
      parts = 2, bits = 20, options = opts)
    li.repartitionByRange(2, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").options(opts).parquet(s"$base/linear")
    // the discriminating box: WIDE in the sort dimension, NARROW in the
    // scattered one. The linear layout can only prune on l_partkey, so
    // it reads every row group; the morton order keeps l_suppkey
    // locality too and skips most of them.
    val box = (0L, 1000000L, 10L, 19L)
    val (zHit, zTot) = boxRowGroups(s"$base/z", "l_partkey", "l_suppkey",
      box._1, box._2, box._3, box._4)
    val (lHit, lTot) = boxRowGroups(s"$base/linear", "l_partkey", "l_suppkey",
      box._1, box._2, box._3, box._4)
    assert(zTot >= 10, s"want many row groups to compare, got $zTot")
    // essentially nothing: range-partitioner sampling occasionally
    // leaves a tail row group with an accidentally narrow suppkey span,
    // so an exact == is run-to-run flaky (observed 253/254 once)
    assert(lHit >= lTot - 2, s"linear layout should prune ~nothing here: $lHit/$lTot")
    assert(zHit * 2 < lHit, s"z-order hit $zHit/$zTot vs linear $lHit/$lTot")
    // and both layouts return identical rows through the box filter
    def rows(p: String) = spark.read.parquet(p)
      .filter(col("l_partkey").between(box._1, box._2) &&
        col("l_suppkey").between(box._3, box._4))
      .as[(Long, Long, Long)].collect().toSet
    assert(rows(s"$base/z") == rows(s"$base/linear"))
  }
}
