package graft

/** The driver's t1 smoke: entry() must return rows on sf0.001. */
class EntrySmokeSpec extends SparkSpec {

  test("entry returns a non-empty ranked nation table") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length > 0)
    assert(df.columns.contains("pagerank") && df.columns.contains("articlerank"))
    // ranked output: first row has the max pagerank
    val prs = rows.map(_.getAs[Double]("pagerank"))
    assert(prs.head == prs.max)
  }
}
