package graft

/** The graft native expressions registered through
  * SparkSessionExtensions (graft.plans.GraftExtensions) — callable
  * from plain SQL. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_poly_hash is callable from SQL") {
    assert(spark.sql("SELECT graft_poly_hash('ab') AS h").as[Long].head() === 3105L)
  }

  test("graft_shingle_hashes from SQL matches the Column API") {
    val viaSql = spark.sql(
      "SELECT sort_array(graft_shingle_hashes('a b c d')) AS s").as[Seq[Long]].head()
    val viaCol = Seq("a b c d").toDF("t")
      .select(org.apache.spark.sql.functions.sort_array(
        graft.functions.TextOps.shingleHashes($"t"))).as[Seq[Long]].head()
    assert(viaSql === viaCol)
  }

  test("graft_dot from SQL") {
    val v = spark.sql(
      """SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)),
                          array(CAST(2 AS FLOAT), CAST(0.5 AS FLOAT))) AS d""")
      .as[Double].head()
    assert(v === 4.0)
  }
}
