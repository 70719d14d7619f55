package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  test("column profile: one row per column, consistent counts, sane bounds") {
    val rows = Profile.lineitemStats(spark, sfDir).collect()
    assert(rows.length === 6)
    val n = rows.head.getAs[Long]("n_rows")
    assert(n > 0)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") === n, "every pass profiles the same table")
      val nulls = r.getAs[Long]("n_nulls")
      val ndv = r.getAs[Long]("n_distinct")
      assert(nulls >= 0 && nulls <= n)
      assert(ndv >= 1 && ndv <= n - nulls,
        s"${r.getAs[String]("column_name")}: ndv $ndv out of [1, ${n - nulls}]")
    }
    val byName = rows.map(r => r.getAs[String]("column_name") -> r).toMap
    assert(byName.keySet === Set("l_orderkey", "l_partkey", "l_suppkey",
      "l_returnflag", "l_linestatus", "l_shipdate"))
    // the TPC-H flag domains are fixed; keys must be high-cardinality
    assert(byName("l_returnflag").getAs[Long]("n_distinct") <= 3)
    assert(byName("l_linestatus").getAs[Long]("n_distinct") <= 2)
    assert(byName("l_orderkey").getAs[Long]("n_distinct") >
      byName("l_returnflag").getAs[Long]("n_distinct"))
    // dates stringified yyyy-MM-dd sort lexicographically = chronologically
    val ship = byName("l_shipdate")
    assert(ship.getAs[String]("min_value") <= ship.getAs[String]("max_value"))
    assert(ship.getAs[String]("min_value").matches("\\d{4}-\\d{2}-\\d{2}"))
  }
}
