package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Salted join: bit-exact parity with the plain join (every fact row
  * meets exactly one dim replica), a hot key really spreads across
  * salts, and the degenerate salts=1 case collapses to the plain join. */
class SkewJoinSpec extends SparkSpecBase {

  test("parity with the plain join, duplicates and misses included") {
    import spark.implicits._
    // fact: skewed key 7 (10 rows), unmatched key 99; dim: unmatched key 5
    val fact = ((1 to 10).map(_ => (7L, "hot")) ++
      Seq((1L, "a"), (2L, "b"), (99L, "miss"))).toDF("fk", "fv")
    val dim = Seq((7L, "d7"), (1L, "d1"), (2L, "d2"), (5L, "d5"))
      .toDF("dk", "dv")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("fk", "fv", "dk", "dv").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
        .sortBy(t => (t._1, t._2))
    val salted = canon(SkewJoin.saltedJoin(fact, dim, "fk", "dk", salts = 4))
    val plain = canon(fact.join(dim, col("fk") === col("dk")))
    assert(salted.toSeq === plain.toSeq)
    assert(salted.count(_._1 == 7L) === 10)
    assert(!salted.exists(t => t._1 == 99L || t._3 == 5L))
  }

  test("a hot key's rows spread over more than one salt") {
    import spark.implicits._
    val fact = (1 to 200).map(i => (7L, s"v$i")).toDF("fk", "fv")
    val perSalt = fact.withColumn("__salt",
        pmod(xxhash64(struct(col("fk"), col("fv"))), lit(8)))
      .groupBy("__salt").count().collect()
    assert(perSalt.length > 4, s"hot key stuck on ${perSalt.length} salts")
    assert(perSalt.map(_.getLong(1)).max < 100, "one salt absorbed half the key")
  }

  test("salts = 1 degenerates to the plain join") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (2L, "b")).toDF("fk", "fv")
    val dim = Seq((1L, "x"), (2L, "y")).toDF("dk", "dv")
    assert(SkewJoin.saltedJoin(fact, dim, "fk", "dk", salts = 1).count() === 2L)
  }

  test("q136 matches the plain-join formulation on real tables") {
    val salted = SkewJoin.brandRevenueSalted(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val discPrice = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(9,4)") - col("l_discount").cast("decimal(9,4)"))
    val plain = graft.core.Tables.lineitem(spark, sf)
      .join(graft.core.Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(discPrice).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand").asc).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq === plain.toSeq)
    assert(salted.nonEmpty)
  }
}
