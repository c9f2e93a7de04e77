package graft

import graft.engine.Skew
import org.apache.spark.sql.functions._

/** Salted-join semantics: salting redistributes hot keys across reducers
  * but must never change the join's result — output equality against the
  * plain equi-join on pathologically skewed data is the whole contract.
  */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  // 10k rows for one hot key, a handful for the rest — the shape where one
  // reducer would receive ~99% of a plain shuffle
  private lazy val big = spark.range(10000).select(lit("hot").as("k"), col("id").as("v"))
    .union(spark.range(50).select(concat(lit("cold"), col("id") % 5).as("k"), col("id").as("v")))
  private lazy val dim = Seq(
    ("hot", "H"), ("cold0", "C0"), ("cold1", "C1"), ("cold2", "C2"),
    ("unmatched", "X")).toDF("k", "label")

  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "v", "label").as[(String, Long, String)]
      .collect().groupBy(identity).view.mapValues(_.length).toMap

  test("salted join output equals the plain equi-join (inner)") {
    val plain = big.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(big, dim, "k", salt = 8)
    assert(multiset(salted) == multiset(plain))
    assert(salted.count() == 10000 + 20 + 10)
  }

  test("salted left join preserves unmatched big-side rows exactly once") {
    val plain = big.join(dim, Seq("k"), "left")
    val salted = Skew.saltedJoin(big, dim, "k", salt = 8, joinType = "left")
    // cold3/cold4 have no dim row; each must survive exactly once with null label
    assert(multiset(salted.na.fill("∅", Seq("label")))
      == multiset(plain.na.fill("∅", Seq("label"))))
  }

  test("salt spreads the hot key across sub-keys") {
    val salts = big.filter(col("k") === "hot")
      .withColumn("__salt", pmod(xxhash64(big.columns.map(col): _*), lit(8)).cast("int"))
      .select(countDistinct(col("__salt"))).as[Long].head()
    assert(salts == 8L, "hot key must occupy every salt bucket")
  }
}
