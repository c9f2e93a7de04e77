package graft

import graft.api.KStream
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5.2 #4): ∀ random record sets —
  *  - latest-per-key(view) == argmax-by-(ts, id);
  *  - running-sum final state == groupBy.sum;
  *  - windowed-join output ⊆ unwindowed-join output ∧ time predicate holds.
  * Generators are scalacheck with fixed seeds (deterministic CI).
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val recordsGen: Gen[List[(Long, Long, Long, Double)]] =
    Gen.listOfN(60, for {
      key <- Gen.choose(0L, 5L)
      seq <- Gen.choose(0L, 1000L)
      value <- Gen.choose(-100, 100).map(_ / 4.0)
    } yield (key, seq, value)).map(_.zipWithIndex.map { case ((k, s, v), id) =>
      (id.toLong, k, s, v)
    })

  private def forAll(f: List[(Long, Long, Long, Double)] => Unit): Unit =
    (1 to 10).foreach { i =>
      f(recordsGen(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(fail(s"generator exhausted at seed $i")))
    }

  private def whenever(c: Boolean)(body: => Unit): Unit = if (c) body

  test("duplicateClusters equals a reference union-find on random graphs") {
    val edgesGen: Gen[List[(Long, Long)]] =
      Gen.listOfN(25, for {
        a <- Gen.choose(0L, 14L)
        b <- Gen.choose(0L, 14L)
        if a != b
      } yield (math.min(a, b), math.max(a, b)))
    (1 to 8).foreach { i =>
      val edges = edgesGen(Gen.Parameters.default, Seed(1000L + i))
        .getOrElse(fail(s"generator exhausted at seed $i")).distinct
      whenever(edges.nonEmpty) {
        // reference: plain union-find with min-label normalization
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        // one more pass so every member points at the component minimum
        val want = parent.keys.map(x => x -> find(x)).toMap
        val got = graft.llm.Dedup.duplicateClusters(edges.toDF("doc_a", "doc_b"))
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"seed $i: $edges")
      }
    }
  }

  test("KMV estimate is within sketch error of the exact distinct count") {
    // k=32 => relative standard error ~ 1/sqrt(k-1) ~ 18%; assert a 3-sigma
    // band on the fixture (exact counts come from the oracled distinct query)
    val est = graft.queries.AnalyticsQueries.approxDistinctKmv(spark, sf1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.queries.AnalyticsQueries.distinctUsers(spark, sf1)
      .select("event_type", "n_users")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (et, ex) =>
      val e = est(et)
      assert(math.abs(e - ex).toDouble / ex <= 0.55,
        s"$et: KMV estimate $e vs exact $ex outside 3-sigma band")
    }
  }

  test("tiered KMV rollup is lossless: daily-sketch merge == flat sketch") {
    // k-min-of-k-mins == k-min of the union, so merging per-day sketches
    // must reproduce the flat per-group estimate bit-for-bit
    val tiered = graft.queries.AnalyticsQueries.kmvUnionDaily(spark, sf1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val flat = graft.queries.AnalyticsQueries.approxDistinctKmv(spark, sf1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiered == flat, s"tiered $tiered != flat $flat")
  }

  test("latest-per-key view == argmax by (seq, id) for arbitrary upsert streams") {
    forAll { recs =>
      whenever(recs.nonEmpty) {
        val df = recs.toDF("id", "key", "seq", "value")
        val got = KStream(df, "key", "seq").toTable(Seq("seq", "id")).df
          .select("key", "id").as[(Long, Long)].collect().toMap
        val want = recs.groupBy(_._2).view
          .mapValues(_.maxBy(r => (r._3, r._1))._1).toMap
        assert(got == want)
      }
    }
  }

  test("running-sum converged state == groupBy.sum for arbitrary streams") {
    forAll { recs =>
      whenever(recs.nonEmpty) {
        val df = recs.toDF("id", "key", "seq", "value")
        val got = KStream(df, "key", "seq").groupByKey
          .aggregate(sum(col("value")).as("total")).df
          .select("key", "total").as[(Long, Double)].collect().toMap
        val want = recs.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
        got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-9) }
        assert(got.keySet == want.keySet)
      }
    }
  }

  test("interval join ⊆ unwindowed join, and every pair satisfies the predicate") {
    forAll { recs =>
      whenever(recs.size > 1) {
        val (l, r) = recs.splitAt(recs.size / 2)
        def toStream(rs: List[(Long, Long, Long, Double)]) =
          KStream(rs.toDF("id", "key", "seq", "value")
            .withColumn("ts", timestamp_seconds(col("seq"))), "key", "ts")
        val windowed = toStream(l).joinInterval(toStream(r), "100 SECONDS")
          .select("l_id", "r_id", "l_seq", "r_seq")
          .as[(Long, Long, Long, Long)].collect()
        val unwindowed = toStream(l).df.as("a")
          .join(toStream(r).df.as("b"), col("a.key") === col("b.key"))
          .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
        assert(windowed.map(p => (p._1, p._2)).toSet.subsetOf(unwindowed))
        windowed.foreach(p => assert(math.abs(p._3 - p._4) <= 100))
      }
    }
  }

  test("native as-of equals a brute-force reference in every direction on random rows") {
    // Dense key/time domains force the state machine's hard cases: equal
    // times (tie-breaks), repeated left times, keys present on one side
    // only, candidates exactly at the tolerance bound.
    val sideGen: Gen[List[(Long, Long, Long)]] =
      Gen.listOfN(40, for {
        key <- Gen.choose(0L, 4L)
        t <- Gen.choose(0L, 20L)
      } yield (key, t)).map(_.zipWithIndex.map { case ((k, t), id) =>
        (k, t, id.toLong)
      })
    val tol = 5L
    def brute(ls: List[(Long, Long, Long)], rs: List[(Long, Long, Long)],
              dir: String): Set[(Long, Long)] =
      ls.map { case (k, lt, lid) =>
        val back = rs.filter(r => r._1 == k && r._2 <= lt && lt - r._2 <= tol)
          .sortBy(r => (r._2, r._3)).lastOption
        val fwd = rs.filter(r => r._1 == k && r._2 >= lt && r._2 - lt <= tol)
          .sortBy(r => (r._2, r._3)).headOption
        val m = dir match {
          case "backward" => back
          case "forward"  => fwd
          case _ => (back, fwd) match {
            case (None, f) => f
            case (b, None) => b
            case (Some(b), Some(f)) =>
              if (f._2 - lt < lt - b._2) Some(f) else Some(b)
          }
        }
        lid -> m.map(_._3).getOrElse(-1L)
      }.toSet
    (1 to 6).foreach { i =>
      val ls = sideGen(Gen.Parameters.default, Seed(1000L + i)).get
      val rs = sideGen(Gen.Parameters.default, Seed(2000L + i)).get
      val lDf = ls.toDF("k", "lt", "lid")
      val rDf = rs.toDF("rk", "rt", "rid")
      for (dir <- Seq("backward", "forward", "nearest")) {
        val got = graft.plans.AsofJoin.join(lDf, rDf, Seq("k" -> "rk"),
            "lt", "rt", rightTiebreak = Seq("rid"),
            tolerance = Some("5 microseconds"), direction = dir)
          .select($"lid", coalesce($"rid", lit(-1L)))
          .as[(Long, Long)].collect().toSet
        assert(got == brute(ls, rs, dir),
          s"seed $i direction $dir: native != brute force\n" +
            s" missing=${brute(ls, rs, dir) -- got}\n extra=${got -- brute(ls, rs, dir)}")
        // the time-banded split must agree with the same reference for ANY
        // band width — including widths smaller than the tolerance (heavy
        // right replication) and non-divisors of the time domain
        val width = Seq("3", "7", "11")(i % 3)
        val banded = graft.plans.AsofJoin.joinTimeBanded(lDf, rDf,
            Seq("k" -> "rk"), "lt", "rt", rightTiebreak = Seq("rid"),
            tolerance = "5 microseconds", direction = dir,
            bandWidth = s"$width microseconds")
          .select($"lid", coalesce($"rid", lit(-1L)))
          .as[(Long, Long)].collect().toSet
        assert(banded == got,
          s"seed $i direction $dir width $width: banded != plain\n" +
            s" missing=${got -- banded}\n extra=${banded -- got}")
      }
    }
  }
}
