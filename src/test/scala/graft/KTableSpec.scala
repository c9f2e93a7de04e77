package graft

import graft.api.KStream
import org.apache.spark.sql.functions._

/** KTable changelog semantics (KTableExample.scala:52-62), incl. the
  * order-sensitive cases from SURVEY.md §7.5.
  */
class KTableSpec extends SparkSuite {
  import spark.implicits._

  // Upserts arrive shuffled (KTableExample.scala:112): (key, seq, value)
  private def upserts = Seq(
    ("k1", 3L, "v1-newest"), ("k2", 1L, "v2-old"), ("k1", 1L, "v1-old"),
    ("k2", 3L, "v2-newest-X"), ("k1", 2L, "v1-mid"), ("k2", 2L, "v2-mid-X")
  ).toDF("key", "seq", "value")

  test("latest-per-key wins regardless of arrival order") {
    val view = KStream(upserts, "key", "seq").toTable(Seq("seq")).df
      .orderBy("key").collect()
    assert(view.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("k1", "v1-newest"), ("k2", "v2-newest-X")))
  }

  test("KTable filter applies to the view, not raw upserts") {
    // Marker 'X' present only in k2's newest+mid. Correct changelog
    // semantics: reduce first (k1 -> v1-newest, k2 -> v2-newest-X), THEN
    // filter -> only k2 survives. Filtering raw upserts first would keep a
    // stale k2 row and drop none of k1's history order-dependently.
    val got = KStream(upserts, "key", "seq").toTable(Seq("seq"))
      .filter(col("value").contains("X")).df.collect()
    assert(got.length == 1 && got.head.getString(0) == "k2")
    // the wrong order (filter-then-reduce) yields the same keys here only by
    // accident for k2 but would also emit nothing for k1 — prove divergence:
    val wrong = KStream(upserts.filter(col("value").contains("X")), "key", "seq")
      .toTable(Seq("seq")).df.collect()
    assert(wrong.length == 1) // same count, but…
    // …with a different value when the newest non-matching upsert is hidden:
    val upserts2 = upserts.union(Seq(("k2", 4L, "v2-final-clean")).toDF("key", "seq", "value"))
    val right2 = KStream(upserts2, "key", "seq").toTable(Seq("seq"))
      .filter(col("value").contains("X")).df.collect()
    val wrong2 = KStream(upserts2.filter(col("value").contains("X")), "key", "seq")
      .toTable(Seq("seq")).df.collect()
    assert(right2.isEmpty, "newest k2 upsert fails predicate -> key deleted from view")
    assert(wrong2.nonEmpty, "filter-before-reduce incorrectly resurrects an old upsert")
  }

  test("mapValues preserves key and event-time columns") {
    val s = KStream(upserts, "key", "seq").mapValues("v2" -> upper(col("value")))
    assert(s.df.columns.toSeq == Seq("key", "seq", "v2"))
  }

  test("branch + merge round-trips the stream") {
    val s = KStream(upserts, "key", "seq")
    val Seq(a, b) = s.branch(col("key") === "k1", col("key") =!= "k1")
    assert(a.merge(b).df.count() == upserts.count())
  }
}
