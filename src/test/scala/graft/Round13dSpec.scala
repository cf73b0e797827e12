package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Analytics7

/** r13 wave-4 operators: worked-by-hand fixtures. */
class Round13dSpec extends AnyFunSuite with SparkFixture {

  private def ms(m: Long): Timestamp = new Timestamp(m)
  private def hour(h: Long): Timestamp = new Timestamp(h * 3600000L)
  private def day(d: Long): Timestamp = new Timestamp(d * 86400000L)

  test("events_interarrival: log2-ms buckets on exact gaps") {
    import spark.implicits._
    // same-user same-type gaps of 1000 ms and 2000 ms:
    // floor(log2(1001)) = 9, floor(log2(2001)) = 10
    val ev = Seq((1L, 1L, "a", ms(0)), (2L, 1L, "a", ms(1000)),
      (3L, 1L, "a", ms(3000)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Analytics7.eventsInterarrivalOn(ev).orderBy("bucket")
      .collect()
    assert(out.map(r => (r.getLong(1), r.getLong(3))).toSeq ===
      Seq((9L, 1L), (10L, 1L)))
    assert(out.head.getDouble(2) === 0.512)    // 2^9 / 1000
    assert(out.forall(_.getDouble(4) === 0.5))
  }

  test("events_load_profile: dense-rank p95 on a 3-hour span") {
    import spark.implicits._
    // one type, hours 0/1/2 with counts 1/2/7: span 3, target rank
    // ceil(0.95*3) = 3 -> p95 = 3rd smallest = 7
    val rows = Seq.fill(1)((hour(0))) ++ Seq.fill(2)(hour(1)) ++
      Seq.fill(7)(hour(2))
    val ev = rows.zipWithIndex
      .map { case (t, i) => (i.toLong, "a", t) }
      .toDF("event_id", "event_type", "ts")
    val r = Analytics7.eventsLoadProfileOn(ev).collect().head
    assert(r.getLong(1) === 3L && r.getLong(2) === 3L)
    assert(r.getLong(3) === 10L)
    assert(r.getDouble(4) === 3.3333)
    assert(r.getLong(5) === 7L && r.getLong(6) === 7L)
    assert(r.getDouble(7) === 2.1)             // 7*3/10
  }

  test("events_load_profile: sparse type lands p95 in the zero ranks") {
    import spark.implicits._
    // span 100 (type a at hours 0 and 99); type c has ONE active hour:
    // zeros = 99 >= target 95 -> p95 = 0, peak = 1
    val ev = (Seq.fill(2)(("a", hour(0))) ++ Seq.fill(5)(("a", hour(99))) ++
      Seq(("c", hour(50))))
      .zipWithIndex.map { case ((ty, t), i) => (i.toLong, ty, t) }
      .toDF("event_id", "event_type", "ts")
    val out = Analytics7.eventsLoadProfileOn(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("c").getLong(1) === 100L)
    assert(out("c").getLong(5) === 0L && out("c").getLong(6) === 1L)
    assert(out("a").getLong(5) === 0L)         // 2 active of 100 hours
    assert(out("a").getLong(6) === 5L)
  }

  test("q_retention_halflife: exact halving fits half_life = 1 day") {
    import spark.implicits._
    // 4 users first active day 0; day 1 keeps 2 (r=0.5), day 2 keeps 1
    // (r=0.25): lambda = ln 2, half-life exactly 1.0
    val ev = Seq((1L, day(0)), (2L, day(0)), (3L, day(0)), (4L, day(0)),
      (1L, day(1)), (2L, day(1)), (1L, day(2)))
      .zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "ts")
    val r = Analytics7.qRetentionHalflifeOn(ev).collect().head
    assert(r.getLong(0) === 4L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 0.5)             // r1
    assert(r.getDouble(3) === 0.6931)          // lambda = ln 2
    assert(r.getDouble(4) === 1.0)             // half-life
  }

  test("q_join_cardinality: exact product-sum on a counted fixture") {
    import spark.implicits._
    val a = Seq(1L, 1L, 2L).toDF("k")
    val b = Seq(1L, 2L, 2L, 3L).toDF("k")
    val r = Analytics7.joinCardinality("t", a, "k", b, "k")
      .collect().head
    assert(r.getLong(1) === 3L && r.getLong(2) === 4L)
    assert(r.getLong(3) === 2L)                // common keys {1, 2}
    assert(r.getDouble(4) === 4.0)             // 2*1 + 1*2
    assert(r.getDouble(5) === 1.0)             // 4 / max(3, 4)
    assert(r.getLong(6) === 1L)                // tie 2 vs 2 -> min key
    assert(r.getDouble(7) === 0.5)
  }
}
