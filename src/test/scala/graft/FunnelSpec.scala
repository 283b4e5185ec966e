package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite with SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")

  private def fixture = {
    import spark.implicits._
    Seq(
      // u1 converts fully, in order
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // u2: purchase BEFORE the view — must not count as converted
      (2L, "purchase", ts(1)), (2L, "view", ts(2)), (2L, "click", ts(3)),
      // u3: click at the SAME instant as view — strictly-after fails;
      // the later click qualifies
      (3L, "view", ts(5)), (3L, "click", ts(5)), (3L, "click", ts(7)),
      // u4: re-viewing after clicking must not reset progress
      (4L, "view", ts(1)), (4L, "click", ts(2)), (4L, "view", ts(9)),
      (4L, "purchase", ts(4)),
      // u5 never starts the funnel
      (5L, "click", ts(1)), (5L, "purchase", ts(2)))
      .toDF("user_id", "event_type", "ts")
  }

  test("stepTimes: first-touch strictly-after chain, NULL once broken") {
    import spark.implicits._
    val t = Funnel
      .stepTimes(fixture, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("user")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().toSeq
    assert(t === Seq(
      (1L, Some(ts(1)), Some(ts(2)), Some(ts(3))),
      (2L, Some(ts(2)), Some(ts(3)), None),       // purchase was earlier
      (3L, Some(ts(5)), Some(ts(7)), None),       // same-ts click skipped
      (4L, Some(ts(1)), Some(ts(2)), Some(ts(4))) // re-view ignored
    ))
  }

  test("orderedFunnel: per-step counts and previous-step conversions") {
    import spark.implicits._
    val out = Funnel
      .orderedFunnel(fixture, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .as[(Int, String, Long, Long)].collect().toSeq
    // 4 viewers; 4 clicked after viewing; 2 purchased after clicking
    assert(out === Seq(
      (1, "view", 4L, 1000000L),
      (2, "click", 4L, 1000000L),
      (3, "purchase", 2L, 500000L)))
  }

  test("orderedFunnel is partitioning-invariant") {
    import spark.implicits._
    val a = Funnel.orderedFunnel(fixture, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).orderBy("step_idx")
      .as[(Int, String, Long, Long)].collect().toSeq
    val b = Funnel.orderedFunnel(fixture.repartition(7), "user_id",
      "event_type", "ts", Seq("view", "click", "purchase"))
      .orderBy("step_idx").as[(Int, String, Long, Long)].collect().toSeq
    assert(a === b)
  }

  test("conversion deadline: a step AT the gap boundary converts, one " +
      "beyond it does not — and a later in-window event cannot rescue") {
    import spark.implicits._
    val ev = Seq(
      // u1: click exactly 60 s after view — boundary is INCLUSIVE
      (1L, "view", ts(1)), (1L, "click", ts(2)),
      // u2: first click 61+ s after view — misses; there is no earlier one
      (2L, "view", ts(1)), (2L, "click", ts(3)))
      .toDF("user_id", "event_type", "ts")
    val t = Funnel
      .stepTimes(ev, "user_id", "event_type", "ts", Seq("view", "click"),
        maxGapSeconds = Some(60L))
      .orderBy("user")
      .as[(Long, Option[Timestamp], Option[Timestamp])].collect().toSeq
    assert(t === Seq(
      (1L, Some(ts(1)), Some(ts(2))),
      (2L, Some(ts(1)), None)))
    intercept[IllegalArgumentException] {
      Funnel.stepTimes(ev, "user_id", "event_type", "ts",
        Seq("view", "click"), maxGapSeconds = Some(0L))
    }
  }

  test("guards: at least two distinct steps") {
    intercept[IllegalArgumentException] {
      Funnel.orderedFunnel(fixture, "user_id", "event_type", "ts",
        Seq("view"))
    }
    intercept[IllegalArgumentException] {
      Funnel.orderedFunnel(fixture, "user_id", "event_type", "ts",
        Seq("view", "view"))
    }
  }
}
