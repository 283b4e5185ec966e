package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ORDERED-STEP CONVERSION FUNNEL — the events-side warehouse staple
  * next to q75's sessionization and q137's retention matrix: of the
  * users who did step 1, how many LATER did step 2, and later still
  * step 3? First-touch semantics (the standard product-analytics
  * reading): a user's step-i time is the EARLIEST qualifying event
  * STRICTLY AFTER their step-(i−1) time, so out-of-order events
  * (purchase before view) never count and re-doing an early step
  * never resets progress. The reference frame for "how many converted"
  * is each step's immediate predecessor (conv_micro = ⌊10⁶·nᵢ/nᵢ₋₁⌋,
  * exact integer arithmetic — the no-floats-in-decisions rule applies
  * to reported ratios via the one micro floor). An optional CONVERSION
  * DEADLINE (`maxGapSeconds`) requires each step within that gap of
  * the previous one — the windowed funnel every product-analytics tool
  * defaults to ("clicked within 6 h of first view"); without it a
  * long-lived user eventually "converts" by accident and the funnel
  * discriminates nothing.
  *
  * Shape: one partial-aggregated groupBy(user) for step 1, then per
  * later step ONE co-keyed left join (user ↔ that step's events) +
  * one groupBy(user) — every exchange is on the SAME user key, so a
  * user-bucketed landing runs the whole chain with zero exchanges and
  * AQE reuses the key partitioning between steps. Hot users (bots)
  * fan out only to their own events and collapse map-side in the
  * immediate partial aggregation — no windows over event history.
  * The final summary is |steps| rows off one 1-row aggregate.
  *
  * Per-step progress lives in nullable step times: a user who never
  * reaches step i has t_i NULL, and every later comparison against
  * NULL is false — the chain degrades without special cases.
  */
object Funnel {

  /** Summary funnel: (step_idx, step, n_users, conv_micro) — one row
    * per step, conv_micro relative to the previous step (10⁶ for the
    * first). */
  def orderedFunnel(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], maxGapSeconds: Option[Long] = None): DataFrame = {
    val times = stepTimes(events, userCol, typeCol, tsCol, steps,
      maxGapSeconds)
    val counts = times.agg(
      steps.indices.map(i => count(col(s"t_$i")).as(s"n_$i")).head,
      steps.indices.map(i => count(col(s"t_$i")).as(s"n_$i")).tail: _*)
    val rows = steps.zipWithIndex.map { case (st, i) =>
      // exact integer cross-multiplication (counts are int64, so
      // n·10⁶ stays exact far past any user population; the double
      // spelling would only be exact to ~9e9 users)
      val conv =
        if (i == 0) lit(1000000L)
        else expr(s"n_$i * 1000000 DIV greatest(n_${i - 1}, 1)")
      struct(lit(i + 1).as("step_idx"), lit(st).as("step"),
        col(s"n_$i").as("n_users"), conv.as("conv_micro"))
    }
    counts.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Per-user first-touch step times: (user, t_0 … t_(k-1)), t_i NULL
    * once the user's chain breaks — the analyst frame [[orderedFunnel]]
    * summarizes, exposed for segment drill-downs. */
  def stepTimes(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, s"need at least 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      s"steps must be distinct, got $steps")
    maxGapSeconds.foreach(g =>
      require(g > 0L, s"maxGapSeconds must be positive, got $g"))
    val u = col(userCol)
    var cur: DataFrame = events.filter(col(typeCol) === steps.head)
      .groupBy(u.as("user")).agg(min(col(tsCol)).as("t_0"))
    for (i <- 1 until steps.size) {
      val nxt = events.filter(col(typeCol) === steps(i))
        .select(u.as("user"), col(tsCol).as("__ts"))
      val carried: Seq[Column] =
        (0 until i).map(j => min(col(s"t_$j")).as(s"t_$j"))
      val prev = col(s"t_${i - 1}")
      // the deadline compares in exact MICROSECONDS (a seconds-cast
      // truncates sub-second parts and moves the boundary by up to 1 s
      // against any engine that keeps them)
      val qualifies = maxGapSeconds match {
        case Some(g) => col("__ts") > prev &&
          unix_micros(col("__ts")) <= unix_micros(prev) + lit(g * 1000000L)
        case None => col("__ts") > prev
      }
      val stepMin = min(when(qualifies, col("__ts"))).as(s"t_$i")
      cur = cur.join(nxt, Seq("user"), "left")
        .groupBy("user")
        .agg(carried.head, (carried.tail :+ stepMin): _*)
    }
    cur
  }
}
