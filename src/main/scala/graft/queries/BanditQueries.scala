package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.6 sequential-decision wave: a UCB1 bandit backtest over
  * the event-type daily-revenue panel — "had we allocated each day's
  * budget by UCB1 over the five channels, what would we have
  * collected vs the best fixed channel?" The counterfactual replay
  * every allocation platform runs before going live.
  *
  * UCB1 (Auer, Cesa-Bianchi & Fischer 2002): after an init round
  * playing each arm once (alphabetical order), day t plays
  * argmax_a x̄_a + √(2·ln t / n_a), first-in-order on ties. The fold
  * is genuinely sequential, so it runs as the pinned float fold of
  * the q_holt_winters convention — Spark folds a sorted day array
  * with a 10-field per-arm state; the DuckDB oracle replays the SAME
  * recurrence as a Scala-GENERATED recursive CTE in which every UCB
  * expression is inlined textually (identical IEEE op trees). Regret
  * is reported against the best-fixed-arm hindsight total.
  *
  * Scale shape: the (type, day) preagg collapses any event volume;
  * the per-day arm pivot is a 5-way conditional agg; the fold runs
  * over the calendar-bounded day sequence (the documented
  * bounded-fold contract — the sequential part never scales with
  * data, only with days). */
object BanditQueries {

  private val arms = Seq("click", "error", "purchase", "signup", "view")

  private val qUcbBacktest = BoundQuery("q_ucb_backtest", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", arms)
      .agg(sumCents(col("value")))
      .na.fill(0L, arms)
    val rewards = daily.select(col("day") +: arms.zipWithIndex.map {
      case (a, i) => (col(a).cast("double") / lit(100.0)).as(s"r${i + 1}") }: _*)
    val nF = arms.indices.map(i => s"n${i + 1}")
    val sF = arms.indices.map(i => s"s${i + 1}")
    def st(ns: Seq[Column], ss: Seq[Column], t: Column, tot: Column) =
      struct(ns.zip(nF).map { case (c, f) => c.as(f) } ++
        ss.zip(sF).map { case (c, f) => c.as(f) } ++
        Seq(t.as("t"), tot.as("tot")): _*)
    val fold = aggregate(col("seq"),
      st(Seq.fill(5)(lit(0.0)), Seq.fill(5)(lit(0.0)), lit(0L), lit(0.0)),
      (acc, e) => {
        val t = acc("t") + 1L
        val rs = arms.indices.map(i => e(s"r${i + 1}"))
        val ns = arms.indices.map(i => acc(nF(i)))
        val ss = arms.indices.map(i => acc(sF(i)))
        // init round: day t <= 5 plays arm t (alphabetical)
        val ucb = arms.indices.map(i =>
          ss(i) / ns(i) + sqrt(lit(2.0) * log(t.cast("double")) / ns(i)))
        // first-wins argmax: arm i picked iff its UCB >= all later arms
        // and strictly beats no earlier arm that also dominates — the
        // standard chain: i wins if ucb_i >= ucb_j for all j > i and
        // ucb_i > ucb_j for... simplified to >= against later, < against
        // none earlier by evaluating in order
        def wins(i: Int): Column =
          (0 until i).map(j => ucb(i) > ucb(j)).foldLeft(
            (i + 1 until 5).map(j => ucb(i) >= ucb(j))
              .foldLeft(lit(true))(_ && _))(_ && _)
        val pickGrown = arms.indices.map(i =>
          when(t <= 5L, when(t === (i + 1).toLong, lit(true))
            .otherwise(lit(false))).otherwise(wins(i)))
        val newNs = arms.indices.map(i =>
          when(pickGrown(i), ns(i) + lit(1.0)).otherwise(ns(i)))
        val newSs = arms.indices.map(i =>
          when(pickGrown(i), ss(i) + rs(i)).otherwise(ss(i)))
        val gained = arms.indices.map(i =>
          when(pickGrown(i), rs(i)).otherwise(lit(0.0))).reduce(_ + _)
        st(newNs, newSs, t, acc("tot") + gained)
      })
    // hindsight totals from EXACT cents (a double sum would be
    // accumulation-order dependent across engines)
    val hs = arms.zipWithIndex.map { case (a, i) =>
      (sum(col(a)).cast("double") / lit(100.0)).as(s"h${i + 1}") }
    val hind = daily.agg(hs.head, hs.tail: _*)
    val folded = rewards
      .agg(sort_array(collect_list(struct(col("day") +:
        arms.indices.map(i => col(s"r${i + 1}")): _*))).as("seq"))
      .select(fold.as("st"))
      .crossJoin(broadcast(hind))
      .withColumn("best_fixed",
        greatest(arms.indices.map(i => col(s"h${i + 1}")): _*))
    folded.select(explode(array(arms.zipWithIndex.map { case (a, i) =>
        struct(lit(a).as("arm"),
          col(s"st.n${i + 1}").cast("long").as("n_played"),
          round(col(s"st.s${i + 1}"), 6).as("arm_reward"),
          round(col("st.tot"), 6).as("collected"),
          round(col("best_fixed"), 6).as("best_fixed"),
          round(col("best_fixed") - col("st.tot"), 6).as("regret"))
      }: _*)).as("r"))
      .select("r.arm", "r.n_played", "r.arm_reward", "r.collected",
        "r.best_fixed", "r.regret")
      .orderBy("arm")
  }, Some {
    val ucbE = (i: Int) =>
      s"(r.s$i / r.n$i + sqrt(2.0 * ln(CAST(r.t + 1 AS DOUBLE)) / r.n$i))"
    def winsE(i: Int): String = {
      val later = (i + 1 to 5).map(j => s"${ucbE(i)} >= ${ucbE(j)}")
      val earlier = (1 until i).map(j => s"${ucbE(i)} > ${ucbE(j)}")
      (later ++ earlier).mkString("(", " AND ", ")") match {
        case "()" => "TRUE"
        case s0   => s0
      }
    }
    val pickE = (i: Int) =>
      s"(CASE WHEN r.t + 1 <= 5 THEN r.t + 1 = $i ELSE ${winsE(i)} END)"
    val stepN = (1 to 5).map(i =>
      s"CASE WHEN ${pickE(i)} THEN r.n$i + 1.0 ELSE r.n$i END AS n$i")
    val stepS = (1 to 5).map(i =>
      s"CASE WHEN ${pickE(i)} THEN r.s$i + s.r$i ELSE r.s$i END AS s$i")
    val gained = (1 to 5).map(i =>
      s"CASE WHEN ${pickE(i)} THEN s.r$i ELSE 0.0 END").mkString(" + ")
    s"""
    WITH RECURSIVE daily AS (
      SELECT CAST(ts AS DATE) AS day,
        ${arms.zipWithIndex.map { case (a, i) =>
          s"""CAST(sum(CASE WHEN event_type = '$a'
                THEN CAST(round(value*100, 0) AS BIGINT) ELSE 0 END)
                AS DOUBLE) / 100.0 AS r${i + 1}""" }.mkString(",\n        ")}
      FROM events GROUP BY 1),
    ser AS (
      SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
        ${(1 to 5).map(i => s"r$i").mkString(", ")}
      FROM daily),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM ser),
    rec AS (
      SELECT t,
        ${(1 to 5).map(i =>
          s"CAST(CASE WHEN t = $i THEN 1.0 ELSE 0.0 END AS DOUBLE) AS n$i")
          .mkString(", ")},
        ${(1 to 5).map(i =>
          s"CAST(CASE WHEN t = $i THEN r$i ELSE 0.0 END AS DOUBLE) AS s$i")
          .mkString(", ")},
        r1 AS tot
      FROM ser WHERE t = 1
      UNION ALL
      SELECT s.t, ${stepN.mkString(",\n        ")},
        ${stepS.mkString(",\n        ")},
        r.tot + ($gained) AS tot
      FROM rec r JOIN ser s ON s.t = r.t + 1),
    fin AS (SELECT * FROM rec JOIN nn ON rec.t = nn.n_days),
    hind AS (
      SELECT greatest(${arms.zipWithIndex.map { case (a, i) =>
        s"""CAST(sum(CASE WHEN event_type = '$a'
             THEN CAST(round(value*100, 0) AS BIGINT) ELSE 0 END)
             AS DOUBLE) / 100.0""" }.mkString(", ")})
        AS best_fixed
      FROM events),
    armrows AS (
      ${arms.zipWithIndex.map { case (a, i) =>
        s"""SELECT '$a' AS arm, CAST(n${i + 1} AS BIGINT) AS n_played,
             round(s${i + 1}, 6) AS arm_reward, round(tot, 6) AS collected,
             round(best_fixed, 6) AS best_fixed,
             round(best_fixed - tot, 6) AS regret
           FROM fin CROSS JOIN hind""" }.mkString("\n      UNION ALL\n      ")})
    SELECT * FROM armrows ORDER BY arm
  """})

  val all: Seq[BoundQuery] = Seq(qUcbBacktest)
}
