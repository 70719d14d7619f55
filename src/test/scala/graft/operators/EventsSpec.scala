package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class EventsSpec extends SparkSpec {

  test("routeCounts drops non-whitelisted types and keeps two categories") {
    val rows = Events.routeCounts(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("category")).sorted.toSeq === Seq("conversion", "engagement"))
    val total = rows.map(_.getAs[Long]("n_events")).sum
    val all = Tables.events(spark, sfDir).count()
    val errors = Tables.events(spark, sfDir).filter(col("event_type") === "error").count()
    assert(total === all - errors)
  }

  test("latestPerUser returns one row per user with the max event id") {
    val df = Events.latestPerUser(spark, sfDir)
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(df.count() === users)
    val expected = Tables.events(spark, sfDir)
      .groupBy("user_id").agg(max("event_id").as("m")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("m")).toMap
    Events.latestPerUser(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("last_event_id") === expected(r.getAs[Long]("user_id")))
    }
  }

  test("ema matches an in-memory recurrence per user") {
    val byUser = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "value").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .groupBy(_._1)
    val expected = byUser.map { case (u, rows) =>
      val vs = rows.sortBy(_._2).map(_._3)
      u -> vs.tail.foldLeft(vs.head)((acc, v) => acc * 0.8 + v * 0.2)
    }
    Events.ema(spark, sfDir).collect().foreach { r =>
      val u = r.getAs[Long]("user_id")
      val got = r.getAs[Double]("ema")
      assert(math.abs(got - expected(u)) < 1e-3, s"user $u: $got vs ${expected(u)}")
    }
  }

  test("sessionize conserves events and session gaps exceed the threshold") {
    val rows = Events.sessionize(spark, sfDir).collect()
    val totalEvents = rows.map(_.getAs[Long]("n_events")).sum
    assert(totalEvents === Tables.events(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sessions") >= 1)
      assert(r.getAs[Long]("max_session_events") <= r.getAs[Long]("n_events"))
    }
  }

  test("daily sessionize conserves events and only ever splits sessions") {
    val daily = Events.sessionizeDaily(spark, sfDir).collect()
    assert(daily.map(_.getAs[Long]("n_events")).sum ===
      Tables.events(spark, sfDir).count())
    // re-keying by day can only CUT sessions (at midnight), never merge:
    // per user, daily session count >= the gap-rule session count
    val byUserDaily = daily.groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_sessions")).sum).toMap
    Events.sessionize(spark, sfDir).collect().foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(byUserDaily(u) >= r.getAs[Long]("n_sessions"),
        s"user $u: day-keyed sessions fewer than gap-rule sessions")
    }
  }

  test("runningTotal is monotonically nondecreasing") {
    val rows = Events.runningTotal(spark, sfDir).collect()
    val cums = rows.map(_.getAs[Double]("cumulative_value"))
    assert(cums.sameElements(cums.sorted))
  }

  test("cube grand total covers every event") {
    val rows = Events.cubeStats(spark, sfDir).collect()
    val grand = rows.find(r =>
      r.getAs[String]("dow") == "ALL" && r.getAs[String]("event_type") == "ALL").get
    assert(grand.getAs[Long]("n_events") === Tables.events(spark, sfDir).count())
  }

  test("cohort retention: week zero contains every user") {
    val rows = Events.cohortRetention(spark, sfDir).collect()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    val weekZero = rows.filter(_.getAs[Long]("weeks_since") == 0L)
      .map(_.getAs[Long]("n_active_users")).sum
    assert(weekZero === users, "every user is active in their own cohort week")
  }

  test("decimal totals are exact: sum of per-type totals equals global total") {
    val rows = Events.decimalTotals(spark, sfDir).collect()
    val sumOfTotals = BigDecimal(rows.map(_.getAs[Double]("total")).sum)
    val global = Tables.events(spark, sfDir)
      .agg(round(sum(col("value").cast("decimal(38,6)")).cast("double"), 2)).collect()(0).getDouble(0)
    assert((sumOfTotals - BigDecimal(global)).abs < BigDecimal(0.05))
  }

  test("asof: matched signup precedes the purchase") {
    Events.asofSignup(spark, sfDir).collect().foreach { r =>
      val sig = r.getAs[java.lang.Long]("last_signup_event_id")
      if (sig != null) assert(sig <= r.getAs[Long]("event_id"))
    }
  }

  test("hll approximate distinct stays within 5% of exact") {
    val approx = Events.hllUsers(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("approx_users")).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("u")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("u")).toMap
    exact.foreach { case (t, e) =>
      val a = approx(t)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$t: approx $a vs exact $e")
    }
  }

  test("moving average stays within the daily min/max envelope") {
    val rows = Events.movingAvg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val dailies = rows.map(_.getAs[Double]("daily_value"))
    rows.foreach { r =>
      assert(r.getAs[Double]("ma7") >= dailies.min - 1e-9)
      assert(r.getAs[Double]("ma7") <= dailies.max + 1e-9)
    }
  }

  test("ema handles one user owning a million events without per-key arrays") {
    import spark.implicits._
    // A single skewed key: the closed-form window path streams through a
    // spillable sort + incremental agg (a collect_list would pin the whole
    // history in one row).
    val skewed = spark.range(1000000L)
      .select(lit(7L).as("user_id"), col("id").as("event_id"),
        (col("id") % 100).cast("double").as("value"))
    val row = Events.emaOf(skewed).collect()
    assert(row.length === 1)
    assert(row(0).getAs[Long]("n_events") === 1000000L)
    // the tail dominates: ema of (..., 97, 98, 99) with alpha .2 sits high
    val ema = row(0).getAs[Double]("ema")
    assert(ema > 90 && ema < 100, s"unexpected ema $ema")
  }

  test("approx quantile sketch stays within rank-error bounds of exact") {
    import org.apache.spark.sql.functions._
    val approx = Events.valueQuantilesApprox(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        Seq(r.getAs[Double]("p50"), r.getAs[Double]("p95"), r.getAs[Double]("p99"))).toMap
    val values = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(_.getDouble(1)).sorted }
    // GK accuracy 1000 => rank error <= 1/1000; allow 2/1000 for the
    // truncation at the output edge
    approx.foreach { case (t, qs) =>
      val sorted = values(t)
      val n = sorted.length
      qs.zip(Seq(0.5, 0.95, 0.99)).foreach { case (est, p) =>
        val rank = sorted.count(_ <= est).toDouble / n
        assert(math.abs(rank - p) <= 0.002 + 1.0 / n,
          s"$t p$p: est $est has rank $rank")
      }
    }
  }

  test("rolling DAU fans out via a projection, not a range join") {
    val df = Events.rollingDau(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every trailing-7d count >= that day's exact daily distinct count
    val daily = Events.dailyStats(spark, sfDir).collect()
      .groupBy(_.getAs[String]("day"))
    rows.foreach { r =>
      val day = r.getAs[String]("day")
      daily.get(day).foreach { _ =>
        assert(r.getAs[Long]("dau_7d") > 0)
      }
    }
    // scale shape: the day fanout must be a Generate (sequence explode)
    // over the distinct-pair frame; the only join is the broadcast 1-row
    // bounds crop — never a per-day range join over events
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"expected sequence-explode fanout:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffled join expected:\n$plan")
  }

  test("pivotTypes counts reconcile with total events") {
    val df = Events.pivotTypes(spark, sfDir)
    val total = df.select(
      (col("click") + col("error") + col("purchase") + col("signup") + col("view")).as("s"))
      .agg(sum("s")).collect()(0).getLong(0)
    assert(total === Tables.events(spark, sfDir).count())
  }
}
