package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkSuite {

  test("q1 aggregates per (returnflag, linestatus) with positive sums") {
    val r = Relational.q1(spark, sf).collect()
    assert(r.length === 6)
    assert(r.forall(row => row.getAs[Double]("sum_qty") > 0))
    assert(r.forall(row => row.getAs[Long]("count_order") > 0))
  }

  test("q2 covers all 25 nations; revenue positive") {
    val r = Relational.q2(spark, sf).collect()
    assert(r.length === 25)
    assert(r.forall(_.getAs[Double]("revenue") > 0))
  }

  test("q3 returns exactly 10 orders sorted by revenue desc") {
    val revs = Relational.q3(spark, sf).collect().map(_.getAs[Double]("revenue"))
    assert(revs.length === 10)
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q11 session counts sum to total events") {
    val total = Tables.events(spark, sf).count()
    val sessions = Relational.q11(spark, sf)
    assert(sessions.agg(sum("n_events")).head().getLong(0) === total)
    // q17 cube: the grand-total grouping set equals the table count
    val cube = operators.Relational.q17(spark, sf)
    val grand = cube.filter(col("gid") === 3).head()
    assert(grand.getAs[Long]("n_items") === Tables.lineitem(spark, sf).count())
    assert(cube.select("gid").distinct().count() === 4) // full lattice
    // sessions are disjoint in time per user: start <= end everywhere
    assert(sessions.filter(col("start_ms") > col("end_ms")).count() === 0)
  }

  test("q14 as-of: matched click is at or before the purchase") {
    val bad = Relational.q14(spark, sf)
      .filter(col("click_ms").isNotNull && col("click_ms") > col("purchase_ms"))
    assert(bad.count() === 0)
  }

  test("q15 HLL error within 10% of exact; the gated bound claim holds") {
    val r = Relational.q15Estimates(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val approx = row.getAs[Long]("approx_users").toDouble
      val exact = row.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact < 0.1)
    }
    // the registered (oracle-gated) form: every bound_ok must be true —
    // the DuckDB twin asserts literal TRUE, so a false here IS the
    // hash-gate failure surfaced early
    val gated = Relational.q15(spark, sf).collect()
    assert(gated.forall(_.getAs[Boolean]("bound_ok")),
      "HLL estimate escaped the certified 60000 ppm envelope")
  }

  test("q16 custom as-of operator is planned, codegen'd, and matches the union+window formulation") {
    val q16 = Relational.q16(spark, sf)
    val a = q16.collect().map(_.toSeq)
    // AFTER execution (AQE final plan): the as-of join must sit INSIDE
    // a WholeStageCodegen stage — the `*(n)` marker on the node. The
    // interpreted doExecute remains only for variable-width key/time.
    val plan = q16.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(plan).isDefined,
      s"as-of join fell out of whole-stage codegen:\n$plan")
    val b = Relational.q14(spark, sf).collect().map(_.toSeq)
    assert(a.length === b.length)
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("custom as-of codegen fast path orders double times correctly (incl. negatives)") {
    import spark.implicits._
    // doubles go through the sortable-bits transform in BOTH the
    // interpreted extractor and the generated code — negative times
    // are where a naive doubleToLongBits comparison inverts
    val trades = Seq((1L, -0.5, 10), (1L, 0.25, 20), (2L, -3.0, 30))
      .toDF("k", "t", "trade_id")
    val quotes = Seq((1L, -1.5, 1.0), (1L, -0.25, 2.0), (1L, 0.25, 3.0), (2L, -2.5, 4.0))
      .toDF("rk", "rt", "px")
    val r = graft.plans.AsOf.join(trades, quotes, "k", "rk", "t", "rt")
    assert("""\*\(\d+\) AsOfJoin""".r
      .findFirstIn({ r.collect(); r.queryExecution.executedPlan.toString }).isDefined)
    val got = r.select("trade_id", "px").collect()
      .map(x => x.getInt(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(got === Map(
      10 -> Some(1.0), // k=1 t=-0.5: latest rt <= -0.5 is -1.5 (−0.25 is later)
      20 -> Some(3.0), // t=0.25 ← rt=0.25 (<= is inclusive)
      30 -> None))     // k=2 t=-3.0: only rt=-2.5 exists, which is after
  }

  test("custom as-of join handles string keys and empty matches") {
    import spark.implicits._
    val trades = Seq(("aapl", 10L, 1), ("aapl", 25L, 2), ("msft", 5L, 3), ("goog", 7L, 4))
      .toDF("sym", "t", "trade_id")
    val quotes = Seq(("aapl", 8L, 100.0), ("aapl", 25L, 101.0), ("msft", 9L, 50.0))
      .toDF("q_sym", "q_t", "px")
    val r = graft.plans.AsOf.join(trades, quotes, "sym", "q_sym", "t", "q_t")
      .select("trade_id", "px").collect()
      .map(x => x.getInt(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(r === Map(
      1 -> Some(100.0),  // aapl@10 ← quote@8
      2 -> Some(101.0),  // aapl@25 ← quote@25 (<= is inclusive)
      3 -> None,         // msft@5: only later quote exists
      4 -> None))        // goog: no quotes at all
  }

  test("q6 predicate pushdown reaches the parquet scan") {
    val plan = Relational.q6(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"))
  }

  test("q18 quartiles are ordered and approx_percentile stays within its bound of exact") {
    val r = Relational.q18(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (p25, p50, p75) = (row.getAs[Double]("price_p25"),
        row.getAs[Double]("price_p50"), row.getAs[Double]("price_p75"))
      assert(p25 <= p50 && p50 <= p75)
    }
    // scale path: the fixed-memory sketch must land within rank-error
    // accuracy of the exact baseline (accuracy=100 → ±1% of rank;
    // translate to value space via a generous 5% relative bound).
    val both = Tables.lineitem(spark, sf)
      .agg(expr("percentile(l_extendedprice, 0.5)").as("exact"),
        expr("approx_percentile(l_extendedprice, 0.5, 100)").as("approx"))
      .head()
    val (exact, approx) = (both.getAs[Double]("exact"), both.getAs[Double]("approx"))
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("q20 range window equals the brute-force time self-join") {
    val got = Relational.q20(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getDouble(4))).toMap
    val p = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = p.map { case (u, e, ms, _) =>
      val in = p.filter(q => q._1 == u && q._3 <= ms && q._3 >= ms - 2592000000L)
      (u, e) -> (in.length.toLong, in.map(q => math.rint(q._4 * 100) / 100).sum)
    }.toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, (n, s)) =>
      assert(n === want(k)._1, s"count at $k")
      assert(math.abs(s - want(k)._2) < 1e-6, s"sum at $k")
    }
  }

  test("q24 daily audience: cumulative users = running sum of new users = total distinct") {
    val rows = Relational.q24(spark, sf).collect()
    assert(rows.nonEmpty)
    // cum_users is the running sum of new_users, ending at the corpus total
    var running = 0L
    rows.foreach { r =>
      running += r.getAs[Long]("new_users")
      assert(r.getAs[Long]("cum_users") === running)
      assert(r.getAs[Long]("active_users") <= r.getAs[Long]("cum_users"))
      assert(r.getAs[Long]("new_users") <= r.getAs[Long]("active_users"))
    }
    val totalUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(running === totalUsers, "new-user counts partition the user set")
  }

  test("q25 churned customers equals a direct max-order-date formulation") {
    val got = Relational.q25(spark, sf).collect()
      .map(r => r.getAs[String]("c_mktsegment") -> r.getAs[Long]("n_customers")).toMap
    val c = Tables.customer(spark, sf)
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("a"))
      .collect()(0).getAs[Double]("a")
    val lastOrder = Tables.orders(spark, sf).groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_dt"))
    val want = c.join(lastOrder, col("c_custkey") === col("o_custkey"), "left")
      .filter(col("c_acctbal") > avgBal &&
        (col("last_dt").isNull || col("last_dt") < to_timestamp(lit("2001-01-01"))))
      .groupBy(col("c_mktsegment")).count().collect()
      .map(r => r.getAs[String]("c_mktsegment") -> r.getAs[Long]("count")).toMap
    assert(got === want)
    assert(got.values.sum > 0, "the churn window is non-vacuous at this SF")
  }

  test("q26 keeps ALL suppliers tied at the max revenue") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q26").toString
    val inWin = java.sql.Timestamp.valueOf("1996-02-01 00:00:00")
    // suppliers 1 and 2 tie exactly on decimal revenue; 3 trails
    Seq(
      (1L, 100.00, 0.00, inWin), (2L, 50.00, 0.00, inWin), (2L, 50.00, 0.00, inWin),
      (3L, 99.99, 0.00, inWin))
      .toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, "S1"), (2L, "S2"), (3L, "S3")).toDF("s_suppkey", "s_name")
      .write.parquet(s"$dir/supplier.parquet")
    val r = Relational.q26(spark, dir).collect()
    assert(r.map(_.getAs[Long]("s_suppkey")).toSeq === Seq(1L, 2L))
    assert(r.forall(_.getAs[Double]("total_revenue") === 100.0))
  }

  test("q21 hand-computed: exactly the NATION_1<->NATION_2 flows, both directions, decoys out") {
    // guards the nation-pair CONSTANTS, not just the join shape: impl
    // and oracle SQL change in lockstep, so a find-and-replace
    // casualty (the round-9 NATION_12 drift) is invisible to the
    // driver gate — only a hand-computed expectation catches it
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q21").toString
    def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")
    Seq((1L, "NATION_1"), (2L, "NATION_2"), (12L, "NATION_12"))
      .toDF("n_nationkey", "n_name").write.parquet(s"$dir/nation.parquet")
    Seq((1L, 1L), (2L, 2L), (12L, 12L))
      .toDF("s_suppkey", "s_nationkey").write.parquet(s"$dir/supplier.parquet")
    Seq((1L, 1L), (2L, 2L), (12L, 12L))
      .toDF("c_custkey", "c_nationkey").write.parquet(s"$dir/customer.parquet")
    Seq((101L, 2L), (102L, 1L), (103L, 12L))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
    Seq(
      (101L, 1L, 100.00, 0.00, ts("1996-06-01")),  // N1 -> N2, 1996: in
      (102L, 2L, 200.00, 0.10, ts("1997-03-01")),  // N2 -> N1, 1997: in (rev 180)
      (103L, 1L, 800.00, 0.00, ts("1996-07-01")),  // N1 -> N12: ONLY the drifted pair counts this
      (101L, 12L, 400.00, 0.00, ts("1996-08-01")), // N12 -> N2: out under both
      (102L, 1L, 50.00, 0.00, ts("1995-01-01")))   // out of the date window
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = Relational.q21(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      ("NATION_1", "NATION_2", 1996L, 100.0, 1L),
      ("NATION_2", "NATION_1", 1997L, 180.0, 1L)),
      "pair constants drifted: q21 must count NATION_1<->NATION_2 and nothing else")
  }

  test("q27 gates on exactly-one flagged supplier of a multi-supplier F order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q27").toString
    Seq(
      (10L, 1L, "R"), (10L, 2L, "N"),             // qualifies: supp 1 sole-flagged
      (11L, 1L, "R"), (11L, 2L, "R"),             // two flagged → out
      (12L, 3L, "R"),                             // single-supplier → out
      (13L, 1L, "R"), (13L, 2L, "N"),             // order not 'F' → out
      (14L, 2L, "R"), (14L, 1L, "N"), (14L, 3L, "N")) // qualifies: supp 2
      .toDF("l_orderkey", "l_suppkey", "l_returnflag")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((10L, "F"), (11L, "F"), (12L, "F"), (13L, "O"), (14L, "F"))
      .toDF("o_orderkey", "o_orderstatus")
      .write.parquet(s"$dir/orders.parquet")
    val r = Relational.q27(spark, dir).collect()
      .map(row => row.getAs[Long]("l_suppkey") -> row.getAs[Long]("n_orders"))
    assert(r.toSeq === Seq(1L -> 1L, 2L -> 1L))
  }

  test("q28 counts zero-order customers in the histogram's zero bucket") {
    val r = Relational.q28(spark, sf).collect()
      .map(row => row.getAs[Long]("n_orders") -> row.getAs[Long]("n_customers")).toMap
    val nCust = Tables.customer(spark, sf).count()
    assert(r.values.sum === nCust, "every customer lands in exactly one bucket")
    val withOrders = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey").distinct().count()
    assert(r.getOrElse(0L, 0L) === nCust - withOrders, "zero bucket = customers with no qualifying orders")
  }

  test("q31 equals brute force (ties kept), one fact scan, no nested-loop join") {
    val plan = Relational.q31(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert("lineitem".r.findAllIn(plan).size == 1, s"fact must be scanned once:\n$plan")

    val parts = Tables.part(spark, sf)
      .filter(col("p_type") === "ECONOMY" && col("p_size") <= 25)
      .collect().map(r => r.getAs[Long]("p_partkey") -> r.getAs[String]("p_brand")).toMap
    val nat = Tables.nation(spark, sf).collect()
      .map(r => r.getAs[Int]("n_nationkey") -> (r.getAs[String]("n_name"), r.getAs[Int]("n_regionkey"))).toMap
    val euRegion = Tables.region(spark, sf).filter(col("r_name") === "EUROPE")
      .head().getAs[Int]("r_regionkey")
    val eu = Tables.supplier(spark, sf).collect().flatMap { r =>
      val (nname, rkey) = nat(r.getAs[Int]("s_nationkey"))
      if (rkey == euRegion)
        Some(r.getAs[Long]("s_suppkey") -> (r.getAs[String]("s_name"), r.getAs[Double]("s_acctbal"), nname))
      else None
    }.toMap
    val offers = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(t => parts.contains(t._1) && eu.contains(t._2))
      .groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.map(_._3).min }
    val minPerPart = offers.groupBy(_._1._1).map { case (p, m) => p -> m.values.min }
    val want = offers.collect { case ((p, su), c) if c == minPerPart(p) =>
      val (sname, bal, nname) = eu(su)
      (bal, sname, nname, p, parts(p), c)
    }.toSeq
      .sortBy { case (bal, sname, nname, p, _, _) => (-bal, nname, sname, p) }
      .take(100)
    val got = Relational.q31(spark, sf).collect().map(r =>
      (r.getDouble(0), r.getString(1), r.getString(2), r.getLong(3), r.getString(4), r.getDouble(5))).toSeq
    assert(got === want)
    // ties are a real (not vacuous) part of the contract: at least one
    // part must keep >1 suppliers OR every min be unique — just assert
    // the multiset of parts matches brute force, which already covers it.
    assert(got.map(_._4).toSet === want.map(_._4).toSet)
  }

  test("q32 funnel equals brute-force chained timestamps and re-uses one user shuffle") {
    val plan = Relational.q32(spark, sf).queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      s"window + per-user agg must share ONE user_id shuffle:\n$plan")

    val h = 7L * 24 * 3600 * 1000
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val chains = byUser.map { case (_, es) =>
      val t1 = es.filter(_._2 == "view").map(_._3).minOption
      val t2 = t1.flatMap(a => es.filter(e => e._2 == "click" && e._3 > a && e._3 <= a + h)
        .map(_._3).minOption)
      val t3 = t2.flatMap(a => es.filter(e => e._2 == "purchase" && e._3 > a && e._3 <= a + h)
        .map(_._3).minOption)
      (t1, t2, t3)
    }.toSeq
    val (nU, nV, nC, nP) = (chains.size.toLong, chains.count(_._1.isDefined).toLong,
      chains.count(_._2.isDefined).toLong, chains.count(_._3.isDefined).toLong)
    val got = Relational.q32(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, "view", nV, nV * 1000000L / nU, nV * 1000000L / nU),
      (2L, "click", nC, nC * 1000000L / nV, nC * 1000000L / nU),
      (3L, "purchase", nP, nP * 1000000L / nC, nP * 1000000L / nU)))
    assert(nV > 0 && nC > 0 && nP > 0, "funnel stages must be non-vacuous at this SF")
  }

  test("q33 equals brute force: parts above the mean-multiple value cut") {
    // (the global total being a 1-row agg, not an empty-spec window,
    // is enforced for every query by PlanLintSpec's allowlist)
    val natSupp = Tables.supplier(spark, sf).filter(col("s_nationkey") === 20)
      .collect().map(_.getAs[Long]("s_suppkey")).toSet
    val perPart = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount").collect()
      .filter(r => natSupp.contains(r.getLong(1)))
      .groupBy(_.getLong(0)).map { case (p, rs) =>
        p -> rs.map { r =>
          (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
            * (BigDecimal(1) - BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
        }.sum
      }
    val cut = 2.5 * perPart.values.sum.toDouble / perPart.size
    val want = perPart.collect { case (p, v) if v.toDouble > cut => (p, v.toDouble) }
      .toSeq.sortBy { case (p, v) => (-v, p) }
    val got = Relational.q33(spark, sf).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === want)
    assert(got.nonEmpty && got.size < perPart.size, "threshold must actually select")
  }

  test("q34 equals brute force: suppliers dominating >30% of a part's 1995 volume") {
    val pairs = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate").collect()
      .filter { r =>
        val y = r.getAs[java.time.LocalDateTime]("l_shipdate").getYear; y == 1995 }
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) => k -> rs.map(r =>
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum }
    val partTot = pairs.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val domSupp = pairs.collect {
      case ((p, s), q) if q.toDouble > 0.3 * partTot(p).toDouble => s
    }.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val names = Tables.supplier(spark, sf).collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[String]("s_name")).toMap
    val want = domSupp.toSeq.map { case (s, n) => (s, names(s), n) }
      .sortBy { case (s, _, n) => (-n, s) }.take(100)
    val got = Relational.q34(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === want)
    assert(got.nonEmpty, "dominance gate must be non-vacuous at this SF")
  }

  test("q35 cohort matrix equals brute force and offset-0 counts cohort sizes") {
    val rows = Tables.orders(spark, sf).select("o_custkey", "o_orderdate").collect()
      .map { r =>
        val d = r.getAs[java.time.LocalDateTime]("o_orderdate")
        (r.getLong(0), d.getYear * 12 + d.getMonthValue - 1)
      }
    val cohort = rows.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).min }
    val cells = rows.map { case (c, m) => (cohort(c), m - cohort(c), c) }.distinct
    val want = cells.groupBy(t => (t._1, t._2)).map { case ((cm, off), xs) =>
      (f"${cm / 12}%04d-${cm % 12 + 1}%02d", off.toLong, xs.size.toLong)
    }.toSeq.sorted
    val got = Relational.q35(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
    // offset 0 is definitionally the cohort size
    val sizes = cohort.groupBy(_._2).map { case (m, xs) =>
      f"${m / 12}%04d-${m % 12 + 1}%02d" -> xs.size.toLong }
    got.filter(_._2 == 0L).foreach { case (cm, _, n) => assert(n === sizes(cm)) }
  }

  test("q36 basket pairs equal brute force; plan has no join and a top-k sort") {
    val plan = Relational.q36(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"pair expansion must not self-join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-25 must not global-sort:\n$plan")

    val items = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val want = items.groupBy(_._1).values
      .filter(b => b.size >= 2 && b.size <= 100)
      .flatMap { b =>
        val ps = b.map(_._2).sorted
        for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
      }
      .groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.size.toLong) }
      .toSeq.sortBy { case (p1, p2, n) => (-n, p1, p2) }.take(25)
    val got = Relational.q36(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
  }

  test("q19 salted join result equals the plain join+agg") {
    val salted = Relational.q19(spark, sf).collect().map(_.toSeq)
    val li = Tables.lineitem(spark, sf)
    val supp = Tables.supplier(spark, sf)
    val n = Tables.nation(spark, sf)
    val plain = li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name")).collect().map(_.toSeq)
    assert(salted.toSeq === plain.toSeq)
  }

  test("q37 equals brute force and scans lineitem exactly once (decorrelated HAVING)") {
    val q = Relational.q37(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    // the decorrelation's whole point: the per-order agg serves both
    // the HAVING filter and the output sum — a correlated or semi-join
    // + re-aggregate form would scan the fact twice
    assert("lineitem".r.findAllIn(plan).size == 1, s"fact must be scanned once:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))

    val qty = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity").collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1)).setScale(2)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum.toDouble }
      .filter(_._2 > 250.0)
    val cust = Tables.customer(spark, sf).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[String]("c_name")).toMap
    val want = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ms"),
        col("o_totalprice")).collect()
      .flatMap { r =>
        qty.get(r.getLong(0)).map(t =>
          (cust(r.getLong(1)), r.getLong(1), r.getLong(0), r.getLong(2), r.getDouble(3), t))
      }.sortBy { case (_, _, okey, _, price, _) => (-price, okey) }.take(100).toSeq
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === want)
    assert(got.nonEmpty, "q37 must be non-vacuous at this SF")
  }

  test("q39 returned-item report equals brute force; dims join after the custkey aggregate") {
    val q = Relational.q39(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert("lineitem".r.findAllIn(plan).size == 1, s"fact scanned once:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("l_returnflag"),
      "the returnflag filter must reach the parquet scan")
    assert(!plan.contains("CartesianProduct"))

    val lo = java.time.Instant.parse("1996-01-01T00:00:00Z").toEpochMilli
    val hi = java.time.Instant.parse("1996-04-01T00:00:00Z").toEpochMilli
    val oMap = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ms"))
      .collect()
      .flatMap(r => if (r.getLong(2) >= lo && r.getLong(2) < hi)
        Some(r.getLong(0) -> r.getLong(1)) else None).toMap
    val revByCust = Tables.lineitem(spark, sf).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")).collect()
      .flatMap { r =>
        oMap.get(r.getLong(0)).map(ck => ck ->
          (BigDecimal(r.getDouble(1)).setScale(2) *
            (BigDecimal(1).setScale(2) - BigDecimal(r.getDouble(2)).setScale(2))))
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum.toDouble }
    val cust = Tables.customer(spark, sf).collect()
      .map(r => r.getAs[Long]("c_custkey") ->
        ((r.getAs[String]("c_name"), r.getAs[Int]("c_nationkey"), r.getAs[Double]("c_acctbal")))).toMap
    val nat = Tables.nation(spark, sf).collect()
      .map(r => r.getAs[Int]("n_nationkey") -> r.getAs[String]("n_name")).toMap
    val want = revByCust.toSeq.map { case (ck, rev) =>
      val (nm, nk, bal) = cust(ck); (ck, nm, nat(nk), bal, rev)
    }.sortBy { case (ck, _, _, _, rev) => (-rev, ck) }.take(20)
    val got = q.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === want)
    assert(got.nonEmpty, "q39 must be non-vacuous at this SF")
  }

  test("intervalJoin: half-open boundaries, exactly-once pairing, overlap fan-out") {
    import spark.implicits._
    // intervals: A [100,200) and B [150,250) overlap in [150,200);
    // C is inverted (end <= start) and must match nothing
    val ivs = Seq(("A", 100L, 200L), ("B", 150L, 250L), ("C", 300L, 300L))
      .toDF("name", "s", "e")
    // events at every boundary class, bucket width 40 (misaligned on
    // purpose: boundaries never coincide with bucket edges)
    val evs = Seq(99L, 100L, 149L, 150L, 199L, 200L, 249L, 250L, 300L).toDF("t")
    val got = Relational.intervalJoin(evs, col("t"), ivs, col("s"), col("e"), 40L)
      .select(col("t"), col("name")).collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq.sorted
    val want = Seq( // start inclusive, end exclusive, overlap doubles
      100L -> "A", 149L -> "A", 150L -> "A", 150L -> "B", 199L -> "A",
      199L -> "B", 200L -> "B", 249L -> "B").sorted
    assert(got === want)
    assert(got.size === got.distinct.size, "each (fact, interval) pair exactly once")
  }

  test("q38 plan survives with no broadcastable side: equi-join on buckets, never BNLJ") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Relational.q38(spark, sf).queryExecution.executedPlan.toString
      // the whole point of the bucket expansion: a raw range-predicate
      // join between two unbroadcastable relations plans as
      // BroadcastNestedLoopJoin — this one must stay an equi-join
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"interval join degraded to a non-equi plan:\n$plan")
      assert(plan.contains("SortMergeJoin"), "bucket equi-join should sort-merge when nothing fits")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q40 late-priority counts equal brute force; ship-year filter reaches the scan") {
    val q = Relational.q40(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      "the ship-year filter must reach the lineitem scan")
    assert(!plan.contains("CartesianProduct"))

    val oMap = Tables.orders(spark, sf)
      .select(col("o_orderkey"), unix_millis(col("o_orderdate").cast("timestamp")).as("ms"),
        col("o_orderpriority")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val lo = java.time.Instant.parse("1997-01-01T00:00:00Z").toEpochMilli
    val hi = java.time.Instant.parse("1998-01-01T00:00:00Z").toEpochMilli
    val ninety = 90L * 24 * 3600 * 1000
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_returnflag"),
        unix_millis(col("l_shipdate").cast("timestamp")).as("ms")).collect()
      .filter(r => r.getLong(2) >= lo && r.getLong(2) < hi)
      .map { r =>
        val (oms, pri) = oMap(r.getLong(0))
        (r.getString(1), r.getLong(2) > oms + ninety,
          pri == "1-URGENT" || pri == "2-HIGH")
      }
    val want = rows.groupBy(_._1).map { case (rf, xs) =>
      rf -> ((xs.count(x => x._2 && x._3).toLong, xs.count(x => x._2 && !x._3).toLong,
        xs.count(_._2).toLong, xs.size.toLong))
    }
    val got = q.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === want)
    assert(got.values.map(_._3).sum > 0, "lateness predicate must be non-vacuous")
    assert(got.values.exists(v => v._1 > 0 && v._2 > 0),
      "both priority classes must appear among late lines")
  }

  test("q41 supplier variety equals brute force; blacklisted suppliers never counted; no Expand") {
    val q = Relational.q41(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "explicit two-level distinct must avoid the count(DISTINCT) Expand node")
    assert(!plan.contains("CartesianProduct"))

    val excl = Tables.supplier(spark, sf).filter(col("s_acctbal") < 0)
      .collect().map(_.getAs[Long]("s_suppkey")).toSet
    val parts = Tables.part(spark, sf).collect()
      .filter { r =>
        r.getAs[String]("p_brand") != "Brand#13" && r.getAs[String]("p_type") != "PROMO" &&
          Set(1, 4, 9, 14, 23, 36, 45, 49).contains(r.getAs[Int]("p_size"))
      }
      .map(r => r.getAs[Long]("p_partkey") ->
        ((r.getAs[String]("p_brand"), r.getAs[String]("p_type"), r.getAs[Int]("p_size")))).toMap
    val want = Tables.lineitem(spark, sf).select(col("l_partkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
      .filter(x => !excl.contains(x._2))
      .flatMap { case (pk, sk) => parts.get(pk).map(b => (b, sk)) }
      .distinct.groupBy(_._1).map { case (b, xs) => b -> xs.length.toLong }
    val got = q.collect().map(r =>
      ((r.getString(0), r.getString(1), r.getInt(2))) -> r.getLong(3)).toMap
    assert(got === want)
    // ordering: descending count, then brand/type/size
    val seq = q.collect().map(r => (r.getLong(3), r.getString(0), r.getString(1), r.getInt(2)))
    val sorted = seq.sortBy { case (c, b, t, z) => (-c, b, t, z) }
    assert(seq.toSeq === sorted.toSeq)

    // the blacklist is empty at sf0.001 (first negative balance appears
    // at sf0.01), so the anti-join is exercised on planted frames
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q41").toString
    Seq((1L, -5.0, 1, "sX"), (2L, 5.0, 1, "sY"))
      .toDF("s_suppkey", "s_acctbal", "s_nationkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((10L, "Brand#1", "LARGE", 9, "p", 1.0))
      .toDF("p_partkey", "p_brand", "p_type", "p_size", "p_name", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((10L, 1L), (10L, 2L), (10L, 2L))
      .toDF("l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val planted = Relational.q41(spark, dir).collect()
    assert(planted.length === 1 && planted.head.getLong(3) === 1L,
      "the negative-balance supplier must be excluded from the count")
  }

  test("q42 profit rollup equals brute force; part filter prunes before broadcast") {
    val q = Relational.q42(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert("lineitem".r.findAllIn(plan).size == 1, "one fact scan")
    assert(plan.contains("PushedFilters") && plan.toLowerCase.contains("p_name"),
      "the name filter must reach the part scan")
    assert(!plan.contains("CartesianProduct"))

    val parts = Tables.part(spark, sf).collect()
      .filter(_.getAs[String]("p_name").contains("ring"))
      .map(r => r.getAs[Long]("p_partkey") -> r.getAs[Double]("p_retailprice")).toMap
    val sup = Tables.supplier(spark, sf).collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Int]("s_nationkey")).toMap
    val nat = Tables.nation(spark, sf).collect()
      .map(r => r.getAs[Int]("n_nationkey") -> r.getAs[String]("n_name")).toMap
    val oYear = Tables.orders(spark, sf)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("y")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val cells = Tables.lineitem(spark, sf).collect().flatMap { r =>
      parts.get(r.getAs[Long]("l_partkey")).map { rp =>
        val rev = d2(r.getAs[Double]("l_extendedprice")) *
          (BigDecimal(1).setScale(2) - d2(r.getAs[Double]("l_discount")))
        val cost = d2(r.getAs[Double]("l_quantity")) * d2(rp)
        val nation = nat(sup(r.getAs[Long]("l_suppkey")))
        ((nation, oYear(r.getAs[Long]("l_orderkey"))), (rev, cost))
      }
    }.groupBy(_._1).map { case (k, xs) =>
      val rev = xs.map(_._2._1).sum.toDouble
      val cost = xs.map(_._2._2).sum.toDouble
      k -> ((rev, cost, rev - cost, xs.length.toLong))
    }
    val got = q.collect().map(r => ((r.getString(0), r.getLong(1))) ->
      ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(got === cells)
    assert(got.nonEmpty && got.keys.map(_._1).toSet.size > 1, "multiple nations present")
  }

  test("q43 market share equals brute force; both nation roles resolve independently") {
    val q = Relational.q43(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert("lineitem".r.findAllIn(plan).size == 1, "one fact scan")
    assert(!plan.contains("CartesianProduct"))

    val asiaNations = Tables.nation(spark, sf).collect()
      .filter(_.getAs[Int]("n_regionkey") == 2).map(_.getAs[Int]("n_nationkey")).toSet
    val asiaCust = Tables.customer(spark, sf).collect()
      .filter(r => asiaNations.contains(r.getAs[Int]("c_nationkey")))
      .map(_.getAs[Long]("c_custkey")).toSet
    val ordMap = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("y")).collect()
      .filter(r => asiaCust.contains(r.getLong(1)))
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val stdParts = Tables.part(spark, sf).collect()
      .filter(_.getAs[String]("p_type") == "STANDARD").map(_.getAs[Long]("p_partkey")).toSet
    val supNation = Tables.supplier(spark, sf).collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Int]("s_nationkey")).toMap
    val focalNation = Tables.nation(spark, sf).collect()
      .find(_.getAs[String]("n_name") == "NATION_12").get.getAs[Int]("n_nationkey")
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val byYear = Tables.lineitem(spark, sf).collect().flatMap { r =>
      val pk = r.getAs[Long]("l_partkey")
      ordMap.get(r.getAs[Long]("l_orderkey")).flatMap { y =>
        if (!stdParts.contains(pk)) None
        else {
          val rev = d2(r.getAs[Double]("l_extendedprice")) *
            (BigDecimal(1).setScale(2) - d2(r.getAs[Double]("l_discount")))
          val focal = supNation(r.getAs[Long]("l_suppkey")) == focalNation
          Some((y, rev, focal))
        }
      }
    }.groupBy(_._1).map { case (y, xs) =>
      val f = xs.filter(_._3).map(_._2).sum.toDouble
      val t = xs.map(_._2).sum.toDouble
      y -> ((f, t, BigDecimal(f / t).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        xs.length.toLong))
    }
    val got = q.collect().map(r => r.getLong(0) ->
      ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got === byYear)
    assert(got.values.forall(v => v._3 >= 0.0 && v._3 <= 1.0))
    assert(got.values.exists(v => v._1 > 0.0), "the focal nation must supply something")
    assert(got.values.exists(v => v._1 < v._2), "and must not supply everything")
  }

  test("q44 KMV: unsaturated groups are exact; saturated estimate replays by hand; rank-limit pushes down") {
    // sf0.001 has 15 distinct users per event_type < k=64: the sketch
    // is unsaturated and the estimator must degrade to the exact count.
    val small = Relational.q44(spark, sf).collect()
    assert(small.length === 5)
    assert(small.forall(r => r.getAs[Long]("n_est") === r.getAs[Long]("n_exact")))
    assert(small.forall(r => r.getAs[Long]("err_ppm") === 0L))

    // sf0.01 (150 users per group) saturates the sketch: replay the
    // estimator by hand from the same portable hash and require the
    // registered result to match exactly, then sanity-bound the error
    // (KMV at k=64 has ~13% typical relative error; 30% is a loose
    // regression tripwire, the REPORTED err_ppm is the real measure).
    val sf01 = "/root/testdata/sf0.01"
    val got = Relational.q44(spark, sf01).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val P = graft.functions.TextFunctions.P
    val byType = Tables.events(spark, sf01)
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (et, xs) =>
        val users = xs.map(_._2).distinct
        val hs = users.map { u =>
          val h1 = Math.floorMod(Math.floorMod(u, P) * 1103515245L +
            Relational.KmvSeed * 2654435761L + 12345L, P)
          (Math.floorMod(h1 * 48271L, P), u)
        }.sorted
        val exact = users.length.toLong
        val est =
          if (exact < Relational.KmvK) exact
          else (Relational.KmvK - 1).toLong * P / math.max(hs(Relational.KmvK - 1)._1, 1L)
        et -> ((exact, est, math.abs(est - exact) * 1000000L / exact))
      }
    assert(got === byType)
    assert(got.values.forall(_._3 < 300000L), s"KMV error above 30%: $got")

    // Scale shape: the sketch is the ENGINE PRIMITIVE aggregate — the
    // plan must show partial aggregation (each task reduces to ≤ k
    // sketch entries per group before the exchange) and must NOT fall
    // back to the pre-round-13 Window/WindowGroupLimit construction.
    val plan = Relational.q44(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"TypedImperativeAggregate should plan as ObjectHashAggregate:\n$plan")
    assert(plan.contains("partial_graft_kmv_sketch"),
      s"map-side partial sketch aggregation missing:\n$plan")
    assert(!plan.contains("WindowGroupLimit") && !plan.contains("Window ["),
      s"q44 regressed to the window construction:\n$plan")
  }

  test("q45 KMV overlap: unsaturated pairs are exact; saturated estimates bounded; full-overlap corpus degenerates correctly") {
    import spark.implicits._
    // Planted UNSATURATED segments: A = users 1..40, B = 21..60 ->
    // union 60 < k=64, so the sketches ARE the sets and both
    // estimates must be exact: union 60, intersection 20.
    val un = ((1L to 40L).map(("A", _)) ++ (21L to 60L).map(("B", _)))
      .toDF("event_type", "user_id")
    val r1 = Relational.kmvOverlap(un).collect()
    assert(r1.length === 1)
    val row = r1.head
    assert(row.getAs[Long]("union_exact") === 60L)
    assert(row.getAs[Long]("union_est") === 60L)
    assert(row.getAs[Long]("union_err_ppm") === 0L)
    assert(row.getAs[Long]("inter_exact") === 20L)
    assert(row.getAs[Long]("inter_est") === 20L)
    assert(row.getAs[Long]("inter_err_ppm") === 0L)

    // Planted SATURATED partial overlap: A = 1..300, B = 151..450 ->
    // union 450, intersection 150 (1/3 Jaccard). The rho-estimator's
    // variance at k=64 is ~1/sqrt(k); 50% is the loose tripwire, the
    // reported ppm is the measure.
    val sat = ((1L to 300L).map(("A", _)) ++ (151L to 450L).map(("B", _)))
      .toDF("event_type", "user_id")
    val r2 = Relational.kmvOverlap(sat).collect().head
    assert(r2.getAs[Long]("union_exact") === 450L)
    assert(r2.getAs[Long]("inter_exact") === 150L)
    assert(r2.getAs[Long]("union_err_ppm") < 500000L, s"union est off: $r2")
    assert(r2.getAs[Long]("inter_err_ppm") < 500000L, s"inter est off: $r2")

    // Registered corpus: every user does every event type, so all 10
    // pairs must report union == intersection (exactly, on BOTH the
    // exact and estimated sides — the sketches coincide pair-wise).
    val full = Relational.q45(spark, sf).collect()
    assert(full.length === 10)
    full.foreach { r =>
      assert(r.getAs[Long]("union_exact") === r.getAs[Long]("inter_exact"))
      assert(r.getAs[Long]("union_est") === r.getAs[Long]("inter_est"))
    }
  }

  test("q46 Count-Min: one-sided error invariant; estimates replay by hand; top-k against ground truth") {
    val got = Relational.q46(spark, sf).collect()
    assert(got.length === 10)
    // CM's defining property: NEVER an underestimate
    got.foreach(r => assert(r.getAs[Long]("n_est") >= r.getAs[Long]("n_exact"),
      s"Count-Min underestimated: $r"))
    // hand replay: rebuild the full d x w sketch from exact counts and
    // recompute every reported estimate
    val P = graft.functions.TextFunctions.P
    import graft.functions.TextFunctions.{permA, permB}
    val counts = Tables.events(spark, sf).groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def pos(u: Long, j: Int): Long =
      Math.floorMod(Math.floorMod(u, P) * permA(j) + permB(j), P) % Relational.CmW
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    counts.foreach { case (u, n) =>
      (0 until Relational.CmD).foreach { j =>
        val k = (j, pos(u, j)); cells(k) = cells.getOrElse(k, 0L) + n } }
    def est(u: Long): Long =
      (0 until Relational.CmD).map(j => cells((j, pos(u, j)))).min
    got.foreach { r =>
      val u = r.getLong(0)
      assert(r.getAs[Long]("n_exact") === counts(u))
      assert(r.getAs[Long]("n_est") === est(u), s"estimate replay diverged for user $u")
    }
    // the reported rows ARE the exact top-10 (count desc, id tiebreak)
    val top = counts.toSeq.sortBy { case (u, n) => (-n, u) }.take(10).map(_._1)
    assert(got.map(_.getLong(0)).toSeq === top)
  }
}
