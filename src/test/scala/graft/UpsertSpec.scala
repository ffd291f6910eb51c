package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Upsert

/** MERGE / SCD2 contract: incremental apply is rebuild-transparent
  * and idempotent, SCD2 invariants hold, and the whole surface is
  * one key shuffle per input. */
class UpsertSpec extends SparkSuite {

  private def key(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  private def log = Tables.events(spark, sf).select(col("user_id"), col("event_id"),
    col("event_type"), col("value"), unix_millis(col("ts")).as("ms"))

  test("i2 incremental apply equals i1 full rebuild row-for-row") {
    assert(key(Upsert.i2(spark, sf)) === key(Upsert.i1(spark, sf)))
  }

  test("re-applying the same batch is a no-op (idempotence)") {
    val dim = Upsert.scd2FromLog(log.filter(col("ms") < Upsert.CutoffMs),
      Seq("user_id"), "ms", Seq("event_id"))
    val batch = log.filter(col("ms") >= Upsert.CutoffMs)
    val once = Upsert.scd2Apply(dim, batch, Seq("user_id"), "ms", Seq("event_id"))
      .localCheckpoint() // freeze, so "twice" applies to the materialized once
    val twice = Upsert.scd2Apply(once, batch, Seq("user_id"), "ms", Seq("event_id"))
    val ord = Seq(col("user_id"), col("version"))
    assert(key(twice.orderBy(ord: _*)) === key(once.orderBy(ord: _*)))
  }

  test("applying an empty batch is a no-op") {
    val dim = Upsert.scd2FromLog(log, Seq("user_id"), "ms", Seq("event_id"))
    val after = Upsert.scd2Apply(dim, log.limit(0), Seq("user_id"), "ms", Seq("event_id"))
    val ord = Seq(col("user_id"), col("version"))
    assert(key(after.orderBy(ord: _*)) === key(dim.orderBy(ord: _*)))
  }

  test("SCD2 invariants: one open row per key, contiguous half-open ranges, dense versions") {
    val h = Upsert.i2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(4), // user_id, valid_from
        Option(r.get(5)).map(_.asInstanceOf[Long]), // valid_to
        r.getLong(6), r.getLong(7))) // version, is_current
      .groupBy(_._1)
    h.foreach { case (u, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1L to rows.length).toSeq, s"user $u versions dense")
      assert(sorted.count(_._5 == 1L) === 1, s"user $u exactly one open row")
      assert(sorted.last._5 === 1L && sorted.last._3.isEmpty, s"user $u last row open")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.contains(b._2), s"user $u ranges contiguous: ${a._3} -> ${b._2}")
        case _ =>
      }
    }
  }

  test("mergeLatest: updates win over the snapshot; unseen keys insert") {
    import spark.implicits._
    val current = Seq((1L, 10L, "old", 1.0, 100L), (2L, 20L, "keep", 2.0, 200L))
      .toDF("user_id", "event_id", "event_type", "value", "ms")
    val updates = Seq((1L, 11L, "new", 9.0, 150L), (3L, 30L, "ins", 3.0, 50L))
      .toDF("user_id", "event_id", "event_type", "value", "ms")
    val got = Upsert.mergeLatest(current, updates, Seq("user_id"),
      Seq(col("ms"), col("event_id"))).orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(got === Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
  }

  test("property: incremental apply equals rebuild for ANY log and ANY split (10 seeded trials)") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 10) {
      val nKeys = 1 + rnd.nextInt(6)
      // ids are unique (a change log's PK); timestamps collide on
      // purpose — the tie-break column must carry total order
      val rows = (1 to 30 + rnd.nextInt(80)).map { i =>
        (rnd.nextInt(nKeys).toLong, i.toLong, s"v$i", rnd.nextDouble(), rnd.nextInt(20).toLong * 1000L)
      }
      val logDf = rows.toDF("user_id", "event_id", "event_type", "value", "ms")
      val full = Upsert.scd2FromLog(logDf, Seq("user_id"), "ms", Seq("event_id"))
      val cut = rnd.nextInt(21).toLong * 1000L // may be empty-dim or empty-batch
      // split must respect event order within key for rebuild equality:
      // (ms, event_id) below/above the cut — use ms alone as the cut
      // axis but put ties entirely on one side via event parity-free
      // rule: strictly-less goes to the dim
      val dim = Upsert.scd2FromLog(logDf.filter(col("ms") < cut), Seq("user_id"), "ms", Seq("event_id"))
      val batch = logDf.filter(col("ms") >= cut)
      val applied = Upsert.scd2Apply(dim, batch, Seq("user_id"), "ms", Seq("event_id"))
      val ord = Seq(col("user_id"), col("version"))
      assert(key(applied.orderBy(ord: _*)) === key(full.orderBy(ord: _*)),
        s"trial $trial (cut=$cut) incremental != rebuild")
    }
  }

  test("scd2Apply applies a batch row TYING the open row's ts with a later tie-break") {
    import spark.implicits._
    // eid 1 and 2 tie at ms=1000; the split puts eid 1 in the dim and
    // eid 2 in the batch — a ts-only freshness guard silently drops
    // eid 2 (it is not strictly ts-newer than the open valid_from),
    // breaking rebuild-transparency exactly when ts ties span the split.
    val logDf = Seq(
      (1L, 1L, "a", 1.0, 1000L),
      (1L, 2L, "b", 2.0, 1000L),
      (1L, 3L, "c", 3.0, 2000L)
    ).toDF("user_id", "event_id", "event_type", "value", "ms")
    val full = Upsert.scd2FromLog(logDf, Seq("user_id"), "ms", Seq("event_id"))
    val dim = Upsert.scd2FromLog(logDf.filter(col("event_id") === 1L),
      Seq("user_id"), "ms", Seq("event_id"))
    val batch = logDf.filter(col("event_id") > 1L)
    val applied = Upsert.scd2Apply(dim, batch, Seq("user_id"), "ms", Seq("event_id"))
    val ord = Seq(col("user_id"), col("version"))
    assert(key(applied.orderBy(ord: _*)) === key(full.orderBy(ord: _*)))
    // ...and a batch row tying ts with an EARLIER tie-break is still
    // dropped (it is genuinely older than the open version).
    val replay = Upsert.scd2Apply(
      Upsert.scd2FromLog(logDf.filter(col("event_id") <= 2L), Seq("user_id"), "ms", Seq("event_id")),
      logDf.filter(col("event_id") =!= 3L), // contains the (ms=1000, eid=1) older tie
      Seq("user_id"), "ms", Seq("event_id"))
    assert(key(replay.orderBy(ord: _*)) ===
      key(Upsert.scd2FromLog(logDf.filter(col("event_id") <= 2L),
        Seq("user_id"), "ms", Seq("event_id")).orderBy(ord: _*)))
  }

  test("property: rebuild-transparency holds for LEXICOGRAPHIC (ms, event_id) splits (10 seeded trials)") {
    import spark.implicits._
    val rnd = new scala.util.Random(777)
    for (trial <- 1 to 10) {
      val nKeys = 1 + rnd.nextInt(5)
      val rows = (1 to 30 + rnd.nextInt(60)).map { i =>
        (rnd.nextInt(nKeys).toLong, i.toLong, s"v$i", rnd.nextDouble(), rnd.nextInt(10).toLong * 1000L)
      }
      val logDf = rows.toDF("user_id", "event_id", "event_type", "value", "ms")
      val full = Upsert.scd2FromLog(logDf, Seq("user_id"), "ms", Seq("event_id"))
      // cut chosen so ts ties REGULARLY span the split: dim takes the
      // lexicographic (ms, event_id) prefix, batch the rest
      val cutMs = rnd.nextInt(11).toLong * 1000L
      val cutEid = 1L + rnd.nextInt(rows.length).toLong
      val inDim = col("ms") < cutMs || (col("ms") === cutMs && col("event_id") <= cutEid)
      val dim = Upsert.scd2FromLog(logDf.filter(inDim), Seq("user_id"), "ms", Seq("event_id"))
      val applied = Upsert.scd2Apply(dim, logDf.filter(!inDim), Seq("user_id"), "ms", Seq("event_id"))
      val ord = Seq(col("user_id"), col("version"))
      assert(key(applied.orderBy(ord: _*)) === key(full.orderBy(ord: _*)),
        s"trial $trial (cut=($cutMs,$cutEid)) incremental != rebuild")
    }
  }

  test("cdcDiff classifies INSERT/UPDATE/DELETE, is null-safe, drops unchanged keys") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, Some(10.0)), // unchanged → dropped
      (2L, Some(20.0)), // value changes → UPDATE
      (3L, Some(30.0)), // key vanishes → DELETE
      (4L, None),       // null → value → UPDATE (null-safe, not "unchanged")
      (5L, None)        // null → null → NOT a change
    ).toDF("user_id", "value")
    val newSnap = Seq(
      (1L, Some(10.0)),
      (2L, Some(21.0)),
      (4L, Some(40.0)),
      (5L, None),
      (6L, Some(60.0))  // new key → INSERT
    ).toDF("user_id", "value")
    val got = Upsert.cdcDiff(oldSnap, newSnap, Seq("user_id"), Seq("value"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((2L, "UPDATE"), (3L, "DELETE"), (4L, "UPDATE"), (6L, "INSERT")))
  }

  test("i4: time-cut snapshots of an append-only log can never emit DELETE") {
    val ops = Upsert.i4(spark, sf).select("op").distinct().collect().map(_.getString(0)).toSet
    assert(!ops.contains("DELETE"), s"append-only time-cut diff emitted DELETE: $ops")
    assert(ops.nonEmpty, "diff must be non-vacuous at this SF")
    // one co-partitioned join: no broadcast-nested-loop / cartesian
    val plan = Upsert.i4(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("i5: merged partial aggregates equal the full-rebuild rollup") {
    val keys = Seq("user_id", "event_type")
    val full = Upsert.rollupFinish(Upsert.rollupState(log, keys, "value", "ms"))
      .orderBy(col("user_id"), col("event_type"))
      .select(col("user_id"), col("event_type"), col("n"), col("n_v"),
        col("sum_v"), col("avg_v"), col("first_ms"), col("last_ms"))
    assert(key(Upsert.i5(spark, sf)) === key(full))
  }

  test("property: rollup merge is split-invariant and grouping-invariant (10 seeded trials)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3535)
    val keys = Seq("user_id", "event_type")
    for (trial <- 1 to 10) {
      val rows = (1 to 40 + rnd.nextInt(60)).map { i =>
        (rnd.nextInt(4).toLong, s"t${rnd.nextInt(3)}",
          // nulls appear so n vs n_v genuinely diverge
          if (rnd.nextInt(5) == 0) null.asInstanceOf[java.lang.Double]
          else java.lang.Double.valueOf(rnd.nextInt(10000) / 100.0),
          i.toLong * 1000L)
      }
      val logDf = rows.toDF("user_id", "event_type", "value", "ms")
      val full = Upsert.rollupFinish(Upsert.rollupState(logDf, keys, "value", "ms"))
      // three disjoint slices, folded in both ((a⊕b)⊕c) and (a⊕(b⊕c))
      val c1 = rnd.nextInt(rows.length).toLong * 1000L
      val c2 = c1 + rnd.nextInt(rows.length).toLong * 1000L
      val sa = Upsert.rollupState(logDf.filter(col("ms") <= c1), keys, "value", "ms")
      val sb = Upsert.rollupState(logDf.filter(col("ms") > c1 && col("ms") <= c2), keys, "value", "ms")
      val sc = Upsert.rollupState(logDf.filter(col("ms") > c2), keys, "value", "ms")
      val leftFold = Upsert.rollupFinish(
        Upsert.rollupMerge(Upsert.rollupMerge(sa, sb, keys), sc, keys))
      val rightFold = Upsert.rollupFinish(
        Upsert.rollupMerge(sa, Upsert.rollupMerge(sb, sc, keys), keys))
      val ord = Seq(col("user_id"), col("event_type"))
      val want = key(full.orderBy(ord: _*))
      assert(key(leftFold.orderBy(ord: _*)) === want, s"trial $trial left fold != rebuild")
      assert(key(rightFold.orderBy(ord: _*)) === want, s"trial $trial right fold != rebuild")
    }
  }

  test("i5 null discipline: an all-null group keeps n, zeroes n_v, nulls sum/avg") {
    import spark.implicits._
    val logDf = Seq(
      (1L, "a", null.asInstanceOf[java.lang.Double], 1000L),
      (1L, "a", null.asInstanceOf[java.lang.Double], 2000L),
      (1L, "b", java.lang.Double.valueOf(5.0), 3000L)
    ).toDF("user_id", "event_type", "value", "ms")
    val got = Upsert.rollupFinish(
      Upsert.rollupState(logDf, Seq("user_id", "event_type"), "value", "ms"))
      .orderBy(col("event_type")).collect()
    val aRow = got(0)
    assert(aRow.getLong(aRow.fieldIndex("n")) === 2L)
    assert(aRow.getLong(aRow.fieldIndex("n_v")) === 0L)
    assert(aRow.isNullAt(aRow.fieldIndex("sum_v")) && aRow.isNullAt(aRow.fieldIndex("avg_v")))
    val bRow = got(1)
    assert(bRow.getLong(bRow.fieldIndex("n_v")) === 1L &&
      bRow.getDouble(bRow.fieldIndex("avg_v")) === 5.0)
  }

  test("i5 plan: map-side partial aggregation, no cartesian, no window") {
    val plan = Upsert.i5(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    // partial → final HashAggregate pairs: the state build combines
    // map-side before its only fact-sized shuffle
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Window"), plan) // pure agg surface — no window pass
  }

  test("scd2FromLog and scd2Apply stay one key shuffle per input") {
    val p1 = Upsert.i1(spark, sf).queryExecution.executedPlan.toString
    // i1: window + final orderBy — exactly one hash shuffle on user_id
    assert("hashpartitioning\\(user_id".r.findAllIn(p1).size == 1, p1)
    val p2 = Upsert.i2(spark, sf).queryExecution.executedPlan.toString
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"), p2)
  }

  test("i6 incremental distinct: anti-join fold equals the full recompute, batch non-trivial") {
    val r = Upsert.i6(spark, sf).collect()
    val want = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    assert(r.map(x => x.getDate(0).toString -> x.getLong(3)).toMap === want,
      "n_old + n_new must equal count(DISTINCT) recomputed from scratch")
    assert(r.map(_.getLong(1)).sum > 0, "cutoff must leave non-empty state")
    assert(r.map(_.getLong(2)).sum > 0, "cutoff must leave a batch that adds new keys")
    // the fold itself: no day double-counts a user who exists in state
    assert(r.forall(x => x.getLong(3) === x.getLong(1) + x.getLong(2)))
  }

  test("i7 retract-fold equals the full rebuild on the inventory instantiation") {
    val got = Upsert.i7(spark, sf).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val want = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(unix_millis(col("ts")).desc, col("event_id").desc)))
      .filter(col("__rn") === 1)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), count(col("value")).as("n_v"),
        sum(graft.functions.ExactNum.dec2(col("value"))).cast("double").as("sum_v"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
      .collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got === want, "retraction fold must equal the rebuild over the new snapshot")
    assert(got.nonEmpty)
  }

  test("i7 retractions: DELETE empties a group, UPDATE moves a row across groups") {
    import spark.implicits._
    // old snapshot: g1 = {a:10, b:20}, g2 = {c:5}
    val oldSnap = Seq(("a", "g1", 10.0), ("b", "g1", 20.0), ("c", "g2", 5.0))
      .toDF("k", "g", "v")
    // new snapshot: a deleted; b moved g1→g2 with v 20→25; d inserted in g3
    val newSnap = Seq(("b", "g2", 25.0), ("c", "g2", 5.0), ("d", "g3", 7.0))
      .toDF("k", "g", "v")
    val state = Upsert.snapshotRollup(oldSnap, "g", "v")
    val changes = Upsert.cdcDiff(oldSnap, newSnap, Seq("k"), Seq("g", "v"))
    val ops = changes.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ops === Map("a" -> "DELETE", "b" -> "UPDATE", "d" -> "INSERT"))
    val out = Upsert.cdcRollupApply(state, changes, newSnap, "g", "v").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(5), r.getDouble(3), r.getDouble(4)))).toMap
    // g1 lost both rows → vanishes; g2 = {b:25, c:5}; g3 = {d:7}
    assert(!out.contains("g1"), "a fully-retracted group must vanish (rebuild parity)")
    assert(out("g2") === ((2L, 2L, 30.0, 5.0, 25.0)))
    assert(out("g3") === ((1L, 1L, 7.0, 7.0, 7.0)))
    // and the fold equals the rebuild on these frames
    val rebuild = Upsert.snapshotRollup(newSnap, "g", "v")
      .withColumn("sum_v", col("__sum_v").cast("double")).drop("__sum_v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(5), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out === rebuild)
  }

  test("i8 bucketed fact join: ZERO exchanges in the join plan; results layout-transparent") {
    val r = Upsert.i8(spark, sf).collect() // also writes the bucketed tables
    // the zero-exchange claim, on the raw table-to-table join with the
    // broadcast escape hatch closed (a BroadcastExchange would also
    // be shuffle-free but would not prove the bucketed layout works)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (ordersTbl, lineitemTbl) = Upsert.lastI8Tables.get
      val j = spark.table(lineitemTbl)
        .join(spark.table(ordersTbl), col("l_orderkey") === col("o_orderkey"))
      assert(j.count() > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed fact join must plan with zero exchanges, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // result transparency: identical to the same aggregate over the
    // raw parquet through a plain (unbucketed) join
    import graft.functions.ExactNum.dec2
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"),
        sum(dec2(col("l_extendedprice")) *
          (lit(1).cast(org.apache.spark.sql.types.DecimalType(18, 2)) - dec2(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority")).collect()
    assert(r.toSeq === plain.toSeq)
  }

  test("i9 compaction plan: hand-computed packing, atomic straddler overshoots, volumes conserved") {
    import spark.implicits._
    // target 4000: source a packs files 0-1 (1000+3500 — the straddler
    // f1 closes group 0 OVER target), then 2-3; source b's single
    // 9000-byte file is atomic and lands alone at fill 2.25×.
    val manifest = Seq(
      ("a", 0L, 1000L, 10L), ("a", 1L, 3500L, 35L),
      ("a", 2L, 900L, 9L), ("a", 3L, 2600L, 26L),
      ("b", 0L, 9000L, 90L))
      .toDF("source", "file_id", "bytes", "rows")
    val got = Upsert.compactionPlan(manifest, Seq("source"), 4000L)
      .orderBy(col("source"), col("grp")).collect().map(_.toSeq)
    assert(got === Seq(
      Seq("a", 0L, 2L, 4500L, 45L, 0L, 1L, 1125000L),
      Seq("a", 1L, 2L, 3500L, 35L, 2L, 3L, 875000L),
      Seq("b", 0L, 1L, 9000L, 90L, 0L, 0L, 2250000L)))
    // registered form: byte/row volume conserved, file ranges ordered
    // and non-overlapping per source (doc_ids interleave across
    // sources, so per-source file_id VALUES legitimately skip — the
    // guarantee is range order, not +1 steps), and the gate SF
    // actually exercises multi-group packing
    val docs = Tables.documents(spark, sf)
    val out = Upsert.i9(spark, sf).collect()
    assert(out.map(_.getLong(3)).sum ===
      docs.agg(sum(col("n_chars"))).collect()(0).getLong(0), "bytes not conserved")
    assert(out.map(_.getLong(4)).sum === docs.count(), "rows not conserved")
    out.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(p, n) =>
          assert(n.getLong(5) > p.getLong(6),
            s"$src: group ${n.getLong(1)} overlaps group ${p.getLong(1)}")
        case _ =>
      }
      assert(sorted.forall(r => r.getLong(5) <= r.getLong(6)))
    }
    assert(out.groupBy(_.getString(0)).exists(_._2.length > 1),
      "gate SF must exercise multi-group packing")
  }

  test("i10 z-order: pruning is lossless and layout-invariant; z-order beats linear on the 2-D box") {
    val r = Upsert.i10(spark, sf).collect().map(x => x.getString(0) -> x).toMap
    val zo = r("zorder"); val li = r("linear")
    // layouts must never change the answer (i8's transparency rule)
    assert(zo.getAs[Long]("rows_matched") === li.getAs[Long]("rows_matched"))
    // direct recompute of the box count with the same integer arithmetic
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id AS u", "unix_millis(ts) div 86400000 AS d")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val (umin, umax) = (ev.map(_._1).min, ev.map(_._1).max)
    val (dmin, dmax) = (ev.map(_._2).min, ev.map(_._2).max)
    val (ulo, uhi) = (umin + (umax - umin + 1) * 3 / 10, umin + (umax - umin + 1) * 4 / 10)
    val (dlo, dhi) = (dmin + (dmax - dmin + 1) * 3 / 10, dmin + (dmax - dmin + 1) * 4 / 10)
    val matched = ev.count { case (u, d) => u >= ulo && u < uhi && d >= dlo && d < dhi }.toLong
    assert(zo.getAs[Long]("rows_matched") === matched)
    // min/max skipping is LOSSLESS: a hit-file scan covers every match
    assert(zo.getAs[Long]("rows_scanned") >= matched)
    assert(li.getAs[Long]("rows_scanned") >= matched)
    // the point of the layout: both dims tight per file -> fewer rows scanned
    assert(zo.getAs[Long]("scan_ppm") < li.getAs[Long]("scan_ppm"),
      s"z-order did not out-prune linear: $zo vs $li")
    // bit-interleave sanity: extreme corners of the 256x256 bucket grid
    val corners = spark.sql(
      """SELECT bx, by, """ + (0 until 8).map(b =>
        s"(((bx >> $b) & 1) << ${2 * b}) + (((by >> $b) & 1) << ${2 * b + 1})")
        .mkString(" + ") + """ AS zv
        |FROM VALUES (255L, 0L), (0L, 255L), (255L, 255L), (0L, 0L) AS t(bx, by)""".stripMargin)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(corners((255L, 0L)) === 0x5555L)   // odd bits empty
    assert(corners((0L, 255L)) === 0xAAAAL)   // even bits empty
    assert(corners((255L, 255L)) === 0xFFFFL)
    assert(corners((0L, 0L)) === 0L)
  }

  test("compactionApply property: random manifests rewrite to exactly plan-count files, rows transparent, ranges contiguous") {
    import spark.implicits._
    val rnd = new scala.util.Random(181)
    for (trial <- 1 to 5) {
      val nParts = 1 + rnd.nextInt(3)
      val rows = for {
        pp <- 0 until nParts
        f <- 0 until (1 + rnd.nextInt(12))
        r <- 0 until (1 + rnd.nextInt(4))
      } yield (s"p$pp", f.toLong, rnd.nextInt(40).toLong + 1, s"$pp-$f-$r")
      val table = rows.toDF("part", "file_id", "w", "payload")
      val target = 20L + rnd.nextInt(60)
      val out = java.nio.file.Files
        .createTempDirectory("graft-capply-prop").toString + "/out"
      val compacted = Upsert.compactionApply(
        table, Seq("part"), "file_id", col("w"), target, out)
      // transparency: the rewrite moves rows between files, never
      // changes them (payload is unique per row — a stable total order)
      assert(compacted.select(col("part"), col("file_id"), col("w"), col("payload"))
          .orderBy(col("payload")).collect().map(_.toSeq).toSeq ===
        table.select(col("part"), col("file_id"), col("w"), col("payload"))
          .orderBy(col("payload")).collect().map(_.toSeq).toSeq,
        s"trial $trial: rows not transparent")
      val plan = Upsert.compactionPlan(
        table.groupBy(col("part"), col("file_id"))
          .agg(sum(col("w")).as("bytes"), count(lit(1)).as("rows")),
        Seq("part"), target).collect()
      // one physical file per plan group, total file count == group count
      val byGroup = compacted.groupBy(col("part"), col("__grp"))
        .agg(countDistinct(col("_metadata.file_path")).as("f")).collect()
      assert(byGroup.length === plan.length, s"trial $trial: group count")
      assert(byGroup.forall(_.getAs[Long]("f") === 1L),
        s"trial $trial: a group spans multiple files")
      // groups tile each partition's file range contiguously, in order
      plan.groupBy(_.getAs[String]("part")).foreach { case (_, rs) =>
        val ranges = rs.sortBy(_.getAs[Long]("grp"))
          .map(r => (r.getAs[Long]("first_file"), r.getAs[Long]("last_file")))
        ranges.sliding(2).foreach {
          case Array((_, l1), (f2, _)) => assert(f2 > l1, s"trial $trial: overlapping ranges")
          case _ => ()
        }
      }
    }
  }

  test("compactionApply on the durable store's segment dir: one file per plan group, rows transparent") {
    import graft.streaming.DurableState
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cstore").toString
    val store = new DurableState(spark, dir)
    // six delta commits -> six small segments under commit=*/log (the
    // small-file problem i9 plans for and i11's rewrite fixes)
    (0 to 5).foreach { b =>
      store.commitDelta(b.toLong, Map("log" ->
        Seq((b * 2L, s"value-$b"), (b * 2L + 1, s"other-$b")).toDF("id", "payload")),
        compactEvery = 100)
    }
    val segs = store.segments("log")
    assert(segs.size === 6)
    val table = segs.zipWithIndex.map { case (d, i) =>
      spark.read.parquet(s"$dir/$d").withColumn("file_id", lit(i.toLong))
    }.reduce(_.unionByName(_)).withColumn("part", lit("log"))
    val out = java.nio.file.Files.createTempDirectory("graft-capply").toString + "/out"
    val target = 40L
    val bytes = length(col("payload")).cast("long") + 8L
    val compacted = Upsert.compactionApply(
      table, Seq("part"), "file_id", bytes, target, out)
    // result transparency (i8's rule): the rewrite moved rows between
    // files, never changed them
    assert(compacted.select(col("id"), col("payload")).orderBy(col("id"))
        .as[(Long, String)].collect().toSeq ===
      table.select(col("id"), col("payload")).orderBy(col("id"))
        .as[(Long, String)].collect().toSeq)
    // physical file count == the plan's group count, exactly one per group
    val plan = Upsert.compactionPlan(
      table.groupBy(col("part"), col("file_id"))
        .agg(sum(bytes).as("bytes"), count(lit(1)).as("rows")),
      Seq("part"), target)
    val nGroups = plan.count()
    assert(nGroups > 1, "test must exercise multi-group packing")
    val byGroup = compacted.groupBy(col("__grp"))
      .agg(countDistinct(col("_metadata.file_path")).as("f"))
    assert(byGroup.count() === nGroups)
    assert(byGroup.filter(col("f") =!= 1L).isEmpty, "a plan group spans more than one output file")
  }

  test("zorderApply: repartitionByRange write — rows invariant, files = plan count, contiguous zv ranges, real-footer pruning beats linear") {
    import spark.implicits._
    // a full 64x64 grid: both dimensions uniform — the clustering
    // showcase (a linear layout can only keep ONE dimension tight)
    val rows = for (u <- 0L until 64L; d <- 0L until 64L) yield (u, d)
    val zbits = (0 until 8).map(b =>
      s"(((u >> $b) & 1) << ${2 * b}) + (((d >> $b) & 1) << ${2 * b + 1})").mkString(" + ")
    val table = rows.toDF("u", "d").withColumn("zv", expr(zbits))
    val nFiles = 16
    val base = java.nio.file.Files.createTempDirectory("graft-zapply").toString
    val zo = Upsert.zorderApply(table, "zv", nFiles, s"$base/zo")
    // rows layout-invariant (i8's transparency rule)
    assert(zo.select(col("u"), col("d"), col("zv")).orderBy(col("u"), col("d"))
        .collect().map(_.toSeq).toSeq ===
      table.select(col("u"), col("d"), col("zv")).orderBy(col("u"), col("d"))
        .collect().map(_.toSeq).toSeq)
    // per-REAL-file stats — what parquet footers give a scan planner
    def fileStats(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("_metadata.file_path")).agg(
        min(col("zv")).as("zmin"), max(col("zv")).as("zmax"),
        min(col("u")).as("fumin"), max(col("u")).as("fumax"),
        min(col("d")).as("fdmin"), max(col("d")).as("fdmax"),
        count(lit(1)).as("n")).collect()
    val zFiles = fileStats(zo)
    // physical files == the requested plan count
    assert(zFiles.length === nFiles, s"wrote ${zFiles.length} files, planned $nFiles")
    // files are CONTIGUOUS z-ranges (range partitioning's contract):
    // zv is a bijection of (u, d) here, so ranges are strictly ordered
    zFiles.sortBy(_.getAs[Long]("zmin")).toSeq.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a.getAs[Long]("zmax") < b.getAs[Long]("zmin"),
          "z-ranges overlap across files")
      case _ => ()
    }
    // the same data laid out linearly (range-partitioned + sorted on u
    // alone) — the baseline i10 simulates, here really written
    val li = Upsert.zorderApply(table, "u", nFiles, s"$base/li")
    val lFiles = fileStats(li)
    // replay i10's box query ([30%,40%) of each dim = u,d in [19,25))
    // against the REAL files' min/max
    val (lo, hi) = (64L * 3 / 10, 64L * 4 / 10)
    def scanned(fs: Array[org.apache.spark.sql.Row]): Long = fs.filter { f =>
      f.getAs[Long]("fumax") >= lo && f.getAs[Long]("fumin") < hi &&
        f.getAs[Long]("fdmax") >= lo && f.getAs[Long]("fdmin") < hi
    }.map(_.getAs[Long]("n")).sum
    val matched = rows.count { case (u, d) => u >= lo && u < hi && d >= lo && d < hi }.toLong
    assert(matched > 0)
    // skipping is lossless (hit files cover every match) and the
    // z-order files out-prune the linear ones on the 2-D box
    assert(scanned(zFiles) >= matched && scanned(lFiles) >= matched)
    assert(scanned(zFiles) < scanned(lFiles),
      s"z-order scanned ${scanned(zFiles)} rows vs linear ${scanned(lFiles)}")
  }

  test("i15 cdcApply roundtrip: apply(A, diff(A, B)) == B on seeded random snapshots with deletes; registered op mix has all three ops") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      // random key-unique snapshots with guaranteed inserts, updates,
      // deletes, and untouched keys
      def snap(keys: Seq[Long]) =
        keys.map(k => (k, rnd.nextInt(100).toDouble)).toDF("k", "v")
      val aKeys = (1L to 40L).filter(_ => rnd.nextBoolean())
      val bKeys = (1L to 40L).filter(_ => rnd.nextBoolean())
      val a = snap(aKeys)
      val b = snap(bKeys)
      val applied = Upsert.cdcApply(a,
        Upsert.cdcDiff(a, b, Seq("k"), Seq("v")), Seq("k"), Seq("v"))
      assert(applied.orderBy(col("k")).collect().map(_.toSeq).toSeq ===
        b.orderBy(col("k")).collect().map(_.toSeq).toSeq,
        s"trial $trial: roundtrip diverged")
    }
    // the registered erasure scenario carries ALL THREE ops (the
    // whole point: i4's append-only instantiation can never DELETE)
    val purchases = log.filter(col("event_type") === "purchase")
    val snapA = Upsert.latestSnapshot(purchases.filter(col("ms") < Upsert.CutoffMs),
        Seq("user_id"), Seq(col("ms"), col("event_id")))
      .filter(col("user_id") % 5 =!= 3).select(col("user_id"), col("value"))
    val snapB = Upsert.latestSnapshot(purchases,
        Seq("user_id"), Seq(col("ms"), col("event_id")))
      .filter(col("user_id") % 7 =!= 0).select(col("user_id"), col("value"))
    val ops = Upsert.cdcDiff(snapA, snapB, Seq("user_id"), Seq("value"))
      .groupBy(col("op")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops.keySet === Set("INSERT", "UPDATE", "DELETE"),
      s"registered scenario must exercise all ops, got $ops")
  }

  test("i14 vacuum: delta-only store reclaims 0 bytes, compacted store reclaims > 0, expired versions flip to None, survivor content exact, idempotent") {
    import graft.streaming.DurableSinks.DurableUpsertSink
    import spark.implicits._
    def batches = Seq(
      Seq((1L, 10L, 1.0), (2L, 11L, 2.0)),
      Seq((1L, 20L, 3.0), (3L, 21L, 4.0)),
      Seq((2L, 30L, 5.0), (4L, 31L, 6.0)))
    def build(dir: String, compactEvery: Int): DurableUpsertSink = {
      val sink = new DurableUpsertSink(spark, dir, Seq("user_id"),
        Seq(col("ms"), col("event_id")), retainVersions = 3,
        compactEvery = compactEvery)
      batches.zipWithIndex.foreach { case (b, i) =>
        sink.apply(b.toDF("user_id", "ms", "value")
          .withColumn("event_id", col("ms")), i.toLong)
      }
      sink
    }
    def rows(df: DataFrame) =
      df.select(col("user_id"), col("ms"), col("value"))
        .orderBy(col("user_id")).collect().map(_.toSeq).toSeq
    val base = java.nio.file.Files.createTempDirectory("graft-vac").toString

    // delta-only store: the head references EVERY segment, so vacuum
    // expires history but must reclaim nothing (and delete nothing)
    val deltaOnly = build(s"$base/delta", compactEvery = 99)
    val (e0, b0) = deltaOnly.vacuum(keepVersions = 1)
    assert(e0 === 2 && b0 === 0L,
      s"delta-only vacuum must reclaim 0 bytes, got ($e0, $b0)")
    assert(deltaOnly.snapshotAsOf(2L).isDefined)

    // compacted store: commit 2 compacts, so versions 0/1 are the only
    // references to the delta segments — vacuum reclaims them
    val sink = build(s"$base/comp", compactEvery = 3)
    val before = rows(sink.snapshotAsOf(2L).get)
    assert(sink.snapshotAsOf(0L).isDefined && sink.snapshotAsOf(1L).isDefined)
    val (e1, b1) = sink.vacuum(keepVersions = 1)
    assert(e1 === 2 && b1 > 0L, s"expected 2 expired, bytes > 0; got ($e1, $b1)")
    // expired versions resolve to nothing; the survivor is bit-exact
    assert(sink.snapshotAsOf(0L).isEmpty && sink.snapshotAsOf(1L).isEmpty)
    assert(rows(sink.snapshotAsOf(2L).get) === before)
    // physical check: only the compacted commit dir remains on disk
    val left = new java.io.File(s"$base/comp").listFiles.map(_.getName)
      .filter(_.startsWith("commit=")).toSeq
    assert(left.size === 1 && left.head.startsWith("commit=2"),
      s"expected only commit=2's dir to survive, found $left")
    // idempotent: nothing further to expire or reclaim
    assert(sink.vacuum(keepVersions = 1) === ((0, 0L)))
  }
}
