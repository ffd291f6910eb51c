package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.{DurableSinks, DurableState, Streams}

/** Checkpoint/kill/resume proof for the durable foreachBatch sinks
  * (round-12 VERDICT directive 3): a REAL file source + REAL
  * checkpointLocation, the query stopped mid-stream, a FRESH sink
  * instance (simulating a new JVM — no in-memory state survives), and
  * the resumed run must end exactly equal to the one-shot batch twin.
  * Replay tolerance (foreachBatch is at-least-once) and commit
  * atomicity are asserted directly against the store. */
class StreamingRecoverySpec extends SparkSuite {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("schema evolution: a later batch ADDS a column — old segments null-fill, asOf reads the schema as of its version, the CDC diff classifies the change") {
    import graft.operators.Upsert
    import spark.implicits._
    val dir = tmp("graft-evo")
    val store = new DurableState(spark, dir, retainVersions = 3)
    val latest = (df: DataFrame) =>
      Upsert.latestSnapshot(df, Seq("k"), Seq(col("ms")))
    // v0 commits a 2-column frame; v1 adds `tier` (the lakehouse
    // add-column evolution — round-16 VERDICT directive 5)
    store.commitDelta(0L,
      Map("snap" -> Seq((1L, 10L), (2L, 10L)).toDF("k", "ms")),
      reduce = Map("snap" -> latest))
    store.commitDelta(1L,
      Map("snap" -> Seq((2L, 20L, "gold"), (3L, 20L, "dirt")).toDF("k", "ms", "tier")),
      reduce = Map("snap" -> latest))
    // live state: evolved schema; pre-evolution rows null-fill
    val live = latest(store.loadAll()("snap"))
    assert(live.columns.toSeq === Seq("k", "ms", "tier"))
    assert(live.orderBy(col("k")).collect().map(r =>
      (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSeq ===
      Seq((1L, 10L, None), (2L, 20L, Some("gold")), (3L, 20L, Some("dirt"))))
    // time travel reads each version's OWN schema
    val v0 = latest(store.asOf(0L)("snap"))
    assert(v0.columns.toSeq === Seq("k", "ms"), "asOf(0) must not know the later column")
    assert(v0.orderBy(col("k")).as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 10L)))
    val v1 = latest(store.asOf(1L)("snap"))
    assert(v1.columns.toSeq === Seq("k", "ms", "tier"))
    // a compaction whose union SPANS the schema change commits fine
    store.commitDelta(2L, Map("snap" -> Seq((4L, 30L, "iron")).toDF("k", "ms", "tier")),
      compactEvery = 3, reduce = Map("snap" -> latest))
    assert(store.segments("snap").size === 1, "cadence reached: one compacted segment")
    assert(latest(store.loadAll()("snap")).count() === 4L)
    // st23's classifier across the evolution boundary: align the old
    // snapshot explicitly (the column did not exist there), null-safe
    // compare does the rest — k=1 unchanged (null==null), k=2 UPDATE
    // (ms moved, tier null→gold), k=3 INSERT
    val diff = Upsert.cdcDiff(
      v0.withColumn("tier", lit(null).cast("string")), v1,
      Seq("k"), Seq("ms", "tier"))
    assert(diff.orderBy(col("k")).select(col("k"), col("op"))
      .as[(Long, String)].collect().toSeq ===
      Seq((2L, "UPDATE"), (3L, "INSERT")))
  }

  test("DurableState: commit is atomic — frames without a manifest flip are invisible") {
    import spark.implicits._
    val dir = tmp("graft-ds")
    val store = new DurableState(spark, dir)
    assert(store.loadAll().isEmpty && store.nextFoldIndex === 0L)
    store.commit(0L, Map("s" -> Seq((1L, "a")).toDF("k", "v")))
    assert(store.committed === Some((0L, 1L)))
    // simulate a crash mid-commit of batch 1: frames land, manifest doesn't
    Seq((2L, "b")).toDF("k", "v").write.parquet(s"$dir/commit=1/s")
    val reopened = new DurableState(spark, dir)
    assert(reopened.committed === Some((0L, 1L)),
      "an unflipped commit directory must stay invisible")
    assert(reopened.loadAll()("s").collect().map(_.toSeq).toSeq === Seq(Seq(1L, "a")))
    // the next real commit of batch 1 overwrites the debris and lands
    reopened.commit(1L, Map("s" -> Seq((2L, "b")).toDF("k", "v")))
    assert(reopened.committed === Some((1L, 2L)))
    assert(reopened.loadAll()("s").collect().map(_.toSeq).toSeq === Seq(Seq(2L, "b")))
    assert(reopened.alreadyApplied(0L) && reopened.alreadyApplied(1L) &&
      !reopened.alreadyApplied(2L))
  }

  test("DurableState: a crash INSIDE the manifest flip loses no state (r13 weak mark)") {
    import spark.implicits._
    // The old layer flipped by delete(_latest) → rename(tmp, _latest):
    // dying between the two left ZERO manifests and a resumed store
    // read as fresh. Versioned manifests must make that window
    // impossible: inject the exact mid-flip wreckage — batch 1's data
    // dirs AND its tmp manifest present, rename never executed — and
    // the store must still resolve batch 0's state.
    val dir = tmp("graft-midflip")
    val store = new DurableState(spark, dir)
    store.commit(0L, Map("s" -> Seq((1L, "a")).toDF("k", "v")))
    Seq((2L, "b")).toDF("k", "v").write.parquet(s"$dir/commit=1/s")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_latest.tmp.1"),
      "1 2\ns commit=1/s".getBytes("UTF-8"))
    val reopened = new DurableState(spark, dir)
    assert(reopened.committed === Some((0L, 1L)),
      "mid-flip crash wreckage must not hide (or replace) committed state")
    assert(reopened.loadAll()("s").collect().map(_.toSeq).toSeq === Seq(Seq(1L, "a")))
    // the redelivered batch then commits cleanly over the wreckage
    reopened.commit(1L, Map("s" -> Seq((2L, "b")).toDF("k", "v")))
    assert(reopened.committed === Some((1L, 2L)))
    assert(reopened.loadAll()("s").collect().map(_.toSeq).toSeq === Seq(Seq(2L, "b")))
    val names = new java.io.File(dir).list().toSet
    assert(names.contains("_latest.v1") && !names.contains("_latest.v0") &&
      !names.exists(_.startsWith("_latest.tmp.")),
      s"flip must leave exactly the new manifest visible, got $names")
  }

  test("DurableState property: crash injected anywhere before the flip leaves the prior version readable (r17 directive 5)") {
    import spark.implicits._
    val dir = tmp("graft-crashprop")
    val store = new DurableState(spark, dir)
    store.commit(0L, Map("s" -> Seq((1L, "a")).toDF("k", "v")))
    case object Boom extends RuntimeException("injected crash")
    // crash at the LAST pre-flip point (segments + tmp manifest all
    // written, rename not executed) — the worst wreckage a pre-flip
    // death can leave; repeat across several batches so leftovers pile
    for (b <- 1L to 4L) {
      store.beforeFlip = () => throw Boom
      intercept[Boom.type] {
        store.commit(b, Map("s" -> Seq((b * 10, s"crash$b")).toDF("k", "v")))
      }
      store.beforeFlip = () => ()
      // prior state intact through a FRESH handle (what a restart sees)
      val re = new DurableState(spark, dir)
      assert(re.committed === Some((0L, 1L)),
        s"crashed commit of batch $b moved the committed version")
      assert(re.loadAll()("s").collect().map(_.toSeq).toSeq === Seq(Seq(1L, "a")))
    }
    // the stream then redelivers and proceeds: batches 1..4 commit
    // cleanly, each commit's GC clearing the wreckage of its own and
    // earlier batches (later batches' leftovers are deliberately kept —
    // they are indistinguishable from a pipelined committer's
    // in-flight files — and age out as the batch sequence passes them)
    for (b <- 1L to 4L)
      store.commit(b, Map("s" -> Seq((b * 10, s"clean$b")).toDF("k", "v")))
    assert(store.committed === Some((4L, 5L)))
    assert(store.loadAll()("s").collect().map(_.toSeq).toSeq === Seq(Seq(40L, "clean4")))
    val names = new java.io.File(dir).list().toSet
    assert(!names.exists(_.startsWith("_latest.tmp.")),
      s"crash-leftover tmp manifests survived GC: $names")
    assert(names.count(_.startsWith("commit=")) === 1,
      s"unreferenced crash-leftover commit dirs survived GC: $names")
  }

  test("DurableState: two interleaved committers of one batchId — exactly one wins, the loser THROWS, state is never torn (r17 directive 5)") {
    import spark.implicits._
    val dir = tmp("graft-race")
    val a = new DurableState(spark, dir)
    val b = new DurableState(spark, dir)
    a.commit(0L, Map("s" -> Seq((1L, "base")).toDF("k", "v")))
    // B passes its redelivery check, writes its segments and tmp, and
    // THEN (inside its pre-flip window) A commits the same batch —
    // the zombie-driver-vs-replacement interleaving
    b.beforeFlip = () => {
      b.beforeFlip = () => () // A must flip for real, once
      a.commit(1L, Map("s" -> Seq((2L, "winner")).toDF("k", "v")))
    }
    val e = intercept[IllegalStateException] {
      b.commit(1L, Map("s" -> Seq((2L, "loser")).toDF("k", "v")))
    }
    assert(e.getMessage.contains("conflicting committer"),
      s"loser failed for the wrong reason: ${e.getMessage}")
    // the winner's state is visible and untorn, through a fresh handle
    val re = new DurableState(spark, dir)
    assert(re.committed === Some((1L, 2L)))
    assert(re.loadAll()("s").collect().map(_.toSeq).toSeq === Seq(Seq(2L, "winner")),
      "the losing committer's data leaked into committed state")
    // and the next commit GCs the loser's unreferenced segments
    re.commit(2L, Map("s" -> Seq((3L, "next")).toDF("k", "v")))
    val names = new java.io.File(dir).list().toSet
    assert(names.count(_.startsWith("commit=")) === 1,
      s"the losing attempt's segment dir survived GC: $names")
  }

  test("DurableState: a crash between flip and GC (two manifests) resolves to the max version") {
    import spark.implicits._
    val dir = tmp("graft-twoman")
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$dir/commit=0/s")
    Seq((2L, "b")).toDF("k", "v").write.parquet(s"$dir/commit=1/s")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_latest.v0"),
      "0 1\ns commit=0/s".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_latest.v1"),
      "1 2\ns commit=1/s".getBytes("UTF-8"))
    val store = new DurableState(spark, dir)
    assert(store.committed === Some((1L, 2L)))
    assert(store.loadAll()("s").collect().map(_.toSeq).toSeq === Seq(Seq(2L, "b")))
  }

  test("DurableState: stray non-numeric _latest.v* files never brick reads (round-15 ADVICE)") {
    import spark.implicits._
    val dir = tmp("graft-stray")
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$dir/commit=0/s")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_latest.v0"),
      "0 1\ns commit=0/s".getBytes("UTF-8"))
    // editor backup + copy artifact: the old `.toLong` parse threw
    // NumberFormatException and permanently bricked the store
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_latest.v0~"), Array[Byte]())
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_latest.v3 (1)"), Array[Byte]())
    val store = new DurableState(spark, dir)
    assert(store.committed === Some((0L, 1L)),
      "non-conforming names must be ignored, not parsed")
    assert(store.loadAll()("s").collect().map(_.toSeq).toSeq === Seq(Seq(1L, "a")))
  }

  test("DurableState.commitDelta: segments accrue, compact at the cadence, and GC drops stale dirs") {
    import spark.implicits._
    val dir = tmp("graft-delta")
    val store = new DurableState(spark, dir)
    store.commitDelta(0L, Map("f" -> Seq(1L).toDF("v")), compactEvery = 3)
    store.commitDelta(1L, Map("f" -> Seq(2L).toDF("v")), compactEvery = 3)
    // segment dirs carry a per-attempt nonce (r18's conflict-detection
    // layout) — assert on the batch prefix
    def segBatches(name: String): Seq[String] =
      store.segments(name).map(_.takeWhile(_ != '-'))
    assert(segBatches("f") === Seq("commit=0", "commit=1"),
      "two deltas under the cadence stay separate segments")
    // third delta hits the cadence: the commit rewrites the union as ONE segment
    store.commitDelta(2L, Map("f" -> Seq(3L).toDF("v")), compactEvery = 3)
    assert(segBatches("f") === Seq("commit=2"))
    assert(store.loadAll()("f").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L),
      "compaction must preserve the union")
    val dirs = new java.io.File(dir).list().filter(_.startsWith("commit="))
      .map(_.takeWhile(_ != '-')).toSet
    assert(dirs === Set("commit=2"), s"stale delta dirs must be GC'd, got $dirs")
  }

  test("delta sinks write O(batch), not O(history): per-commit bytes stay flat over 3 batches") {
    import spark.implicits._
    val dir = tmp("graft-obatch")
    val dc = new DurableSinks.DurableDistinctCountSink(spark, dir)
    def batch(day: String, lo: Long) =
      spark.range(lo, lo + 50000L).select(lit(day).as("day"), col("id").as("user_id"))
    def commitBytes(id: Long): Long = {
      // nonce'd dir layout: resolve commit=<id>-<nonce> by prefix
      val d = new java.io.File(dir).list()
        .find(n => n == s"commit=$id" || n.startsWith(s"commit=$id-"))
        .getOrElse(fail(s"no commit dir for batch $id"))
      val p = new org.apache.hadoop.fs.Path(s"$dir/$d")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    }
    dc.apply(batch("d0", 0L), 0L)
    dc.apply(batch("d1", 100000L), 1L)
    dc.apply(batch("d2", 200000L), 2L)
    val b0 = commitBytes(0L); val b2 = commitBytes(2L)
    // the old whole-frame layer rewrote history every commit: batch 2
    // carried 3 days of keys (~3× batch 0). Deltas must stay ~flat.
    assert(b2 < (b0 * 3) / 2,
      s"commit 2 wrote $b2 bytes vs commit 0's $b0 — state I/O is not O(batch)")
    val got = dc.result.get.orderBy("day").collect().map(_.toSeq).toSeq
    assert(got === Seq(Seq("d0", 50000L, 0L), Seq("d1", 50000L, 1L),
      Seq("d2", 50000L, 2L)))
  }

  test("time travel (st22): retention keeps old versions readable, asOf resolves max-version-<=-b") {
    import spark.implicits._
    val dir = tmp("graft-asof")
    val store = new DurableState(spark, dir, retainVersions = 2)
    store.commit(0L, Map("s" -> Seq((1L, "a")).toDF("k", "v")))
    store.commit(1L, Map("s" -> Seq((1L, "a"), (2L, "b")).toDF("k", "v")))
    store.commit(2L, Map("s" -> Seq((3L, "c")).toDF("k", "v")))
    // retention = 2: versions 1 and 2 live, version 0 aged out
    assert(store.asOf(0L).isEmpty, "version 0 must be GC'd past the retention window")
    assert(store.asOf(1L)("s").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L),
      "asOf(1) must read version 1's whole-frame segment even after commit 2 replaced it")
    assert(store.asOf(2L)("s").collect().map(_.getLong(0)).toSeq === Seq(3L))
    assert(store.asOf(99L)("s").collect().map(_.getLong(0)).toSeq === Seq(3L),
      "asOf past the head resolves to the newest version")
    // a reader with default retention on the SAME store must still see both
    assert(new DurableState(spark, dir).asOf(1L)("s").count() === 2L)
  }

  test("time travel: an old version survives a compaction that rewrote its segments") {
    import spark.implicits._
    val dir = tmp("graft-asof-compact")
    val store = new DurableState(spark, dir, retainVersions = 3)
    store.commitDelta(0L, Map("f" -> Seq(1L).toDF("v")), compactEvery = 3)
    store.commitDelta(1L, Map("f" -> Seq(2L).toDF("v")), compactEvery = 3)
    // batch 2 compacts: the head manifest references ONLY commit=2/f,
    // but version 1 still lists commit=0/f + commit=1/f — retention GC
    // must keep those dirs alive for the as-of read.
    store.commitDelta(2L, Map("f" -> Seq(3L).toDF("v")), compactEvery = 3)
    assert(store.segments("f").map(_.takeWhile(_ != '-')) === Seq("commit=2"))
    assert(store.asOf(1L)("f").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L),
      "pre-compaction segments must stay readable while a retained manifest lists them")
    assert(store.asOf(2L)("f").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    // default retention (1): the same sequence GCs everything but the head
    val dir1 = tmp("graft-asof-r1")
    val s1 = new DurableState(spark, dir1)
    s1.commitDelta(0L, Map("f" -> Seq(1L).toDF("v")), compactEvery = 3)
    s1.commitDelta(1L, Map("f" -> Seq(2L).toDF("v")), compactEvery = 3)
    assert(s1.asOf(0L).isEmpty && s1.asOf(1L)("f").count() === 2L)
  }

  test("time travel: DurableUpsertSink.snapshotAsOf equals the latest-row window over the log prefix") {
    import spark.implicits._
    val dir = tmp("graft-asof-upsert")
    val sink = new DurableSinks.DurableUpsertSink(spark, dir,
      Seq("k"), Seq(col("ms")), retainVersions = 3)
    def b(rows: (Long, Long, String)*) = rows.toSeq.toDF("k", "ms", "v")
    sink.apply(b((1L, 10L, "a"), (2L, 10L, "x")), 0L)
    sink.apply(b((1L, 20L, "b"), (3L, 20L, "y")), 1L)
    sink.apply(b((2L, 30L, "z")), 2L)
    def snap(id: Long) = sink.snapshotAsOf(id).get.orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(snap(0L) === Seq((1L, "a"), (2L, "x")))
    assert(snap(1L) === Seq((1L, "b"), (2L, "x"), (3L, "y")),
      "as-of 1 must merge version 1's RETAINED delta list, not the head's")
    assert(snap(2L) === Seq((1L, "b"), (2L, "z"), (3L, "y")))
    assert(sink.snapshot.get.count() === 3L)
  }

  test("time travel property: random commit/delta/compact sequences match an in-memory version model") {
    import spark.implicits._
    // Model: version -> expected multiset of longs, for every batch
    // ever committed. After each commit, every version inside the
    // retention window must read back exactly its model state via
    // asOf, and every aged-out version must read empty — under
    // whole-frame commits, delta commits, and cadence compactions
    // interleaved by a seeded RNG (the GC's segment-union-across-
    // retained-manifests logic is the code under test).
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 4) {
      val retain = 1 + rnd.nextInt(3) // 1..3
      val dir = tmp(s"graft-asof-prop$trial")
      val store = new DurableState(spark, dir, retainVersions = retain)
      val model = scala.collection.mutable.Map.empty[Long, Seq[Long]]
      var state = Seq.empty[Long]
      val nBatches = 5 + rnd.nextInt(4)
      for (b <- 0L until nBatches.toLong) {
        val vals = Seq.fill(1 + rnd.nextInt(3))(rnd.nextLong(1000))
        if (rnd.nextBoolean()) { // whole-frame replace
          state = vals
          store.commit(b, Map("f" -> vals.toDF("v")))
        } else { // delta append, sometimes forcing a compaction
          state = state ++ vals
          store.commitDelta(b, Map("f" -> vals.toDF("v")),
            compactEvery = if (rnd.nextBoolean()) 2 else 8)
        }
        model(b) = state
        for (v <- 0L to b) {
          val got = store.asOf(v)
          if (v <= b - retain)
            assert(got.isEmpty,
              s"trial $trial: version $v should be aged out at head $b (retain $retain)")
          else
            assert(got("f").collect().map(_.getLong(0)).sorted.toSeq ===
              model(v).sorted,
              s"trial $trial: asOf($v) at head $b (retain $retain) diverged from the model")
        }
      }
    }
  }

  test("time travel property: held asOf handles survive upsert/compact/GC interleavings (>=100 random schedules)") {
    import spark.implicits._
    // r15 VERDICT directive 8: the sequential GC model test above
    // covers retain/GC after each commit; this one covers the
    // CONCURRENT-reader claim — "compaction can't strand a retained
    // version" — by taking LAZY asOf handles mid-schedule and
    // consuming them only after later upserts, cadence compactions,
    // and their GCs have all run. An interleaving = one handle
    // consumed at a strictly later head than it was taken at (i.e.
    // with at least one commit+GC — and at compactEvery 2, usually a
    // segment rewrite — in between). Handles whose version ages out of
    // the window are discarded unconsumed: reading past retention is
    // documented FileNotFound (DurableState.asOf's lifetime caveat),
    // not a correctness surface.
    val rnd = new scala.util.Random(20260817L)
    val latest = (df: DataFrame) =>
      graft.operators.Upsert.latestSnapshot(df, Seq("k"), Seq(col("ms")))
    var interleavings = 0
    for (trial <- 0 until 60) {
      val retain = 1 + rnd.nextInt(3)
      val compactEvery = Seq(2, 3, 8)(rnd.nextInt(3))
      val dir = tmp(s"graft-asof-conc$trial")
      val store = new DurableState(spark, dir, retainVersions = retain)
      val model = scala.collection.mutable.Map.empty[Long, Map[Long, Long]]
      var state = Map.empty[Long, Long] // key -> latest ms
      var ms = 0L
      val held = scala.collection.mutable.ArrayBuffer.empty[(Long, DataFrame)]
      def consume(v: Long, f: DataFrame, head: Long): Unit = {
        val got = latest(f).select(col("k"), col("ms")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === model(v),
          s"trial $trial: held asOf($v) consumed at head $head " +
            s"(retain $retain, compactEvery $compactEvery) diverged from the model")
        if (head > v) interleavings += 1
      }
      val nBatches = 3 + rnd.nextInt(3)
      for (b <- 0L until nBatches.toLong) {
        val rows = Seq.fill(1 + rnd.nextInt(2)) {
          ms += 1; (rnd.nextInt(4).toLong, ms)
        }
        if (rnd.nextInt(4) == 0) { // whole-frame replace (O(state) commit)
          state = rows.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).max }
          store.commit(b, Map("snap" -> latest(rows.toDF("k", "ms"))))
        } else { // delta upsert — the DurableUpsertSink fold
          state = state ++ rows.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).max }
          store.commitDelta(b, Map("snap" -> rows.toDF("k", "ms")),
            compactEvery = compactEvery, reduce = Map("snap" -> latest))
        }
        model(b) = state
        store.asOf(b).get("snap").foreach(f => held += ((b, f)))
        // consume one OLD handle (taken at an earlier head) whenever
        // one is still retained — each such consume is an interleaving
        val live = held.filter(h => h._1 > b - retain && h._1 < b)
        if (live.nonEmpty) {
          val (v, f) = live(rnd.nextInt(live.size))
          consume(v, f, b)
        }
        held.filterInPlace(_._1 > b - retain)
      }
      // drain: every handle still inside the window must read its
      // model state after the final commit's compaction+GC
      held.foreach { case (v, f) => consume(v, f, nBatches - 1L) }
    }
    assert(interleavings >= 100,
      s"only $interleavings cross-commit handle consumes — raise trials")
  }

  test("durable upsert: merge-on-read deltas, reducing compaction keeps one row per live key") {
    import spark.implicits._
    val dir = tmp("graft-updelta")
    val sink = new DurableSinks.DurableUpsertSink(spark, dir,
      Seq("user_id"), Seq(col("ms"), col("event_id")))
    val mem = new Streams.UpsertSink(Seq("user_id"), Seq(col("ms"), col("event_id")))
    // the same 50 keys updated every batch — the worst case for a
    // whole-frame rewrite (state never shrinks), the best showcase for
    // deltas (each commit carries only the batch)
    (0L until 9L).foreach { i =>
      val b = (0L until 50L).map(k => (k, i * 100 + k, i, s"v${i}_$k"))
        .toDF("user_id", "ms", "event_id", "v")
      sink.apply(b, i); mem.apply(b, i)
    }
    assert(sink.snapshot.get.orderBy("user_id").collect().map(_.toSeq).toSeq ===
      mem.snapshot.get.orderBy("user_id").collect().map(_.toSeq).toSeq,
      "merge-on-read snapshot must equal the in-memory twin after 9 folds")
    // compaction fired at the 8-segment cadence AND reduced: state
    // rows stay O(live keys), not O(batches · keys)
    val store = new DurableState(spark, dir)
    val segs = store.segments("snap")
    assert(segs.size === 2, s"expected compacted base + one delta, got $segs")
    assert(store.loadAll()("snap").count() === 100L,
      "compacted base must hold ONE row per live key (50) + the post-compaction delta (50)")
  }

  test("replayed batchIds are no-ops: kmv, rollup, and distinct sinks absorb redelivery") {
    import spark.implicits._
    val b0 = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("event_type", "user_id")
    val b1 = Seq(("a", 4L), ("b", 1L)).toDF("event_type", "user_id")
    val kmv = new DurableSinks.DurableKmvSink(spark, tmp("graft-kmv"))
    kmv.apply(b0, 0L); kmv.apply(b1, 1L)
    val before = kmv.snapshot.get.collect().map(_.toSeq).toSet
    kmv.apply(b1, 1L) // redelivery of the SAME batch
    kmv.apply(b0, 0L) // and of an older one
    assert(kmv.snapshot.get.collect().map(_.toSeq).toSet === before)

    val r0 = Seq((1L, "a", 1.5, 100L), (2L, "b", 2.0, 150L))
      .toDF("user_id", "event_type", "value", "ms")
    val r1 = Seq((1L, "a", 4.0, 300L)).toDF("user_id", "event_type", "value", "ms")
    val roll = new DurableSinks.DurableRollupSink(spark, tmp("graft-roll"),
      Seq("user_id", "event_type"), "value", "ms")
    roll.apply(r0, 0L); roll.apply(r1, 1L)
    val rBefore = roll.snapshot.get.collect().map(_.toSeq).toSet
    roll.apply(r1, 1L)
    assert(roll.snapshot.get.collect().map(_.toSeq).toSet === rBefore)

    val d0 = Seq(("d1", 1L), ("d1", 2L)).toDF("day", "user_id")
    val d1 = Seq(("d1", 2L), ("d2", 2L)).toDF("day", "user_id")
    val dc = new DurableSinks.DurableDistinctCountSink(spark, tmp("graft-dc"))
    dc.apply(d0, 0L); dc.apply(d1, 1L)
    val dBefore = dc.result.get.collect().map(_.toSeq).toSet
    dc.apply(d1, 1L) // a replayed fold must not bump first_batch ordinals
    assert(dc.result.get.collect().map(_.toSeq).toSet === dBefore)
    assert(dBefore === Set(Seq("d1", 2L, 0L), Seq("d2", 1L, 1L)))
  }

  test("st20 durable KMV: file source + checkpoint, kill, FRESH instance resumes to the batch twin") {
    import spark.implicits._
    val src = tmp("graft-src")
    val cp = tmp("graft-cp")
    val state = tmp("graft-state")
    val slice1 = (1L to 400L).map(u => (s"t${u % 3}", u))
    val slice2 = (300L to 700L).map(u => (s"t${u % 3}", u)) // overlap: dedup matters
    val schema = slice1.toDF("event_type", "user_id").schema

    def run(sink: DurableSinks.DurableKmvSink): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch((b: DataFrame, id: Long) => sink.apply(b, id))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    slice1.toDF("event_type", "user_id").write.mode("append").parquet(src)
    run(new DurableSinks.DurableKmvSink(spark, state)) // first life: consume slice1, die
    slice2.toDF("event_type", "user_id").write.mode("append").parquet(src)
    val second = new DurableSinks.DurableKmvSink(spark, state) // new JVM: no memory
    run(second) // resumes from the checkpoint: must NOT re-read slice1's files
    val got = second.snapshot.get.orderBy("event_type").collect().map(_.toSeq).toSeq
    val want = Streams.kmvFinish(Streams.kmvState(
        (slice1 ++ slice2).toDF("event_type", "user_id")))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(got === want, "resumed durable sketch diverged from the one-shot batch twin")
  }

  test("st14 durable rollup and st17 durable distinct: kill/resume equals the batch twin; fold ordinal survives") {
    import spark.implicits._
    // rollup
    val all = Seq(
      (1L, "a", java.lang.Double.valueOf(1.5), 100L),
      (2L, "b", null.asInstanceOf[java.lang.Double], 150L),
      (1L, "b", java.lang.Double.valueOf(4.0), 300L),
      (2L, "b", java.lang.Double.valueOf(6.0), 400L))
    val rollDir = tmp("graft-roll2")
    val first = new DurableSinks.DurableRollupSink(spark, rollDir,
      Seq("user_id", "event_type"), "value", "ms")
    first.apply(all.take(2).toDF("user_id", "event_type", "value", "ms"), 0L)
    // kill; resume with a fresh instance over the same store
    val resumed = new DurableSinks.DurableRollupSink(spark, rollDir,
      Seq("user_id", "event_type"), "value", "ms")
    resumed.apply(all.drop(2).toDF("user_id", "event_type", "value", "ms"), 1L)
    val ord = Seq(col("user_id"), col("event_type"))
    val got = resumed.snapshot.get.orderBy(ord: _*).collect().map(_.toSeq).toSeq
    val want = graft.operators.Upsert.rollupFinish(graft.operators.Upsert.rollupState(
        all.toDF("user_id", "event_type", "value", "ms"),
        Seq("user_id", "event_type"), "value", "ms"))
      .orderBy(ord: _*).collect().map(_.toSeq).toSeq
    assert(got === want)

    // distinct: first_batch ordinals must keep counting across the restart
    val dcDir = tmp("graft-dc2")
    val dc1 = new DurableSinks.DurableDistinctCountSink(spark, dcDir)
    dc1.apply(Seq(("d1", 1L)).toDF("day", "user_id"), 0L)
    val dc2 = new DurableSinks.DurableDistinctCountSink(spark, dcDir)
    dc2.apply(Seq(("d1", 1L), ("d2", 5L)).toDF("day", "user_id"), 1L)
    val rows = dc2.result.get.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows === Map("d1" -> ((1L, 0L)), "d2" -> ((1L, 1L))),
      "fold ordinal must survive the restart (d2 first seen by fold 1, not 0)")
  }

  test("st12 durable upsert and st16 durable dedup-admission: kill/resume equals the in-memory twins") {
    import spark.implicits._
    // upsert
    val upDir = tmp("graft-up")
    val u0 = Seq((1L, 100L, 10L, "a"), (2L, 150L, 11L, "b"))
      .toDF("user_id", "ms", "event_id", "v")
    val u1 = Seq((1L, 200L, 12L, "c"), (3L, 50L, 13L, "d"))
      .toDF("user_id", "ms", "event_id", "v")
    val up1 = new DurableSinks.DurableUpsertSink(spark, upDir,
      Seq("user_id"), Seq(col("ms"), col("event_id")))
    up1.apply(u0, 0L)
    val up2 = new DurableSinks.DurableUpsertSink(spark, upDir,
      Seq("user_id"), Seq(col("ms"), col("event_id")))
    up2.apply(u1, 1L)
    val mem = new Streams.UpsertSink(Seq("user_id"), Seq(col("ms"), col("event_id")))
    mem.apply(u0, 0L); mem.apply(u1, 1L)
    assert(up2.snapshot.get.orderBy("user_id").collect().map(_.toSeq).toSeq ===
      mem.snapshot.get.orderBy("user_id").collect().map(_.toSeq).toSeq)

    // dedup admission: doc 3 is a near-dup of doc 1 ACROSS the restart
    // boundary — the resumed index must still catch it
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val ddDir = tmp("graft-dd")
    val b0 = Seq((1L, base), (2L, "completely different text about spark and catalyst planning"))
      .toDF("doc_id", "text")
    val b1 = Seq((3L, base + " x"), (4L, "another unrelated document entirely about parquet files"))
      .toDF("doc_id", "text")
    val dd1 = new DurableSinks.DurableDedupAdmissionSink(spark, ddDir)
    dd1.apply(b0, 0L)
    val dd2 = new DurableSinks.DurableDedupAdmissionSink(spark, ddDir)
    dd2.apply(b1, 1L)
    val memDd = new Streams.DedupAdmissionSink()
    memDd.apply(b0, 0L); memDd.apply(b1, 1L)
    val gotD = dd2.decisions.get.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val wantD = memDd.decisions.get.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(gotD === wantD)
    val admitted = gotD.map(r => r.head -> r(1)).toMap
    assert(admitted(3L) === false,
      "near-dup arriving after the restart must be rejected by the RESUMED index")

    // histogram
    val hDir = tmp("graft-h")
    val h0 = Seq(("a", 1.0, 100L), ("a", 2.0, 110L)).toDF("event_type", "value", "ms")
    val h1 = Seq(("a", 50.0, 120L), ("b", 3.0, 130L)).toDF("event_type", "value", "ms")
    val hs1 = new DurableSinks.DurableHistogramSink(spark, hDir)
    hs1.apply(h0, 0L)
    val hs2 = new DurableSinks.DurableHistogramSink(spark, hDir)
    hs2.apply(h1, 1L)
    val memH = new Streams.HistogramSink
    memH.apply(h0, 0L); memH.apply(h1, 1L)
    assert(hs2.snapshot.get.orderBy("event_type").collect().map(_.toSeq).toSeq ===
      memH.snapshot.get.orderBy("event_type").collect().map(_.toSeq).toSeq)
  }
}
