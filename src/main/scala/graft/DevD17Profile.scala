package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Dev-only throwaway: stage-by-stage wall for d17's pipeline. */
object DevD17Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx10")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import Dedup._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d17prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = Tables.embeddings(spark, dir)
    val n = t("count") { e.filter(expr("aggregate(transform(embedding, x -> cast(x as double) * x), 0D, (a,b) -> a+b)") > 0).count() }
    val k = sizedCells(n, 25)
    println(s"[d17prof] n=$n k=$k planes=${Similarity.sizedPlanes(k.toLong, 8)}")
    val base = e.select(col("vec_id").as("id"), col("embedding"))
      .filter(expr("aggregate(transform(embedding, x -> cast(x as double) * x), 0D, (a,b) -> a+b)") > 0)
      .localCheckpoint(false)
    val seedHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      id => pmod(id * 48271L + 11L, lit(2147483647L))
    for (it <- 0 to 3) t(s"trainCodebook(iters=$it)") {
      Similarity.trainCodebook(base, k, it, seedHash, Some(2)).count()
    }
    val cents = t("trainCodebook(iters)") {
      val c = broadcast(Similarity.trainCodebook(base, k, SemIters, seedHash, Some(2))
        .select(col("id").as("cid"), col("embedding").as("cemb")))
      c.count(); c
    }
    val assigned = t("annAssign") {
      val a = Similarity.annAssign(base, cents.select(col("cid"), col("cemb")),
        Similarity.sizedPlanes(k.toLong, 8), 2)
        .select(col("id"), col("cell"), col("embedding")).localCheckpoint(false)
      a.count(); a
    }
    val recomputed = t("centroid-recompute (one round)") {
      val c = assigned.filter(col("cell") >= 0)
        .select(col("cell").as("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg((sum(col("x").cast("double").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m").cast("float")).as("cemb"))
        .localCheckpoint()
      c.count(); c
    }
    t("annAssign again (vs recomputed cents)") {
      Similarity.annAssign(base, recomputed.select(col("cid"), col("cemb")),
        Similarity.sizedPlanes(k.toLong, 8), 2).count()
    }
    t("pairs+window") {
      val wCap = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cell")).orderBy(col("id"))
      val capped = assigned.filter(col("cell") >= 0)
        .withColumn("__rk", row_number().over(wCap))
        .filter(col("__rk") <= MaxBucket).drop("__rk")
      val a = capped.select(col("cell"), col("id").as("id_a"), col("embedding").as("ea"))
      val b = capped.select(col("cell"), col("id").as("id_b"), col("embedding").as("eb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b"))
      a.join(b, Seq("cell")).filter(col("id_b") < col("id_a"))
        .withColumn("cos", graft.functions.VectorFunctions.cosineAuto(spark, col("ea"), col("eb")))
        .filter(col("cos") >= SemTau)
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .count()
    }
    spark.stop()
  }
}
