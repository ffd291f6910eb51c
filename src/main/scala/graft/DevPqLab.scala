package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev probe for s18's learned-PQ operating point. The registered
  * s16/s18 audits use 5 queries (15 hit slots) — far too noisy to
  * rank codebooks (readings swung 0.33-0.73 across SFs). This probe
  * A/Bs the stand-in vs the learned codebook on a ~60-query held-out
  * split (queries = every 8th corpus id, corpus = the rest) at beam
  * C=24, per iteration count. A dev main like DevProbeLab. */
object DevPqLab {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, dir)
    // held-out split big enough to rank codebooks: queries = every 8th
    // id ≥ 16 (capped 60), corpus = the remaining ids ≥ 16
    val q = e.filter(col("vec_id") >= 16 && col("vec_id") % 8 === 0)
      .orderBy(col("vec_id")).limit(60)
      .select(col("vec_id").as("id"), col("embedding"))
    val corpus = e.filter(col("vec_id") >= 16 && col("vec_id") % 8 =!= 0)
      .select(col("vec_id").as("id"), col("embedding"))
    val ex = Similarity.cosineTopK(q, corpus, 3).select(col("q_id"), col("cand_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def recallOf(pq: org.apache.spark.sql.DataFrame): Double = {
      val got = pq.select(col("q_id"), col("cand_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      ex.count(got.contains).toDouble / ex.size
    }

    val standIn = Similarity.pqAdcRerankTopKFused(q, corpus,
      e.filter(col("vec_id") < 16).select(col("vec_id").as("id"), col("embedding")),
      3, 24)
    println(f"[pqlab] queries=${ex.size / 3} stand-in recall=${recallOf(standIn)}%.3f")

    val seedHash = (id: org.apache.spark.sql.Column) =>
      pmod(id * 48271L + 11L, lit(2147483647L))
    (0 to 4).foreach { it =>
      val cents = Similarity.trainPqCodebooks(corpus, 8, 8, Similarity.PqLearnK, it, seedHash)
      val flat = Similarity.flattenPqCodebooks(cents, 8, 8, Similarity.PqLearnK)
      val pq = Similarity.pqAdcRerankTopKFlat(q, corpus, flat, Similarity.PqLearnK, 3, 24, 8, 8)
      println(f"[pqlab] iters=$it learned recall=${recallOf(pq)}%.3f")
    }
    spark.stop()
  }
}
