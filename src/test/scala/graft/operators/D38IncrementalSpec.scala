package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** d38 incremental BPE training: the per-round affected-word counts must
  * equal exactly the words containing that round's merged pair (the
  * "re-segment only what matched" contract), and the whole trajectory must
  * match an independent driver-side greedy-leftmost simulation.
  */
class D38IncrementalSpec extends SparkSpec {

  private def applyMerge(syms: Vector[String], a: String,
      b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("d38: the incremental and classic trainers walk the identical " +
      "merge trajectory and produce the identical segmentation") {
    val budget = 6
    val (ti, segI, _) =
      TextQueries.bpeTrain(spark, sfDir, budget, forceIncremental = Some(true))
    val (tc, segC, _) =
      TextQueries.bpeTrain(spark, sfDir, budget, forceIncremental = Some(false))
    assert(ti == tc, "trajectories diverge between the two training paths")
    assert(segI.exceptAll(segC).isEmpty && segC.exceptAll(segI).isEmpty,
      "final segmentations diverge between the two training paths")
  }

  test("d38: each round touches exactly the words containing its pair, " +
      "and the trajectory matches a driver-side replay") {
    val budget = 6
    val (traj, _, affCounts) =
      TextQueries.bpeTrain(spark, sfDir, budget, forceIncremental = Some(true))
    assert(traj.nonEmpty && traj.size == affCounts.size)

    // independent reference: collected word counts + sequential replay
    var segs: Map[String, (Long, Vector[String])] =
      RelationalQueries.table(spark, sfDir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getString(0).split("").toVector))
        .toMap
    val vocabWords = segs.size.toLong

    traj.zip(affCounts).foreach { case ((step, a, b, cnt, nTok, nVoc), nAff) =>
      // the argmax itself: recount every adjacent pair and rank by
      // (count desc, pair lexicographic asc) — the engine's delta-
      // maintained totals must produce the same winner
      val allPairs = scala.collection.mutable.Map[(String, String), Long]()
      segs.valuesIterator.foreach { case (f, s) =>
        s.indices.init.foreach { i =>
          val k = (s(i), s(i + 1))
          allPairs(k) = allPairs.getOrElse(k, 0L) + f
        }
      }
      // UTF-8 byte-wise tie order (Spark/DuckDB binary collation), NOT JVM
      // String ordering — so this replay would actually catch an engine
      // that regressed to UTF-16 code-unit tie-breaks on a non-BMP corpus
      val expBest = allPairs.toSeq
        .sortWith { case (((pa, pb), c), ((qa, qb), d)) =>
          if (c != d) c > d
          else {
            val ca = TextQueries.utf8Compare(pa, qa)
            if (ca != 0) ca < 0 else TextQueries.utf8Compare(pb, qb) < 0
          }
        }.head
      assert((a, b) == expBest._1, s"step $step argmax pair")
      // expected pair count and affected set BEFORE this round's merge
      val containing = segs.filter { case (_, (_, s)) =>
        s.indices.init.exists(i => s(i) == a && s(i + 1) == b)
      }
      val expCnt = segs.valuesIterator.map { case (f, s) =>
        f * s.indices.init.count(i => s(i) == a && s(i + 1) == b)
      }.sum
      assert(cnt == expCnt, s"step $step pair count")
      assert(nAff == containing.size.toLong,
        s"step $step: engine touched $nAff words, " +
          s"${containing.size} contain the pair — incrementality broken")
      assert(nAff < vocabWords,
        s"step $step touched the whole vocabulary")
      // replay the merge and check the census
      segs = segs.map { case (w, (f, s)) => w -> (f, applyMerge(s, a, b)) }
      val expTok = segs.valuesIterator.map { case (f, s) => f * s.size }.sum
      val expVoc = segs.valuesIterator.flatMap(_._2).toSet.size.toLong
      assert(nTok == expTok, s"step $step n_tokens")
      assert(nVoc == expVoc, s"step $step n_vocab")
    }
  }
}
