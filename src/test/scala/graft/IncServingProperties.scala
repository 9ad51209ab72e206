package graft

import graft.db.VectorDB
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz of the incremental serving chain: random commit
  * sequences (append / overwrite / delete / re-add over a small id
  * space, random batch shapes, searches interleaved at random points
  * so windows span 1..N commits) against the Catalyst path on the same
  * folder — the exact-by-construction twin. Pins the shadowing-map
  * edge cases a scenario spec can miss: an id rewritten in two
  * different layers, deleted then re-added (its latest layer has a row
  * again), a layer whose window is tombstones only, and chains whose
  * retirement interleaves with further commits.
  */
class IncServingProperties extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftincp").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def text(id: Long, gen: Int): String =
    s"w${id % 17} w${(id + gen) % 13} w${id % 7}g$gen w${(id * 3 + gen) % 23}"

  test("random commit interleavings: served chain == Catalyst twin (radius + top-k)") {
    val seeds = 0 until 3
    seeds.foreach { seed =>
      val rnd = new scala.util.Random(1000 + seed)
      val dir = freshDir()
      val db = VectorDB.openOrCreate(spark, dir, storage = VectorDB.StorageMor)
        .incrementalServing(maxChurnFraction = 1.0, maxLayers = 16, absorbDepth = 0)
      val twin = VectorDB.openOrCreate(spark, dir, storage = VectorDB.StorageMor)

      // model of what is live: id -> generation of its latest write
      val live = scala.collection.mutable.Map[Long, Int]()
      var gen = 0

      def commitRandom(): Unit = {
        gen += 1
        val op = rnd.nextInt(3)
        if (op < 2 || live.isEmpty) {
          // upsert: mix of fresh ids and overwrites (re-adds included,
          // since deleted ids return to the pool)
          val fresh = (0 until 5 + rnd.nextInt(20))
            .map(_ => rnd.nextInt(200).toLong).distinct
          db.addDocuments(fresh.map(id => (id, text(id, gen))).toDF("doc_id", "text"))
          fresh.foreach(id => live(id) = gen)
        } else {
          val victims = rnd.shuffle(live.keys.toSeq)
            .take(1 + rnd.nextInt(math.min(8, live.size)))
          db.removeDocs(victims)
          victims.foreach(live.remove)
        }
      }

      db.addDocuments((0L until 40L).map(id => (id, text(id, 0)))
        .toDF("doc_id", "text"))
      (0L until 40L).foreach(id => live(id) = 0)
      db.enableServing()
      try {
        (0 until 8).foreach { step =>
          (0 until 1 + rnd.nextInt(3)).foreach(_ => commitRandom())
          if (live.nonEmpty) {
            val probe = text(rnd.nextInt(200).toLong, rnd.nextInt(gen + 1))
            val served = db.search(probe, k = 15).collect()
              .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("score_hamming"),
                r.getAs[Double]("score_cossim"))).toSeq
            val exact = twin.search(probe, k = 15).collect()
              .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("score_hamming"),
                r.getAs[Double]("score_cossim"))).toSeq
            assert(served == exact,
              s"seed $seed step $step: served chain diverged from Catalyst twin")
            // radius: exhaustive contract over the masked union
            val e = new graft.db.HashingEmbedder()
            val q = spark.range(1).select(
              e.embed(org.apache.spark.sql.functions.lit(probe)).cast("array<double>"))
              .head().getSeq[Double](0)
            assert(db.searchRadius(q, 14) == twin.searchRadius(q, 14),
              s"seed $seed step $step: radius diverged")
            // the served id set must equal the model's live set at full radius
            val all = db.searchRadius(q, 64).map(_._1).toSet
            assert(all == live.keySet.toSet,
              s"seed $seed step $step: live-set mismatch")
          }
        }
      } finally db.disableServing()
    }
  }
}
