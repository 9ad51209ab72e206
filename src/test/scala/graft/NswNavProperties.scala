package graft

import graft.db.NswNavBuilder
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the per-block NSW navigator — no
  * SparkSession: blocks are raw primitive arrays, so hundreds of random
  * geometries run in seconds.
  *
  * The load-bearing property is the EXACTNESS contract
  * ([[graft.db.BlockNav]] Scaladoc): at `efSearch ≥ n` (or `b ≥ n`) the
  * graph search must reproduce brute force bit for bit — reachable-set
  * exhaustion plus the linear sweep of pruning-orphaned rows — for any
  * block content, any (m, efConstruction) geometry, any id assignment
  * (including duplicate codes → hamming ties broken by id), and any
  * admit predicate.
  */
object NswNavProperties extends Properties("graft.nswnav") {

  private case class Geom(n: Int, nWords: Int, m: Int, efC: Int, seed: Long)

  private val geomGen: Gen[Geom] = for {
    n <- Gen.chooseNum(1, 400)
    nWords <- Gen.oneOf(1, 2, 16)
    m <- Gen.chooseNum(1, 8)
    efC <- Gen.chooseNum(m, 40)
    seed <- Gen.chooseNum(0L, 1000L)
  } yield Geom(n, nWords, m, efC, seed)

  private def block(g: Geom): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(g.seed)
    // shuffled ids (row order ≠ id order) and clustered-ish codes with
    // deliberate duplicates (ties must break on id)
    val ids = rnd.shuffle((1L to g.n.toLong).toVector).toArray
    val centers = Array.fill(math.max(g.n / 20, 1) * g.nWords)(rnd.nextLong())
    val words = new Array[Long](g.n * g.nWords)
    var r = 0
    while (r < g.n) {
      val c = rnd.nextInt(math.max(g.n / 20, 1)) * g.nWords
      var w = 0
      while (w < g.nWords) {
        // flip a few bits off the cluster center; sometimes none (dups)
        val flips = if (rnd.nextInt(4) == 0) 0L else rnd.nextLong() & rnd.nextLong() & rnd.nextLong()
        words(r * g.nWords + w) = centers(c + w) ^ flips
        w += 1
      }
      r += 1
    }
    (ids, words)
  }

  private def brute(ids: Array[Long], words: Array[Long], nWords: Int,
                    q: Array[Long], b: Int,
                    admit: Int => Boolean): Seq[(Int, Long)] =
    ids.indices.filter(admit).map { r =>
      var acc = 0
      var w = 0
      while (w < nWords) {
        acc += java.lang.Long.bitCount(words(r * nWords + w) ^ q(w)); w += 1
      }
      (acc, ids(r))
    }.sorted.take(b)

  property("exact at efSearch >= n, any geometry, unfiltered") =
    forAll(geomGen) { g =>
      val (ids, words) = block(g)
      val nav = new NswNavBuilder(g.m, g.efC, g.n).build(ids, words, g.nWords)
      val rnd = new scala.util.Random(g.seed + 1)
      val q = Array.fill(g.nWords)(rnd.nextLong())
      val b = math.min(7, g.n)
      val got = nav.topPacked(q, b, _ => true).map { p =>
        ((p >>> 32).toInt, ids((p & 0xffffffffL).toInt))
      }.toSeq
      got == brute(ids, words, g.nWords, q, b, _ => true)
    }

  property("exact at efSearch >= n under a selective admit filter") =
    forAll(geomGen) { g =>
      val (ids, words) = block(g)
      val nav = new NswNavBuilder(g.m, g.efC, g.n).build(ids, words, g.nWords)
      val rnd = new scala.util.Random(g.seed + 2)
      val q = Array.fill(g.nWords)(rnd.nextLong())
      val admit: Int => Boolean = r => ids(r) % 3 == 0
      val got = nav.topPacked(q, 5, admit).map { p =>
        ((p >>> 32).toInt, ids((p & 0xffffffffL).toInt))
      }.toSeq
      got == brute(ids, words, g.nWords, q, 5, admit)
    }

  property("b >= n returns every admitted row, ranked") =
    forAll(geomGen) { g =>
      val (ids, words) = block(g)
      val nav = new NswNavBuilder(g.m, g.efC, 1).build(ids, words, g.nWords)
      val rnd = new scala.util.Random(g.seed + 3)
      val q = Array.fill(g.nWords)(rnd.nextLong())
      // b >= n forces ef >= n even with efSearch = 1
      val got = nav.topPacked(q, g.n, _ => true).map { p =>
        ((p >>> 32).toInt, ids((p & 0xffffffffL).toInt))
      }.toSeq
      got == brute(ids, words, g.nWords, q, g.n, _ => true)
    }

  property("threaded build stays exact at efSearch >= n (any interleaving)") =
    forAll(geomGen) { g0 =>
      // force the parallel path: n above the sequential-fallback floor
      val g = g0.copy(n = g0.n + 2048)
      val (ids, words) = block(g)
      val nav = new NswNavBuilder(g.m, g.efC, g.n, buildThreads = 4)
        .build(ids, words, g.nWords)
      val rnd = new scala.util.Random(g.seed + 5)
      val q = Array.fill(g.nWords)(rnd.nextLong())
      val got = nav.topPacked(q, 7, _ => true).map { p =>
        ((p >>> 32).toInt, ids((p & 0xffffffffL).toInt))
      }.toSeq
      got == brute(ids, words, g.nWords, q, 7, _ => true)
    }

  property("approximate results are always a ranked subset of the block") =
    forAll(geomGen) { g =>
      val (ids, words) = block(g)
      // narrow width on purpose: results may MISS rows but must stay
      // rank-sorted, unique, and correctly scored
      val nav = new NswNavBuilder(g.m, g.efC, 4).build(ids, words, g.nWords)
      val rnd = new scala.util.Random(g.seed + 4)
      val q = Array.fill(g.nWords)(rnd.nextLong())
      val got = nav.topPacked(q, 5, _ => true).map { p =>
        ((p >>> 32).toInt, (p & 0xffffffffL).toInt)
      }.toSeq
      val scored = got.map { case (h, r) =>
        var acc = 0
        var w = 0
        while (w < g.nWords) {
          acc += java.lang.Long.bitCount(words(r * g.nWords + w) ^ q(w)); w += 1
        }
        (h, acc, ids(r))
      }
      scored.forall { case (h, real, _) => h == real } &&
        scored.map { case (h, _, id) => (h, id) } ==
          scored.map { case (h, _, id) => (h, id) }.sorted &&
        got.map(_._2).distinct.length == got.length
    }
}
