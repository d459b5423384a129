package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for [[KllSampleAgg]]'s core claim: the final state
  * is a pure function of the input MULTISET — invariant to arrival
  * order, partitioning, and merge-tree shape — and always equals the
  * directly-computed {g ≥ L_min} set. Raw ScalaCheck generators with
  * fixed seeds (same convention as FormatterPropertySpec: the
  * scalatest/scalacheck bridge isn't a declared dependency).
  */
class KllSamplePropertySpec extends AnyFunSuite {
  import KllSampleAgg.{GCap, K}

  private val agg = new KllSampleAgg

  /** Random (value, key) multisets: duplicate values guaranteed by a
    * small value range; keys unique-ish but duplicates allowed too
    * (a duplicated key contributes twice, like a retried row would).
    */
  private val itemsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 12000)
    vs <- Gen.listOfN(n, Gen.choose(-500L, 500L))
    ks <- Gen.listOfN(n, Gen.choose(0L, 1000000L))
  } yield vs.zip(ks)

  private def sample(i: Int): List[(Long, Long)] =
    itemsGen.apply(Gen.Parameters.default, Seed(1234L + i)).get

  private def runSplit(items: Seq[(Long, Long)], nSplits: Int): Array[Long] = {
    val parts =
      if (nSplits <= 1 || items.isEmpty) Seq(items)
      else items.grouped(math.max(1, items.size / nSplits)).toSeq
    val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    agg.finish(bufs.reduce(agg.merge))
  }

  /** Direct (non-streaming) reference: L = min{ℓ : |g ≥ ℓ| ≤ K}, then
    * order statistics of the surviving values.
    */
  private def reference(items: Seq[(Long, Long)]): Array[Long] = {
    val levels = items.map { case (v, k) => (v, KllSampleAgg.level(k)) }
    val l = (0L to GCap + 1).find(x => levels.count(_._2 >= x) <= K).get
    val kept = levels.filter(_._2 >= l).map(_._1).sorted
    val m = kept.size
    val qs = KllSampleAgg.Qs.map { q =>
      if (m == 0) -1L else kept((math.ceil(q * m).toLong - 1).max(0).toInt)
    }
    qs :+ m.toLong :+ l
  }

  test("final state equals the direct {g >= L_min} reference on random multisets") {
    (0 until 12).foreach { i =>
      val items = sample(i)
      assert(runSplit(items, 1).toSeq == reference(items).toSeq, s"sample $i")
    }
  }

  test("invariant to shuffling, partitioning, and merge-tree shape") {
    (0 until 8).foreach { i =>
      val items = sample(i)
      val base = runSplit(items, 1).toSeq
      val shuffled = new scala.util.Random(99 + i).shuffle(items)
      assert(runSplit(shuffled, 1).toSeq == base, s"shuffle $i")
      Seq(2, 7, 64).foreach { splits =>
        assert(runSplit(shuffled, splits).toSeq == base, s"splits=$splits $i")
      }
    }
  }

  test("merging a populated buffer into a fresh zero preserves the state") {
    val items = sample(3)
    val built = items.foldLeft(agg.zero)(agg.reduce)
    val viaZeroLeft = agg.merge(agg.zero, built)
    assert(agg.finish(viaZeroLeft).toSeq == runSplit(items, 1).toSeq)
  }
}
