package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test certifying the x14/x15 oracle-equivalence argument:
  * the sequential greedy-leftmost scan ([[BpeKernel.applyMerge]])
  * equals the GAPS-AND-ISLANDS construction the DuckDB oracle
  * expresses in SQL — within each maximal run of consecutive match
  * positions, exactly the odd-ranked positions merge and each
  * consumes its successor. The islands form is re-implemented here
  * independently, straight from the SQL's semantics, and compared on
  * random symbol sequences (tiny alphabet → dense adjacent repeats,
  * the hard case). Raw ScalaCheck with fixed seeds (the
  * KllSamplePropertySpec convention).
  */
class BpeKernelPropertySpec extends AnyFunSuite {

  /** The oracle's construction, literally: mt(j) marks matches;
    * islands by j − rank; merge where island rank is odd; a position
    * is consumed when its predecessor merged; emission in j order.
    */
  private def islandsMerge(ts: Array[String], a: String, b: String): Array[String] = {
    val n = ts.length
    val mt = Array.tabulate(n)(j => j + 1 < n && ts(j) == a && ts(j + 1) == b)
    // rank within island: position j's rank among consecutive match js
    val rank = new Array[Int](n)
    var j = 0
    while (j < n) {
      if (mt(j)) rank(j) = (if (j > 0 && mt(j - 1)) rank(j - 1) else 0) + 1
      j += 1
    }
    val merged = Array.tabulate(n)(j => mt(j) && rank(j) % 2 == 1)
    val out = Array.newBuilder[String]
    j = 0
    while (j < n) {
      val consumed = j > 0 && merged(j - 1)
      if (!consumed) out += (if (merged(j)) a + b else ts(j))
      j += 1
    }
    out.result()
  }

  private val seqGen: Gen[(List[String], String, String)] = for {
    alpha <- Gen.choose(1, 3) // tiny alphabet: dense repeats
    len <- Gen.choose(0, 40)
    ts <- Gen.listOfN(len, Gen.choose('a', ('a' + alpha - 1).toChar).map(_.toString))
    a <- Gen.choose('a', ('a' + alpha - 1).toChar).map(_.toString)
    b <- Gen.choose('a', ('a' + alpha - 1).toChar).map(_.toString)
  } yield (ts, a, b)

  test("greedy leftmost scan equals the oracle's islands construction (1000 random cases)") {
    var seed = Seed(20260813L)
    (1 to 1000).foreach { i =>
      val (ts, a, b) = seqGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val arr = ts.toArray
      val greedy = BpeKernel.applyMerge(arr, a, b).toSeq
      val islands = islandsMerge(arr, a, b).toSeq
      assert(greedy == islands,
        s"case $i: ts=${ts.mkString}, pair=($a,$b): greedy=$greedy islands=$islands")
    }
  }

  test("merged output never re-matches within the same pass (non-overlap)") {
    var seed = Seed(42L)
    (1 to 300).foreach { _ =>
      val (ts, a, b) = seqGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val out = BpeKernel.applyMerge(ts.toArray, a, b)
      // count of merged tokens == drop in length (each merge consumes 1)
      assert(ts.length - out.length == out.count(_ == a + b) ||
        // (a+b can also occur as an ORIGINAL token — only the delta is pinned)
        out.count(_ == a + b) >= ts.length - out.length)
    }
  }
}
