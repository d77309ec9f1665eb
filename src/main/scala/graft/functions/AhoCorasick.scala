package graft.functions

import scala.collection.mutable

/** Deterministic Aho–Corasick multi-pattern matcher (goto/fail automaton
  * with precomputed output closure).
  *
  * Why it exists: blocklist / contamination-literal filtering over a 100 TB
  * corpus must be a SINGLE pass over each document with per-character cost
  * independent of the pattern count — a regex alternation (or one
  * `contains` per pattern) re-scans the text once per pattern, turning a
  * 10k-entry blocklist into a 10'000× blowup. The automaton is built once
  * on the driver from the (small) pattern list and broadcast; matching is
  * embarrassingly parallel per row, so the whole filter is a zero-shuffle
  * projection. (The reference has no substring-blocklist analog — its only
  * filter is the pixel-intensity dark filter, `filters.py:4-10`; this
  * operator is part of the LLM-curation tier the assignment adds on top.)
  *
  * Counting semantics are LEFTMOST-GREEDY NON-OVERLAPPING per pattern —
  * exactly `indexOf`-and-skip (and exactly SQL `replace()` removal
  * counts), so the q235 oracle is expressible as
  * `(length(text) - length(replace(text, pat, ''))) / length(pat)` in
  * DuckDB. Overlapping occurrences of self-bordered patterns ("a a" in
  * "a a a") are resolved identically by both engines: AC emits matches in
  * increasing end position (= increasing start for a fixed-length
  * pattern), and a match is kept only if it starts at or after the
  * previous kept match's end.
  */
final class AhoCorasick private (
    val patterns: Array[String],
    next: Array[Map[Char, Int]],
    fail: Array[Int],
    emit: Array[Array[Int]]) extends Serializable {

  /** Per-pattern leftmost-greedy non-overlapping occurrence counts. */
  def countNonOverlapping(text: String): Array[Int] = {
    val counts = new Array[Int](patterns.length)
    val lastEnd = new Array[Int](patterns.length) // exclusive end of last kept match
    var node = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      while (node != 0 && !next(node).contains(c)) node = fail(node)
      node = next(node).getOrElse(c, 0)
      val em = emit(node)
      var k = 0
      while (k < em.length) {
        val pid = em(k)
        val start = i - patterns(pid).length + 1
        if (start >= lastEnd(pid)) { counts(pid) += 1; lastEnd(pid) = i + 1 }
        k += 1
      }
      i += 1
    }
    counts
  }
}

object AhoCorasick {

  /** Build the automaton. Deterministic: fail links and the emit closure
    * depend only on the trie (BFS by depth), and emit sets are sorted, so
    * two builds from the same pattern list are structurally identical —
    * the K13 retry-stability rule. */
  def build(patterns: Array[String]): AhoCorasick = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty), "patterns must be non-empty")
    val next = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val emitB = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      p.foreach { c =>
        node = next(node).getOrElseUpdate(c, {
          next += mutable.Map.empty
          emitB += Nil
          next.length - 1
        })
      }
      emitB(node) = pid :: emitB(node)
    }
    val n = next.length
    val fail = new Array[Int](n)
    val queue = mutable.Queue[Int]()
    // children of the root fail to the root
    next(0).toSeq.sortBy(_._1).foreach { case (_, v) => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      next(u).toSeq.sortBy(_._1).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(v) = next(f).get(c).filter(_ != v).getOrElse(0)
        // BFS order: fail(v) is strictly shallower, so its emit set is
        // already closed — append it to close v's set transitively
        emitB(v) = emitB(v) ++ emitB(fail(v))
        queue += v
      }
    }
    new AhoCorasick(patterns.clone(),
      next.map(_.toMap).toArray, fail,
      emitB.map(_.sorted.toArray).toArray)
  }
}
