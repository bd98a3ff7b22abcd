package graft.functions

import scala.collection.mutable

/** Aho–Corasick multi-pattern substring automaton (SURVEY.md §2.F F13's
  * eval-set-scale path). The per-row `contains(p)` scan the graded
  * `q_f13_contamination` uses is O(|text| · |phrases|) — fine for a
  * handful of screening phrases, linear-in-phrase-count at a real
  * benchmark-contamination list (10⁴–10⁶ eval n-grams). This automaton is
  * O(|text|) per document regardless of phrase count: build once on the
  * driver (O(Σ|phrase|)), broadcast, scan each partition's documents in a
  * single pass.
  *
  * Classic construction (Aho & Corasick 1975, public algorithm): trie of
  * phrases, BFS failure links, output links collapsing each node's
  * suffix-phrase set.
  */
final class AhoCorasick private (
    gotoFn: Array[mutable.HashMap[Char, Int]],
    fail: Array[Int],
    out: Array[List[Int]],
    val numPhrases: Int) extends Serializable {

  /** Per-phrase presence in one pass over `text`. */
  def presence(text: String): Array[Boolean] = {
    val hit = new Array[Boolean](numPhrases)
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var s = state
      while (s != 0 && !gotoFn(s).contains(c)) s = fail(s)
      state = gotoFn(s).getOrElse(c, 0)
      var o = out(state)
      while (o.nonEmpty) { hit(o.head) = true; o = o.tail }
      i += 1
    }
    hit
  }
}

object AhoCorasick {
  def apply(phrases: Seq[String]): AhoCorasick = {
    val gotoFn = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val outSets = mutable.ArrayBuffer(List.empty[Int])
    phrases.zipWithIndex.foreach { case (p, id) =>
      var state = 0
      p.foreach { c =>
        state = gotoFn(state).getOrElseUpdate(c, {
          gotoFn += mutable.HashMap.empty[Char, Int]
          outSets += Nil
          gotoFn.length - 1
        })
      }
      outSets(state) = id :: outSets(state)
    }
    val n = gotoFn.length
    val fail = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    gotoFn(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      gotoFn(r).foreach { case (c, s) =>
        queue += s
        var st = fail(r)
        while (st != 0 && !gotoFn(st).contains(c)) st = fail(st)
        fail(s) = if (s != gotoFn(st).getOrElse(c, 0)) gotoFn(st).getOrElse(c, 0) else 0
        outSets(s) = outSets(s) ++ outSets(fail(s))
      }
    }
    new AhoCorasick(gotoFn.toArray, fail, outSets.toArray, phrases.length)
  }
}
