package graft.query

import graft.index.PostingCodec.BlockCursor

final case class Hit(docId: Long, score: Double)

/** Inputs to a single WAND task: one term's posting shard. */
final case class TermShard(term: String, idf: Double, maxTf: Int,
    postings: Array[Byte])

/** Block-max WAND top-k over a set of posting shards that cover the SAME
  * document subset (one scatter-gather shard — the Spark equivalent of an
  * ES shard-local query phase, reference lifecycle SURVEY.md §3.1 step 7).
  *
  * Guarantees (the rank-parity contract with the exact oracle):
  *  - never approximates: per-term and per-block upper bounds only SKIP
  *    provably sub-threshold regions; every surviving doc is scored with the
  *    full BM25 kernel;
  *  - deterministic float results: per-doc term contributions are summed in
  *    lexicographic term order — identical to the oracle's sum order;
  *  - deterministic ties: result order is (score desc, docId asc), and
  *    threshold comparisons carry relative slack so a doc that exactly ties
  *    the k-th score is still evaluated (it can win on docId).
  */
object Wand {

  private final class L(val term: String, val idf: Double, val ub: Double,
      val cursor: BlockCursor)

  /** Worst-first: smaller score is worse; equal score → larger docId worse. */
  private val worstFirst = new java.util.Comparator[Hit] {
    def compare(a: Hit, b: Hit): Int = {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(b.docId, a.docId)
    }
  }

  /** @param owns doc-ownership predicate for this task: with salted shards a
    *             low-salt term's postings are a superset of the task's doc
    *             subset; only owned docs may be emitted (each doc is owned by
    *             exactly one task, so the global merge never double-counts).
    */
  def topK(shards: Seq[TermShard], k: Int, bm25: BM25,
      owns: Long => Boolean = _ => true, avgdl: Double = 0.0): Array[Hit] = {
    if (k <= 0 || shards.isEmpty) return Array.empty
    // term-level upper bound keeps the sound norm lower bound 0 (BM25
    // weight is max at the smallest norm); block bounds refine with the
    // block's min doclen below
    val lists = shards.iterator
      .map(s => new L(s.term, s.idf, s.idf * bm25.tfWeight(s.maxTf, 0.0),
        new BlockCursor(s.postings)))
      .filter(l => !l.cursor.exhausted)
      .toArray
    lists.foreach(_.cursor.next())

    // fixed evaluation order → deterministic float sum (oracle-identical)
    val termOrder = lists.sortBy(_.term)
    var work = lists.sortBy(_.cursor.docId)

    val heap = new java.util.PriorityQueue[Hit](k, worstFirst)
    def theta: Double =
      if (heap.size < k) Double.NegativeInfinity else heap.peek().score
    def reachable(ub: Double, th: Double): Boolean =
      th == Double.NegativeInfinity || ub >= th - math.abs(th) * 1e-12

    def offer(docId: Long, score: Double): Unit = {
      if (heap.size < k) heap.add(Hit(docId, score))
      else {
        val w = heap.peek()
        if (score > w.score || (score == w.score && docId < w.docId)) {
          heap.poll(); heap.add(Hit(docId, score))
        }
      }
    }

    def dropDead(): Unit = {
      if (work.exists(_.cursor.exhausted))
        work = work.filter(l => !l.cursor.exhausted)
    }

    def resort(): Unit = {
      var i = 1
      while (i < work.length) { // insertion sort: nearly sorted already
        val x = work(i)
        var j = i - 1
        while (j >= 0 && work(j).cursor.docId > x.cursor.docId) {
          work(j + 1) = work(j); j -= 1
        }
        work(j + 1) = x
        i += 1
      }
    }

    var running = work.nonEmpty
    while (running) {
      resort()
      val th = theta
      // pivot: first prefix whose summed term upper bounds could reach theta
      var acc = 0.0
      var p = -1
      var i = 0
      while (p < 0 && i < work.length) {
        acc += work(i).ub
        if (reachable(acc, th)) p = i
        i += 1
      }
      if (p < 0) {
        running = false // no remaining doc can affect the top-k
      } else {
        val pivotDoc = work(p).cursor.docId
        // include every list already sitting on the pivot doc
        while (p + 1 < work.length && work(p + 1).cursor.docId == pivotDoc) p += 1

        // block-max refinement over lists [0..p] (sound: every remaining
        // posting of lists beyond p has docId >= work(p+1).docId)
        var blockUb = 0.0
        var minBlockLast = Long.MaxValue
        var pruneValid = true
        var j = 0
        while (j <= p) {
          val l = work(j)
          if (l.cursor.shallowAdvance(pivotDoc)) {
            blockUb += l.idf * bm25.tfWeight(l.cursor.currentBlockMaxTf,
              bm25.normOf(l.cursor.currentBlockMinDoclen, avgdl))
            if (l.cursor.currentBlockLastDocId < minBlockLast)
              minBlockLast = l.cursor.currentBlockLastDocId
          } else pruneValid = false // exhausted mid-shallow; clean up, retry
          j += 1
        }

        if (!pruneValid) {
          dropDead()
          running = work.nonEmpty
        } else if (!reachable(blockUb, th)) {
          // no doc in [pivotDoc, min(blockLast, next list's doc)) qualifies
          val nextListDoc =
            if (p + 1 < work.length) work(p + 1).cursor.docId else Long.MaxValue
          val target =
            math.min(
              if (minBlockLast == Long.MaxValue) Long.MaxValue else minBlockLast + 1,
              nextListDoc)
          var m = 0
          while (m <= p) {
            val l = work(m)
            if (l.cursor.docId < target) l.cursor.advanceTo(target)
            m += 1
          }
          dropDead()
          running = work.nonEmpty
        } else if (work(0).cursor.docId == pivotDoc) {
          // full evaluation: all lists [0..p] sit on the pivot
          if (owns(pivotDoc)) {
            var score = 0.0
            var t = 0
            while (t < termOrder.length) {
              val l = termOrder(t)
              if (!l.cursor.exhausted && l.cursor.docId == pivotDoc)
                score += l.idf * bm25.tfWeight(l.cursor.tf,
                  bm25.normOf(l.cursor.doclen, avgdl))
              t += 1
            }
            offer(pivotDoc, score)
          }
          var m = 0
          while (m <= p) {
            work(m).cursor.next()
            m += 1
          }
          dropDead()
          running = work.nonEmpty
        } else {
          // advance the lagging list (docId < pivot) with the largest upper
          // bound — fewer total advances than always moving work(0)
          var best = -1
          var m = 0
          while (m <= p) {
            if (work(m).cursor.docId < pivotDoc &&
              (best < 0 || work(m).ub > work(best).ub)) best = m
            m += 1
          }
          work(best).cursor.advanceTo(pivotDoc)
          dropDead()
          running = work.nonEmpty
        }
      }
    }

    val out = new Array[Hit](heap.size)
    var i2 = heap.size - 1
    while (i2 >= 0) { out(i2) = heap.poll(); i2 -= 1 }
    out // (score desc, docId asc)
  }
}
