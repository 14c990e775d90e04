package graft.ml

/** Byte-pair-encoding merge training (Sennrich, Haddow & Birch, *Neural
  * Machine Translation of Rare Words with Subword Units*, ACL 2016) in the
  * structure every production subword trainer uses at corpus scale
  * (SentencePiece/HF tokenizers): the CORPUS pass is a distributed word
  * count — the only part that touches 100 TB — and the merge loop runs on
  * the WEIGHTED WORD-TYPE VOCABULARY, whose size is bounded by distinct
  * words (and capped by the caller), not by corpus bytes. Same bounded
  * executor→driver contract as CAIM's compressed histogram: rows never
  * cross the boundary, the (word, count) vocabulary does.
  *
  * Determinism: the merge picked each round is the max-frequency pair with
  * a FULL tiebreak (freq desc, then (lhs, rhs) lexicographic), and pair
  * occurrences are counted at every adjacent position with merges applied
  * in one left-to-right non-overlapping scan — both conventions fixed here
  * so any re-implementation (the spec's independent reference) lands on
  * the identical merge table.
  */
object Bpe {

  /** One left-to-right non-overlapping merge pass: every adjacent (l, r)
    * becomes the fused symbol l+r; "aaa" with pair (a,a) → ["aa", "a"]. */
  private[ml] def mergeOnce(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode ONE word with a trained merge list: start from characters +
    * "</w>" and apply every merge in rank order (the standard greedy
    * application — identical to how the trainer itself respells words
    * between rounds, so encode(w) of a training word reproduces the
    * trainer's final segmentation of it). */
  def encode(word: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector :+ "</w>") {
      case (syms, (l, r)) => mergeOnce(syms, l, r)
    }

  /** Train `nMerges` BPE merges over a weighted word-type vocabulary.
    * Words split to single characters plus the standard end-of-word
    * marker "</w>" (so a word-final fragment is a different symbol than
    * the same fragment mid-word). Returns (rank from 1, lhs, rhs, freq);
    * stops early if no adjacent pair remains. Max pair frequency is
    * non-increasing in rank: a pair created by a merge occurs at most as
    * often as the merge that created it.
    */
  def train(vocab: Seq[(String, Long)], nMerges: Int): Seq[(Int, String, String, Long)] = {
    var words: Vector[(Vector[String], Long)] =
      vocab.map { case (w, c) => (w.map(_.toString).toVector :+ "</w>", c) }.toVector
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(p => Some(p.getOrElse(0L) + c))
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, l, r, f))
        words = words.map { case (syms, c) => (mergeOnce(syms, l, r), c) }
        rank += 1
      }
    }
    out.result()
  }
}
