package graft.ops

/** Exact integer water-filling of a token budget over a bounded census
  * (q202's allocator, extracted so WaterfillSpec can property-test the
  * algebra the oracle replays declaratively).
  *
  * Greedy ascending by (availability, name): source k (1-based) is
  * CAPPED iff avail_k·(n−k+1) + cum_{k−1} ≤ T evaluated on the sorted
  * prefix; k* = first failure − 1 (the capped set is a prefix: the
  * first uncapped source already exceeds the equal share, so every
  * larger one does). The uncapped split rem = T − cum_{k*} as
  * base = rem div slots, with the first rem mod slots uncapped sources
  * (in sort order — the deterministic remainder rule) getting +1.
  *
  * Invariants (pinned by WaterfillSpec over random censuses):
  *   - Σ alloc = min(T, Σ avail) when T ≤ Σ avail (our callers'
  *     regime), and every alloc_i ≤ avail_i;
  *   - capped sources receive exactly their availability;
  *   - uncapped allocations differ by at most 1 and are ≥ every
  *     capped source's availability (the water level property);
  *   - the result is independent of input order (sorting is internal).
  */
object Waterfill {

  /** One allocation row: (name, avail, rank ascending, capped, alloc). */
  final case class Alloc(
      name: String,
      avail: Long,
      rank: Long,
      capped: Boolean,
      alloc: Long)

  /** Allocate `budget` over `census` (name → availability). Requires
    * budget ≥ 0 and every availability ≥ 0. Returns rows in the
    * ascending (avail, name) sort order the ranks refer to.
    */
  def allocate(census: Seq[(String, Long)], budget: Long): Seq[Alloc] = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    require(
      census.forall(_._2 >= 0L),
      "every availability must be >= 0")
    val sorted = census.sortBy { case (src, avail) => (avail, src) }
    val n = sorted.length
    val cums = sorted.scanLeft(0L)(_ + _._2) // cums(k) = Σ of first k
    var kstar = 0
    while (kstar < n &&
      sorted(kstar)._2 * (n - kstar) + cums(kstar) <= budget) kstar += 1
    val rem = budget - cums(kstar)
    val slots = n - kstar
    val base = if (slots > 0) rem / slots else 0L
    val extra = if (slots > 0) rem % slots else 0L
    sorted.zipWithIndex.map { case ((src, avail), i) =>
      val k = i + 1
      val capped = k <= kstar
      val alloc =
        if (capped) avail
        else base + (if (k - kstar <= extra) 1L else 0L)
      Alloc(src, avail, k.toLong, capped, alloc)
    }
  }
}
