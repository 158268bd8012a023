package graft.operators

/** Search-effort parameter table — the Spark analog of the reference's
  * `SearchParams` (hybrid_graph.h:14-34): beam width `ef` is not a
  * constant but a function of sub-index size and predicate coverage.
  *
  * The reference slopes ef linearly in category size for type-1/3
  * (hybrid_graph.cpp:263-267: `ef = ef_base + slope · count`, capped)
  * and widens it for in-filter walks by selectivity band
  * (hybrid_graph.cpp:421-448: 680/780/1180 as coverage shrinks). Both
  * knobs exist because recall at fixed ef degrades as (a) the graph
  * grows and (b) the filter rejects more of the walk's frontier.
  */
object SearchParams {

  /** ef sloped by sub-index size: `base + slope·n`, capped. The
    * reference's type-1 table is (1800, slope→2500 cap) at 10M rows;
    * the default slope here reproduces its growth rate per row. */
  case class EfSlope(base: Int, slope: Double = 0.02, capFactor: Int = 8) {
    def efFor(n: Long): Int =
      math.min(base.toLong * capFactor, base + (slope * n).toLong).toInt
  }

  /** Widen ef for a range-filtered (in-filter) walk: the fraction of the
    * sub-index the predicate keeps is `cover`; effort grows as its
    * inverse, bounded to `maxFactor`× (the reference's 680→1180 band
    * spread is ≈ 1.7×; narrow slices at our scale benefit from more). */
  def inFilterEf(ef: Int, cover: Double, maxFactor: Double = 4.0): Int =
    math.ceil(ef * math.min(maxFactor, 1.0 / math.max(cover, 1.0 / maxFactor))).toInt

  /** Below this in-range fraction a filtered walk is replaced by an
    * exact scan of the slice — the reference's SMALL class
    * (hybrid_graph.cpp:117-124: cover < 0.2 → slice scan). Matches
    * [[Selectivity.splitInterval]]'s SMALL threshold. */
  val SmallCoverage = 0.2

  /** In-predicate entry seeds for filtered walks (the reference seeds
    * its filtered beam with ~10 evenly spaced in-range points,
    * searcher.hpp:301-317). */
  val FilterSeeds = 10
}
