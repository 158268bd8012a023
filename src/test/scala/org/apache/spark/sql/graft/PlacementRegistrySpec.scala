package org.apache.spark.sql.graft

/** The placement registry's eviction contract: overflowing either bound
  * (256 store maps / ~1M total entries) evicts least-recently-served
  * maps PER ENTRY — never a wholesale clear that colds every store's
  * placed path because one runaway session overflowed the registry.
  * Both tests fill past a bound, touch one "active" store last, and
  * assert that store's placements survive the eviction. */
class PlacementRegistrySpec extends graft.SparkSpec {

  private def s = spark

  test("store-count overflow evicts eldest maps, not the active store") {
    AnnTopKExec.clearPlacements()
    try {
      // fill past the 256-store bound with distinct (path, ver) keys;
      // the ACTIVE store is inserted first (eldest by insertion), then
      // re-touched after the fill so LRU order must protect it
      AnnTopKExec.placementsInsertForTest(s, "/tmp/ps_active", "v0", 10)
      (1 to 300).foreach { i =>
        AnnTopKExec.placementsInsertForTest(s, s"/tmp/ps_filler_$i", "v0", 2)
      }
      // the fill itself runs eviction at each insert past the bound, so
      // the active store (eldest, never re-touched yet) may already be
      // gone — re-learn it, then add more fillers: it must now survive
      AnnTopKExec.placementsInsertForTest(s, "/tmp/ps_active", "v0", 10)
      (301 to 400).foreach { i =>
        AnnTopKExec.placementsInsertForTest(s, s"/tmp/ps_filler_$i", "v0", 2)
      }
      assert(AnnTopKExec.placementStoreCount <= 256,
        s"store bound not enforced: ${AnnTopKExec.placementStoreCount}")
      assert(AnnTopKExec.placementsContains(s, "/tmp/ps_active", "v0"),
        "recently-served store evicted by the store-count bound — " +
          "eviction must be LRU per entry, not clear-all")
      // entry counter stayed consistent with the evictions
      assert(AnnTopKExec.placementEntryCount <= 256L * 10,
        s"entry counter drifted: ${AnnTopKExec.placementEntryCount}")
    } finally AnnTopKExec.clearPlacements()
  }

  test("global entry overflow evicts eldest maps until under budget, active store survives") {
    AnnTopKExec.clearPlacements()
    try {
      // 9 stores x 130k entries = 1.17M > the 1M global bound
      (1 to 8).foreach { i =>
        AnnTopKExec.placementsInsertForTest(s, s"/tmp/pe_filler_$i", "v0", 130000)
      }
      AnnTopKExec.placementsInsertForTest(s, "/tmp/pe_active", "v0", 130000)
      val before = AnnTopKExec.placementEntryCount
      assert(before > (1L << 20), s"spec setup did not overflow: $before")
      AnnTopKExec.boundPlacements()
      val after = AnnTopKExec.placementEntryCount
      // evicted down to <= 7/8 of the bound, but NOT cleared wholesale
      assert(after < (1L << 20) - (1L << 17) + 130000,
        s"entry bound not enforced: $after")
      assert(after > 0, "clear-all regression: eviction emptied the registry")
      assert(AnnTopKExec.placementsContains(s, "/tmp/pe_active", "v0"),
        "most-recently-served store evicted by the global entry bound — " +
          "eviction must drop eldest maps first")
      // at least one eldest filler is gone
      assert(!AnnTopKExec.placementsContains(s, "/tmp/pe_filler_1", "v0"),
        "eldest map survived an overflow that required eviction")
    } finally AnnTopKExec.clearPlacements()
  }
}
