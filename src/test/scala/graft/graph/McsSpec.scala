package graft.graph

import graft.{SparkEntry, SparkSpec}

/** B7 (round-12): the maximum-common-subgraph pair surface — pinned
  * against an independent recomputation from the census key's own
  * output, and for consistency against B5's shared counts. */
class McsSpec extends SparkSpec {

  test("g_mcs maxima recompute from the census; zero exactly when B5 shares nothing") {
    val census = SparkEntry.queries("g_subgraph_census")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getString(3))))
    val byOrder = census.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val sharedCount = SparkEntry.queries("g_ged_pairs")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(6))
      .toMap
    val mcs = SparkEntry.queries("g_mcs")(spark, sfDir).collect()
    assert(mcs.length === sharedCount.size, "B5 and B7 must emit the same pair set")
    assert(mcs.exists(_.getLong(2) > 0) && mcs.exists(_.getLong(2) === 0),
      "fixture should exercise both shared and disjoint pairs")
    mcs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val ca = byOrder.getOrElse(a, Array.empty[(String, Long, String)])
      val hb = byOrder.getOrElse(b, Array.empty[(String, Long, String)]).map(_._1).toSet
      val shared = ca.filter(c => hb(c._1))
      if (shared.isEmpty) {
        assert(r.getLong(2) === 0L && r.getLong(3) === 0L &&
          r.getLong(4) === 0L && r.isNullAt(5), s"pair ($a,$b) should be all-zero")
      } else {
        def edges(ck: String): Int = ck.split(':')(1).toInt
        val sz = shared.map(_._2).max
        val atMax = shared.filter(_._2 == sz)
        val me = atMax.map(c => edges(c._3)).max
        assert(r.getLong(2) === sz, s"pair ($a,$b) mcs_size")
        assert(r.getLong(3) === me.toLong, s"pair ($a,$b) mcs_edges")
        assert(r.getLong(4) === atMax.length.toLong, s"pair ($a,$b) n_shared_at_max")
        assert(r.getString(5) === atMax.filter(c => edges(c._3) == me).map(_._3).max,
          s"pair ($a,$b) tiebreak key")
      }
      // B5 consistency: an MCS exists exactly when classes are shared
      assert((r.getLong(2) > 0) === (sharedCount((a, b)) > 0), s"pair ($a,$b) vs B5")
    }
  }
}
