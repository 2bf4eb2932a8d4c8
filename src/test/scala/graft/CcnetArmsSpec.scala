package graft

/** t28's two arms must tell the same story: the gate's exact per-lang
  * ntile tertiles and the benched histogram-threshold arm run over the
  * SAME per-doc surprisal table, so the weight columns are identical
  * and the bucket assignment can differ only for docs inside a
  * per-lang 10-milli-nat threshold bucket (the standard sketch trade —
  * a doc straddling the resolved cumulative-count boundary can land
  * one tertile off the exact rank).
  */
class CcnetArmsSpec extends SparkSpec {

  test("t28 histogram arm matches the exact tertiles outside threshold buckets") {
    val q = graft.queries.TextQueries.all.find(_.name == "t28_ccnet_bucket").get
    val exact = q.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val bench = q.benchFn.get(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .map(t => t._1 -> t).toMap

    assert(exact.nonEmpty && exact.length == bench.size)
    // the surprisal columns are the same table in both arms
    for ((id, lang, np, ss, avg, _) <- exact) {
      val (_, blang, bnp, bss, bavg, _) = bench(id)
      assert((blang, bnp, bss, bavg) == ((lang, np, ss, avg)), s"doc $id weights differ")
    }
    // per-lang threshold buckets = the 10-milli-nat buckets holding the
    // exact tertile boundaries; agreement is required everywhere else
    val thrBks: Map[String, Set[Long]] = exact.groupBy(_._2).map { case (lang, rows) =>
      lang -> Set(1L, 2L).flatMap(b =>
        rows.filter(_._6 == b).map(_._5).maxOption.map(_ / 10000L))
    }
    var checked = 0
    for ((id, lang, _, _, avg, bucket) <- exact
         if !thrBks(lang).contains(avg / 10000L)) {
      assert(bench(id)._6 == bucket,
        s"doc $id (lang $lang, avg $avg): bench ${bench(id)._6} vs exact $bucket")
      checked += 1
    }
    assert(checked > exact.length / 2, s"only $checked/${exact.length} off-threshold docs")
    // and the histogram arm is monotone in surprisal within each lang
    for ((_, rows) <- exact.groupBy(_._2)) {
      val sorted = rows.sortBy(r => (r._5, r._1)).map(r => bench(r._1)._6).toSeq
      assert(sorted == sorted.sorted, "bench buckets not monotone in avg_micro")
    }
  }
}
