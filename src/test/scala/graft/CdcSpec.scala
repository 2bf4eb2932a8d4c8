package graft

/** q49's merged state must equal a SEQUENTIAL replay of the changelog —
  * the plain-Scala fold applies every change one at a time in
  * (o_orderdate, o_orderkey) order (upsert sets the balance, delete
  * removes the key), while the operator compacts to latest-per-key
  * with one struct-max aggregate; the two must agree exactly,
  * including keys whose FINAL op is a delete after earlier upserts
  * and untouched snapshot keys.
  */
class CdcSpec extends SparkSpec {

  test("q49 equals the sequential changelog replay on sf0.001") {
    val snap = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getLong(0) -> math.floor(r.getDouble(1) * 100).toLong).toMap
    val log = Tables.orders(spark, sfDir)
      .selectExpr("o_custkey", "unix_micros(to_utc_timestamp(o_orderdate, 'UTC')) as ts",
        "o_orderkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), math.floor(r.getDouble(4) * 100).toLong))
      .sortBy(e => (e._2, e._3))

    val state = scala.collection.mutable.Map.empty[Long, (String, Long)]
    snap.foreach { case (k, b) => state(k) = ("snapshot", b) }
    log.foreach { case (k, _, _, status, bal) =>
      if (status == "F") state.remove(k)
      else state(k) = ("updated", bal)
    }
    // a re-inserted key after a delete is an upsert — matches the
    // operator, whose latest-wins struct keeps only the final op
    val expect = state.toSeq.map { case (k, (src, b)) => (k, src, b) }
      .sortBy(_._1)

    val out = graft.queries.RelationalQueries.all
      .find(_.name == "q49_cdc_upsert").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out === expect)
    // the fixture must actually exercise deletes and updates
    assert(out.exists(_._2 == "updated"))
    assert(out.size < snap.size, "no delete was exercised")
  }
}
