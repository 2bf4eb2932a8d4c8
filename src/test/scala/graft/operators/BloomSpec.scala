package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {

  test("no false negatives: every built key passes mightContain") {
    val s = spark
    import s.implicits._
    val keys = (0L until 2000L).map(_ * 7L).toDF("k")
    val bits = Bloom.build(keys, "k", numBits = 1 << 14)
    val admitted = keys.filter(Bloom.mightContain(bits, col("k"))).count()
    assert(admitted == 2000L, s"false negatives: ${2000L - admitted}")
  }

  test("false-positive rate on non-members stays near the design point") {
    val s = spark
    import s.implicits._
    // members: even ids; probes: odd ids (disjoint by construction)
    val keys = (0L until 2000L).map(_ * 2L).toDF("k")
    val bits = Bloom.build(keys, "k", numBits = 1 << 17)
    val probes = (0L until 20000L).map(_ * 2L + 1L).toDF("k")
    val fp = probes.filter(Bloom.mightContain(bits, col("k"))).count()
    // m=131072, n=2000, k=3 → fpp ≈ (1 - e^(-3·2000/131072))^3 ≈ 8.6e-5;
    // allow a generous 1% before calling the hash family broken
    assert(fp <= 200, s"fpp too high: $fp/20000")
  }

  test("bloom-pruned join equals the plain join (pruning is result-invisible)") {
    val s = spark
    import s.implicits._
    val dim = (0L until 100L).map(i => (i * 3L, s"d$i")).toDF("dk", "name")
    val fact = (0L until 5000L).map(i => (i % 300L, i)).toDF("fk", "v")
    val bits = Bloom.build(dim.select("dk"), "dk", numBits = 1 << 14)
    val pruned = fact.filter(Bloom.mightContain(bits, col("fk")))
      .join(dim, col("fk") === col("dk"))
      .select("fk", "v", "name").collect().map(_.toSeq).sortBy(_.toString)
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "v", "name").collect().map(_.toSeq).sortBy(_.toString)
    assert(pruned.toSeq == plain.toSeq)
  }

  test("build is partitioning-invariant (mergeable OR of partials)") {
    val s = spark
    import s.implicits._
    val keys = (0L until 3000L).map(i => i * 11L).toDF("k")
    val a = Bloom.build(keys.repartition(1), "k", numBits = 1 << 14)
    val b = Bloom.build(keys.repartition(7), "k", numBits = 1 << 14)
    assert(a.toSeq == b.toSeq)
  }
}
