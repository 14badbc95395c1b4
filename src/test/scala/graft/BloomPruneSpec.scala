package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomPrune

/** BloomPrune: the pruned join must equal the plain join exactly, and the
  * pre-filter must actually drop non-joining big-side rows (the whole
  * point: shrink the shuffle before it happens). */
class BloomPruneSpec extends SparkSuite {

  test("pruned join ≡ plain join, and the pre-filter prunes") {
    val s = spark
    import s.implicits._

    // big: 100k rows keyed 0..9999; small: 37 selective keys
    val big = (0 until 100000).map(i => (i % 10000L, i.toLong)).toDF("k", "payload")
    val small = (0 until 37).map(i => (i * 271L, s"dim$i")).toDF("k", "name")

    val plain = big.join(small, "k")
    val pruned = BloomPrune.prunedJoin(big, small, "k", expectedItems = 100)

    val p = plain.orderBy("k", "payload").collect().toSeq
    val q = pruned.orderBy("k", "payload").collect().toSeq
    assert(q == p, "bloom-pruned join must return exactly the plain join rows")

    // effectiveness: the membership predicate keeps ≲ fp-inflated fraction
    val sketch = BloomPrune.keyBloom(small, small("k"), 100)
    val kept = big.filter(BloomPrune.mightContain(sketch, big("k"))).count()
    assert(kept < big.count() / 10,
      s"bloom pre-filter kept $kept of ${big.count()} rows — not pruning")
    // no false negatives by construction
    assert(kept >= plain.select("k", "payload").distinct().count())
  }

  test("mightContain is codegen-compatible (no interpreter fallback crash)") {
    val s = spark
    import s.implicits._
    val small = Seq(1L, 2L, 3L).toDF("k")
    val sketch = BloomPrune.keyBloom(small, small("k"), 10)
    val n = (0L until 1000L).toDF("k")
      .filter(BloomPrune.mightContain(sketch, col("k")))
      .count()
    assert(n >= 3 && n < 100)
  }
}
