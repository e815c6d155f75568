package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded-sampling property layer for the oracle-parity hash family
  * (house convention — see EnvelopeSpec: the scalatest-scalacheck
  * bridge is not on the offline classpath, so properties run over
  * seeded samples instead of generators).
  */
class HashFnsPropSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  test("hashAtLong equals the textbook (a·x + b) mod p via BigInt, all k") {
    // the Mersenne shift-reduction must agree with exact arithmetic on
    // the full input domain, not just small values
    val xs = Seq(0L, 1L, HashFns.P61 - 1, HashFns.P61 / 2) ++
      Seq.fill(2000)(math.abs(rnd.nextLong()) % HashFns.P61)
    for (k <- 0 until 64; x <- xs) {
      val (a, b) = HashFns.MINHASH_AB(k)
      val expected = ((BigInt(a) * BigInt(x) + BigInt(b)) mod BigInt(HashFns.P61)).toLong
      assert(HashFns.hashAtLong(x, k) === expected, s"k=$k x=$x")
    }
  }

  test("hash61Bytes stays in [0, p] and 20k random strings do not collide") {
    val strings = Seq.fill(20000)(rnd.nextString(rnd.nextInt(40) + 1))
    val hs = strings.distinct.map(s => HashFns.hash61Bytes(s.getBytes("UTF-8")))
    assert(hs.forall(h => h >= 0 && h <= HashFns.P61))
    assert(hs.distinct.length === hs.length)   // 61-bit space, ~20k draws
  }

  test("column hash61 equals the Scala-native hash61Bytes on the same strings") {
    val strings = (0 until 500).map(i => s"doc $i ${rnd.nextString(10)}")
    val fromSpark = strings.toDF("s")
      .select(col("s"), HashFns.hash61(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    strings.foreach { s =>
      assert(fromSpark(s) === HashFns.hash61Bytes(s.getBytes("UTF-8")), s"s=$s")
    }
  }

  test("distinct ks give distinct hash functions (no cross-k collapse)") {
    val x = math.abs(rnd.nextLong()) % HashFns.P61
    val perK = (0 until 64).map(k => HashFns.hashAtLong(x, k))
    assert(perK.distinct.length >= 63)  // pairwise-equal values are chance-level
  }
}
