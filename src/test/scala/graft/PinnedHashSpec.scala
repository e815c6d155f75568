package graft

/** Enforces the committed canonical hashes of the rows-only catalog
  * entries (q231, q303 — no DuckDB twin; see [[PinnedHashes]]): a
  * silent behavior change in their kernels becomes a hard `sbt test`
  * failure even though the driver's oracle gate can only count rows.
  * Runs at BOTH pinned scales — sf0.001 (the suite's smoke scale)
  * and sf0.01 (the driver's verify scale; 500 docs, still bounded).
  */
class PinnedHashSpec extends SparkSpec {

  PinnedHashes.pinned.toSeq.sortBy(_._1).foreach { case (seg, pins) =>
    pins.toSeq.sortBy(_._1).foreach { case (name, (eRows, eHash)) =>
      test(s"$name canonical hash is pinned at $seg") {
        val (rows, hash) = PinnedHashes.canonicalHash(
          Queries.all(name)(spark, s"/root/testdata/$seg"))
        assert(rows === eRows,
          s"$name row count drifted at $seg — if intended, regenerate " +
            "with `runMain graft.PinnedHashes` and commit the new pin")
        assert(hash === eHash,
          s"$name output drifted at $seg — if intended, regenerate " +
            "with `runMain graft.PinnedHashes` and commit the new pin")
      }
    }
  }
}
