package graft

/** Round-7 additions without a single-SQL oracle: the iterative BPE
  * trainer (q218) is pinned against an independent driver-side
  * brute-force trainer — full merge-table equality, not invariants.
  */
class Round7Spec extends SparkSpec {

  test("q218: merge table equals a brute-force BPE trainer at two SFs") {
    import spark.implicits._
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = SparkEntry.queries("q218_bpe_trainer")(spark, d)
        .as[(Int, String, String, String, Long)].collect().toSeq
      // independent trainer: same contract (word census, overlapping
      // adjacent pair counts, (cnt DESC, l, r) priority, greedy
      // left-to-right merge), separate code path
      var seqs: Seq[(Vector[String], Long)] =
        graft.sources.Tables.documents(spark, d)
          .select("text").as[String].collect().toSeq
          .flatMap(_.split(" ", -1)).filter(_.nonEmpty)
          .groupBy(identity).view.mapValues(_.size.toLong).toSeq
          .map { case (w, c) => (w.map(_.toString).toVector, c) }
      val expect =
        scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
      for (step <- 1 to 12) {
        val counts = scala.collection.mutable.HashMap[(String, String), Long]()
        seqs.foreach { case (syms, c) =>
          var i = 0
          while (i + 1 < syms.length) {
            val k = (syms(i), syms(i + 1))
            counts(k) = counts.getOrElse(k, 0L) + c
            i += 1
          }
        }
        if (counts.nonEmpty) {
          val ((l, r), c) = counts.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
          expect += ((step, l, r, l + r, c))
          seqs = seqs.map { case (syms, cnt) =>
            val buf = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                buf += (l + r); i += 2
              } else { buf += syms(i); i += 1 }
            }
            (buf.toVector, cnt)
          }
        }
      }
      assert(got.map(_._1) == (1 to 12), s"$d: 12 ordered merge steps")
      assert(got == expect.toSeq, s"$d: merge tables diverge\n" +
        s"got:    ${got.take(15)}\nexpect: ${expect.take(15)}")
    }
  }
}
