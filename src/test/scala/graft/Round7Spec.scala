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

  test("bpeSegment replace-chain equals the trainer's greedy fold on every vocab word") {
    // q219's encode leg rides on replace-all == greedy left-to-right fold
    // (TextAnalysis.bpeSegment's equivalence argument). Check it exactly:
    // segment every distinct corpus word both ways under the trained
    // merges, plus adversarial synthetic words (overlapping runs,
    // merged-symbol re-trigger shapes) the 31-word vocab can't exhibit.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, d)
    val merges = graft.ext.TextAnalysis.bpeTrain(docs, "text", 12)
      .orderBy("step").select("left", "right")
      .as[(String, String)].collect().toSeq
    def fold(w: String): String = {
      var syms = w.map(_.toString).toVector
      merges.foreach { case (l, r) =>
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        syms.foreach { s =>
          if (buf.nonEmpty && buf.last == l && s == r)
            buf(buf.length - 1) = l + r
          else buf += s
        }
        syms = buf.toVector
      }
      syms.mkString("|")
    }
    val vocab = docs.select(explode(split(col("text"), " ", -1)).as("w"))
      .filter(length(col("w")) >= 1).distinct().as[String].collect().toSeq
    val words = vocab ++ Seq("errr", "erer", "rere", "ininin", "joinjoin",
      "aaa", "stst", "parpar", "x")
    val gotSeg = words.toDF("w")
      .withColumn("seg", graft.ext.TextAnalysis.bpeSegment(col("w"), merges))
      .as[(String, String)].collect().toMap
    words.foreach { w =>
      assert(gotSeg(w) == fold(w), s"segmentation diverges on '$w'")
    }
  }
}
