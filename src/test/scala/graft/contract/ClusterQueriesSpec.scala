package graft.contract

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** Pins the distributed Lloyd's loop to a sequential local implementation
  * (same seeds, same rounded-centroid recurrence) and the SemDeDup
  * invariants. The DuckDB unrolled-CTE oracle is the driver's gate; this is
  * the fast local equivalent.
  */
class ClusterQueriesSpec extends SparkTestBase {
  private val SfDir = "/root/testdata/sf0.001"
  private val Stride = 71
  private val Iters = 3

  private def rnd6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0

  test("vec_kmeans equals a sequential local Lloyd run") {
    val vecs = spark.read
      .parquet(s"$SfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)

    var cents: Seq[(Long, Array[Double])] =
      vecs.filter(_._1 % Stride == 0).map { case (id, v) => id -> v.clone() }.toSeq
    var assignment: Map[Long, Long] = Map.empty
    var centLong: Map[(Long, Int), (Long, Double)] = Map.empty
    for (_ <- 1 to Iters) {
      assignment = vecs.map { case (id, v) =>
        val best = cents
          .map { case (cid, cv) =>
            var d = 0.0
            var i = 0
            while (i < v.length) { val t = v(i) - cv(i); d += t * t; i += 1 }
            (d, cid)
          }
          .min
        id -> best._2
      }.toMap
      val byC = vecs.groupBy { case (id, _) => assignment(id) }
      centLong = byC.flatMap { case (cid, members) =>
        (0 until 64).map { d =>
          val mean = members.map(_._2(d)).sum / members.length
          (cid, d + 1) -> (members.length.toLong, rnd6(mean))
        }
      }
      cents = centLong.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (cid, m) =>
        cid -> (1 to 64).map(p => m((cid, p))._2).toArray
      }
    }

    val got = SparkEntry
      .queries("vec_kmeans")(spark, SfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == centLong.keySet)
    for ((k, (n, v)) <- centLong) {
      assert(got(k)._1 == n, s"count at $k")
      // exact up to a possible round-boundary flip from float summation order
      assert(math.abs(got(k)._2 - v) <= 1.1e-6, s"centroid at $k: got ${got(k)._2}, want $v")
    }
  }

  test("dedup_semantic: keep-first semantics within clusters") {
    val d = SparkEntry.queries("dedup_semantic")(spark, SfDir).collect()
    assert(d.nonEmpty)
    for (r <- d) {
      assert(r.getLong(2) < r.getLong(0), "dup_of must be an earlier doc")
      assert(r.getDouble(3) >= 0.2 - 1e-6, "cosine above threshold")
    }
    // pruned docs are a strict subset of the corpus
    val n = spark.read.parquet(s"$SfDir/embeddings.parquet").count()
    assert(d.length < n)
  }
}
