package graft

import org.apache.spark.sql.functions._
import graft.sim.SimSearch

/** IVF ANN over constructed clustered vectors with known cells. */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("ivfTopK searches only probed cells and ranks by cosine") {
    // two tight clusters in 64-d: cell 0 near e0, cell 1 near e1
    def vec(hot: Int, v: Float, noise: Float): Array[Float] = {
      val a = Array.fill(64)(noise)
      a(hot) = v
      a
    }
    val emb = Seq(
      (0L, vec(0, 10f, 0.1f), 0),
      (1L, vec(0, 9f, 0.2f), 0),
      (2L, vec(0, 8f, 0.3f), 0),
      (3L, vec(1, 10f, 0.1f), 1),
      (4L, vec(1, 9f, 0.2f), 1))
      .toDF("vec_id", "embedding", "label")

    val top = SimSearch.ivfTopK(emb, "vec_id", "embedding", "label",
      col("vec_id") === 0L, k = 2, nprobe = 1).collect()
    // nprobe=1 → only cell 0 searched; neighbors are 1 then 2, never 3/4
    assert(top.map(_.getAs[Long]("neighbor")).toSeq == Seq(1L, 2L))
    val cs = top.map(_.getAs[Double]("cos_sim"))
    assert(cs.forall(c => c > 0.9 && c <= 1.0))
  }
}
