package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  private def eval(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)

  private def arr(xs: Double*) = array(xs.map(x => lit(x.toFloat)): _*)

  test("dot and norm") {
    assert(eval(Vectors.dot(arr(1, 2, 3), arr(4, 5, 6))) === 32.0)
    assert(eval(Vectors.norm(arr(3, 4))) === 5.0)
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    assert(math.abs(eval(Vectors.cosine(arr(1, 2), arr(1, 2)))
      .asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(eval(Vectors.cosine(arr(1, 0), arr(0, 1)))
      .asInstanceOf[Double]) < 1e-12)
  }

  test("hyperplane bucket is deterministic and within range") {
    val v = arr(0.1, -0.2, 0.3, 0.4)
    val b1 = eval(Vectors.hyperplaneBucket(Vectors.hyperplaneSignature(v, 4, 8)))
    val b2 = eval(Vectors.hyperplaneBucket(Vectors.hyperplaneSignature(v, 4, 8)))
    assert(b1 === b2)
    val b = b1.asInstanceOf[Long]
    assert(b >= 0L && b < 256L)
  }
}
