package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class GeoDistSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dist(la1: Double, lo1: Double, la2: Double, lo2: Double): Double =
    Seq((la1, lo1, la2, lo2)).toDF("a", "b", "c", "d")
      .select(GraftFunctions.haversineKm(col("a"), col("b"), col("c"), col("d")))
      .as[Double].head()

  test("haversine known distances on the R=6371 sphere") {
    assert(dist(0, 0, 0, 0) == 0.0)
    // quarter circumference along the equator and through the pole
    assert(math.abs(dist(0, 0, 0, 90) - 6371.0 * math.Pi / 2) < 1e-6)
    assert(math.abs(dist(0, 0, 90, 0) - 6371.0 * math.Pi / 2) < 1e-6)
    // Paris → New York, great-circle ≈ 5837 km on the sphere
    val pny = dist(48.8566, 2.3522, 40.7128, -74.0060)
    assert(pny > 5820 && pny < 5860, s"got $pny")
  }

  test("antipodal points hit half the circumference, never NaN (asin clamp)") {
    val half = 6371.0 * math.Pi
    for ((la, lo) <- Seq((0.0, 0.0), (45.0, 30.0), (-33.5, 151.2))) {
      val d = dist(la, lo, -la, if (lo > 0) lo - 180 else lo + 180)
      assert(!d.isNaN)
      assert(math.abs(d - half) < 1e-6, s"($la,$lo) -> $d")
    }
  }

  test("symmetry and antimeridian continuity") {
    assert(dist(10, 20, -30, 40) == dist(-30, 40, 10, 20))
    // 0.2° of longitude across the date line ≈ same as away from it
    val across = dist(0, 179.9, 0, -179.9)
    val local = dist(0, 0.0, 0, 0.2)
    assert(math.abs(across - local) < 1e-6, s"$across vs $local")
  }
}
