package graft.dev
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Throwaway probe (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(appName = "scratch")
    import spark.implicits._
    val df = Seq((Seq(1.0e-4, 1.000000005e-4, 0.012345678949),
      Seq(0.0, 0.0, 0.0))).toDF("v", "c")
    df.select(
        zip_with(col("v"), col("c"), (a, b) => {
          val d = a.cast("double") - b.cast("double")
          (d * d).cast(DecimalType(28, 8))
        }).as("arr"))
      .collect().foreach(println)
    Seq(1.5241578997104996e-4).toDF("x")
      .select(col("x").cast(DecimalType(28, 8))).collect().foreach(println)
    val sq = 0.012345678949 * 0.012345678949
    println("sq=" + sq + " bd=" +
      java.math.BigDecimal.valueOf(sq).setScale(8, java.math.RoundingMode.HALF_UP))
    spark.stop()
  }
}
