package graft

import graft.functions.{GraftExtensions, Native}
import org.apache.spark.sql.SparkSessionExtensions

class NativeFunctionsSpec extends SparkSpec {

  test("native functions are SQL-callable after registration") {
    Native.register(spark)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head().getDouble(0)
    assert(dot == 11.0)
    val mds = spark.sql(
      "SELECT graft_min_dist_sq(0.0D, 0.0D, array(3.0D, 4.0D, 1.0D, 0.0D)) AS d")
      .head().getDouble(0)
    assert(mds == 1.0) // (1,0) is nearer than (3,4)
  }

  test("type check rejects wrong argument types with a clear error") {
    Native.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(1, 2)").collect()
    }
    assert(e.getMessage.contains("graft_dot"))
  }

  test("GraftExtensions injects both functions (builder smoke)") {
    // applying the extensions object must not throw; full-session
    // injection is exercised via spark.sql.extensions in deployment
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("interpreted eval path (nullSafeEval) agrees with codegen results") {
    import graft.functions.{DotProduct, MinDistSq}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val arr = (xs: Seq[Double]) =>
      Literal.create(ArrayData.toArrayData(xs.toArray), ArrayType(DoubleType))
    val d = DotProduct(arr(Seq(1.0, 2.0)), arr(Seq(3.0, 4.0))).eval(null)
    assert(d == 11.0)
    val m = MinDistSq(Literal(0.0), Literal(0.0), arr(Seq(3.0, 4.0, 1.0, 0.0))).eval(null)
    assert(m == 1.0)
  }
}
