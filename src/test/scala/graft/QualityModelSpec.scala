package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityModel

class QualityModelSpec extends SparkSuite {
  import spark.implicits._

  test("one GD step matches the hand-computed full-batch gradient exactly") {
    // w = 0 => p = 0.5 for every row; grad_j = mean((0.5 - y) * x_j)
    //   rows: ([1,2], y=1), ([1,0], y=0)
    //   g0 = ((-0.5)*1 + 0.5*1)/2 = 0; g1 = ((-0.5)*2 + 0.5*0)/2 = -0.5
    //   w  = [0,0] - 1.0*[0,-0.5] = [0, 0.5]
    val df = Seq((Seq(1.0, 2.0), 1.0), (Seq(1.0, 0.0), 0.0)).toDF("f", "y")
    val w = QualityModel.trainLogistic(df, "f", "y", dim = 2, steps = 1, lr = 1.0)
    assert(w(0) === 0.0 && w(1) === 0.5)
  }

  test("linearly separable labels reach perfect training accuracy") {
    val df = (1 to 200).map { i =>
      val x = if (i % 2 == 0) 1.0 else -1.0
      (Seq(1.0, x), if (x > 0) 1.0 else 0.0)
    }.toDF("f", "y")
    val w = QualityModel.trainLogistic(df, "f", "y", dim = 2, steps = 50, lr = 1.0)
    val row = QualityModel.fitSummary(df, "f", "y", w).head()
    assert(row.getAs[Long]("n_docs") === 200L)
    assert(row.getAs[Long]("n_correct") === 200L)
    assert(row.getAs[Double]("mean_nll") < 0.3)
  }

  test("featurizer: hand-checked text, empty and blank guards") {
    val df = Seq("Ab1 cd!", "", "   ").toDF("text")
      .select(col("text"), QualityModel.features(col("text")).as("f"))
    val fs = df.select("f").as[Seq[Double]].collect()
    // "Ab1 cd!": len 7, tokens 2, punct {!} 1/7, digits {1} 1/7, upper {A} 1/7
    assert(fs(0)(0) === 1.0)
    assert(math.abs(fs(0)(1) - math.log1p(2.0)) < 1e-12)
    assert(math.abs(fs(0)(2) - 1.0 / 7) < 1e-12)
    assert(math.abs(fs(0)(3) - 1.0 / 7) < 1e-12)
    assert(math.abs(fs(0)(4) - 1.0 / 7) < 1e-12)
    assert(fs(1) === Seq(1.0, 0.0, 0.0, 0.0, 0.0))   // empty: ratio guards
    assert(fs(2) === Seq(1.0, 0.0, 0.0, 0.0, 0.0))   // blank: 0 tokens, 0 matches
  }

  test("score appends the sigmoid margin, map-side") {
    val df = Seq((1L, Seq(1.0, 3.0)), (2L, Seq(1.0, -3.0))).toDF("id", "f")
    val got = QualityModel.score(df, "f", Array(0.0, 1.0))
      .select("id", "quality_score").as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 1.0 / (1 + math.exp(-3.0))) < 1e-12)
    assert(math.abs(got(2L) - 1.0 / (1 + math.exp(3.0))) < 1e-12)
    val plan = QualityModel.score(df, "f", Array(0.0, 1.0))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
