package graft.pipeline

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
import org.apache.spark.sql.DataFrame

/** Port of the training path (`core/utils.py:233-258` sklearn OLS +
  * pickle; scoring `core/inference.py:128-154`).
  *
  * sklearn's default `LinearRegression` is unregularized OLS; Spark's
  * `LinearRegression` with regParam=0 and the "normal" solver computes
  * the same closed form (verified against hand-computed normal
  * equations in LoyaltyModelSpec). Scoring is `model.transform` over
  * the whole batch — one distributed pass instead of the reference's
  * row-at-a-time `predict` loop.
  */
object LoyaltyModel {

  /** `core/constants.py:21-22`. */
  val trainingFeatures: Array[String] =
    Array("latest_purchase_value", "avg_purchase_value", "avg_loyalty_score")
  val targetVariable = "latest_loyalty_score"

  private def assembler = new VectorAssembler()
    .setInputCols(trainingFeatures)
    .setOutputCol("features")

  /** M2 — OLS fit on the engineered feature frame. */
  def train(features: DataFrame): LinearRegressionModel = {
    val assembled = assembler.transform(features)
    new LinearRegression()
      .setFeaturesCol("features")
      .setLabelCol(targetVariable)
      .setPredictionCol("predicted_loyalty_score")
      .setRegParam(0.0)
      .setElasticNetParam(0.0)
      .setSolver("normal") // exact closed form, matches sklearn OLS
      .setStandardization(false)
      .fit(assembled)
  }

  /** S7 — model persistence (replaces pickle,
    * `core/utils.py:255-256` / `core/inference.py:67-68`).
    */
  def save(model: LinearRegressionModel, path: String): Unit =
    model.write.overwrite().save(path)

  def load(path: String): LinearRegressionModel =
    LinearRegressionModel.load(path)

  /** M3 — batch scoring: input needs the 3 feature columns; output
    * adds `predicted_loyalty_score`.
    */
  def score(model: LinearRegressionModel, batch: DataFrame): DataFrame =
    model.transform(assembler.transform(batch))
      .drop("features")
}
