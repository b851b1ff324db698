package graft.ops

import graft.contract.{DerivedFeature, Feature}
import graft.core.FeatureType
import graft.expr.{Binary, Lit, Ref}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Categorical encodings from the reference's feature-factory DSL. */
object Encoding {

  /** one_hot_encode (compiler/feature_factory.py:1590-1592): expand a
    * categorical column into one boolean `eq` feature per value — as derived
    * features so contracts stay declarative. */
  def oneHotFeatures(sourceCol: String, values: Seq[String],
      prefix: String = ""): Seq[DerivedFeature] =
    values.map { v =>
      DerivedFeature(
        name = s"$prefix${if (prefix.isEmpty) sourceCol + "_is_" else ""}${v.toLowerCase.replaceAll("\\W+", "_")}",
        dtype = FeatureType.FBool,
        expr = Binary("eq", Ref(sourceCol), Lit(v)),
        dependingOn = Seq(sourceCol))
    }

  /** DataFrame-level one-hot. */
  def oneHot(df: DataFrame, column: String, values: Seq[String]): DataFrame =
    values.foldLeft(df) { (d, v) =>
      d.withColumn(s"${column}_is_${v.toLowerCase.replaceAll("\\W+", "_")}", col(column) === v)
    }

  /** ordinal_categories (compiler/feature_factory.py:1593). */
  def ordinal(df: DataFrame, column: String, order: Seq[String], out: String): DataFrame =
    df.withColumn(out, graft.expr.Ordinal(Ref(column), order).toColumn)
}
