package graft.core

import org.apache.spark.sql.types._

/** Feature type ADT mirroring the reference's name-encoded `FeatureType`
  * (reference: aligned/schemas/feature.py:43-269). We keep the same nominal
  * names and the reference's own documented Spark mapping
  * (schemas/feature.py:197-269), but model it as a sealed ADT instead of
  * strings-with-encoding.
  */
sealed trait FeatureType {
  /** Reference-compatible type name (schemas/feature.py:71-140). */
  def name: String
  /** Spark DataType per the reference's own spark_type mapping. */
  def sparkType: DataType
}

object FeatureType {
  case object FString extends FeatureType { val name = "string"; val sparkType = StringType }
  case object FInt8 extends FeatureType { val name = "int8"; val sparkType = ByteType }
  case object FInt16 extends FeatureType { val name = "int16"; val sparkType = ShortType }
  case object FInt32 extends FeatureType { val name = "int32"; val sparkType = IntegerType }
  case object FInt64 extends FeatureType { val name = "int64"; val sparkType = LongType }
  // Spark has no unsigned ints; the reference maps uint→signed (feature.py:214-221).
  case object FUInt8 extends FeatureType { val name = "uint8"; val sparkType = ByteType }
  case object FUInt16 extends FeatureType { val name = "uint16"; val sparkType = ShortType }
  case object FUInt32 extends FeatureType { val name = "uint32"; val sparkType = IntegerType }
  case object FUInt64 extends FeatureType { val name = "uint64"; val sparkType = LongType }
  case object FFloat32 extends FeatureType { val name = "float32"; val sparkType = FloatType }
  case object FFloat64 extends FeatureType { val name = "float64"; val sparkType = DoubleType }
  case object FBool extends FeatureType { val name = "bool"; val sparkType = BooleanType }
  case object FDate extends FeatureType { val name = "date"; val sparkType = DateType }
  /** datetime with optional tz carried in the name (feature.py:136-140). */
  final case class FDatetime(tz: Option[String] = Some("UTC")) extends FeatureType {
    def name: String = tz.fold("datetime")(z => s"datetime-$z")
    val sparkType: DataType = TimestampType
  }
  case object FTime extends FeatureType { val name = "time"; val sparkType = StringType }
  case object FTimedelta extends FeatureType { val name = "timedelta"; val sparkType = DayTimeIntervalType() }
  case object FUuid extends FeatureType { val name = "uuid"; val sparkType = StringType }
  case object FJson extends FeatureType { val name = "json"; val sparkType = StringType }
  case object FBinary extends FeatureType { val name = "binary"; val sparkType = BinaryType }
  final case class FArray(elem: FeatureType) extends FeatureType {
    def name = s"array-${elem.name}"
    def sparkType: DataType = ArrayType(elem.sparkType)
  }
  /** Fixed-size float vector (feature.py:540-551). */
  final case class FEmbedding(size: Int) extends FeatureType {
    def name = s"embedding-$size"
    val sparkType: DataType = ArrayType(FloatType)
  }
  final case class FStruct(fields: Map[String, FeatureType]) extends FeatureType {
    def name = "struct"
    def sparkType: DataType =
      StructType(fields.toSeq.sortBy(_._1).map { case (n, t) => StructField(n, t.sparkType) })
  }

  val primitives: Seq[FeatureType] = Seq(
    FString, FInt8, FInt16, FInt32, FInt64, FUInt8, FUInt16, FUInt32, FUInt64,
    FFloat32, FFloat64, FBool, FDate, FDatetime(None), FTime, FUuid, FJson, FBinary)

  /** Parse the reference's name encoding (feature.py:505-551). */
  def fromName(n: String): FeatureType = n match {
    case "float" | "double" | "float64" => FFloat64
    case "float32" => FFloat32
    case "datetime" => FDatetime(None)
    case s if s.startsWith("datetime-") => FDatetime(Some(s.stripPrefix("datetime-")))
    case s if s.startsWith("array-") => FArray(fromName(s.stripPrefix("array-")))
    case "array" => FArray(FString)
    case s if s.startsWith("embedding-") => FEmbedding(s.stripPrefix("embedding-").toInt)
    case other =>
      primitives.find(_.name == other)
        .getOrElse(throw new IllegalArgumentException(s"unknown feature type: $other"))
  }

  /** Inverse of sparkType, for schema inference from existing DataFrames
    * (analog of FeatureType.from_polars, feature.py:359-388). */
  def fromSpark(dt: DataType): FeatureType = dt match {
    case StringType => FString
    case ByteType => FInt8
    case ShortType => FInt16
    case IntegerType => FInt32
    case LongType => FInt64
    case FloatType => FFloat32
    case DoubleType => FFloat64
    case BooleanType => FBool
    case DateType => FDate
    case _: TimestampType => FDatetime(Some("UTC"))
    case TimestampNTZType => FDatetime(None)
    case BinaryType => FBinary
    case ArrayType(e, _) => FArray(fromSpark(e))
    case StructType(fs) => FStruct(fs.map(f => f.name -> fromSpark(f.dataType)).toMap)
    case _: DecimalType => FFloat64
    case other => throw new IllegalArgumentException(s"unsupported spark type: $other")
  }
}
