package graft.expr

import graft.core.FeatureType
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Serializable scalar-expression IR, the analog of the reference's
  * `Transformation`/`Expression` tree (aligned/schemas/transformation.py:132,
  * 356-447). The reference lowers the IR to five backends (pandas, polars,
  * Spark, sqlglot, psql); here there is exactly ONE lowering: Catalyst
  * `Column`s, so every operator inherits whole-stage codegen, pushdown and
  * pruning for free.
  */
sealed trait Expr {
  def toColumn: Column
  // DSL sugar so contract code reads like the reference's feature_factory DSL.
  def +(o: Expr): Expr = Binary("add", this, o)
  def -(o: Expr): Expr = Binary("sub", this, o)
  def *(o: Expr): Expr = Binary("mul", this, o)
  def /(o: Expr): Expr = Binary("div", this, o)
  def %(o: Expr): Expr = Binary("mod", this, o)
  def ===(o: Expr): Expr = Binary("eq", this, o)
  def !==(o: Expr): Expr = Binary("neq", this, o)
  def >(o: Expr): Expr = Binary("gt", this, o)
  def >=(o: Expr): Expr = Binary("gte", this, o)
  def <(o: Expr): Expr = Binary("lt", this, o)
  def <=(o: Expr): Expr = Binary("lte", this, o)
  def &&(o: Expr): Expr = Binary("and", this, o)
  def ||(o: Expr): Expr = Binary("or", this, o)
}

final case class Ref(name: String) extends Expr { def toColumn: Column = col(name) }
final case class Lit(value: Any) extends Expr { def toColumn: Column = lit(value) }

/** 26 binary operators (transformation.py:450-477, Spark lowering 571-648). */
final case class Binary(op: String, l: Expr, r: Expr) extends Expr {
  def toColumn: Column = {
    val (a, b) = (l.toColumn, r.toColumn)
    op match {
      case "add" => a + b
      case "sub" => a - b
      case "mul" => a * b
      case "div" => a / b
      // The reference lowers floor_div to (l/r).cast(int), which is wrong for
      // negatives (transformation.py:612); we use floor(l/r) per SURVEY §2.4.
      case "floor_div" => floor(a / b)
      case "mod" => a % b
      case "pow" => pow(a, b)
      case "eq" => a === b
      case "neq" => a =!= b
      case "gt" => a > b
      case "gte" => a >= b
      case "lt" => a < b
      case "lte" => a <= b
      case "and" => a && b
      case "or" => a || b
      case "xor" => a.bitwiseXOR(b)
      case "min" => least(a, b)
      case "max" => greatest(a, b)
      case "concat" => concat(a, b)
      case "list_contains" => array_contains(a, b)
      case "str_contains" => a.contains(b)
      case "str_starts_with" => a.startsWith(b)
      case "str_ends_with" => a.endsWith(b)
      case "str_split" => split(a, b.toString)
      case "str_find" => locate_expr(a, b)
      case other => throw new IllegalArgumentException(s"unknown binary op: $other")
    }
  }
  // polars str.find is 0-based; F.locate is 1-based (transformation.py:641-644)
  private def locate_expr(a: Column, b: Column): Column =
    call_function("locate", b, a) - lit(1)
}

/** 35 unary functions (transformation.py:829-865, Spark lowering 1104-1176). */
final case class Unary(op: String, child: Expr) extends Expr {
  def toColumn: Column = {
    val c = child.toColumn
    op match {
      case "is_null" => c.isNull
      case "is_not_null" => c.isNotNull
      case "is_nan" => isnan(c)
      case "is_not_nan" => !isnan(c)
      case "is_finite" => !isnan(c) && c =!= Double.PositiveInfinity && c =!= Double.NegativeInfinity
      case "is_infinite" => c === Double.PositiveInfinity || c === Double.NegativeInfinity
      case "not" => !c
      case "floor" => floor(c)
      case "ceil" => ceil(c)
      case "round" => round(c)
      case "abs" => abs(c)
      case "sqrt" => sqrt(c)
      case "log" => log(c)
      case "log10" => log10(c)
      case "log1p" => log1p(c)
      case "exp" => exp(c)
      case "sign" => signum(c)
      case "sin" => sin(c); case "cos" => cos(c); case "tan" => tan(c)
      case "cot" => cot(c)
      case "arcsin" => asin(c); case "arccos" => acos(c); case "arctan" => atan(c)
      case "sinh" => sinh(c); case "cosh" => cosh(c); case "tanh" => tanh(c)
      // the reference composes these from log/sqrt (transformation.py:1135-1147);
      // Spark ships native asinh/acosh/atanh since 3.1 — use the builtins.
      case "arcsinh" => asinh(c); case "arccosh" => acosh(c); case "arctanh" => atanh(c)
      case "degrees" => degrees(c)
      case "radians" => radians(c)
      case "str_len_char" => length(c)
      case "str_to_upper" => upper(c)
      case "str_to_lower" => lower(c)
      case other => throw new IllegalArgumentException(s"unknown unary op: $other")
    }
  }
}

/** Date-part extraction (transformation.py:1554-1683). */
final case class DateComponent(part: String, child: Expr) extends Expr {
  def toColumn: Column = {
    val c = child.toColumn
    part match {
      case "day" => dayofmonth(c)
      case "hour" => hour(c)
      case "minute" => minute(c)
      case "second" => second(c)
      case "month" => month(c)
      case "year" => year(c)
      case "quarter" => quarter(c)
      case "week" => weekofyear(c)
      // reference lowers weekday to polars weekday() = ISO 1=Monday..7=Sunday
      // (transformation.py:1655-1660); Spark dayofweek is 1=Sunday..7=Saturday.
      case "weekday" => ((dayofweek(c) + lit(5)) % lit(7)) + lit(1)
      case "ordinal_day" => dayofyear(c)
      case "epoch" => unix_timestamp(c)
      case other => date_part(lit(other), c)
    }
  }
}

// --- remaining scalar operators from SURVEY §2.4, each one Column expression ---

/** (front − behind) in seconds (transformation.py:1459-1519). */
final case class TimeDifference(front: Expr, behind: Expr) extends Expr {
  def toColumn: Column = front.toColumn.cast("double") - behind.toColumn.cast("double")
}
/** string→float coerce, null on failure (transformation.py:1522-1551).
  * try_cast: ANSI mode (Spark 4 default) would otherwise throw on garbage. */
final case class ToNumerical(child: Expr) extends Expr {
  def toColumn: Column = child.toColumn.try_cast("double")
}
final case class Contains(child: Expr, value: String) extends Expr {
  def toColumn: Column = child.toColumn.contains(value)
}
/** label→index via an order list (transformation.py:1865-1903). */
final case class Ordinal(child: Expr, order: Seq[String]) extends Expr {
  def toColumn: Column = {
    val m = map(order.zipWithIndex.flatMap { case (k, i) => Seq(lit(k), lit(i)) }: _*)
    element_at(m, child.toColumn)
  }
}
/** sequential regex replaces (transformation.py:1906-1938). */
final case class ReplaceStrings(child: Expr, pairs: Seq[(String, String)]) extends Expr {
  def toColumn: Column =
    pairs.foldLeft(child.toColumn) { case (c, (pat, rep)) => regexp_replace(c, pat, rep) }
}
final case class IsIn(child: Expr, values: Seq[Any]) extends Expr {
  def toColumn: Column = child.toColumn.isin(values: _*)
}
/** fill nulls (and NaNs for floats) with a literal (transformation.py:2028-2073). */
final case class FillNa(child: Expr, value: Any, alsoNan: Boolean = false) extends Expr {
  def toColumn: Column = {
    val c = child.toColumn
    val base = if (alsoNan) nanvl(c, lit(null).cast("double")) else c
    coalesce(base, lit(value))
  }
}
/** fill nulls with another column (transformation.py:1984-2025). */
final case class FillNaColumn(child: Expr, other: Expr) extends Expr {
  def toColumn: Column = coalesce(child.toColumn, other.toColumn)
}
/** argmax across probability columns → label (transformation.py:2095-2175). */
final case class MapArgMax(mapping: Seq[(String, Any)]) extends Expr {
  def toColumn: Column =
    if (mapping.size == 1) when(col(mapping.head._1) > 0.5, lit(mapping.head._2))
    else {
      val arr = array(mapping.map(m => col(m._1)): _*)
      val labels = array(mapping.map(m => lit(m._2)): _*)
      element_at(labels, array_position(arr, array_max(arr)).cast("int"))
    }
}
/** string concat treating null as "" (transformation.py:2284-2349). */
final case class AppendStrings(parts: Seq[Expr], sep: String = "") extends Expr {
  def toColumn: Column = concat_ws(sep, parts.map(_.toColumn): _*)
}
/** struct field / JSON path when string-typed (transformation.py:2711-2741). */
final case class StructFieldAccess(child: Expr, field: String, isJson: Boolean = false) extends Expr {
  def toColumn: Column =
    if (isJson) get_json_object(child.toColumn, s"$$.$field") else child.toColumn.getField(field)
}
final case class JsonPath(child: Expr, path: String) extends Expr {
  def toColumn: Column = get_json_object(child.toColumn, path)
}
final case class IsBetween(child: Expr, lo: Expr, hi: Expr) extends Expr {
  def toColumn: Column = child.toColumn.between(lo.toColumn, hi.toColumn)
}
final case class Cast(child: Expr, to: FeatureType) extends Expr {
  def toColumn: Column = child.toColumn.cast(to.sparkType)
}
final case class LogBase(child: Expr, base: Double) extends Expr {
  def toColumn: Column = log(base, child.toColumn)
}
final case class SplitString(child: Expr, sep: String) extends Expr {
  def toColumn: Column = split(child.toColumn, java.util.regex.Pattern.quote(sep))
}
/** python "{}".format over row (transformation.py:3083-3111) → format_string. */
final case class FormatString(template: String, args: Seq[Expr]) extends Expr {
  def toColumn: Column = format_string(template.replace("{}", "%s"), args.map(_.toColumn): _*)
}
/** elementwise mul + sum of two array columns (transformation.py:3114-3166). */
final case class ListDotProduct(a: Expr, b: Expr) extends Expr {
  def toColumn: Column = {
    import org.apache.spark.sql.{functions => F}
    F.aggregate(
      zip_with(a.toColumn, b.toColumn, (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + coalesce(x.cast("double"), lit(0.0)))
  }
}
/** hash of columns → int64; we declare xxhash64 as the contract semantics
  * (SURVEY §7.4 — not chasing polars bit-parity). transformation.py:3169-3190. */
final case class HashColumns(cols: Seq[Expr]) extends Expr {
  def toColumn: Column = xxhash64(cols.map(_.toColumn): _*)
}
final case class ArrayAtIndex(child: Expr, idx: Int) extends Expr {
  // polars .list.get(i) is 0-based; element_at is 1-based (transformation.py:1686-1717)
  def toColumn: Column = element_at(child.toColumn, idx + 1)
}
final case class ArrayContainsAny(child: Expr, values: Seq[Any]) extends Expr {
  def toColumn: Column = arrays_overlap(child.toColumn, array(values.map(lit): _*))
}
final case class Clip(child: Expr, lo: Double, hi: Double) extends Expr {
  def toColumn: Column = greatest(least(child.toColumn, lit(hi)), lit(lo))
}
/** sequential composition with intermediate aliasing (transformation.py:3193-3234):
  * each step sees the previous steps' results under their aliases. Lowered by
  * INLINING the step expressions into the output at toColumn time (a step
  * alias never needs to exist as a real column) — Catalyst CSE/CollapseProject
  * handles any duplication. Raw steps are opaque Columns and cannot be
  * referenced by later steps' Refs (document-level limitation; use Expr nodes
  * for composable steps). */
final case class MultiExpr(steps: Seq[(String, Expr)], output: Expr) extends Expr {
  /** The step-free equivalent expression. */
  def inlined: Expr = {
    val env = steps.foldLeft(Map.empty[String, Expr]) { case (acc, (name, step)) =>
      acc + (name -> Expr.substitute(step, acc))
    }
    Expr.substitute(output, env)
  }
  def toColumn: Column = inlined.toColumn
}
/** Escape hatch: wrap a raw Column (the analog of PolarsExpression /
  * lambda transformations — in a Scala engine user code is first-class). */
final case class Raw(column: Column) extends Expr { def toColumn: Column = column }

object Expr {
  /** SQL-ish convenience entry. */
  def sql(s: String): Expr = Raw(expr(s))

  /** Recursively replace `Ref(name)` with `env(name)` — the lowering step that
    * inlines [[MultiExpr]] step aliases. `Lit` and `Raw` are leaves (a Raw
    * wraps an opaque Column and passes through untouched). Nested MultiExpr
    * steps shadow outer aliases of the same name. */
  def substitute(e: Expr, env: Map[String, Expr]): Expr = {
    if (env.isEmpty) return e
    def go(x: Expr): Expr = x match {
      case Ref(n) => env.getOrElse(n, x)
      case Binary(op, l, r) => Binary(op, go(l), go(r))
      case Unary(op, c) => Unary(op, go(c))
      case DateComponent(p, c) => DateComponent(p, go(c))
      case TimeDifference(f, b) => TimeDifference(go(f), go(b))
      case ToNumerical(c) => ToNumerical(go(c))
      case Contains(c, v) => Contains(go(c), v)
      case Ordinal(c, o) => Ordinal(go(c), o)
      case ReplaceStrings(c, p) => ReplaceStrings(go(c), p)
      case IsIn(c, v) => IsIn(go(c), v)
      case FillNa(c, v, n) => FillNa(go(c), v, n)
      case FillNaColumn(c, o) => FillNaColumn(go(c), go(o))
      case AppendStrings(p, s) => AppendStrings(p.map(go), s)
      case StructFieldAccess(c, f, j) => StructFieldAccess(go(c), f, j)
      case JsonPath(c, p) => JsonPath(go(c), p)
      case IsBetween(c, lo, hi) => IsBetween(go(c), go(lo), go(hi))
      case Cast(c, t) => Cast(go(c), t)
      case LogBase(c, b) => LogBase(go(c), b)
      case SplitString(c, s) => SplitString(go(c), s)
      case FormatString(t, a) => FormatString(t, a.map(go))
      case ListDotProduct(a, b) => ListDotProduct(go(a), go(b))
      case HashColumns(cs) => HashColumns(cs.map(go))
      case ArrayAtIndex(c, i) => ArrayAtIndex(go(c), i)
      case ArrayContainsAny(c, v) => ArrayContainsAny(go(c), v)
      case Clip(c, lo, hi) => Clip(go(c), lo, hi)
      case MultiExpr(isteps, iout) =>
        // inner aliases shadow the outer env from their definition onward
        var scope = env
        val ns = isteps.map { case (n, s) =>
          val r = (n, substitute(s, scope)); scope = scope - n; r
        }
        MultiExpr(ns, substitute(iout, scope))
      case _: Lit | _: Raw | _: MapArgMax => x
    }
    go(e)
  }
}
