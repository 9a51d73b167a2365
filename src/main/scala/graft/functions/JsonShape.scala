package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Flatten / nest for arbitrarily nested struct schemas — the general-case
  * Spark twin of the reference's JSON shape operators:
  * `flattenJSON` turns `{"a": {"b": 1}}` into key `a\.b` (json.go:22-40) and
  * `nestJSON` reverses it for responses (json.go:42-67). Here the recursion
  * runs over the StructType at PLAN time: flatten emits one projection (no
  * row-level work at all), nest rebuilds `struct(...)` columns. */
object JsonShape {

  val Sep = "\\." // reference separator: literal backslash + dot

  /** All nested struct leaves projected to `parent\.child` top-level cols. */
  def flatten(df: DataFrame): DataFrame = {
    def topLeaves(schema: StructType): Seq[Column] =
      schema.fields.toSeq.flatMap { f =>
        f.dataType match {
          case st: StructType => structLeaves(col(f.name), st, f.name)
          case _ => Seq(col(f.name))
        }
      }
    def structLeaves(parent: Column, st: StructType, prefix: String): Seq[Column] =
      st.fields.toSeq.flatMap { f =>
        val name = s"$prefix$Sep${f.name}"
        f.dataType match {
          case inner: StructType => structLeaves(parent.getField(f.name), inner, name)
          case _ => Seq(parent.getField(f.name).as(name))
        }
      }
    df.select(topLeaves(df.schema): _*)
  }

  /** Inverse of [[flatten]]: columns whose names contain the separator are
    * regrouped into nested structs. */
  def nest(df: DataFrame): DataFrame = {
    // group column names by first path segment
    final case class Node(children: scala.collection.mutable.LinkedHashMap[String, Either[Node, String]])
    val root = Node(scala.collection.mutable.LinkedHashMap.empty)
    df.schema.fieldNames.foreach { full =>
      val parts = full.split(java.util.regex.Pattern.quote(Sep)).toSeq
      var cur = root
      parts.init.foreach { seg =>
        cur = cur.children.getOrElseUpdate(seg, Left(Node(scala.collection.mutable.LinkedHashMap.empty))) match {
          case Left(n) => n
          case Right(_) => throw new IllegalArgumentException(s"name clash at $seg in $full")
        }
      }
      cur.children.put(parts.last, Right(full))
    }
    def build(n: Node): Seq[Column] =
      n.children.toSeq.map {
        case (seg, Right(full)) => col(s"`$full`").as(seg)
        case (seg, Left(child)) => struct(build(child): _*).as(seg)
      }
    df.select(build(root): _*)
  }
}
