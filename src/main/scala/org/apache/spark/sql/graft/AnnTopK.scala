package org.apache.spark.sql.graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, IntegerLiteral, Literal, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, IsNotNull}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Limit, LogicalPlan, Project, ReturnAnswer, Sort}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

import graft.index.HnswIndex

/** SQL-level ANN auto-routing — the optional "AnnJoinStrategy" polish of
  * SURVEY §4: the reference's entire premise is that
  *
  *   SELECT id FROM base ORDER BY l2_sq(vec, :qvec) LIMIT k
  *
  * should not scan the base (hybrid_graph.cpp:239-298 routes it into an
  * HNSW walk). Spark's own planner turns this shape into
  * `TakeOrderedAndProject` — an exact full scan. When (a) the session
  * opts in (`spark.graft.ann.autoRoute`, default true), and (b) an
  * [[AnnCatalog]] index is registered for the scanned parquet path, this
  * strategy plans the bucketed-HNSW search from [[graft.index.AnnIndexStore]]
  * instead: each index bucket row searches its sub-graph, the driver
  * merges top-k — O(buckets · ef) distance evaluations instead of O(N).
  *
  * Matching is deliberately narrow (approximate results must be opted
  * into, never sprung on a user): single ascending `l2_sq(vec, literal)`
  * sort key (optional `id` tiebreak), projected output exactly the id
  * column, scan = registered path. Anything else falls through to the
  * built-in strategies untouched.
  */
object AnnCatalog {

  /** Where the bucketed index table lives + the base column contract.
    * `labelIndex` optionally points at a per-label index table
    * ([[graft.index.AnnIndexStore.buildBy]]) keyed by `labelCol`, which
    * answers `WHERE labelCol = v ORDER BY l2_sq ... LIMIT k` — the
    * reference's type-1 route — from the matching sub-index alone. */
  case class IndexMeta(indexPath: String, idCol: String, vecCol: String, ef: Int,
      labelIndex: Option[(String, String)] = None)

  private val registry = TrieMap.empty[String, IndexMeta]

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Declare that `basePath` (a parquet dataset with columns
    * (idCol LONG, vecCol ARRAY&lt;FLOAT&gt;)) has a bucketed HNSW index
    * table (built by [[graft.index.AnnIndexStore.build]]) at `indexPath`.
    * Pass `labelCol` -> per-label index path (from
    * [[graft.index.AnnIndexStore.buildBy]]) to also route
    * label-equality-filtered top-k statements. */
  def register(basePath: String, indexPath: String,
      idCol: String = "id", vecCol: String = "vec", ef: Int = 200,
      labelIndex: Option[(String, String)] = None): Unit =
    registry.put(norm(basePath), IndexMeta(indexPath, idCol, vecCol, ef, labelIndex))

  def unregister(basePath: String): Unit = registry.remove(norm(basePath))

  def clear(): Unit = registry.clear()

  private[graft] def lookup(paths: Seq[org.apache.hadoop.fs.Path]): Option[IndexMeta] =
    paths.iterator.flatMap(p => registry.get(p.toUri.getPath)).nextOption()
}

case class AnnTopKStrategy(session: SparkSession) extends SparkStrategy {

  private object FloatArrayLiteral {
    def unapply(e: Expression): Option[Array[Float]] = e match {
      case Literal(a: ArrayData, ArrayType(FloatType, _)) if a != null =>
        Some(a.toFloatArray())
      case _ => None
    }
  }

  /** l2_sq(vecAttr, queryLiteral) in either argument order. */
  private object DistCall {
    def unapply(e: Expression): Option[(Attribute, Array[Float])] = e match {
      case L2SquaredDistance(a: Attribute, FloatArrayLiteral(q)) => Some((a, q))
      case L2SquaredDistance(FloatArrayLiteral(q), a: Attribute) => Some((a, q))
      case _ => None
    }
  }

  private object LongEquality {
    def unapply(e: Expression): Option[(AttributeReference, Long)] = e match {
      case EqualTo(a: AttributeReference, Literal(v: Long, LongType)) => Some((a, v))
      case EqualTo(Literal(v: Long, LongType), a: AttributeReference) => Some((a, v))
      case EqualTo(a: AttributeReference, Literal(v: Int, IntegerType)) => Some((a, v.toLong))
      case EqualTo(Literal(v: Int, IntegerType), a: AttributeReference) => Some((a, v.toLong))
      case _ => None
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Strip attribute-only projections and at most one label-equality
    * filter (`attr = intLit`, plus the IsNotNull the optimizer infers);
    * yield the file relation beneath and the equality if present. */
  private def unwrap(plan: LogicalPlan)
      : Option[(HadoopFsRelation, Option[(AttributeReference, Long)])] = plan match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(child)
    case Filter(cond, child) =>
      val parts = conjuncts(cond)
      val eqs = parts.collect { case LongEquality(a, v) => (a, v) }
      val residue = parts.filter {
        case LongEquality(_, _) => false
        case IsNotNull(_: AttributeReference) => false
        case _ => true
      }
      if (eqs.length == 1 && residue.isEmpty)
        unwrap(child).collect { case (fs, None) => (fs, Some(eqs.head)) }
      else None
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation => Some((fs, None))
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = {
    if (session.conf.get("spark.graft.ann.autoRoute", "true") != "true") return Nil
    plan match {
      // the planner hands collect()-rooted plans to strategies as
      // ReturnAnswer(Limit(...)) and SpecialLimits would claim that
      // whole subtree — match through the wrapper first
      case ReturnAnswer(root) => apply(root)
      case Limit(IntegerLiteral(k), Project(pl, s: Sort)) if s.global =>
        route(k, pl, s).toSeq
      case _ => Nil
    }
  }

  private def route(k: Int, outer: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression],
      sort: Sort): Option[SparkPlan] = {
    val keys = sort.order match {
      case Seq(SortOrder(DistCall(v, q), Ascending, _, _)) =>
        Some((v, q, None: Option[AttributeReference]))
      case Seq(SortOrder(DistCall(v, q), Ascending, _, _),
               SortOrder(tie: AttributeReference, Ascending, _, _)) =>
        Some((v, q, Some(tie)))
      case _ => None
    }
    for {
      (vecAttr, qvec, tie) <- keys
      (fs, labelEq) <- unwrap(sort.child)
      meta <- AnnCatalog.lookup(fs.location.rootPaths)
      if vecAttr.name.equalsIgnoreCase(meta.vecCol)
      if tie.forall(_.name.equalsIgnoreCase(meta.idCol))
      // a label-equality predicate routes to the per-label index table
      // (the reference's type-1 dispatch) when one is registered
      (searchPath, bucket) <- labelEq match {
        case None => Some((meta.indexPath, None: Option[Long]))
        case Some((attr, v)) => meta.labelIndex match {
          case Some((labelCol, p)) if attr.name.equalsIgnoreCase(labelCol) =>
            Some((p, Some(v)))
          case _ => None
        }
      }
      // the routed output: exactly one id column; any other columns must
      // be constants (a collapsed outer projection like
      // `SELECT 42 AS qid, id ...` is still index-answerable)
      template <- {
        val slots = outer.map {
          case a: AttributeReference
              if a.name.equalsIgnoreCase(meta.idCol) && a.dataType == LongType =>
            Some(None)
          case Alias(a: AttributeReference, _)
              if a.name.equalsIgnoreCase(meta.idCol) && a.dataType == LongType =>
            Some(None)
          case Alias(l: Literal, _) => Some(Some(l.value))
          case _ => None
        }
        if (slots.contains(None) || slots.count(_ == Some(None)) != 1) None
        else Some(slots.map(_.get))
      }
    } yield {
      val ef = session.conf.getOption("spark.graft.ann.ef")
        .map(_.toInt).getOrElse(meta.ef)
      AnnTopKExec(outer.map(_.toAttribute), template,
        meta.copy(indexPath = searchPath, ef = ef), qvec, k, bucket)
    }
  }
}

/** Physical index-search node: reads the bucketed index table, each
  * bucket walks its HNSW for the (plan-time constant) query vector, the
  * driver merges to the global top-k ordered by (dist, id). The merge is
  * k·buckets rows — the same two-level shape as the reference's
  * per-sub-index candidate pooling (hybrid_graph.cpp:306-333).
  * `template` maps each output slot to a constant (Some(value)) or the
  * result id (None — exactly one slot). */
case class AnnTopKExec(output: Seq[Attribute], template: Seq[Option[Any]],
    meta: AnnCatalog.IndexMeta, qvec: Array[Float], k: Int,
    bucket: Option[Long] = None)
    extends LeafExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val ids = AnnTopKExec.searchIds(session, meta, qvec, k, bucket)
    val types = output.map(_.dataType).toArray
    val tmpl = template.toArray
    sparkContext.parallelize(ids.toIndexedSeq, 1).mapPartitions { it =>
      val proj = UnsafeProjection.create(types)
      val row = new GenericInternalRow(tmpl.length)
      var i = 0
      while (i < tmpl.length) {
        tmpl(i).foreach(v => row.update(i, v))
        i += 1
      }
      val idSlot = tmpl.indexOf(None)
      it.map { id => row.update(idSlot, id); proj(row) }
    }
  }

  override def simpleString(maxFields: Int): String =
    s"AnnTopK k=$k ef=${meta.ef} index=${meta.indexPath}" +
      bucket.map(b => s" bucket=$b").getOrElse("")
}

object AnnTopKExec {
  /** Distributed bucket search + driver top-k merge, ascending (dist, id).
    * With `bucket`, only that sub-index row is read (parquet min/max
    * pruning on the per-label table). */
  private[graft] def searchIds(spark: SparkSession,
      meta: AnnCatalog.IndexMeta, qvec: Array[Float], k: Int,
      bucket: Option[Long] = None): Array[Long] = {
    import spark.implicits._
    val ef = math.max(meta.ef, k)
    val table = spark.read.parquet(meta.indexPath)
    bucket.fold(table)(b => table.filter(org.apache.spark.sql.functions.col("bucket") === b))
      .select("ids", "graph")
      .as[(Array[Long], Array[Byte])]
      .flatMap { case (ids, bytes) =>
        HnswIndex.fromBytes(bytes).search(qvec, k, ef).iterator
          .map { case (internal, d) => (d, ids(internal)) }
      }
      .rdd
      .takeOrdered(k)(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
      .map(_._2)
  }
}
