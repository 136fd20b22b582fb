package graft.store

import org.apache.spark.sql.DataFrame

/** Fluent query DSL mirroring the reference's TDHS easy-client surface
  * (A/database/tdhsocket/client/easy/Query.java, Where.java, And.java):
  *
  * {{{
  * Tdhs.from(file)
  *   .select("id", "name", "length")
  *   .index(IndexDef("PID_NAME", Seq("parentId", "name")))
  *   .equal(8L)                       // prefix match on leading column
  *   .and().field("length").not(-1L)
  *   .and().field("leaseHolder").isNull()
  *   .limit(0, 100)
  *   .get()
  * }}}
  *
  * Comparators map to the TDHS find flags (EQ/GE/LE/GT/LT/IN/DEQ,
  * TDHSCommon.java:51-64); field filters to the post-filter flags
  * (:66-79). Everything compiles to StateStore.find + postFilter, i.e.
  * plain Column predicates that Catalyst pushes into the scan.
  */
object Tdhs {

  val MaxIndexKeys = 10 // TDHSCommon.java:32

  def from(df: DataFrame): QueryBuilder = QueryBuilder(df)

  final case class QueryBuilder(
      df: DataFrame,
      projection: Seq[String] = Nil,
      idx: Option[IndexDef] = None,
      keys: Seq[Any] = Nil,
      cmp: Comparator.Value = Comparator.EQ,
      posts: Seq[Post] = Nil,
      off: Int = 0,
      lim: Int = Int.MaxValue) {

    def select(cols: String*): QueryBuilder = copy(projection = cols)
    def index(i: IndexDef): QueryBuilder = copy(idx = Some(i))

    private def withKeys(c: Comparator.Value, ks: Seq[Any]): QueryBuilder = {
      require(ks.size <= MaxIndexKeys, s"more than $MaxIndexKeys index keys")
      copy(keys = ks, cmp = c)
    }
    def equal(ks: Any*): QueryBuilder = withKeys(Comparator.EQ, ks)
    def greaterEqual(ks: Any*): QueryBuilder = withKeys(Comparator.GE, ks)
    def lessEqual(ks: Any*): QueryBuilder = withKeys(Comparator.LE, ks)
    def greaterThan(ks: Any*): QueryBuilder = withKeys(Comparator.GT, ks)
    def lessThan(ks: Any*): QueryBuilder = withKeys(Comparator.LT, ks)
    def descEqual(ks: Any*): QueryBuilder = withKeys(Comparator.DEQ, ks)
    def in(ks: Any*): QueryBuilder = withKeys(Comparator.IN, ks)

    def and(): FieldStep = FieldStep(this)

    def limit(offset: Int, n: Int): QueryBuilder = copy(off = offset, lim = n)

    def get(): DataFrame = {
      val found = idx match {
        case Some(i) if keys.nonEmpty => StateStore.find(df, i, keys, cmp, lim, off)
        case _ =>
          // no index selected: offset/limit page an UNORDERED scan, so page
          // boundaries are nondeterministic run-to-run — matching the
          // reference's full-scan TDHS get, which pages in storage order
          // (TDHSCommon.java); select an index for stable pagination
          val base = StateStore.postFilter(df, Nil)
          val o = if (off > 0) base.offset(off) else base
          if (lim != Int.MaxValue) o.limit(lim) else o
      }
      val filtered = StateStore.postFilter(found, posts)
      if (projection.nonEmpty) filtered.selectExpr(projection: _*) else filtered
    }

    /** WHERE clause shared by update/delete: the index predicate honoring
      * the selected comparator (same construction as find) plus any
      * post-filters. */
    private def writePredicate: org.apache.spark.sql.Column = {
      val pred = idx match {
        case Some(i) if keys.nonEmpty => StateStore.indexPredicate(i, keys, cmp)
        case _ => org.apache.spark.sql.functions.lit(true)
      }
      posts.map(_.toColumn).foldLeft(pred)(_ && _)
    }

    /** TDHS update: SET expressions under the built predicate (P8). */
    def update(sets: Map[String, StateStore.SetExpr], nowMs: Long): DataFrame =
      StateStore.update(df, writePredicate, sets, nowMs)

    /** TDHS delete → tombstone write (R5 semantics). */
    def delete(): DataFrame =
      StateStore.softDelete(df, writePredicate)
  }

  final case class FieldStep(qb: QueryBuilder) {
    def field(name: String): FieldOps = FieldOps(qb, name)
  }

  final case class FieldOps(qb: QueryBuilder, name: String) {
    private def add(p: Post): QueryBuilder = qb.copy(posts = qb.posts :+ p)
    def equal(v: Any): QueryBuilder = add(PostEq(name, v))
    def not(v: Any): QueryBuilder = add(PostNot(name, v))
    def greaterEqual(v: Any): QueryBuilder = add(PostGe(name, v))
    def lessEqual(v: Any): QueryBuilder = add(PostLe(name, v))
    def greaterThan(v: Any): QueryBuilder = add(PostGt(name, v))
    def lessThan(v: Any): QueryBuilder = add(PostLt(name, v))
    def isNull(): QueryBuilder = add(PostIsNull(name))
  }
}
