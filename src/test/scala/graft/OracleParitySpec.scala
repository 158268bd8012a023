package graft

/** Guards against oracle drift: the driver's DuckDB compare sorts columns
  * by NAME before hashing, so a Spark query and its oracle SQL emitting
  * different column names hash-mismatch even when every value is equal —
  * and the failure is silent by construction (rows_match and schema_match
  * both stay true). This spec parses the outermost SELECT list of every
  * oracle in SparkEntry.oracleSql and asserts the alias set equals the
  * Spark query's schema field names (round-6 regression: tfidf_terms
  * dropped `score` from the Spark output but not from the oracle).
  */
class OracleParitySpec extends SparkSpec {

  /** Column names of the outermost SELECT of a (DuckDB-dialect) query.
    * Tracks single-quote strings, double-quote identifiers, and paren
    * depth; finds the last depth-0 SELECT..FROM span and splits it on
    * depth-0 commas. Every computed item must carry an explicit alias —
    * anything unparseable fails the test (that is the point: oracle
    * columns must be named deliberately on both sides).
    */
  private def oracleColumns(sql: String): Either[String, Seq[String]] = {
    // Positions of depth-0, outside-quote keyword matches.
    def scan(s: String): Vector[(Int, String)] = {
      var depth = 0; var i = 0
      var inS = false; var inD = false
      val out = Vector.newBuilder[(Int, String)]
      val kws = Seq("SELECT", "FROM")
      while (i < s.length) {
        val c = s.charAt(i)
        if (inS) { if (c == '\'') inS = false }
        else if (inD) { if (c == '"') inD = false }
        else c match {
          case '\'' => inS = true
          case '"'  => inD = true
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
            if (depth == 0 && (i == 0 || !s.charAt(i - 1).isLetterOrDigit)) {
              kws.find(k => s.regionMatches(true, i, k, 0, k.length) &&
                (i + k.length == s.length || !s.charAt(i + k.length).isLetterOrDigit))
                .foreach { k => out += ((i, k)) }
            }
        }
        i += 1
      }
      out.result()
    }
    // CTE bodies sit inside parens (depth>=1), so the FIRST depth-0 SELECT
    // is the outermost statement — and for UNION/INTERSECT chains it is the
    // first branch, which is the one that defines the output column names.
    val marks = scan(sql)
    val lastSel = marks.indexWhere(_._2 == "SELECT")
    if (lastSel < 0) return Left("no depth-0 SELECT found")
    val selPos = marks(lastSel)._1 + "SELECT".length
    val fromPos = marks.drop(lastSel + 1).find(_._2 == "FROM")
      .map(_._1).getOrElse(sql.length)
    val list = sql.substring(selPos, fromPos)
    // Split on depth-0 commas (same quote/paren tracking).
    val items = {
      var depth = 0; var inS = false; var inD = false
      var start = 0; val out = Vector.newBuilder[String]
      for (i <- 0 until list.length) {
        val c = list.charAt(i)
        if (inS) { if (c == '\'') inS = false }
        else if (inD) { if (c == '"') inD = false }
        else c match {
          case '\'' => inS = true
          case '"'  => inD = true
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 => out += list.substring(start, i); start = i + 1
          case _ =>
        }
      }
      out += list.substring(start)
      out.result().map(_.trim).filter(_.nonEmpty)
    }
    val ident = "^[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*$".r
    val cols = items.map { it =>
      // Last depth-0 " AS " inside the item wins (CASTs sit at depth>0).
      val asPos = {
        var depth = 0; var inS = false; var inD = false; var last = -1
        for (i <- 0 until it.length) {
          val c = it.charAt(i)
          if (inS) { if (c == '\'') inS = false }
          else if (inD) { if (c == '"') inD = false }
          else c match {
            case '\'' => inS = true
            case '"'  => inD = true
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
              if (depth == 0 && it.regionMatches(true, i, " AS ", 0, 4)) last = i
          }
        }
        last
      }
      if (asPos >= 0) {
        val a = it.substring(asPos + 4).trim
        if (a.startsWith("\"") && a.endsWith("\"")) Right(a.substring(1, a.length - 1))
        else if (ident.findFirstIn(a).contains(a) && !a.contains(".")) Right(a)
        else Left(s"unparseable alias in item: $it")
      } else if (it.startsWith("\"") && it.endsWith("\"") && it.length > 1) {
        Right(it.substring(1, it.length - 1))
      } else ident.findFirstIn(it) match {
        case Some(_) => Right(it.split('.').last)
        case None => Left(s"computed column without explicit alias: $it")
      }
    }
    cols.collectFirst { case Left(e) => e } match {
      case Some(e) => Left(e)
      case None => Right(cols.collect { case Right(c) => c })
    }
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("every oracled query emits exactly the oracle's column names") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    val failures = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val q = SparkEntry.queries.getOrElse(name,
          fail(s"$name has an oracle but no queries entry"))
        oracleColumns(sql) match {
          case Left(err) => Some(s"$name: oracle SQL parse — $err")
          case Right(oc) =>
            val sc = q(spark, sfDir).schema.fieldNames.toSeq
            if (oc.sorted != sc.sorted)
              Some(s"$name: oracle=${oc.sorted.mkString(",")} spark=${sc.sorted.mkString(",")}")
            else if (oc.distinct.size != oc.size)
              Some(s"$name: duplicate oracle columns ${oc.mkString(",")}")
            else None
        }
    }
    graft.operators.Dedup.releaseCaches()
    assert(failures.isEmpty, failures.mkString("\n", "\n", ""))
  }

  test("every queries entry without an oracle is intentionally rows-only") {
    // Not a failure — just keeps the rows-only list visible in test output.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    info(s"rows-only queries (${rowsOnly.size}): ${rowsOnly.toSeq.sorted.mkString(", ")}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
