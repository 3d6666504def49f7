package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — for each left row, the single right row
  * with the greatest ordering value at-or-before (backward) or the least
  * at-or-after (forward) the left row's, per equality key. The canonical
  * market-data operation (trade ← latest quote), and the generalization
  * of the reference's point-in-time SCD lookup
  * (`create_symbol_views.sql:10-18` — interval containment against
  * `valid_from`/`valid_to`) to event-vs-event matching where the right
  * side has no precomputed intervals.
  *
  * Spark-first shape: NOT a range join. Both sides are union-tagged and a
  * single per-key window (`last(_, ignoreNulls)` over rows unbounded
  * preceding) carries the most recent right payload forward onto each
  * left row. Cost: ONE shuffle on the `by` keys and one sort — identical
  * to the sort-merge work a dedicated as-of operator (Flink temporal
  * join, pandas merge_asof, QuestDB ASOF) performs, with no O(n·m)
  * per-key blowup and no interval self-join. At 100 TB the plan is a
  * single Exchange+Sort per side; skewed keys cost what their row count
  * costs (window is streaming, no buffering beyond the frame's single
  * carried struct). Equal-ordering ties between the two sides are
  * resolved by the tag's secondary sort (right-before-left for inclusive
  * matches, left-before-right for strict), so the result is deterministic
  * and engine-exact — verified bit-for-bit against DuckDB's native
  * ASOF LEFT JOIN at sf0.01.
  */
object AsofJoin {

  /** Left as-of join.
    *
    * @param left      probe side; all its columns are preserved
    * @param right     build side; only `rightCols` are carried
    * @param on        ordering column name, present in BOTH frames (any
    *                  orderable type: numeric, date, timestamp)
    * @param by        equality-key column names, present in both frames
    * @param rightCols right payload columns; names must not collide with
    *                  left's
    * @param direction "backward" (greatest right.on <= left.on, the
    *                  default), "forward" (least right.on >= left.on),
    *                  or "nearest" (closer of the two, backward on
    *                  distance ties — the pandas merge_asof convention;
    *                  two window frames over ONE partitioning)
    * @param allowExactMatches true = at-or-before/after (<=/>=); false =
    *                  strictly before/after (</>)
    * @param tolerance optional max distance |left.on - right.on|; a match
    *                  farther than this is nulled out. For timestamp `on`
    *                  pass an interval column (`expr("INTERVAL 1 HOUR")`),
    *                  for numeric `on` a numeric column
    * @param matchedOnAs if set, also emit the matched right row's `on`
    *                  value under this name (null when no match)
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               on: String, by: Seq[String], rightCols: Seq[String],
               direction: String = "backward",
               allowExactMatches: Boolean = true,
               tolerance: Option[Column] = None,
               matchedOnAs: Option[String] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val clash = rightCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"rightCols collide with left columns: $clash")
    require(!rightCols.contains(on) && !by.exists(rightCols.contains),
      "rightCols must not include the on/by columns")

    // The union shuffle already carries the by-keys and __on as top-level
    // columns, so the left payload struct holds ONLY the columns that are
    // not reconstructible from them — for a probe side projected down to
    // (by, on) the struct disappears entirely. At scale this is the
    // difference between shuffling every left column twice and once
    // (guide §2.3: shuffle fewer bytes): the r17 j4 drive measured the
    // union exchange at 9.8 GB with the duplicated struct on a
    // 750M-row union whose probe rows carry nothing beyond key+ts.
    val carryCols = left.columns.filterNot(c => by.contains(c) || c == on)
    val leftCarryType = StructType(
      if (carryCols.isEmpty) Array.empty[org.apache.spark.sql.types.StructField]
      else left.select(carryCols.map(col): _*).schema.fields)
    val rightPayload = StructType(
      right.select((on +: rightCols).map(col): _*).schema.fields)

    def lCarry(fromLeft: Boolean): Column =
      if (carryCols.isEmpty) lit(null).cast("int").as("__l")
      else if (fromLeft) struct(carryCols.map(col): _*).as("__l")
      else lit(null).cast(leftCarryType).as("__l")
    val keyed = by.map(col)
    val lSide = left.select(
      keyed ++ Seq(
        col(on).as("__on"),
        lCarry(fromLeft = true),
        lit(null).cast(rightPayload).as("__r"),
        lit(1).as("__is_left")): _*)
    val rSide = right.select(
      keyed ++ Seq(
        col(on).as("__on"),
        lCarry(fromLeft = false),
        struct((col(on).as(on) +: rightCols.map(col)): _*).as("__r"),
        lit(0).as("__is_left")): _*)

    // Ordering: backward scans time ascending, forward descending (so
    // "the closest right row not yet passed" is always the LAST carried
    // value). Tie layer: inclusive wants the equal-ts right row visible
    // to the left row => right sorts first; strict hides it => left
    // first. Equal right duplicates are ordered by payload for a
    // deterministic (max-payload) winner.
    def spec(dir: String) = {
      val onOrd = if (dir == "backward") col("__on").asc else col("__on").desc
      val tieOrd = if (allowExactMatches) col("__is_left").asc else col("__is_left").desc
      // the right-duplicate tie-break orders by __r's FIELDS, not the
      // struct value: identical lexicographic order (null struct == all-
      // null fields, and left/right rows are already separated by the tag
      // layer), but plain-column sort keys stay on the codegen'd
      // comparator path where a struct comparator does not
      val rTie = col(s"__r.$on").asc +: rightCols.map(c => col(s"__r.$c").asc)
      Window.partitionBy(by.map(col): _*)
        .orderBy((Seq(onOrd, tieOrd) ++ rTie): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    def within(m: Column, dir: String): Column = tolerance match {
      case None => m.isNotNull
      case Some(tol) =>
        val dist =
          if (dir == "backward") col("__on") - m.getField(on)
          else m.getField(on) - col("__on")
        m.isNotNull && dist <= tol
    }

    val union = lSide.unionByName(rSide)
    val (matched, ok) = direction match {
      case "backward" | "forward" =>
        val df = union
          .withColumn("__m", last(col("__r"), ignoreNulls = true).over(spec(direction)))
          .where(col("__is_left") === 1)
        (df, within(col("__m"), direction))
      case "nearest" =>
        // both carries over ONE partitioning (two sorts, one Exchange);
        // pick the closer in-tolerance side, backward on distance ties
        // (the pandas merge_asof convention)
        val df = union
          .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(spec("backward")))
          .withColumn("__mf", last(col("__r"), ignoreNulls = true).over(spec("forward")))
          .where(col("__is_left") === 1)
        val okB = within(col("__mb"), "backward")
        val okF = within(col("__mf"), "forward")
        val db = col("__on") - col("__mb").getField(on)
        val df2 = col("__mf").getField(on) - col("__on")
        val pickB = okB && (!okF || db <= df2)
        val picked = df.withColumn("__m",
          when(pickB, col("__mb")).when(okF, col("__mf")))
        (picked, col("__m").isNotNull)
    }

    // left columns come back from the union's top-level key/__on columns
    // where possible, from the pruned carry struct otherwise
    val outCols =
      left.columns.map { c =>
        if (by.contains(c)) col(c)
        else if (c == on) col("__on").as(c)
        else col(s"__l.$c").as(c)
      } ++
        rightCols.map(c => when(ok, col("__m").getField(c)).as(c)) ++
        matchedOnAs.map(n => when(ok, col("__m").getField(on)).as(n))
    matched.select(outCols: _*)
  }
}
