package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-style upsert without an Iceberg runtime (SURVEY.md §2.1 S5, §7.4).
  *
  * Reference semantics (`main.py:196-239`): probe by natural key; matched →
  * UPDATE a fixed set of columns; unmatched → INSERT. Child arrays are
  * replaced wholesale (`main.py:244-270`, delete-then-reinsert).
  *
  * Implemented as join rewrites (the no-MERGE fallback SURVEY §2.1 S5 names):
  *  - updates: left join current←updates, matched rows take update values;
  *  - inserts: updates anti-joined against current, appended;
  *  - child replacement: old child rows anti-joined on changed keys, union new.
  * At scale both sides shuffle on the key once; with the current table
  * bucketed/partitioned by the key the probe side is shuffle-free.
  */
object Upsert {

  /** UPDATE-only merge: matched keys take `setCols` values from `updates`
    * (update side column name given per target column), unmatched keep
    * current values. Preserves `current`'s schema.
    */
  def applyUpdates(current: DataFrame, updates: DataFrame, key: String,
      setCols: Map[String, String]): DataFrame = {
    val upd = updates.select(
      (col(key).as(s"__k") +: setCols.values.toSeq.map(c => col(c))): _*)
    val joined = current.join(upd, current(key) === upd("__k"), "left")
    val projected = current.columns.map { c =>
      setCols.get(c) match {
        case Some(u) => when(col("__k").isNotNull, col(u)).otherwise(col(c)).as(c)
        case None    => col(c)
      }
    }
    joined.select(projected.toSeq: _*)
  }

  /** Full upsert: update matched (per `setCols`), insert unmatched rows of
    * `updates` (which must carry `current`'s full schema for inserts).
    */
  def upsert(current: DataFrame, updates: DataFrame, key: String,
      setCols: Map[String, String]): DataFrame = {
    val updated  = applyUpdates(current, updates, key, setCols)
    val inserts  = updates.join(current.select(col(key)), Seq(key), "left_anti")
      .select(current.columns.map(col).toSeq: _*)
    updated.unionByName(inserts)
  }

  /** Child-table replacement (reference delete-then-reinsert,
    * `main.py:244-270`): drop all child rows whose parent key appears in
    * `newChild`, then append `newChild`.
    */
  def replaceChildren(oldChild: DataFrame, newChild: DataFrame, key: String): DataFrame = {
    val changed = newChild.select(col(key)).distinct()
    oldChild.join(changed, Seq(key), "left_anti").unionByName(newChild)
  }
}
