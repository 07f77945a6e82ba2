package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Local-key -> DB-key remap (reference F16,
  * `core/database_loader.py:182-189`, `meertrap/meertrap.py:184-191`): the
  * reference applies a Python dict per row; here it is a broadcast join
  * against a 2-column map frame with pass-through for unmapped keys —
  * distributed, no driver-side dict.
  */
object KeyMap {

  /** Replace `df.keyCol` with its mapping in `mapping(fromCol -> toCol)`;
    * keys absent from the map pass through unchanged (the reference's
    * `keymap.get(x, x)`).
    */
  def remap(df: DataFrame, keyCol: String, mapping: DataFrame,
            fromCol: String, toCol: String): DataFrame = {
    val m = broadcast(mapping.select(col(fromCol).as("__from"), col(toCol).as("__to")))
    df.join(m, df(keyCol) === col("__from"), "left")
      .withColumn(keyCol, coalesce(col("__to"), col(keyCol)))
      .drop("__from", "__to")
  }
}
