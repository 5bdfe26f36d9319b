package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** The cross-engine determinism conventions every oracle-checked
  * output follows — ONE definition so a change to the rounding
  * contract cannot silently miss a site and break hash-matching.
  */
object CrossEngine {

  /** Half-up rounding to 4 decimals via floor arithmetic. Unlike
    * `round()`, whose half-way behavior differs between engines at
    * binary .5 boundaries, `floor(x*1e4+0.5)/1e4` is the same
    * double-op sequence on Spark and DuckDB → bitwise-identical
    * results (the DuckDB oracle SQL spells out the same formula).
    */
  def rnd4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
}
