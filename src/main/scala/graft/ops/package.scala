package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function

/** Shared expression helpers for the operator package. */
package object ops {

  /** Integer division (`div`): truncates toward zero, same as DuckDB's
    * `//` — the ONE definition of the idiom every fixed-point operator
    * (Packing, PageRank, Resample, Mixture, meanPoolE6, histogram)
    * leans on; keep callers on this so a semantics change has a single
    * home. For true FLOOR division on possibly-negative dividends use
    * `a - pmod(a, b)` first (pmod is non-negative). */
  private[graft] def intDiv(a: Column, b: Column): Column =
    call_function("div", a, b)
}
