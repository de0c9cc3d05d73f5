package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{conv, md5, substring}

/** The one definition of the cross-engine 60-bit hash contract: the
  * first 15 hex chars of md5 (60 bits, always inside a signed BIGINT),
  * mirrored verbatim by the DuckDB oracles as
  * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`. Both consumers
  * (simhash token hashing, c8 fingerprints) and their oracle SQL must
  * move together if this is ever retuned — hence one helper, not two
  * inlined copies that can drift apart.
  */
object CrossEngineHash {
  def md5_60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
}
