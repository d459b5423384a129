package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.types._

/** The output-type contract behind the driver's hash gate (learned
  * the hard way in round 1): the driver reads Spark results via
  * pyarrow (DECIMAL → `Decimal('147196.00')`, scale preserved) but
  * the DuckDB oracle via pandas (DECIMAL → float64 → `'147196.0'`),
  * so ANY decimal output column hash-mismatches whenever a value has
  * a trailing zero in its last scale digit. Floats have the same
  * asymmetric-rendering risk vs a float64 oracle.
  *
  * Contract: no registry query may emit DECIMAL or FLOAT columns —
  * exact sums are computed in the decimal domain internally and cast
  * to double (bit-identical in DuckDB and the JVM), everything else
  * is double/integral/string/date/timestamp/boolean/arrays thereof.
  * The check reads only each query's resolved schema — though
  * building a DataFrame is not free for every query (d06's iterative
  * body executes eagerly during construction) — and covers all of
  * them.
  */
class OutputContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def banned(dt: DataType): Boolean = dt match {
    case _: DecimalType | FloatType => true
    case ArrayType(et, _) => banned(et)
    case MapType(k, v, _) => banned(k) || banned(v)
    case StructType(fields) => fields.exists(f => banned(f.dataType))
    case _ => false
  }

  test("no registry query emits DECIMAL or FLOAT output columns") {
    graft.functions.GraftFunctions.register(spark)
    val offenders = Registry.all.flatMap { q =>
      q.fn(spark, dir).schema.fields.collect {
        case f if banned(f.dataType) => s"${q.name}.${f.name}: ${f.dataType.sql}"
      }
    }
    assert(offenders.isEmpty, s"decimal/float output columns: ${offenders.mkString(", ")}")
  }
}
