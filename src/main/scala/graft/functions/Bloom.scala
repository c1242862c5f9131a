package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key, filterBytes)`: membership probe of a
  * BIGINT key against a serialized
  * `org.apache.spark.util.sketch.BloomFilter` carried as a foldable
  * BINARY literal.
  *
  * This is the explicit, user-steerable form of the runtime row-level
  * filtering Spark injects for some shuffle joins: build the filter
  * from the dimension side once (distributed `treeAggregate` via
  * `df.stat.bloomFilter`), broadcast it as a literal inside the plan,
  * and pre-filter the fact table BEFORE its shuffle — at 100 TB the
  * exchange is the cost center, and a 1%-selective semi join shrinks
  * it ~100× for the price of one scan. No false negatives ever
  * (guaranteed by the sketch), false positives only cost their
  * shuffled bytes and are removed by the exact join that follows.
  *
  * The filter deserializes ONCE per executor codegen instance (lazy
  * transient), not per row; the probe itself is a handful of xxhash
  * rounds inside whole-stage codegen.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs a BIGINT key, got ${child.dataType.catalogString}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Public so generated code can call it through the reference array. */
  def probe(v: Long): Boolean = bloom.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = probe(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.probe($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Builder + Column helpers for [[BloomMightContain]]. */
object Bloom {

  /** Build a serialized bloom filter over an integral key column —
    * one distributed pass (`treeAggregate`: per-partition filters
    * OR-merged up a tree, never a row collect). Size the filter from
    * the DIMENSION's expected cardinality; 1M keys at 3% fpp is
    * ~730 KB, small enough to ride the plan as a literal.
    */
  def build(dim: DataFrame, keyCol: String, expectedItems: Long,
            fpp: Double): Array[Byte] = {
    require(expectedItems > 0, s"bloom build: expectedItems=$expectedItems")
    require(fpp > 0 && fpp < 1, s"bloom build: fpp=$fpp")
    val bf = dim.select(org.apache.spark.sql.functions.col(keyCol)
        .cast("long").as("k"))
      .stat.bloomFilter("k", expectedItems, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Column-level probe; goes through the registered function so the
    * literal stays a plan-embedded BINARY constant.
    */
  def mightContain(key: Column, bloomBytes: Array[Byte]): Column =
    call_function("bloom_might_contain", key.cast("long"), lit(bloomBytes))
}
