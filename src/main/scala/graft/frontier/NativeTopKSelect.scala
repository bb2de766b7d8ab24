package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One selection candidate held inside the native aggregation buffer. Strings
  * stay [[UTF8String]] end-to-end (cloned out of the input row's shared
  * buffer; emitted verbatim into the output array) — they are never converted
  * to Java strings at any point of the aggregation.
  */
private[graft] final class NativeCand(
    val url: UTF8String, val urlHash: Long, val host: UTF8String,
    val depth: Int, val priority: Double, val retries: Int,
    val discoveredWave: Int, val discoveredRank: Long,
    val parentUrl: UTF8String)

/** Mutable native top-k buffer: the same worst-at-root binary heap as
  * [[WaveSelector.TopKBuf]] (order = [[WaveSelector.SelOrd]]'s fields), but
  * over [[NativeCand]] and with the ordering unrolled so the accept/reject
  * decision needs only four primitives — see [[TopKSelectNative.update]].
  */
private[graft] final class NativeTopKBuf(var k: Long, var n: Int,
    var items: Array[NativeCand]) {

  /** SelOrd on NativeCand: priority desc, then (wave, rank, urlHash) asc. */
  private def cmp(aP: Double, aW: Int, aR: Long, aH: Long, b: NativeCand): Int = {
    var c = java.lang.Double.compare(b.priority, aP)
    if (c != 0) return c
    c = Integer.compare(aW, b.discoveredWave)
    if (c != 0) return c
    c = java.lang.Long.compare(aR, b.discoveredRank)
    if (c != 0) return c
    java.lang.Long.compare(aH, b.urlHash)
  }
  private def worse(i: Int, j: Int): Boolean = {
    val a = items(i)
    cmp(a.priority, a.discoveredWave, a.discoveredRank, a.urlHash, items(j)) > 0
  }
  private def swap(i: Int, j: Int): Unit = {
    val t = items(i); items(i) = items(j); items(j) = t
  }
  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && worse(i, (i - 1) >> 1)) { swap(i, (i - 1) >> 1); i = (i - 1) >> 1 }
  }
  private def siftDown(): Unit = {
    var i = 0
    var cont = true
    while (cont) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < n && worse(l, w)) w = l
      if (r < n && worse(r, w)) w = r
      if (w == i) cont = false else { swap(i, w); i = w }
    }
  }

  /** True iff a candidate with these ordering fields belongs in the buffer —
    * callable BEFORE materializing its strings.
    */
  def accepts(pri: Double, wave: Int, rank: Long, hash: Long): Boolean =
    n < k || cmp(pri, wave, rank, hash, items(0)) < 0

  def insert(c: NativeCand): Unit = {
    if (n < k) {
      if (n == items.length) {
        val cap = math.min(math.max(16L, k), 1L + items.length * 2L).toInt
        items = java.util.Arrays.copyOf(items, cap)
      }
      items(n) = c
      n += 1
      siftUp(n - 1)
    } else if (cmp(c.priority, c.discoveredWave, c.discoveredRank, c.urlHash,
        items(0)) < 0) {
      items(0) = c
      siftDown()
    }
  }
}

/** Exact per-host top-`budget` selection as a NATIVE Catalyst
  * [[TypedImperativeAggregate]] — the same semantics and partial-aggregation
  * shape as [[WaveSelector.TopKSelectAgg]] (bounded per-host heaps map-side,
  * O(hosts×budget) rows on the selection shuffle), with the UDAF's remaining
  * per-row cost removed:
  *
  *   - the Aggregator path deserializes EVERY input row into a [[SelCand]]
  *     case class (one allocation + three String conversions per pending
  *     row) before its buffer can look at it. Here `update` reads the four
  *     ordering primitives straight off the [[InternalRow]], asks the heap
  *     [[NativeTopKBuf.accepts]], and only materializes the three strings
  *     for ACCEPTED rows. In the politeness-real regime (budget ≪ pending)
  *     almost every row takes the zero-allocation reject path.
  *   - buffer serialization (once per host per map partition, on the
  *     shuffle) is a flat length-prefixed byte image, not an encoder pass.
  *
  * Semantics (order, tiebreaks, constant-budget contract, k=0, overflow
  * growth) are pinned equal to the UDAF by FrontierSpec's shared property
  * tests; [[WaveSelector]]'s scaladoc carries the regime discussion.
  */
final case class TopKSelectNative(
    url: Expression, urlHash: Expression, host: Expression, depth: Expression,
    priority: Expression, retries: Expression, discoveredWave: Expression,
    discoveredRank: Expression, parentUrl: Expression, budget: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[NativeTopKBuf] {

  override def children: Seq[Expression] = Seq(url, urlHash, host, depth,
    priority, retries, discoveredWave, discoveredRank, parentUrl, budget)

  // input types are exact by construction ([[select]] feeds the SelCand
  // columns); type-coercion traits (ImplicitCastInputTypes) are private[sql]
  // and unnecessary here
  override def nullable: Boolean = false

  override val dataType: DataType = ArrayType(StructType(Seq(
    StructField("url", StringType), StructField("urlHash", LongType),
    StructField("host", StringType), StructField("depth", IntegerType),
    StructField("priority", DoubleType), StructField("retries", IntegerType),
    StructField("discoveredWave", IntegerType),
    StructField("discoveredRank", LongType),
    StructField("parentUrl", StringType))), containsNull = false)

  override def createAggregationBuffer(): NativeTopKBuf =
    new NativeTopKBuf(WaveSelector.UnsetK, 0, new Array[NativeCand](16))

  override def update(buf: NativeTopKBuf, input: InternalRow): NativeTopKBuf = {
    val b = budget.eval(input).asInstanceOf[Long]
    if (buf.k == WaveSelector.UnsetK) buf.k = b
    else require(b == buf.k,
      s"TopKSelectNative requires a constant per-host budget (the " +
        s"aggregation key is host): host ${host.eval(input)} carries " +
        s"budgets ${buf.k} and $b")
    if (buf.k <= 0) return buf
    val pri  = priority.eval(input).asInstanceOf[Double]
    val wave = discoveredWave.eval(input).asInstanceOf[Int]
    val rank = discoveredRank.eval(input).asInstanceOf[Long]
    val hash = urlHash.eval(input).asInstanceOf[Long]
    if (!buf.accepts(pri, wave, rank, hash)) return buf // zero-alloc reject
    buf.insert(new NativeCand(
      url.eval(input).asInstanceOf[UTF8String].clone(), hash,
      host.eval(input).asInstanceOf[UTF8String].clone(),
      depth.eval(input).asInstanceOf[Int], pri,
      retries.eval(input).asInstanceOf[Int], wave, rank,
      parentUrl.eval(input).asInstanceOf[UTF8String].clone()))
    buf
  }

  override def merge(a: NativeTopKBuf, b: NativeTopKBuf): NativeTopKBuf = {
    if (a.k == WaveSelector.UnsetK) a.k = b.k
    else require(b.k == WaveSelector.UnsetK || b.k == a.k,
      s"TopKSelectNative requires a constant per-host budget (the " +
        s"aggregation key is host): merged buffers carry budgets " +
        s"${a.k} and ${b.k}")
    if (a.k <= 0) return a
    var i = 0
    while (i < b.n) { a.insert(b.items(i)); i += 1 }
    a
  }

  override def eval(buf: NativeTopKBuf): Any = {
    val sorted = java.util.Arrays.copyOfRange(buf.items, 0, buf.n)
    java.util.Arrays.sort(sorted, new java.util.Comparator[NativeCand] {
      def compare(a: NativeCand, b: NativeCand): Int = {
        var c = java.lang.Double.compare(b.priority, a.priority)
        if (c != 0) return c
        c = Integer.compare(a.discoveredWave, b.discoveredWave)
        if (c != 0) return c
        c = java.lang.Long.compare(a.discoveredRank, b.discoveredRank)
        if (c != 0) return c
        java.lang.Long.compare(a.urlHash, b.urlHash)
      }
    })
    val out = math.min(math.max(buf.k, 0L), buf.n.toLong).toInt
    new GenericArrayData(Array.tabulate[Any](out) { i =>
      val c = sorted(i)
      new GenericInternalRow(Array[Any](c.url, c.urlHash, c.host, c.depth,
        c.priority, c.retries, c.discoveredWave, c.discoveredRank, c.parentUrl))
    })
  }

  override def serialize(buf: NativeTopKBuf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.k)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) {
      val c = buf.items(i)
      def str(s: UTF8String): Unit = {
        val b = s.getBytes
        out.writeInt(b.length)
        out.write(b)
      }
      str(c.url)
      out.writeLong(c.urlHash)
      str(c.host)
      out.writeInt(c.depth)
      out.writeDouble(c.priority)
      out.writeInt(c.retries)
      out.writeInt(c.discoveredWave)
      out.writeLong(c.discoveredRank)
      str(c.parentUrl)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): NativeTopKBuf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val k = in.readLong()
    val n = in.readInt()
    def str(): UTF8String = {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      UTF8String.fromBytes(b)
    }
    val items = Array.fill(math.max(n, 16)) {
      null.asInstanceOf[NativeCand]
    }
    var i = 0
    while (i < n) {
      items(i) = new NativeCand(str(), in.readLong(), str(), in.readInt(),
        in.readDouble(), in.readInt(), in.readInt(), in.readLong(), str())
      i += 1
    }
    // items arrived in heap order from serialize — heap property preserved
    new NativeTopKBuf(k, n, items)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSelectNative =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSelectNative =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSelectNative =
    copy(url = newChildren(0), urlHash = newChildren(1), host = newChildren(2),
      depth = newChildren(3), priority = newChildren(4),
      retries = newChildren(5), discoveredWave = newChildren(6),
      discoveredRank = newChildren(7), parentUrl = newChildren(8),
      budget = newChildren(9))
}

object TopKSelectNative {

  /** SQL-facing name; registration rides the same [[FunctionRegistry]] entry
    * point `SparkSessionExtensions.injectFunction` uses, done lazily here so
    * callers need no session-construction hook.
    */
  val FnName = "graft_topk_select"

  private def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName,
      (exprs: Seq[Expression]) => {
        require(exprs.length == 10,
          s"$FnName expects the 10 SelCand columns, got ${exprs.length}")
        TopKSelectNative(exprs(0), exprs(1), exprs(2), exprs(3), exprs(4),
          exprs(5), exprs(6), exprs(7), exprs(8), exprs(9))
      },
      "scala_udf")

  /** Select this wave's batch via the native aggregate — same output columns
    * as [[WaveSelector.selectAgg]] (SelCand minus budget, plus `host_rank`).
    */
  def select(pending: DataFrame): DataFrame = {
    register(pending.sparkSession)
    pending
      .groupBy(col("host"))
      .agg(expr(s"$FnName(url, urlHash, host, depth, priority, retries, " +
        "discoveredWave, discoveredRank, parentUrl, budget)").as("sel"))
      .select(col("host"), posexplode(col("sel")).as(Seq("host_rank", "c")))
      .select(col("c.url"), col("c.urlHash"), col("host"), col("c.depth"),
        col("c.priority"), col("c.retries"), col("c.discoveredWave"),
        col("c.discoveredRank"), col("c.parentUrl"),
        col("host_rank").cast("long").as("host_rank"))
  }
}
