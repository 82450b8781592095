package graft.tools

import org.apache.spark.util.sketch.BloomFilter

/** Empirically pin Spark 4's BloomFilter sizing behavior (bit-size
  * quantization and the FP it costs) — the q162 bloom diagnosis.
  */
object BloomSizeCheck {
  def main(args: Array[String]): Unit = {
    for (n <- Seq(1000000L, 11960000L)) {
      val f = BloomFilter.create(n, 0.01)
      val opt = math.ceil(-n * math.log(0.01) / (math.log(2) * math.log(2))).toLong
      println(s"create(n=$n, fpp=0.01): bitSize=${f.bitSize()} optimal=$opt")
    }
    val g = BloomFilter.create(11960000L, 229200000L)
    println(s"create(n, numBits=229200000): bitSize=${g.bitSize()}")
    def fp(f: BloomFilter): Double = {
      (0 until 11960000).foreach(i => f.putLong(i.toLong * 2654435761L))
      var hits = 0
      (0 until 1000000).foreach { i => if (f.mightContainLong(-1L - i)) hits += 1 }
      hits / 1e6
    }
    println(s"FP at create(n, 0.01): ${fp(BloomFilter.create(11960000L, 0.01))}")
    println(s"FP at create(n, 229200000 bits): ${fp(BloomFilter.create(11960000L, 229200000L))}")
  }
}
