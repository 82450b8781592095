package graft.functions

/** SPLIT-BLOCK BLOOM FILTER (Putze/Sanders/Singler "Cache-, Hash- and
  * Space-Efficient Bloom Filters", 2007 — the scheme Impala and the
  * Parquet format standardize): all k probe bits of a key live inside
  * ONE 256-bit block, so a membership test costs ~one cache line of
  * memory traffic instead of k scattered misses. For the probe-heavy
  * pre-filters here (hundreds of millions of wedge probes against a
  * tens-of-MB filter, far beyond L2) that locality is worth ~5-7x on
  * the probe loop at a modest space premium (~16 bits/key for ~1% fp
  * vs ~10 for a classic Bloom at the same rate).
  *
  * Layout follows the public Parquet BloomFilter spec: blocks of
  * eight 32-bit words; word i of a block gets exactly one bit, at
  * position ((x * SALT(i)) >>> 27), where x is the key's low 32 bits
  * and the block index comes from the key's high 32 bits. Callers
  * feed 64-bit keys that are ALREADY well-mixed (xxhash64 here) —
  * the filter applies no further mixing, exactly like the classic
  * [[org.apache.spark.util.sketch.BloomFilter]] path it replaces.
  *
  * Serialization: 4-byte block count followed by the raw words —
  * stable across JVMs (the expression embeds it as a plan literal).
  */
final class BlockedBloom(val numBlocks: Int) extends Serializable {
  require(numBlocks > 0 && (numBlocks & (numBlocks - 1)) == 0,
    s"numBlocks must be a positive power of two, got $numBlocks")
  val words = new Array[Int](numBlocks * 8)
  @inline private def blockOf(key: Long): Int =
    (((key >>> 32).toInt) & (numBlocks - 1)) * 8

  def put(key: Long): Unit = {
    val b = blockOf(key)
    val x = key.toInt
    var i = 0
    while (i < 8) {
      words(b + i) |= 1 << ((x * BlockedBloom.SALT(i)) >>> 27)
      i += 1
    }
  }

  def mightContain(key: Long): Boolean = {
    val b = blockOf(key)
    val x = key.toInt
    var i = 0
    while (i < 8) {
      if ((words(b + i) & (1 << ((x * BlockedBloom.SALT(i)) >>> 27))) == 0)
        return false
      i += 1
    }
    true
  }

  def mergeInPlace(other: BlockedBloom): BlockedBloom = {
    require(other.numBlocks == numBlocks,
      s"cannot merge BlockedBloom of $numBlocks blocks with ${other.numBlocks}")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }

  def serialized: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + words.length * 4)
    bb.putInt(numBlocks)
    words.foreach(bb.putInt)
    bb.array()
  }
}

object BlockedBloom {
  /** Parquet-spec block salts (public: parquet-format BloomFilter.md). */
  val SALT: Array[Int] = Array(
    0x47b6137b, 0x44974d91, 0x8824ad5b, 0xa2b7289d,
    0x705495c7, 0x2df1424b, 0x9efc4947, 0x5c6bfb31)

  /** Filter sized at ~`bitsPerKey` bits per expected key (16 ≈ 1% fp
    * for this scheme), block count rounded up to a power of two.
    */
  def create(expectedKeys: Long, bitsPerKey: Int = 16): BlockedBloom = {
    require(expectedKeys > 0, s"expectedKeys must be positive, got $expectedKeys")
    require(bitsPerKey >= 8, s"bitsPerKey must be >= 8, got $bitsPerKey")
    val minBlocks = math.max(1L, (expectedKeys * bitsPerKey + 255) / 256)
    val blocks = java.lang.Long.highestOneBit(minBlocks) match {
      case b if b == minBlocks => b
      case b => b << 1
    }
    // 2^25 blocks = 1 GiB of filter: the largest size whose backing
    // int array (blocks·8) AND serialized byte length (4 + blocks·32)
    // both stay within Int range — the old 2^30 bound overflowed
    // `new Array[Int](numBlocks * 8)` from 2^28 blocks up
    require(blocks <= (1L << 25), s"BlockedBloom too large: $blocks blocks " +
      s"(max ${1L << 25} = 1 GiB; split the key space or raise fpp)")
    new BlockedBloom(blocks.toInt)
  }

  def deserialize(bytes: Array[Byte]): BlockedBloom = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val f = new BlockedBloom(bb.getInt)
    var i = 0
    while (i < f.words.length) { f.words(i) = bb.getInt; i += 1 }
    f
  }
}
