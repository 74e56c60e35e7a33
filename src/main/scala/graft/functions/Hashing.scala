package graft.functions

/**
 * Deterministic 64-bit hashing primitives for the dedup engine.
 *
 * All signature math in the pipeline flows through these functions so that
 * results are bit-identical regardless of partitioning, task order, or
 * cluster size (determinism requirement mirrors the reference's fixed-seed
 * policy, /root/reference/ai_pdf_panel_duplicate_check_AUTO.py:344-356).
 *
 * xxHash64 is implemented from the public algorithm specification
 * (github.com/Cyan4973/xxHash, BSD-2) — no dependency on Spark internals,
 * so signatures stay stable across Spark versions.
 */
object Hashing {

  // ---- xxHash64 (public domain algorithm) ----------------------------
  private final val P1 = 0x9E3779B185EBCA87L
  private final val P2 = 0xC2B2AE3D27D4EB4FL
  private final val P3 = 0x165667B19E3779F9L
  private final val P4 = 0x85EBCA77C2B2AE63L
  private final val P5 = 0x27D4EB2F165667C5L

  @inline private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  @inline private def round(acc: Long, input: Long): Long =
    rotl(acc + input * P2, 31) * P1

  @inline private def mergeRound(acc: Long, v: Long): Long =
    (acc ^ round(0L, v)) * P1 + P4

  /** xxHash64 over a byte array slice. */
  def xxh64(data: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    var h: Long = 0L
    var i = off
    val end = off + len
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      val limit = end - 32
      while (i <= limit) {
        v1 = round(v1, readLong(data, i)); i += 8
        v2 = round(v2, readLong(data, i)); i += 8
        v3 = round(v3, readLong(data, i)); i += 8
        v4 = round(v4, readLong(data, i)); i += 8
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = mergeRound(h, v1); h = mergeRound(h, v2)
      h = mergeRound(h, v3); h = mergeRound(h, v4)
    } else {
      h = seed + P5
    }
    h += len
    while (i + 8 <= end) {
      h ^= round(0L, readLong(data, i))
      h = rotl(h, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= end) {
      h ^= (readInt(data, i) & 0xFFFFFFFFL) * P1
      h = rotl(h, 23) * P2 + P3
      i += 4
    }
    while (i < end) {
      h ^= (data(i) & 0xFFL) * P5
      h = rotl(h, 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  @inline private def readLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24) | ((b(i + 4) & 0xFFL) << 32) |
      ((b(i + 5) & 0xFFL) << 40) | ((b(i + 6) & 0xFFL) << 48) |
      ((b(i + 7) & 0xFFL) << 56)

  @inline private def readInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) |
      ((b(i + 3) & 0xFF) << 24)

  /** xxHash64 of a UTF-8 string. */
  def xxh64(s: String, seed: Long): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    xxh64(b, 0, b.length, seed)
  }

  /** xxHash64 of a single long (8 little-endian bytes). */
  def xxh64Long(v: Long, seed: Long): Long = {
    var h = seed + P5 + 8L
    h ^= round(0L, v)
    h = rotl(h, 27) * P1 + P4
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  /** xxHash64 of a single int (4 little-endian bytes) — the standard XXH64
    * 4-byte tail, identical to Spark's `xxhash64` over one IntegerType
    * column (ExpressionsSpec pins the parity; the LSH item generator chains
    * it with [[xxh64Long]] to reproduce `xxhash64(v_id, v_hash)` exactly). */
  def xxh64Int(v: Int, seed: Long): Long = {
    var h = seed + P5 + 4L
    h ^= (v & 0xFFFFFFFFL) * P1
    h = rotl(h, 23) * P2 + P3
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  // ---- SplitMix64: seed-stream generator for minhash permutations ----
  /** SplitMix64 step (public algorithm; used to derive per-perm params). */
  def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /**
   * Per-permutation parameters for MinHash: h_i(x) = a_i*x + b_i over Z_2^64
   * (multiply-shift universal hashing). a is forced odd. Seeded per perm
   * INDEX, never per task — determinism across cluster sizes
   * (SURVEY.md §7 hard part (e)).
   */
  def minhashParams(numPerms: Int, seed: Long): (Array[Long], Array[Long]) = {
    val a = new Array[Long](numPerms)
    val b = new Array[Long](numPerms)
    var s = seed
    var i = 0
    while (i < numPerms) {
      s = splitmix64(s); a(i) = s | 1L
      s = splitmix64(s); b(i) = s
      i += 1
    }
    (a, b)
  }

  /** 64-bit avalanche finalizer (for mixing composite keys). */
  @inline def mix64(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 33)) * 0xFF51AFD7ED558CCDL
    z = (z ^ (z >>> 33)) * 0xC4CEB9FE1A85EC53L
    z ^ (z >>> 33)
  }
}
