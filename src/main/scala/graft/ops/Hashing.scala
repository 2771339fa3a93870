package graft.ops

/** Shared deterministic hashing utilities for dedup / blocking / fingerprints.
  * All pure functions of their inputs (no global RNG) so every job that uses
  * them is reproducible at any parallelism — a requirement for exact resume.
  */
object Hashing {

  @inline def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit FNV-1a string hash (public-domain algorithm). */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Character n-gram shingles (distinct) of a string. */
  def charShingles(s: String, n: Int): Set[Long] = {
    if (s.length < n) Set(fnv1a64(s))
    else (0 to s.length - n).iterator.map(i => fnv1a64(s.substring(i, i + n))).toSet
  }

  /** Word n-gram shingles (distinct) over whitespace tokens. */
  def wordShingles(s: String, n: Int): Set[Long] = {
    val toks = s.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Set(fnv1a64(toks.mkString(" ")))
    else (0 to toks.length - n).iterator.map(i => fnv1a64(toks.slice(i, i + n).mkString(" "))).toSet
  }

  private val MersennePrime = (1L << 61) - 1

  /** MinHash signature of a shingle set: k universal-hash minima,
    * h_i(x) = (a_i * x + b_i) mod (2^61 - 1) (Broder 1997 resemblance sketch).
    */
  def minHash(shingles: Iterable[Long], k: Int, seed: Long = 0x5eedL): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val as = Array.tabulate(k)(i => splitmix64(seed + 2L * i) | 1L)
    val bs = Array.tabulate(k)(i => splitmix64(seed + 2L * i + 1))
    for (x <- shingles) {
      var i = 0
      while (i < k) {
        // multiply-mod in 128-bit via Math.multiplyHigh-free route:
        // use BigInt-free trick: (a*x + b) mod p with p = 2^61-1
        val ax = mulmod61(as(i), x & MersennePrime)
        val v = (ax + (bs(i) & MersennePrime)) % MersennePrime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** (a*b) mod (2^61-1) without overflow, using 2^61≡1 folding. */
  @inline private def mulmod61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // value = hi*2^64 + lo; 2^64 = 8 * 2^61 ≡ 8 (mod 2^61-1)
    val p = MersennePrime
    val loMod = (lo & p) + (lo >>> 61)
    val hiMod = ((hi % p) * 8) % p
    ((loMod + hiMod) % p + p) % p
  }

  /** LSH band keys: hash r consecutive signature entries per band. */
  def bandKeys(sig: Array[Long], bands: Int, rows: Int): Array[Long] = {
    require(bands * rows <= sig.length)
    Array.tabulate(bands) { b =>
      var h = 0xcbf29ce484222325L ^ b
      var r = 0
      while (r < rows) { h = (h ^ sig(b * rows + r)) * 0x100000001b3L; r += 1 }
      h
    }
  }

  /** Exact Jaccard similarity of two shingle sets. */
  def jaccard(a: Set[Long], b: Set[Long]): Double = {
    if (a.isEmpty && b.isEmpty) 1.0
    else {
      val inter = a.intersect(b).size
      inter.toDouble / (a.size + b.size - inter)
    }
  }

  /** 64-bit SimHash over shingles (Charikar 2002): sign of per-bit vote sums. */
  def simHash(shingles: Iterable[Long]): Long = {
    val votes = new Array[Int](64)
    for (x <- shingles) {
      val h = splitmix64(x)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Polynomial rolling-hash document fingerprint (base-31 mod 2^64). */
  def rollingFingerprint(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * 31L + s.charAt(i); i += 1 }
    h
  }
}
