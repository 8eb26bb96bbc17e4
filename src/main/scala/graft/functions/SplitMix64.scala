package graft.functions

/** The splitmix64 finalizer (Steele et al., JDK SplittableRandom) —
  * the one integer mixer shared by every deterministic-hash need in
  * the library (LSH hyperplanes, count-min rows), so the magic
  * constants exist exactly once. */
object SplitMix64 {
  @inline def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4B7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
