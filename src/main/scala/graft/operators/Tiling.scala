package graft.operators

/** Shared tiling arithmetic for the bounded-tile pair scaffolds
  * (Similarity.tiledPairScan2, Dedup.blockedAllPairs/candidateKernel).
  * One definition so the heap-bound constants and the tile-assignment
  * function cannot desynchronize between the dedup and similarity kernels.
  */
private[operators] object Tiling {

  /** Tile count for a bucket/block of `size` rows at `maxTile` rows per
    * tile, clamped to 4096 tiles (a 4096² cell grid is the practical
    * replication ceiling; beyond it, raise maxTile).
    */
  def tilesFor(size: Long, maxTile: Long): Int =
    math.max(1L, math.min(4096L, (size + maxTile - 1) / maxTile)).toInt

  /** splitmix64 finalizer: tile assignment must NOT be floorMod(id, t) —
    * structured id spaces (sharded writers allocating ids in strides that
    * share a factor with t) would collapse every row into few tiles and
    * void the bounded-task-heap guarantee. Mixing first makes the
    * assignment uniform for any id distribution while staying a pure
    * function of the id (the pair-routing invariant needs tile(x) stable
    * across both sides of a scan).
    */
  private def mix(id: Long): Long = {
    var z = id + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The tile of row `id` among `t` tiles. */
  def tileOf(id: Long, t: Int): Int =
    java.lang.Math.floorMod(mix(id), t.toLong).toInt
}
