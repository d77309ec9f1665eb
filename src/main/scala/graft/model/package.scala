package graft

/** Typed data model (SURVEY.md §1.1/§1.4): case classes for the core
  * pipeline tables, used with `Dataset[T]` where the per-row numeric
  * kernels run as typed maps (Catalyst still optimizes the relational
  * skeleton around them).
  */
package object model {

  /** One NIfTI volume row (S3): path identity + header + pixels. */
  final case class Volume(
      path: String,
      shape: Array[Int],
      zooms: Array[Double],
      pixels: Array[Float])

  /** One oriented 2D slice (G1): `base__orient__slice_iii` identity. */
  final case class Slice(
      sliceId: String,
      base: String,
      orient: String,
      idx: Int,
      h: Int,
      w: Int,
      pixels: Array[Float])

  /** One tiled patch (G2): slice identity + `sNNN` position index. */
  final case class Patch(
      key: String,
      sliceId: String,
      tier: String, // HR | LRx{s}
      sIdx: Int,
      y0: Int,
      x0: Int,
      crop: Int,
      pixels: Array[Float])

  /** Sink record (S8/S9): ascii key → serialized bytes + typed metadata. */
  final case class KvRecord(
      key: String,
      value: Array[Byte],
      shape: Seq[Int],
      dtype: String)

  /** Split assignment row (W1–W3). */
  final case class SplitLabel(sliceId: String, split: String)

  /** Run manifest entry (§1.1 meta record). */
  final case class RunMeta(key: String, value: String)
}
