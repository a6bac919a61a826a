package graft.core

/** Shape utilities — reference operators R1-R4 (`utils.py:20-112,208-228`).
  *
  * In the Spark engine the canonical record is always 5-D TCZYX, so these
  * mostly run at the planning edge (normalizing source shapes into
  * [[Volume]]s); they are kept as explicit, tested functions for fidelity
  * with the reference surface.
  */
object Reshape {

  /** R1 `add_leading_dim` (`utils.py:20-34`): arr[None, ...]. */
  def addLeadingDim(shape: Array[Long]): Array[Long] = 1L +: shape

  /** R2 `pad_array_n_d` (`utils.py:37-59`): left-pad with size-1 axes to
    * `dim` (max 5, like the reference's guard at utils.py:54-55). */
  def padTo(shape: Array[Long], dim: Int = 5): Array[Long] = {
    require(dim <= 5, s"only up to 5 dimensions supported, got $dim")
    require(shape.length <= dim, s"shape rank ${shape.length} exceeds $dim")
    Array.fill[Long](dim - shape.length)(1L) ++ shape
  }

  /** R3 `extract_data` (`utils.py:62-112`): drop leading singleton axes,
    * optionally keeping exactly the last `lastDimensions` axes. */
  def squeeze(shape: Array[Long], lastDimensions: Option[Int] = None): Array[Long] =
    lastDimensions match {
      case Some(k) =>
        require(k <= shape.length, s"cannot keep $k of ${shape.length} dims")
        require(shape.take(shape.length - k).forall(_ == 1L),
          s"dropped leading dims must be singleton: ${shape.mkString(",")} -> last $k")
        shape.takeRight(k)
      case None => shape.dropWhile(_ == 1L) match {
        case rest if rest.isEmpty => Array(1L)
        case rest => rest
      }
    }

  /** R4 `validate_slices` (`utils.py:208-228`): 0 <= start < end <= len. */
  def validateSlices(start: Long, end: Long, len: Long): Unit = {
    require(start >= 0, s"slice start $start < 0")
    require(start < end, s"slice start $start >= end $end")
    require(end <= len, s"slice end $end > length $len")
  }
}
