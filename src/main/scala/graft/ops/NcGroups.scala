package graft.ops

/** Negative-control group resolution (reference P4/P5,
  * `bigbugdata.py:61–101`) — driver-side: the sample universe is the
  * distinct file list, never big data.
  */
object NcGroups {

  /** For each (controlPattern, groupPattern): exactly ONE sample must
    * match the control pattern (else error), ≥1 the group pattern (else
    * error); regex is unanchored search. Returns control → members in
    * argument order (insertion order is semantic for first-match-wins).
    */
  def resolve(sampleIds: Seq[String],
      groupPatterns: Seq[(String, String)]): Seq[(String, Set[String])] =
    groupPatterns.map { case (ncPat, groupPat) =>
      val ncRe = ncPat.r
      val groupRe = groupPat.r
      val ncMatches = sampleIds.filter(s => ncRe.findFirstIn(s).isDefined)
      if (ncMatches.size != 1)
        throw new IllegalArgumentException(
          s"Expected one sample matching '$ncPat', found: ${ncMatches.size}")
      val members = sampleIds.filter(s => groupRe.findFirstIn(s).isDefined)
      if (members.isEmpty)
        throw new IllegalArgumentException(
          s"No samples found matching the group pattern '$groupPat'")
      ncMatches.head -> members.toSet
    }

  /** J2 lookup: sample → its control, FIRST matching group in argument
    * order wins (`bigbugdata.py:147–152` breaks on first hit). Samples in
    * no group are absent (downstream treats missing control RPM as 1).
    */
  def sampleToControl(sampleIds: Seq[String],
      groups: Seq[(String, Set[String])]): Map[String, String] =
    sampleIds.flatMap { s =>
      groups.collectFirst { case (nc, members) if members.contains(s) => s -> nc }
    }.toMap
}
