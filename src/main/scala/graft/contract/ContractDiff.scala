package graft.contract

/** Contract-diff / impact analysis (reference: aligned/checks.py:11-230):
  * pure-metadata comparison of two versions of a feature view, classifying
  * changes by their blast radius. Used before deploying contract changes.
  */
object ContractDiff {

  sealed trait Severity
  case object Info extends Severity
  /** consumers may need backfill */
  case object Warning extends Severity
  /** breaks existing consumers */
  case object Breaking extends Severity

  final case class Change(severity: Severity, what: String)

  def diff(old: FeatureView, updated: FeatureView): Seq[Change] = {
    val changes = Seq.newBuilder[Change]
    def features(v: FeatureView) =
      (v.entities ++ v.features).map(f => f.name -> f).toMap

    val (oldF, newF) = (features(old), features(updated))
    (oldF.keySet -- newF.keySet).toSeq.sorted.foreach(n =>
      changes += Change(Breaking, s"removed feature '$n'"))
    (newF.keySet -- oldF.keySet).toSeq.sorted.foreach(n =>
      changes += Change(Warning, s"added feature '$n' (consumers unaffected; backfill needed)"))
    (oldF.keySet & newF.keySet).toSeq.sorted.foreach { n =>
      val (a, b) = (oldF(n), newF(n))
      if (a.dtype != b.dtype)
        changes += Change(Breaking, s"feature '$n' dtype ${a.dtype.name} -> ${b.dtype.name}")
      if (a.constraints.toSet != b.constraints.toSet)
        changes += Change(Warning, s"feature '$n' constraints changed")
    }

    val (oldE, newE) = (old.entities.map(_.name).toSet, updated.entities.map(_.name).toSet)
    if (oldE != newE)
      changes += Change(Breaking, s"entity keys changed: ${oldE.toSeq.sorted} -> ${newE.toSeq.sorted}")

    if (old.eventTimestamp.map(_.name) != updated.eventTimestamp.map(_.name))
      changes += Change(Breaking, "event timestamp column changed")
    else if (old.eventTimestamp.flatMap(_.ttl) != updated.eventTimestamp.flatMap(_.ttl))
      changes += Change(Warning, "event timestamp TTL changed")

    val oldD = old.derived.map(d => d.name -> d).toMap
    val newD = updated.derived.map(d => d.name -> d).toMap
    (oldD.keySet & newD.keySet).toSeq.sorted.foreach { n =>
      if (oldD(n).dependingOn != newD(n).dependingOn)
        changes += Change(Warning, s"derived feature '$n' dependencies changed")
    }
    changes.result()
  }

  def isBreaking(old: FeatureView, updated: FeatureView): Boolean =
    diff(old, updated).exists(_.severity == Breaking)

  /** Model-contract diff (reference: checks.py:87-120,
    * check_exposed_models_for_potential_distribution_shift — the reference
    * asks each exposed model for its own drift estimate; offline, the
    * metadata-level signal is the input-feature set and the serving
    * surface): input refs removed or added → the model now trains/serves
    * on a different distribution (Warning, the reference's
    * PotentialModelDistributionShift); prediction-view changes classify
    * through [[diff]]; swapping the exposed-model implementation class is
    * a Warning (same contract, different scorer). */
  def diffModel(old: ModelContract, updated: ModelContract): Seq[Change] = {
    val changes = Seq.newBuilder[Change]
    val (oldIn, newIn) = (old.inputFeatures.toSet, updated.inputFeatures.toSet)
    (oldIn -- newIn).toSeq.sorted.foreach(r =>
      changes += Change(Warning, s"model input '$r' removed (potential distribution shift)"))
    (newIn -- oldIn).toSeq.sorted.foreach(r =>
      changes += Change(Warning, s"model input '$r' added (potential distribution shift)"))
    (old.predictionView, updated.predictionView) match {
      case (Some(a), Some(b)) => changes ++= diff(a, b)
        .map(c => c.copy(what = s"prediction view: ${c.what}"))
      case (Some(_), None) =>
        changes += Change(Breaking, "prediction view removed")
      case (None, Some(_)) =>
        changes += Change(Warning, "prediction view added")
      case _ => ()
    }
    val cls = (m: ModelContract) => m.model.map(_.getClass.getName)
    if (cls(old) != cls(updated) && old.model.nonEmpty && updated.model.nonEmpty)
      changes += Change(Warning,
        s"exposed model implementation changed: ${cls(old).get} -> ${cls(updated).get}")
    changes.result()
  }

  /** Curation-recipe diff — impact analysis for the third contract kind.
    * Severity grading follows what the change does to the CURATED CORPUS
    * and the EVAL BOUNDARY, the two things downstream consumers depend on:
    *   - split-router changes (trainPct, or any change to the near-dup
    *     family that re-shapes components) MOVE DOCUMENTS ACROSS THE
    *     TRAIN/TEST BOUNDARY — Breaking, the eval-contamination hazard
    *     leakageSafeSplit exists to prevent;
    *   - column rebindings (text/id) re-key the whole pipeline — Breaking;
    *   - selection / keep-best tuning changes WHICH rows survive but not
    *     any surviving doc's split side (components and their labels are
    *     computed BEFORE those stages) — Warning (rebuild and
    *     re-materialize, consumers re-read); the GATE is upstream of pair
    *     generation, so its knobs are boundary movers (Breaking);
    *   - description/ccMaxIter are metadata/robustness only — Info. */
  def diffRecipe(old: CurationRecipe, updated: CurationRecipe): Seq[Change] = {
    val changes = Seq.newBuilder[Change]
    def chg[A](what: String, f: CurationRecipe => A, sev: Severity): Unit =
      if (f(old) != f(updated))
        changes += Change(sev, s"$what: ${f(old)} -> ${f(updated)}")
    chg("text column", _.textCol, Breaking)
    // stage 0 sits upstream of pair generation: changing which docs are
    // eval (or the overlap gram size) re-forms components and re-rolls
    // split coins — AND moves the eval boundary itself: Breaking
    chg("decontamination slice (eval boundary + components move)",
      r => (r.decontamCol, r.decontamValue), Breaking)
    chg("decontamination gram size (overlap rule moves)", _.decontamN, Breaking)
    // drop vs excise changes the TEXT every later stage sees (and which
    // docs survive) — upstream of pair generation like the other stage-0
    // knobs: Breaking
    chg("decontamination mode (corpus text changes)", _.decontamMode, Breaking)
    chg("id column", _.idCol, Breaking)
    chg("train pct (split boundary moves)", _.trainPct, Breaking)
    // the near-dup family defines the COMPONENTS the split routes by: any
    // change re-clusters, so previously-together docs can land in
    // different splits — same hazard class as moving trainPct
    chg("near-dup threshold (components re-form; split boundary moves)",
      _.nearDupThreshold, Breaking)
    chg("near-dup bands (components re-form; split boundary moves)",
      _.nearDupBands, Breaking)
    chg("near-dup shingle k (components re-form; split boundary moves)",
      _.nearDupK, Breaking)
    // the gate feeds pair generation over the GATED corpus, and the split
    // coin is md5(component) where component = the cluster's min surviving
    // id — so gate changes can re-form components and re-roll the coin for
    // surviving docs: boundary movers, same class as trainPct
    chg("gopher min words (gate re-forms components; split boundary moves)",
      _.gopherMinWords, Breaking)
    chg("gopher rule mask (gate re-forms components; split boundary moves)",
      _.gopherRuleMask, Breaking)
    chg("keep-best score column", _.qualityScoreCol, Warning)
    // stage 3b drops/keeps whole terciles of the canonical corpus but sits
    // DOWNSTREAM of component formation, so (like DSIR) it shrinks the
    // curated corpus without re-rolling any split coin — Warning class
    chg("ccnet reference (tail-tercile filter re-selects)",
      r => (r.ccnetRefCol, r.ccnetRefValue), Warning)
    chg("dsir target", r => (r.dsirTargetCol, r.dsirTargetValue), Warning)
    chg("dsir keep pct", _.dsirKeepPct, Warning)
    chg("dsir buckets", _.dsirBuckets, Warning)
    chg("cc max iter (robustness bound only)", _.ccMaxIter, Info)
    chg("description", _.description, Info)
    changes.result()
  }

  def isBreakingRecipe(old: CurationRecipe, updated: CurationRecipe): Boolean =
    diffRecipe(old, updated).exists(_.severity == Breaking)
}
