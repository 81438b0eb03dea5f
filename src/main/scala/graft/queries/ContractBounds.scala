package graft.queries

/** Lower bounds used by the contract-oracle queries for seeded/approximate
  * operators (MinHash banding, LSH/IVF ANN, LSH blocking, flagship match).
  *
  * Each bound is an invariant the driver's hash compare enforces every
  * round: the Spark side computes the true ratio against an exact baseline
  * computed in-Spark and emits `ratio >= bound` as a boolean column whose
  * oracle value is the literal `true`. The bounds are deliberately below
  * the measured fixture values (margin for seeded variation across scale
  * factors) but far above failure modes — a banding bug or threshold slip
  * collapses the ratios to near zero, not to just-under-the-bound.
  *
  * Re-measure with `sbt "runMain graft.ProbeContracts <sfDir>"` whenever a
  * seeded stage changes OR the driver regenerates the fixtures. Measured
  * values below were re-recorded 2026-08-13 on the regenerated fixtures
  * (64-distinct-name part table; 906k flagship candidates at sf0.1), at
  * sf0.001 / sf0.01 / sf0.1.
  */
object ContractBounds {

  /** MinHash (12 bands × 3 rows, est >= 0.35) recall of the exact
    * shingle-Jaccard >= 0.35 pair set. Measured: 1.00 / 1.00 / 1.00
    * (gross false positives 0 at every SF). */
  val minhashRecall = 0.85

  /** LSH ANN (6 hyperplane tables) recall@10 of the brute top-10.
    * Measured: 0.99 / 0.99 / 1.00. */
  val annLshRecall = 0.8

  /** IVF ANN (16 cells, 4 probes) recall@10 of the brute top-10.
    * Measured: 0.54 / 0.53 / 0.65 (random-init centroids; see
    * Ann.fitCentroids) — genuinely coarse at nProbe=4 (the AnnSpec
    * property shows recall rising monotonically with nProbe). */
  val annIvfRecall = 0.45

  /** PQ ANN (8 subspaces × 32 codes, ADC shortlist refine=8) recall@10 of
    * the brute top-10. Measured: 0.85 / 0.86 / 0.60 — the fixture's
    * near-orthogonal vectors are PQ's weakest regime (quantization error
    * comparable to the signal); a codes/LUT bug collapses recall to the
    * random-shortlist floor refine·k/n ≈ 0.04–0.16, far under the bound. */
  val annPqRecall = 0.5

  /** Persisted IVF-PQ store (16 shared cells, nProbe=4, PQ 8×32,
    * refine=8, exact flat refine) recall@10 of the brute top-10 —
    * compounds the IVF probe loss ON TOP of PQ's shortlist loss, so the
    * bound sits under both parents' floors. Measured (ProbeContracts at
    * sf0.001/0.01/0.1): 0.5125 / 0.5250 / 0.5500; a routing bug (codes
    * paired with the wrong codebooks, or probe reading the wrong cells)
    * collapses recall toward the random floor ≈ refine·k/n, far under
    * the bound. */
  val annIvfPqRecall = 0.3

  /** Filtered IVF serve (allowed = even vec_id, shared store, nProbe=4)
    * recall@10 of the exact FILTERED brute top-10 — the same probe-loss
    * shape as annIvfRecall over the halved candidate set (slightly lower
    * at tiny SF: half the per-cell candidates means probe misses bite
    * harder). Measured (ProbeContracts at sf0.001/0.01/0.1):
    * 0.4375 / 0.5250 / 0.5625, disallowed rows 0 at every SF; a filter
    * bug (post-filtering the global top-k instead of ranking the allowed
    * subset) under-returns and collapses recall toward 0. */
  val annFilteredRecall = 0.3

  /** Staleness report over the shared stores' in-distribution append
    * (build 2/3, append 1/3 of ONE corpus): cells with a build baseline
    * that still trip the 2× median-distance drift flag. A genuinely
    * drifted append trips MANY cells (AnnSpec's planted case); the
    * in-distribution lifecycle should trip almost none — the residual
    * tolerance is tiny cells whose build median is near zero (a
    * singleton lands on its centroid), where any appended member
    * explodes the ratio. Measured (ProbeContracts at sf0.001/0.01/0.1):
    * ivf 0/0/0, ivfpq 0/0/0; the adversarial-fixture sweep passes the
    * bounded boolean. */
  val annStalenessDriftCells = 3L

  /** J4 LSH similarity join (10 tables, bucketLength 1.0, threshold 1.3)
    * recall of the exact cross-join < 1.3 pair set on the id%20 subsets.
    * Measured: 1.00 / 1.00 / 1.00 (false positives and distance
    * mismatches 0 at every SF). */
  val lshJoinRecall = 0.8

  /** SemDeDup (8 KMeans cells, cosine >= 0.3) recall of the exact
    * all-pairs >= 0.3 set. The fixture embeddings are near-orthogonal —
    * the regime where single-assignment semantic blocking is weakest
    * (recall trends toward 1/nCells); on genuinely clustered data
    * DedupSpec shows recall = 1.0. Measured: 0.34 / 0.32 / 0.29 (false
    * positives 0 at every SF — structural: the kernel recomputes exact
    * cosines). */
  val semanticRecall = 0.15

  /** Weak-label quality model: holdout ROC-AUC separating corpus docs
    * from their deterministic degradations (repeat/strip/truncate).
    * The degradations shift every repetition/length signal by design,
    * so the classes are strongly separable. Measured: 1.00 / 1.00 /
    * 1.00 (sf0.001 / 0.01 / 0.1). */
  val qualityModelAuc = 0.9

  /** Flagship: golden pairs ranked into the top-500 output, as a fraction
    * of min(golden, output rows) — when golden outnumber the window
    * (sf0.1: 1333 golden) the metric is the golden share of the window.
    * Measured: 1.00 / 1.00 / 0.60 (sf0.1 value with the flagship config's
    * 50k stratified training cap, unchanged across the 2026-08-13 fixture
    * regeneration that grew the candidate set to 906k pairs). */
  val flagshipGoldenInTop = 0.4
}
