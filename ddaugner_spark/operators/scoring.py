"""Entity-level set-match scoring and tag statistics.

Reference semantics:

* CoNLL-2003 entity-level P/R/F1 (seqeval semantics) —
  /root/reference/ddaugner/score.py:7-56: precision = |pred ∩ ref|/|pred|,
  recall = |pred ∩ ref|/|ref|, F1 harmonic mean; an entity matches iff
  (position span, class) are identical.  This is the engine's P/R≥0.95
  acceptance metric (BASELINE.json).
* ignored-class masking — score.py:42-50 (tags of ignored classes → 'O'
  on both sides) ≙ dropping mention rows of those classes (score.py:103-105).
* tag frequencies / weights — datas.py:205-226.
* entity-class counts & ratios — ner_utils.py:68-96.

Scale notes: the match is an inner join on the full span key
(doc_id, sent_id, start_idx, end_idx, tag); both sides are mention tables
(orders of magnitude smaller than tokens), co-partitioned by the join key
hash.  Counts are single-stage partial-aggregated; final P/R/F1 arithmetic
is on three scalars.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SPAN_KEY = ["doc_id", "sent_id", "start_idx", "end_idx", "tag"]


def filter_ignored(mentions: DataFrame, ignored_classes: Optional[Iterable[str]]) -> DataFrame:
    """score.py:103-105 — drop mentions of ignored classes."""
    if not ignored_classes:
        return mentions
    return mentions.filter(~F.col("tag").isin(list(ignored_classes)))


def entity_set_score(
    pred: DataFrame,
    gold: DataFrame,
    ignored_classes: Optional[Iterable[str]] = None,
    ndigits: int = 4,
) -> DataFrame:
    """One-row (n_pred, n_gold, n_match, precision, recall, f1).

    F1 is null when P+R == 0, matching score_ner_old's None
    (score.py:125-126); P (resp. R) is null when there are no predicted
    (resp. reference) entities (score.py:112-123)."""
    pred = filter_ignored(pred, ignored_classes).select(*SPAN_KEY).distinct()
    gold = filter_ignored(gold, ignored_classes).select(*SPAN_KEY).distinct()
    matched = pred.join(gold, on=SPAN_KEY, how="inner")

    counts = (
        pred.agg(F.count("*").alias("n_pred"))
        .crossJoin(gold.agg(F.count("*").alias("n_gold")))
        .crossJoin(matched.agg(F.count("*").alias("n_match")))
    )
    p = F.when(F.col("n_pred") > 0, F.col("n_match") / F.col("n_pred"))
    r = F.when(F.col("n_gold") > 0, F.col("n_match") / F.col("n_gold"))
    return counts.select(
        "n_pred",
        "n_gold",
        "n_match",
        F.round(p, ndigits).alias("precision"),
        F.round(r, ndigits).alias("recall"),
        F.round(
            F.when((p + r) > 0, 2 * p * r / (p + r)),
            ndigits,
        ).alias("f1"),
    )


def tag_frequencies(docs_with_bio: DataFrame, ndigits: int = 6) -> DataFrame:
    """(tag, n, freq, weight) over the corpus BIO tags.

    freq = n / total (datas.py:205-214); weight = max_freq / freq
    (datas.py:216-226).  Window over the tiny aggregated table only."""
    tags = docs_with_bio.select(F.explode("tags").alias("tag"))
    counts = tags.groupBy("tag").agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy()
    return counts.select(
        "tag",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), ndigits).alias("freq"),
        F.round(F.max("n").over(w) / F.col("n"), ndigits).alias("weight"),
    )


def class_counts(mentions: DataFrame, ndigits: int = 6) -> DataFrame:
    """(tag, n, ratio): entity-class appearance counts and ratios
    (ner_utils.py:68-96)."""
    from pyspark.sql import Window

    counts = mentions.groupBy("tag").agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    return counts.select(
        "tag", "n", F.round(F.col("n") / F.sum("n").over(w), ndigits).alias("ratio")
    )


def prediction_errors(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """A6 (ner_utils.py:7-39): histogram of error surfaces.
    false_positives: predicted spans not in gold; false_negatives: gold
    spans not predicted; counted per ``" ".join(tokens)`` surface.
    Returns (surface, kind, n)."""
    fp = (
        pred.join(gold, on=SPAN_KEY, how="left_anti")
        .groupBy("surface")
        .agg(F.count("*").alias("n"))
        .withColumn("kind", F.lit("false_positive"))
    )
    fn = (
        gold.join(pred, on=SPAN_KEY, how="left_anti")
        .groupBy("surface")
        .agg(F.count("*").alias("n"))
        .withColumn("kind", F.lit("false_negative"))
    )
    return fp.unionByName(fn).select("surface", "kind", "n")


def per_group_scores(
    pred: DataFrame, gold: DataFrame, group_col: str, ndigits: int = 4
) -> DataFrame:
    """A9 (extract_metrics.py:61-95 / original_vs_fixed_ner.py:31-43):
    per-group (book/lang/…) entity-level P/R/F1, computed with a single
    grouped aggregation instead of a Python loop over groups."""
    p = pred.select(group_col, *SPAN_KEY).distinct()
    g = gold.select(group_col, *SPAN_KEY).distinct()
    matched = p.join(g, on=[group_col] + SPAN_KEY, how="inner")

    np_ = p.groupBy(group_col).agg(F.count("*").alias("n_pred"))
    ng = g.groupBy(group_col).agg(F.count("*").alias("n_gold"))
    nm = matched.groupBy(group_col).agg(F.count("*").alias("n_match"))
    j = np_.join(ng, group_col, "full").join(nm, group_col, "full").fillna(
        0, subset=["n_pred", "n_gold", "n_match"]
    )
    prec = F.when(F.col("n_pred") > 0, F.col("n_match") / F.col("n_pred"))
    rec = F.when(F.col("n_gold") > 0, F.col("n_match") / F.col("n_gold"))
    return j.select(
        group_col,
        "n_pred",
        "n_gold",
        "n_match",
        F.round(prec, ndigits).alias("precision"),
        F.round(rec, ndigits).alias("recall"),
        F.round(F.when((prec + rec) > 0, 2 * prec * rec / (prec + rec)), ndigits).alias("f1"),
    )


def mention_set_ops(a: DataFrame, b: DataFrame) -> DataFrame:
    """A10/U2/U3 (tes_specific_errors.py:57-83): entity-set algebra over
    two mention tables.  Returns (doc_id, sent_id, start_idx, end_idx,
    tag, membership) with membership ∈ {both, only_a, only_b}."""
    ka = a.select(*SPAN_KEY).distinct()
    kb = b.select(*SPAN_KEY).distinct()
    both = ka.intersect(kb).withColumn("membership", F.lit("both"))
    only_a = ka.exceptAll(kb).withColumn("membership", F.lit("only_a"))
    only_b = kb.exceptAll(ka).withColumn("membership", F.lit("only_b"))
    return both.unionByName(only_a).unionByName(only_b)


def disagreement_spans(tagged_pred: DataFrame, tagged_gold: DataFrame) -> DataFrame:
    """W4 (fix_ner.py:274-293): contiguous runs where predicted tags
    differ from gold, closed when the next position agrees.

    Inputs: two (doc_id, tokens, tags) tables (tags aligned per doc).
    Returns (doc_id, span_start, span_end, n_positions) — the error-span
    table the reference's interactive fixer iterates over.

    Corpus formulation: per-position disagreement flag → run-id window
    (a new run starts at each disagreeing position whose predecessor
    agrees) → per-run min/max."""
    from pyspark.sql import Window

    joined = tagged_pred.select(
        "doc_id", F.col("tags").alias("pred_tags")
    ).join(tagged_gold.select("doc_id", F.col("tags").alias("gold_tags")), "doc_id")
    pos = joined.select(
        "doc_id",
        F.posexplode(
            F.zip_with("pred_tags", "gold_tags", lambda p, g: (p != g).cast("int"))
        ).alias("pos", "neq"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = pos.withColumn(
        "is_start",
        (
            (F.col("neq") == 1)
            & (F.coalesce(F.lag("neq").over(w), F.lit(0)) == 0)
        ).cast("long"),
    ).withColumn("run_id", F.sum("is_start").over(w))
    return (
        runs.filter(F.col("neq") == 1)
        .groupBy("doc_id", "run_id")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            F.max("pos").cast("long").alias("span_end"),
            F.count("*").alias("n_positions"),
        )
        .select("doc_id", "span_start", "span_end", "n_positions")
    )


def majority_voting_table(mentions: DataFrame, tokens_long: DataFrame) -> DataFrame:
    """Corpus-level majority voting (utils.py:81-108 lifted to a groupBy):
    for each mention surface, count occurrences tagged as entities vs its
    total occurrences as a raw token n-gram; majority label per surface.

    Only unigram surfaces participate (multi-token surfaces would need the
    n-gram join of J1; the corpus analogue is identical in shape).
    Returns (surface, n_entity, n_o, majority) where majority follows the
    strict ``>`` of utils.py:101 (ties → 'O')."""
    ent = mentions.filter(F.col("start_idx") == F.col("end_idx")).groupBy(
        F.col("surface")
    ).agg(F.count("*").alias("n_entity"))
    occ = (
        tokens_long.join(F.broadcast(ent.select("surface")), tokens_long.tok == F.col("surface"))
        .groupBy("surface")
        .agg(F.count("*").alias("n_occ"))
    )
    return (
        ent.join(occ, "surface")
        .select(
            "surface",
            "n_entity",
            (F.col("n_occ") - F.col("n_entity")).alias("n_o"),
            F.when(F.col("n_entity") > (F.col("n_occ") - F.col("n_entity")), F.lit("ENTITY"))
            .otherwise(F.lit("O"))
            .alias("majority"),
        )
    )


def cohens_kappa(pred_tags: DataFrame, gold_tags: DataFrame) -> DataFrame:
    """Cohen's kappa between two token-level taggings — the
    inter-annotator-agreement number an annotation campaign reports
    next to the P/R/F1 of entity_prf (score.py:7-56); here the two
    "annotators" are any two (doc_id, tags array<string>) runs.

    kappa = (p_o − p_e) / (1 − p_e) with p_o the observed token-level
    agreement and p_e the chance agreement from the two marginal tag
    distributions.  One (doc_id, pos) equi-join of the exploded tag
    streams, then three scalar-sized aggregates (total/agree, per-class
    marginals, the marginal dot product).  p_e's numerator is exact
    integer (sum of marginal products) and the IEEE division order is
    fixed (num/n/n), so both engines agree to 6 digits; p_e = 1
    (both runs constant on one class) is guarded to kappa = 1.
    At extreme corpus sizes the integer numerator would overflow int64
    (n² at n > ~3e9 tokens) — production computes p_e on doubles.
    """
    a = pred_tags.select("doc_id", F.posexplode("tags").alias("pos", "tag_a"))
    b = gold_tags.select("doc_id", F.posexplode("tags").alias("pos", "tag_b"))
    pairs = a.join(b, ["doc_id", "pos"]).select("tag_a", "tag_b")
    tot = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum((F.col("tag_a") == F.col("tag_b")).cast("long"))
        .cast("long")
        .alias("n_agree"),
    )
    ca = pairs.groupBy("tag_a").agg(F.count(F.lit(1)).cast("long").alias("na"))
    cb = pairs.groupBy("tag_b").agg(F.count(F.lit(1)).cast("long").alias("nb"))
    pe = ca.join(cb, ca["tag_a"] == cb["tag_b"]).agg(
        F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0))
        .cast("long")
        .alias("pe_num")
    )
    n = F.col("n_tokens")
    po = F.col("n_agree") / n
    pe_frac = F.col("pe_num") / n / n
    return tot.crossJoin(pe).select(
        "n_tokens",
        F.round(po, 6).alias("po"),
        F.round(pe_frac, 6).alias("pe"),
        F.round(
            F.when(F.col("pe_num") == n * n, F.lit(1.0)).otherwise(
                (po - pe_frac) / (F.lit(1.0) - pe_frac)
            ),
            6,
        ).alias("kappa"),
    )


def type_confusion(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """(gold_tag, pred_tag, n) — span-level type-confusion matrix (the
    seqeval-style readout behind A5/A6: not just HOW MANY errors but
    WHICH classes trade mass).  Spans are matched on POSITION
    (doc, sent, start, end) so a right-span-wrong-type prediction counts
    as (gold_tag → pred_tag) rather than disappearing into one FP and
    one FN; unmatched gold spans land in the 'O' pred column, unmatched
    predictions in the 'O' gold row.

    One full-outer hash join on the position key (both sides distinct
    first — map-side combinable) + one tiny aggregate; output is
    |tags|² rows regardless of corpus size.
    """
    key = ["doc_id", "sent_id", "start_idx", "end_idx"]
    p = pred.select(*key, F.col("tag").alias("pred_tag")).distinct()
    g = gold.select(*key, F.col("tag").alias("gold_tag")).distinct()
    return (
        p.join(g, key, "full_outer")
        .groupBy(
            F.coalesce("gold_tag", F.lit("O")).alias("gold_tag"),
            F.coalesce("pred_tag", F.lit("O")).alias("pred_tag"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def paired_bootstrap_f1(
    pred_a: DataFrame,
    pred_b: DataFrame,
    gold: DataFrame,
    n_boot: int = 64,
    ndigits: int = 6,
) -> DataFrame:
    """Paired bootstrap significance test between two NER systems
    (Koehn 2004, doc-level resampling): one row ``(n_docs, n_boot,
    f1_a, f1_b, delta, wins_a, wins_b, ties)`` — micro-F1 of each
    system on the full corpus, plus how many of ``n_boot`` Poisson
    resamples each system wins.  The champion/challenger gate an
    NER-pipeline upgrade must pass before the new tagger ships; spans
    compare on the reference's exact span key (score.py semantics, as
    entity_set_score).

    Exactness: per-replicate micro-F1 = 2·TP/(NPRED+NGOLD), so the
    win comparison cross-multiplies — ``TA·(PB+G) > TB·(PA+G)`` in
    decimal(38,0) — and every replicate verdict is INTEGER-exact; the
    only floats are the three rendered F1/delta divisions.  Resample
    weights are the md5(doc|b)-uniform Poisson(1) device
    (stats.bootstrap_mean_ci), a pure function of doc identity.

    Scale shape: five doc-keyed count aggregates folded into one
    doc-sized stat table; that table (slim, 6 longs/doc) explodes
    × n_boot into ONE n_boot-way map-side-combined aggregate; the
    verdict fold runs on n_boot rows.  The corpus-sized mention sets
    are touched exactly once each.
    """
    from .stats import _POIS1_CDF

    g = gold.select(*SPAN_KEY).distinct()
    a = pred_a.select(*SPAN_KEY).distinct()
    b = pred_b.select(*SPAN_KEY).distinct()

    def cnt(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias(name)
        )

    names = ("ng", "na", "nb", "ta", "tb")
    st = (
        cnt(g, "ng")
        .join(cnt(a, "na"), "doc_id", "full")
        .join(cnt(b, "nb"), "doc_id", "full")
        .join(cnt(a.join(g, SPAN_KEY), "ta"), "doc_id", "full")
        .join(cnt(b.join(g, SPAN_KEY), "tb"), "doc_id", "full")
        .select(
            "doc_id",
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
                for c in names
            ],
        )
    )
    reps = st.withColumn(
        "b", F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1)))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("doc_id").cast("string"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**12))
    )
    w = F.when(u < _POIS1_CDF[0], F.lit(0))
    for k in range(1, 6):
        w = w.when(u < _POIS1_CDF[k], F.lit(k))
    w = w.otherwise(F.lit(6)).cast("long")
    per_rep = reps.groupBy("b").agg(
        *[F.sum(w * F.col(c)).cast("decimal(38,0)").alias(c.upper()) for c in names]
    )
    win_a = F.col("TA") * (F.col("NB") + F.col("NG")) > F.col("TB") * (
        F.col("NA") + F.col("NG")
    )
    win_b = F.col("TB") * (F.col("NA") + F.col("NG")) > F.col("TA") * (
        F.col("NB") + F.col("NG")
    )
    verdict = per_rep.agg(
        F.sum(win_a.cast("long")).cast("long").alias("wins_a"),
        F.sum(win_b.cast("long")).cast("long").alias("wins_b"),
        F.sum((~win_a & ~win_b).cast("long")).cast("long").alias("ties"),
    )
    f1_a = 2 * F.col("ta") / (F.col("na") + F.col("ng"))
    f1_b = 2 * F.col("tb") / (F.col("nb") + F.col("ng"))
    full = st.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        *[F.sum(c).cast("long").alias(c) for c in names],
    ).select(
        "n_docs",
        F.lit(n_boot).cast("long").alias("n_boot"),
        F.round(f1_a, ndigits).alias("f1_a"),
        F.round(f1_b, ndigits).alias("f1_b"),
        F.round(f1_a - f1_b, ndigits).alias("delta"),
    )
    return full.crossJoin(verdict)


def fleiss_kappa(
    ratings: DataFrame,
    item_cols: list[str],
    cat_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Fleiss' kappa for R raters over N items: one row ``(n_items,
    n_raters, balanced, p_bar, p_e, kappa)`` — the multi-rater
    agreement statistic (Cohen's kappa generalizes only to 2 raters;
    an annotation campaign with 3+ taggers reports Fleiss).  ``ratings``
    is the long table: one row per (item, rater) holding the chosen
    category; ``balanced`` flags whether every item really received the
    same R ratings (the statistic assumes it).

    Exactness: kappa reduces to pure integer aggregates —
    P̄ = (Σᵢ Σ_c n²ᵢ_c − N·R)/(N·R·(R−1)) and
    P_e = Σ_c m²_c/(N·R)² — so both engines compute identical doubles
    from identical integers in one fixed chain (divisions written
    sequentially so no long overflow at web scale).  Degenerate
    P_e = 1 ⇒ the -9.9 sentinel.

    Scale shape: one (item, category) hash aggregate over the ratings
    (map-side combined), folded once per item and once per category —
    both second-stage tables are dimension-sized.
    """
    nic = ratings.groupBy(
        *item_cols, F.col(cat_col).alias("_cat")
    ).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    per_item = nic.groupBy(*item_cols).agg(
        F.sum("_n").cast("long").alias("_r"),
        F.sum(F.col("_n").cast("decimal(38,0)") * F.col("_n")).alias("_s2"),
    )
    istats = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.max("_r").cast("long").alias("n_raters"),
        (F.min("_r") == F.max("_r")).alias("balanced"),
        F.sum("_s2").cast("decimal(38,0)").alias("_S"),
    )
    cstats = (
        nic.groupBy("_cat")
        .agg(F.sum("_n").cast("long").alias("_m"))
        .agg(
            F.sum(F.col("_m").cast("decimal(38,0)") * F.col("_m")).alias(
                "_SM2"
            ),
            F.sum("_m").cast("long").alias("_NR"),
        )
    )
    j = istats.crossJoin(cstats)
    nd = F.col("n_items").cast("double")
    rd = F.col("n_raters").cast("double")
    nrd = F.col("_NR").cast("double")
    p_bar = (F.col("_S").cast("double") - nd * rd) / (
        nd * rd * (rd - 1.0)
    )
    p_e = F.col("_SM2").cast("double") / nrd / nrd
    kappa = F.when(p_e < 1.0, (p_bar - p_e) / (1.0 - p_e))
    return j.select(
        "n_items",
        "n_raters",
        "balanced",
        F.round(p_bar, ndigits).alias("p_bar"),
        F.round(p_e, ndigits).alias("p_e"),
        F.coalesce(F.round(kappa, ndigits), F.lit(-9.9)).alias("kappa"),
    )


def weighted_revote(
    votes: DataFrame,
    item_cols: list[str],
    rater_col: str,
    label_col: str,
) -> DataFrame:
    """Reliability-weighted label aggregation (one fixed iteration of
    the Dawid-Skene idea): one row per rater with ``(rater, n_votes,
    n_agree, acc_milli, n_relabeled)`` — round 0 takes the plain
    majority per item (ties → lexicographic min label), each rater's
    reliability is their Laplace-smoothed agreement with that majority
    (rounded ONCE to integer milli-units), and a weighted re-vote with
    those integer weights relabels items where reliable raters
    disagree with the raw majority.  ``n_relabeled`` (same on every
    row) is how many items moved.  The label-aggregation step every
    multi-annotator NER campaign runs before training.

    Exactness: weights are integers after one rounded division per
    rater; both vote rounds are integer-count argmaxes with full
    (count desc, label asc) tiebreaks — no float compare decides a
    label.  Scale shape: two (item, label) hash aggregates and two
    item-partitioned windows on the count tables; rater weights are a
    raters-sized broadcast.
    """
    v = votes.select(
        *item_cols,
        F.col(rater_col).alias("_rater"),
        F.col(label_col).alias("_lab"),
    )
    cnt = v.groupBy(*item_cols, "_lab").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    wmaj = Window.partitionBy(*item_cols).orderBy(
        F.col("_c").desc(), F.col("_lab").asc()
    )
    maj = (
        cnt.withColumn("_rn", F.row_number().over(wmaj))
        .where(F.col("_rn") == 1)
        .select(*item_cols, F.col("_lab").alias("_maj"))
    )
    pr = (
        v.join(maj, item_cols)
        .groupBy("_rater")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_votes"),
            F.sum((F.col("_lab") == F.col("_maj")).cast("long"))
            .cast("long")
            .alias("n_agree"),
        )
    )
    wt = pr.select(
        "_rater",
        "n_votes",
        "n_agree",
        F.round(
            F.lit(1000000)
            * (F.col("n_agree") + 1).cast("double")
            / (F.col("n_votes") + 2)
        )
        .cast("long")
        .alias("acc_milli"),
    )
    ws = (
        v.join(F.broadcast(wt.select("_rater", "acc_milli")), "_rater")
        .groupBy(*item_cols, "_lab")
        .agg(F.sum("acc_milli").cast("long").alias("_s"))
    )
    wnew = Window.partitionBy(*item_cols).orderBy(
        F.col("_s").desc(), F.col("_lab").asc()
    )
    new = (
        ws.withColumn("_rn", F.row_number().over(wnew))
        .where(F.col("_rn") == 1)
        .select(*item_cols, F.col("_lab").alias("_lab1"))
    )
    rel = (
        new.join(maj, item_cols)
        .agg(
            F.sum((F.col("_lab1") != F.col("_maj")).cast("long"))
            .cast("long")
            .alias("n_relabeled")
        )
    )
    return wt.crossJoin(F.broadcast(rel)).select(
        F.col("_rater").alias("rater"),
        "n_votes",
        "n_agree",
        "acc_milli",
        "n_relabeled",
    )
