"""Retrieval operators over the document corpus: TF-IDF term weighting,
inverted-index postings, and BM25 query scoring.

Training-data-pipeline operators (engine additions; the reference
consumes pre-tokenized CoNLL and has no retrieval surface).  All pure
column expressions — the corpus-sized work in every operator is one
tokenize-explode plus hash aggregates with map-side combine; the only
non-agg state is bounded (top-k windows, capped posting slices).

Float parity with the DuckDB oracle twins: scores mix BIGINT counts with
``ln`` — both engines evaluate the same IEEE-double expression, and every
emitted / rank-ordering score is rounded first so a last-ulp libm
difference cannot reorder ties (ties then break on the token / doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, token) — whitespace tokens, empty-token-free, NULL text
    treated as the empty doc (same contract as textstats)."""
    return (
        docs.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
    )


def tfidf_top_terms(docs: DataFrame, k: int = 5, ndigits: int = 6) -> DataFrame:
    """(doc_id, token, tf, df, tfidf, rank) — the ``k`` highest-weighted
    terms per document under smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, sklearn's ``smooth_idf`` form).

    Scale shape: tf is the one corpus-sized aggregate (map-side combined
    to distinct (doc, token) rows before its exchange); df re-aggregates
    tf's OUTPUT per token, so AQE reuses the same shuffle stage rather
    than re-scanning the corpus (the langid-profile pattern,
    textstats.langid_predictions).  df is vocabulary-sized — a dimension
    table — and is broadcast back onto tf; N rides along as a broadcast
    1-row scalar, never a driver-side ``.count()``.  The per-doc top-k
    window partitions on doc_id (the key tf is already hashed by).

    Ranking uses the ROUNDED score (desc, then token asc) so the oracle
    twin ranks identically.
    """
    tf = _tokens(docs).groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                ndigits,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "df", "tfidf", "rank")
    )


def postings(docs: DataFrame, max_postings: int = 16) -> DataFrame:
    """(token, df, postings) — inverted index: per-token document
    frequency plus the first ``max_postings`` doc_ids (ascending,
    comma-joined so downstream hashing/storage sees a scalar).

    Scale shape: the corpus collapses to distinct (token, doc_id) pairs
    map-side; df is a count over those pairs.  The posting list is
    BOUNDED before any collect — a per-token row_number window keeps
    only the first ``max_postings`` doc_ids, so no executor ever holds
    an unbounded list for a stopword-frequency token (the naive
    sort_array(collect_list(...)) form would).  Window and both
    aggregates share the token hash key.
    """
    pairs = _tokens(docs).distinct()
    dfreq = pairs.groupBy("token").agg(F.count("*").alias("df"))
    w = Window.partitionBy("token").orderBy(F.col("doc_id").asc())
    head = pairs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= max_postings
    )
    plist = head.groupBy("token").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")), lambda d: d.cast("string")
            ),
            ",",
        ).alias("postings")
    )
    return dfreq.join(plist, "token").select("token", "df", "postings")


def bm25_scores(
    docs: DataFrame,
    query_tokens: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    ndigits: int = 4,
) -> DataFrame:
    """(doc_id, score, rank) — the ``k`` best documents for a bag-of-words
    query under Okapi BM25 (Robertson-style idf = ln(1 + (N-df+0.5)/(df+0.5)),
    never negative).

    Scale shape: the query is a literal in-list, so the corpus-sized
    explode is filtered to query terms BEFORE its aggregate — tf rows are
    |docs| × |query| at most.  Document length and the corpus-average
    length come from a separate doc-level aggregate: dl is per-doc
    (map-only arithmetic on the already-loaded text column), avgdl is a
    broadcast 1-row scalar.  df per query term is query-sized.  The
    final per-doc sum adds ≤ |query| rounded-input doubles, then rounds —
    ordering differences below the rounding grain cannot flip ranks
    (ties break on doc_id).
    """
    toks = _tokens(docs).filter(F.col("token").isin(query_tokens))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    dl = docs.withColumn("text", F.coalesce(F.col("text"), F.lit(""))).select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != "")).alias("dl"),
    )
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count("*").cast("double").alias("n_docs")
    )
    term = (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    scored = term.groupBy("doc_id").agg(
        F.round(F.sum("contrib"), ndigits).alias("score")
    )
    # distributed top-k (TakeOrderedAndProject: per-partition heads, no
    # global single-partition sort), then rank the k survivors
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "doc_id", "score", "rank"
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    k_rrf: int = 60,
    k: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """(id, rrf, fused_rank, rank_a, rank_b) — Reciprocal Rank Fusion
    (Cormack et al. 2009) of two ranked result lists: rrf(d) =
    Σ_lists 1/(k_rrf + rank_list(d)), the standard score-free way to
    combine lexical (BM25) and dense (ANN) retrieval into one hybrid
    ranking — absent-from-a-list contributes 0.

    Scale shape: the inputs are ALREADY k-bounded top-k lists (each
    retriever did its own distributed top-k — TakeOrderedAndProject /
    cell-join), so the fusion is a full-outer join of two tiny tables
    plus one result-sized window: constant work no matter the corpus
    behind the lists.  Each 1/(k_rrf+r) term is one exact IEEE division
    of small integers and the sum has a fixed two-term order — both
    engines produce identical doubles, rounded before ranking so ties
    break on the id deterministically.  Absent-from-a-list ranks are
    emitted as 0 (never a valid rank) rather than NULL so downstream
    storage keeps one integer type."""
    a = ranked_a.select(F.col(id_col), F.col("rank").alias("rank_a"))
    b = ranked_b.select(F.col(id_col), F.col("rank").alias("rank_b"))
    j = a.join(b, id_col, "full_outer")
    rrf = F.round(
        F.coalesce(1.0 / (F.lit(k_rrf) + F.col("rank_a")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(k_rrf) + F.col("rank_b")), F.lit(0.0)),
        ndigits,
    )
    top = (
        j.withColumn("rrf", rrf)
        .orderBy(F.col("rrf").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return top.withColumn(
        "fused_rank", F.row_number().over(w).cast("long")
    ).select(
        id_col,
        "rrf",
        "fused_rank",
        F.coalesce(F.col("rank_a"), F.lit(0)).cast("long").alias("rank_a"),
        F.coalesce(F.col("rank_b"), F.lit(0)).cast("long").alias("rank_b"),
    )


def mmr_select(emb: DataFrame, k: int = 5, scale: int = 1000) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998)
    diversified top-k over an embedding table: greedily pick the vector
    maximizing ``λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`` with λ = 1/2 —
    the diversity re-ranker between retrieval and a RAG/training-mix
    context window (near-duplicate passages waste the budget).

    Exactness device: coordinates quantize to round(x·scale) integers
    (the label_medoids device), similarities are raw integer dot
    products, and at λ = 1/2 the argmax of λ·rel − (1−λ)·sim equals the
    argmax of the INTEGER ``rel − max_sim`` — no float enters any
    comparison, so engine and oracle agree bit-for-bit; ties break on
    the packed lpad min-key (score, then vec_id).

    The query is the corpus row with the smallest vec_id (excluded from
    candidacy); rel = dot(query, d).

    Scale: the selected set is ≤ k rows and rides the plan as LITERAL
    arrays (the k-means literal-centroid device) — every iteration is
    one map-only scan of the candidates (k−1 literal dots + a greatest)
    feeding a single min-aggregate; candidates are never shuffled and
    never re-join themselves.  Only the k picked rows (k·dim ints) ever
    reach the driver."""
    qcol = F.transform(
        F.col("embedding"), lambda x: F.round(x * scale).cast("long")
    )
    base = emb.select("vec_id", qcol.alias("q"))
    qrow = base.orderBy("vec_id").limit(1).collect()[0]
    qid, qv = qrow["vec_id"], [int(v) for v in qrow["q"]]

    def dot_lit(vec: list[int]):
        lit = F.array(*[F.lit(v) for v in vec])
        return F.aggregate(
            F.zip_with(F.col("q"), lit, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )

    cands = base.filter(F.col("vec_id") != qid).select(
        "vec_id", "q", dot_lit(qv).alias("rel")
    )
    selected: list[tuple[int, list[int]]] = []
    out: list[tuple[int, int, int, int, int]] = []
    for step in range(1, k + 1):
        if selected:
            sims = [dot_lit(v) for (_, v) in selected]
            maxsim = sims[0] if len(sims) == 1 else F.greatest(*sims)
        else:
            maxsim = F.lit(0).cast("long")
        score = F.col("rel") - maxsim
        key = F.concat_ws(
            "#",
            F.lpad((F.lit(10**15) - score).cast("string"), 16, "0"),
            F.lpad(F.col("vec_id").cast("string"), 19, "0"),
        )
        alive = cands.filter(
            ~F.col("vec_id").isin([vid for vid, _ in selected])
        )
        best = alive.select(F.min(key).alias("k")).collect()[0]["k"]
        if best is None:
            break
        score_v = 10**15 - int(best[:16])
        picked = int(best[17:])
        prow = base.filter(F.col("vec_id") == picked).collect()[0]
        pv = [int(v) for v in prow["q"]]
        # exact integer replay of rel / max_sim for the emitted row
        rel_v = sum(a * b for a, b in zip(qv, pv))
        out.append((step, picked, rel_v, rel_v - score_v, score_v))
        selected.append((picked, pv))
    return emb.sparkSession.createDataFrame(
        out, "step long, vec_id long, rel long, max_sim long, score long"
    )


def phrase_search(docs: DataFrame, phrases: list[str]) -> DataFrame:
    """Positional-postings phrase search: exact two-word phrase matches
    via intersection of the two terms' position lists (the classic
    inverted-index phrase plan — Lucene/ES ``match_phrase``), NOT a
    substring scan of the corpus.

    Scale shape: tokenize-explode once, keep ONLY postings of tokens
    that lead (or trail) some phrase — two tiny InSet prefilters, so
    the join operands are posting-sized, not corpus-sized — then one
    equi-join on (doc_id, adjacent position) and a hash aggregate.
    Document-frequency-bounded output; an n-word phrase chains n−1 of
    the same join.  Positions index the RAW split array (empty tokens
    keep their slot), matching the corpus tokenizer contract.

    Returns (phrase, doc_id, n_occ, first_pos).
    """
    for p in phrases:
        if len(p.split(" ")) != 2:
            raise ValueError(f"two-word phrases only: {p!r}")
    firsts = sorted({p.split(" ")[0] for p in phrases})
    seconds = sorted({p.split(" ")[1] for p in phrases})
    toks = (
        docs.filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
    )
    p1 = toks.filter(F.col("tok").isin(firsts)).select(
        "doc_id", "pos", F.col("tok").alias("w1")
    )
    p2 = toks.filter(F.col("tok").isin(seconds)).select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("tok").alias("w2")
    )
    return (
        p1.join(p2, ["doc_id", "pos"])
        .withColumn("phrase", F.concat_ws(" ", "w1", "w2"))
        .filter(F.col("phrase").isin(phrases))
        .groupBy("phrase", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.min("pos").cast("long").alias("first_pos"),
        )
    )


def ql_dirichlet(
    docs: DataFrame,
    terms: list[str],
    mu: int = 2000,
    k: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Query-likelihood ranking with Dirichlet smoothing: the top-k
    documents by ``Σ_t ln((tf_t,d + μ·cf_t/|C|) / (|d| + μ))`` — the
    classic LM alternative to BM25 (Zhai/Lafferty); μ is the Dirichlet
    prior mass.  Returned as ``(rank, doc_id, score)`` with the rank
    decided by the ROUNDED score (doc_id tiebreak) so both engines
    rank identically.

    Shapes: corpus stats are two aggregates (per-term collection
    frequencies — a |terms|-row dimension — and per-doc lengths); the
    per-(doc, term) tf table comes from the one token explode the
    corpus pays anyway, filtered to the query terms BEFORE the
    aggregate.  The scoring fan-out is docs × |terms| slim rows; the
    ln is the libm call, rounded (the naive_bayes idiom).
    """
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.coalesce(F.col("text"), F.lit("")), " ")
        ).alias("tok"),
    ).where(F.col("tok") != "")
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl")
    )
    qt = toks.where(F.col("tok").isin(terms))
    cf = qt.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cf"))
    ctot = toks.agg(F.count(F.lit(1)).cast("long").alias("C"))
    tf = qt.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    fan = (
        dl.crossJoin(F.broadcast(cf))
        .crossJoin(F.broadcast(ctot))
        .join(tf, ["doc_id", "tok"], "left")
    )
    term_ll = F.log(
        (
            F.coalesce(F.col("tf"), F.lit(0)).cast("double")
            + F.lit(float(mu)) * F.col("cf") / F.col("C")
        )
        / (F.col("dl") + F.lit(float(mu)))
    )
    scored = fan.groupBy("doc_id").agg(
        F.round(F.sum(term_ll), ndigits).alias("score")
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("rank", "doc_id", "score")
    )


def rbo_truncated(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    score_col: str,
    k: int = 20,
    p: float = 0.9,
    qscale: int = 10**9,
    ndigits: int = 6,
) -> DataFrame:
    """Truncated Rank-Biased Overlap (Webber, Moffat & Zobel, TOIS
    2010) between two rankings of the same items — the top-weighted
    ranking-similarity measure built for INDEFINITE rankings (Kendall
    τ weighs every swap equally; RBO geometrically discounts depth,
    which is how humans read result lists): one row ``(depth, n_items,
    rbo)`` with RBO@k = (1−p)·Σ_{d≤k} p^{d−1}·|A_d ∩ B_d|/d.

    Items rank by ``(score DESC, key ASC)`` — the deterministic
    tie-break both engines share.  An item entering both prefixes at
    depth max(r_a, r_b) contributes to every deeper agreement, so the
    overlap-at-depth table folds from ONE max-rank aggregate joined to
    a ``(d, p^{d−1})`` LITERAL spine whose powers are computed ONCE in
    Python and inlined on BOTH engines (libm ``pow`` parity is not a
    thing to gamble on); each depth term is micro-quantized and the Σ
    over ≤k terms is an integer sum.  Rankings are driver-free: two
    global row_number windows over ALREADY-AGGREGATED score tables
    (node-sized by contract).
    """
    spark = a.sparkSession
    wa = Window.orderBy(F.col(score_col).desc(), F.col(key_col).asc())
    ra = a.select(
        F.col(key_col).alias("x"),
        F.row_number().over(wa).cast("long").alias("ra"),
    ).where(F.col("ra") <= k)
    rb = b.select(
        F.col(key_col).alias("x"),
        F.row_number()
        .over(
            Window.orderBy(F.col(score_col).desc(), F.col(key_col).asc())
        )
        .cast("long")
        .alias("rb"),
    ).where(F.col("rb") <= k)
    mx = ra.join(rb, "x").select(
        F.greatest("ra", "rb").alias("m")
    )
    spine = spark.createDataFrame(
        [(d, float(p) ** (d - 1)) for d in range(1, k + 1)],
        "d long, pw double",
    )
    terms = (
        spine.join(mx, F.col("m") <= F.col("d"), "left")
        .groupBy("d", "pw")
        .agg(F.count(F.col("m")).cast("long").alias("cd"))
        .select(
            F.round(
                F.lit(float(qscale))
                * F.col("pw")
                * (F.col("cd").cast("double") / F.col("d").cast("double")),
                0,
            )
            .cast("long")
            .alias("tq")
        )
    )
    n_items = ra.join(rb, "x", "full").agg(
        F.count(F.lit(1)).cast("long").alias("n_items")
    )
    folded = terms.agg(F.sum("tq").cast("long").alias("sq"))
    return (
        n_items.crossJoin(F.broadcast(folded))
        .select(
            F.lit(k).cast("long").alias("depth"),
            "n_items",
            F.round(
                F.lit(1.0 - float(p))
                * (F.col("sq").cast("double") / F.lit(float(qscale))),
                ndigits,
            ).alias("rbo"),
        )
    )
