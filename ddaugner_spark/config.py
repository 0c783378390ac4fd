"""Engine configuration: the deterministic dictionary world + Spark tuning.

The reference's gazetteers are JSON name lists (resources/conll_entities.py:7-26,
the_elder_scrolls.py:8-85, …) joined against token n-grams
(fix_ner.py:195-215).  For correctness checking against a DuckDB oracle we
need a gazetteer that is a *pure function of nothing* — declared literally
here and inlined identically into the oracle SQL — over the driver's fixed
30-word synthetic vocabulary (TESTDATA.md).

Dictionary design constraints (so longest-match-first is well-defined and
SQL-expressible):

* ``ORG_BIGRAMS`` first-words {hash, table, sort} and second-words
  {join, scan, merge} are disjoint ⇒ no two bigram matches can ever
  overlap each other; greedy leftmost-longest reduces to "bigrams win,
  then unigrams on uncovered positions" — exactly the n-desc pass of
  fix_ner.py:195-215 without a sequential scan.
* ``hash`` appears in both ``PER_WORDS`` and as a bigram first-word, so
  the longest-match precedence is genuinely exercised.
* ``SENT_TERM`` ('the') appears in no dictionary entry, so mention spans
  never straddle a sentence boundary.
"""

from __future__ import annotations

# --- sentence segmentation (reference: split after . ? !  datas.py:303-313;
# the synthetic vocabulary has no punctuation, 'the' is the stand-in) ---
SENT_TERM = "the"

# --- gazetteer: class -> surfaces --------------------------------------
ORG_BIGRAMS = ["hash join", "sort merge", "table scan"]
PER_WORDS = ["spark", "customer", "hash"]
LOC_WORDS = ["stream", "window"]

#: (surface, class, weight) — weight plays the role of the reference's
#: per-name sampling weight / link-score prior (resources/*.py samplers).
GAZETTEER = (
    [(s, "ORG", round(0.5 + 0.1 * i, 2)) for i, s in enumerate(ORG_BIGRAMS)]
    + [(s, "PER", round(0.9 + 0.05 * i, 2)) for i, s in enumerate(PER_WORDS)]
    + [(s, "LOC", round(0.3 + 0.2 * i, 2)) for i, s in enumerate(LOC_WORDS)]
)

#: replacement pool for gazetteer injection (aug.py:94-146 semantics,
#: deterministic index instead of unseeded random.choice — SURVEY.md §4.3)
INJECT_NAMES = ["flink", "presto", "trino", "druid", "impala"]

# --- triple extraction --------------------------------------------------
#: predicate vocabulary: tokens allowed to act as the relation between two
#: mentions in the same sentence.  None of these appear in any gazetteer
#: entry, so a predicate token is never part of a mention.
PRED_WORDS = ["filter", "group", "order"]
#: max token gap between subject end and object start (exclusive bound on
#: scan distance; keeps the candidate join linear in sentence length)
TRIPLE_MAX_GAP = 5

# --- quality / text-stats -----------------------------------------------
STOPWORDS = ["the", "a"]

# --- dedup --------------------------------------------------------------
SHINGLE_K = 3          # token shingles for minhash / jaccard
MINHASH_PERMS = 8      # md5-keyed "permutations"
LSH_BANDS = 4          # 4 bands x 2 rows
JACCARD_THRESHOLD = 0.5

# --- similarity search --------------------------------------------------
COSINE_THRESHOLD = 0.25  # synthetic 64-dim embeddings: max pairwise cosine ≈ 0.4
ANN_TOP_K = 10
IVF_SIGN_DIMS = 4      # coarse cell = sign bits of first 4 dims

# --- skew handling (J6 / BASELINE.json north_star) ----------------------
SALT_BUCKETS = 16

# --- global determinism -------------------------------------------------
SEED = 42


def sql_str_list(values) -> str:
    """Render a python list of strings as a SQL IN-list body."""
    return ", ".join("'" + v.replace("'", "''") + "'" for v in values)
