"""Column-native WordPiece (F12): the greedy longest-match fold as a
Catalyst ``aggregate`` expression — exactly the kernel
(kernels/wordpiece.py) semantics, differential-tested against it.

Per word: at most ``length(word)`` fold steps; each step consumes the
longest vocabulary piece at the cursor (start pieces at position 1,
'##'-continuation pieces after), or collapses the word to ['[UNK]'].
Cost is O(len · MAX_PIECE) dictionary probes per word — meant for
name-dictionary-sized tables (the J5 overlap study), not the hot path;
corpus-scale subword work belongs in the Arrow batch seam.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import config


def wordpiece_pieces(word: Column) -> Column:
    """array<string> of WordPiece pieces for a single word column."""
    ln = F.length(word)
    steps = F.when(ln >= 1, F.sequence(F.lit(1), ln)).otherwise(
        F.array().cast("array<int>")
    )
    init = F.struct(
        F.lit(1).alias("pos"),
        F.array().cast("array<string>").alias("pieces"),
        F.lit(False).alias("failed"),
    )

    def best_at(pos: Column) -> Column:
        expr = None
        for L in range(config.WORDPIECE_MAX, 0, -1):
            piece = F.substr(word, pos, F.lit(L))
            fits = (pos + F.lit(L) - 1) <= ln
            hit = fits & F.when(
                pos == 1, piece.isin(config.WORDPIECE_START)
            ).otherwise(piece.isin(config.WORDPIECE_CONT))
            expr = F.when(hit, piece) if expr is None else expr.when(hit, piece)
        return expr

    def merge(acc, _step):
        done = acc["failed"] | (acc["pos"] > ln)
        best = best_at(acc["pos"])
        took = F.when(acc["pos"] == 1, best).otherwise(F.concat(F.lit("##"), best))
        advanced = F.struct(
            (acc["pos"] + F.length(best)).alias("pos"),
            F.concat(acc["pieces"], F.array(took)).alias("pieces"),
            F.lit(False).alias("failed"),
        )
        unk = F.struct(
            (ln + 1).alias("pos"),
            F.array(F.lit("[UNK]")).alias("pieces"),
            F.lit(True).alias("failed"),
        )
        return F.when(done, acc).otherwise(
            F.when(best.isNull(), unk).otherwise(advanced)
        )

    return F.aggregate(steps, init, merge, lambda acc: acc["pieces"])
