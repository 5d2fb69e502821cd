"""Unigram language-model tokenizer — the SentencePiece family (Kudo
2018, "Subword Regularization"), completing the vocabulary-induction
surface next to BPE (operators/bpe.py): BPE grows a vocabulary
bottom-up by merging; unigram starts from a large candidate set and
prunes top-down under an EM-fitted piece distribution.

Scale split, Spark-first (the bpe.py discipline):

- CORPUS-scale work is exactly one map-side-combined word count (the
  only pass that touches 100 TB) plus the final encode scan;
- candidate seeding explodes substrings of the DISTINCT-WORD table
  (vocab-scale × max_piece_len², never corpus-scale) as a pure JVM
  HOF — `q_unigram_seed` oracle-checks it;
- EM rounds run forward-backward per DISTINCT word inside an
  Arrow-batched UDF with the piece log-probs broadcast in the closure;
  expected counts aggregate as DECIMAL(28,12) — exact, order-
  independent addition, so training is BIT-REPRODUCIBLE across
  partitionings (the fit_semantic_cells discipline);
- encoding is Viterbi per word with a per-batch memo (each unique word
  decoded once per Arrow batch) — one scan, no shuffle, the
  bpe_encode shape.

Divergence from Kudo's full recipe, stated honestly: pruning keeps the
top pieces by EM expected count (single characters are never pruned,
guaranteeing coverage of the training alphabet) instead of the exact
leave-one-out likelihood-loss ranking; and seeding takes the most
frequent substrings instead of the suffix-array/ESA candidates.  Both
are the standard simplifications; the EM itself is the real
forward-backward.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metalpipe_spark.operators.bpe import _WS_ASCII

UNK = "<unk>"


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Distinct whitespace words with corpus frequencies — the ONE
    corpus-scale pass."""
    words = df.select(
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+")
        ).alias("word")
    ).where(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def _substring_explode(words: DataFrame, max_piece_len: int) -> DataFrame:
    """All substrings (length 1..max_piece_len) of each distinct word,
    weighted by word frequency — ``(piece, c)``, one vocab-scale
    shuffle.  Pure JVM HOFs (sequence/transform/flatten/substring), no
    Python."""
    subs = F.expr(
        f"""
        flatten(transform(sequence(1, length(word)), i ->
          transform(sequence(1, least({max_piece_len}, length(word) - i + 1)),
                    l -> substring(word, i, l))))
        """
    )
    return (
        words.select(F.explode(subs).alias("piece"), F.col("n"))
        .groupBy("piece")
        .agg(F.sum("n").alias("c"))
    )


def unigram_seed_counts(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    top_k: int = 50,
) -> DataFrame:
    """The oracle-checkable face of unigram seeding: the top ``top_k``
    candidate substrings by weighted corpus frequency, under the
    deterministic total order the trainer uses (count desc, then
    lexicographically smallest piece) — ``(rank, piece, piece_count)``.
    Rank 1 is the highest-mass seed candidate ``train_unigram`` starts
    from."""
    from pyspark.sql import Window

    wc = _word_counts(df, text_col)
    counted = (
        _substring_explode(wc, max_piece_len)
        .orderBy(F.desc("c"), F.asc("piece"))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("c"), F.asc("piece"))
    return counted.select(
        F.row_number().over(w).alias("rank"),
        F.col("piece"),
        F.col("c").alias("piece_count"),
    )


def _forward_backward(word: str, lp: dict, max_len: int):
    """Expected piece counts for one word under the current model —
    {piece: posterior} — plus the word's log-likelihood.  Plain-float
    DP (words are short); deterministic for a given dict."""
    m = len(word)
    NEG = float("-inf")
    f = [NEG] * (m + 1)
    f[0] = 0.0
    spans = []  # (i, j, piece, logp)
    for j in range(1, m + 1):
        acc = NEG
        for i in range(max(0, j - max_len), j):
            p = word[i:j]
            w = lp.get(p)
            if w is None or f[i] == NEG:
                continue
            spans.append((i, j, p, w))
            v = f[i] + w
            acc = v if acc == NEG else (
                max(acc, v) + math.log1p(math.exp(-abs(acc - v)))
            )
        f[j] = acc
    if f[m] == NEG:
        return {}, NEG  # uncoverable word (alphabet hole): contributes 0
    b = [NEG] * (m + 1)
    b[m] = 0.0
    for i in range(m - 1, -1, -1):
        acc = NEG
        for j in range(i + 1, min(m, i + max_len) + 1):
            w = lp.get(word[i:j])
            if w is None or b[j] == NEG:
                continue
            v = w + b[j]
            acc = v if acc == NEG else (
                max(acc, v) + math.log1p(math.exp(-abs(acc - v)))
            )
        b[i] = acc
    out: dict[str, float] = {}
    z = f[m]
    for i, j, p, w in spans:
        if b[j] == NEG:
            continue
        post = math.exp(f[i] + w + b[j] - z)
        out[p] = out.get(p, 0.0) + post
    return out, z


def _em_expected_counts(
    word_counts: DataFrame, lp: dict, max_len: int
) -> list:
    """One distributed E-step: per-(distinct word × count) posteriors,
    rounded to 12 dp and summed as DECIMAL(28,12) so the aggregate is
    exact and order-independent (bit-reproducible training).  Returns
    the collected (piece, expected_count) rows — vocab-scale."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            pieces: list[str] = []
            cs: list[float] = []
            for word, n in zip(pdf["word"], pdf["n"]):
                post, _ = _forward_backward(word, lp, max_len)
                for p, c in post.items():
                    pieces.append(p)
                    cs.append(round(float(n) * c, 12))
            yield pd.DataFrame({"piece": pieces, "c": cs})

    return (
        word_counts.select("word", "n")
        .mapInPandas(batches, "piece string, c double")
        .groupBy("piece")
        .agg(F.sum(F.col("c").cast("decimal(28,12)")).alias("ec"))
        .collect()
    )


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 200,
    max_piece_len: int = 6,
    seed_multiplier: int = 4,
    em_iters: int = 2,
    shrink: float = 0.75,
    min_piece_count: int = 2,
) -> DataFrame:
    """Learn a unigram tokenizer vocabulary; returns ``(rank, piece,
    logprob)`` ordered by EM expected count (desc, then piece asc —
    the deterministic total order).

    Loop: seed with the top ``vocab_size * seed_multiplier`` substrings
    (plus every single character, which is never pruned), then
    alternate ``em_iters`` EM rounds with a prune that keeps the top
    ``max(vocab_size, len * shrink)`` pieces by expected count, until
    the vocabulary reaches ``vocab_size``; one final EM round fits the
    returned probabilities.  Every driver-side collect is vocab-scale
    (the seed table); the corpus is touched exactly once."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if not 0.0 < shrink < 1.0:
        raise ValueError(f"shrink must be in (0, 1), got {shrink}")
    if em_iters < 1:
        raise ValueError(f"em_iters must be >= 1, got {em_iters}")
    wc = _word_counts(df, text_col).persist()
    try:
        n_words = wc.count()  # materialize for the EM re-scans
        if n_words == 0:
            raise ValueError("train_unigram: corpus has no words")
        seed_n = vocab_size * seed_multiplier
        subs = _substring_explode(wc, max_piece_len).persist()
        seed = (
            subs.where(
                (F.col("c") >= min_piece_count) & (F.length("piece") > 1)
            )
            .orderBy(F.desc("c"), F.asc("piece"))
            .limit(seed_n)
            .collect()
        )
        # EVERY training-alphabet character seeds and never prunes —
        # the coverage guarantee (no word becomes unsegmentable).
        # Canonical order before any float reduction: collect order is
        # partition-dependent, and float sums are not associative, so
        # summing in collect order would make logprobs differ in final
        # ulps across partitionings — breaking the bit-reproducibility
        # contract.  Sorting by piece fixes the reduction order.
        char_rows = sorted(
            subs.where(F.length("piece") == 1).collect(),
            key=lambda r: r["piece"],
        )
        subs.unpersist()
        chars = {r["piece"] for r in char_rows}
        counts = {r["piece"]: r["c"] for r in char_rows}
        for r in seed:
            counts.setdefault(r["piece"], r["c"])
        total = sum(counts.values())
        lp = {p: math.log(c / total) for p, c in counts.items()}

        def m_step(rows) -> dict:
            # Sort before summing: the normalizer is a float reduction,
            # and Spark collect order varies with partitioning — a
            # canonical piece order makes every run sum identically.
            rows = sorted(rows, key=lambda r: r["piece"])
            tot = sum(float(r["ec"]) for r in rows)
            return {
                r["piece"]: math.log(float(r["ec"]) / tot)
                for r in rows
                if float(r["ec"]) > 0.0
            }

        while True:
            for _ in range(em_iters):
                rows = _em_expected_counts(wc, lp, max_piece_len)
                lp = m_step(rows)
                # chars with zero mass must survive for coverage
                for ch in chars:
                    lp.setdefault(ch, math.log(1e-12))
            if len(lp) <= vocab_size:
                break
            before = len(lp)
            target = max(vocab_size, int(len(lp) * shrink))
            by_mass = sorted(
                ((float(r["ec"]), r["piece"]) for r in rows),
                key=lambda t: (-t[0], t[1]),
            )
            kept = set()
            for ec, piece in by_mass:
                if len(kept) >= target:
                    break
                if piece in lp:
                    kept.add(piece)
            kept |= chars
            lp = {p: w for p, w in lp.items() if p in kept}
            # Coverage floor: single chars are never pruned, so an
            # alphabet larger than vocab_size (or pinned chars filling
            # the survivor set) can make a prune a no-op — without this
            # stagnation guard the loop would re-run distributed EM
            # forever.  Accept the coverage-sized vocabulary and stop.
            if len(lp) >= before:
                break
        rows = _em_expected_counts(wc, lp, max_piece_len)
        lp = m_step(rows)
        for ch in chars:
            lp.setdefault(ch, math.log(1e-12))
        mass = {r["piece"]: float(r["ec"]) for r in rows}
        ordered = sorted(lp, key=lambda p: (-mass.get(p, 0.0), p))
        spark = df.sparkSession
        return spark.createDataFrame(
            [(i + 1, p, lp[p]) for i, p in enumerate(ordered)],
            "rank int, piece string, logprob double",
        )
    finally:
        wc.unpersist()


def viterbi_segment(
    word: str, lp: dict, max_len: int, unk_pen: float | None = None
) -> list[str]:
    """Max-log-prob segmentation of one word; characters outside the
    vocabulary emit :data:`UNK` at ``unk_pen`` (pass it precomputed
    from hot loops — the default recomputes min(lp) per call).  Ties
    (exact float equality) break toward the LONGER piece at each
    boundary — deterministic: candidates scan i ascending (longest
    span first), and a later candidate must strictly beat the
    incumbent."""
    m = len(word)
    NEG = float("-inf")
    best = [NEG] * (m + 1)
    back = [0] * (m + 1)
    best[0] = 0.0
    if unk_pen is None:
        unk_pen = min(lp.values(), default=0.0) - 10.0  # below any piece
    for j in range(1, m + 1):
        for i in range(max(0, j - max_len), j):
            if best[i] == NEG:
                continue
            w = lp.get(word[i:j])
            if w is None:
                if j - i == 1:  # unknown char: UNK with the floor penalty
                    w = unk_pen
                else:
                    continue
            v = best[i] + w
            if v > best[j]:
                best[j] = v
                back[j] = i
    out = []
    j = m
    while j > 0:
        i = back[j]
        p = word[i:j]
        out.append(p if p in lp else UNK)
        j = i
    out.reverse()
    return out


def unigram_encode(
    df: DataFrame,
    pieces: DataFrame | dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int | None = None,
) -> DataFrame:
    """Encode documents with a learned piece table → ``(id, pieces:
    array<string>, n_pieces)`` — Viterbi max-likelihood segmentation
    per word (the inference half of Kudo 2018, sampling temperature 0),
    with a per-batch word memo so each unique word decodes once per
    Arrow batch; unknown characters emit :data:`UNK`.  The piece table
    broadcasts in the closure (vocabulary-sized by construction); one
    scan, no shuffle — the bpe_encode shape."""
    if isinstance(pieces, DataFrame):
        lp = {r["piece"]: r["logprob"] for r in pieces.collect()}
    else:
        lp = dict(pieces)
    if not lp:
        raise ValueError("unigram_encode: empty piece table")
    max_len = max_piece_len or max(len(p) for p in lp)
    unk_pen = min(lp.values()) - 10.0  # once, not per word

    import pandas as pd

    def batches(it):
        for pdf in it:
            memo: dict = {}
            out = []
            for text in pdf[text_col]:
                toks: list[str] = []
                # The pinned ASCII whitespace class (operators/bpe.py
                # _WS_ASCII rationale): str.split() also splits
                # Unicode whitespace (NBSP etc.), which would
                # desynchronize the piece stream from the SQL replay
                # (viterbi_encode_oracle_sql) on non-ASCII input.
                for w in _WS_ASCII.split(text or ""):
                    if not w:
                        continue
                    got = memo.get(w)
                    if got is None:
                        got = viterbi_segment(w, lp, max_len, unk_pen)
                        memo[w] = got
                    toks.extend(got)
                out.append(toks)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pieces": out,
                    "n_pieces": [len(t) for t in out],
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        batches, f"{id_col} {id_type}, pieces array<string>, n_pieces long"
    )


def unigram_viterbi_scores(
    df: DataFrame,
    pieces: DataFrame | dict,
    text_col: str = "text",
    id_col: str | None = None,
    max_word_len: int = 20,
) -> DataFrame:
    """Viterbi BEST-SEGMENTATION SCORE per distinct word —
    ``(word, score)`` with the score rounded to 9 dp — the
    oracle-checkable face of :func:`unigram_encode`: the DP's max/add
    arithmetic replays as an unrolled CTE chain in ANSI SQL (one level
    per word position), so the inference math is value-hash gated even
    though the argmax PIECE STREAM itself (backtracking) is not
    single-pass-SQL-expressible.  Words longer than ``max_word_len``
    are excluded (the SQL unroll depth is fixed at plan-build time)."""
    if isinstance(pieces, DataFrame):
        lp = {r["piece"]: r["logprob"] for r in pieces.collect()}
    else:
        lp = dict(pieces)
    if not lp:
        raise ValueError("unigram_viterbi_scores: empty piece table")
    max_len = max(len(p) for p in lp)
    unk_pen = min(lp.values()) - 10.0

    import pandas as pd

    words = (
        df.select(
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+")
            ).alias("word")
        )
        .where(
            (F.col("word") != "") & (F.length("word") <= max_word_len)
        )
        .distinct()
    )

    def batches(it):
        for pdf in it:
            outs = []
            for w in pdf["word"]:
                segs = viterbi_segment(w, lp, max_len, unk_pen)
                outs.append(
                    round(sum(lp.get(p, unk_pen) for p in segs), 9)
                )
            yield pd.DataFrame({"word": pdf["word"], "score": outs})

    return words.mapInPandas(batches, "word string, score double")


def _viterbi_dp_ctes(pieces: dict, max_word_len: int):
    """The ONE generator of the Viterbi DP's SQL unroll, shared by the
    score oracle (q_unigram_viterbi) and the full piece-stream encode
    oracle (q_unigram_encode) so the two can never disagree about the
    same DP (r15 review: they briefly had duplicated level builders —
    the _split_ctes lesson applied here).

    Emits, per word position j: ``a{j}`` — the candidate ARMS
    (word, l, piece, s = d_{j-l}.s + piece logprob), one row per piece
    length ending at j, with the single-char arm LEFT-joining the piece
    table so unknown chars surface as '<unk>' at the floor penalty;
    ``d{j}`` — the best score (max over arms).  AS MATERIALIZED:
    without it DuckDB inlines each level into every consumer and the
    d_{j-1}..d_{j-L} fan-in expands the plan exponentially in word
    length.  The float adds run in the same left-to-right order the
    Python DP uses along the winning path, so scores agree bit-for-bit
    before any rounding.  Returns ``(piece_rows, levels_sql,
    choice_union_sql)`` — choice rows pick each level's winning arm by
    (score desc, LONGEST piece), :func:`viterbi_segment`'s
    first-maximizer-scanning-longest-first tie-break."""
    max_len = max(len(p) for p in pieces)
    unk_pen = min(pieces.values()) - 10.0
    # SQL-escape the piece literals: once the piece table is seeded from
    # real text (not the pinned bench vocab), apostrophes are plausible
    # and an unescaped quote renders invalid oracle SQL.
    piece_rows = ", ".join(
        "('{}', '{!r}'::DOUBLE)".format(p.replace("'", "''"), v)
        for p, v in sorted(pieces.items())
    )
    levels = [
        "d0 AS MATERIALIZED (SELECT word, '0.0'::DOUBLE AS s FROM w)"
    ]
    choices = []
    for j in range(1, max_word_len + 1):
        arms = []
        for l in range(1, min(j, max_len) + 1):
            start = j - l + 1
            sub = f"substr(w.word, {start}, {l})"
            if l == 1:
                arms.append(
                    f"SELECT w.word, {l} AS l, "
                    f"CASE WHEN p.piece IS NULL THEN '<unk>' ELSE p.piece"
                    f" END AS piece, d{j - l}.s + COALESCE(p.lp, "
                    f"'{unk_pen!r}'::DOUBLE) AS s "
                    f"FROM w JOIN d{j - l} USING (word) "
                    f"LEFT JOIN p ON p.piece = {sub} "
                    f"WHERE length(w.word) >= {j}"
                )
            else:
                arms.append(
                    f"SELECT w.word, {l} AS l, p.piece AS piece, "
                    f"d{j - l}.s + p.lp AS s "
                    f"FROM w JOIN d{j - l} USING (word) "
                    f"JOIN p ON p.piece = {sub} "
                    f"WHERE length(w.word) >= {j}"
                )
        union = "\n        UNION ALL ".join(arms)
        levels.append(
            f"a{j} AS MATERIALIZED (\n        {union}\n      )"
        )
        levels.append(
            f"d{j} AS MATERIALIZED (SELECT word, max(s) AS s FROM a{j}"
            " GROUP BY word)"
        )
        choices.append(
            f"SELECT word, {j} AS j, l, piece FROM ("
            f"SELECT word, l, piece, row_number() OVER ("
            f"PARTITION BY word ORDER BY s DESC, l DESC) AS rn FROM a{j}"
            f") WHERE rn = 1"
        )
    return (
        piece_rows,
        ",\n    ".join(levels),
        "\n      UNION ALL ".join(choices),
    )


def viterbi_score_oracle_sql(
    pieces: dict,
    words_cte: str,
    max_word_len: int = 20,
) -> str:
    """The DuckDB twin of :func:`unigram_viterbi_scores` for a FIXED
    piece table: Viterbi unrolled as one CTE per word position —
    ``d_j(word, s)`` is the best log-prob over segmentations of the
    first ``j`` characters (see :func:`_viterbi_dp_ctes`, the shared
    generator).  Scores agree bit-for-bit with the Python DP before
    the shared 9-dp round.  ``words_cte`` must define ``w(word)``."""
    piece_rows, lvl, _ = _viterbi_dp_ctes(pieces, max_word_len)
    finals = "\n      UNION ALL ".join(
        f"SELECT word, s FROM d{j} WHERE length(word) = {j}"
        for j in range(1, max_word_len + 1)
    )
    return f"""
    WITH p(piece, lp) AS (VALUES {piece_rows}),
    {words_cte},
    {lvl},
    best AS (
      {finals}
    )
    SELECT word, round(s, 9) AS score FROM best ORDER BY word
    """


def viterbi_encode_oracle_sql(
    pieces: dict,
    max_word_len: int = 20,
    src: str = "documents",
) -> str:
    """The DuckDB twin of :func:`unigram_encode` — the full PIECE
    STREAM, not just the best score (VERDICT r14 task 8): the shared
    :func:`_viterbi_dp_ctes` unroll plus each level's winning arm, a
    recursive CTE walking the choices back from each word's end (the
    backtracking loop SQL-ified), and per-word fragments
    ``(p1)(p2)...`` concatenated in token order per document —
    reproducing the engine row's ``md5('(' || join(')(') || ')')``
    fingerprint bit-for-bit (floats only ever COMPARE, so none reach
    the output).

    Words longer than ``max_word_len`` have no level to start the walk
    and their documents hash-mismatch LOUDLY rather than silently
    passing (the fixture corpus max word length is 8; the unroll is
    plan-build-time fixed, the score oracle's documented bound)."""
    piece_rows, lvl, choice_union = _viterbi_dp_ctes(pieces, max_word_len)
    return f"""
    WITH RECURSIVE p(piece, lp) AS (VALUES {piece_rows}),
    toks AS (
      SELECT doc_id, u.i AS ti, tk[u.i] AS word
      FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(coalesce(text, ''),
                           '[ \\t\\n\\x0b\\f\\r]+'), t -> t <> '') AS tk
        FROM {src}
      ), unnest(range(1, len(tk) + 1)) AS u(i)
    ),
    w AS MATERIALIZED (
      SELECT DISTINCT word FROM toks WHERE length(word) <= {max_word_len}
    ),
    {lvl},
    choice AS MATERIALIZED (
      {choice_union}
    ),
    walk(word, pos, l, piece) AS (
      SELECT c.word, length(c.word), c.l, c.piece
      FROM choice c WHERE c.j = length(c.word)
      UNION ALL
      SELECT wk.word, wk.pos - wk.l, c.l, c.piece
      FROM walk wk JOIN choice c
        ON c.word = wk.word AND c.j = wk.pos - wk.l
      WHERE wk.pos - wk.l > 0
    ),
    wordenc AS (
      SELECT word,
             string_agg('(' || piece || ')', '' ORDER BY pos - l) AS frag,
             count(*)::BIGINT AS np
      FROM walk GROUP BY word
    ),
    docenc AS (
      SELECT t.doc_id, sum(e.np)::BIGINT AS n_pieces,
             md5(string_agg(e.frag, '' ORDER BY t.ti)) AS enc_md5
      FROM toks t JOIN wordenc e USING (word)
      GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           COALESCE(e.n_pieces, 0) AS n_pieces,
           COALESCE(e.enc_md5, md5('()')) AS enc_md5
    FROM (SELECT doc_id FROM {src}) d
    LEFT JOIN docenc e USING (doc_id)
    ORDER BY d.doc_id
    """
