"""BPE training/encoding vs a reference pure-Python Sennrich
implementation: the distributed merge loop must produce the EXACT merge
list (same counts, same deterministic tie-break), and rank-greedy
encoding must reconstruct the original words."""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF_ORACLE  # noqa: F401  (fixture import side effects)


def _reference_bpe(word_counts: dict[str, int], num_merges: int, min_count: int = 2):
    """Sennrich training, tie-break = (count desc, pair asc)."""
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (l, r), c = best
        merges.append((l, r, c))
        new_vocab = {}
        for syms, cnt in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def test_train_bpe_matches_reference(spark):
    from metalpipe_spark.operators.bpe import train_bpe

    docs = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest low newer",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], ["doc_id", "text"])
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in train_bpe(df, num_merges=12, checkpoint_every=4).orderBy("rank").collect()
    ]
    counts: Counter = Counter(w for t in docs for w in t.split())
    want = _reference_bpe(dict(counts), 12)
    assert got == want


def test_bpe_encode_reconstructs_words(spark):
    from metalpipe_spark.operators.bpe import END_OF_WORD, bpe_encode, train_bpe

    docs = [(1, "low lower lowest"), (2, "new newest low"), (3, "")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    merges = train_bpe(df, num_merges=8)
    enc = {r["doc_id"]: r["subwords"] for r in bpe_encode(df, merges).collect()}
    for doc_id, text in docs:
        rebuilt = "".join(enc[doc_id]).replace(END_OF_WORD, " ").split()
        assert rebuilt == text.split()
    assert enc[3] == []
    # learned merges actually compress: fewer subwords than characters
    assert 0 < len(enc[1]) < len("low lower lowest".replace(" ", "")) + 3


def test_bpe_merge_table_parquet_roundtrip(spark, tmp_path):
    """The merge table is a plain DataFrame: write it once, read it in a
    later job, and encoding with the reloaded table is identical — the
    train-offline / encode-at-scale deployment split."""
    from metalpipe_spark.operators.bpe import bpe_encode, train_bpe

    df = spark.createDataFrame(
        [(1, "low lower lowest low"), (2, "new newest")], ["doc_id", "text"]
    )
    merges = train_bpe(df, num_merges=6)
    path = str(tmp_path / "merges")
    merges.write.parquet(path)
    reloaded = spark.read.parquet(path)
    a = {r["doc_id"]: r["subwords"] for r in bpe_encode(df, merges).collect()}
    b = {r["doc_id"]: r["subwords"] for r in bpe_encode(df, reloaded).collect()}
    assert a == b


def test_bpe_pair_counts_rank1_is_first_merge(spark):
    """The oracle-checkable face (q_bpe_pair_counts) shares the merge
    loop's argmax contract: rank 1 of the round-0 pair table IS the
    first merge train_bpe picks, and the counts match the pure-Python
    reference's round-0 pair counter."""
    from metalpipe_spark.operators.bpe import bpe_pair_counts, train_bpe

    docs = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest low newer",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )
    rows = bpe_pair_counts(df, top_k=5).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    counts: Counter = Counter(w for t in docs for w in t.split())
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in counts.items()}
    pairs: Counter = Counter()
    for syms, c in vocab.items():
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += c
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = [((r["left_sym"], r["right_sym"]), r["pair_count"]) for r in rows]
    assert got == want
    first_merge = train_bpe(df, num_merges=1).first()
    assert (first_merge["left"], first_merge["right"]) == got[0][0]


def test_bpe_encode_compound_chain(spark):
    """The fixed encode table's semantics: the LOWEST-rank applicable
    pair always fires first (so 'the' becomes th + e</w>, not the
    compound chain), compound rules chain when lower ranks don't
    preempt ('then' -> the n </w>), and unknown words fall through to
    chars."""
    from metalpipe_spark.catalog.text import _BPE_ENC_MERGES
    from metalpipe_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame(
        [(0, "the"), (1, "then"), (2, "xq")], "doc_id INT, text STRING"
    )
    got = {r["doc_id"]: list(r["subwords"]) for r in
           bpe_encode(df, _BPE_ENC_MERGES).collect()}
    # 'the' = t h e </w>: rank 0 (e,</w>) fires FIRST (lowest rank
    # wins, not longest chain), then (t,h); no rule joins th + e</w>.
    assert got[0] == ["th", "e</w>"]
    # 'then' = t h e n </w>: (e,</w>) not adjacent, so (t,h) then
    # (th,e) chain; nothing merges n or </w>.
    assert got[1] == ["the", "n", "</w>"]
    assert got[2] == ["x", "q", "</w>"]


def test_wordpiece_segment_greedy_semantics():
    """Longest-match-first, '##' continuations, whole-word UNK on any
    unmatchable position — the BERT tokenizer contract."""
    from metalpipe_spark.operators.bpe import wordpiece_segment

    vocab = {"un", "##aff", "##able", "##ble", "##a", "u", "##n",
             "the", "##ory", "t", "##h", "##e"}
    seg = lambda w: wordpiece_segment(w, vocab, 5, "[UNK]")
    # longest start piece wins over char-by-char
    assert seg("unaffable") == ["un", "##aff", "##able"]
    # greedy (not optimal): 'theory' takes 'the' then needs '##ory'
    assert seg("theory") == ["the", "##ory"]
    # no continuation for 'z' -> whole word UNK, not partial output
    assert seg("unz") == ["[UNK]"]
    # no start piece at all
    assert seg("zzz") == ["[UNK]"]
    assert seg("the") == ["the"]


def test_wordpiece_encode_docs_and_validations(spark):
    import pytest
    from pyspark.sql import functions as F

    from metalpipe_spark.operators.bpe import wordpiece_encode

    vocab = ["he", "##llo", "w", "##or", "##ld", "a"]
    df = spark.createDataFrame(
        [(1, "Hello world"), (2, "a hello"), (3, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["pieces"], r["n_pieces"])
        for r in wordpiece_encode(df, vocab).collect()
    }
    assert got[1] == (["he", "##llo", "w", "##or", "##ld"], 5)
    assert got[2] == (["a", "he", "##llo"], 3)
    assert got[3] == ([], 0)
    # vocab as a DataFrame works identically
    vdf = spark.createDataFrame([(p,) for p in vocab], "piece string")
    assert {
        r["doc_id"]: r["n_pieces"]
        for r in wordpiece_encode(df, vdf).collect()
    } == {1: 5, 2: 3, 3: 0}
    with pytest.raises(ValueError, match="empty vocab"):
        wordpiece_encode(df, [])
    with pytest.raises(ValueError, match="collides"):
        wordpiece_encode(df, vocab, unk="a")


def test_wordpiece_encode_rejects_zero_length_pieces(spark):
    import pytest

    from metalpipe_spark.operators.bpe import wordpiece_encode

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    for bad in ("", "##"):
        with pytest.raises(ValueError, match="zero-length"):
            wordpiece_encode(df, ["a", bad])


def _reference_wordpiece(
    word_counts: dict[str, int], num_merges: int, min_count: int = 2
):
    """Schuster & Nakajima training: score = pair/(left*right) in IEEE
    double, tie-break = (score desc, pair asc); merged symbol folds the
    right side's '##' away."""
    vocab = {
        tuple([w[0]] + ["##" + c for c in w[1:]]): c
        for w, c in word_counts.items()
    }
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        syms_total: Counter = Counter()
        for syms, c in vocab.items():
            for s in syms:
                syms_total[s] += c
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        scored = {
            p: c / (float(syms_total[p[0]]) * syms_total[p[1]])
            for p, c in pairs.items()
            if c >= min_count  # hapax pairs never argmax (score FAVORS rare)
        }
        if not scored:
            break
        best = min(scored.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), score = best
        merged = l + (r[2:] if r.startswith("##") else r)
        merges.append((l, r, merged, pairs[(l, r)], score))
        new_vocab: dict = {}
        for syms, cnt in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = merged
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def test_train_wordpiece_matches_reference(spark):
    from metalpipe_spark.operators.bpe import train_wordpiece

    docs = [
        "hugs hug hugging pun puns pug pugs bun buns",
        "hug hug pun pun pug bun hugging hugged",
        "running runner run runs hug bun puns",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )
    got = [
        (r["left"], r["right"], r["merged"], r["pair_count"], r["score"])
        for r in train_wordpiece(df, num_merges=10, checkpoint_every=3)
        .orderBy("rank")
        .collect()
    ]
    counts: Counter = Counter(w for t in docs for w in t.split())
    want = _reference_wordpiece(dict(counts), 10)
    # Scores must be bit-identical, not approximately equal: both sides
    # compute count / (double(left) * right) in IEEE double.
    assert got == want
    # The likelihood objective must actually diverge from raw-count BPE
    # on this corpus (else the test proves nothing about the scorer).
    # Raw-count argmax contract = count desc, pair lexicographically
    # asc — min over (-count, pair), pairs kept as TUPLES (joining the
    # symbols would lose the boundary; r15 review finding).
    raw_pairs: Counter = Counter()
    for w, c in counts.items():
        syms = [w[0]] + ["##" + ch for ch in w[1:]]
        for a, b in zip(syms, syms[1:]):
            raw_pairs[(a, b)] += c
    raw_first = min(raw_pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert (got[0][0], got[0][1]) != raw_first


def test_wordpiece_pair_scores_rank1_is_first_merge(spark):
    from metalpipe_spark.operators.bpe import (
        train_wordpiece,
        wordpiece_pair_scores,
    )

    docs = ["hugs hug hugging pun puns pug", "hug pun pug bun hugged"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )
    top = wordpiece_pair_scores(df, top_k=5).orderBy("rank").collect()
    assert [r["rank"] for r in top] == [1, 2, 3, 4, 5]
    first = train_wordpiece(df, num_merges=1, min_pair_count=1).first()
    assert (top[0]["left_sym"], top[0]["right_sym"]) == (
        first["left"],
        first["right"],
    )
    assert top[0]["score"] == first["score"]


def test_wordpiece_train_encode_loop(spark):
    """train -> wordpiece_vocab -> wordpiece_encode closes: every word
    reconstructs from its pieces ('##' stripped), no [UNK] (the
    alphabet covers the corpus), and at least one trained merge is
    actually served."""
    from metalpipe_spark.operators.bpe import (
        train_wordpiece,
        wordpiece_encode,
        wordpiece_vocab,
    )

    docs = ["hugs hug hugging pun puns pug", "hug pun pug bun hugged run"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )
    merges = train_wordpiece(df, num_merges=6, min_pair_count=1)
    vocab = wordpiece_vocab(df, merges)
    words = df.selectExpr(
        "explode(split(text, ' ')) AS word"
    ).distinct()
    enc = wordpiece_encode(
        words, vocab, text_col="word", id_col="word"
    ).collect()
    assert enc
    multi_piece = 0
    for r in enc:
        assert "[UNK]" not in r["pieces"]
        rebuilt = "".join(
            p[2:] if p.startswith("##") else p for p in r["pieces"]
        )
        assert rebuilt == r["word"]
        if len(r["pieces"]) < len(r["word"]):
            multi_piece += 1  # a merged (multi-char) piece was used
    assert multi_piece > 0


def test_wordpiece_encode_max_input_chars(spark):
    """BERT's max_input_chars_per_word: overlong words collapse to
    [UNK] whole (O(1), never the greedy walk), shorter words encode
    normally, and the knob validates."""
    import pytest

    from metalpipe_spark.operators.bpe import wordpiece_encode

    vocab = ["a", "##a", "b", "##b"]
    long_word = "a" * 101
    df = spark.createDataFrame(
        [(0, f"ab {long_word} ba")], "doc_id long, text string"
    )
    r = wordpiece_encode(df, vocab).collect()[0]
    assert r["pieces"] == ["a", "##b", "[UNK]", "b", "##a"]
    # Tighter knob flips the short words too.
    r2 = wordpiece_encode(df, vocab, max_input_chars=1).collect()[0]
    assert r2["pieces"] == ["[UNK]", "[UNK]", "[UNK]"]
    with pytest.raises(ValueError, match="max_input_chars"):
        wordpiece_encode(df, vocab, max_input_chars=0)


def test_wordpiece_train_encode_mixed_case(spark):
    """r15 review regression: the trainer lowercases like the encoder
    (BERT-uncased contract) — a mixed-case corpus must train a vocab
    the encoder can actually serve, never whole-word [UNK]s."""
    from metalpipe_spark.operators.bpe import (
        train_wordpiece,
        wordpiece_encode,
        wordpiece_vocab,
    )

    df = spark.createDataFrame(
        [(0, "Hug Hug pun pun Hugging"), (1, "HUG puns hugged Pun")],
        "doc_id long, text string",
    )
    merges = train_wordpiece(df, num_merges=4, min_pair_count=1)
    vocab = {r["piece"] for r in wordpiece_vocab(df, merges).collect()}
    assert all(p == p.lower() for p in vocab)
    enc = wordpiece_encode(df, sorted(vocab)).collect()
    for r in enc:
        assert "[UNK]" not in r["pieces"], r
        rebuilt = "".join(
            p[2:] if p.startswith("##") else p for p in r["pieces"]
        )
        # pieces reconstruct the LOWERCASED text
        assert rebuilt == (
            "hughugpunpunhugging" if r["doc_id"] == 0 else "hugpunshuggedpun"
        )


def test_train_wordpiece_vocab_size_target(spark):
    """vocab_size (the HF/BERT way of quoting tokenizer size) targets
    the TOTAL vocabulary: alphabet + merges; wordpiece_vocab returns
    exactly that many pieces when the corpus supports the merges."""
    from metalpipe_spark.operators.bpe import (
        _wp_initial_vocab,
        train_wordpiece,
        wordpiece_vocab,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "hugs hug hugging pun puns pug"), (1, "hug pun pug bun")],
        "doc_id long, text string",
    )
    alphabet_n = (
        _wp_initial_vocab(df, "text")
        .select(F.explode("syms").alias("s"))
        .distinct()
        .count()
    )
    target = alphabet_n + 3
    merges = train_wordpiece(df, vocab_size=target, min_pair_count=1)
    assert merges.count() == 3
    assert wordpiece_vocab(df, merges).count() == target
    # target below the alphabet -> zero merges, never negative
    assert train_wordpiece(df, vocab_size=1, min_pair_count=1).count() == 0
    import pytest

    with pytest.raises(ValueError, match="vocab_size"):
        train_wordpiece(df, vocab_size=0)
