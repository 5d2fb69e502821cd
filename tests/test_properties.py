"""Property-based tests (hypothesis) for the operators whose edge cases
are easiest to get wrong: chunk reconstruction and shard packing.  Each
example materializes ONE batch of generated rows through Spark, so the
example budget stays small while row coverage stays wide."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from metalpipe_spark.operators.curation import pack_shards
from metalpipe_spark.operators.text import chunk_documents

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


@settings(**_SETTINGS)
@given(
    lengths=st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=30),
    chunk=st.integers(min_value=2, max_value=64),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunk_reconstruction_property(spark, lengths, chunk, overlap_frac):
    """Chunk 0's tokens plus every later chunk's tokens[overlap:] must
    reconstruct each document exactly — for any doc length, chunk size,
    and overlap."""
    overlap = int(chunk * overlap_frac)
    docs = [(i, " ".join(f"t{i}_{j}" for j in range(n))) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"]))
    assert set(by_doc) == {i for i, _ in docs}
    for doc_id, text in docs:
        chunks = [t for _, t in sorted(by_doc[doc_id])]
        rebuilt = chunks[0].split(" ")
        for c in chunks[1:]:
            rebuilt += c.split(" ")[overlap:]
        assert rebuilt == text.split(" "), (doc_id, chunk, overlap)


@settings(**_SETTINGS)
@given(
    weights=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60),
    budget=st.integers(min_value=1, max_value=800),
    parts=st.integers(min_value=1, max_value=9),
)
def test_pack_shards_matches_sequential_property(spark, weights, budget, parts):
    """For any weights (zeros included), budget, and partition count,
    the distributed prefix sum must equal the sequential one."""
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = {
        r["doc_id"]: r["shard_id"]
        for r in pack_shards(df, "w", "doc_id", budget, num_partitions=parts).collect()
    }
    prefix, want = 0, {}
    for i, w in rows:
        want[i] = prefix // budget
        prefix += w
    assert got == want


@settings(**_SETTINGS)
@given(
    updates=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),    # key
            st.integers(min_value=0, max_value=3),    # order_col (ties likely)
            st.integers(min_value=-100, max_value=100),  # payload
        ),
        min_size=1,
        max_size=40,
    ),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_merge_upsert_last_wins_permutation_invariant(spark, updates, seed):
    """merge_upsert with order_col must produce the same surviving row
    per key for ANY arrival order of the update batch, including ties on
    order_col — the determinism contract of the CDC-apply path.  The
    expected winner is the lexicographic max of (order_col, payload)."""
    import random

    from metalpipe_spark.sinks.writers import merge_upsert

    target = spark.createDataFrame([(99, -1, -1)], ["k", "seq", "payload"])
    shuffled = list(updates)
    random.Random(seed).shuffle(shuffled)
    results = []
    for batch in (updates, shuffled):
        df = spark.createDataFrame(batch, ["k", "seq", "payload"]).repartition(5)
        got = {
            r["k"]: (r["seq"], r["payload"])
            for r in merge_upsert(target, df, "k", order_col="seq").collect()
            if r["k"] != 99
        }
        results.append(got)
    want = {}
    for k, seq, payload in updates:
        if k not in want or (seq, payload) > want[k]:
            want[k] = (seq, payload)
    assert results[0] == results[1] == want


@settings(**_SETTINGS)
@given(
    n=st.integers(min_value=1, max_value=120),
    parts=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=3),
)
def test_global_shuffle_permutation_property(spark, n, parts, seed):
    """For any corpus size, partition count, and seed: pos is an exact
    0..n-1 permutation and is identical under repartitioning."""
    from metalpipe_spark.operators.curation import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id int")
    got = {
        r["doc_id"]: r["pos"]
        for r in global_shuffle(df, "doc_id", seed=seed, num_partitions=parts).collect()
    }
    assert sorted(got.values()) == list(range(n))
    again = {
        r["doc_id"]: r["pos"]
        for r in global_shuffle(
            df.repartition(3), "doc_id", seed=seed, num_partitions=parts
        ).collect()
    }
    assert again == got


@settings(**_SETTINGS)
@given(
    n=st.integers(min_value=1, max_value=150),
    fracs=st.lists(
        st.floats(min_value=0.05, max_value=1.0), min_size=1, max_size=4
    ),
)
def test_split_corpus_exact_partition_property(spark, n, fracs):
    """For any normalized fraction vector: every row lands in exactly
    one split and every named split is a valid label."""
    from metalpipe_spark.operators.curation import split_corpus

    total = sum(fracs)
    fractions = {f"s{i}": f / total for i, f in enumerate(fracs)}
    # force exact sum-to-1 after float division
    fractions[f"s{len(fracs) - 1}"] += 1.0 - sum(fractions.values())
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id int")
    rows = split_corpus(df, "doc_id", fractions).collect()
    assert len(rows) == n
    assert {r["split"] for r in rows} <= set(fractions)


@settings(**_SETTINGS)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=80), min_size=1, max_size=4),
    budget=st.integers(min_value=1, max_value=150),
)
def test_domain_mix_rate_cap_property(spark, sizes, budget):
    """For any domain sizes and budget: capped domains keep ALL their
    rows, uncapped domains keep a subset, and output never exceeds the
    input (rates are probabilities)."""
    from metalpipe_spark.operators.curation import domain_mix_sample

    rows, weights = [], {}
    base = 0
    for i, n in enumerate(sizes):
        dom = f"d{i}"
        weights[dom] = 1.0 / len(sizes)
        rows += [(base + j, dom) for j in range(n)]
        base += 1000
    df = spark.createDataFrame(rows, "doc_id int, domain string")
    out = domain_mix_sample(
        df, "domain", "doc_id", weights, budget_rows=budget
    ).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], set()).add(r["doc_id"])
    for i, n in enumerate(sizes):
        dom = f"d{i}"
        kept = len(by_dom.get(dom, ()))
        assert kept <= n
        if budget * weights[dom] >= n:  # rate capped at 1
            assert kept == n, (dom, kept, n, budget)


@settings(**_SETTINGS)
@given(
    codes=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2,
        max_size=24,
        unique=True,
    ),
    max_hamming=st.integers(min_value=1, max_value=3),
)
def test_hamming_neardup_pairs_matches_brute_force_property(
    spark, codes, max_hamming
):
    """hamming_neardup_pairs over ARBITRARY int64 codes (sign bit
    included) must equal the brute-force hamming join exactly: Manku
    banding has perfect recall within max_hamming (pigeonhole) and the
    bit_count(xor) verify removes every over-distance candidate."""
    from metalpipe_spark.operators.dedup import hamming_neardup_pairs

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(codes)], "id long, code long"
    )
    got = {
        (r["d1"], r["d2"]): r["hamming"]
        for r in hamming_neardup_pairs(
            df, code_col="code", id_col="id",
            bits=64, max_hamming=max_hamming, blocks=4,
        ).collect()
    }
    want = {}
    for i, a in enumerate(codes):
        for j, b in enumerate(codes):
            if i < j:
                h = bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
                if h <= max_hamming:
                    want[(i, j)] = h
    assert got == want


@settings(**_SETTINGS)
@given(
    codes=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2,
        max_size=16,
        unique=True,
    ),
    geometry=st.sampled_from([(4, 1), (8, 2), (8, 5)]),
)
def test_hamming_combo_banding_matches_brute_force_property(
    spark, codes, geometry
):
    """Combination banding (combo > 1, the Manku multi-block-key scheme
    the hot-bucket fix uses) must stay exactly equal to brute force:
    wider keys change selectivity, never recall."""
    from metalpipe_spark.operators.dedup import hamming_neardup_pairs

    blocks, combo = geometry
    max_hamming = blocks - combo  # the widest guarantee this geometry has
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(codes)], "id long, code long"
    )
    got = {
        (r["d1"], r["d2"]): r["hamming"]
        for r in hamming_neardup_pairs(
            df, code_col="code", id_col="id",
            bits=64, max_hamming=max_hamming, blocks=blocks, combo=combo,
        ).collect()
    }
    want = {}
    for i, a in enumerate(codes):
        for j, b in enumerate(codes):
            if i < j:
                h = bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
                if h <= max_hamming:
                    want[(i, j)] = h
    assert got == want


def _ref_span_dedup(docs, window, stride):
    """Brute-force reference of duplicate_span_dedup's contract."""
    import hashlib

    def anchor(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % stride == 0

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    spans = []
    for d in sorted(docs):
        tk = docs[d].split(" ")
        for s in range(len(tk)):
            if s + window <= len(tk) and anchor(tk[s]):
                spans.append((d, s, md5(" ".join(tk[s : s + window]))))
    firsts = {}
    for d, s, h in sorted(spans):
        firsts.setdefault(h, (d, s))
    cover = set()
    for d, s, h in spans:
        if firsts[h] != (d, s):
            cover.update((d, p) for p in range(s, s + window))
    out = {}
    for d in docs:
        tk = docs[d].split(" ")
        kept = [t for p, t in enumerate(tk) if (d, p) not in cover]
        if kept:
            out[d] = (" ".join(kept), len(kept))
    return out


@settings(**_SETTINGS)
@given(
    lengths=st.lists(st.integers(min_value=0, max_value=24), min_size=1, max_size=6),
    window=st.integers(min_value=2, max_value=4),
    stride=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_duplicate_span_dedup_matches_reference_property(
    spark, lengths, window, stride, seed
):
    """Random small-alphabet corpora (dense accidental duplication, all
    the overlap/self-repeat/full-consumption edge cases) must match the
    brute-force reference exactly — same survivors, same token counts."""
    import random

    from metalpipe_spark.operators.dedup import duplicate_span_dedup

    rng = random.Random(seed)
    docs = {
        d: " ".join(rng.choice("abcde") + str(rng.randint(0, 2)) for _ in range(n))
        for d, n in enumerate(lengths)
    }
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"])
        for r in duplicate_span_dedup(
            df, window=window, anchor_stride=stride
        ).collect()
    }
    assert got == _ref_span_dedup(docs, window, stride)


@settings(**_SETTINGS)
@given(
    n_points=st.integers(min_value=0, max_value=25),
    n_intervals=st.integers(min_value=0, max_value=12),
    bucket=st.sampled_from([60, 3600, 7200]),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_range_join_matches_brute_force_property(
    spark, n_points, n_intervals, bucket, seed
):
    """Bucketized range join == the brute-force O(n*m) filter for every
    bucket width: bucketization changes the plan, never the result
    (inclusive start, exclusive end, key-scoped, empty intervals
    excluded, boundary-straddling buckets included)."""
    import random
    from datetime import datetime, timedelta

    from metalpipe_spark.operators.joins import range_join

    rng = random.Random(seed)
    t0 = datetime(2024, 1, 1)

    def ts():
        return t0 + timedelta(seconds=rng.randint(0, 36_000))

    points = [(i, rng.randint(0, 2), ts()) for i in range(n_points)]
    intervals = []
    for i in range(n_intervals):
        a = ts()
        b = a + timedelta(seconds=rng.choice([0, 1, 1800, 3600, 9000]))
        intervals.append((100 + i, rng.randint(0, 2), a, b))
    pdf = spark.createDataFrame(
        points, "event_id long, user_id long, ts timestamp"
    ) if points else spark.createDataFrame([], "event_id long, user_id long, ts timestamp")
    idf = spark.createDataFrame(
        intervals, "interval_id long, user_id long, start timestamp, end timestamp"
    ) if intervals else spark.createDataFrame([], "interval_id long, user_id long, start timestamp, end timestamp")
    got = sorted(
        (r["event_id"], r["interval_id"])
        for r in range_join(
            pdf, idf, "ts", "start", "end", keys="user_id",
            bucket_seconds=bucket,
        ).collect()
    )
    want = sorted(
        (e, i)
        for e, eu, et in points
        for i, iu, a, b in intervals
        if eu == iu and a <= et < b
    )
    assert got == want


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3"]),
            st.sampled_from(["x", "y", "z", None]),
            st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
        ),
        min_size=1,
        max_size=40,
    ),
    agg=st.sampled_from(["sum", "count", "min", "max", "avg"]),
)
def test_pivot_pinned_equals_dataframe_pivot_property(spark, rows, agg):
    """pivot_pinned (one conditional aggregate) must equal DataFrame
    .pivot() with pinned values for every builtin agg, including NULL
    pivot values and NULL measures — modulo the one DOCUMENTED
    divergence: a (group, value) combo with no rows counts as 0 under
    SQL conditional aggregation but NULL under .pivot().agg(count)
    (pivotfirst sees no row), so the count comparison coalesces the
    .pivot() side to 0."""
    from metalpipe_spark.operators.aggregate import pivot_pinned

    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "k string, p string, v double")
    values = ["x", "y"]
    got = pivot_pinned(df, "k", "p", values, "v", agg=agg)
    fn = {"sum": F.sum, "count": F.count, "min": F.min,
          "max": F.max, "avg": F.avg}[agg]
    want = (
        df.groupBy("k").pivot("p", values).agg(fn("v"))
        .withColumnsRenamed({v: f"p_{v}" for v in values})
    )
    if agg == "count":
        want = want.select(
            "k", *[F.coalesce(F.col(f"p_{v}"), F.lit(0)).alias(f"p_{v}")
                   for v in values]
        )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@settings(**_SETTINGS)
@given(
    n_docs=st.integers(6, 24),
    cut=st.integers(1, 5),
    seed=st.integers(0, 10_000),
)
def test_dsir_incremental_batch_split_invariance(spark, n_docs, cut, seed):
    """Scoring a corpus through ANY batch split must equal the
    single-pass computation for the docs of the LAST batch (the store
    folds batch counts before scoring), and the final store must equal
    the full corpus distribution."""
    import random

    from pyspark.sql import functions as F

    from metalpipe_spark.operators.curation import (
        dsir_importance_weights,
        dsir_incremental_weights,
        dsir_target_counts,
    )

    rng = random.Random(seed)
    rows = [
        (i, " ".join(rng.choice("abcdefg") for _ in range(rng.randint(1, 8))))
        for i in range(n_docs)
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(rows[:2], "doc_id long, text string")
    tc = dsir_target_counts(target, buckets=32)

    full = {
        r["doc_id"]: (r["n_grams"], r["log_weight"])
        for r in dsir_importance_weights(
            corpus, target, buckets=32, exact=True
        ).collect()
    }
    b1 = corpus.where(F.col("doc_id") < cut)
    b2 = corpus.where(F.col("doc_id") >= cut)
    _, store = dsir_incremental_weights(b1, None, tc, buckets=32, exact=True)
    w2, final_store = dsir_incremental_weights(
        b2, store, tc, buckets=32, exact=True
    )
    got = {r["doc_id"]: (r["n_grams"], r["log_weight"]) for r in w2.collect()}
    assert got == {k: v for k, v in full.items() if k >= cut}

    one_store = dsir_incremental_weights(corpus, None, tc, buckets=32, exact=True)[1]
    assert sorted(map(tuple, final_store.collect())) == sorted(
        map(tuple, one_store.collect())
    )


@settings(**_SETTINGS)
@given(
    values=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                  allow_infinity=False),
        min_size=1, max_size=200,
    ),
    q=st.floats(min_value=0.0, max_value=1.0),
    bins=st.integers(min_value=2, max_value=64),
)
def test_exact_quantile_matches_sorted_rank_property(spark, values, q, bins):
    """exact_quantile returns the literal rank-ceil(q*n) element for
    ANY double multiset (duplicates, negatives, extreme skew), any q,
    any bin count — the distributed selection is exact, not
    approximate."""
    import math

    from metalpipe_spark.operators.sketches import exact_quantile

    df = spark.createDataFrame([(v,) for v in values], "x double")
    [r] = exact_quantile(df, "x", qs=(q,), bins=bins).collect()
    want = sorted(values)[max(1, math.ceil(q * len(values))) - 1]
    assert r["value"] == want, (q, bins)


@settings(**_SETTINGS)
@given(
    values=st.lists(
        st.floats(min_value=0.0, max_value=1000.0, allow_nan=False),
        min_size=1, max_size=300,
    ),
    bins=st.integers(min_value=1, max_value=50),
    q=st.floats(min_value=0.0, max_value=1.0),
)
def test_histogram_quantile_error_bound_property(spark, values, bins, q):
    """For any data and geometry, the histogram estimate is within one
    bin width of the true rank-quantile whenever that quantile lies in
    [lo, hi); out-of-range mass clamps to the edges."""
    import math

    from metalpipe_spark.operators.sketches import histogram_sketch_quantiles

    lo, hi = 100.0, 900.0
    width = (hi - lo) / bins
    df = spark.createDataFrame([(v,) for v in values], "x double")
    [r] = histogram_sketch_quantiles(
        df, "x", lo, hi, qs=(q,), bins=bins
    ).collect()
    want = sorted(values)[max(1, math.ceil(q * len(values))) - 1]
    if lo <= want < hi:
        assert abs(r["est"] - want) <= width + 1e-9, (q, bins)
    else:
        assert lo <= r["est"] <= hi


@settings(**_SETTINGS)
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=7),
        min_size=2, max_size=12, unique=True,
    ),
    k=st.integers(min_value=1, max_value=2),
)
def test_edit_distance_join_bruteforce_property(spark, words, k):
    """SymSpell blocking + levenshtein verify equals the quadratic
    definition for ANY short-string set over a tiny alphabet (the
    collision-heaviest regime) at k=1 and k=2."""
    import itertools

    from metalpipe_spark.operators.joins import edit_distance_join

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
                prev = cur
        return dp[-1]

    rows = list(enumerate(words))
    df = spark.createDataFrame(rows, "doc_id long, name string")
    want = sorted(
        (a[0], b[0])
        for a, b in itertools.combinations(rows, 2)
        if lev(a[1], b[1]) <= k
    )
    got = sorted(
        (r["id1"], r["id2"])
        for r in edit_distance_join(df, "name", max_edits=k).collect()
    )
    assert got == want, (words, k)


@settings(**_SETTINGS)
@given(
    word=st.text(alphabet="abcd", min_size=1, max_size=9),
    seed=st.integers(min_value=0, max_value=10),
)
def test_viterbi_exhaustive_property(spark, word, seed):
    """Viterbi attains the brute-force optimum over ALL segmentations
    for any word and any piece table (derandomized table per seed)."""
    import itertools

    from metalpipe_spark.operators.unigram import viterbi_segment

    pieces = {c: -4.0 - i * 0.13 for i, c in enumerate("abcd")}
    # seed-derived multi-char pieces
    for i, p in enumerate(["ab", "bc", "cd", "abc", "bcd", "aa", "dd"]):
        if (seed + i) % 3 != 0:
            pieces[p] = -1.5 - 0.37 * ((seed + i) % 5)
    max_len = max(len(p) for p in pieces)
    got = viterbi_segment(word, pieces, max_len)
    assert "".join(got) == word

    best = [None]

    def rec(i, score):
        if i == len(word):
            if best[0] is None or score > best[0]:
                best[0] = score
            return
        for j in range(i + 1, min(len(word), i + max_len) + 1):
            if word[i:j] in pieces:
                rec(j, score + pieces[word[i:j]])

    rec(0, 0.0)
    got_score = sum(pieces[p] for p in got if p in pieces)
    assert best[0] is not None and abs(got_score - best[0]) < 1e-12


@settings(**_SETTINGS)
@given(
    n_groups=st.integers(min_value=1, max_value=3),
    rules_per=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=99),
    crlf=st.booleans(),
    noise=st.booleans(),
)
def test_parse_robots_roundtrip_property(
    spark, n_groups, rules_per, seed, crlf, noise
):
    """Synthesize a random rule table, render it as a dirty robots.txt
    (optional CRLF, comments, unknown directives, shuffled field
    casing), parse it back — the rule set for the star agent must equal
    the synthesized star-group rules exactly, for any grouping."""
    import random

    from metalpipe_spark.operators.web import parse_robots

    rng = random.Random(seed)
    eol = "\r\n" if crlf else "\n"
    want = set()
    lines = []
    if noise:
        lines.append("# generated robots")
        lines.append("Sitemap: https://h.example/map.xml")
    for g in range(n_groups):
        agent = "*" if g == 0 else f"bot{g}"
        field = rng.choice(["User-agent", "user-agent", "USER-AGENT"])
        lines.append(f"{field}: {agent}")
        for r in range(rules_per):
            kind = rng.choice(["Disallow", "disallow", "Allow"])
            prefix = "/" + "".join(
                rng.choice("abc/") for _ in range(rng.randint(1, 6))
            ).strip("/")
            lines.append(f"{kind}: {prefix}" + ("  # c" if noise else ""))
            if agent == "*":
                want.add((kind.lower(), prefix))
        if noise:
            lines.append("Crawl-delay: 5")
        lines.append("")  # blank line between groups
    body = eol.join(lines) + eol
    df = spark.createDataFrame([("h.example", body)], "host string, body string")
    got = {
        (r["rule"], r["prefix"])
        for r in parse_robots(df, agent="nomatch-agent").collect()
    }
    assert got == want, (body, want)


@settings(**_SETTINGS)
@given(
    data=st.data(),
    n_docs=st.integers(min_value=2, max_value=8),
    L=st.integers(min_value=3, max_value=8),
)
def test_exact_substr_matches_python_oracle_property(spark, data, n_docs, L):
    """exact_substr_dedup equals a brute-force Python oracle (keep-first
    per distinct L-window, cover the rest) on corpora with PLANTED
    duplicated runs at random offsets — so no duplicated run >= L
    survives at ANY offset, and nothing extra is removed."""
    from metalpipe_spark.operators.dedup import exact_substr_dedup

    # A small token alphabet makes accidental duplicates likely; a
    # planted run (shared across a random subset of docs at random
    # offsets) makes offset-robustness mandatory.
    run_len = data.draw(st.integers(min_value=L, max_value=2 * L))
    run = [f"R{j}" for j in range(run_len)]
    docs = []
    for d in range(n_docs):
        n = data.draw(st.integers(min_value=0, max_value=30))
        toks = [
            f"t{data.draw(st.integers(min_value=0, max_value=5))}"
            for _ in range(n)
        ]
        if data.draw(st.booleans()):
            at = data.draw(st.integers(min_value=0, max_value=len(toks)))
            toks = toks[:at] + run + toks[at:]
        docs.append((d, " ".join(toks)))

    # Python oracle: identical semantics, brute force.
    firsts: dict[str, tuple[int, int]] = {}
    for d, text in docs:
        tk = text.split(" ")
        for s in range(len(tk) - L + 1):
            w = " ".join(tk[s : s + L])
            firsts.setdefault(w, (d, s))
    want = {}
    for d, text in docs:
        tk = text.split(" ")
        covered = set()
        for s in range(len(tk) - L + 1):
            if firsts[" ".join(tk[s : s + L])] != (d, s):
                covered.update(range(s, s + L))
        kept = [t for i, t in enumerate(tk) if i not in covered]
        if kept:
            want[d] = (" ".join(kept), len(kept))

    out = exact_substr_dedup(
        spark.createDataFrame(docs, "doc_id long, text string"),
        min_length=L,
    ).collect()
    got = {r["doc_id"]: (r["clean_text"], r["n_kept"]) for r in out}
    assert got == want


@settings(**_SETTINGS)
@given(data=st.data(), n_records=st.integers(min_value=1, max_value=8))
def test_warc_exact_walk_adversarial_framing_property(
    spark, tmp_path_factory, data, n_records
):
    """The Content-Length exact walk must recover every record's payload
    BYTE-EXACTLY for any payload content — including payloads embedding
    the inter-record framing bytes, fake record headers, NULs, and
    trailing CRLF runs — across all four record types."""
    from metalpipe_spark.sources.warc import read_warc

    types = ["response", "request", "metadata", "revisit", "conversion"]
    evil = [
        b"\r\n\r\n",
        b"WARC/1.0\r\nWARC-Type: fake\r\nContent-Length: 0\r\n\r\n",
        b"\x00\xff\x1f\x8b",
        b"Content-Length: 99\r\n",
        b"\r\n" * 4,
    ]
    recs = []
    blob = b""
    for i in range(n_records):
        wt = data.draw(st.sampled_from(types))
        payload = bytes(
            data.draw(
                st.lists(st.integers(min_value=0, max_value=255), max_size=30)
            )
        )
        if data.draw(st.booleans()):
            payload += data.draw(st.sampled_from(evil))
        head = (
            f"WARC/1.0\r\nWARC-Type: {wt}\r\n"
            f"WARC-Target-URI: https://h.example/{i}\r\n"
            f"WARC-Record-ID: <urn:p:{i}>\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        blob += head + payload + b"\r\n\r\n"
        recs.append((f"urn:p:{i}", wt, payload))
    out = tmp_path_factory.mktemp("warcprop")
    (out / "seg.warc").write_bytes(blob)
    rows = read_warc(spark, str(out), record_types=None).collect()
    got = {
        r["record_id"]: (r["warc_type"], bytes(r["payload"]))
        for r in rows
    }
    want = {}
    for rid, wt, payload in recs:
        # read_warc splits HTTP-shaped payloads into (status, body);
        # reconstruct what the walk should keep as `payload`.
        import re as _re

        if _re.match(rb"^HTTP/\d\.\d (\d{3})", payload):
            end = payload.find(b"\r\n\r\n")
            body = b"" if end < 0 else payload[end + 4 :]
            want[f"<{rid}>"] = (wt, body)
        else:
            want[f"<{rid}>"] = (wt, payload)
    assert got == want


@settings(**_SETTINGS)
@given(data=st.data(), n_rules=st.integers(min_value=1, max_value=10))
def test_robots_filter_longest_match_property(spark, data, n_rules):
    """robots_filter equals a Python RFC 9309 oracle (longest prefix
    decides, allow wins exact ties, no match -> allowed) for random
    plain-prefix rule sets and random frontier paths."""
    from metalpipe_spark.operators.web import robots_filter

    rules = []
    for _ in range(n_rules):
        kind = data.draw(st.sampled_from(["allow", "disallow"]))
        prefix = "/" + "".join(
            data.draw(
                st.lists(
                    st.sampled_from("ab/"), min_size=0, max_size=6
                )
            )
        )
        rules.append((kind, prefix))
    urls = [
        "https://h.example/"
        + "".join(
            data.draw(st.lists(st.sampled_from("ab/"), max_size=8))
        )
        for _ in range(6)
    ]

    def oracle(path: str) -> bool:
        best = None  # (plen, is_allow)
        for kind, prefix in rules:
            if path.startswith(prefix):
                cand = (len(prefix), kind == "allow")
                if best is None or cand > best:
                    best = cand
        return True if best is None else best[1]

    rule_df = spark.createDataFrame(
        [
            ("h.example", k, p, False, "")
            for k, p in rules
        ],
        "host string, rule string, prefix string, wild boolean, pattern string",
    )
    frontier = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["crawl_allowed"]
        for r in robots_filter(frontier, rule_df, "url", keep="all").collect()
    }
    for u in urls:
        path = u[len("https://h.example"):] or "/"
        assert got[u] == oracle(path), (u, rules)


@settings(**_SETTINGS)
@given(
    weights=st.lists(
        st.integers(min_value=0, max_value=40), min_size=1, max_size=25
    ),
    seq_len=st.integers(min_value=1, max_value=17),
)
def test_pack_sequences_reconstruction_property(spark, weights, seq_len):
    """pack_sequences' manifest must tile the concatenated token stream
    exactly: per doc, pieces cover [0, weight) contiguously in seq
    order; per sequence, pieces cover [0, seq_len) contiguously (the
    last sequence may end short); global piece order equals the
    exclusive prefix sum of weights."""
    from metalpipe_spark.operators.curation import pack_sequences

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, "n_tokens", "doc_id", seq_len).collect()
    # per doc: pieces in seq order reconstruct [0, weight)
    by_doc: dict[int, list] = {}
    by_seq: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
        by_seq.setdefault(r["seq_id"], []).append(r)
    total = sum(weights)
    for doc_id, w in rows:
        pieces = sorted(by_doc.get(doc_id, []), key=lambda r: r["seq_id"])
        assert (len(pieces) == 0) == (w == 0), doc_id
        at = 0
        for p in pieces:
            assert p["doc_start"] == at
            assert 0 < p["piece_len"] <= seq_len
            at += p["piece_len"]
        assert at == w, doc_id
    # per sequence: contiguous fill from 0; full except possibly the last
    n_seqs = (total + seq_len - 1) // seq_len
    assert set(by_seq) == set(range(n_seqs))
    for s, pieces in by_seq.items():
        pieces = sorted(pieces, key=lambda r: r["seq_start"])
        at = 0
        for p in pieces:
            assert p["seq_start"] == at
            at += p["piece_len"]
        assert at == (seq_len if s < n_seqs - 1 else total - seq_len * (n_seqs - 1))
    # global order: doc pieces appear at exactly the prefix-sum offsets
    prefix = 0
    for doc_id, w in rows:
        if w:
            first = min(by_doc[doc_id], key=lambda r: r["seq_id"])
            assert first["seq_id"] * seq_len + first["seq_start"] == prefix
        prefix += w


@settings(**_SETTINGS)
@given(
    data=st.data(),
    n=st.integers(min_value=1, max_value=20),
    bits=st.integers(min_value=1, max_value=10),
)
def test_scalar_quantization_error_bound_property(spark, data, n, bits):
    """For any vectors and any bit width: codes stay in range, the
    reconstruction error of every in-range element is <= half a step,
    and out-of-range elements clamp to the grid edges."""
    from metalpipe_spark.operators.pq import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    vecs = [
        [
            data.draw(
                st.floats(min_value=-50, max_value=50, allow_nan=False)
            )
            for _ in range(3)
        ]
        for _ in range(n)
    ]
    lo = data.draw(st.floats(min_value=-60, max_value=-1))
    hi = data.draw(st.floats(min_value=1, max_value=60))
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    levels = (1 << bits) - 1
    step = (hi - lo) / levels if levels else 0.0
    out = dequantize_embeddings(
        quantize_embeddings(df, bits=bits, lo=lo, hi=hi)
    ).collect()
    for r in out:
        for v, c, vh in zip(r["embedding"], r["codes"], r["dequantized"]):
            assert 0 <= c <= levels
            if lo <= v <= hi:
                assert abs(v - vh) <= step / 2 + 1e-9 * max(1, abs(v))
            elif v < lo:
                assert c == 0 and vh == lo
            else:
                assert c == levels


@settings(**_SETTINGS)
@given(
    n_docs=st.integers(min_value=1, max_value=12),
    cut=st.integers(min_value=0, max_value=12),
    changed=st.integers(min_value=0, max_value=4),
)
def test_incremental_embed_batch_split_invariance(spark, n_docs, cut, changed):
    """Embedding a corpus through (first batch -> store -> refresh with
    the rest + some changed texts) must equal embedding the final
    corpus in one shot — for any split point and change set."""
    from metalpipe_spark.operators.inference import (
        embed_documents,
        incremental_embed,
    )

    cut = min(cut, n_docs)
    final = [
        (i, f"tok{i % 3} shared words" + (" edited" if i < changed else ""))
        for i in range(n_docs)
    ]
    original = [(i, f"tok{i % 3} shared words") for i in range(n_docs)]
    spec = "hashed-projection:8"
    first = spark.createDataFrame(original[:cut], "doc_id long, text string")
    _, store = incremental_embed(first, None, model=spec)
    store = store.persist()
    recrawl = spark.createDataFrame(final, "doc_id long, text string")
    _, updated = incremental_embed(recrawl, store, model=spec)
    got = {r["doc_id"]: r["embedding"] for r in updated.collect()}
    want = {
        r["doc_id"]: r["embedding"]
        for r in embed_documents(recrawl, model=spec).collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    data=st.data(),
    n_docs=st.integers(min_value=2, max_value=10),
    L=st.integers(min_value=3, max_value=6),
    cut=st.integers(min_value=0, max_value=10),
)
def test_incremental_exact_substr_split_invariance_property(
    spark, data, n_docs, L, cut
):
    """For any corpus with planted duplicated runs and any ascending-id
    batch split, concatenating the incremental batches' outputs equals
    the one-shot exact_substr_dedup over the union."""
    from pyspark.sql import functions as F

    from metalpipe_spark.operators.dedup import (
        exact_substr_dedup,
        incremental_exact_substr,
    )

    cut = min(cut, n_docs)
    run = [f"R{j}" for j in range(data.draw(st.integers(L, 2 * L)))]
    docs = []
    for d in range(n_docs):
        toks = [
            f"t{data.draw(st.integers(0, 4))}"
            for _ in range(data.draw(st.integers(0, 20)))
        ]
        if data.draw(st.booleans()):
            at = data.draw(st.integers(0, len(toks)))
            toks = toks[:at] + run + toks[at:]
        docs.append((d, " ".join(toks)))
    full = spark.createDataFrame(docs, "doc_id long, text string")
    want = sorted(
        map(tuple, exact_substr_dedup(full, min_length=L).collect())
    )
    b1 = full.where(F.col("doc_id") < cut)
    b2 = full.where(F.col("doc_id") >= cut)
    c1, store = incremental_exact_substr(b1, None, min_length=L)
    store = store.persist()
    c2, _ = incremental_exact_substr(b2, store, min_length=L)
    got = sorted(map(tuple, c1.unionByName(c2).collect()))
    assert got == want


@settings(**{**_SETTINGS, "max_examples": 12})
@given(
    n_resp=st.integers(1, 6),
    refs=st.lists(st.integers(0, 9), min_size=1, max_size=10),
    bad_digest=st.lists(st.booleans(), min_size=1, max_size=10),
)
def test_resolve_revisits_property(spark, n_resp, refs, bad_digest):
    """Property (r14 verdict task 6): a revisit resolves iff its
    refers_to names an EXISTING response (dangling refs vanish — the
    join is the existence check), and digest_ok holds iff both digests
    are present and equal."""
    from metalpipe_spark.sources.warc import resolve_revisits

    responses = [
        ("response", f"https://h/{j}", "2026", f"<urn:doc:{j}>", None,
         "", f"md5:d{j}", 200, bytearray(f"body{j}".encode()))
        for j in range(n_resp)
    ]
    revisits = []
    for i, ref in enumerate(refs):
        bad = bad_digest[i % len(bad_digest)]
        digest = "md5:WRONG" if bad else f"md5:d{ref}"
        revisits.append(
            ("revisit", f"https://h/{ref}?r={i}", "2026",
             f"<urn:rev:{i}>", f"<urn:doc:{ref}>", "profile", digest,
             200, bytearray(b""))
        )
    warc = spark.createDataFrame(
        responses + revisits,
        "warc_type string, url string, date string, record_id string,"
        " refers_to string, profile string, payload_digest string,"
        " http_status int, payload binary",
    )
    got = {
        r["record_id"]: r["digest_ok"]
        for r in resolve_revisits(warc).collect()
    }
    want = {
        f"<urn:rev:{i}>": not bad_digest[i % len(bad_digest)]
        for i, ref in enumerate(refs)
        if ref < n_resp  # dangling refers_to must NOT resolve
    }
    assert got == want


@settings(**{**_SETTINGS, "max_examples": 4})
@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=5),
        min_size=2,
        max_size=12,
    ),
    reps=st.lists(st.integers(1, 4), min_size=1, max_size=12),
    n_merges=st.integers(1, 4),
)
def test_train_wordpiece_reference_property(spark, words, reps, n_merges):
    """Breadth companion to the fixed-corpus reference-equality test:
    on random tiny corpora the distributed WordPiece trainer must
    produce the exact merge list (bit-equal scores included) of the
    pure-Python Schuster-Nakajima reference."""
    from collections import Counter

    from metalpipe_spark.operators.bpe import train_wordpiece
    from tests.test_bpe import _reference_wordpiece

    docs = [" ".join(w for w in words for _ in range(reps[hash(w) % len(reps)]))]
    df = spark.createDataFrame(
        [(0, docs[0])], "doc_id long, text string"
    )
    got = [
        (r["left"], r["right"], r["merged"], r["pair_count"], r["score"])
        for r in train_wordpiece(
            df, num_merges=n_merges, min_pair_count=1, checkpoint_every=2
        )
        .orderBy("rank")
        .collect()
    ]
    counts = Counter(w for t in docs for w in t.split())
    want = _reference_wordpiece(dict(counts), n_merges, min_count=1)
    assert got == want


def _reference_kn_lm(texts: list[str], n: int, D: float):
    """Pure-Python interpolated Kneser-Ney trainer mirroring
    train_backoff_lm(smoothing='kn')'s exact arithmetic: raw counts at
    the top order, left-continuation counts below, entries = all
    raw-seen grams (cc=0 for doc-initial-only grams), uniform 1/|V|
    unigram floor, p = max(cnt-D,0)/denom + (D*types/denom)*p_lower9
    with each consumed level HALF_UP-rounded to 9 dp, denom=0 ->
    pass-through (p = p_lower9, backoff 1), backoff = gamma of the
    next order up.  Returns {(order, ngram): (n_count, ctx_count,
    prob, backoff)}."""
    import re
    from collections import Counter, defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    q9 = Decimal("0.000000001")

    def r9(p: float) -> float:
        # Spark round()/cast-to-decimal quantize the SHORTEST
        # decimal repr (Java Double.toString == Python repr), not
        # the exact binary expansion — they differ when the exact
        # value sits just below an ...x5 boundary whose shortest
        # repr is exactly the boundary (caught by hypothesis on
        # the mkn trainer).
        return float(
            Decimal(repr(p)).quantize(q9, rounding=ROUND_HALF_UP)
        )

    raw: dict[int, Counter] = {k: Counter() for k in range(1, n + 1)}
    for t in texts:
        toks = re.split(r"\s+", t)
        for k in range(1, n + 1):
            for i in range(len(toks) - k + 1):
                g = " ".join(toks[i : i + k])
                if g != g.strip() or "  " in g or not g:
                    continue
                raw[k][g] += 1
    # count tables: raw at top, continuation below
    cnt: dict[int, Counter] = {n: raw[n]}
    for k in range(1, n):
        cc: Counter = Counter()
        for g in raw[k + 1]:
            cc[g.split(" ", 1)[1]] += 1
        cnt[k] = cc
    out = {}
    V = len(raw[1])
    d1 = sum(cnt[1].values())
    t1 = len(cnt[1])
    u = r9(1.0 / float(V))
    prob: dict[int, dict[str, float]] = {1: {}}
    for w in raw[1]:
        c = cnt[1].get(w, 0)
        if d1 == 0:
            p = u
        else:
            term = ((float(c) - D) if c > 0 else 0.0) / float(d1)
            p = term + ((D * float(t1)) / float(d1)) * u
        prob[1][w] = p
        out[(1, w)] = [c, d1, p, None]
    for k in range(2, n + 1):
        ents = raw[k] if k == n else {
            g: cnt[k].get(g, 0) for g in raw[k]
        }
        denom: Counter = Counter()
        types: Counter = Counter()
        for g, c in ents.items():
            ctx = " ".join(g.split(" ")[: k - 1])
            denom[ctx] += c
            if c > 0:
                types[ctx] += 1
        prob[k] = {}
        for g, c in ents.items():
            ctx = " ".join(g.split(" ")[: k - 1])
            lo = r9(prob[k - 1][g.split(" ", 1)[1]])
            if denom[ctx] == 0:
                p = lo
            else:
                term = ((float(c) - D) if c > 0 else 0.0) / float(
                    denom[ctx]
                )
                p = term + (
                    (D * float(types[ctx])) / float(denom[ctx])
                ) * lo
            prob[k][g] = p
            out[(k, g)] = [c, denom[ctx], p, None]
        for ctx in denom:
            bo = (
                1.0
                if denom[ctx] == 0
                else (D * float(types[ctx])) / float(denom[ctx])
            )
            out[(k - 1, ctx)][3] = bo
    return {key: tuple(v) for key, v in out.items()}


def _reference_mkn_lm(texts: list[str], n: int, fixed=None):
    """Pure-Python MODIFIED interpolated Kneser-Ney mirroring
    train_backoff_lm(smoothing='mkn'): the _reference_kn_lm count/
    entry/floor structure with three discounts per level — fixed
    (D1, D2, D3+) or the Chen-Goodman estimates from each level's own
    count-of-counts (Y = n1/(n1+2n2), D_i = i - (i+1)*Y*n_{i+1}/n_i,
    i-0.5 fallback, clamp >= 1e-6) — and gamma = (D1*N1 + D2*N2 +
    D3*N3+)/denom in the engine's pinned operand order."""
    import re
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    q9 = Decimal("0.000000001")

    def r9(p: float) -> float:
        # Spark round()/cast-to-decimal quantize the SHORTEST
        # decimal repr (Java Double.toString == Python repr), not
        # the exact binary expansion — they differ when the exact
        # value sits just below an ...x5 boundary whose shortest
        # repr is exactly the boundary (caught by hypothesis on
        # the mkn trainer).
        return float(
            Decimal(repr(p)).quantize(q9, rounding=ROUND_HALF_UP)
        )

    raw: dict[int, Counter] = {k: Counter() for k in range(1, n + 1)}
    for t in texts:
        toks = re.split(r"\s+", t)
        for k in range(1, n + 1):
            for i in range(len(toks) - k + 1):
                g = " ".join(toks[i : i + k])
                if g != g.strip() or "  " in g or not g:
                    continue
                raw[k][g] += 1
    cnt: dict[int, Counter] = {n: raw[n]}
    for k in range(1, n):
        cc: Counter = Counter()
        for g in raw[k + 1]:
            cc[g.split(" ", 1)[1]] += 1
        cnt[k] = cc

    def disc(k):
        if fixed is not None:
            return fixed
        coc = Counter(c for c in cnt[k].values() if c <= 4)
        n1, n2, n3, n4 = coc[1], coc[2], coc[3], coc[4]
        y = n1 / (n1 + 2.0 * n2) if (n1 + 2 * n2) > 0 else 0.0
        d1 = 1.0 - 2.0 * y * n2 / n1 if n1 > 0 else 0.5
        d2 = 2.0 - 3.0 * y * n3 / n2 if n2 > 0 else 1.5
        d3 = 3.0 - 4.0 * y * n4 / n3 if n3 > 0 else 2.5
        return (max(d1, 1e-6), max(d2, 1e-6), max(d3, 1e-6))

    def dc(c, ds):
        return ds[0] if c == 1 else (ds[1] if c == 2 else ds[2])

    out = {}
    V = len(raw[1])
    d1v, t1, t2, t3 = (
        sum(cnt[1].values()),
        sum(1 for c in cnt[1].values() if c == 1),
        sum(1 for c in cnt[1].values() if c == 2),
        sum(1 for c in cnt[1].values() if c >= 3),
    )
    ds = disc(1)
    u = r9(1.0 / float(V))
    prob: dict[int, dict[str, float]] = {1: {}}
    for w in raw[1]:
        c = cnt[1].get(w, 0)
        if d1v == 0:
            p = u
        else:
            term = ((float(c) - dc(c, ds)) if c > 0 else 0.0) / float(d1v)
            g = (ds[0] * float(t1) + ds[1] * float(t2)
                 + ds[2] * float(t3)) / float(d1v)
            p = term + g * u
        prob[1][w] = p
        out[(1, w)] = [c, d1v, p, None]
    for k in range(2, n + 1):
        ds = disc(k)
        ents = raw[k] if k == n else {
            g: cnt[k].get(g, 0) for g in raw[k]
        }
        denom: Counter = Counter()
        nn: dict[str, list] = {}
        for g, c in ents.items():
            ctx = " ".join(g.split(" ")[: k - 1])
            denom[ctx] += c
            s = nn.setdefault(ctx, [0, 0, 0])
            if c == 1:
                s[0] += 1
            elif c == 2:
                s[1] += 1
            elif c >= 3:
                s[2] += 1
        prob[k] = {}
        for g, c in ents.items():
            ctx = " ".join(g.split(" ")[: k - 1])
            lo = r9(prob[k - 1][g.split(" ", 1)[1]])
            if denom[ctx] == 0:
                p = lo
            else:
                term = (
                    (float(c) - dc(c, ds)) if c > 0 else 0.0
                ) / float(denom[ctx])
                s = nn[ctx]
                g_ = (
                    ds[0] * float(s[0]) + ds[1] * float(s[1])
                    + ds[2] * float(s[2])
                ) / float(denom[ctx])
                p = term + g_ * lo
            prob[k][g] = p
            out[(k, g)] = [c, denom[ctx], p, None]
        for ctx in denom:
            if denom[ctx] == 0:
                bo = 1.0
            else:
                s = nn[ctx]
                bo = (
                    ds[0] * float(s[0]) + ds[1] * float(s[1])
                    + ds[2] * float(s[2])
                ) / float(denom[ctx])
            out[(k - 1, ctx)][3] = bo
    return {key: tuple(v) for key, v in out.items()}


def _reference_backoff_lm(texts: list[str], n: int, D: float):
    """Pure-Python absolute-discount Katz trainer mirroring
    train_backoff_lm's exact arithmetic: raw counts per order (junk
    grams excluded), MLE unigram floor, (c - D)/denom discounted
    probs, residual = DECIMAL sum of the lower order's HALF_UP
    9-dp-rounded probs (Decimal(repr(float)): Spark rounds the
    SHORTEST decimal repr — Java Double.toString — not the exact
    binary expansion), backoff = leftover / (1 - residual) with the
    non-positive-residual -> 0 guard."""
    import re
    from collections import Counter, defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    q9 = Decimal("0.000000001")

    def r9(p: float) -> Decimal:
        # shortest-repr quantize: see _reference_kn_lm's r9 note
        return Decimal(repr(p)).quantize(q9, rounding=ROUND_HALF_UP)

    counts: dict[int, Counter] = {k: Counter() for k in range(1, n + 1)}
    for t in texts:
        toks = re.split(r"\s+", t)
        for k in range(1, n + 1):
            for i in range(len(toks) - k + 1):
                g = " ".join(toks[i : i + k])
                if g != g.strip() or "  " in g or not g:
                    continue
                counts[k][g] += 1
    out = {}  # (order, ngram) -> [n_count, ctx_count, prob, backoff]
    total1 = sum(counts[1].values())
    for w, c in counts[1].items():
        out[(1, w)] = [c, total1, float(c) / float(total1), None]
    for k in range(2, n + 1):
        denom: Counter = Counter()
        types: Counter = Counter()
        sfx = {}
        for g, c in counts[k].items():
            ctx = g.rsplit(" ", 1)[0] if k == 2 else " ".join(g.split(" ")[: k - 1])
            denom[ctx] += c
            types[ctx] += 1
        for g, c in counts[k].items():
            ctx = " ".join(g.split(" ")[: k - 1])
            out[(k, g)] = [
                c, denom[ctx],
                (float(c) - D) / float(denom[ctx]), None,
            ]
            sfx[g] = " ".join(g.split(" ")[1:])
        resid: dict[str, Decimal] = defaultdict(lambda: Decimal(0))
        for g in counts[k]:
            ctx = " ".join(g.split(" ")[: k - 1])
            resid[ctx] += r9(out[(k - 1, sfx[g])][2])
        for ctx in denom:
            slo = float(resid[ctx])
            if 1.0 - slo <= 0.0:
                bo = 0.0
            else:
                bo = ((D * float(types[ctx])) / float(denom[ctx])) / (
                    1.0 - slo
                )
            out[(k - 1, ctx)][3] = bo
    return {
        key: (v[0], v[1], v[2], v[3]) for key, v in out.items()
    }


@settings(**{**_SETTINGS, "max_examples": 4})
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3),
        min_size=3,
        max_size=10,
    ),
    reps=st.lists(st.integers(1, 3), min_size=1, max_size=10),
    n=st.integers(2, 3),
)
def test_train_backoff_lm_reference_property(spark, words, reps, n):
    """Breadth companion to the hand-counted backoff-LM test: on random
    tiny corpora the distributed trainer must produce bit-equal counts,
    denominators, discounted probabilities AND backoff weights to the
    pure-Python Katz reference — every order, every context.  Also
    pins the per-context mass identity sum(seen probs) + D*types/denom
    == 1 exactly (the discount leftover is the backoff mass)."""
    from metalpipe_spark.operators.text import train_backoff_lm

    text = " ".join(w for w in words for _ in range(reps[hash(w) % len(reps)]))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = train_backoff_lm(docs, n=n, discount=0.75).collect()
    got = {
        (r["order"], r["ngram"]): (
            r["n_count"], r["ctx_count"], r["prob"], r["backoff"]
        )
        for r in rows
    }
    want = _reference_backoff_lm([text], n, 0.75)
    assert got == want
    # mass identity per context at every order >= 2
    from collections import defaultdict

    by_ctx = defaultdict(list)
    for r in rows:
        if r["order"] >= 2:
            ctx = " ".join(r["ngram"].split(" ")[: r["order"] - 1])
            by_ctx[(r["order"], ctx)].append(r)
    for (_, _), members in by_ctx.items():
        denom = members[0]["ctx_count"]
        leftover = 0.75 * len(members) / denom
        assert abs(sum(m["prob"] for m in members) + leftover - 1.0) < 1e-9


@settings(**{**_SETTINGS, "max_examples": 4})
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3),
        min_size=3,
        max_size=10,
    ),
    reps=st.lists(st.integers(1, 3), min_size=1, max_size=10),
    n=st.integers(2, 3),
)
def test_train_kn_lm_reference_property(spark, words, reps, n):
    """r16 verdict task 1: on random tiny corpora the distributed
    interpolated Kneser-Ney trainer must produce bit-equal
    continuation counts, denominators, interpolated probabilities AND
    gamma backoff weights to the pure-Python KN reference — every
    order, every context, including the cc=0 doc-initial rows and the
    denom=0 pass-through.  Also pins total mass: summing the model's
    implied p(w|ctx) over the FULL vocabulary (backoff rule for
    unseen w) conserves probability to rounding tolerance."""
    from metalpipe_spark.operators.text import train_backoff_lm

    text = " ".join(w for w in words for _ in range(reps[hash(w) % len(reps)]))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = train_backoff_lm(
        docs, n=n, discount=0.75, smoothing="kn"
    ).collect()
    got = {
        (r["order"], r["ngram"]): (
            r["n_count"], r["ctx_count"], r["prob"], r["backoff"]
        )
        for r in rows
    }
    want = _reference_kn_lm([text], n, 0.75)
    assert got == want
    # mass conservation over the full vocab at order 2: seen (ctx,w)
    # use the stored prob, unseen use b(ctx)*p1(w)
    vocab = [g for (k, g) in got if k == 1]
    p1 = {g: got[(1, g)][2] for g in vocab}
    b1 = {g: got[(1, g)][3] for g in vocab}
    seen2 = {
        g: got[(2, g)][2] for (k, g) in got if k == 2
    }
    for ctx in vocab:
        if b1[ctx] is None:
            continue  # not a context of any bigram entry
        total = 0.0
        for w in vocab:
            total += seen2.get(f"{ctx} {w}", b1[ctx] * p1[w])
        assert abs(total - 1.0) < 1e-6, (ctx, total)


@settings(**{**_SETTINGS, "max_examples": 4})
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3),
        min_size=3,
        max_size=10,
    ),
    reps=st.lists(st.integers(1, 4), min_size=1, max_size=10),
    n=st.integers(2, 3),
    estimated=st.booleans(),
)
def test_train_mkn_lm_reference_property(spark, words, reps, n, estimated):
    """Modified interpolated Kneser-Ney (KenLM's default): the
    distributed trainer must produce bit-equal counts, denominators,
    triple-discounted interpolated probabilities AND summed-gamma
    backoff weights to the pure-Python reference — both with fixed
    (D1, D2, D3+) and with per-level Chen-Goodman estimates — plus
    order-2 mass conservation over the full vocabulary."""
    from metalpipe_spark.operators.text import train_backoff_lm

    text = " ".join(w for w in words for _ in range(reps[hash(w) % len(reps)]))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    disc = "ney" if estimated else (0.4, 1.1, 2.0)
    rows = train_backoff_lm(
        docs, n=n, discount=disc, smoothing="mkn"
    ).collect()
    got = {
        (r["order"], r["ngram"]): (
            r["n_count"], r["ctx_count"], r["prob"], r["backoff"]
        )
        for r in rows
    }
    want = _reference_mkn_lm(
        [text], n, fixed=None if estimated else (0.4, 1.1, 2.0)
    )
    assert got == want
    vocab = [g for (k, g) in got if k == 1]
    p1 = {g: got[(1, g)][2] for g in vocab}
    b1 = {g: got[(1, g)][3] for g in vocab}
    seen2 = {g: got[(2, g)][2] for (k, g) in got if k == 2}
    for ctx in vocab:
        if b1[ctx] is None:
            continue
        total = sum(
            seen2.get(f"{ctx} {w}", b1[ctx] * p1[w]) for w in vocab
        )
        assert abs(total - 1.0) < 1e-6, (ctx, total)


def test_kn_scorer_consumes_kn_table_unchanged(spark):
    """The ARPA self-consistency that makes interpolated KN shippable:
    ngram_logprob_backoff scores a KN table with NO code changes, and
    the backoff chain (b(ctx)*p_lower for unseen grams) equals the
    model's own interpolated probability — verified against a direct
    per-gram replay."""
    import re

    from metalpipe_spark.operators.text import (
        ngram_logprob_backoff,
        train_backoff_lm,
    )

    train = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "the cat ran on a mat")],
        ["doc_id", "text"],
    )
    lm = train_backoff_lm(train, n=2, discount=0.75, smoothing="kn")
    lm_rows = lm.collect()
    lp = {(r["order"], r["ngram"]): r["logprob"] for r in lm_rows}
    bo = {
        r["ngram"]: r["log_backoff"]
        for r in lm_rows
        if r["order"] == 1 and r["log_backoff"] is not None
    }
    score_text = "the mat sat on a dog"
    toks = re.split(r"\s+", score_text)
    want_scores = []
    for i in range(len(toks) - 1):
        g = f"{toks[i]} {toks[i + 1]}"
        if (2, g) in lp:
            want_scores.append(lp[(2, g)])
        elif (1, toks[i + 1]) in lp:
            want_scores.append(bo.get(toks[i], 0.0) + lp[(1, toks[i + 1])])
        else:
            want_scores.append(-8.0)
    want = sum(want_scores) / len(want_scores)
    got = ngram_logprob_backoff(
        spark.createDataFrame([(9, score_text)], ["doc_id", "text"]),
        lm,
        n=2,
    ).collect()
    assert len(got) == 1
    assert abs(got[0]["mean_logprob"] - want) < 1e-12


@settings(**{**_SETTINGS, "max_examples": 4})
@given(
    train_words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=2),
        min_size=4,
        max_size=10,
    ),
    score_words=st.lists(
        st.text(alphabet="abcz", min_size=1, max_size=2),
        min_size=1,
        max_size=8,
    ),
)
def test_ngram_logprob_backoff_reference_property(spark, train_words, score_words):
    """Scorer breadth: against a model TRAINED at n=3 on one random
    corpus, the distributed backoff chain over a second random doc
    (including 'z' words the model never saw) must equal a pure-Python
    replay of the ARPA chain — trigram hit / bigram backoff / unigram
    backoff / OOV floor — under exact-mode 9-dp DECIMAL accumulation."""
    import re
    from decimal import ROUND_HALF_UP, Decimal

    from metalpipe_spark.operators.text import (
        ngram_logprob_backoff,
        train_backoff_lm,
    )

    q9 = Decimal("0.000000001")

    def r9d(x: float) -> Decimal:
        # shortest-repr quantize: see _reference_kn_lm's r9 note
        return Decimal(repr(x)).quantize(q9, rounding=ROUND_HALF_UP)

    n = 3
    train_text = " ".join(train_words * 2)
    score_text = " ".join(score_words)
    lm_df = train_backoff_lm(
        spark.createDataFrame(
            [(0, train_text)], "doc_id long, text string"
        ),
        n=n,
    )
    lm_rows = lm_df.collect()
    lp = {(r["order"], r["ngram"]): r["logprob"] for r in lm_rows}
    bo = {
        (r["order"], r["ngram"]): r["log_backoff"]
        for r in lm_rows
        if r["log_backoff"] is not None
    }

    def ref_gram(ws: list[str]) -> float:
        for k in range(n, 0, -1):
            key = " ".join(ws[n - k:])
            if (k, key) in lp:
                # the engine's exact float order: bosum accumulates
                # DESCENDING j from n-1 down to k, then + lp
                s = 0.0
                for j in range(n - 1, k - 1, -1):
                    ctx = " ".join(ws[n - 1 - j : n - 1])
                    s = s + bo.get((j, ctx), 0.0)
                return s + lp[(k, key)]
        return -8.0

    toks = re.split(r"\s+", score_text)
    grams = [toks[i : i + n] for i in range(len(toks) - n + 1)]
    if grams:
        nn = len(grams)
        total = sum((r9d(ref_gram(g)) for g in grams), Decimal(0))
    else:
        nn, total = 1, r9d(-8.0)
    want = float(total) / float(nn)

    got = ngram_logprob_backoff(
        spark.createDataFrame(
            [(7, score_text)], "doc_id long, text string"
        ),
        lm_df,
        n=n,
        exact=True,
    ).collect()
    assert len(got) == 1 and got[0]["doc_id"] == 7
    assert got[0]["mean_logprob"] == want


def test_round9_shortest_repr_semantics(spark):
    """Pin the rounding semantic the pure-Python LM references must
    mirror: Spark's round() (and its cast-to-decimal) quantizes the
    SHORTEST decimal representation (Java Double.toString == Python
    repr), not the exact binary expansion.  0.4666666665's exact
    binary is ...6649999999..., so exact-binary HALF_UP gives
    ...666 while shortest-repr gives ...667 — Spark and DuckDB both
    produce ...667 (hypothesis caught the divergence on the mkn
    trainer; the references now quantize Decimal(repr(x)))."""
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb
    from pyspark.sql import functions as F

    x = 0.4666666665
    q9 = Decimal("0.000000001")
    assert Decimal(x).quantize(q9, rounding=ROUND_HALF_UP) == Decimal(
        "0.466666666"
    )
    want = float(Decimal(repr(x)).quantize(q9, rounding=ROUND_HALF_UP))
    assert want == 0.466666667
    got = spark.range(1).select(F.round(F.lit(x), 9).alias("r")).first()
    assert got["r"] == want
    assert (
        duckdb.sql("select round(0.4666666665::DOUBLE, 9)").fetchone()[0]
        == want
    )
