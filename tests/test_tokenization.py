"""Invariants + plan pins for the tokenization-stage operators
(operators/tokenization.py). Oracle parity is covered by
tests/test_operators.py; these pin the semantic guarantees a hash
can't express: packing covers every token exactly once with full
contexts, and the pair counts equal an independent Python recount.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from citation_graph_spark import operators
from citation_graph_spark.operators.tokenization import (
    BPE_TOP_K,
    NSHARDS,
    PACK_L,
)
from citation_graph_spark.planaudit import plan_stats, static_plans
from citation_graph_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"

operators.load_all()


def _doc_tokens(spark):
    d = load_tables(spark, SF_DIR)["documents"]
    return {
        r["doc_id"]: r["toks"]
        for r in d.select(
            "doc_id",
            F.split(
                F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"
            ).alias("toks"),
        ).collect()
    }


def test_context_packing_covers_every_token_exactly_once(spark):
    """Independent Python replay: concatenate each shard's token
    streams in doc_id order, cut every PACK_L — the manifest must
    match row-for-row, and every pack except a shard's last must be
    full."""
    toks = _doc_tokens(spark)
    expect: dict[tuple, int] = {}
    shard_cum: dict[int, int] = {}
    for doc_id in sorted(toks):
        shard = doc_id % NSHARDS
        nt = len(toks[doc_id])
        start = shard_cum.get(shard, 0)
        end = start + nt
        for pack in range(start // PACK_L, (end - 1) // PACK_L + 1):
            lo, hi = max(start, pack * PACK_L), min(end, (pack + 1) * PACK_L)
            expect[(shard, pack, doc_id)] = hi - lo
        shard_cum[shard] = end

    rows = operators.QUERIES["context_packing"](spark, SF_DIR).collect()
    got = {
        (r["shard"], r["pack_id"], r["doc_id"]): r["pack_tokens"]
        for r in rows
    }
    assert got == expect

    # fullness: within each shard every pack but the last is exactly L
    per_pack: dict[tuple, int] = {}
    for (shard, pack, _doc), n in got.items():
        per_pack[(shard, pack)] = per_pack.get((shard, pack), 0) + n
    last = {}
    for shard, pack in per_pack:
        last[shard] = max(last.get(shard, -1), pack)
    for (shard, pack), n in per_pack.items():
        if pack < last[shard]:
            assert n == PACK_L, (shard, pack, n)
        else:
            assert 1 <= n <= PACK_L
    # a doc longer than L (fixture has 65-99-token docs) spans packs
    assert any(
        sum(1 for (s, p, d2) in got if d2 == d) > 1 for d in toks
    ), "no document spans a pack boundary — fixture too small for L"


def test_bpe_pair_counts_match_python_recount(spark):
    """Counter-based oracle over the identical tokenization, top-K by
    the same (n DESC, pair ASC) total order."""
    toks = _doc_tokens(spark)
    c: Counter = Counter()
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            c[f"{a} {b}"] += 1
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_K]

    rows = operators.QUERIES["bpe_pair_counts"](spark, SF_DIR).collect()
    got = sorted(
        ((r["pair"], r["n"]) for r in rows), key=lambda kv: (-kv[1], kv[0])
    )
    assert got == expect


def test_tokenization_plans(spark):
    """context_packing: ONE exchange (the shard window), no joins.
    bpe_pair_counts: the groupBy exchange only; top-k must be a
    TakeOrdered, not a global sort materialization."""
    with static_plans(spark):
        s = plan_stats(operators.QUERIES["context_packing"](spark, SF_DIR))
        # plan_stats counts the node in both the tree and the detail
        # listing of the formatted plan: 2 == ONE physical exchange
        assert s["exchanges"] == 2, s["exchanges"]
        assert s["cartesian"] == 0 and s["sort_merge_joins"] == 0

        s = plan_stats(operators.QUERIES["bpe_pair_counts"](spark, SF_DIR))
        assert s["exchanges"] <= 2, s["exchanges"]
        assert s["cartesian"] == 0 and s["sort_merge_joins"] == 0
        assert "TakeOrderedAndProject" in s["formatted"], s["formatted"][:2000]


# ----------------------------------------------------------------- BPE learn
def _bpe_learn_oracle(word_counts, n_merges):
    """Sequential Sennrich-style BPE with the engine's exact tie-break
    (count desc, left asc, right asc) and left-to-right non-overlapping
    merging."""
    vocab = [(list(w), c) for w, c in word_counts.items()]
    rules = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + c
                )
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        if n < 2:
            break
        rules.append((rank, l, r, n))
        merged = l + r
        out = []
        for syms, c in vocab:
            acc = []
            for x in syms:
                if acc and acc[-1] == l and x == r:
                    acc[-1] = merged
                else:
                    acc.append(x)
            out.append((acc, c))
        vocab = out
    return rules


def test_bpe_learn_matches_sequential_replay(spark):
    from citation_graph_spark.operators.tokenization import bpe_learn

    wc = {
        "low": 5, "lower": 2, "newest": 6, "widest": 3,
        "o'brien": 2, "a": 9, "aaaa": 4,
    }
    words = spark.createDataFrame(list(wc.items()), "word string, count long")
    got = [
        (r["rank"], r["left"], r["right"], r["n"])
        for r in bpe_learn(words, 15).orderBy("rank").collect()
    ]
    assert got == _bpe_learn_oracle(wc, 15)
    # overlapping-run semantics: 'aaaa' x4 merges left-to-right
    assert ("a", "a") in {(l, r) for _, l, r, _ in got}


def test_bpe_learn_stops_when_nothing_repeats(spark):
    from citation_graph_spark.operators.tokenization import bpe_learn

    words = spark.createDataFrame([("xy", 1), ("zq", 1)], "word string, count long")
    assert bpe_learn(words, 10).count() == 0


def _bpe_encode_oracle(text_by_doc, rules):
    """Apply rank-ordered rules per word, left-to-right
    non-overlapping — sequential replay of bpe_encode."""
    out = {}
    for doc_id, text in text_by_doc.items():
        words = [w for w in (text or "").strip().split() if w]
        subwords = []
        for w in words:
            syms = list(w)
            for l, r in rules:
                acc = []
                for x in syms:
                    if acc and acc[-1] == l and x == r:
                        acc[-1] = l + r
                    else:
                        acc.append(x)
                syms = acc
            subwords.extend(syms)
        out[doc_id] = (
            len(words),
            sum(len(w) for w in words),
            len(subwords),
            subwords,
        )
    return out


def test_bpe_encode_matches_sequential_replay(spark):
    from citation_graph_spark.operators.tokenization import (
        bpe_encode,
        bpe_learn,
    )

    texts = {
        1: "low lower lowest newest newest widest",
        2: "the newest of the new low rows",
        3: "o'brien's     paper  ",
        4: "",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    wc = {}
    for t in texts.values():
        for w in t.strip().split():
            if w:
                wc[w] = wc.get(w, 0) + 1
    words = spark.createDataFrame(list(wc.items()), "word string, count long")
    rules = [
        (r["left"], r["right"])
        for r in bpe_learn(words, 10).orderBy("rank").collect()
    ]
    assert rules  # the fixture must actually learn something
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_chars"],
            r["n_subwords"],
            list(r["subwords"]),
        )
        for r in bpe_encode(docs, rules).collect()
    }
    assert got == _bpe_encode_oracle(texts, rules)


def test_bpe_encode_reproduces_trainer_final_state(spark):
    """Encoding the training vocabulary with its own learned table
    must land on the trainer's final symbol sequences."""
    from citation_graph_spark.operators.tokenization import (
        bpe_encode,
        bpe_learn,
    )

    wc = {"banana": 4, "bandana": 3, "ban": 5, "nab": 2}
    words = spark.createDataFrame(list(wc.items()), "word string, count long")
    rules = [
        (r["left"], r["right"])
        for r in bpe_learn(words, 8).orderBy("rank").collect()
    ]
    # trainer final state via the sequential learn replay
    learn_rules = _bpe_learn_oracle(wc, 8)
    assert [(l, r) for _, l, r, _ in learn_rules] == rules
    vocab = [(list(w), None) for w in wc]
    for _, l, r, _ in learn_rules:
        out = []
        for syms, _c in vocab:
            acc = []
            for x in syms:
                if acc and acc[-1] == l and x == r:
                    acc[-1] = l + r
                else:
                    acc.append(x)
            out.append((acc, None))
        vocab = out
    want = {w: syms for (syms, _), w in zip(vocab, wc)}
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(wc)], "doc_id long, text string"
    )
    got = {
        texts: list(r["subwords"])
        for r, texts in zip(
            bpe_encode(docs, rules).orderBy("doc_id").collect(), wc
        )
    }
    assert got == want


def test_bpe_encode_plan_is_shuffle_free(spark):
    from citation_graph_spark.operators.tokenization import bpe_encode

    docs = spark.createDataFrame([(1, "a b ab")], "doc_id long, text string")
    plan = (
        bpe_encode(docs, [("a", "b")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
