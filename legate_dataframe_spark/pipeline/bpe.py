"""Distributed BPE vocabulary induction — learn byte-pair-encoding
merges from a corpus, the tokenizer-training step of an LLM data
pipeline.

Scale design: BPE training is word-HISTOGRAM-bound, not corpus-bound.
The one corpus-sized operation is the word-count aggregation (one
shuffle with map-side partial agg); every merge round after that
operates on the vocab-sized (word, count) table — pair counting is a
small agg whose 1-row winner is collected (a scalar parameter, the
same convention as every other 1-row stats collect in the engine)
and inlined into the next round's merge as string LITERALS, so the
vocabulary table itself stays LAZY: round k's pair count runs k-1
nested literal replaces over the one checkpointed base encoding.
That is one vocab-sized aggregation job per round and nothing else —
r12 additionally materialized the merged vocabulary every round and
checkpointed the winner frame (2 actions + a broadcast join per
round; measured 1.9x slower end-to-end on the learn).  Nothing
corpus-sized moves after the histogram.

Exact greedy semantics, engine-portably: a word's symbol sequence is
encoded as ``<s1><s2>…<sn>`` (symbols are restricted to ``[a-z]+`` so
the angle brackets cannot occur inside a symbol).  Merging pair (a,b)
is then a literal string ``replace`` of ``<a><b>`` with ``<ab>`` —
left-to-right non-overlapping replace-all, which is EXACTLY greedy BPE
merging: overlapping occurrences (``aaa`` under pair (a,a)) collapse
left-to-right, disjoint occurrences all merge, and the bracket
delimiters make mid-symbol false matches impossible.  DuckDB's
``replace`` has identical semantics, so the oracle unrolls the same
rounds in SQL (same convention as kmeans_refine / pagerank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) histogram of lowercased ``[a-z]+`` words — the one
    corpus-sized shuffle of BPE training."""
    return (docs.select(F.explode(F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")))


def _encode(word: Column) -> Column:
    """``hello`` → ``<h><e><l><l><o>`` (initial character symbols)."""
    return F.regexp_replace(word, "(.)", "<$1>")


def _symbols(seq: Column) -> Column:
    """Encoded sequence back to its symbol array."""
    return F.split(F.regexp_replace(seq, "^<|>$", ""), "><")


def learn_bpe_merges(
    words: DataFrame,
    n_merges: int = 8,
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules from a (w, cnt) histogram.

    Returns the merge table: (round, a, b, merged, freq) — one row per
    round, ``freq`` the count-weighted frequency of the winning pair
    at the time it was chosen.  Ties break lexicographically on (a, b)
    so the result is engine-reproducible.
    """
    # One eager localCheckpoint for the base encoding: round k's pair
    # count would otherwise re-run the histogram's corpus shuffle.
    # The loop itself runs ONE action per round — the winning pair is
    # a 1-row collect (a scalar parameter), inlined as literals so the
    # merged vocabulary is a lazy chain of narrow replaces over this
    # checkpoint.  r12 instead checkpointed the winner AND the merged
    # vocabulary every round (2 actions + a broadcast join per round);
    # the lazy chain stays plan-cheap because it is k literal replace
    # expressions, not the joins + sort-limits that made the original
    # unchckpointed form plan-bound (~20 s at sf0.1).
    vocab = (words.select(_encode(F.col("w")).alias("seq"), "cnt")
             .localCheckpoint(eager=True))
    spark = vocab.sparkSession
    rows: list[tuple] = []
    for rnd in range(1, n_merges + 1):
        syms = _symbols(F.col("seq"))
        pairs = F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(F.element_at(syms, i).alias("a"),
                               F.element_at(syms, i + 1).alias("b")))
        top = (vocab.filter(F.size(syms) > 1)
               .select(F.explode(pairs).alias("p"), "cnt")
               .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
               .agg(F.sum("cnt").alias("freq"))
               .orderBy(F.col("freq").desc(), "a", "b").limit(1)
               .collect())
        if not top:  # no multi-symbol words left: nothing to merge
            break    # (r12's inner join with the empty winner emptied
            #          the vocab, yielding the same truncated table)
        a, b, freq = top[0]["a"], top[0]["b"], top[0]["freq"]
        rows.append((rnd, a, b, a + b, freq))
        vocab = vocab.select(
            F.replace(F.col("seq"), F.lit(f"<{a}><{b}>"),
                      F.lit(f"<{a}{b}>")).alias("seq"), "cnt")
    return spark.createDataFrame(
        rows, "round int, a string, b string, merged string, freq bigint")


def apply_bpe_merges(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode each document with a learned merge table and report
    (id, n_words, n_tokens): the post-BPE token count is the quantity
    a training pipeline actually budgets by (sequence packing, token
    accounting).

    The merge table (k rows) is collapsed into ONE broadcast row of
    parallel pattern/replacement arrays, and the k merges fold over
    each word's bracket encoding with ``aggregate`` — a pure narrow
    map over the corpus: zero shuffles, zero driver-side data, k
    string replaces per word.  At 100 TB this is scan-bandwidth-bound,
    exactly like the text-stats family.
    """
    # collect_list has no cross-partition order guarantee, so sort the
    # collected (round, pat, rep) structs by round explicitly — merge k
    # may consume merge j<k's output, order is semantic here
    ordered = F.array_sort(F.collect_list(F.struct(
        F.col("round").alias("r"),
        F.concat(F.lit("<"), F.col("a"), F.lit("><"), F.col("b"),
                 F.lit(">")).alias("pat"),
        F.concat(F.lit("<"), F.col("merged"), F.lit(">")).alias("rep"))))
    rules = (merges.groupBy().agg(ordered.alias("rules"))
             .select(F.transform("rules", lambda s: s["pat"]).alias("pats"),
                     F.transform("rules", lambda s: s["rep"]).alias("reps")))
    words = F.regexp_extract_all(F.lower(F.col(text_col)),
                                 F.lit("[a-z]+"), 0)
    # fold the merge list over each word: aggregate's accumulator is the
    # encoded word; element i applies replace(pats[i] -> reps[i])
    encoded = F.transform(
        words,
        lambda w: F.aggregate(
            F.sequence(F.lit(1), F.size(F.col("pats"))),
            F.regexp_replace(w, "(.)", "<$1>"),
            lambda acc, i: F.replace(acc, F.element_at(F.col("pats"), i),
                                     F.element_at(F.col("reps"), i))))
    # token count of an encoded word = its '<' count; collect_list in
    # the 1-row agg preserves the orderBy, so pats/reps apply in
    # training order (merge k can consume merge j<k's output)
    n_tokens = F.aggregate(
        encoded, F.lit(0).cast("long"),
        lambda acc, e: acc + F.length(e) - F.length(F.replace(
            e, F.lit("<"), F.lit(""))))
    return (docs.join(F.broadcast(rules))
            .select(F.col(id_col), F.size(words).cast("long")
                    .alias("n_words"), n_tokens.alias("n_tokens")))


def bpe_token_stream(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode each document to its FULL BPE token stream →
    (id, text) where ``text`` is the space-joined sequence of BPE
    tokens in document order — the representation Lee et al.
    (arXiv:2107.06499) deduplicate over (their ExactSubstr operates
    on tokenizer output, not words).  Rendering the stream as a
    space-joined string makes every downstream ``\\s+``-tokenized
    span operator (remove_dup_spans & family) a BPE-token operator
    for free: BPE symbols are ``[a-z]+`` pieces, so the join is
    lossless and re-splitting recovers the exact token sequence.

    Same scale shape as :func:`apply_bpe_merges`: the merge table is
    one broadcast row of ordered pattern/replacement arrays and the
    encode is a pure narrow map — zero shuffles, scan-bound."""
    ordered = F.array_sort(F.collect_list(F.struct(
        F.col("round").alias("r"),
        F.concat(F.lit("<"), F.col("a"), F.lit("><"), F.col("b"),
                 F.lit(">")).alias("pat"),
        F.concat(F.lit("<"), F.col("merged"), F.lit(">")).alias("rep"))))
    rules = (merges.groupBy().agg(ordered.alias("rules"))
             .select(F.transform("rules", lambda s: s["pat"]).alias("pats"),
                     F.transform("rules", lambda s: s["rep"]).alias("reps")))
    words = F.regexp_extract_all(F.lower(F.col(text_col)),
                                 F.lit("[a-z]+"), 0)
    encoded = F.transform(
        words,
        lambda w: F.aggregate(
            F.sequence(F.lit(1), F.size(F.col("pats"))),
            F.regexp_replace(w, "(.)", "<$1>"),
            lambda acc, i: F.replace(acc, F.element_at(F.col("pats"), i),
                                     F.element_at(F.col("reps"), i))))
    # <h><el><lo> → [h, el, lo]; flatten across words in doc order
    toks = F.flatten(F.transform(
        encoded,
        lambda e: F.split(F.regexp_replace(e, "^<|>$", ""), "><")))
    return (docs.join(F.broadcast(rules))
            .select(F.col(id_col),
                    F.array_join(toks, " ").alias("text")))
