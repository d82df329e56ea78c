"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, content fingerprinting.

All pure column expressions (whole-stage codegen; zero Python).
Each has a matching DuckDB oracle in queries/extensions.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import PUNCT, lineage_cut, portable_hash60, tokenize

# deliberately small, fixed marker lists — the heuristic is the
# operator; the lists are config
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "y", "es"],
    "fr": ["le", "la", "de", "et", "est"],
}


def _count_in(words: Column, vocab: list[str]) -> Column:
    vocab_arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(words, lambda w: F.array_contains(vocab_arr, w)))


def _parallel(df: DataFrame) -> DataFrame:
    """Small parquet files arrive as ONE split; expression-heavy
    per-row work needs a repartition to use the cluster. Conditional:
    an input that already has enough splits (the 100 TB case) passes
    through untouched — the round-robin shuffle would be pure waste.
    getNumPartitions is planning metadata, not a job.

    Streaming inputs pass through untouched: micro-batch parallelism is
    the source's (maxFilesPerTrigger × splits), and .rdd does not exist
    on an unstarted streaming DataFrame — the same text operators run
    verbatim on streams (see test_streaming_text_pipeline)."""
    if df.isStreaming:
        return df
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def text_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc quality metrics: token count, char count, mean token
    length, punctuation ratio, stopword ratio. The classic cheap
    quality filters (length/punct/stopword) for corpus cleaning."""
    df = _parallel(df)
    words = tokenize(F.col(text_col))
    n_tokens = F.size(words)
    n_chars = F.length(F.col(text_col))
    token_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    n_punct = n_chars - F.length(F.translate(F.col(text_col), PUNCT, ""))
    n_stop = _count_in(words, LANG_MARKERS["en"])
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(token_chars.cast("double") / n_tokens, 5).alias("avg_token_len"),
        F.round(n_punct.cast("double") / n_chars, 5).alias("punct_ratio"),
        F.round(n_stop.cast("double") / n_tokens, 5).alias("stopword_ratio"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Marker-word language heuristic: count hits per language list,
    predict the argmax (ties broken en > de > es > fr). A real system
    swaps in char-n-gram profiles; the operator shape (vector of
    per-class scores -> argmax, all codegen) is identical."""
    df = _parallel(df)
    words = tokenize(F.col(text_col))
    hits = {lang: _count_in(words, v) for lang, v in LANG_MARKERS.items()}
    pred = (
        F.when(
            (hits["en"] >= hits["de"])
            & (hits["en"] >= hits["es"])
            & (hits["en"] >= hits["fr"]),
            F.lit("en"),
        )
        .when((hits["de"] >= hits["es"]) & (hits["de"] >= hits["fr"]), F.lit("de"))
        .when(hits["es"] >= hits["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        hits["en"].alias("en_hits"),
        hits["de"].alias("de_hits"),
        hits["es"].alias("es_hits"),
        hits["fr"].alias("fr_hits"),
        pred.alias("pred_lang"),
    )


def _check_keep_cols(keep_cols: Sequence[str], produced: Sequence[str]) -> None:
    """keep_cols appends plain ``F.col(c)`` projections — a name that
    collides with one the operator itself produces (or a duplicate in
    the list) yields a duplicate output column and ambiguous downstream
    references (r12 advice). Fail loudly at plan time instead."""
    seen: set[str] = set()
    for c in keep_cols:
        if c in produced:
            raise ValueError(
                f"keep_cols entry {c!r} collides with an operator output "
                f"column {tuple(produced)}; rename or drop it"
            )
        if c in seen:
            raise ValueError(f"duplicate keep_cols entry {c!r}")
        seen.add(c)


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Composite keep/review/drop quality gate: bounded mix of length,
    stopword density, and punctuation noise — the shape of a Gopher/
    C4-style rule filter. Weights are config; the operator contract is
    (doc_id, score, verdict[, *keep_cols]) with score in [0,1], all
    codegen.

    The verdict thresholds compare UNROUNDED doubles (the oracle does
    the same arithmetic — bitwise-identical, so the CASE branches
    agree); only the reported score is rounded.

    ``keep_cols`` carries named INPUT columns through the projection
    (the r12 logistic_score_relation pattern): the gate is a pure
    per-row projection, so a caller that needs the verdict alongside
    other columns should carry them here instead of joining the
    (id, score, verdict) relation back to the corpus — that join
    re-reads the corpus and shuffles it by id for nothing."""
    _check_keep_cols(keep_cols, ("doc_id", "score", "verdict"))
    df = _parallel(df)
    words = tokenize(F.col(text_col))
    n_tokens = F.size(words).cast("double")
    n_chars = F.length(F.col(text_col)).cast("double")
    n_punct = n_chars - F.length(F.translate(F.col(text_col), PUNCT, ""))
    n_stop = _count_in(words, LANG_MARKERS["en"]).cast("double")
    len_term = F.least(n_tokens / F.lit(200.0), F.lit(1.0))
    stop_term = F.least(n_stop / n_tokens * 4.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(n_punct / n_chars * 10.0, F.lit(1.0))
    score = len_term * 0.5 + stop_term * 0.3 + punct_term * 0.2
    verdict = (
        F.when(score >= 0.6, F.lit("keep"))
        .when(score >= 0.3, F.lit("review"))
        .otherwise(F.lit("drop"))
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.round(score, 5).alias("score"),
        verdict.alias("verdict"),
        *[F.col(c) for c in keep_cols],
    )


def content_fingerprint_col(text_col: str = "text") -> Column:
    """The content fingerprint as a COLUMN expression — a pure per-row
    projection, so callers that need the fingerprint alongside other
    columns attach it with ``withColumn`` instead of computing the
    (id, fingerprint) relation and joining it back (a corpus-sized
    1:1 self-join the r12 plan audit found in the incremental-dedup
    paths)."""
    norm = F.trim(
        F.regexp_replace(
            F.lower(F.translate(F.col(text_col), PUNCT, " " * len(PUNCT))),
            r"\s+",
            " ",
        )
    )
    return portable_hash60(norm)


def content_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Normalization-invariant content fingerprint: lowercase, strip
    punctuation, collapse whitespace, then a 60-bit portable hash —
    identical across engines (DuckDB:
    CAST('0x'||substr(md5(norm),1,15) AS BIGINT)). The cheap first
    pass before any fuzzy dedup."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        content_fingerprint_col(text_col).alias("fingerprint"),
    )


# PII patterns shared with the DuckDB oracle — both engines' regex
# dialects (Java / RE2) interpret these identically: no backrefs, no
# lookaround, ASCII word boundaries only.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{4}\b"


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """PII scrubbing for training corpora: count and mask emails, IPv4
    addresses, and short phone numbers. Counts are taken on the ORIGINAL
    text; masking is sequential email -> ip -> phone (the patterns are
    disjoint on well-formed text, so order only matters for pathological
    overlaps and is part of the contract). Returns
    (id, text, n_email, n_ip, n_phone[, *keep_cols]) — all codegen,
    zero shuffle. ``keep_cols`` carries named input columns through
    the projection (see quality_score) so composing pipelines chain
    per-row passes instead of joining them back on id."""
    _check_keep_cols(
        keep_cols, ("doc_id", text_col, "n_email", "n_ip", "n_phone")
    )
    t = F.col(text_col)
    red = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, PII_IPV4, "<IP>")
    red = F.regexp_replace(red, PII_PHONE, "<PHONE>")
    return df.select(
        F.col(id_col).alias("doc_id"),
        red.alias(text_col),
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("bigint").alias("n_email"),
        F.regexp_count(t, F.lit(PII_IPV4)).cast("bigint").alias("n_ip"),
        F.regexp_count(t, F.lit(PII_PHONE)).cast("bigint").alias("n_phone"),
        *[F.col(c) for c in keep_cols],
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition metrics (Rae et al. 2021 Table A1): the
    distinct-token ratio and the mass of the single most frequent bigram
    / the duplicate-bigram fraction. Docs with fewer than 2 tokens have
    no bigrams and are dropped (documented contract; real corpora gate
    on length first).

    Shape: ONE exchange total. Tokens are materialized with a single
    posexplode over an id-hash repartition and bigrams assembled with a
    lead() window — the same pattern as dedup._doc_shingles, which
    documents why the transform(sequence, i -> concat(words[i],
    words[i+1])) alternative is ~10x slower (HOF lambdas stay
    interpreted and re-evaluate the tokenize subtree per element).
    Every downstream groupBy / join is keyed by doc (or doc+bigram,
    which hash(doc) co-locates), so the window sort, both rollups, and
    the final join all reuse the one id-hash partitioning. Skew is
    bounded by a single document's bigram vocabulary, never the
    corpus."""
    from pyspark.sql.window import Window

    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    toks = df.repartition(n_part, F.col(id_col)).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("i", "w"),
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    toks = toks.select("doc_id", "w", F.lead("w", 1).over(w).alias("w2"))
    # 0-token docs vanish in the posexplode; 1-token docs are filtered —
    # same "no bigrams -> dropped" contract as before
    tok_stats = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.count_distinct("w").alias("_n_uniq"),
    ).where(F.col("n_tokens") >= 2)
    counts = (
        toks.where(F.col("w2").isNotNull())
        .groupBy("doc_id", F.concat_ws(" ", "w", "w2").alias("bigram"))
        .agg(F.count("*").alias("cnt"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.max("cnt").alias("_max_cnt"),
        F.sum("cnt").alias("_n_bigrams"),
        F.count("*").alias("_n_distinct"),
    )
    return tok_stats.join(per_doc, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.round(
            F.col("_n_uniq").cast("double") / F.col("n_tokens"), 5
        ).alias("uniq_token_ratio"),
        F.round(
            F.col("_max_cnt").cast("double") / F.col("_n_bigrams"), 5
        ).alias("top_bigram_frac"),
        F.round(
            F.lit(1.0)
            - F.col("_n_distinct").cast("double") / F.col("_n_bigrams"),
            5,
        ).alias("dup_bigram_frac"),
    )


def vocab_topn(df: DataFrame, text_col: str = "text", n: int = 100) -> DataFrame:
    """Corpus vocabulary / heavy hitters: top-n tokens by frequency with
    a deterministic (cnt DESC, word ASC) tie-break. The exact tier of a
    tokenizer-vocab build: explode -> partial-aggregated groupBy (one
    shuffle on the token) -> TakeOrderedAndProject, so the driver only
    ever sees n rows regardless of corpus size."""
    words = df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
    counts = words.groupBy("word").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    rank = F.row_number().over(
        Window.orderBy(F.col("cnt").desc(), F.col("word"))
    )
    return (
        counts.orderBy(F.col("cnt").desc(), "word")
        .limit(n)
        .select(rank.alias("rank"), "word", "cnt")
    )


def vocab_topn_sketch(
    df: DataFrame,
    text_col: str = "text",
    n: int = 100,
    max_tracked: int = 100_000,
) -> DataFrame:
    """Sketch tier of ``vocab_topn``: Spark 4's ``approx_top_k``
    aggregate — a single-pass, MERGEABLE frequent-items sketch (partial
    sketches combine associatively, so the 100 TB plan is partial
    sketches map-side + one tiny merge, no token-keyed shuffle of raw
    counts at all). Exact whenever distinct tokens <= ``max_tracked``
    (asserted against the exact tier in tests); results re-sorted
    (cnt DESC, word ASC) for a deterministic report."""
    words = df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
    sk = words.agg(
        F.expr(f"approx_top_k(word, {n}, {max_tracked})").alias("tk")
    )
    return (
        sk.select(F.explode("tk").alias("s"))
        .select(F.col("s.item").alias("word"), F.col("s.count").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
    )


def unigram_lm_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram language-model scoring — the perplexity-filter tier of
    CCNet/RedPajama-style curation with the n-gram KenLM swapped for a
    corpus unigram model (the operator shape is identical: token stream
    ⋈ broadcast model → per-doc mean NLL). For each document:
    xent = -mean ln p(w) with p(w) = corpus_count(w)/total_tokens, and
    ppl = exp(xent). Low-probability token mixes (OCR noise, code
    dumps, wrong-language fragments) surface as high perplexity.

    Shape: the token stream is ONE posexplode over an id-hash
    repartition; the model is a combiner-style groupBy(word) — shuffle
    bytes ~ vocabulary per partition, not corpus; the model (and the
    single-row total) join back via broadcast, so scoring is map-side
    and the per-doc aggregate reuses the id-hash layout (no driver
    action anywhere). At 100 TB cap the broadcast model at top-V words
    + an OOV floor probability — heavy-hitter vocab is MBs while the
    full tail is not; the fixture vocabulary is small enough to use
    whole."""
    from pyspark.sql.window import Window

    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    toks = df.repartition(n_part, F.col(id_col)).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("word"),
    )
    # the normalizing total rides ON the model relation via a global
    # window over the (vocabulary-sized) counts — one extra exchange of
    # the SMALL relation, instead of recomputing the corpus token
    # subtree for a single-row crossJoin (which also planned a
    # BroadcastNestedLoopJoin)
    model = (
        toks.groupBy("word")
        .agg(F.count("*").alias("_cnt"))
        .withColumn("_tot", F.sum("_cnt").over(Window.partitionBy()))
    )
    nll = -F.log(F.col("_cnt").cast("double") / F.col("_tot"))
    return (
        toks.join(F.broadcast(model), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(nll), 5).alias("xent"),
            F.round(F.exp(F.avg(nll)), 4).alias("ppl"),
        )
    )


def bpe_pair_stats(
    df: DataFrame, text_col: str = "text", top_n: int = 20
) -> DataFrame:
    """Round-1 BPE pair statistics (Sennrich et al. 2016): adjacent
    symbol-pair frequencies over the corpus WORD-FREQUENCY table, each
    word's characters plus a terminal '</w>' marker, weighted by word
    frequency. The top pair is the first merge rule a BPE tokenizer
    learns; bpe_train iterates this.

    Scale shape: BPE never touches the corpus after the word-frequency
    aggregate — the symbol table is VOCABULARY-sized. One corpus-keyed
    token shuffle builds word frequencies; chars explode off the (small)
    word table; the pair aggregate is combiner-style on the pair key.
    Returns (rnk, pair, cnt), rank by (cnt DESC, pair ASC)."""
    from pyspark.sql.window import Window

    wf = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    syms = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ),
        F.array(F.lit("</w>")),
    )
    chars = wf.select("word", "freq", F.posexplode(syms).alias("i", "sym"))
    w = Window.partitionBy("word").orderBy("i")
    pairs = chars.select(
        "freq",
        F.concat_ws(" ", "sym", F.lead("sym", 1).over(w)).alias("pair"),
        F.lead("sym", 1).over(w).alias("_nxt"),
    ).where(F.col("_nxt").isNotNull())
    pc = pairs.groupBy("pair").agg(F.sum("freq").alias("cnt"))
    rank = F.row_number().over(Window.orderBy(F.col("cnt").desc(), "pair"))
    return (
        pc.orderBy(F.col("cnt").desc(), "pair")
        .limit(top_n)
        .select(rank.cast("bigint").alias("rnk"), "pair", "cnt")
    )


def bpe_train(
    df: DataFrame, text_col: str = "text", n_merges: int = 10,
    batch_limit: int = 64, _stats: dict | None = None,
    mode: str = "auto", max_table_rows: int = 5_000_000,
) -> list[tuple[str, str]]:
    """Greedy BPE merge learning. ``mode`` picks the merge-loop tier:

    - ``"auto"`` (default): ONE distributed corpus pass builds the
      word-frequency table; if it fits ``max_table_rows`` (it does for
      every real tokenizer-training corpus — the table is VOCAB-sized,
      not corpus-sized), the inherently sequential merge loop runs
      in-process on the collected table (identical greedy order,
      measured 7-10x faster than the distributed loop on Zipf corpora
      — SCALE.md r11: the exact-tie batch path almost never fires on
      realistic word distributions, so the distributed loop degrades
      to ~1 merge/pass of scheduling floor). Oversized tables fall
      through to the distributed loop on the SAME word-frequency
      relation (no second corpus pass).
    - ``"local"``: delegate unconditionally; raise if the table
      exceeds ``max_table_rows`` (:func:`bpe_train_local`'s contract).
    - ``"distributed"``: the batched distributed loop below — the
      oracle/replay tier, and the only tier whose per-pass costs
      ``_stats`` records.

    Distributed tier: after the word-frequency aggregate every round
    works on the vocabulary-sized symbol table — pair-count aggregate,
    a BATCH of merge rules picked driver-side, then all of them
    applied across the word table in ONE Arrow-batched mapInPandas
    pass (per-word left-to-right walk — the correct Python boundary,
    since the table is vocab-sized, never corpus-sized). Returns the
    learned merge rules in order.

    Batched-yet-EXACT greedy: a pass accepts a CONTIGUOUS prefix of
    the top-count run in (cnt DESC, a, b) order, stopping at the first
    symbol conflict, count drop, or left-extension hazard. Exactness
    argument, per candidate pj given accepted p1..pk: applying an
    accepted merge (a,b)->ab only (1) decreases counts of pairs
    sharing its symbols — those stop the walk if they sort before pj;
    (2) creates RIGHT-extension pairs (x, ab), whose same-count
    witness (x, a) conflicts via ``a`` and satisfies
    (x, a) < (x, ab), so pj accepted before the witness implies
    pj < new pair; and (3) creates LEFT-extension pairs (ab, y),
    whose merged first component ab may sort BEFORE pj.a — the hazard
    check: for every accepted (a,b), if ab <= pj.a, the walk stops
    unless the full top-count run is visible and contains no witness
    pair (b, y) with (ab, y) <= pj (no witness at top count means no
    left-extension can reach the top count). A production 32k-merge
    vocab over a tie-rich corpus therefore needs k-fold fewer driver
    round-trips while emitting the exact sequential rule order; a
    tie-free corpus degrades gracefully to one merge per pass.

    Validated against the canonical low/lower/newest/widest example
    (Sennrich et al. 2016 §3.2) and a batching-specific fixture in
    tests."""
    if mode not in ("auto", "local", "distributed"):
        raise ValueError(f"bpe_train: unknown mode {mode!r}")
    wf = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    if mode in ("auto", "local"):
        rows = wf.limit(max_table_rows + 1).collect()
        if len(rows) <= max_table_rows:
            if _stats is not None:
                _stats["delegated"] = True
            return _bpe_merge_loop(
                [(r["freq"], tuple(r["word"]) + ("</w>",)) for r in rows],
                n_merges,
            )
        if mode == "local":
            raise ValueError(
                f"bpe_train(mode='local'): word-frequency table exceeds "
                f"max_table_rows={max_table_rows}; raise the cap or use "
                f"mode='auto'/'distributed'"
            )
        # auto + oversized vocab: run the distributed loop on the SAME
        # word-frequency relation (no second corpus pass)
    syms_col = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ),
        F.array(F.lit("</w>")),
    )
    table = wf.select("freq", syms_col.alias("syms")).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    if _stats is not None:
        _stats["passes"] = 0
    while len(merges) < n_merges:
        if _stats is not None:
            _stats["passes"] += 1
        pair_arr = F.transform(
            F.sequence(F.lit(0), F.size("syms") - 2),
            lambda i: F.struct(
                F.element_at("syms", i + 1).alias("a"),
                F.element_at("syms", i + 2).alias("b"),
            ),
        )
        counts = (
            table.where(F.size("syms") >= 2)
            .select("freq", F.explode(pair_arr).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top_rows = (
            counts.orderBy(F.col("cnt").desc(), "a", "b")
            .limit(batch_limit)
            .collect()
        )
        if not top_rows or top_rows[0]["cnt"] < 2:
            break
        top_cnt = top_rows[0]["cnt"]
        # the run is fully visible iff the fetch extends past it (or
        # the whole pair universe fit inside the fetch)
        run_complete = (
            top_rows[-1]["cnt"] < top_cnt or len(top_rows) < batch_limit
        )
        top_run = [
            (r["a"], r["b"]) for r in top_rows if r["cnt"] == top_cnt
        ]
        # strings every prior rule (and this batch) produced: if a
        # candidate's merged string m COLLIDES with one, symbol m may
        # already exist in the table, and applying the candidate then
        # BOOSTS pre-existing (x, m)/(m, y) pair counts — potentially
        # above top_cnt, where the new-pair hazard analysis below (which
        # bounds NEW pairs at <= top_cnt) does not apply. Strict BPE
        # character dynamics make the collision hard to reach (two
        # routes to the same string need disjoint surviving contexts),
        # but the guard is one set lookup: accept the colliding rule,
        # then end the pass so the next aggregate sees boosted counts.
        produced = {x + y for x, y in merges}
        batch: list[tuple[str, str]] = []
        used: set[str] = set()
        for a, b in top_run:
            if len(merges) + len(batch) >= n_merges:
                break
            if a in used or b in used:
                break  # stop, don't skip: contiguity is the exactness proof
            hazard = False
            for ma, mb in batch:
                m = ma + mb
                if m > a:
                    continue  # any (m, y) sorts after (a, b)
                if not run_complete or any(
                    qa == mb and (m, qb) <= (a, b) for qa, qb in top_run
                ):
                    hazard = True
                    break
            if hazard:
                break
            batch.append((a, b))
            used.update((a, b))
            if a + b in produced:
                break  # symbol-string collision: see comment above
            produced.add(a + b)
        merges.extend(batch)

        def apply_merges(batches, _rules=dict(((a, b), a + b) for a, b in batch)):
            import pandas as pd

            for pdf in batches:
                out = []
                for syms in pdf["syms"]:
                    res, i = [], 0
                    while i < len(syms):
                        if (
                            i + 1 < len(syms)
                            and (syms[i], syms[i + 1]) in _rules
                        ):
                            res.append(_rules[(syms[i], syms[i + 1])])
                            i += 2
                        else:
                            res.append(syms[i])
                            i += 1
                    out.append(res)
                yield pd.DataFrame({"freq": pdf["freq"], "syms": out})

        table = table.mapInPandas(
            apply_merges, schema="freq bigint, syms array<string>"
        ).localCheckpoint(eager=True)
    return merges


def bpe_train_local(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    max_table_rows: int = 5_000_000,
) -> list[tuple[str, str]]:
    """Driver-side merge-loop tier of :func:`bpe_train` — the SCALE
    path for realistic vocabularies. The r11 probe (SCALE.md: 1M docs,
    30k distinct words, 500 merges) measured the distributed loop at
    424.8 s (498 driver passes — the exact-tie batch path almost never
    fires on a Zipf corpus, so it degrades to ~1 merge/pass of pure
    per-pass scheduling) against 58.6 s for the IDENTICAL sequential
    loop run in-process: 7.2x. The asymmetry is structural: BPE's
    merge loop iterates a table that is VOCAB-sized (distinct words),
    not corpus-sized — after the ONE distributed pass that matters
    (the word-frequency aggregate over the 100 TB corpus), the right
    place for an inherently sequential loop over a few-MB table is a
    single process, not 500 distributed jobs. Greedy order, tie
    breaking (cnt DESC, then (a, b) ascending), and the learned rule
    sequence are identical to bpe_train by construction (probe: 500/500
    merges equal; pinned by tests/test_round11.py on the tie-rich
    batching fixture).

    ``max_table_rows`` guards the collect (the action-lint contract:
    the word-frequency relation is vocabulary-sized by BPE's word
    model — GPT-2-scale training collects exactly this table — but a
    caller feeding byte-garbage could blow it up; raise rather than
    OOM the driver)."""
    wf = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    rows = wf.limit(max_table_rows + 1).collect()
    if len(rows) > max_table_rows:
        raise ValueError(
            f"bpe_train_local: word-frequency table exceeds "
            f"max_table_rows={max_table_rows}; raise the cap or use "
            f"the distributed bpe_train"
        )
    return _bpe_merge_loop(
        [(r["freq"], tuple(r["word"]) + ("</w>",)) for r in rows], n_merges
    )


def _bpe_merge_loop(
    table: list[tuple[int, tuple[str, ...]]], n_merges: int
) -> list[tuple[str, str]]:
    """The sequential greedy merge loop over a collected
    (freq, symbols) word table — shared by :func:`bpe_train_local` and
    :func:`bpe_train`'s auto-delegation. Greedy order and
    (cnt DESC, a, b) tie-breaking identical to the distributed loop
    (pinned by tests/test_round11.py)."""
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        counts: dict[tuple[str, str], int] = {}
        for freq, syms in table:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((a, b))
        ab = a + b
        new_table = []
        for freq, syms in table:
            res: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(ab)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_table.append((freq, tuple(res)))
        table = new_table
    return merges


def dedup_lines(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4-style intra-document repeated-line removal: keep the FIRST
    occurrence of every exact line, preserving original line order
    (Raffel et al. 2020 §2.2 deduplicate-three-sentence-spans, applied
    at line granularity). Returns (id, text, n_kept).

    Shape: posexplode -> min(pos) per (doc, line) -> re-assemble sorted
    by pos. Two shuffles, both keyed by doc id (+line), so work stays
    proportional to corpus size; the collect_list is per-document (a
    document's own lines), never a global aggregation."""
    ls = F.split(F.col(text_col), "\n")
    lines = df.select(id_col, F.posexplode(ls).alias("pos", "line"))
    firsts = lines.groupBy(id_col, "line").agg(F.min("pos").alias("pos"))
    return firsts.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias(text_col),
        F.count("*").alias("n_kept"),
    )


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-document top-k TF-IDF keywords — the classic keyword /
    topic-proxy extraction for corpus exploration and quality routing.
    score = tf * ln(N / df); rank per doc by (score DESC, word ASC).

    Shape: one id-hash repartition feeds the (doc, word) tf aggregate
    (partial map-side); document frequency is a second aggregate keyed
    by word; the tf ⋈ df join shuffles on the word — all aggregates are
    combiner-style, so skew is bounded by a single term's document
    frequency. The corpus size N arrives via a broadcast single-row
    crossJoin, never a driver action. At 100 TB the df relation is
    vocabulary-sized — orders smaller than the corpus."""
    from pyspark.sql.window import Window

    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    toks = df.repartition(n_part, F.col(id_col)).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("word"),
    )
    # tf feeds the document-frequency aggregate AND the scoring join —
    # without a cut the corpus tokenize+explode+aggregate runs twice
    # (r12 plan audit). Size bound: tf is (doc, term-TYPE)-sized —
    # ≤ tokens but typically 2-5x smaller (Heaps' law; 2.6x on the
    # fixture corpus) — and it sits POST-aggregation, so the cut
    # stores counted rows, never the raw token stream. Still
    # corpus-proportional: spark.remap.lineageCut=off restores full
    # lineage at the price of a second tokenize pass (lineage_cut).
    tf = lineage_cut(
        toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("word").agg(F.count("*").alias("dfc"))
    ndocs = df.select(F.count("*").alias("_nd"))
    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "score",
            F.col("tf") * F.log(F.col("_nd").cast("double") / F.col("dfc")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("word")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "word", F.round("score", 5).alias("score"))
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
) -> DataFrame:
    """BM25 relevance of every document against a bag-of-terms query —
    the standard retrieval scorer for mining a corpus for documents
    about a topic (seed selection, decontamination triage, quality
    routing). score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b +
    b·len_d/avgdl)), idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
    Returns the topk (rank, doc_id, score) rows ordered by the ROUNDED
    score then doc_id, so the ordering is reproducible cross-engine.

    Shape: doc lengths come from the full token stream's per-doc
    aggregate; tf is computed ONLY for the query terms (the filter is
    applied before the aggregate, so the shuffled tf relation is
    |terms|-bounded per doc); df and the (N, avgdl) constants ride in
    as broadcast relations (term-count-sized and single-row — never a
    driver action). The global top-k is a TakeOrdered, not a full
    sort. At 100 TB the only corpus-sized shuffle is the per-doc
    length aggregate, which is combiner-style."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("word"),
    )
    # NOTE (r12): the audit flagged toks re-executing once per
    # consumer (lens x2 via consts+join, tf x2 via dfreq+scorer).
    # Lazy cuts on lens and/or tf were A/B'd and REVERTED: both
    # variants cost a consistent +0.1-0.25 s (~15-25%, 8/8 interleaved
    # rounds) at fixture scale — each re-execution is a column-pruned
    # parquet scan + codegen-fused filter/aggregate (the tf leg's term
    # filter pushes to the scan), which beats materializing an RDD and
    # losing the fusion. The uncut form's extra passes are scan-pruned
    # and combiner-style, so they stay cheap at any scale.
    lens = toks.groupBy("doc_id").agg(F.count("*").alias("dlen"))
    tf = (
        toks.where(F.col("word").isin(query_terms))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("word").agg(F.count("*").alias("dfc"))
    consts = lens.agg(
        F.count("*").alias("_nd"), F.avg("dlen").alias("_avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_nd") - F.col("dfc") + 0.5) / (F.col("dfc") + 0.5)
    )
    norm = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dlen") / F.col("_avgdl")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "word")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(consts))
        .withColumn("_s", idf * F.col("tf") * (k1 + 1.0) / norm)
        .groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 5).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(topk)
        .select("doc_id", "score")
    )


def boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
) -> DataFrame:
    """Cross-document boilerplate detection (C4-style): lines that occur
    in at least ``min_docs`` DISTINCT documents — license headers,
    navigation chrome, cookie banners. Returns (line, n_docs).

    Shape: posexplode lines -> distinct (doc, line) -> one aggregate
    keyed by the line. The distinct and the count share the line-hash
    shuffle; the result is tiny (only lines crossing the threshold), so
    the typical consumer broadcasts it back for an anti-join strip
    (see strip_boilerplate)."""
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).distinct()
    return (
        lines.groupBy("line")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .orderBy("line")
    )


def strip_boilerplate(
    df: DataFrame,
    hot_lines: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove the detected boilerplate lines from every document,
    preserving the order of surviving lines. ``hot_lines`` is the
    (small) output of boilerplate_lines — broadcast, so the strip is
    one narrow pass + per-doc reassembly keyed by doc id."""
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    kept = lines.join(
        F.broadcast(hot_lines.select("line")), "line", "left_anti"
    )
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias(text_col),
        F.count("*").alias("n_kept"),
    )


# cleaning patterns shared with the DuckDB oracle (no backrefs /
# lookaround — identical under Java regex and RE2)
CLEAN_TAG = "<[^>]*>"
CLEAN_CTRL = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"


def clean_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Ingest-time text normalization: strip HTML/XML tags, drop control
    characters (keeping \\t \\n \\r), collapse runs of spaces/tabs, trim.
    Returns (doc_id, text, n_tags, n_ctrl) — counts taken on the
    ORIGINAL text so the cleaning is auditable. Pure codegen
    projections, zero shuffle, order-preserving."""
    t = F.col(text_col)
    cleaned = F.regexp_replace(t, CLEAN_TAG, " ")
    cleaned = F.regexp_replace(cleaned, CLEAN_CTRL, "")
    cleaned = F.trim(F.regexp_replace(cleaned, "[ \\t]+", " "))
    return df.select(
        F.col(id_col).alias("doc_id"),
        cleaned.alias(text_col),
        F.regexp_count(t, F.lit(CLEAN_TAG)).cast("bigint").alias("n_tags"),
        F.regexp_count(t, F.lit(CLEAN_CTRL)).cast("bigint").alias("n_ctrl"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 512,
    overlap: int = 128,
) -> DataFrame:
    """Split each document's token stream into overlapping chunks —
    context-window preparation for training / retrieval indexing.
    Chunk k covers token ordinals [k*step, k*step + chunk_size) with
    step = chunk_size - overlap; the last chunk may be short but never
    consists of overlap alone (n_chunks = ceil(max(n - overlap, 1) /
    step)). Returns (doc_id, chunk_id, n_tokens, text).

    Shape: one narrow projection materializes the token array, one
    generator explodes chunk ids, and `slice` + `array_join` assemble
    each chunk — slice is a codegen collection function, not an
    interpreted lambda, and the token array is evaluated once per doc
    row (not per chunk-element as a transform() formulation would).
    Zero shuffle: chunking is embarrassingly parallel per document;
    at 100 TB the only cost above the scan is the overlap-factor
    output inflation, which is the contract."""
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    step = chunk_size - overlap
    base = df.select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("_w")
    ).withColumn("_n", F.size("_w")).where(F.col("_n") > 0)
    n_chunks = F.floor(
        (F.greatest(F.col("_n") - overlap, F.lit(1)) + F.lit(step - 1))
        / F.lit(float(step))
    ).cast("int")
    chunks = base.select(
        "doc_id",
        "_w",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("_p", "chunk_id"),
    )
    piece = F.slice(F.col("_w"), F.col("chunk_id") * step + 1, chunk_size)
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias(text_col),
    )


def normalize_url(col: Column | str) -> Column:
    """URL canonicalization — the FIRST dedup pass of a crawl pipeline
    (URL-level, before any content hashing; dedups the ~30-50% of
    crawl frontier entries that are the same page under a different
    spelling). Lowercases scheme+authority, strips the fragment,
    default ports (:80/:443), utm_* tracking params, and a trailing
    slash. A chain of codegen regexp_replaces: zero shuffle, linear.
    Patterns avoid lookaround so they behave identically under Java
    regex and RE2."""
    c = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(c, "#.*$", "")  # fragment
    # lowercase scheme://authority only (path/query stay case-sensitive)
    head = F.lower(F.regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", 0))
    tail = F.regexp_replace(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", "")
    u = F.when(head == "", u).otherwise(F.concat(head, tail))
    u = F.regexp_replace(u, ":80(/|\\?|$)", "$1")  # default http port
    u = F.regexp_replace(u, ":443(/|\\?|$)", "$1")  # default https port
    # tracking params: a leading run of utm_* params hands '?' to the
    # first survivor; interior/trailing utm_* drop with their '&'
    u = F.regexp_replace(u, "\\?utm_[^&]*(&utm_[^&]*)*&", "?")
    u = F.regexp_replace(u, "\\?utm_[^&]*(&utm_[^&]*)*$", "")
    u = F.regexp_replace(u, "&utm_[^&]*", "")
    u = F.regexp_replace(u, "(.)/(\\?|$)", "$1$2")  # trailing slash (not root)
    return u


def url_host(col: Column | str) -> Column:
    """Host (authority minus userinfo/port) of a URL, lowercased — the
    scope key of per-site curation policies (per-host paragraph dedup,
    per-domain caps). Scheme-less inputs yield '' (callers decide the
    policy for them; dedup_paragraphs_per_host documents its own).
    Pure codegen regexp, no lookaround (Java-regex/RE2 portable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(
        F.regexp_extract(
            c, "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1
        )
    )


def url_duplicates(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup: group by the canonical URL, keep the min-id
    survivor — same contract as exact_duplicates but on the address,
    which is orders cheaper than content hashing (no text read). One
    shuffle on the (short) canonical URL."""
    return (
        df.groupBy(normalize_url(url_col).alias("canonical_url"))
        .agg(F.count("*").alias("cnt"), F.min(id_col).alias("keep_id"))
        .where(F.col("cnt") > 1)
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_model_bigrams: int | None = None,
) -> DataFrame:
    """Bigram language-model scoring with add-one smoothing — one rung
    up the CCNet/KenLM ladder from unigram_lm_scores: documents whose
    token PAIRS are improbable (shuffled text, keyword stuffing,
    boilerplate soup) score high even when their unigram mix looks
    normal. For each document with >= 2 tokens:
    xent = -mean ln p(w2|w1), p(w2|w1) = (c(w1,w2)+1) / (ctx(w1)+V),
    ctx(w1) = bigram occurrences anchored at w1, V = corpus distinct
    unigrams; ppl = exp(xent).

    Shape: the token stream is one posexplode over an id-hash
    repartition; bigrams come from a lead() window INSIDE that same
    doc-keyed layout (no extra exchange); the bigram model and its
    context marginal are combiner-style aggregates whose shuffle
    volume is model-sized, not corpus-sized; V rides in as a
    broadcast single-row relation (same idiom as bm25_topk's consts).
    Join strategy for the model is SIZE-AWARE: with
    ``max_model_bigrams`` set, the model is truncated to the top-M
    most frequent bigrams (out-of-model pairs fall back to the
    add-one floor c=0 via the left join) and the now-bounded relation
    is broadcast; with no cap the model is vocabulary-pair-sized and
    the joins are left to AQE — a forced broadcast of an uncapped
    web-corpus model would OOM the driver. ``max_model_bigrams`` is
    the 100 TB path; the aggregates never materialize on the
    driver either way."""
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # id-hash repartition: spreads a few-split parquet scan AND is the
    # ONE exchange all consumers below reuse (its map side — including
    # tokenize — runs once). Bigrams then come straight off the token
    # array via arrays_zip(arr, slice(arr, 2, len)) (r12 optimization):
    # ordinary collection expressions evaluated once per row — the
    # former lead() window paid a per-consumer sort of the whole token
    # stream (model/ctx/probe each re-sorted it after the reused
    # exchange). Pair stream and per-doc row order (= array order) are
    # identical, so every aggregate replays bit-for-bit.
    arr = df.repartition(n_part, F.col(id_col)).select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("_arr")
    )
    toks = arr.select("doc_id", F.explode("_arr").alias("w1"))
    bigrams = (
        arr.select(
            "doc_id",
            F.explode(
                F.arrays_zip(F.col("_arr"), F.slice("_arr", 2, F.size("_arr")))
            ).alias("_t"),
        )
        .select(
            "doc_id",
            F.col("_t").getField("_arr").alias("w1"),
            F.col("_t").getField("1").alias("w2"),
        )
        .where(F.col("w2").isNotNull())
    )
    # lazy cut: model/ctx/probe consumers read the materialized bigram
    # rows instead of re-running tokenize+zip+explode each. Size bound:
    # exactly tokens-1 narrow (doc, w1, w2) rows per doc — the cut is
    # token-stream-sized, i.e. corpus-proportional; the re-execution it
    # removes is one full tokenize+explode pass PER CONSUMER (3 here).
    # spark.remap.lineageCut=off opts out on fault-sensitive clusters.
    bigrams = lineage_cut(bigrams)
    model = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("_c12"))
    if max_model_bigrams is not None:
        # deterministic top-M truncation (count desc, pair asc ties);
        # the resulting relation is bounded by M, safe to broadcast
        model = F.broadcast(
            model.orderBy(F.col("_c12").desc(), "w1", "w2").limit(
                max_model_bigrams
            )
        )
    ctx = bigrams.groupBy("w1").agg(F.count("*").alias("_c1"))
    vocab = toks.agg(F.countDistinct("w1").alias("_v"))
    nll = -F.log(
        (F.col("_c12") + 1).cast("double") / (F.col("_c1") + F.col("_v"))
    )
    return (
        bigrams.join(model, ["w1", "w2"], "left")
        # out-of-model pairs (possible only under the top-M cap) take
        # the add-one smoothing floor c(w1,w2) = 0
        .withColumn("_c12", F.coalesce(F.col("_c12"), F.lit(0)))
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(nll), 5).alias("xent"),
            F.round(F.exp(F.avg(nll)), 4).alias("ppl"),
        )
    )


def trigram_backoff_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    max_model_trigrams: int | None = None,
    max_model_bigrams: int | None = None,
) -> DataFrame:
    """Trigram Stupid Backoff scoring (Brants et al. 2007) — the next
    rung of the CCNet ladder above bigram_lm_scores: each token is
    scored by its trigram relative frequency when the trigram is in
    the model, backing off to alpha x the bigram score, then to
    alpha² x the unigram frequency. With UNCAPPED models every
    corpus trigram is its own evidence (score = c3/c2, no backoff);
    the production shape caps the trigram and bigram models at top-M
    (deterministic count-desc, ngram-asc ties), which is where Stupid
    Backoff earns its keep — rare trigrams fall back to denser
    statistics instead of carrying vocabulary³-sized state. Returns
    (doc_id, n_trigrams, score_log_mean, ppl_proxy) with the log-mean
    rounded to 5 decimals for engine parity.

    Shape: the token stream is one posexplode over an id-hash
    repartition; trigrams/bigrams come from lead() windows INSIDE
    that layout (no extra exchange); the five model relations are
    combiner aggregates whose shuffle is model-sized; capped models
    broadcast (bounded by M), uncapped joins are AQE's call; corpus
    totals ride as a single-row broadcast. Nothing touches the
    driver."""
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # Same r12 shape as bigram_lm_scores: ONE id-hash exchange whose
    # map side tokenizes once, trigrams from arrays_zip(arr, slice+1,
    # slice+2) instead of two lead() windows — the SEVEN consumers
    # below (m3/ctx3/m2/ctx2/uni/tot/probe) each re-ran the window
    # sort over the full token stream; the zip/explode they now re-run
    # is a once-per-row collection expression. Trigram stream and
    # per-doc row order are identical (null-padded tails dropped by
    # the same w2/w3 non-null filter).
    arr = df.repartition(n_part, F.col(id_col)).select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("_arr")
    )
    tri = (
        arr.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.col("_arr"),
                    F.slice("_arr", 2, F.size("_arr")),
                    F.slice("_arr", 3, F.size("_arr")),
                )
            ).alias("_t"),
        )
        .select(
            "doc_id",
            F.col("_t").getField("_arr").alias("w1"),
            F.col("_t").getField("1").alias("w2"),
            F.col("_t").getField("2").alias("w3"),
        )
        .where(F.col("w2").isNotNull() & F.col("w3").isNotNull())
    )
    # lazy cut: the seven consumers read the materialized trigram rows
    # instead of re-running tokenize+zip+explode each. Size bound:
    # tokens-2 narrow rows per doc (token-stream-sized, corpus-
    # proportional); the cut trades that executor-local footprint for
    # SEVEN avoided tokenize passes. spark.remap.lineageCut=off opts
    # out on fault-sensitive clusters (lineage_cut).
    tri = lineage_cut(tri)

    m3 = tri.groupBy("w1", "w2", "w3").agg(F.count("*").alias("_c3"))
    if max_model_trigrams is not None:
        m3 = F.broadcast(
            m3.orderBy(F.col("_c3").desc(), "w1", "w2", "w3").limit(
                max_model_trigrams
            )
        )
    ctx3 = tri.groupBy("w1", "w2").agg(F.count("*").alias("_cx3"))
    m2 = tri.groupBy("w2", "w3").agg(F.count("*").alias("_c2"))
    if max_model_bigrams is not None:
        m2 = F.broadcast(
            m2.orderBy(F.col("_c2").desc(), "w2", "w3").limit(
                max_model_bigrams
            )
        )
    ctx2 = tri.groupBy("w2").agg(F.count("*").alias("_cx2"))
    uni = tri.groupBy("w3").agg(F.count("*").alias("_c1"))
    tot = tri.agg(F.count("*").alias("_n"))

    score = (
        F.when(
            F.col("_c3").isNotNull(),
            F.col("_c3").cast("double") / F.col("_cx3"),
        )
        .when(
            F.col("_c2").isNotNull(),
            F.lit(alpha) * F.col("_c2") / F.col("_cx2"),
        )
        .otherwise(
            F.lit(alpha * alpha)
            * F.coalesce(F.col("_c1"), F.lit(0))
            / F.col("_n")
        )
    )
    logmean = F.avg(F.log(score))
    return (
        tri.join(m3, ["w1", "w2", "w3"], "left")
        .join(ctx3, ["w1", "w2"])
        .join(m2, ["w2", "w3"], "left")
        .join(ctx2, "w2")
        .join(uni, "w3", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_trigrams"),
            F.round(logmean, 5).alias("score_log_mean"),
            F.round(F.exp(-logmean), 4).alias("ppl_proxy"),
        )
    )


def build_inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_freq: int = 1,
) -> DataFrame:
    """Inverted index over the reference wordcount tokenization
    (functions.tokenize): one row per term with document frequency,
    collection frequency, and ALIGNED postings arrays ``doc_ids`` /
    ``term_freqs`` sorted by document id — the retrieval-side data
    structure BM25 scoring walks (aligned scalar arrays, not structs,
    so any engine's list aggregate replays them).

    Scale shape: explode -> ONE combiner groupBy (term, doc) for term
    frequencies -> ONE groupBy (term) collecting the postings. The
    collect_list is per-term state: heavy stopword terms concentrate
    postings on single reducers — cap them away with ``min_doc_freq``'s
    dual (a max_doc_freq stopword filter upstream) or the vocab
    heavy-hitter report in this module before indexing a web corpus.
    """
    from ..functions import tokenize

    tf = (
        docs.select(
            F.col(id_col).alias("_doc"),
            F.explode(tokenize(text_col)).alias("term"),
        )
        .groupBy("term", "_doc")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    posting = F.array_sort(
        F.collect_list(F.struct(F.col("_doc"), F.col("_tf")))
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sum("_tf").alias("coll_freq"),
            posting.alias("_p"),
        )
        .where(F.col("doc_freq") >= min_doc_freq)
        .select(
            "term",
            "doc_freq",
            "coll_freq",
            F.transform("_p", lambda x: x["_doc"]).alias("doc_ids"),
            F.transform("_p", lambda x: x["_tf"]).alias("term_freqs"),
        )
    )


def _encode_word(syms: list[str], ranks: dict[tuple[str, str], int]) -> list[str]:
    """Sequential BPE encode of one symbol list: repeatedly merge the
    LOWEST-RANK adjacent pair present (canonical tokenizer semantics —
    identical to replaying the training merges in order)."""
    while len(syms) >= 2:
        best, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_i = r, i
        if best is None:
            break
        merged = syms[best_i] + syms[best_i + 1]
        # merge ALL occurrences of this pair left-to-right before
        # re-scanning (one rule application, as training does)
        pair = (syms[best_i], syms[best_i + 1])
        res, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                res.append(merged)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "tokens",
) -> DataFrame:
    """Encode documents with a trained BPE merge list (the list
    bpe_train returns): per document, tokenize (the same
    lower/strip-punct/split the trainer used), split each word into
    characters + '</w>', replay the merges by rank, and emit the
    document's token sequence in order plus ``n_tokens`` — the apply
    side of the tokenizer, producing the sequences a packing/export
    stage consumes.

    Scale shape — Python touches only the VOCABULARY, never the
    corpus (the bpe_train boundary argument): words explode
    corpus-side (codegen), the DISTINCT word table is encoded in one
    Arrow-batched mapInPandas (merge ranks ride the closure,
    vocab-sized), and tokens rejoin on the word key — AQE broadcasts
    the encoded vocab when it is small, shuffle-joins otherwise. Doc
    reassembly is one doc-keyed combiner aggregate with an in-plan
    (pos, tokens) array_sort + flatten, so token order is exact and
    nothing corpus-sized crosses a Python boundary.
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    words = df.select(
        F.col(id_col),
        F.posexplode(tokenize(F.col(text_col))).alias("_pos", "_word"),
    )
    vocab = words.select(F.col("_word").alias("word")).distinct()

    def encode(batches, _ranks=ranks):
        import pandas as pd

        for pdf in batches:
            toks = [
                _encode_word(list(w) + ["</w>"], _ranks)
                for w in pdf["word"]
            ]
            yield pd.DataFrame({"word": pdf["word"], "_toks": toks})

    encoded = vocab.mapInPandas(
        encode, schema="word string, _toks array<string>"
    )
    joined = words.join(
        encoded, words["_word"] == encoded["word"], "inner"
    ).select(id_col, "_pos", "_toks")
    return (
        joined.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_pos", "_toks"))
            ).alias("_seq")
        )
        .select(
            id_col,
            F.flatten(F.expr("transform(_seq, s -> s._toks)")).alias(
                out_col
            ),
        )
        .withColumn("n_tokens", F.size(out_col).cast("bigint"))
    )


RAKE_STOPWORDS: list[str] = [
    "the", "a", "an", "and", "of", "to", "is", "in", "on", "at",
    "for", "with", "as", "by", "be", "are", "was", "it", "that",
    "this",
]


def rake_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: list[str] | None = None,
    top_n: int = 20,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal runs of non-stopword tokens; each word scores
    degree/frequency where frequency counts the word's occurrences in
    candidate phrases and degree sums the lengths of the phrases it
    occurs in (self-co-occurrence included, the paper's convention);
    a phrase scores the sum of its words' scores, per occurrence.
    Scoring is ppm-INTEGER (score_ppm = degree * 1e6 div freq, summed
    exactly) so the replay oracle reproduces it bit-for-bit — the
    engine-wide exactness convention (modularity/seasonal).

    Returns the corpus-level top ``top_n``:
    (phrase, score_ppm, n_occurrences), ordered by score then phrase
    (a TOTAL order, so the cut at top_n is deterministic).

    Shape: one posexplode + one doc-keyed window for the phrase
    islands (single shuffle; the phrase-length count window over
    (doc, _grp) piggybacks on the same hash partitioning — doc alone
    already co-locates every (doc, _grp) group, so Spark adds only a
    local sort, no second Exchange and no plen join), two
    vocabulary-sized word aggregates, word-score joins left to AQE —
    NOT force-broadcast, the bigram-LM lesson: vocabulary-sized
    relations only broadcast when a cap bounds them — then one phrase
    aggregate and a TakeOrdered top-k. No Python in the plan at any
    point. The word-phrase stream is cut once with a lazy
    localCheckpoint (the trigram-LM lesson): its two consumers (word
    scores, phrase assembly) read the materialized rows instead of
    re-running tokenize + explode + both windows each."""
    from pyspark.sql.window import Window

    sw = stopwords if stopwords is not None else RAKE_STOPWORDS
    sw_arr = F.array(*[F.lit(w) for w in sw])
    df = _parallel(df)
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokenize(F.col(text_col))).alias("i", "w"),
    )
    win = Window.partitionBy("doc").orderBy("i")
    content = toks.where(~F.array_contains(sw_arr, F.col("w"))).withColumn(
        "_grp", F.col("i") - F.row_number().over(win)
    )
    # Size bound: wp is the CONTENT-token stream (stopword rows already
    # dropped — ~40-60% of tokens on English-like text) with two int
    # columns added; corpus-proportional, traded for re-running
    # tokenize + both windows once per consumer (2 here).
    # spark.remap.lineageCut=off opts out (lineage_cut).
    wp = lineage_cut(
        content.withColumn(
            "_plen", F.count("*").over(Window.partitionBy("doc", "_grp"))
        )
    )
    wscore = (
        wp.groupBy("w")
        .agg(F.count("*").alias("_freq"), F.sum("_plen").alias("_deg"))
        .select(
            "w",
            F.expr(
                "CAST((_deg * CAST(1000000 AS BIGINT)) div _freq AS BIGINT)"
            ).alias("_wscore"),
        )
    )
    phrases = (
        wp.join(wscore, "w")
        .groupBy("doc", "_grp")
        .agg(
            F.sum("_wscore").alias("score_ppm"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "w"))),
                    lambda x: x["w"],
                ),
            ).alias("phrase"),
        )
    )
    return (
        phrases.groupBy("phrase")
        .agg(
            # identical phrases have identical word multisets, hence
            # identical scores — max is just the deterministic pick
            F.max("score_ppm").alias("score_ppm"),
            F.count("*").alias("n_occurrences"),
        )
        .orderBy(F.desc("score_ppm"), "phrase")
        .limit(top_n)
    )


def phrase_search(
    docs: DataFrame,
    phrases: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positional phrase search: exact n-word phrase matching over the
    engine's standard tokenization (functions.tokenize) — the query
    side of a POSITIONAL inverted index, answering "which documents
    contain this exact word sequence, and how many times".

    Single-shuffle shape instead of the textbook (n-1)-way postings
    self-join: each phrase is unrolled driver-side into a tiny
    (phrase, offset, word) relation — query-sized, never data-sized —
    broadcast against the positional postings filtered to the phrase
    vocabulary (the ``word IN (...)`` filter lands right after the
    tokenizer, so the big relation collapses before any shuffle). A
    token at position p matching offset o anchors candidate start
    p - o; a start where the count of DISTINCT matched offsets equals
    the phrase length is a full match (a repeated word in the phrase
    matches several offsets of the same anchor — distinct-offsets, not
    row counts, is what makes that correct). ONE groupBy (doc, phrase,
    anchor) + ONE combiner rollup to (phrase, doc) ends it.

    Returns (phrase, doc_id, n_matches) with one row per document that
    contains the phrase at least once, ordered by phrase then doc.
    """
    spark = docs.sparkSession
    # the query phrase goes through the SAME lower/strip-punct/split
    # as the corpus tokenizer, so punctuation in a phrase matches the
    # punctuation-stripped postings instead of silently missing
    punct_tbl = str.maketrans(PUNCT, " " * len(PUNCT))
    rows = []
    for ph in phrases:
        ws = [w for w in ph.lower().translate(punct_tbl).split() if w]
        for off, w in enumerate(ws):
            rows.append((ph, off, w, len(ws)))
    terms = spark.createDataFrame(
        rows, "phrase string, off int, word string, plen int"
    )
    vocab = sorted({r[2] for r in rows})
    postings = docs.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(tokenize(text_col)).alias("pos", "word"),
    ).where(F.col("word").isin(vocab))
    anchored = postings.join(F.broadcast(terms), "word").select(
        "_doc",
        "phrase",
        "plen",
        (F.col("pos") - F.col("off")).alias("anchor"),
        "off",
    )
    full = (
        anchored.groupBy("_doc", "phrase", "plen", "anchor")
        .agg(F.count_distinct("off").alias("_k"))
        .where(F.col("_k") == F.col("plen"))
    )
    return (
        full.groupBy("phrase", F.col("_doc").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .orderBy("phrase", "doc_id")
    )


def textrank_keywords(
    docs: DataFrame,
    window: int = 2,
    damping_ppm: int = 850_000,
    iters: int = 8,
    top_k: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): build the
    word co-occurrence graph (an undirected edge between every pair of
    words within ``window`` positions, weighted by corpus co-occurrence
    count) and rank words with the weighted PageRank recurrence

        WS(v) = (1-d) + d * sum_{u in adj(v)} w(u,v)/wdeg(u) * WS(u)

    run for a FIXED ``iters`` power iterations in exact ppm integer
    arithmetic — every contribution is ``score * w div wdeg`` and the
    damping fold is ``(sum * d_ppm) div 1e6``, all positive, so
    truncating and flooring division agree and a SQL replay (recursive
    CTE, the _hits_oracle pattern) reproduces the scores bit-for-bit.

    Scale shape: one posexplode + a self-join bounded to ``window``
    offsets builds the edge multiset with ONE combiner groupBy; the
    graph is VOCABULARY-sized (the module's standard Python-free
    boundary — a web corpus's co-occurrence graph is ~1e6 nodes, an
    executor-trivial relation however big the corpus). Each iteration
    is one equi-join + one combiner groupBy on the vocab-sized graph —
    no normalizer broadcast needed (TextRank's recurrence is local),
    no driver action in the loop. Returns the ``top_k`` (word,
    score_ppm) rows, score desc then word.
    """
    # Window pairs straight off the token ARRAY (r12 optimization):
    # arrays_zip(arr, slice(arr, 1+o, len)) aligns each token with its
    # o-ahead neighbor (shorter slices null-pad), so one explode emits
    # exactly the O(L*window) in-window pairs. The former token-stream
    # self-join banded on (pos2 - pos <= window) was an equi-join on
    # doc_id alone — it enumerated O(L^2) candidate rows per document
    # before the band filter (guide §3: exploding join). arrays_zip and
    # slice are ordinary collection expressions (evaluated once per
    # row, never per element — the HOF-lambda trap _doc_shingles
    # documents), and the pair multiset is identical by construction
    # (verified exceptAll-empty both ways at sf0.1).
    arr = docs.select(
        F.col(id_col).alias("_doc"), tokenize(F.col(text_col)).alias("_arr")
    )
    zipped = arr.select(
        "_doc",
        F.explode(
            F.arrays_zip(
                F.col("_arr"),
                *[
                    F.slice("_arr", 1 + o, F.size("_arr"))
                    for o in range(1, window + 1)
                ],
            )
        ).alias("_t"),
    )
    # arrays_zip names non-attribute fields positionally: "1".."window"
    pairs = zipped.select(
        "_doc",
        F.col("_t").getField("_arr").alias("word"),
        F.explode(
            F.array(*[F.col("_t").getField(str(o)) for o in range(1, window + 1)])
        ).alias("word2"),
    ).where(F.col("word2").isNotNull() & (F.col("word") != F.col("word2")))
    edges = (
        pairs.select(
            F.least("word", "word2").alias("a"),
            F.greatest("word", "word2").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # undirected adjacency: both directions, then the weighted degree
    adj = edges.select("a", "b", "w").unionByName(
        edges.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "w"
        )
    )
    # Size bounds: adj is the AGGREGATED co-occurrence pair relation
    # (≤ distinct in-window word pairs — vocabulary²-bounded, in
    # practice orders below the token stream it summarizes); nodes is
    # vocabulary-sized. Both are read once per PageRank iteration, so
    # the cut removes iters× re-executions of the pair build.
    # spark.remap.lineageCut=off opts out (lineage_cut).
    adj = lineage_cut(
        adj.join(adj.groupBy("a").agg(F.sum("w").alias("wdeg")), "a")
    )
    nodes = lineage_cut(adj.select(F.col("a").alias("word")).distinct())
    state = nodes.select("word", F.lit(1_000_000).alias("score_ppm"))
    base_ppm = 1_000_000 - damping_ppm
    for it in range(iters):
        contrib = (
            adj.join(
                state.select(
                    F.col("word").alias("a"), "score_ppm"
                ),
                "a",
            )
            .select(
                F.col("b").alias("word"),
                F.expr("score_ppm * w div wdeg").alias("_c"),
            )
            .groupBy("word")
            .agg(F.sum("_c").alias("_s"))
        )
        state = nodes.join(contrib, "word", "left").select(
            "word",
            (
                F.lit(base_ppm)
                + F.expr(
                    f"coalesce(_s, 0) * {damping_ppm} div 1000000"
                )
            )
            .cast("bigint")
            .alias("score_ppm"),
        )
        # lineage cut every 4 iterations (the pregel/hits convention):
        # the state plan otherwise nests one join+agg per iteration,
        # which at a web-corpus vocabulary (~1e6 nodes) makes the
        # optimizer re-plan a deepening tree each loop
        if (it + 1) % 4 == 0 and it + 1 < iters:
            state = state.localCheckpoint(eager=False)
    return state.orderBy(F.desc("score_ppm"), "word").limit(top_k)
