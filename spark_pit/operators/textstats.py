"""Text-analysis operators for training-data pipelines: token stats, quality
scoring, language-ID heuristic, and document fingerprinting.

All plans are pure `pyspark.sql.functions` (JVM-side, codegen) — no Python
UDFs. Tokenization is a single-space split everywhere so the DuckDB oracle
can reproduce it exactly.

The token hash used across text operators is portable-by-construction:
    tok_hash(t) = CAST(hex_prefix_15(md5(t)) AS BIGINT) % 1_000_000_007
(md5 is bit-identical in Spark and DuckDB; 15 hex digits < 2^60 fits a long).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_MOD = 1_000_000_007

# deterministic stopword profiles for the language-ID heuristic
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "de", "y", "es", "un"),
    "fr": ("le", "la", "de", "et", "est", "un"),
}


def tok_hash(col: Column) -> Column:
    """Portable 64-bit-ish token hash (see module docstring)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % HASH_MOD
    )


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token counting: n_tokens, distinct tokens, type-token
    ratio, average token length. (BPE-ish subword counting would slot in the
    same plan with a different split regex.)"""
    toks = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("ttr"),
        F.round(
            (F.length(text_col) - F.size(toks) + 1) / F.size(toks), 6
        ).alias("avg_tok_len"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features: length, space ratio, vowel ratio, digit
    ratio, stopword ratio, and a composite score in [0, 1]. Character-class
    ratios use regexp_replace deletion counts (portable across regex engines:
    only literal classes)."""
    t = F.col(text_col)
    n = F.length(t).cast("double")
    toks = tokens(t)
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin(*LANG_PROFILES["en"]))
    ).cast("double")
    space_ratio = (n - F.length(F.regexp_replace(t, " ", ""))) / n
    vowel_ratio = (n - F.length(F.regexp_replace(t, "[aeiou]", ""))) / n
    digit_ratio = (n - F.length(F.regexp_replace(t, "[0-9]", ""))) / n
    stop_ratio = n_stop / F.size(toks)
    score = (
        F.least(n / F.lit(500.0), F.lit(1.0)) * 0.4
        + (1.0 - digit_ratio) * 0.2
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.2
        + F.least(vowel_ratio * 3.0, F.lit(1.0)) * 0.2
    )
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        F.round(space_ratio, 6).alias("space_ratio"),
        F.round(vowel_ratio, 6).alias("vowel_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic: score each profile by stopword
    hit count over the token list; argmax wins (profile name ascending breaks
    ties). Emits per-profile scores + prediction."""
    toks = tokens(F.col(text_col))
    cols = [F.col(id_col)]
    for lang_name in sorted(LANG_PROFILES):
        words = LANG_PROFILES[lang_name]
        cols.append(
            F.size(F.filter(toks, lambda x: x.isin(*words))).alias(f"score_{lang_name}")
        )
    scored = df.select(*cols)
    # argmax with deterministic tie-break: greatest score, first profile wins
    pred = None
    best = None
    for lang_name in sorted(LANG_PROFILES):
        s = F.col(f"score_{lang_name}")
        if pred is None:
            pred, best = F.lit(lang_name), s
        else:
            pred = F.when(s > best, F.lit(lang_name)).otherwise(pred)
            best = F.greatest(best, s)
    return scored.withColumn("lang_pred", pred)


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Rolling polynomial fingerprint over the token-hash sequence:
    fp = fold(tokens, 0, (acc, t) -> (acc * 31 + tok_hash(t)) % M).
    Order-sensitive (unlike a set hash) — detects re-orderings; identical in
    Spark (aggregate) and DuckDB (list_reduce)."""
    toks = tokens(F.col(text_col))
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + tok_hash(x)) % HASH_MOD,
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


# GPT-2-style pretokenizer, simplified to the portable subset both regex
# engines (Java in Spark, RE2 in DuckDB) interpret identically: no
# lookarounds, no unicode classes — contractions, letter runs, digit runs,
# punctuation runs (each optionally space-prefixed).
BPE_PRETOKEN_RE = "'[a-z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"
_SUBWORD_LEN = 4  # BPE-ish budget: a merge table ~50k vocab averages 3-5 chars/unit


def bpe_token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """BPE-ish token counting (the second leg of the token-counting
    contract beside whitespace token_stats): pretokenize with the
    simplified GPT-2 regex, then estimate subword units as ⌈len/4⌉ per
    pretoken — the standard budget heuristic when the merge table itself
    is not shipped. Everything stays JVM-side (regexp_extract_all +
    higher-order aggregate), one narrow projection, no shuffle."""
    pre = F.expr(
        f"regexp_extract_all({text_col}, \"{BPE_PRETOKEN_RE}\", 0)"
    )
    units = F.aggregate(
        pre,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.ceil(F.length(F.trim(t)) / F.lit(_SUBWORD_LEN)).cast("long"),
    )
    return df.select(
        F.col(id_col),
        F.size(pre).alias("n_pretokens"),
        units.alias("n_subwords_est"),
        F.round(units / F.size(pre), 6).alias("subwords_per_pretoken"),
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Within-document repetition signals — the Gopher/C4-style quality
    filters a pretraining corpus is cleaned with: the fraction of
    duplicated word 2-grams and 3-grams (1 − distinct/total; heavily
    templated or looping text scores high) plus the max single-token
    share. Pure array expressions on the token list — no explode, no
    shuffle; the n-gram arrays never leave the row."""
    toks = tokens(F.col(text_col))

    def dup_frac(n: int):
        # CASE guards the short-doc branch BEFORE sequence() runs, so a
        # doc with fewer than n tokens never builds a descending range
        g = F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.slice(toks, i + 1, n).cast("string"),
        )
        return F.when(F.size(toks) < n, F.lit(0.0)).otherwise(
            F.lit(1.0) - F.size(F.array_distinct(g)) / F.size(g)
        )

    top_tok_share = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    ) / F.size(toks)
    return df.select(
        F.col(id_col),
        F.round(dup_frac(2), 6).alias("dup_bigram_frac"),
        F.round(dup_frac(3), 6).alias("dup_trigram_frac"),
        F.round(top_tok_share, 6).alias("top_token_share"),
    )


def chunk_stats(
    df: DataFrame, id_col: str, text_col: str, max_tokens: int = 64
) -> DataFrame:
    """Context-window CHUNKING — the step between cleaning and tokenized
    training shards: each document is cut at deterministic token
    boundaries into chunks of at most ``max_tokens`` whitespace tokens
    (chunk = token position // max_tokens, 0-based — reproducible across
    runs, partitionings, and engines, unlike byte-offset splitters).

    Plan: posexplode of the token array (narrow) → one partial-agg
    groupBy(doc, chunk). At 10⁹ docs the explode is pipelined into the
    scan and the shuffle carries only (id, chunk) counts + boundary
    tokens; no global state, no skew beyond document length itself.
    Returns (id, chunk_id, chunk_tokens, first_token, last_token)."""
    ex = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )
    return (
        ex.withColumn("chunk_id", (F.col("pos") / max_tokens).cast("int"))
        .groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("chunk_tokens"),
            F.min_by("tok", "pos").alias("first_token"),
            F.max_by("tok", "pos").alias("last_token"),
        )
    )


def pack_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 512,
    n_shards: int = 8,
    salt: str = "p1",
) -> DataFrame:
    """Sequence PACKING — assigning whole documents to fixed-token-budget
    training bins. Deterministic contiguous packing: documents are
    sharded by the portable md5-fold (same convention as
    deterministic_sample — engine/partitioning/run-invariant), ordered by
    id within shard, and bin = floor(tokens-before-this-doc / budget).
    A doc straddling a boundary belongs to the bin where it starts (bins
    can overrun by < one doc; cap doc length upstream with chunk_stats).
    First-fit-decreasing would pack ~tighter but is inherently
    order-dependent global state — not reproducible, not distributable;
    contiguous-by-shard is what large pipelines actually run.

    Scale shape: the only wide operation is a window cumsum PARTITIONED
    BY shard — n_shards parallel streams, no single-partition global
    window (the naive global ORDER BY id cumsum is the scale antipattern
    this operator deliberately avoids). Returns
    (id, n_tokens, shard, bin_id, bin_offset)."""
    from pyspark.sql import Window

    n_tok = F.size(tokens(F.col(text_col)))
    shard = (
        F.conv(
            F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 15),
            16, 10,
        ).cast("long")
        % n_shards
    ).cast("int")
    base = df.select(
        F.col(id_col), n_tok.alias("n_tokens"), shard.alias("shard")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return base.select(
        id_col,
        "n_tokens",
        "shard",
        F.floor(cum / budget).cast("long").alias("bin_id"),
        (cum % budget).cast("long").alias("bin_offset"),
    )


def _gram_rows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc, pos, gram-hash) rows for every n-token span: posexplode +
    one per-doc window of n−1 leads (single sort exchange), gram string =
    space-joined span, hashed portably (tok_hash). JVM-side end to end."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    toks = df.select(
        id_col, F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    grams = toks.select(
        id_col, "pos", F.concat_ws(" ", *parts).alias("gram"),
        parts[-1].isNotNull().alias("__full"),
    ).where("__full")
    return grams.select(id_col, "pos", tok_hash(F.col("gram")).alias("gh"))


def dup_ngram_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """Gopher-style CROSS-document duplicate-span accounting: per document,
    the fraction of its n-gram spans whose hash also occurs in ANOTHER
    document (the pretraining-corpus signal behind line/paragraph dedup —
    this table's text is flat token soup, so fixed n-token spans stand in
    for paragraphs). Plan: gram rows → doc-frequency partial agg → semi
    join back — two hash-partitioned shuffles on the gram key, no
    all-pairs anything; a 10⁷-doc boilerplate span costs its doc-frequency
    row, not a pair blowup. Returns (id, n_grams, n_dup_grams, dup_frac).
    """
    grams = _gram_rows(df, id_col, text_col, n)
    # gram -> number of DISTINCT docs containing it (partial agg shuffle)
    docfreq = grams.groupBy("gh").agg(
        F.countDistinct(id_col).alias("df"),
    )
    joined = grams.join(docfreq.where(F.col("df") > 1), "gh", "left_semi")
    dup = joined.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_dup_grams"))
    total = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        total.join(dup, id_col, "left")
        .na.fill({"n_dup_grams": 0})
        .select(
            id_col, "n_grams", "n_dup_grams",
            F.round(F.col("n_dup_grams") / F.col("n_grams"), 6).alias("dup_frac"),
        )
    )


def decontaminate(
    df: DataFrame,
    probes: DataFrame,
    id_col: str,
    text_col: str,
    probe_text_col: str | None = None,
    n: int = 8,
    threshold: float = 0.1,
) -> DataFrame:
    """Benchmark decontamination (the standard pretraining hygiene pass):
    flag training documents whose n-gram spans overlap a probe/benchmark
    corpus. Overlap is measured on DISTINCT gram hashes (containment on
    the doc side), and a doc is contaminated when overlap_frac >=
    threshold OR any single probe gram matches 'verbatim-long' spans —
    here simply overlap_frac, the common practical form. Plan: the probe
    gram set is a (usually small) distinct-hash table — broadcast when
    tiny, hash equi-join otherwise; training grams never self-join.
    Returns (id, n_grams, n_probe_hits, overlap_frac, contaminated)."""
    grams = _gram_rows(df, id_col, text_col, n).select(id_col, "gh").distinct()
    probe_grams = (
        _gram_rows(probes, id_col, probe_text_col or text_col, n)
        .select("gh").distinct()
    )
    hits = grams.join(probe_grams, "gh", "left_semi").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_probe_hits")
    )
    total = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        total.join(hits, id_col, "left")
        .na.fill({"n_probe_hits": 0})
        .select(
            id_col, "n_grams", "n_probe_hits",
            F.round(F.col("n_probe_hits") / F.col("n_grams"), 6)
            .alias("overlap_frac"),
        )
        .withColumn("contaminated", F.col("overlap_frac") >= threshold)
    )


# Portable PII patterns: literal classes + {m,n} quantifiers + ASCII \b only,
# so Java regex (Spark) and RE2 (DuckDB) match identically. Redaction is
# SEQUENTIAL in this order — each count is taken on the text AFTER the
# previous pattern's replacement, so an IPv4-looking run inside an already
# redacted email is not double-counted.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\b", "<PHONE>"),
)


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII scrubbing — the standard pretraining hygiene pass (emails,
    IPv4 addresses, phone-shaped numbers replaced by typed placeholder
    tokens, with per-class match counts). Pure JVM regexp expressions in
    one zero-shuffle projection over the scan; the nested replace chain
    stays inside whole-stage codegen. Returns
    (id, n_email, n_ipv4, n_phone, redacted)."""
    cur = F.col(text_col)
    cols = [F.col(id_col)]
    for name, pat, rep in PII_PATTERNS:
        cols.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, rep)
    return df.select(*cols, cur.alias("redacted"))


def _token_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok) row per token occurrence — the shared scan shape for the
    corpus-LM family below."""
    return df.select(id_col, F.explode(tokens(F.col(text_col))).alias("tok"))


def unigram_surprisal(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """CCNet-style language-model quality filter, with the corpus itself
    as the unigram LM (the portable stand-in for the KenLM wiki model the
    original pipeline downloads): per document, the mean surprisal
    −mean(ln p(tok)) where p(tok) = corpus_count(tok) / corpus_total.
    Low mean surprisal ⇒ stopword-heavy/common text, high ⇒ rare-token
    (often garbage) text — the standard perplexity-bucket signal for
    pretraining-corpus filtering.

    Plan: token rows → unigram partial-agg (map-side combine, one shuffle
    on tok) → join token rows back to counts (second shuffle; AQE
    broadcasts the count side when the vocab is small, and a hot stopword
    key is ONE row on the build side, so skew replicates a single row,
    never a partition) → per-doc partial agg. mean_surprisal =
    ln(total) − avg(ln(count)), exact-integer inputs to ln; rounded to 3
    decimals so the ≤2-ulp libm spread between engines (~1e-13 after a
    per-doc avg) can never cross a rounding boundary."""
    toks = _token_rows(df, id_col, text_col)
    cnts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = cnts.agg(F.sum("c").alias("t"))
    return (
        toks.join(cnts, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.log(F.first("t")) - F.avg(F.log(F.col("c"))), 3
            ).alias("mean_surprisal"),
        )
    )


def build_vocab(df: DataFrame, text_col: str, top_n: int = 100) -> DataFrame:
    """Corpus vocabulary head — the tokenizer-training prep pass: the
    top_n most frequent tokens with rank and cumulative corpus coverage.
    Plan: unigram partial agg (one shuffle), then a distributed
    TakeOrdered for the top_n (never a global sort of the vocab), then
    rank + running coverage via a window over ONLY the top_n rows (tiny,
    single task by construction). Ordering key (count desc, tok asc) is
    integer/string-exact — no float ties across engines. cum_frac is an
    exact-rational division rounded to 6."""
    from pyspark.sql import Window

    cnts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    total = cnts.agg(F.sum("n_occ").alias("t"))
    top = cnts.orderBy(F.col("n_occ").desc(), F.col("tok")).limit(top_n)
    w = Window.orderBy(F.col("n_occ").desc(), F.col("tok"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("cum", F.sum("n_occ").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(F.broadcast(total))
        .select(
            "rank", "tok", "n_occ",
            F.round(F.col("cum") / F.col("t"), 6).alias("cum_frac"),
        )
    )


def top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Per-document top-k characteristic terms — the keyword/topic-tag
    pass of a corpus pipeline. Ranking key is EXACT: (tf desc, df asc,
    tok asc) — highest in-doc count first, rarer-in-corpus breaks ties —
    so the selected rows are bit-identical across engines; the
    informational tfidf = tf · ln(N_docs/df) column is float and rounded
    to 3 (≤2-ulp libm spread, never near a boundary at that grain).

    Plan: (doc, tok, tf) partial agg → df per tok (second partial agg,
    same token-hash partitioning reusable) → equi-join on tok (one-row
    build side per token, stopword-skew safe) → per-doc top-k via
    row_number window partitioned by doc (hash-partitioned on the doc
    key, no global sort)."""
    from pyspark.sql import Window

    toks = _token_rows(df, id_col, text_col)
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ndocs = df.agg(F.countDistinct(id_col).alias("nd"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("tok").asc()
    )
    return (
        tf.join(dfreq, "tok")
        .withColumn("term_rank", F.row_number().over(w).cast("long"))
        .where(F.col("term_rank") <= k)
        .crossJoin(F.broadcast(ndocs))
        .select(
            id_col, "term_rank", "tok", "tf", "df",
            F.round(F.col("tf") * F.log(F.col("nd") / F.col("df")), 3)
            .alias("tfidf"),
        )
    )


def chunk_stats_strided(
    df: DataFrame, id_col: str, text_col: str,
    max_tokens: int = 64, stride: int = 32,
) -> DataFrame:
    """OVERLAPPING context-window chunking — the strided variant of
    :func:`chunk_stats` (stride < max_tokens gives the max−stride token
    overlap between consecutive windows that LLM pretraining prep uses so
    no next-token context is lost at chunk boundaries). Chunk c covers
    token positions [c·stride, c·stride + max_tokens); a token at
    position p therefore belongs to every c in
    [max(0, floor((p − max_tokens)/stride) + 1), floor(p/stride)] —
    emitted JVM-side as explode(sequence(lo, hi)) (≤ ceil(max/stride)
    memberships per token, a constant fan-out pipelined into the scan;
    the floor is computed over double division so negative positions
    round identically in every engine). One partial-agg shuffle on
    (doc, chunk), same as the non-overlapping form.

    Returns (id, chunk_id, chunk_tokens, first_token, last_token)."""
    if not 0 < stride <= max_tokens:
        raise ValueError("need 0 < stride <= max_tokens")
    ex = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )
    lo = F.greatest(
        F.lit(0).cast("long"),
        F.floor((F.col("pos") - F.lit(max_tokens)) / F.lit(stride)) + 1,
    )
    hi = F.floor(F.col("pos") / F.lit(stride))
    return (
        ex.withColumn("chunk_id", F.explode(F.sequence(lo.cast("int"), hi.cast("int"))))
        .groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("chunk_tokens"),
            F.min_by("tok", "pos").alias("first_token"),
            F.max_by("tok", "pos").alias("last_token"),
        )
    )


def dup_span_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """Longest CONTIGUOUS cross-document duplicated span per document —
    the position-aware sharpening of dup_ngram_stats (the signal behind
    exact-substring dedup a la Lee et al. 2022 "Deduplicating Training
    Data Makes Language Models Better", computed here at n-token
    granularity instead of a suffix array): consecutive duplicated
    n-gram positions are grouped into runs via the pos - row_number
    trick (one per-doc window), and a run of r grams covers r + n - 1
    tokens. Plan: the dup_ngram doc-frequency semi-join (two
    hash-partitioned shuffles on the gram key) + one per-doc window —
    no all-pairs anything. Returns
    (id, n_dup_positions, max_dup_run, max_dup_span_tokens)."""
    from pyspark.sql import Window

    grams = _gram_rows(df, id_col, text_col, n)
    docfreq = grams.groupBy("gh").agg(F.countDistinct(id_col).alias("df"))
    duppos = grams.join(docfreq.where(F.col("df") > 1), "gh", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = (
        duppos.withColumn("__grp", F.col("pos") - F.row_number().over(w))
        .groupBy(id_col, "__grp")
        .agg(F.count(F.lit(1)).alias("__run"))
    )
    per_doc = runs.groupBy(id_col).agg(
        F.sum("__run").cast("long").alias("n_dup_positions"),
        F.max("__run").cast("long").alias("max_dup_run"),
    )
    return (
        df.select(id_col).distinct()
        .join(per_doc, id_col, "left")
        .na.fill({"n_dup_positions": 0, "max_dup_run": 0})
        .select(
            id_col, "n_dup_positions", "max_dup_run",
            F.when(F.col("max_dup_run") > 0, F.col("max_dup_run") + (n - 1))
            .otherwise(F.lit(0)).cast("long").alias("max_dup_span_tokens"),
        )
    )
