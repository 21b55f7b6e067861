"""Trainable byte-pair-encoding tokenizer over a corpus.

The engine already counts tokens with a fixed BPE-ish regex
(text.token_count_bpe — the cheap proxy); real training pipelines need
the tokenizer TRAINED on their own corpus to budget tokens accurately
(vocabulary mismatch inflates counts 10-30%). This is the standard
word-frequency formulation of BPE (Sennrich et al. 2016, public
technique), arranged Spark-first:

- ``word_counts``: ONE combinable groupBy over whitespace words — the
  only distributed pass, and the only shuffle (16-byte-ish words +
  longs, never documents).
- ``train_bpe``: merge learning runs DRIVER-side over the top-K word
  frequency table (a few MB at any corpus size — 100 TB of text still
  has a bounded head vocabulary, and BPE training is defined over the
  word-frequency dict, not the corpus). Deterministic: ties break
  lexicographically, no RNG.
- ``encode_tokens`` / ``token_counts``: batch tokenization via
  mapInArrow with a per-batch word memo — natural-language batches
  repeat words heavily, so each distinct word pays the merge replay
  once per batch (Arrow-vectorized I/O, no per-row Python).

The reference has no tokenizer at all (SURVEY §2.7 — scalar string
functions only); this is part of the training-data-pipeline mandate,
same tier as text.py/packing.py (packing consumes these counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# marks end-of-word so merges never cross word boundaries; chosen from
# Unicode Private Use Area so it cannot collide with corpus bytes
_EOW = "\uE000"


def word_counts(df: DataFrame, text_col: str = "text",
                lowercase: bool = False) -> DataFrame:
    """(word, n) frequency table — the single distributed pass BPE
    training needs. Map-side combinable; only words shuffle."""
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    w = F.explode(F.filter(F.split(col, r"\s+"),
                           lambda x: x != "")).alias("word")
    return df.select(w).groupBy("word").agg(F.count("*").alias("n"))


def _pair_counts(vocab: dict[tuple, int]) -> dict[tuple, int]:
    pairs: dict[tuple, int] = {}
    for sym, n in vocab.items():
        for a, b in zip(sym, sym[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + n
    return pairs


def _merge_vocab(vocab: dict[tuple, int], pair: tuple) -> dict[tuple, int]:
    a, b = pair
    ab = a + b
    out: dict[tuple, int] = {}
    for sym, n in vocab.items():
        merged, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                merged.append(ab)
                i += 2
            else:
                merged.append(sym[i])
                i += 1
        out[tuple(merged)] = out.get(tuple(merged), 0) + n
    return out


def train_bpe(df: DataFrame, text_col: str = "text",
              n_merges: int = 200, top_words: int = 100_000,
              min_pair_freq: int = 2, lowercase: bool = False) -> dict:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the model
    dict {"merges": [[a, b], ...], "eow": _EOW, "lowercase": bool}.

    Scale shape: the corpus contributes ONE word-count aggregation;
    training itself runs on the driver over the ``top_words`` most
    frequent words (ordered by (-n, word) — deterministic under count
    ties). Capping at the head vocabulary is the standard practice and
    the bounded-driver-memory guarantee: the tail it ignores is exactly
    the mass BPE would split to characters anyway. Stops early when the
    best remaining pair drops under ``min_pair_freq``."""
    wc = (word_counts(df, text_col, lowercase)
          .orderBy(F.desc("n"), F.col("word"))
          .limit(top_words).collect())
    vocab: dict[tuple, int] = {}
    for r in wc:
        w = r["word"]
        # EOW fused onto the last character (the common formulation):
        # an unmergeable word still counts len(chars) tokens, and merges
        # can never cross a word boundary
        sym = tuple(w[:-1]) + (w[-1] + _EOW,)
        vocab[sym] = vocab.get(sym, 0) + r["n"]
    merges: list[list[str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        # deterministic argmax: highest count, then lexicographic pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        vocab = _merge_vocab(vocab, best[0])
        merges.append(list(best[0]))
    return {"merges": merges, "eow": _EOW, "lowercase": lowercase}


def segment_word(word: str, model: dict,
                 _ranks: dict | None = None) -> list[str]:
    """Apply the learned merges to one word (reference implementation —
    the distributed encoder memoizes exactly this). Greedy
    lowest-rank-first replay, the canonical BPE inference order."""
    if not word:
        return []
    ranks = _ranks if _ranks is not None else {
        tuple(m): i for i, m in enumerate(model["merges"])}
    sym = list(word[:-1]) + [word[-1] + model["eow"]]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def token_counts(df: DataFrame, model: dict, text_col: str = "text",
                 id_col: str = "doc_id",
                 out_col: str = "n_bpe_tokens") -> DataFrame:
    """(id, n_bpe_tokens) under the trained model — the token-budget
    column ``mix_sources(budget_col=)`` / ``pack_sequences`` consume.
    mapInArrow with a per-batch word memo: each DISTINCT word in the
    batch replays the merges once; everything else is dict lookups."""
    import pyarrow as pa

    merges = [tuple(m) for m in model["merges"]]
    eow, lower = model["eow"], model.get("lowercase", False)

    def run(batches):
        ranks = {m: i for i, m in enumerate(merges)}
        mdl = {"merges": merges, "eow": eow}
        memo: dict[str, int] = {}
        for b in batches:
            ids = b.column(0)
            counts = []
            for txt in b.column(1).to_pylist():
                if not txt:
                    counts.append(0)
                    continue
                if lower:
                    txt = txt.lower()
                n = 0
                for w in txt.split():
                    k = memo.get(w)
                    if k is None:
                        k = len(segment_word(w, mdl, ranks))
                        memo[w] = k
                    n += k
                counts.append(n)
            yield pa.record_batch(
                [ids, pa.array(counts, type=pa.int64())],
                names=[id_col, out_col])

    id_type = dict((f.name, f.dataType.simpleString())
                   for f in df.schema.fields)[id_col]
    return df.select(id_col, text_col).mapInArrow(
        run, f"{id_col} {id_type}, {out_col} bigint")
