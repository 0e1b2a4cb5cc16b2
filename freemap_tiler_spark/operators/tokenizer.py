"""Byte-pair-encoding tokenizer: sample-trained, corpus-applied.

The training-data-pipeline counterpart to functions/text.py's regex
token ESTIMATE: a real subword vocabulary (Sennrich et al., ACL 2016
"Neural Machine Translation of Rare Words with Subword Units" — the
public BPE algorithm used by GPT-2-class tokenizers).

Scale split, mirroring how production tokenizers are actually built:

- ``bpe_train`` learns the merge table DRIVER-SIDE from a bounded,
  DETERMINISTIC sample (the ``sample`` lowest-id documents — same
  convention as the PQ/IVF codebook training in operators/similarity.py).
  Tokenizers are trained once on a subsample; streaming 100 TB through
  vocabulary learning is neither needed nor standard.
- ``bpe_encode`` applies the merges to the WHOLE corpus distributed:
  one Arrow-batched ``mapInPandas`` pass, no shuffle, with a per-batch
  word->tokens memo (web text is Zipfian, so the hit rate is high and
  per-row work amortizes to a dict lookup).

Determinism: pair-count ties break on the lexicographically smallest
pair, the sample is id-ordered, and encoding is a pure function of the
merge ranks — re-runs and re-partitionings produce identical tokens
(pinned by pytest, including a distributed == driver-side check).
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

# GPT-2-style pre-tokenizer, simplified to stdlib `re` (no \p classes):
# contractions, letter runs, digit runs, other-symbol runs, each with an
# optional leading space kept on the token.
_PRETOKEN = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-zÀ-ɏ]+| ?[0-9]+"
    r"| ?[^\sA-Za-zÀ-ɏ0-9]+|\s+(?!\S)|\s+"
)

_EOW = "</w>"


def pretokenize(text: str) -> list[str]:
    """Text -> pre-token strings (whitespace folded into the following
    token as a leading space, trailing whitespace dropped)."""
    return [t for t in _PRETOKEN.findall(text) if not t.isspace()]


def _word_symbols(word: str) -> tuple[str, ...]:
    """A pre-token as its initial symbol sequence (chars + end-of-word)."""
    return tuple(word) + (_EOW,)


def bpe_train(
    corpus: DataFrame,
    n_merges: int = 200,
    doc_col: str = "text",
    id_col: str = "doc_id",
    sample: int = 512,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the ``sample`` lowest-id docs.

    Classic algorithm over the sampled word-frequency table: count
    adjacent symbol pairs weighted by word frequency, merge the most
    frequent pair (ties -> lexicographically smallest, for determinism),
    repeat.  Returns the ordered merge list; order IS the rank table
    ``bpe_encode`` applies."""
    rows = (
        corpus.select(id_col, doc_col).orderBy(id_col).limit(sample)
        .select(doc_col).collect()
    )
    freqs: dict[tuple[str, ...], int] = {}
    for r in rows:
        for w in pretokenize(r[0] or ""):
            k = _word_symbols(w)
            freqs[k] = freqs.get(k, 0) + 1

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for word, f in freqs.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        # highest count; ties -> lexicographically SMALLEST pair
        top = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top)
        if top < 2:
            break  # nothing repeats: further merges are noise
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_freqs: dict[tuple[str, ...], int] = {}
        for word, f in freqs.items():
            out = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            k = tuple(out)
            new_freqs[k] = new_freqs.get(k, 0) + f
        freqs = new_freqs
    return merges


def apply_merges(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE pre-token with the rank table: repeatedly merge the
    lowest-rank adjacent pair (the standard BPE inference loop)."""
    sym = list(_word_symbols(word))
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    corpus: DataFrame,
    merges: list[tuple[str, str]],
    doc_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — one Arrow pass, no shuffle.

    The merge table broadcasts inside the closure (a few KB); each batch
    keeps a word->tokens memo so Zipf-repeated words encode once."""
    ranks = {p: i for i, p in enumerate(merges)}
    id_type = corpus.schema[id_col].dataType.simpleString()

    def _enc(batches: Iterator) -> Iterator:
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col, n_col = [], []
            for text in pdf[doc_col]:
                toks: list[str] = []
                for w in pretokenize(text or ""):
                    t = memo.get(w)
                    if t is None:
                        t = apply_merges(w, ranks)
                        memo[w] = t
                    toks.extend(t)
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pd.DataFrame({
                id_col: pdf[id_col], "tokens": toks_col, "n_tokens": n_col,
            })

    return corpus.select(id_col, doc_col).mapInPandas(
        _enc, f"`{id_col}` {id_type}, tokens array<string>, n_tokens int"
    )


def vocab_from_merges(merges: list[tuple[str, str]]) -> list[str]:
    """The subword vocabulary the merge list induces (merge results in
    rank order — handy for id assignment and inspection)."""
    return [a + b for a, b in merges]
