"""Text analysis stages over the documents table.

All kernels are vectorized: pandas `.str` ops (C-level regex loops) and
NumPy — no per-row Python lambdas in the hot path. Regexes are compiled
once per actor in __init__ — the stateful-stage pattern. Token count
uses a simple whitespace rule intentionally reproducible in SQL
(length - length(replace(s,' ','')) + 1) so DuckDB oracles can verify
it, plus a BPE-ish regex count as the richer variant.
"""

from __future__ import annotations

import numpy as np

STOPWORDS = frozenset(
    "the and of a to in is it that was for on are as with they be at "
    "one have this from or had by word but what some we can out other "
    "were all there when up use your how said an each she".split())

# tiny trigram tables for a deterministic language-ID heuristic
_LANG_HINTS = {
    "en": (" th", "the", " an", "and", "ing", " of", "ion"),
    "de": ("der", "die", "und", "sch", "ein", "ich", "cht"),
    "fr": (" le", "les", " de", "ent", "que", "ion", " la"),
    "es": (" de", " la", "que", "ión", " el", "los", "ado"),
}

_FP_MOD = (1 << 61) - 1


def simple_token_count(texts) -> np.ndarray:
    """Whitespace token count, SQL-reproducible."""
    import pandas as pd

    s = pd.Series(texts, dtype="object").fillna("")
    ln = s.str.len()
    spaces = ln - s.str.replace(" ", "", regex=False).str.len()
    out = np.where(ln > 0, spaces + 1, 0)
    return out.astype(np.int64)


class TextQuality:
    """Actor-pool stage: length/punct/stopword quality features +
    language-ID heuristic + rolling-hash fingerprint per document.

    Every feature is a vectorized pandas `.str` pass; a word run is a
    maximal [A-Za-zÀ-ÿ]+ sequence, so per-doc letter/word counts give
    mean word length and a boundary-lookaround alternation counts
    stopword runs exactly — no Python-level tokenization.
    """

    def __init__(self):
        import re

        self.word_re = re.compile(r"[A-Za-zÀ-ÿ]+")
        self.letter_re = re.compile(r"[A-Za-zÀ-ÿ]")
        self.bpe_re = re.compile(
            r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")  # BPE-ish pretokenizer
        self.punct_re = re.compile(r"[^\w\s]")
        # a maximal letter-run equals a stopword iff the alternation
        # matches with no letter on either side
        alts = "|".join(sorted(STOPWORDS, key=len, reverse=True))
        self.stop_re = re.compile(
            rf"(?<![A-Za-zÀ-ÿ])(?:{alts})(?![A-Za-zÀ-ÿ])")
        import re as _re

        self.lang_grams = [(lang, [_re.compile(_re.escape(g))
                                   for g in grams])
                           for lang, grams in _LANG_HINTS.items()]

    def __call__(self, batch):
        import pandas as pd

        df = batch if isinstance(batch, pd.DataFrame) else pd.DataFrame(batch)
        text = df["text"].fillna("")
        n_chars = text.str.len().to_numpy(dtype=np.int64)
        lower = text.str.lower()
        df["n_tokens"] = simple_token_count(text.to_numpy())
        df["n_bpe_tokens"] = text.str.count(self.bpe_re).astype("int64")
        punct = text.str.count(self.punct_re).to_numpy(dtype=np.int64)
        df["punct_ratio"] = punct / np.maximum(n_chars, 1)
        n_words = lower.str.count(self.word_re).to_numpy(dtype=np.int64)
        n_letters = lower.str.count(self.letter_re).to_numpy(dtype=np.int64)
        n_stop = lower.str.count(self.stop_re).to_numpy(dtype=np.int64)
        df["stopword_ratio"] = n_stop / np.maximum(n_words, 1)
        df["mean_word_len"] = np.where(
            n_words > 0, n_letters / np.maximum(n_words, 1), 0.0)
        # quality score: long enough, low punct, sane word length
        df["quality"] = (
            np.clip(n_chars / 200.0, 0, 1) * 0.4
            + (1 - df["punct_ratio"].clip(0, 1)) * 0.3
            + df["stopword_ratio"].clip(0, 0.8) / 0.8 * 0.3
        ).astype("float64")
        df["lang_guess"] = self._lang(lower)
        df["fingerprint"] = fingerprint64(text.to_numpy())
        return df

    def _lang(self, lower) -> np.ndarray:
        """Vectorized trigram vote: one `.str.count` pass per gram over
        the first 400 chars; first-strictly-greater tie rule (argmax)."""
        sl = " " + lower.str.slice(0, 400) + " "
        names = ["unk"] + [lang for lang, _ in self.lang_grams]
        scores = np.zeros((len(self.lang_grams) + 1, len(sl)), dtype=np.int64)
        for li, (_, grams) in enumerate(self.lang_grams):
            for g in grams:
                scores[li + 1] += sl.str.count(g).to_numpy(dtype=np.int64)
        # row 0 ("unk") scores 0; ties resolve to the earliest row, so a
        # doc with no gram hits stays "unk" — same rule as a scalar loop
        # keeping the first strictly-greater language.
        best = np.argmax(scores, axis=0)
        return np.array(names, dtype=object)[best]


def rolling_hash(s: str, mod: int = _FP_MOD) -> int:
    """Polynomial (base-256) rolling hash of the document bytes, mod the
    Mersenne prime 2^61-1. `int.from_bytes` evaluates the polynomial at
    C speed; the big-int modulo is a single linear pass."""
    b = s.encode("utf-8", errors="ignore")
    return int.from_bytes(b, "big") % mod if b else 0


def fingerprint64(texts, mod: int = _FP_MOD) -> np.ndarray:
    """Vector of rolling-hash fingerprints (int64), one C-speed
    `int.from_bytes` + bigint mod per document — no per-byte loop."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, s in enumerate(texts):
        b = str(s).encode("utf-8", errors="ignore")
        out[i] = int.from_bytes(b, "big") % mod if b else 0
    return out


def text_stats(ds, concurrency=(2, 8), batch_size: int = 4096):
    """Dataset wrapper: documents -> + quality/lang/fingerprint columns."""
    return ds.map_batches(TextQuality, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)
