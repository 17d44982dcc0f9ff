"""Text analysis stages over the documents table.

All kernels are vectorized (pandas string ops / numpy); regexes are
compiled once per actor in __init__ — the stateful-stage pattern. Token
count uses a simple whitespace rule intentionally reproducible in SQL
(length - length(replace(s,' ','')) + 1) so DuckDB oracles can verify it,
plus a BPE-ish regex count as the richer variant.
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
    language-ID heuristic + rolling-hash fingerprint per document."""

    def __init__(self):
        import re

        self.word_re = re.compile(r"[A-Za-zÀ-ÿ]+")
        self.bpe_re = re.compile(
            r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")  # BPE-ish pretokenizer
        self.punct_re = re.compile(r"[^\w\s]")

    def __call__(self, batch):
        import pandas as pd

        df = batch if isinstance(batch, pd.DataFrame) else pd.DataFrame(batch)
        text = df["text"].fillna("")
        n_chars = text.str.len()
        df["n_tokens"] = simple_token_count(text.to_numpy())
        df["n_bpe_tokens"] = text.map(
            lambda s: len(self.bpe_re.findall(s))).astype("int64")
        punct = text.map(lambda s: len(self.punct_re.findall(s)))
        df["punct_ratio"] = (punct / n_chars.clip(lower=1)).astype("float64")
        words = text.map(lambda s: self.word_re.findall(s.lower()))
        df["stopword_ratio"] = words.map(
            lambda ws: sum(w in STOPWORDS for w in ws) / max(1, len(ws))
        ).astype("float64")
        df["mean_word_len"] = words.map(
            lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0
        ).astype("float64")
        # quality score: long enough, low punct, sane word length
        df["quality"] = (
            np.clip(n_chars / 200.0, 0, 1) * 0.4
            + (1 - df["punct_ratio"].clip(0, 1)) * 0.3
            + df["stopword_ratio"].clip(0, 0.8) / 0.8 * 0.3
        ).astype("float64")
        df["lang_guess"] = text.map(self._lang)
        df["fingerprint"] = text.map(rolling_hash).astype("int64")
        return df

    @staticmethod
    def _lang(s: str) -> str:
        s = " " + s.lower()[:400] + " "
        best, score = "unk", 0
        for lang, grams in _LANG_HINTS.items():
            sc = sum(s.count(g) for g in grams)
            if sc > score:
                best, score = lang, sc
        return best


def rolling_hash(s: str, base: int = 1000003,
                 mod: int = (1 << 61) - 1) -> int:
    """Polynomial rolling hash of the full document (fingerprint)."""
    h = 0
    for ch in s.encode("utf-8", errors="ignore"):
        h = (h * base + ch) % mod
    return h


def text_stats(ds, concurrency=(2, 8), batch_size: int = 4096):
    """Dataset wrapper: documents -> + quality/lang/fingerprint columns."""
    return ds.map_batches(TextQuality, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)
