"""Text analysis stages for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` callables over the ``documents``
table (doc_id, text, lang, source, n_chars). Stateful pieces (compiled
regexes, stopword tables) live in ``__init__`` so the class runs as an actor
pool with setup amortized across batches.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

# Punctuation class shared with the DuckDB oracle — keep in lockstep with
# PUNCT_SQL_CLASS in __ray_entry__.py.
PUNCT_CLASS = r"[.,;:!?'\"()\-]"

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that", "was",
           "for", "on", "with", "as", "they", "this", "have", "are"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "ein", "mit", "sie",
           "zu", "den", "von", "auf", "eine", "werden", "auch", "sich"},
    "fr": {"le", "la", "les", "et", "est", "je", "ne", "pas", "un", "une", "dans",
           "pour", "qui", "sur", "avec", "ce", "il", "au"},
    "es": {"el", "la", "los", "y", "es", "no", "un", "una", "que", "en", "se",
           "las", "por", "con", "para", "del", "su", "como"},
}


class TextStats:
    """Per-document statistics: token count, punctuation ratio, word length.

    Definitions (SQL-expressible, matched by the oracle):
      n_chars     = length(text)
      n_tokens    = number of maximal non-whitespace runs
      n_punct     = count of chars in PUNCT_CLASS
      punct_ratio = n_punct / max(n_chars, 1)
    """

    def __init__(self):
        self.punct = re.compile(PUNCT_CLASS)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        out = df.copy(deep=False)
        out["n_chars_computed"] = text.str.len().astype("int64")
        # ASCII \S+ runs, NOT str.split(): the oracle's RE2 '\s+' is
        # ASCII-only, so Unicode whitespace (NBSP, U+3000) must count as
        # token characters on both sides — identical on ASCII corpora
        out["n_tokens"] = text.str.count(r"\S+", flags=re.ASCII).astype("int64")
        out["n_punct"] = text.str.count(self.punct).astype("int64")
        out["punct_ratio"] = out["n_punct"] / out["n_chars_computed"].clip(lower=1)
        return out


class QualityScore:
    """Heuristic quality scoring à la C4/Gopher filters: flags + composite.

    Components: mean word length in [2.0, 14.0], stopword hit ratio
    >= min_stop, not mostly punctuation, length bounds. Deterministic,
    unit-testable.
    """

    def __init__(self, lang_col: str = "lang", min_stop: float = 0.05):
        self.min_stop = min_stop
        self.lang_col = lang_col
        # re.ASCII to stay in lockstep with the RE2-based oracle '\w+'
        # (same reason BpeishTokenCount/RepetitionStats pin it): Unicode
        # word chars would diverge on any non-ASCII doc
        self.word_re = re.compile(r"\w+", re.ASCII)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        toks = text.str.lower().str.findall(self.word_re)
        n_tok = toks.str.len().clip(lower=1)
        langs = df.get(self.lang_col, pd.Series(["en"] * len(df), index=df.index))

        # vectorized over the EXPLODED token stream (index maps back to the
        # row): per-language stopword hit-rates without a Python loop per doc
        flat = toks.explode()
        flat_lang = langs.reindex(flat.index)
        hit = pd.Series(False, index=flat.index)
        for lang, table in _STOPWORDS.items():
            m = flat_lang == lang
            if m.any():
                hit[m] = flat[m].isin(table)
        other = ~flat_lang.isin(list(_STOPWORDS))
        if other.any():
            hit[other] = flat[other].isin(_STOPWORDS["en"])
        hits = hit.groupby(level=0).sum().reindex(df.index, fill_value=0)
        wlen = flat.str.len()
        mean_wlen = wlen.groupby(level=0).mean().reindex(df.index).fillna(0.0)

        out = df.copy(deep=False)
        out["stop_ratio"] = hits / n_tok
        out["mean_word_len"] = mean_wlen
        out["quality_ok"] = (
            (out["stop_ratio"] >= self.min_stop)
            & mean_wlen.between(2.0, 14.0)
            & text.str.len().between(10, 1_000_000)
        )
        return out


class LangId:
    """Language-ID heuristic over {en, de, fr, es, zh}, fully vectorized.

    Two rules:
      1. CJK codepoint ratio ≥ ``cjk_ratio`` → zh (script detection comes
         before any stopword voting — CJK text has no stopword hits at all);
      2. otherwise stopword-table votes per language over the EXPLODED
         lowercase token stream (one ``isin`` per language over all tokens
         of the batch — the QualityScore pattern, no per-doc Python loop),
         ties broken by a fixed language priority.

    NOTE on the synthetic documents fixture: its ``lang`` labels are
    uncorrelated with text content (every doc draws from one shared English
    vocabulary), so accuracy against that column is meaningless there — the
    accuracy test uses real multilingual sentences instead.
    """

    PRIORITY = ["en", "de", "fr", "es"]

    def __init__(self, cjk_ratio: float = 0.25):
        self.word_re = re.compile(r"[a-zäöüßéèêàçñ]+")
        self.cjk_re = re.compile(r"[一-鿿㐀-䶿]")
        self.cjk_ratio = cjk_ratio

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        n_chars = text.str.len().clip(lower=1)
        n_cjk = text.str.count(self.cjk_re)
        is_zh = (n_cjk / n_chars) >= self.cjk_ratio

        toks = text.str.lower().str.findall(self.word_re)
        flat = toks.explode().dropna()
        # per-language hit counts over the flat token stream: one isin +
        # one groupby-sum per language, all vectorized
        votes = pd.DataFrame(index=df.index)
        for lang in self.PRIORITY:
            hit = flat.isin(_STOPWORDS[lang])
            votes[lang] = hit.groupby(level=0).sum().reindex(df.index, fill_value=0)
        # idxmax breaks ties by column order == PRIORITY
        pred = votes.idxmax(axis=1)
        pred[is_zh] = "zh"
        out = df.copy(deep=False)
        out["lang_pred"] = pred
        return out


class PiiScrub:
    """PII redaction for training corpora: emails → <EMAIL>, IPv4 → <IP>,
    phone numbers → <PHONE>, applied in that order with regexes compiled
    once per actor. Emits per-doc redaction counts plus the md5 of the
    scrubbed text so redaction output is value-checkable byte-for-byte.
    Patterns are RE2-compatible (no backrefs/lookarounds) so the DuckDB
    oracle runs the IDENTICAL strings."""

    EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    IPV4 = r"\b(?:\d{1,3}\.)(?:\d{1,3}\.)(?:\d{1,3}\.)\d{1,3}\b"
    PHONE = r"\+\d[\d\- ]{7,}\d"

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.email = re.compile(self.EMAIL)
        self.ipv4 = re.compile(self.IPV4)
        self.phone = re.compile(self.PHONE)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        s = df[self.text_col].fillna("")
        out = df[["doc_id"]].copy()
        out["n_emails"] = s.str.count(self.email).astype("int64")
        s = s.str.replace(self.email, "<EMAIL>", regex=True)
        out["n_ips"] = s.str.count(self.ipv4).astype("int64")
        s = s.str.replace(self.ipv4, "<IP>", regex=True)
        out["n_phones"] = s.str.count(self.phone).astype("int64")
        s = s.str.replace(self.phone, "<PHONE>", regex=True)
        out["scrubbed_md5"] = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in s]
        return out


class RepetitionStats:
    """Gopher-style within-document repetition filters, fully vectorized:
    dup_word_ratio = 1 - distinct/total words; top_bigram_frac = frequency
    of the most common word-2-gram over all 2-grams. Both computed over the
    exploded token stream (index maps back to the row) — no Python loop per
    document. High values flag boilerplate / degenerate generations."""

    def __init__(self):
        self.word_re = re.compile(r"\w+", re.ASCII)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(self.word_re)
        n_tok = toks.str.len()
        flat = toks.explode().dropna()
        n_uniq = (
            flat.groupby(level=0).nunique().reindex(df.index, fill_value=0)
        )
        nxt = flat.groupby(level=0).shift(-1)
        bigrams = (flat + "\x00" + nxt).dropna()
        cnt = bigrams.groupby([bigrams.index, bigrams]).size()
        mx = cnt.groupby(level=0).max()
        out = df[["doc_id"]].copy()
        out["dup_word_ratio"] = (1 - n_uniq / n_tok.clip(lower=1)).round(6)
        out["top_bigram_frac"] = (
            (mx / (n_tok - 1).clip(lower=1)).reindex(df.index).fillna(0.0).round(6)
        )
        return out


class HashSplit:
    """Deterministic train/val/test assignment by content hash: the first
    md5 byte mod 10 → 0 = test, 1 = val, else train (8/1/1). Content-keyed
    (not id-keyed) so exact duplicates always land in the SAME split — the
    property that prevents train/test leakage through duplicated documents."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        buckets = [
            int(hashlib.md5(t.encode("utf-8")).hexdigest()[:2], 16) % 10
            for t in df["text"].fillna("")
        ]
        out = df[["doc_id"]].copy()
        out["split"] = [
            "test" if b == 0 else "val" if b == 1 else "train" for b in buckets
        ]
        return out


class BpeishTokenCount:
    """BPE-style pre-tokenization count: lowercase runs of letters, digit
    runs, and non-space punctuation runs — the GPT-2 pre-tokenizer shape
    without the merges table (counts, not ids). Regex compiled once per
    actor; counting is one vectorized str.count per batch. Kept in lockstep
    with the DuckDB oracle regex in __ray_entry__._BPE_TOKEN_RE."""

    PATTERN = r"[a-z]+|[0-9]+|[^\sa-z0-9]+"

    def __init__(self):
        # re.ASCII pins \s to ASCII whitespace like DuckDB's RE2 — Python's
        # Unicode \s would split on NBSP/ideographic space where the oracle
        # does not, diverging the counts on zh text
        self.re = re.compile(self.PATTERN, re.ASCII)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        out["n_bpe_tokens"] = (
            df["text"].fillna("").str.lower().str.count(self.re).astype("int64")
        )
        return out


class Fingerprint:
    """Document fingerprinting: md5 content hash (exact, SQL-matchable) +
    winnowed rolling-hash sketch (near-dup ready, rows-only)."""

    def __init__(self, k: int = 8, window: int = 16):
        self.k = k
        self.window = window

    def _winnow(self, s: str) -> list[int]:
        b = s.encode("utf-8", "ignore")
        n = len(b)
        if n < self.k:
            return []
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
        # polynomial rolling hash of every k-gram, fully vectorized:
        # h[i] = sum(arr[i+j] * B^(k-1-j)) via strided matmul
        base = np.uint64(1000003)
        powers = base ** np.arange(self.k - 1, -1, -1, dtype=np.uint64)
        windows = np.lib.stride_tricks.sliding_window_view(arr, self.k)
        with np.errstate(over="ignore"):
            hashes = (windows * powers).sum(axis=1)
        if len(hashes) <= self.window:
            return [int(hashes.min())]
        mins = np.lib.stride_tricks.sliding_window_view(hashes, self.window).min(axis=1)
        return np.unique(mins).tolist()

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        out = df.copy(deep=False)
        out["md5"] = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in text]
        out["winnow_sketch"] = [self._winnow(t) for t in text]
        return out
