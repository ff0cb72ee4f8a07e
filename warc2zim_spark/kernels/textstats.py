"""Text-analysis kernels for training-data pipelines: language-ID,
quality scoring, token counting, document fingerprinting.

These are engine extensions (no reference counterpart — SURVEY.md §2.9-style
additions required by the task brief): each is a deterministic pure function
designed to vectorize over Arrow batches.
"""

from __future__ import annotations

import re

# --- token counting ---------------------------------------------------------

_WS_TOKEN_RE = re.compile(r"\S+")
# BPE-ish pre-tokenizer: word pieces, numbers, and single non-space symbols —
# the GPT-2-style pre-tokenization shape, simplified to ASCII-safe classes.
_BPE_TOKEN_RE = re.compile(r"[A-Za-z]+|\d{1,3}|[^\sA-Za-z\d]")


def count_tokens_ws(text: str | None) -> int:
    """Whitespace token count."""
    return len(_WS_TOKEN_RE.findall(text)) if text else 0


def count_tokens_bpe(text: str | None) -> int:
    """BPE-ish regex token count (upper bound on a real BPE vocab)."""
    return len(_BPE_TOKEN_RE.findall(text)) if text else 0


# --- quality scoring --------------------------------------------------------

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been on for with as at by it "
    "its this that from not no have has had but they you we he she his her "
    "their our your i me my".split()
)
_PUNCT_RE = re.compile(r"[^\w\s]")
_ALPHA_RE = re.compile(r"[A-Za-z]")


def quality_features(text: str | None) -> tuple[int, int, float, float, float, float]:
    """(n_chars, n_tokens, punct_ratio, stopword_ratio, alpha_ratio,
    mean_token_len) — the classic Gopher/C4-style cheap quality signals."""
    if not text:
        return (0, 0, 0.0, 0.0, 0.0, 0.0)
    n_chars = len(text)
    tokens = _WS_TOKEN_RE.findall(text)
    n_tokens = len(tokens)
    punct_ratio = len(_PUNCT_RE.findall(text)) / n_chars
    alpha_ratio = len(_ALPHA_RE.findall(text)) / n_chars
    stop = sum(1 for t in tokens if t.lower().strip(".,;:!?\"'()") in _STOPWORDS)
    stopword_ratio = stop / n_tokens if n_tokens else 0.0
    mean_token_len = (sum(len(t) for t in tokens) / n_tokens) if n_tokens else 0.0
    return (n_chars, n_tokens, punct_ratio, stopword_ratio, alpha_ratio, mean_token_len)


def quality_score(text: str | None) -> float:
    """Scalar quality in [0,1]: penalize too-short, punct-heavy,
    stopword-free (non-natural), or non-alphabetic text."""
    n_chars, n_tokens, punct_ratio, stopword_ratio, alpha_ratio, mean_len = (
        quality_features(text)
    )
    if n_tokens == 0:
        return 0.0
    length_score = min(1.0, n_tokens / 50.0)
    punct_score = max(0.0, 1.0 - 4.0 * punct_ratio)
    stop_score = min(1.0, stopword_ratio / 0.2)
    alpha_score = alpha_ratio
    return round(0.25 * (length_score + punct_score + stop_score + alpha_score), 6)


# --- language-ID (n-gram heuristic) ----------------------------------------

# Minimal trigram/stopword profiles for the corpus languages; deterministic,
# favoring precision on the synthetic corpus.  Unicode-range shortcuts for
# CJK/Cyrillic/Arabic come first.
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and ing ion you for with this that have are not".split()),
    "es": frozenset("que los las del una por con para est como más".split()),
    "fr": frozenset("les des une est que pour dans avec sur pas vous".split()),
    "de": frozenset("der die und das ist ein nicht mit sich auf den".split()),
    "it": frozenset("che per una del con non sono della los gli".split()),
    "pt": frozenset("que uma com não por para mais dos como".split()),
}
_CJK_RE = re.compile(r"[一-鿿]")
_CYRILLIC_RE = re.compile(r"[Ѐ-ӿ]")
_ARABIC_RE = re.compile(r"[؀-ۿ]")
_JA_KANA_RE = re.compile(r"[぀-ヿ]")
_KO_HANGUL_RE = re.compile(r"[가-힯]")


def detect_language(text: str | None) -> str:
    """Heuristic language-ID → ISO-639-1-ish code, 'und' when undecidable."""
    if not text:
        return "und"
    sample = text[:4000]
    n = max(len(sample), 1)
    if len(_JA_KANA_RE.findall(sample)) / n > 0.05:
        return "ja"
    if len(_KO_HANGUL_RE.findall(sample)) / n > 0.05:
        return "ko"
    if len(_CJK_RE.findall(sample)) / n > 0.1:
        return "zh"
    if len(_CYRILLIC_RE.findall(sample)) / n > 0.1:
        return "ru"
    if len(_ARABIC_RE.findall(sample)) / n > 0.1:
        return "ar"
    words = re.findall(r"[a-zà-ÿ]+", sample.lower())
    if not words:
        return "und"
    best_lang, best_hits = "und", 0
    for lang, markers in _LANG_MARKERS.items():
        hits = sum(1 for w in words if w in markers)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits >= 2 else "und"


# --- fingerprinting ---------------------------------------------------------

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def fnv1a64(data: bytes) -> int:
    """FNV-1a 64-bit — the deterministic base hash for all sketches here."""
    h = _FNV_OFFSET
    for byte in data:
        h = ((h ^ byte) * _FNV_PRIME) & _MASK64
    return h


def rolling_fingerprint(text: str | None, window: int = 8, keep: int = 4) -> list[int]:
    """Winnowing-style document fingerprint: token-level rolling hashes over
    ``window``-grams, keep the ``keep`` smallest (as signed int64 for Spark).
    Deterministic; near-identical docs share most fingerprint values."""
    if not text:
        return []
    tokens = _WS_TOKEN_RE.findall(text.lower())
    if not tokens:
        return []
    if len(tokens) < window:
        grams = [" ".join(tokens)]
    else:
        grams = [" ".join(tokens[i : i + window]) for i in range(len(tokens) - window + 1)]
    hashes = sorted({fnv1a64(g.encode("utf-8")) for g in grams})
    return [_to_i64(h) for h in hashes[:keep]]


def _to_i64(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h
