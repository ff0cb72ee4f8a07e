"""Language-code normalization → ISO-639-3 ZIM metadata value.

Reference: language.py:6-36 ``parse_language`` (zimscraperlib
``get_language_or_none`` behind it; its observable contract pinned by
tests/test_language.py:6-27):

* accepts ISO 639-1 ("en"), ISO 639-2/3 ("eng"), or an English label
  ("English"); case-insensitive; whitespace ignored
* comma-separated lists supported; order preserved; duplicates removed
* unknown / empty → dropped; everything dropped → fallback "eng"

The code table below covers the language set that appears in the synthetic
corpora plus the majors; unknown codes fall through to None like the
reference's get_language_or_none.
"""

from __future__ import annotations

# iso639-1 → iso639-3, plus English labels; 3-letter codes map to themselves.
_ISO3: dict[str, str] = {
    "aa": "aar", "ab": "abk", "af": "afr", "am": "amh", "ar": "ara",
    "az": "aze", "be": "bel", "bg": "bul", "bn": "ben", "bs": "bos",
    "ca": "cat", "cs": "ces", "cy": "cym", "da": "dan", "de": "deu",
    "el": "ell", "en": "eng", "eo": "epo", "es": "spa", "et": "est",
    "eu": "eus", "fa": "fas", "fi": "fin", "fr": "fra", "ga": "gle",
    "gl": "glg", "gu": "guj", "he": "heb", "hi": "hin", "hr": "hrv",
    "hu": "hun", "hy": "hye", "id": "ind", "is": "isl", "it": "ita",
    "ja": "jpn", "ka": "kat", "kk": "kaz", "km": "khm", "kn": "kan",
    "ko": "kor", "ku": "kur", "ky": "kir", "la": "lat", "lt": "lit",
    "lv": "lav", "mk": "mkd", "ml": "mal", "mn": "mon", "mr": "mar",
    "ms": "msa", "my": "mya", "ne": "nep", "nl": "nld", "no": "nor",
    "pa": "pan", "pl": "pol", "ps": "pus", "pt": "por", "ro": "ron",
    "ru": "rus", "si": "sin", "sk": "slk", "sl": "slv", "sq": "sqi",
    "sr": "srp", "sv": "swe", "sw": "swa", "ta": "tam", "te": "tel",
    "th": "tha", "tl": "tgl", "tr": "tur", "uk": "ukr", "ur": "urd",
    "uz": "uzb", "vi": "vie", "zh": "zho",
}
_LABELS: dict[str, str] = {
    "english": "eng", "french": "fra", "spanish": "spa", "german": "deu",
    "chinese": "zho", "russian": "rus", "arabic": "ara", "portuguese": "por",
    "italian": "ita", "japanese": "jpn", "korean": "kor", "hindi": "hin",
    "dutch": "nld", "turkish": "tur", "polish": "pol", "vietnamese": "vie",
}
# iso639-2 bibliographic variants → terminological iso639-3
_B_TO_T = {
    "alb": "sqi", "arm": "hye", "baq": "eus", "bur": "mya", "chi": "zho",
    "cze": "ces", "dut": "nld", "fre": "fra", "geo": "kat", "ger": "deu",
    "gre": "ell", "ice": "isl", "mac": "mkd", "mao": "mri", "may": "msa",
    "per": "fas", "rum": "ron", "slo": "slk", "tib": "bod", "wel": "cym",
}
_ALL_ISO3 = frozenset(_ISO3.values()) | frozenset(_B_TO_T.values())


def iso639_3_or_none(token: str) -> str | None:
    """Single language token → iso639-3 code, or None when unrecognized."""
    token = token.strip().lower()
    if not token:
        return None
    # strip region subtag: en-US → en (converter.py feeds <html lang> values)
    base = token.split("-")[0].split("_")[0]
    if base in _ISO3:
        return _ISO3[base]
    if base in _B_TO_T:
        return _B_TO_T[base]
    if len(base) == 3 and base in _ALL_ISO3:
        return base
    if token in _LABELS:
        return _LABELS[token]
    return None


def parse_language(input_lang: str | None) -> str:
    """Comma list → deduped ordered iso639-3 list, fallback 'eng'
    (language.py:6-36)."""
    if not input_lang:
        return "eng"
    codes = [iso639_3_or_none(part) for part in input_lang.split(",")]
    uniq = list(dict.fromkeys(c for c in codes if c is not None))
    return ",".join(uniq) if uniq else "eng"
