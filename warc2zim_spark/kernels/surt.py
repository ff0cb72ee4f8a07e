"""URL canonicalization → ZimPath/SURT-style key.

Reproduces the observable contract of zimscraperlib's
``ArticleUrlRewriter.normalize(HttpUrl(url))`` as pinned by the reference test
suite (reference: tests/test_warc_to_zim.py:160-189 normalization round-trip;
tests/test_warc_to_zim.py:60-87 + 512-513 fuzzy rules; README.md:41-44):

* scheme dropped, host kept (``example.com/``), port dropped, userinfo stripped
* non-ASCII hosts IDNA(punycode)-encoded, host lowercased
* path + query percent-unquoted, empty path → ``/``
* trailing ``?`` (empty query) dropped
* fuzzy canonicalization of dynamic URLs on known platforms
  (youtube/vimeo/timestamp cache-busters), kept as a *data table* of regex
  rules — extendable without code changes (reference: zimscraperlib rules,
  observable subset pinned below).

The fuzzy-rule subset implemented is exactly the subset pinned by the
reference's own tests; the rule table mirrors the public wabac.js
fuzzy-matching rule shapes.
"""

from __future__ import annotations

import re
from urllib.parse import unquote, urlsplit

# (pattern, replacement) applied to the scheme-less normalized key, first
# match wins.  Pinned expected outputs (reference tests/test_warc_to_zim.py):
#   youtube.fuzzy.replayweb.page/get_video_info?video_id=aT-Up5Y4uRI
#   youtube.fuzzy.replayweb.page/videoplayback?id=o-AE3bg...
#   youtube.fuzzy.replayweb.page/youtubei/v1/player?videoId=aT-Up5Y4uRI
#   vimeo.fuzzy.replayweb.page/video/347119375
#   vimeo-cdn.fuzzy.replayweb.page/01/4423/13/347119375/1398505169.mp4
#   example.com/path.txt  (from example.com/path.txt?<epoch-ts>)
FUZZY_RULES: list[tuple[re.Pattern[str], str]] = [
    (
        re.compile(
            r"^(?:www\.)?youtube(?:-nocookie)?\.com/get_video_info\?.*"
            r"(?:\?|&)?video_id=([^&]+).*$"
        ),
        r"youtube.fuzzy.replayweb.page/get_video_info?video_id=\1",
    ),
    (
        # generalized to any youtubei endpoint (wabac's rule shape:
        # `youtubei/[^?]+` with the videoId kept); the reference-pinned
        # /youtubei/v1/player case maps identically
        re.compile(
            r"^(?:www\.)?youtube(?:-nocookie)?\.com/(youtubei/[^?]+)\?.*"
            r"videoId=([^&]+).*$"
        ),
        r"youtube.fuzzy.replayweb.page/\1?videoId=\2",
    ),
    (
        re.compile(r"^[^/?]*googlevideo\.com/videoplayback\?.*id=([^&]+).*$"),
        r"youtube.fuzzy.replayweb.page/videoplayback?id=\1",
    ),
    (
        re.compile(r"^player\.vimeo\.com/video/(\d+)(?:\?.*)?$"),
        r"vimeo.fuzzy.replayweb.page/video/\1",
    ),
    (
        re.compile(r"^[^/?]*(?:vimeocdn|vod-progressive|vod-adaptive)[^/?]*/"
                   r"(?:.*[^\d/])?/?((?:\d+/)+\d+\.mp4)(?:\?.*)?$"),
        r"vimeo-cdn.fuzzy.replayweb.page/\1",
    ),
    # `?<digits>` cache-buster: query that is purely numeric collapses
    # (reference tests/test_warc_to_zim.py:512-513 "timestamp fuzzy match",
    #  verify_warc_and_zim re.sub(r"\?\d+$", "?", url)).
    (re.compile(r"^([^?]*)\?\d+$"), r"\1"),
    # i.ytimg video thumbnails (wabac rule shape: any thumb variant of a
    # video id folds to one fuzzy key, trailing size/quality digits and
    # query dropped)
    (
        re.compile(r"^i\.ytimg\.com/(vi(?:_webp)?)/([^/?]+)/[^/?]+\."
                   r"(jpg|jpeg|webp|png)(?:\?.*)?$"),
        r"i.ytimg.com.fuzzy.replayweb.page/\1/\2/thumbnail.\3",
    ),
    # facebook social plugins: the embedded href is the identity, everything
    # else (locale, width, sdk version, app_id) is noise
    (
        re.compile(r"^(?:www\.)?facebook\.com/(plugins/[^/?]+\.php)\?.*?"
                   r"href=([^&]+).*$"),
        r"facebook.com.fuzzy.replayweb.page/\1?href=\2",
    ),
    # instagram graphql API: query_hash identifies the stored response
    (
        re.compile(r"^(?:www\.)?instagram\.com/graphql/query\?.*?"
                   r"query_hash=([^&]+).*$"),
        r"instagram.com.fuzzy.replayweb.page/graphql/query?query_hash=\1",
    ),
    # wix static media CDN: the media asset id is the identity; the /v1/...
    # transform suffix (fill/crop/quality) and query are derived variants
    # (wabac public rule shape; engine-defined goldens)
    (
        re.compile(r"^[^/?]*\.wixstatic\.com/(media/[^/?]+)"
                   r"(?:/v1/[^?]*)?(?:\?.*)?$"),
        r"wixstatic.com.fuzzy.replayweb.page/\1",
    ),
    # jsdelivr CDN: versioned-path assets are immutable, the query is
    # cache/telemetry noise — drop it entirely
    (
        re.compile(r"^cdn\.jsdelivr\.net/([^?]+)\?.+$"),
        r"cdn.jsdelivr.net.fuzzy.replayweb.page/\1",
    ),
    # der spiegel asset pipeline: static js/css keyed by path, query is a
    # deploy fingerprint
    (
        re.compile(r"^(?:www\.)?spiegel\.de/([^?]+\.(?:js|css))\?.+$"),
        r"spiegel.de.fuzzy.replayweb.page/\1",
    ),
    # cheatography sheet scripts: same drop-query shape
    (
        re.compile(r"^(?:www\.)?cheatography\.com/(scripts/[^?]+)\?.+$"),
        r"cheatography.com.fuzzy.replayweb.page/\1",
    ),
    # google tag manager loader: the container id is the identity
    (
        re.compile(r"^(?:www\.)?googletagmanager\.com/gtm\.js\?.*?"
                   r"id=([^&]+).*$"),
        r"googletagmanager.com.fuzzy.replayweb.page/gtm.js?id=\1",
    ),
    # youtube embed player (wabac rule shape: the embedded video id is the
    # identity; player params — autoplay, origin, enablejsapi — are noise)
    (
        re.compile(r"^(?:www\.)?youtube(?:-nocookie)?\.com/embed/([^/?]+)"
                   r"(?:\?.*)?$"),
        r"youtube.fuzzy.replayweb.page/embed/\1",
    ),
    # google fonts css: the family list is the identity; display/ver/subset
    # are render hints that vary across fetches of the same stored sheet
    (
        re.compile(r"^fonts\.googleapis\.com/(css2?)\?.*?(family=[^&]+).*$"),
        r"fonts.googleapis.com.fuzzy.replayweb.page/\1?\2",
    ),
]

# media-segment/file cache noise: a query on an immutable media asset
# (CDN token, byte-range hint, session id) never changes the stored bytes —
# drop it when NO platform rule claimed the URL first (the wabac media rule
# shape; vimeo-cdn/videoplayback keep their dedicated rules above)
_MEDIA_EXTS = (
    ".mp4", ".webm", ".m4v", ".m4a", ".m4s", ".mp3", ".aac", ".ogg",
    ".oga", ".flac", ".wav",
)

# jQuery JSONP: the generated callback name embeds a per-page random id +
# timestamp (`jQuery<rand>_<ts>`); the stored response is keyed by the stable
# prefix (pywb/wabac jsonp rule shape — the paired response-body rewrite
# lives in kernels/rewritemode.py)
_JQUERY_CB_RE = re.compile(r"(?<=[?&])callback=jQuery\d+_\d+(?=&|$)")

# cheap substring guards gating the regex battery: ~99% of URLs match no
# fuzzy rule, and a dozen full-regex attempts per URL tripled the kernel
# cost. Every FUZZY_RULES host must appear here — the NOQUERY list is the
# subset whose rules can fire without a '?'.
_FUZZY_TOKENS_QUERY = (
    "youtube", "googlevideo", "vimeo", "vod-progressive", "vod-adaptive",
    "ytimg", "facebook", "instagram", "wixstatic", "jsdelivr", "spiegel",
    "cheatography", "googletagmanager", "googleapis",
)
_FUZZY_TOKENS_NOQUERY = (
    "vimeo", "vod-progressive", "vod-adaptive", "ytimg", "wixstatic",
    "youtube",  # /embed/<id> folds with or without player params
)

# api(-v2).soundcloud.com: client_id / app_version / app_locale vary per
# client session over the same stored API response (pywb soundcloud rule
# shape) — stripped in place, same mechanics as the cache-buster params
_SC_PARAM_RE = re.compile(r"[?&](?:client_id|app_version|app_locale)=[^&]*(?=&|$)")

# jQuery-style cache-buster params (`_`, `cb`, `uncache` = digits) are
# dropped wherever they appear in a query — the wabac generic-param rule
# shape; runs before the platform rule battery
_CACHE_PARAM_RE = re.compile(r"[?&](?:_|cb|uncache)=\d+(?=&|$)")


def _strip_cache_params(key: str, pattern: re.Pattern[str] = _CACHE_PARAM_RE) -> str:
    # Operate on the query substring only: a literal '&' in the PATH (from
    # percent-decoding, e.g. /foo%26bar) must never be promoted to '?' when
    # the whole query turns out to be a stripped cache-buster (advisor r03).
    head, sep, query = key.partition("?")
    if not sep:
        return key
    new_q = pattern.sub("", "?" + query)
    if not new_q:
        return head
    if new_q.startswith("&"):
        # removed the leading `?p=..`: promote the next separator
        new_q = "?" + new_q[1:]
    return head + new_q


def canonicalize(url: str | None) -> str | None:
    """URL → ZimPath-style canonical key, or None for non-HTTP(S)/bad URLs.

    Reference: converter.py:505 ``ArticleUrlRewriter.normalize(HttpUrl(url))``;
    non-HTTP schemes are filtered upstream (converter.py:501-503) — here we
    return None so callers can filter on nullity.
    """
    if not url:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    if parts.scheme not in ("http", "https"):
        return None
    host = parts.hostname
    if not host:
        return None
    try:
        host = host.encode("idna").decode("ascii") if not host.isascii() else host
    except UnicodeError:
        return None
    host = host.lower().rstrip(".")
    path = unquote(parts.path) or "/"
    query = unquote(parts.query)
    key = host + path + (("?" + query) if query else "")
    # cheap guards before the regex battery: ~99% of URLs match no fuzzy
    # rule, and a dozen full-regex attempts per URL tripled the kernel cost
    if query:
        if "_=" in query or "cb=" in query or "uncache=" in query:
            key = _strip_cache_params(key)
            query = key.partition("?")[2]
        if "soundcloud.com/" in key and (
            "client_id=" in query or "app_version=" in query or "app_locale=" in query
        ):
            key = _strip_cache_params(key, _SC_PARAM_RE)
            query = key.partition("?")[2]
        fired = False
        if query and (
            any(t in key for t in _FUZZY_TOKENS_QUERY) or query.isdigit()
        ):
            for pattern, repl in FUZZY_RULES:
                new_key, n = pattern.subn(repl, key)
                if n:
                    key = new_key
                    fired = True
                    break
        if query and not fired:
            # fallbacks for URLs no platform rule claimed: media-asset
            # cache noise and the jQuery JSONP callback id
            head = key.partition("?")[0]
            if head.endswith(_MEDIA_EXTS):
                key = head
            elif "callback=jQuery" in query:
                key = _JQUERY_CB_RE.sub("callback=jQuery", key)
    elif any(t in key for t in _FUZZY_TOKENS_NOQUERY):
        for pattern, repl in FUZZY_RULES:
            new_key, n = pattern.subn(repl, key)
            if n:
                key = new_key
                break
    if key.endswith("?"):
        key = key[:-1]
    return key


def url_host(url: str | None) -> str | None:
    """Registered host of an HTTP(S) URL (lowercased, IDNA-encoded), else None."""
    if not url:
        return None
    try:
        parts = urlsplit(url)
        host = parts.hostname
    except ValueError:
        return None
    if not host:
        return None
    try:
        host = host.encode("idna").decode("ascii") if not host.isascii() else host
    except UnicodeError:
        return None
    return host.lower().rstrip(".")
