"""HTML extraction kernel: ``html bytes -> (text, title, links, anchors,
img_alts, meta_keywords)``.

Re-expresses the reference's tag-dispatch extractor (reference
DyableParseTREC/DyableParseHTML/HTMLAttribute.h:35-111 — split the page at
``<``/``>`` into tag vs text segments and dispatch on the tag name) with its
link/image/meta rules:

- links: ``<a href=...>`` — absolute http(s) kept as-is, relative resolved
  against the base url (DocumentInstance.h:164-207); dropped when the path
  extension is blacklisted (Webpage.h:320-328) or the url contains illegal
  characters (Webpage.h:315-318); fragments stripped
- anchor text between <a> and </a> is captured per link (anchor hits,
  FileStorage.h:205-274 type bits)
- images: ``<img alt=...>`` captions indexed only when the alt text has >= 5
  ASCII letters (DocumentInstance.h:399-431)
- meta keywords: ``<meta name="keywords" content=...>``
  (HTMLAttribute.h:181-195)
- ``<script>``/``<style>`` bodies are never text (HTMLAttribute.h:233-242)
- ``text`` = all visible text segments (title included, script/style and tag
  innards excluded), whitespace runs collapsed to single spaces, stripped.
  This is the **byte-identical invariant surface**: the corpus generator
  writes ``pages.text`` with this same function, and the Spark path must
  reproduce it per url (BASELINE.json input_hint).

Pure Python/stdlib; shared verbatim with the oracle. Robust to adversarial
bytes: NUL bytes, unclosed tags, CRLF — bytes are decoded latin-1 (lossless
byte<->char) so no input can raise.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urljoin, urlsplit, urlunsplit

BLACKLIST_EXT = {
    # after the reference's 34-entry extension blacklist (Webpage.h:320-328)
    "jpg", "jpeg", "png", "gif", "bmp", "ico", "tif", "tiff", "svg",
    "css", "js", "pdf", "ps", "doc", "xls", "ppt", "zip", "gz", "tgz",
    "tar", "rar", "exe", "dmg", "iso", "mp3", "wav", "avi", "mpg",
    "mpeg", "mov", "wmv", "flv", "swf", "xml", "rss",
}

_ILLEGAL_URL_CHARS = set(' <>"\'`{}|\\^\n\r\t\0')

_SKIP_TAGS = {"script", "style"}


@dataclass
class ExtractResult:
    text: str = ""
    title: str = ""
    links: list[str] = field(default_factory=list)
    anchors: list[str] = field(default_factory=list)  # parallel to links
    img_alts: list[str] = field(default_factory=list)
    meta_keywords: list[str] = field(default_factory=list)
    excerpts: list[str] = field(default_factory=list)


# -- excerpt segmentation (reference DyableParseTREC/DyableParseHTML/
#    DocumentInstance.h:20-23,129-160,212-262: excerpt records of <=1600-byte
#    span, kept only with >=2 sentences and >=512 chars, one record taken per
#    ~3750-byte stretch of the document). Retrieval falls back title ->
#    first excerpt for display (SearchHitItems.h:449-474). --
EXCERPT_SPAN = 1600
EXCERPT_MIN_CHARS = 512
EXCERPT_MIN_SENTENCES = 2
EXCERPT_STRIDE = 3750


def _sentences(text: str):
    """(start_offset, sentence) spans: a sentence ends at '. ' (delimiter
    kept with the sentence) or at end-of-text. Deterministic, never raises."""
    out = []
    i, n = 0, len(text)
    while i < n:
        dot = text.find(". ", i)
        if dot == -1:
            out.append((i, text[i:]))
            break
        out.append((i, text[i:dot + 1]))
        i = dot + 2
    return out


def segment_excerpts(text: str) -> list[str]:
    """Split normalized document text into excerpt records per the reference
    bounds above. Short documents (< MIN_CHARS of sentence text) yield no
    excerpts — display falls back to the title."""
    excerpts: list[str] = []
    cur: list[str] = []
    cur_start = 0
    cur_len = 0
    next_start = 0  # offset threshold where the next excerpt may begin

    def close():
        nonlocal cur, cur_len, next_start
        if (len(cur) >= EXCERPT_MIN_SENTENCES
                and cur_len >= EXCERPT_MIN_CHARS):
            excerpts.append(" ".join(cur))
        next_start = cur_start + EXCERPT_STRIDE
        cur, cur_len = [], 0

    for off, s in _sentences(text):
        if cur:
            if (off - cur_start) + len(s) > EXCERPT_SPAN:
                close()
            else:
                cur.append(s)
                cur_len += len(s) + 1
                continue
        if off >= next_start:
            cur, cur_start, cur_len = [s], off, len(s)
    if cur:
        close()
    return excerpts


def _norm_ws(s: str) -> str:
    return " ".join(s.split())


def _parse_attrs(tag_body: str) -> dict[str, str]:
    """Parse ``key=value`` attributes from the inside of a tag. Handles
    double/single-quoted and bare values; lowercases keys; keeps first
    occurrence. Deterministic, never raises."""
    attrs: dict[str, str] = {}
    i, n = 0, len(tag_body)
    while i < n:
        while i < n and tag_body[i] in " \t\r\n\0/":
            i += 1
        start = i
        while i < n and tag_body[i] not in " \t\r\n=/>":
            i += 1
        key = tag_body[start:i].lower()
        if not key:
            i += 1
            continue
        while i < n and tag_body[i] in " \t\r\n":
            i += 1
        val = ""
        if i < n and tag_body[i] == "=":
            i += 1
            while i < n and tag_body[i] in " \t\r\n":
                i += 1
            if i < n and tag_body[i] in "\"'":
                quote = tag_body[i]
                i += 1
                start = i
                while i < n and tag_body[i] != quote:
                    i += 1
                val = tag_body[start:i]
                i += 1
            else:
                start = i
                while i < n and tag_body[i] not in " \t\r\n":
                    i += 1
                val = tag_body[start:i]
        if key not in attrs:
            attrs[key] = val
    return attrs


def _clean_link(href: str, base_url: str) -> str | None:
    """Resolve + filter one href per the reference's rules. None = dropped."""
    href = href.strip()
    if not href or href.startswith(("javascript:", "mailto:", "ftp:", "#")):
        return None
    if any(c in _ILLEGAL_URL_CHARS for c in href):
        return None
    if href.startswith(("http://", "https://")):
        url = href  # fast path: urljoin returns absolute hrefs unchanged
    else:
        try:
            url = urljoin(base_url, href)
        except ValueError:
            return None
        if not url.startswith(("http://", "https://")):
            return None
    try:
        parts = urlsplit(url)
    except ValueError:  # e.g. "http://[x/" → Invalid IPv6 URL
        return None
    # strip fragment
    url = urlunsplit((parts.scheme, parts.netloc, parts.path, parts.query, ""))
    path = parts.path
    dot = path.rfind(".")
    if dot != -1 and "/" not in path[dot:]:
        if path[dot + 1:].lower() in BLACKLIST_EXT:
            return None
    return url


def _ascii_letters(s: str) -> int:
    return sum(1 for c in s if ("a" <= c <= "z") or ("A" <= c <= "Z"))


def extract(html: bytes | str, base_url: str = "") -> ExtractResult:
    """Extract text + structure from raw page bytes. Never raises."""
    if isinstance(html, bytes):
        page = html.decode("latin-1")
    else:
        page = html

    res = ExtractResult()
    text_parts: list[str] = []
    title_parts: list[str] = []

    in_title = False
    skip_until: str | None = None  # e.g. "script" → skip text until </script>
    anchor_href: str | None = None
    anchor_text_parts: list[str] = []

    i, n = 0, len(page)
    while i < n:
        lt = page.find("<", i)
        if lt == -1:
            seg = page[i:]
            i = n
            tag_body = None
        else:
            seg = page[i:lt]
            gt = page.find(">", lt + 1)
            if gt == -1:
                # unclosed tag: rest of page is tag innards, never text
                tag_body = page[lt + 1:]
                i = n
            else:
                tag_body = page[lt + 1:gt]
                i = gt + 1

        # -- text segment --
        if seg and skip_until is None:
            if in_title:
                title_parts.append(seg)
            if anchor_href is not None:
                anchor_text_parts.append(seg)
            text_parts.append(seg)

        if tag_body is None:
            continue

        # -- tag dispatch --
        body = tag_body.strip()
        closing = body.startswith("/")
        name_src = body[1:] if closing else body
        j = 0
        while j < len(name_src) and name_src[j] not in " \t\r\n/>":
            j += 1
        name = name_src[:j].lower()
        if not name:
            continue

        if skip_until is not None:
            if closing and name == skip_until:
                skip_until = None
            continue

        if closing:
            if name == "title":
                in_title = False
            elif name == "a" and anchor_href is not None:
                res.links.append(anchor_href)
                res.anchors.append(_norm_ws(" ".join(anchor_text_parts)))
                anchor_href = None
                anchor_text_parts = []
            continue

        if name in _SKIP_TAGS:
            if not body.endswith("/"):
                skip_until = name
        elif name == "title":
            in_title = True
        elif name == "a":
            attrs = _parse_attrs(name_src[j:])
            href = attrs.get("href", "")
            cleaned = _clean_link(href, base_url)
            # an <a> without a kept href still shows its text; just no link
            anchor_href = cleaned
            anchor_text_parts = []
            if cleaned is None:
                anchor_href = None
        elif name == "img":
            attrs = _parse_attrs(name_src[j:])
            alt = attrs.get("alt", "")
            if _ascii_letters(alt) >= 5:
                res.img_alts.append(_norm_ws(alt))
                text_parts.append(alt)  # captions are indexed text
        elif name == "meta":
            attrs = _parse_attrs(name_src[j:])
            if attrs.get("name", "").lower() == "keywords":
                content = attrs.get("content", "")
                kws = [_norm_ws(k) for k in content.split(",")]
                res.meta_keywords.extend(k for k in kws if k)

    res.title = _norm_ws(" ".join(title_parts))
    res.text = _norm_ws(" ".join(text_parts))
    res.excerpts = segment_excerpts(res.text)
    return res
