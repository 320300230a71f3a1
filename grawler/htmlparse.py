"""HTML parsing operators C1-C6 (SURVEY.md §2.7), Spark-first.

Reimplements (not ports) the reference's extraction semantics:
  C2 link extraction: every <a href>, document order, recursive
     (/root/reference/src/parsers/html.go:69-82)
  C3 metadata, first-wins: <link rel="icon|icon shortcut|shortcut icon">,
     <title>, meta[name=description | property=og:description],
     meta[property=og:site_name]  (/root/reference/src/parsers/html.go:10-67)
  C4 visible text: concat of text nodes outside
     script/style/noscript/svg/iframe, space-joined, trimmed
     (/root/reference/src/parsers/html.go:84-116)
  C5 normalize: strip \n \r, trim  (/root/reference/src/parsers/text.go:8-14)
  C6 defaulting: title <- first 60 chars of content, description <- first 160,
     site_name <- host, relative icon -> base_url + icon
     (/root/reference/src/utils/utils.go:123-141)
  graft: same pass extracts <img src alt> + <figcaption> captions
     (payload axis image; BASELINE.json north_star)

Executed as one iterator pandas UDF (mapInPandas) so a single Arrow pass per
batch yields links + metadata + text + images together.
"""

from __future__ import annotations

from html.parser import HTMLParser

_SKIP_TEXT_TAGS = {"script", "style", "noscript", "svg", "iframe"}
_ICON_RELS = {"icon", "icon shortcut", "shortcut icon"}


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.links: list[str] = []
        self.images: list[tuple[str, str | None]] = []  # (src, alt)
        self.title: str | None = None
        self.description: str | None = None
        self.site_name: str | None = None
        self.icon: str | None = None
        self.text_parts: list[str] = []
        self._skip_depth = 0
        self._in_title = False
        self._in_figure = False
        self._fig_img_idx: int | None = None
        self._fig_caption_parts: list[str] | None = None
        self._in_figcaption = False

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag in _SKIP_TEXT_TAGS:
            self._skip_depth += 1
        elif tag == "a":
            href = a.get("href")
            if href is not None:
                self.links.append(href)
        elif tag == "img":
            src = a.get("src")
            if src is not None:
                self.images.append((src, a.get("alt")))
                if self._in_figure and self._fig_img_idx is None:
                    self._fig_img_idx = len(self.images) - 1
        elif tag == "title":
            self._in_title = True
        elif tag == "figure":
            self._in_figure = True
            self._fig_img_idx = None
            self._fig_caption_parts = []
        elif tag == "figcaption":
            self._in_figcaption = True
        elif tag == "link":
            rel = (a.get("rel") or "").lower().strip()
            if rel in _ICON_RELS and self.icon is None and a.get("href"):
                self.icon = a["href"]
        elif tag == "meta":
            name = (a.get("name") or "").lower()
            prop = (a.get("property") or "").lower()
            content = a.get("content")
            if content:
                if self.description is None and (
                    name == "description" or prop == "og:description"
                ):
                    self.description = content
                if self.site_name is None and prop == "og:site_name":
                    self.site_name = content

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag in _SKIP_TEXT_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False
        elif tag == "figcaption":
            self._in_figcaption = False
        elif tag == "figure":
            if (
                self._fig_img_idx is not None
                and self._fig_caption_parts
            ):
                src, alt = self.images[self._fig_img_idx]
                if not alt:  # alt text wins; figcaption is the fallback
                    cap = " ".join(self._fig_caption_parts).strip()
                    self.images[self._fig_img_idx] = (src, cap or None)
            self._in_figure = False
            self._fig_img_idx = None
            self._fig_caption_parts = None

    def handle_data(self, data):
        if self._in_title:
            self.title = (self.title or "") + data
        if self._in_figcaption and self._fig_caption_parts is not None:
            self._fig_caption_parts.append(data)
        if self._skip_depth == 0 and not self._in_title:
            stripped = data.strip()
            if stripped:
                self.text_parts.append(stripped)


def normalize_text(s: str | None) -> str:
    """C5: strip newlines/CRs, collapse to single spaces, trim."""
    if not s:
        return ""
    return " ".join(s.replace("\n", " ").replace("\r", " ").split())


def parse_html(html: str | None, base_url: str | None, host: str | None) -> dict:
    """One-pass extraction -> links, images+captions, metadata, visible text."""
    ex = _Extractor()
    try:
        ex.feed(html or "")
        ex.close()
    except Exception:
        pass
    content = normalize_text(" ".join(ex.text_parts))
    title = normalize_text(ex.title) or content[:60] or None
    description = normalize_text(ex.description) or content[:160] or None
    site_name = ex.site_name or host
    icon = ex.icon
    if icon and icon.startswith("/") and base_url:
        icon = base_url.rstrip("/") + icon
    return {
        "child_urls": ex.links,
        "images": [
            {"src": src, "caption": normalize_text(alt) or None}
            for src, alt in ex.images
        ],
        "title": title,
        "description": description,
        "site_name": site_name,
        "icon": icon,
        "content": content,
    }
