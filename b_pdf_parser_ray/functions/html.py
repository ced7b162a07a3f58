"""HTML boilerplate stripping: DOM-heuristic main-content extraction.

The north-star extension beyond the reference parser (SURVEY.md §7.8): a
second extraction strategy for HTML-shaped documents, using published
link-density / text-density heuristics (Readability-, jusText-, and
Boilerpipe-style scoring — Kohlschütter et al., "Boilerplate Detection
using Shallow Text Features", WSDM 2010; public-domain heuristics only).

Pure-Python (stdlib ``html.parser``), no Ray — the Ray plumbing lives in
``stages/boilerplate.py``.  Output is the engine's interleaved span model:
content text blocks become ``kind='text'`` spans and ``<img>`` elements
become ``kind='media'`` spans, both at their block offset in document
order — the same (kind, text, media_ref, offset) contract the statement
extractor uses, so the two strategies share sinks and verification.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Dict, List, Optional

# Tags that delimit text blocks (block-level flow content).
BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li td th dd dt article section header footer nav "
    "aside blockquote pre tr ul ol table main figure figcaption form".split()
)
# Subtrees that never contribute text.
SKIP_TAGS = frozenset("script style noscript head svg template iframe".split())
HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())
# Containers whose blocks are boilerplate regardless of density.
BOILERPLATE_CONTAINERS = frozenset("nav footer aside".split())

# jusText-style defaults: a block is content when it has enough words and
# few enough link characters.
DEFAULT_MIN_WORDS = 10
DEFAULT_MAX_LINK_DENSITY = 0.33


class _BlockParser(HTMLParser):
    """Linearize an HTML document into text/media blocks in DOM order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[Dict[str, object]] = []
        self._parts: List[str] = []
        self._link_chars = 0
        self._skip_depth = 0
        self._a_depth = 0
        self._heading_depth = 0
        self._container_depth = 0  # inside nav/footer/aside

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append(
                {
                    "kind": "text",
                    "text": text,
                    "media_ref": "",
                    "link_chars": self._link_chars,
                    "is_heading": self._heading_depth > 0,
                    "in_boilerplate_container": self._container_depth > 0,
                }
            )
        self._parts = []
        self._link_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "img":
            self._flush()
            src = dict(attrs).get("src", "") or ""
            self.blocks.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": src,
                    "link_chars": 0,
                    "is_heading": False,
                    "in_boilerplate_container": self._container_depth > 0,
                }
            )
            return
        if tag == "a":
            self._a_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()
            if tag in HEADING_TAGS:
                self._heading_depth += 1
            if tag in BOILERPLATE_CONTAINERS:
                self._container_depth += 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag == "img":
            self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush()
            if tag in HEADING_TAGS:
                self._heading_depth = max(0, self._heading_depth - 1)
            if tag in BOILERPLATE_CONTAINERS:
                self._container_depth = max(0, self._container_depth - 1)

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not data:
            return
        self._parts.append(data)
        if self._a_depth:
            self._link_chars += len(data.strip())

    def close(self) -> None:
        super().close()
        self._flush()


def segment_blocks(html: str) -> List[Dict[str, object]]:
    """HTML → ordered blocks with link/heading/container annotations."""
    p = _BlockParser()
    p.feed(html)
    p.close()
    return p.blocks


def classify_blocks(
    blocks: List[Dict[str, object]],
    min_words: int = DEFAULT_MIN_WORDS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> List[bool]:
    """Content/boilerplate decision per block.

    * text block: content iff word count ≥ ``min_words`` AND link density ≤
      ``max_link_density`` AND not inside a nav/footer/aside container;
    * heading: promoted to content when the next text block is content
      (Readability-style heading adoption);
    * media: content when an adjacent text block (previous or next in block
      order) is content — keeps article figures, drops nav icons.
    """
    n = len(blocks)
    is_content = [False] * n
    for i, b in enumerate(blocks):
        if b["kind"] != "text" or b["in_boilerplate_container"]:
            continue
        text = str(b["text"])
        words = len(text.split())
        density = (int(b["link_chars"]) / len(text)) if text else 1.0
        if words >= min_words and density <= max_link_density:
            is_content[i] = True
    # heading adoption: nearest following text block decides
    for i in range(n - 1, -1, -1):
        b = blocks[i]
        if b["kind"] == "text" and b["is_heading"] and not b["in_boilerplate_container"]:
            for j in range(i + 1, n):
                if blocks[j]["kind"] == "text" and not blocks[j]["is_heading"]:
                    is_content[i] = is_content[j]
                    break
    # media adoption: adjacent text-block context
    for i, b in enumerate(blocks):
        if b["kind"] != "media" or b["in_boilerplate_container"]:
            continue
        prev_c = next_c = False
        for j in range(i - 1, -1, -1):
            if blocks[j]["kind"] == "text":
                prev_c = is_content[j]
                break
        for j in range(i + 1, n):
            if blocks[j]["kind"] == "text":
                next_c = is_content[j]
                break
        is_content[i] = prev_c or next_c
    return is_content


def strip_boilerplate(
    html: str,
    min_words: int = DEFAULT_MIN_WORDS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> Dict[str, object]:
    """HTML → {'spans': [...], 'main_text': str, 'n_blocks': int,
    'n_content_blocks': int}.

    ``spans`` is the content span sequence in the engine's interleaved
    model: (kind, text, media_ref, offset) with offset = position of the
    block in the original DOM order (so dropped boilerplate leaves gaps —
    offsets stay comparable across strategies).
    """
    blocks = segment_blocks(html)
    keep = classify_blocks(blocks, min_words, max_link_density)
    spans: List[Dict[str, object]] = []
    for off, (b, k) in enumerate(zip(blocks, keep)):
        if not k:
            continue
        spans.append(
            {
                "kind": str(b["kind"]),
                "text": str(b["text"]),
                "media_ref": str(b["media_ref"]),
                "offset": off,
            }
        )
    main_text = "\n".join(s["text"] for s in spans if s["kind"] == "text")
    return {
        "spans": spans,
        "main_text": main_text,
        "n_blocks": len(blocks),
        "n_content_blocks": len(spans),
    }
