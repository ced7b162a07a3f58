"""Ray Data stage for HTML boilerplate stripping (north-star §7.8).

``BoilerplateStripper`` is an actor-pool callable for ``map_batches`` over
batches of (doc_id, html): per-actor state (threshold config; the parser
class itself is stateless stdlib) is bound once in ``__init__``, batches
flow as Arrow tables.  Output columns: doc_id, spans (interleaved
text/media content spans), main_text, n_blocks, n_content_blocks.

``synth_page`` is the deterministic HTML harness used by tests and the
``html_main_content`` query: it wraps a known body text in boilerplate
(nav link lists, footer, sidebar) plus an article figure, so recovery of
the body is exactly checkable (``recovered_ok``).
"""

from __future__ import annotations

from typing import List

import pyarrow as pa

from ..functions.html import strip_boilerplate
from ..model import SPAN_TYPE

HTML_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("main_text", pa.string()),
        ("n_blocks", pa.int32()),
        ("n_content_blocks", pa.int32()),
        ("n_media", pa.int32()),
    ]
)


class BoilerplateStripper:
    """Use with ``ds.map_batches(BoilerplateStripper, batch_format="pyarrow",
    batch_size=B, concurrency=(m, n))``; column ``html`` in, span columns out."""

    def __init__(self, min_words: int = 10, max_link_density: float = 0.33):
        self.min_words = min_words
        self.max_link_density = max_link_density

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = [str(d) for d in batch.column("doc_id").to_pylist()]
        htmls = batch.column("html").to_pylist()
        spans_out: List[list] = []
        text_out: List[str] = []
        n_blocks: List[int] = []
        n_content: List[int] = []
        n_media: List[int] = []
        for html in htmls:
            res = strip_boilerplate(
                html or "", self.min_words, self.max_link_density
            )
            spans_out.append(res["spans"])
            text_out.append(res["main_text"])
            n_blocks.append(res["n_blocks"])
            n_content.append(res["n_content_blocks"])
            n_media.append(sum(1 for s in res["spans"] if s["kind"] == "media"))
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, type=pa.string()),
                pa.array(spans_out, type=pa.list_(SPAN_TYPE)),
                pa.array(text_out, type=pa.string()),
                pa.array(n_blocks, type=pa.int32()),
                pa.array(n_content, type=pa.int32()),
                pa.array(n_media, type=pa.int32()),
            ],
            schema=HTML_OUT_SCHEMA,
        )


def synth_page(doc_id: str, body_text: str) -> str:
    """Deterministic boilerplate-wrapped page around ``body_text``.

    The body is split into paragraphs of ~30 words; every paragraph keeps
    ≥10 words (short tails merge into the previous paragraph) so each one
    clears the content threshold and recovery is exact.
    """
    words = (body_text or "empty document body placeholder text").split()
    paras: List[str] = []
    for i in range(0, len(words), 30):
        chunk = words[i : i + 30]
        if len(chunk) < 10 and paras:
            paras[-1] = paras[-1] + " " + " ".join(chunk)
        else:
            paras.append(" ".join(chunk))
    para_html = "\n".join(f"<p>{p}</p>" for p in paras)
    nav_links = "".join(
        f'<li><a href="/s{i}">Section {i} link</a></li>' for i in range(8)
    )
    return f"""<!DOCTYPE html>
<html><head><title>{doc_id}</title><script>var x=1;</script>
<style>body{{margin:0}}</style></head>
<body>
<nav><ul>{nav_links}</ul></nav>
<div><a href="/home">Home</a> &gt; <a href="/docs">Docs</a> &gt; {doc_id}</div>
<aside><p>Sponsored: buy now and save with our partner offers today only deal</p>
<img src="ad_banner.png"/></aside>
<article>
<h1>Document {doc_id}</h1>
{para_html}
<figure><img src="figure_{doc_id}.png"/><figcaption>Figure for {doc_id}</figcaption></figure>
</article>
<footer><p>Copyright 2026 Example Corp. All rights reserved.</p>
<ul><li><a href="/terms">Terms</a></li><li><a href="/privacy">Privacy</a></li></ul></footer>
</body></html>"""


def recovered_body(main_text: str, doc_id: str) -> str:
    """Strip the synthetic page's own content-side additions (the h1 title)
    from extracted main text, for exact body comparison."""
    lines = [l for l in main_text.split("\n") if l != f"Document {doc_id}"]
    return " ".join(" ".join(lines).split())
