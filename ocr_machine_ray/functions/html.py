"""HTML boilerplate stripping — Readability-style block scoring with
tag-density / link-density heuristics (BASELINE.json north_star: "HTML
boilerplate stripping (Readability-style DOM scoring + tag-density
heuristics)").

No lxml/bs4 in this environment: the DOM walk uses the stdlib
``html.parser.HTMLParser`` (C-backed tokenizer) and keeps per-block state:
accumulated text, anchor-text length, tag depth, and ancestor chain. A block
is boilerplate iff (a) any ancestor is a furniture element (nav/header/
footer/aside/script/style/form), or (b) its link density (anchor chars /
total chars) exceeds 0.5, or (c) it is an anchor-only stub shorter than 10
chars. Everything else is main content, joined in document order.

The synthetic renderer wraps a document's real text in deterministic
furniture so the stripper's output must equal the original text exactly —
the closed-loop oracle pattern used throughout this repo.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

BOILERPLATE_ANCESTORS = frozenset(
    ["nav", "header", "footer", "aside", "script", "style", "form",
     "noscript", "head", "title"]
)
BLOCK_TAGS = frozenset(
    ["p", "div", "section", "article", "li", "td", "h1", "h2", "h3", "h4",
     "blockquote", "pre", "main", "body"]
)
MAX_LINK_DENSITY = 0.5
MIN_STUB_CHARS = 10

# ASCII \s to match the SQL oracle's RE2 semantics
_WS = re.compile(r"\s+", re.ASCII)


class _BlockCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[str] = []
        self.blocks: list[dict] = []
        self._open_block: dict | None = None
        self._anchor_depth = 0
        self._furniture_depth = 0

    # -- helpers ----------------------------------------------------------
    def _in_furniture(self) -> bool:
        return any(t in BOILERPLATE_ANCESTORS for t in self.stack)

    def _start_block(self) -> None:
        self._flush()
        self._open_block = {
            "text": [],
            "anchor_text": [],
            "furniture": self._in_furniture(),
            "tags": 0,
        }

    def _flush(self) -> None:
        b = self._open_block
        if b is not None:
            text = _WS.sub(" ", "".join(b["text"])).strip()
            if text:
                # normalize anchor text the same way as block text so link
                # density compares like with like (raw anchor chars counted
                # pretty-printed indentation and inflated density)
                anchor = _WS.sub(" ", "".join(b["anchor_text"])).strip()
                self.blocks.append(
                    {
                        "text": text,
                        "anchor_chars": len(anchor),
                        "furniture": b["furniture"],
                        "tags": b["tags"],
                    }
                )
        self._open_block = None

    # -- parser events ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in BLOCK_TAGS:
            self._start_block()
        self.stack.append(tag)
        if tag == "a":
            self._anchor_depth += 1
        if tag in BOILERPLATE_ANCESTORS:
            self._furniture_depth += 1
        if self._open_block is not None:
            self._open_block["tags"] += 1
            # NOTE: an inline furniture element (e.g. <script> inside a
            # content <div>) suppresses only ITS OWN text via handle_data;
            # it must not taint the sibling text of the block

    def handle_endtag(self, tag: str) -> None:
        if tag == "a" and self._anchor_depth:
            self._anchor_depth -= 1
        if tag in self.stack:
            # pop to the matching open tag; implicitly-closed tags on the
            # way out release their anchor/furniture depth too
            while self.stack and self.stack[-1] != tag:
                popped = self.stack.pop()
                if popped == "a" and self._anchor_depth:
                    self._anchor_depth -= 1
                if popped in BOILERPLATE_ANCESTORS and self._furniture_depth:
                    self._furniture_depth -= 1
            if self.stack:
                popped = self.stack.pop()
                if popped in BOILERPLATE_ANCESTORS and self._furniture_depth:
                    self._furniture_depth -= 1
        # else: stray close tag — ignore, keep ancestor context intact
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._furniture_depth or self._in_furniture():
            return  # text inside furniture never reaches any block
        if self._open_block is None and data.strip():
            self._start_block()
        if self._open_block is not None:
            self._open_block["text"].append(data)
            if self._anchor_depth:
                self._open_block["anchor_text"].append(data)

    def close(self) -> None:
        # the parser may buffer trailing data (potential incomplete charref)
        # until close — flush AFTER it has been delivered via handle_data
        super().close()
        self._flush()


def extract_main_content(html: str) -> str:
    """Strip boilerplate; return main-content text joined in order."""
    parser = _BlockCollector()
    parser.feed(html)
    parser.close()
    keep: list[str] = []
    for b in parser.blocks:
        if b["furniture"]:
            continue
        n = len(b["text"])
        if n == 0:
            continue
        link_density = b["anchor_chars"] / n
        if link_density > MAX_LINK_DENSITY:
            continue
        if b["anchor_chars"] > 0 and n < MIN_STUB_CHARS:
            continue
        keep.append(b["text"])
    return _WS.sub(" ", " ".join(keep)).strip()


# ---------------------------------------------------------------------------
# Deterministic synthetic renderer (test/oracle side).
# ---------------------------------------------------------------------------
def render_html(doc_id: int, text: str) -> str:
    """Wrap real text in deterministic boilerplate furniture. The stripper
    must return exactly the whitespace-normalized `text`."""
    from html import escape

    toks = _WS.split(text.strip(" \t\n\r\v\f"))
    # main content split into <p> blocks of ~12 tokens; escaped so text
    # containing markup metacharacters round-trips exactly
    paras = [
        "<p>" + escape(" ".join(toks[i : i + 12])) + "</p>"
        for i in range(0, len(toks), 12)
    ]
    nav_links = "".join(
        f'<a href="/s{j}">sec{(doc_id + j) % 97}</a> ' for j in range(5)
    )
    related = "".join(
        f'<li><a href="/r{j}">read more {j}</a></li>' for j in range(4)
    )
    return (
        "<html><head><title>doc</title>"
        "<style>body{color:#000}</style>"
        "<script>var x=1;</script></head>"
        f"<body><header><h1><a href='/'>SiteName</a></h1></header>"
        f"<nav>{nav_links}</nav>"
        f"<main>{''.join(paras)}</main>"
        f"<aside><ul>{related}</ul></aside>"
        f"<footer><a href='/tos'>terms</a> <a href='/priv'>privacy</a>"
        f" copyright {2000 + doc_id % 25}</footer>"
        "</body></html>"
    )


def strip_batch(batch, html_col: str = "html"):
    """Arrow batch kernel: html column -> main_text column."""
    import pyarrow as pa

    out = [extract_main_content(h or "") for h in batch[html_col].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "main_text": pa.array(out, type=pa.string()),
        }
    )
