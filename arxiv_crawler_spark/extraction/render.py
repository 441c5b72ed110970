"""TEI → HTML renderer (U2/F11): project raw TEI bytes to render-ready HTML
columns, Arrow-batched.

Reference analog: arxiv_crawler/src/arxiv_crawler/tei_parser.py:54-409 —
the browser's document renderer. This is the *engine-side* restatement: a
column-to-HTML projection over the ``pages.html`` binary column
(``render_pages`` = mapInPandas over Arrow batches, the same batch shape as
the citation extractor U1), covering the renderer's core surface:

* header metadata (title / authors / date, tei_parser.py:93-118)
* abstract + body divs with numbered section headings (:221-256)
* paragraphs with inline ``ref type="bibr"`` citations rendered as
  popup-annotated spans or links (first-2-authors + " et al.",
  :258-305)
* figures, table-figures and MathJax formulas (block + inline), with
  in-text figure/table refs as ``figure-ref`` spans (:304-306, :321-379)
* the references list (:381-409)
* ``escape_html`` with the reference's exact 5-replacement chain,
  ampersand first (:54-62)
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from arxiv_crawler_spark.extraction.tei import _get_text, _t

__all__ = ["escape_html", "render_tei", "render_pages", "RENDER_SCHEMA"]


def escape_html(text: str) -> str:
    """tei_parser.py:54-62 verbatim semantics: & first, then <>"'."""
    return (
        text.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&#39;")
    )


def _persname_authors(scope: ET.Element) -> list[str]:
    """forename(s) + surname joined by space (tei_parser.py:99-112)."""
    out = []
    for pers in scope.iter(_t("persName")):
        parts = []
        fn = pers.find(_t("forename"))
        sn = pers.find(_t("surname"))
        if fn is not None and fn.text:
            parts.append(fn.text)
        if sn is not None and sn.text:
            parts.append(sn.text)
        if parts:
            out.append(" ".join(parts))
    return out


def _bibliography(root: ET.Element) -> dict[str, dict]:
    """bib_id → {title, authors, year, arxiv_id} (tei_parser.py:120-160)."""
    import re

    bib = {}
    for b in root.iter(_t("biblStruct")):
        bid = b.get("{http://www.w3.org/XML/1998/namespace}id", "")
        if not bid:
            continue
        title_el = b.find(f".//{_t('title')}")
        title = title_el.text.strip() if title_el is not None and title_el.text else "Unknown"
        authors = []
        for a in b.findall(f".//{_t('author')}/{_t('persName')}"):
            parts = []
            fn, sn = a.find(_t("forename")), a.find(_t("surname"))
            if fn is not None and fn.text:
                parts.append(fn.text)
            if sn is not None and sn.text:
                parts.append(sn.text)
            if parts:
                authors.append(" ".join(parts))
        date_el = b.find(f".//{_t('date')}")
        year = ""
        if date_el is not None:
            year = (date_el.get("when") or date_el.text or "")[:4]
        arxiv_id = None
        for idno in b.findall(f".//{_t('idno')}"):
            if idno.get("type") == "arXiv" and idno.text:
                m = re.search(r"(\d{4}\.\d{4,5})", idno.text)
                if m:
                    arxiv_id = m.group(1)
                break
        bib[bid] = {"title": title, "authors": authors, "year": year, "arxiv_id": arxiv_id}
    return bib


def _figure_to_html(fig: ET.Element) -> str:
    """Figure / table-figure (tei_parser.py:322-355). Quirk preserved: the
    table caption's label is not escaped (:338), the regular figure's is."""
    label_el = fig.find(_t("label"))
    desc_el = fig.find(_t("figDesc"))
    head_el = fig.find(_t("head"))
    label = label_el.text if label_el is not None and label_el.text else ""
    desc = desc_el.text if desc_el is not None and desc_el.text else ""
    head = head_el.text if head_el is not None and head_el.text else ""

    table_el = fig.find(_t("table"))
    if table_el is not None:
        table_html = _table_to_html(table_el)
        caption = f"<strong>{label}</strong>" if label else ""
        if head:
            caption += f": {escape_html(head)}"
        return f"""<figure class="table-figure">
            {table_html}
            <figcaption>{caption}</figcaption>
        </figure>"""

    caption_parts = []
    if label:
        caption_parts.append(f"<strong>{escape_html(label)}</strong>")
    if head:
        caption_parts.append(escape_html(head))
    return f"""<figure class="paper-figure">
        <div class="figure-placeholder">[Figure]</div>
        <figcaption>{": ".join(caption_parts)}</figcaption>
        {f'<p class="figure-desc">{escape_html(desc)}</p>' if desc else ''}
    </figure>"""


def _table_to_html(table_el: ET.Element) -> str:
    """tei_parser.py:358-367."""
    rows_html = []
    for row in table_el.findall(_t("row")):
        cells_html = []
        for cell in row.findall(_t("cell")):
            cells_html.append(f"<td>{escape_html(_get_text_joined(cell))}</td>")
        rows_html.append(f"<tr>{''.join(cells_html)}</tr>")
    return f'<table class="paper-table">{"".join(rows_html)}</table>'


def _formula_to_html(formula_el: ET.Element, inline: bool = False) -> str:
    """tei_parser.py:370-379 — MathJax-delimited formula text."""
    formula_text = _get_text_joined(formula_el).strip()
    if inline:
        return f'<span class="math-inline">\\({formula_text}\\)</span>'
    return f'<div class="math-block">\\[{formula_text}\\]</div>'


def _p_to_html(p: ET.Element, bib: dict, url_builder) -> str:
    """Paragraph with inline citations (tei_parser.py:258-318)."""
    parts: list[str] = []

    def walk(el: ET.Element, include_text: bool = True) -> None:
        if include_text and el.text:
            parts.append(escape_html(el.text))
        for child in el:
            tag = child.tag.replace(f"{{{'http://www.tei-c.org/ns/1.0'}}}", "")
            if tag == "ref":
                target = (child.get("target") or "").lstrip("#")
                ref_text = _get_text_joined(child)
                if child.get("type") == "bibr" and target in bib:
                    b = bib[target]
                    authors_str = ", ".join(b["authors"][:2])
                    if len(b["authors"]) > 2:
                        authors_str += " et al."
                    popup = b["title"]
                    if authors_str:
                        popup += f" — {authors_str}"
                    if b["year"]:
                        popup += f" ({b['year']})"
                    if b.get("arxiv_id") and url_builder:
                        parts.append(
                            f'<a href="{url_builder(b["arxiv_id"])}" class="citation" '
                            f'data-ref-id="{target}" data-popup="{escape_html(popup)}">'
                            f"{escape_html(ref_text)}</a>"
                        )
                    else:
                        parts.append(
                            f'<span class="citation" data-ref-id="{target}" '
                            f'data-popup="{escape_html(popup)}">{escape_html(ref_text)}</span>'
                        )
                elif child.get("type") in ("figure", "table"):
                    parts.append(f'<span class="figure-ref">{escape_html(ref_text)}</span>')
                else:
                    parts.append(escape_html(ref_text))
            elif tag == "formula":
                parts.append(_formula_to_html(child, inline=True))
            else:
                walk(child, include_text=True)
            if child.tail:
                parts.append(escape_html(child.tail))

    walk(p)
    return f"<p>{''.join(parts)}</p>"


def _get_text_joined(el: ET.Element) -> str:
    return "".join(el.itertext())


def _div_to_html(div: ET.Element, bib: dict, url_builder, depth: int = 2, sec_idx: int = 0) -> str:
    """Section div: numbered heading + paragraphs (tei_parser.py:221-256)."""
    parts = []
    head = div.find(_t("head"))
    if head is not None:
        num = head.get("n", "")
        hid = f"section-{num}" if num else f"section-{sec_idx}"
        tag = f"h{min(depth, 6)}"
        num_span = f'<span class="section-num">{num}</span> ' if num else ""
        parts.append(f'<{tag} id="{hid}">{num_span}{escape_html(head.text or "")}</{tag}>')
    for child in div:
        ctag = child.tag.replace(f"{{{'http://www.tei-c.org/ns/1.0'}}}", "")
        if ctag == "head":
            continue
        if ctag == "p":
            parts.append(_p_to_html(child, bib, url_builder))
        elif ctag == "div":
            parts.append(_div_to_html(child, bib, url_builder, depth + 1, sec_idx))
        elif ctag == "figure":
            parts.append(_figure_to_html(child))
        elif ctag == "formula":
            parts.append(_formula_to_html(child))
    return "\n".join(parts)


def _references_html(bib: dict, url_builder) -> str:
    """tei_parser.py:381-409."""
    if not bib:
        return ""
    parts = ['<ol class="references-list">']
    for bid, b in bib.items():
        authors_str = ", ".join(b["authors"])
        year_str = f" ({b['year']})" if b["year"] else ""
        if b.get("arxiv_id") and url_builder:
            title_html = f'<a href="{url_builder(b["arxiv_id"])}">{escape_html(b["title"])}</a>'
        else:
            title_html = escape_html(b["title"])
        parts.append(
            f'<li id="ref-{bid}">'
            f'<span class="ref-authors">{escape_html(authors_str)}</span>{year_str}. '
            f'<span class="ref-title">{title_html}</span></li>'
        )
    parts.append("</ol>")
    return "\n".join(parts)


def render_tei(xml_bytes: bytes, url_builder=None) -> dict[str, str]:
    """One document → rendered columns (gz-transparent like tei.py)."""
    if xml_bytes[:2] == b"\x1f\x8b":
        xml_bytes = gzip.decompress(xml_bytes)
    root = ET.fromstring(xml_bytes)
    title_el = root.find(f".//{_t('titleStmt')}/{_t('title')}")
    title = title_el.text.strip() if title_el is not None and title_el.text else ""
    authors = []
    src = root.find(f".//{_t('sourceDesc')}")
    if src is not None:
        authors = _persname_authors(src)
    bib = _bibliography(root)
    abstract_html = ""
    abs_div = root.find(f".//{_t('profileDesc')}/{_t('abstract')}/{_t('div')}")
    if abs_div is not None:
        abstract_html = _div_to_html(abs_div, bib, url_builder)
    body_parts = []
    body = root.find(f".//{_t('body')}")
    if body is not None:
        divs = body.findall(_t("div"))
        if divs:
            body_parts = [
                _div_to_html(d, bib, url_builder, sec_idx=i) for i, d in enumerate(divs)
            ]
        else:  # div-less bodies (the synthetic world): dispatch in place
            for child in body:
                ctag = child.tag.replace("{http://www.tei-c.org/ns/1.0}", "")
                if ctag == "p":
                    body_parts.append(_p_to_html(child, bib, url_builder))
                elif ctag == "figure":
                    body_parts.append(_figure_to_html(child))
                elif ctag == "formula":
                    body_parts.append(_formula_to_html(child))
    return {
        "title": title,
        "authors": ", ".join(authors),
        "abstract_html": abstract_html,
        "body_html": "\n".join(body_parts),
        "references_html": _references_html(bib, url_builder),
    }


RENDER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("authors", T.StringType()),
        T.StructField("abstract_html", T.StringType()),
        T.StructField("body_html", T.StringType()),
        T.StructField("references_html", T.StringType()),
    ]
)


def render_pages(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """Arrow-batched rendering over the pages table (same plan shape as the
    U1 extractor: binary column in, string columns out, no shuffle)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, blob in zip(pdf[url_col], pdf[html_col]):
                try:
                    r = render_tei(bytes(blob))
                except Exception:
                    r = {k: "" for k in ("title", "authors", "abstract_html", "body_html", "references_html")}
                r["url"] = url
                rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in RENDER_SCHEMA.fields])

    return pages.select(url_col, html_col).mapInPandas(process, schema=RENDER_SCHEMA)
